package graft

import graft.operators.LeaseLock
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

/** Unit contract of the filesystem lease lock: mutual exclusion between
  * threads, per-thread reentrancy, stale-lease takeover, TOCTOU give-back,
  * token-checked release, renewal. The index-integration half lives in
  * MultiWriterStressSpec (concurrent appenders + compactor). */
class LeaseLockSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def fs = new Path("/tmp").getFileSystem(
    spark.sparkContext.hadoopConfiguration)
  private def tmpLock(name: String): String =
    java.nio.file.Files.createTempDirectory("graft-lease").toString + s"/$name.lock"

  test("mutual exclusion: the critical section never overlaps across threads") {
    val lock = tmpLock("mutex")
    val inside = new java.util.concurrent.atomic.AtomicInteger(0)
    val maxInside = new java.util.concurrent.atomic.AtomicInteger(0)
    val total = new java.util.concurrent.atomic.AtomicInteger(0)
    val ts = (1 to 4).map(_ => new Thread(() =>
      (1 to 10).foreach { _ =>
        LeaseLock.withLock(spark, lock) {
          val now = inside.incrementAndGet()
          maxInside.getAndUpdate(m => math.max(m, now))
          total.incrementAndGet()
          Thread.sleep(2)
          inside.decrementAndGet()
        }
      }))
    ts.foreach(_.start()); ts.foreach(_.join(120000))
    assert(total.get() == 40, "every critical section ran")
    assert(maxInside.get() == 1, s"overlap detected: ${maxInside.get()} threads inside")
    assert(!fs.exists(new Path(lock)), "lock file released")
  }

  test("reentrant within a thread; still exclusive across threads") {
    val lock = tmpLock("reent")
    var witnessed = -1
    LeaseLock.withLock(spark, lock) {
      LeaseLock.withLock(spark, lock) { witnessed = 1 } // no deadlock
      // another thread must NOT get in while we hold it
      val t = new Thread(() =>
        try LeaseLock.withLock(spark, lock, waitMs = 300) { witnessed = 2 }
        catch { case _: IllegalStateException => () })
      t.start(); t.join(120000)
      assert(witnessed == 1, "inner reentrant block ran; contender stayed out")
    }
    assert(!fs.exists(new Path(lock)), "released once, at the outermost exit")
  }

  test("stale lease is taken over; fresh lease is not") {
    val lock = tmpLock("stale")
    val p = new Path(lock)
    // plant an abandoned lock (crashed holder), lease = 200 ms
    val out = fs.create(p, false); out.writeUTF("dead-holder"); out.close()
    fs.setTimes(p, System.currentTimeMillis() - 10000, -1)
    var ran = false
    LeaseLock.withLock(spark, lock, leaseMs = 200, waitMs = 10000) { ran = true }
    assert(ran, "expired lease must be taken over")
    // fresh lock: a contender with a short wait must time out loudly
    val h = LeaseLock.acquire(fs, p, leaseMs = 600000, waitMs = 1000)
    val denied = intercept[IllegalStateException] {
      LeaseLock.withLock(spark, lock, leaseMs = 600000, waitMs = 300) { ran = false }
    }
    assert(denied.getMessage.contains("could not acquire"))
    LeaseLock.release(h)
    assert(ran, "fresh lease must not be stolen")
  }

  test("takeover is serialized on the mutex: abandoned mutex reaped, live mutex respected") {
    // 1) stale lock + ABANDONED takeover mutex (a contender crashed
    //    mid-dance): the reap path must clear the mutex and the lock must
    //    still be taken over
    val lock = tmpLock("tkmx")
    val p = new Path(lock)
    val out = fs.create(p, false); out.writeUTF("dead-holder"); out.close()
    fs.setTimes(p, System.currentTimeMillis() - 10000, -1)
    val mutex = new Path(p.getParent, s"${p.getName}.takeover")
    val mo = fs.create(mutex, false); mo.writeUTF("dead-contender"); mo.close()
    fs.setTimes(mutex, System.currentTimeMillis() - LeaseLock.TakeoverLeaseMs - 5000, -1)
    var ran = false
    LeaseLock.withLock(spark, lock, leaseMs = 200, waitMs = 10000) { ran = true }
    assert(ran, "stale lock behind an abandoned takeover mutex must be reclaimed")
    assert(!fs.exists(mutex), "abandoned takeover mutex reaped")
    // 2) stale lock + LIVE takeover mutex (another contender mid-dance):
    //    our contender must NOT run the dance concurrently — with a short
    //    wait it times out loudly instead of overlapping the takeover
    val out2 = fs.create(p, false); out2.writeUTF("dead-holder-2"); out2.close()
    fs.setTimes(p, System.currentTimeMillis() - 10000, -1)
    val mo2 = fs.create(mutex, false); mo2.writeUTF("live-contender"); mo2.close()
    val denied = intercept[IllegalStateException] {
      LeaseLock.withLock(spark, lock, leaseMs = 200, waitMs = 400) { ran = false }
    }
    assert(denied.getMessage.contains("could not acquire"))
    assert(fs.exists(p), "stale lock untouched while another contender holds the dance")
    fs.delete(mutex, false); fs.delete(p, false)
  }

  test("release deletes only its own lock; renew extends a held lease") {
    val lock = tmpLock("own")
    val p = new Path(lock)
    val h = LeaseLock.acquire(fs, p, waitMs = 1000)
    LeaseLock.renew(h) // no throw while held
    // simulate takeover: replace the file with someone else's token
    fs.delete(p, false)
    val out = fs.create(p, false); out.writeUTF("usurper"); out.close()
    LeaseLock.release(h) // must NOT delete the usurper's lock
    assert(fs.exists(p), "release deleted a lock it no longer owned")
    intercept[IllegalArgumentException](LeaseLock.renew(h)) // lost lease is loud
    fs.delete(p, false)
  }
}
