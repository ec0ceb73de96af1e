package graft

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.WarehouseTables

/** The managed-table hygiene regime: graft marker, fresh-catalog/
  * stale-warehouse reconciliation, and the round-13 pre-write INTENT
  * sibling (ADVICE r12) that lets a crash in the saveAsTable→mark window
  * self-heal instead of demanding a human, while foreign data keeps
  * being refused loudly. */
class WarehouseTablesSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def fs = new Path(spark.conf.get("spark.sql.warehouse.dir"))
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def loc(table: String): Path = new Path(
    spark.sessionState.catalog.defaultTablePath(
      org.apache.spark.sql.catalyst.TableIdentifier(table)))

  test("happy path: reconcile stamps intent, mark stamps marker and clears intent") {
    val t = "wht_happy"
    WarehouseTables.reconcileOrphan(spark, t)
    val intent = new Path(loc(t).getParent, loc(t).getName + "._graft_writing")
    assert(fs.exists(intent), "reconcile must declare the coming write")
    Seq(1, 2).toDF("x").write.saveAsTable(t)
    WarehouseTables.mark(spark, t)
    assert(fs.exists(new Path(loc(t), WarehouseTables.MarkerFile)))
    assert(!fs.exists(intent), "mark must clear the intent sibling")
    spark.sql(s"DROP TABLE $t")
  }

  test("crash between saveAsTable and mark self-heals on the next reconcile (ADVICE r12)") {
    val t = "wht_crashwindow"
    // simulate the crash window: intent stamped, the table's FILES landed
    // at the managed location, mark() never ran, and the JVM died — so the
    // next session's in-memory catalog has no entry while the markerless
    // directory survives (parquet written straight to the path: the disk
    // state saveAsTable leaves, without the catalog entry a crash loses)
    WarehouseTables.reconcileOrphan(spark, t)
    Seq(1, 2, 3).toDF("x").write.parquet(loc(t).toString)
    assert(fs.exists(loc(t)) && !spark.catalog.tableExists(t))
    // pre-r13 this threw (markerless non-empty orphan); the live intent
    // sibling now proves graft initiated the write, so it self-heals
    WarehouseTables.reconcileOrphan(spark, t)
    Seq(9).toDF("x").write.saveAsTable(t)
    WarehouseTables.mark(spark, t)
    assert(spark.table(t).as[Int].collect().toSeq == Seq(9))
    spark.sql(s"DROP TABLE $t")
  }

  test("a STALE intent sibling no longer launders a markerless directory (review r13)") {
    // failure between reconcile and saveAsTable leaves an intent with
    // nothing to clear it; weeks later, data at the same location must
    // NOT become deletable on the strength of that old token
    val t = "wht_staleintent"
    WarehouseTables.reconcileOrphan(spark, t) // stamps the intent
    Seq(1).toDF("x").write.parquet(loc(t).toString) // markerless data appears later
    val intent = new Path(loc(t).getParent, loc(t).getName + "._graft_writing")
    // age the intent past the TTL
    fs.setTimes(intent,
      System.currentTimeMillis() - WarehouseTables.IntentTtlMs - 1000, -1)
    val e = intercept[IllegalArgumentException] {
      WarehouseTables.reconcileOrphan(spark, t)
    }
    assert(e.getMessage.contains("intent"), e.getMessage)
    assert(fs.exists(loc(t)), "data must survive the stale-intent refusal")
    fs.delete(loc(t), true); fs.delete(intent, false)
  }

  test("no intent is stamped when the catalog already holds the table (review r14)") {
    // the in-memory catalog dies with the JVM, so with a live catalog
    // entry an intent token has no self-heal case left — it would only
    // open a 15-minute window in which markerless data appearing at the
    // managed location is silently deleted by the next reconcile
    val t = "wht_existing"
    WarehouseTables.reconcileOrphan(spark, t)
    Seq(1).toDF("x").write.saveAsTable(t)
    WarehouseTables.mark(spark, t)
    WarehouseTables.reconcileOrphan(spark, t) // table exists in the catalog
    val intent = new Path(loc(t).getParent, loc(t).getName + "._graft_writing")
    assert(!fs.exists(intent), "no intent while the catalog entry is live")
    spark.sql(s"DROP TABLE $t")
  }

  test("writeManaged clears the intent when the caller aborts before the write (review r14)") {
    val t = "wht_abort"
    val intent = new Path(loc(t).getParent, loc(t).getName + "._graft_writing")
    intercept[RuntimeException] {
      WarehouseTables.writeManaged(spark, t)(
        throw new RuntimeException("prep failed"))(_ => fail("never attempted"))
    }
    assert(!fs.exists(intent),
      "an aborted caller must not leave a live intent token")
    // but a failure IN the write keeps the intent: files may already be
    // at the location and the self-heal path needs the token
    intercept[RuntimeException] {
      WarehouseTables.writeManaged(spark, t)(Seq(1).toDF("x"))(
        _ => throw new RuntimeException("write died"))
    }
    assert(fs.exists(intent), "a crashed WRITE must keep its intent")
    fs.delete(intent, false)
  }

  test("foreign markerless data without an intent sibling is still refused loudly") {
    val t = "wht_foreign"
    val l = loc(t)
    fs.mkdirs(l)
    val out = fs.create(new Path(l, "somebody-elses.parquet"), true)
    out.write(Array[Byte](1, 2, 3)); out.close()
    val e = intercept[IllegalArgumentException] {
      WarehouseTables.reconcileOrphan(spark, t)
    }
    assert(e.getMessage.contains(l.toString), "error must name the path")
    assert(fs.exists(new Path(l, "somebody-elses.parquet")),
      "foreign data must survive the refusal")
    // and the refusal must NOT have stamped an intent that would launder
    // the same foreign directory into deletable on a retry
    assert(!fs.exists(new Path(l.getParent, l.getName + "._graft_writing")))
    fs.delete(l, true)
  }
}
