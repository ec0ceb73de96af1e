package graft

import graft.functions.Validators
import graft.plans.CnpjChecksum
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native Catalyst expression + extensions: SQL registration, codegen
  * execution, optimizer rule, and agreement with the scalar validator. */
class PlansSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  import spark.implicits._

  test("cnpj_is_valid registered via SparkSessionExtensions and usable from SQL") {
    val out = spark.sql(
      """SELECT cnpj_is_valid('04.252.011/0001-10') AS a,
        |       cnpj_is_valid('12.345.678/0001-00') AS b,
        |       cnpj_is_valid(NULL) AS c""".stripMargin).collect()(0)
    assert(out.getBoolean(0))
    assert(!out.getBoolean(1))
    assert(out.isNullAt(2))
  }

  test("native expression agrees with the scalar validator on a corpus") {
    val candidates = (0 until 2000).map { k =>
      if (k % 4 == 0) graft.operators.InvoicePipeline.ValidCnpjsFmt(k % 10)
      else f"${(k.toLong * 48271 + 7) % 100000000000000L}%014d"
    }
    candidates.foreach { c =>
      assert(CnpjChecksum.isValid(c) == Validators.cnpjValidator(c).valido, c)
    }
    // and through the engine, where whole-stage codegen compiles doGenCode
    val viaSql = candidates.toDF("c")
      .selectExpr("c", "cnpj_is_valid(c) AS v").collect()
    viaSql.foreach(r => assert(r.getBoolean(1) == CnpjChecksum.isValid(r.getString(0))))
  }

  test("optimizer rule strips case/trim wrappers around the checksum") {
    val plan = spark.sql(
      "SELECT cnpj_is_valid(upper(trim(' 04.252.011/0001-10 '))) AS v")
    assert(plan.collect()(0).getBoolean(0)) // correctness preserved
    val optimized = plan.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("upper("), s"upper not stripped:\n$optimized")
  }

  test("nfe_key_is_valid registered via SparkSessionExtensions and usable from SQL") {
    val valid = graft.operators.InvoicePipeline.ValidKeys.head
    val out = spark.sql(
      s"""SELECT nfe_key_is_valid('$valid') AS a,
         |       nfe_key_is_valid('123') AS b,
         |       nfe_key_is_valid(NULL) AS c""".stripMargin).collect()(0)
    assert(out.getBoolean(0))
    assert(!out.getBoolean(1))
    assert(out.isNullAt(2))
  }

  test("nfe expression agrees with the struct validator on all 5 input classes") {
    // the q_nfe_key_validate candidate generator: valid / bad-DV / bad-UF /
    // bad-modelo / bad-length, cycling through all key fixtures
    val candidates = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select(graft.operators.ScalarQueries.keyCandidate(col("o_orderkey")).as("k"))
      .collect().map(_.getString(0))
    assert(candidates.toSet.size >= 5)
    candidates.foreach { k =>
      assert(graft.plans.NfeChecksum.isValid(k) == Validators.nfeKeyValidator(k).valido, k)
    }
    // plus targeted edge classes the generator can't produce
    for (k <- Seq(null, "", "0" * 44, "9" * 44)) {
      val expected = Validators.nfeKeyValidator(k).valido
      assert(graft.plans.NfeChecksum.isValid(k) == expected, s"edge: $k")
    }
    // and through the engine, where whole-stage codegen compiles doGenCode
    val viaSql = candidates.toSeq.toDF("k")
      .selectExpr("k", "nfe_key_is_valid(k) AS v").collect()
    viaSql.foreach(r =>
      assert(r.getBoolean(1) == graft.plans.NfeChecksum.isValid(r.getString(0))))
  }

  test("optimizer rule strips wrappers around nfe_key_is_valid too") {
    val valid = graft.operators.InvoicePipeline.ValidKeys.head
    val plan = spark.sql(s"SELECT nfe_key_is_valid(upper(trim(' $valid '))) AS v")
    assert(plan.collect()(0).getBoolean(0))
    val optimized = plan.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("upper("), s"upper not stripped:\n$optimized")
  }

  test("graft_capped_collect: cap boundary, cross-partition merge, null skip, SQL-registered") {
    // key 1: exactly cap ids → kept; key 2: cap+1 → NULL (hot); key 3:
    // nulls don't count toward the cap. Spread over 8 partitions so the
    // merge path (partial buffers combining, overflow propagating) runs.
    val cap = 5
    val rows =
      (1 to cap).map(i => (1L, Option(i.toLong))) ++
        (1 to cap + 1).map(i => (2L, Option(100L + i))) ++
        ((1 to cap).map(i => (3L, Option(200L + i))) :+ (3L, Option.empty[Long]))
    val df = rows.toDF("key", "doc_id").repartition(8)
    df.createOrReplaceTempView("cc_in")
    val out = spark.sql(
      s"SELECT key, graft_capped_collect(doc_id, $cap) AS ids FROM cc_in GROUP BY key")
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(1L).isDefined && out(1L).get.asInstanceOf[scala.collection.Seq[Long]].sorted == (1L to cap.toLong))
    assert(out(2L).isEmpty, "cap+1 ids must evaluate to NULL (hot key)")
    assert(out(3L).get.asInstanceOf[scala.collection.Seq[Long]].sorted == (201L to 200L + cap),
      "null inputs must not count toward the cap")
    // differential: equivalent to the two-phase count-filter + collect_list
    val twoPhase = spark.sql(
      s"""SELECT key, CASE WHEN COUNT(doc_id) > $cap THEN NULL
            ELSE sort_array(collect_list(doc_id)) END AS ids
          FROM cc_in GROUP BY key""")
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    out.foreach { case (k, v) =>
      assert(v.map(_.asInstanceOf[scala.collection.Seq[Long]].sorted.toSeq) == twoPhase(k).map(_.asInstanceOf[scala.collection.Seq[Long]].toSeq),
        s"key $k diverges from the two-phase reference")
    }
  }

  test("graft_latest: SQL-registered arg-max struct, cross-partition merge, null skip") {
    // keys 0-3 see versions spread over 8 partitions (the merge path
    // runs); versions divisible by 5 are NULL structs and must be
    // skipped — for key 0 that excludes 40 and 20, so the max is 36.
    // key 9 only ever sees NULL structs → NULL result.
    val rows = (1 to 40).map(i => (i % 4L, i.toLong)) :+ (9L, 5L)
    val df = rows.toDF("key", "ver").repartition(8)
    df.createOrReplaceTempView("gl_in")
    val out = spark.sql(
      """SELECT key, graft_latest(CASE WHEN ver % 5 = 0 THEN NULL
           ELSE struct(ver, concat('p', ver)) END) AS latest
         FROM gl_in GROUP BY key""")
      .collect().map(r => r.getLong(0) -> Option(r.getStruct(1))).toMap
    val expected = Map(0L -> 36L, 1L -> 37L, 2L -> 38L, 3L -> 39L)
    expected.foreach { case (k, v) =>
      assert(out(k).map(_.getLong(0)) == Some(v), s"key $k: ${out(k)}")
      assert(out(k).map(_.getString(1)) == Some(s"p$v"), s"key $k payload")
    }
    assert(out(9L).isEmpty, "a group of only NULL structs must evaluate to NULL")
  }

  test("fiscal filters fuse into the codegen'd scan stage with pruned columns") {
    // the pushdown demo: both native predicates in one filter over a
    // parquet scan — the filter must sit inside WholeStageCodegen (no UDF
    // boundary) and the scan must read only the referenced column
    val df = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
      .where("cnpj_is_valid(c_name) OR nfe_key_is_valid(c_name)")
      .select("c_name")
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("*(1) Filter"), physical)
    assert(physical.contains("cnpj_is_valid") && physical.contains("nfe_key_is_valid"), physical)
    assert(!physical.contains("ScalaUDF"))
    val readSchema = physical.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("c_name") && !readSchema.contains("c_address"), readSchema)
    df.count() // executes: codegen compiles
  }

  test("expression runs inside whole-stage codegen (no UDF boundary)") {
    // a parquet scan source, so the projection isn't constant-folded away
    val df = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
      .selectExpr("cnpj_is_valid(c_name) AS v")
    val physical = df.queryExecution.executedPlan.toString
    // "*(n)" prefixes mark operators fused into a WholeStageCodegen stage
    assert(physical.contains("*(1) Project [cnpj_is_valid"), physical)
    assert(!physical.contains("BatchEvalPython") && !physical.contains("ScalaUDF"))
    assert(df.count() == 150) // and it executes (codegen compiles)
  }
}
