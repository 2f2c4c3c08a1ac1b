package graft.sql

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class AdHocSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("SELECT over registered views runs") {
    AdHoc.registerViews(spark, Map("obs_view" ->
      Seq(("A", 1), ("B", 2)).toDF("station_id", "v")))
    val out = AdHoc.run(spark, "SELECT station_id FROM obs_view ORDER BY v DESC LIMIT 1")
    assert(out.collect().map(_.getString(0)).toSeq == Seq("B"))
  }

  test("CTEs and window functions are allowed (still queries)") {
    val out = AdHoc.run(spark,
      """WITH t AS (SELECT 1 AS a UNION ALL SELECT 2)
        |SELECT a, row_number() OVER (ORDER BY a) AS r FROM t""".stripMargin)
    assert(out.count() == 2)
  }

  test("named parameters bind as typed literals, not string splices") {
    AdHoc.registerViews(spark, Map("pv" ->
      Seq(("A", 1), ("B", 2), ("C", 3)).toDF("station_id", "v")))
    val out = AdHoc.run(spark,
      "SELECT station_id FROM pv WHERE v >= :minV AND station_id <> :skip ORDER BY v",
      Map("minV" -> 2, "skip" -> "C"))
    assert(out.collect().map(_.getString(0)).toSeq == Seq("B"))
    // a hostile parameter value stays a literal — it cannot widen the rows
    val inj = AdHoc.run(spark,
      "SELECT station_id FROM pv WHERE station_id = :s",
      Map("s" -> "A' OR '1'='1"))
    assert(inj.count() == 0)
  }

  test("parameterized non-queries are still rejected") {
    intercept[AdHoc.NotAQueryException] {
      AdHoc.run(spark, "DROP TABLE pv", Map("x" -> 1))
    }
  }

  test("non-queries are rejected") {
    Seq(
      "DROP TABLE obs_view",
      "CREATE TABLE t(a INT) USING parquet",
      "INSERT INTO obs_view VALUES ('C', 3)",
      "SET spark.sql.shuffle.partitions=1",
      "CACHE TABLE obs_view"
    ).foreach { sql =>
      intercept[AdHoc.NotAQueryException] { AdHoc.run(spark, sql) }
    }
  }

  test("adversarial wrappers don't smuggle writes past the guard") {
    // the guard walks the PARSED PLAN, so disguises that keep a write
    // node anywhere in the tree must all fail
    Seq(
      "EXPLAIN INSERT INTO obs_view VALUES ('C', 3)", // Command wrapper
      "WITH x AS (SELECT 1) INSERT INTO obs_view SELECT * FROM x", // CTE-wrapped
      "/* just reading */ DROP TABLE obs_view", // comment prefix
      "CREATE OR REPLACE TEMPORARY VIEW evil AS SELECT 1", // view definition
      "CREATE TABLE sink USING parquet AS SELECT * FROM obs_view" // CTAS
    ).foreach { sql =>
      intercept[AdHoc.NotAQueryException] { AdHoc.run(spark, sql) }
    }
    // a statement list never parses as one plan — rejected at parse, not run
    intercept[Exception] { AdHoc.run(spark, "SELECT 1; DROP TABLE obs_view") }
  }
}
