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

  test("fuzz: every write kernel under every disguise wrapper is rejected, with zero effect") {
    // POST /query is the public arbitrary-SQL surface (the reference UI
    // left its SELECT-only guard as a TODO, ui/main.js:130). Cartesian
    // fuzz: write/DDL/state kernels × syntactic disguises. Contract per
    // combination: AdHoc.run throws (NotAQueryException when it parses
    // to a plan the guard sees, ParseException when the disguise is
    // ungrammatical — both are rejections) and NOTHING executes.
    AdHoc.registerViews(spark, Map("fz_view" ->
      Seq(("A", 1), ("B", 2)).toDF("station_id", "v")))
    val kernels = Seq(
      "INSERT INTO fz_view VALUES ('X', 9)",
      "INSERT OVERWRITE TABLE fz_view VALUES ('X', 9)",
      "DROP TABLE fz_view",
      "DROP VIEW fz_view",
      "CREATE TABLE fz_sink(a INT) USING parquet",
      "CREATE TABLE fz_sink USING parquet AS SELECT * FROM fz_view",
      "CREATE OR REPLACE TEMPORARY VIEW fz_view AS SELECT 'P' AS station_id, 0 AS v",
      "CREATE GLOBAL TEMPORARY VIEW fz_g AS SELECT 1",
      "ALTER TABLE fz_view ADD COLUMNS (z INT)",
      "TRUNCATE TABLE fz_view",
      "DELETE FROM fz_view WHERE v = 1",
      "UPDATE fz_view SET v = 0",
      "MERGE INTO fz_view USING fz_view s ON 1=1 WHEN MATCHED THEN DELETE",
      "SET spark.sql.shuffle.partitions=1",
      "RESET",
      "CACHE TABLE fz_view",
      "UNCACHE TABLE fz_view",
      "REFRESH TABLE fz_view",
      "ANALYZE TABLE fz_view COMPUTE STATISTICS",
      "LOAD DATA INPATH '/tmp/x' INTO TABLE fz_view",
      "CREATE FUNCTION fz_f AS 'java.lang.String'",
      "ADD JAR '/tmp/evil.jar'")
    val wrap: Seq[String => String] = Seq(
      identity,
      s => s"  \n\t$s",
      s => s"/* audit: read-only */ $s",
      s => s"$s -- trailing comment",
      s => s"EXPLAIN $s",
      s => s"EXPLAIN EXTENDED $s",
      s => s"WITH q AS (SELECT 1) $s",
      s => s"WITH q AS (SELECT 1), r AS (SELECT * FROM q) $s",
      s => s"SELECT 1; $s",
      s => s"$s; SELECT 1",
      s => s.toLowerCase)
    val partsBefore = spark.conf.get("spark.sql.shuffle.partitions")
    for (k <- kernels; w <- wrap) {
      val sql = w(k)
      val e = intercept[Exception] { AdHoc.run(spark, sql) }
      assert(e.isInstanceOf[AdHoc.NotAQueryException] ||
        e.getClass.getName.contains("Parse"),
        s"unexpected rejection type ${e.getClass} for: $sql")
    }
    // zero effect: the view still serves its original rows, no sink or
    // function appeared, session conf untouched, nothing cached
    assert(AdHoc.run(spark, "SELECT sum(v) FROM fz_view").head.getLong(0) == 3L)
    assert(!spark.catalog.tableExists("fz_sink"))
    assert(!spark.catalog.functionExists("fz_f"))
    assert(spark.conf.get("spark.sql.shuffle.partitions") == partsBefore)
    assert(!spark.catalog.isCached("fz_view"))
    // and the same wrappers around a legitimate query still pass
    for (w <- Seq(wrap(1), wrap(2), wrap(3), wrap(6), wrap(7))) {
      assert(AdHoc.run(spark, w("SELECT count(*) FROM fz_view"))
        .head.getLong(0) == 2L)
    }
  }
}
