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
}
