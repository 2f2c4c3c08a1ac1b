package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class CosineSimilaritySpec extends AnyFunSuite {

  private lazy val spark = {
    val s = TestSpark.spark
    GraftFunctions.register(s)
    s
  }
  import spark.implicits._

  private val foldSql =
    """aggregate(zip_with(a, b, (x, y) -> cast(x as double) * cast(y as double)), 0d, (acc, v) -> acc + v) /
      |(sqrt(aggregate(zip_with(a, a, (x, y) -> cast(x as double) * cast(y as double)), 0d, (acc, v) -> acc + v)) *
      | sqrt(aggregate(zip_with(b, b, (x, y) -> cast(x as double) * cast(y as double)), 0d, (acc, v) -> acc + v)))""".stripMargin

  test("bit-identical to the sequential-fold formula on real embeddings") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val pairs = e.select($"vec_id".as("ia"), $"embedding".as("a"))
      .crossJoin(e.select($"vec_id".as("ib"), $"embedding".as("b")))
      .where($"ia" < 20 && $"ib" < 20 && $"ia" < $"ib")
    val diffs = pairs
      .selectExpr("cosine_similarity(a, b) AS fused", s"($foldSql) AS folded")
      .where("fused <> folded OR fused IS NULL")
      .count()
    assert(diffs == 0)
  }

  test("null and length-mismatch inputs yield null") {
    val df = Seq(
      (Some(Array(1.0f, 2.0f)), Some(Array(1.0f, 2.0f, 3.0f))),
      (None, Some(Array(1.0f)))
    ).toDF("a", "b")
    val out = df.selectExpr("cosine_similarity(a, b) AS c").collect()
    assert(out.forall(_.isNullAt(0)))
  }

  test("runs inside whole-stage codegen") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.selectExpr("cosine_similarity(embedding, embedding) AS c").where("c > 0.99")
    // `*(n)` prefixes mark operators fused into a WholeStageCodegen stage
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [cosinesimilarity"))
    assert(q.count() == 500) // self-similarity = 1.0
  }

  test("identical vectors give exactly 1.0 within fp tolerance of norm product") {
    val out = Seq((Array(0.5f, -0.25f, 3.5f), Array(0.5f, -0.25f, 3.5f)))
      .toDF("a", "b").selectExpr("cosine_similarity(a, b) AS c").head().getDouble(0)
    assert(math.abs(out - 1.0) < 1e-15)
  }
}
