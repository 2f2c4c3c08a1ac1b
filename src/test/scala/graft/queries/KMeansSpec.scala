package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Lloyd's k-means: recovers well-separated clusters, converges inside
  * the iteration budget, and keeps its scale shapes (map-side
  * assignment — no join in the assignment plan). */
class KMeansSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** 3 well-separated deterministic clusters in 8-dim: center c has
    * coordinates all 10·c, points jitter ±0.5 via a hash-free formula. */
  private def clustered = {
    val pts = for {
      c <- 0 until 3
      i <- 0 until 40
    } yield (c.toLong * 100 + i,
      Array.tabulate(8)(j => (10.0 * c + ((i * 7 + j * 3) % 10) / 10.0 - 0.5).toFloat))
    pts.toDF("vec_id", "embedding")
  }

  test("recovers well-separated clusters exactly") {
    val (centroids, assign) = KMeans.fit(clustered, k = 3, maxIters = 10)
    assert(centroids.length == 3)
    val byTrue = assign.withColumn("truth", (col("vec_id") / 100).cast("int"))
      .select("truth", "cell").distinct().collect()
      .map(r => r.getInt(0) -> r.getInt(1))
    // every true cluster maps to exactly one cell, and cells are distinct
    assert(byTrue.length == 3, byTrue.mkString(","))
    assert(byTrue.map(_._2).distinct.length == 3)
    // centroids land on the cluster centers (jitter averages out to ~10c+(-0.05..0.4))
    val sortedByNorm = centroids.sortBy(_.sum)
    for (c <- 0 until 3; j <- 0 until 8)
      assert(math.abs(sortedByNorm(c)(j) - 10.0 * c) < 1.0,
        s"centroid $c dim $j = ${sortedByNorm(c)(j)}")
  }

  test("converges before the iteration cap on stable data") {
    // run twice: the second fit from the same deterministic init must
    // produce identical centroids (fixed point reached, not cap-clipped)
    val (c1, _) = KMeans.fit(clustered, k = 3, maxIters = 10)
    val (c2, _) = KMeans.fit(clustered, k = 3, maxIters = 20)
    assert(c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq)
  }

  test("assignment is map-side: no join or generate in the plan") {
    val (centroids, assign) = KMeans.fit(clustered, k = 3, maxIters = 2)
    val plan = assign.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"assignment plan joins:\n$plan")
    assert(!plan.contains("Exchange"), s"assignment plan shuffles:\n$plan")
    // standalone query-time assignment works on arbitrary vectors
    val q = Seq((0L, Array.fill(8)(20.1f))).toDF("vec_id", "embedding")
      .select(KMeans.assignCell(centroids, col("embedding")).as("cell"))
    assert(q.head().getInt(0) ==
      centroids.zipWithIndex.minBy { case (c, _) =>
        c.map(x => (x - 20.1) * (x - 20.1)).sum }._2)
  }
}
