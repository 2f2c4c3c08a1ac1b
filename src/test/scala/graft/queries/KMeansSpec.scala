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

  // --- fixed-point trainer (v15's engine) ---------------------------

  /** [[clustered]] re-keyed INTERLEAVED (id % 3 = true cluster) so the
    * pinned lowest-id init seeds one vector per cluster — the pinned
    * init is the gate's determinism choice (MacQueen's first-k), and
    * like any non-spread init it needs the seeds to span the modes;
    * the float production trainer's farthest-first init removes that
    * sensitivity and is covered by the tests above. */
  private def clusteredSeq = {
    val pts = for {
      c <- 0 until 3
      i <- 0 until 40
    } yield (i.toLong * 3 + c,
      Array.tabulate(8)(j => (10.0 * c + ((i * 7 + j * 3) % 10) / 10.0 - 0.5).toFloat))
    pts.toDF("vec_id", "embedding")
  }

  test("fitQGate recovers the separated clusters and counts members") {
    val out = KMeans.fitQGate(clusteredSeq, k = 3, iters = 4)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getInt(3)))
    assert(out.length == 3 * 8)
    // each cell holds one true cluster of 40
    assert(out.map(_._4).distinct.toSeq == Seq(40))
    // cell centroids sit near 10·c micro-units for some permutation of c
    val centersByCell = out.groupBy(_._1).map { case (cell, rows) =>
      cell -> rows.sortBy(_._2).map(_._3)
    }
    val means = centersByCell.values.map(_.head / 1e6).toSeq.sorted
    for ((m, c) <- means.zip(Seq(0, 1, 2)))
      assert(math.abs(m - 10.0 * c) < 1.0, s"center $m vs ${10 * c}")
  }

  test("fitQGate is exact: a second run reproduces identical longs") {
    val a = KMeans.fitQGate(clusteredSeq, k = 3, iters = 3).collect().toSeq
    val b = KMeans.fitQGate(clusteredSeq, k = 3, iters = 3).collect().toSeq
    assert(a == b)
  }

  test("fitQGate argmin ties break to the lower cell id") {
    // two identical init vectors: every point is equidistant from both
    // cells, so at iters=0 (pure assignment against the init) cell 0
    // must absorb everything and cell 1 counts zero members
    val dup = Seq(
      (0L, Array.fill(4)(1.0f)),
      (1L, Array.fill(4)(1.0f)),
      (2L, Array.fill(4)(1.2f))).toDF("vec_id", "embedding")
    val out = KMeans.fitQGate(dup, k = 2, iters = 0)
      .collect().map(r => (r.getInt(0), r.getInt(3)))
    assert(out.filter(_._1 == 0).forall(_._2 == 3))
    assert(out.filter(_._1 == 1).forall(_._2 == 0))
  }

  test("fitQGate quantization matches round-half-away-from-zero") {
    val one = Seq((0L, Array(0.0000015f, -0.0000015f, 0.5f, -0.5f)))
      .toDF("vec_id", "embedding")
    val out = KMeans.fitQGate(one, k = 1, iters = 0)
      .collect().sortBy(_.getInt(1)).map(_.getLong(2)).toSeq
    // float 1.5e-6 widens to ~1.49999...e-6 or 1.5000...e-6 in double —
    // pin against the same formula the trainer uses
    val expected = Seq(0.0000015f, -0.0000015f, 0.5f, -0.5f).map(f =>
      java.math.BigDecimal.valueOf(f.toDouble * 1e6)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue)
    assert(out == expected)
  }

  // --- fused assignment kernels ≡ the composable HOF forms ----------

  test("assignCell kernel matches the HOF reference, ties to lower cell") {
    // centroids include an exact duplicate so the tie-break is exercised,
    // plus the clustered corpus for bulk agreement
    val cs = Array(Array.fill(8)(10.0), Array.fill(8)(10.0),
      Array.fill(8)(0.0), Array.fill(8)(20.0))
    val diff = clustered.select(
        KMeans.assignCell(cs, col("embedding")).as("k"),
        KMeans.assignCellHof(cs, col("embedding")).as("h"))
      .where(col("k") =!= col("h") || col("k").isNull =!= col("h").isNull)
    assert(diff.isEmpty, diff.collect().mkString(","))
    // interpreted eval path agrees with codegen (single-row local relation
    // may constant-fold; assert through the same frame instead)
    val dup = clustered.limit(3).select(
      KMeans.assignCell(cs, col("embedding")).as("k")).collect()
    assert(dup.forall(r => r.getInt(0) >= 0 && r.getInt(0) < 4))
  }

  test("assignCellQ kernel matches the HOF reference on quantized vectors") {
    val q = clusteredSeq.select(col("vec_id"),
      KMeans.quantCol(col("embedding")).as("qv"))
    val cs = Array(Array.fill(8)(10000000L), Array.fill(8)(0L),
      Array.fill(8)(20000000L), Array.fill(8)(10000000L))
    val diff = q.select(
        KMeans.assignCellQ(cs, col("qv")).as("k"),
        KMeans.assignCellQHof(cs, col("qv")).as("h"))
      .where(col("k") =!= col("h"))
    assert(diff.isEmpty, diff.collect().mkString(","))
  }

  test("quantCol kernel matches the HOF reference element-for-element") {
    val diff = clustered.select(
        KMeans.quantCol(col("embedding")).as("k"),
        KMeans.quantColHof(col("embedding")).as("h"))
      .where(col("k") =!= col("h"))
    assert(diff.isEmpty, diff.collect().mkString(","))
    // boundary values through the same frame
    val edge = Seq((0L, Array(0.0000015f, -0.0000015f, 0.5f, -0.5f, 0f)))
      .toDF("vec_id", "embedding")
    val kq = edge.select(KMeans.quantCol(col("embedding")).as("k"))
      .head.getSeq[Long](0)
    val hq = edge.select(KMeans.quantColHof(col("embedding")).as("h"))
      .head.getSeq[Long](0)
    assert(kq == hq)
  }

  test("assignment kernels null on codebook/vector arity mismatch") {
    val cs3 = Array(Array(0.0, 0.0, 0.0))
    val r = clustered.limit(1)
      .select(KMeans.assignCell(cs3, col("embedding")).as("k")).collect()
    assert(r.head.isNullAt(0))
  }

  test("quantCol NaN/Inf elements degrade gracefully (Round-guard cast)") {
    // The HOF reference throws under ANSI (cast(NaN as long) is
    // CAST_OVERFLOW in Spark 4); the kernel instead follows Spark
    // Round's NaN/Inf pass-through plus the JVM double→long conversion
    // (0 / ±Long.MaxValue) — graceful degradation on the Lloyd hot
    // path over arbitrary embeddings, never an executor crash.
    val weird = Seq((0L, Array(Float.NaN, Float.PositiveInfinity,
      Float.NegativeInfinity, 1.5f))).toDF("vec_id", "embedding")
    val kq = weird.select(KMeans.quantCol(col("embedding")).as("k"))
      .head.getSeq[Long](0)
    assert(kq == Seq(0L, Long.MaxValue, Long.MinValue, 1500000L))
  }

  test("assignment kernels null on a null vector element (HOF parity)") {
    // quantized inputs are containsNull=true, so the type system admits
    // this; the HOF form's null distance poisons the argmin to null.
    val csQ = Array(Array(0L, 0L, 0L))
    val csD = Array(Array(0.0, 0.0, 0.0))
    val one = spark.range(1)
    val rq = one
      .select(expr("array(1L, cast(null as long), 3L)").as("qv"))
      .select(KMeans.assignCellQ(csQ, col("qv")).as("k"),
        KMeans.assignCellQHof(csQ, col("qv")).as("h")).collect()
    assert(rq.head.isNullAt(0) && rq.head.isNullAt(1))
    val rf = one
      .select(expr(
        "array(cast(1 as float), cast(null as float), cast(3 as float))")
        .as("fv"))
      .select(KMeans.assignCell(csD, col("fv")).as("k"),
        KMeans.assignCellHof(csD, col("fv")).as("h")).collect()
    assert(rf.head.isNullAt(0) && rf.head.isNullAt(1))
  }
}
