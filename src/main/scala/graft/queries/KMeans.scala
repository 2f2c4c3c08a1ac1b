package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Lloyd's k-means over an embedding column — the production
  * centroid builder for the IVF ANN index (v5 pins its centroids so the
  * oracle gate is deterministic; its scaladoc names k-means as the real
  * build step — this is that step, Spark-first).
  *
  * Shapes, per iteration:
  *  - **assignment is pure map-side**: the k centroids are a literal
  *    array-of-arrays baked into the plan (k × dim doubles — even
  *    k=4096 × dim=1024 is 32 MB, broadcast-sized), and the nearest
  *    cell is `array_position(d, array_min(d))` over a `transform` of
  *    squared L2 distances. No join, no shuffle, no driver round-trip.
  *  - **the update is ONE shuffle**: `posexplode` the vector, partial
  *    `avg` per (cell, dimension) map-side, final aggregate of k × dim
  *    cells — the shuffle carries combiner state, not rows. The k × dim
  *    result is driver-collected (tiny, by construction) to rebuild the
  *    literal for the next round — the same pattern the reference's
  *    centroid loop would run, but distributed.
  *
  * Initialization is deterministic farthest-first traversal: the
  * hash-minimal vector seeds, then k−1 passes each take the point
  * farthest from its nearest chosen centroid (each pass is one map-side
  * scoring scan + a TopK — no shuffle of vectors). Deterministic by
  * construction (no RNG, stable tie-breaks), immune to the
  * duplicate-seed collapse a plain sample risks; at large k swap in
  * k-means|| (oversampled probabilistic init, fewer passes) — the loop
  * body is unchanged. Empty cells keep their previous centroid.
  * Iteration stops when the max centroid movement (squared L2) drops
  * under `tol` or at `maxIters`.
  */
object KMeans {

  /** Squared L2 distance between a literal centroid array and the vector
    * column, as a sequential double fold (same fold family as
    * VectorOps.dot). */
  private def l2sq(c: Column, vec: Column): Column =
    aggregate(
      zip_with(c, vec, (x, y) => { val d = x - y.cast("double"); d * d }),
      lit(0.0), (acc, v) => acc + v)

  private def centroidLit(cs: Array[Array[Double]]): Column =
    array(cs.map(c => array(c.map(lit(_)): _*)): _*)

  /** 0-based nearest-centroid cell id for `vec` — usable standalone to
    * assign query vectors at search time. Computed by the fused codegen
    * kernel (the HOF tree it replaces — [[assignCellHof]] — is
    * CodegenFallback and was the dominant per-row term of every cell
    * assignment; KMeansSpec pins the two differentially). */
  def assignCell(cs: Array[Array[Double]], vec: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.functions.NearestCellL2(
      cs.map(_.toSeq).toSeq, ColumnBridge.expression(vec)))
  }

  /** The composable HOF form of [[assignCell]] — kept as the
    * differential reference for the kernel (never in a hot path). */
  private[queries] def assignCellHof(cs: Array[Array[Double]], vec: Column): Column = {
    val d = transform(centroidLit(cs), c => l2sq(c, vec))
    (array_position(d, array_min(d)) - 1).cast("int")
  }

  /** @param embeddings input with `idCol` and float-array `vecCol`
    * @return (final centroids, assignment DataFrame (idCol, cell)) */
  def fit(embeddings: DataFrame, k: Int, maxIters: Int = 10,
      tol: Double = 1e-9, idCol: String = "vec_id",
      vecCol: String = "embedding"): (Array[Array[Double]], DataFrame) = {
    require(k > 0, "k must be positive")
    val first = embeddings
      .orderBy(xxhash64(col(vecCol)), col(idCol))
      .limit(1).select(col(vecCol)).collect()
    require(first.nonEmpty, "need at least one input vector")
    var centroids: Array[Array[Double]] =
      Array(first.head.getSeq[Float](0).map(_.toDouble).toArray)
    while (centroids.length < k) {
      val far = embeddings
        .select(col(idCol), col(vecCol),
          org.apache.spark.sql.graft.ColumnBridge.column(
            graft.functions.NearestDistL2(centroids.map(_.toSeq).toSeq,
              org.apache.spark.sql.graft.ColumnBridge.expression(col(vecCol))))
            .as("dmin"))
        .orderBy(desc("dmin"), col(idCol))
        .limit(1).select(col(vecCol)).collect()
      centroids :+= far.head.getSeq[Float](0).map(_.toDouble).toArray
    }

    var iter = 0
    var moved = Double.MaxValue
    while (iter < maxIters && moved > tol) {
      val assigned = embeddings
        .withColumn("cell", assignCell(centroids, col(vecCol)))
      val means = assigned
        .select(col("cell"), posexplode(col(vecCol)).as(Seq("pos", "x")))
        .groupBy("cell", "pos")
        .agg(avg(col("x").cast("double")).as("m"))
        .collect()
        .groupBy(_.getInt(0))
        .map { case (cell, rows) =>
          cell -> rows.sortBy(_.getInt(1)).map(_.getDouble(2))
        }
      val next = centroids.zipWithIndex.map { case (old, i) =>
        means.get(i).map(_.toArray).getOrElse(old) // empty cell: keep
      }
      moved = centroids.zip(next)
        .map { case (a, b) => a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum }
        .max
      centroids = next
      iter += 1
    }
    (centroids, embeddings.select(col(idCol),
      assignCell(centroids, col(vecCol)).as("cell")))
  }

  // ------------------------------------------------------------------
  // Fixed-point Lloyd's — the ORACLE-GATED trainer (v15_kmeans_train).
  //
  // [[fit]] above is the production float trainer; its means are
  // double `avg`s whose value depends on reduction order, so no
  // cross-engine gate can pin it bit-for-bit. This variant runs the
  // SAME loop in exact int64 arithmetic: components quantized to
  // micro-units (round(x·1e6), the m4/v14 integer-compare posture),
  // squared-L2 assignment in longs, and the mean as
  // floor(sum/count) computed with the ONE formula both engines
  // evaluate IEEE-identically (`floor(CAST(s AS DOUBLE)/n)` — sums
  // stay far below 2^53, and 1/n is orders of magnitude above the
  // quotient's ulp, so the floor can never straddle a rounding
  // boundary). Ties in the argmin go to the lower cell id on both
  // engines (array_position takes the FIRST minimum; the oracle
  // orders by (d2, cell)). The result is a trained codebook the
  // DuckDB oracle replays round for round, hash-exact.
  //
  // Scale shape per round (identical to [[fit]]): assignment is pure
  // map-side against a k×dim literal; the update is one shuffle of
  // combiner state keyed (cell, pos); only k×dim longs ever reach the
  // driver. Init pins the k lowest-id vectors — deterministic, and at
  // 100 TB a k-row pushed-down scan.
  // ------------------------------------------------------------------

  /** Micro-unit quantization of a float-array column — fused codegen
    * kernel; [[quantColHof]] is the differential reference. */
  private[queries] def quantCol(vecCol: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.functions.QuantizeMicro(
      ColumnBridge.expression(vecCol)))
  }

  /** The composable HOF form of [[quantCol]] (KMeansSpec differential). */
  private[queries] def quantColHof(vecCol: Column): Column =
    transform(vecCol, x => round(x.cast("double") * 1e6).cast("long"))

  /** Exact int64 squared L2 between a long-array literal and a
    * quantized vector column. */
  private def l2sqQ(c: Column, qv: Column): Column =
    aggregate(zip_with(c, qv, (x, y) => { val d = x - y; d * d }),
      lit(0L), (acc, v) => acc + v)

  private def centroidLitQ(cs: Array[Array[Long]]): Column =
    array(cs.map(c => array(c.map(lit(_)): _*)): _*)

  /** 0-based nearest-cell id over quantized centroids; ties → lower id.
    * Fused codegen kernel; [[assignCellQHof]] is the differential twin. */
  private[queries] def assignCellQ(cs: Array[Array[Long]], qv: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.functions.NearestCellL2Q(
      cs.map(_.toSeq).toSeq, ColumnBridge.expression(qv)))
  }

  /** The composable HOF form of [[assignCellQ]] — the differential
    * reference for the kernel (exact int64 fold, first-min tie-break). */
  private[queries] def assignCellQHof(cs: Array[Array[Long]], qv: Column): Column = {
    val d = transform(centroidLitQ(cs), c => l2sqQ(c, qv))
    (array_position(d, array_min(d)) - 1).cast("int")
  }

  /** Train `iters` exact-arithmetic Lloyd rounds; init = the quantized
    * vectors of the k smallest ids. Returns the trained codebook in
    * exploded gate form: (cell, pos 1-based, cval, n_members) ordered
    * by (cell, pos) — n_members from the final assignment, 0 for a
    * cell that emptied (it keeps its last centroid, mirrored by the
    * oracle's left-join coalesce). */
  def fitQGate(embeddings: DataFrame, k: Int, iters: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(k > 0 && iters >= 0, "k and iters must be positive")
    // Materialize the quantized vectors ONCE (eager, so no concurrent
    // stage can race a cold cache): every Lloyd round plus the final
    // counts pass re-reads this frame, and without the checkpoint each
    // of those jobs re-runs the scan + QuantizeMicro pass (JobProbe
    // r14: a ~0.12 s single-task scan job per round at sf0.1 — the
    // input is one parquet file, so the re-scan is also serial). The
    // checkpoint is the trainer's working set — the same input caching
    // every distributed Lloyd implementation does for its iteration
    // loop (guide §5: reuse × recompute-cost justifies it).
    val q = embeddings.select(col(idCol).as("vid"), quantCol(col(vecCol)).as("qv"))
      .localCheckpoint(true)
    var centroids: Array[Array[Long]] = q.where(col("vid") < k)
      .orderBy("vid").collect()
      .map(_.getSeq[Long](1).toArray)
    require(centroids.length == k, s"init needs ids 0..${k - 1} present")
    for (_ <- 1 to iters) {
      val sums = q
        .select(assignCellQ(centroids, col("qv")).as("cell"),
          posexplode(col("qv")).as(Seq("pos", "x")))
        .groupBy("cell", "pos")
        .agg(sum("x").as("s"), count(lit(1)).as("n"))
        .collect()
      val byCell = sums.groupBy(_.getInt(0)).map { case (cell, rows) =>
        cell -> rows.sortBy(_.getInt(1)).map(r =>
          math.floor(r.getLong(2).toDouble / r.getLong(3).toDouble).toLong)
      }
      centroids = centroids.zipWithIndex.map { case (old, i) =>
        byCell.get(i).map(_.toArray).getOrElse(old)
      }
    }
    val counts = q.select(assignCellQ(centroids, col("qv")).as("cell"))
      .groupBy("cell").agg(count(lit(1)).cast("int").as("n_members"))
    val code = centroids.zipWithIndex.flatMap { case (c, cell) =>
      c.zipWithIndex.map { case (v, p) => (cell, p + 1, v) }
    }.toSeq
    val codeDf = embeddings.sparkSession.createDataFrame(code)
      .toDF("cell", "pos", "cval")
    codeDf.join(counts, Seq("cell"), "left")
      .select(col("cell").cast("int"), col("pos").cast("int"), col("cval"),
        coalesce(col("n_members"), lit(0)).cast("int").as("n_members"))
      .orderBy("cell", "pos")
  }
}
