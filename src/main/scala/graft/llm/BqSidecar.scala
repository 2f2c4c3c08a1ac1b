package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Binary-quantization SIDECAR over the stored [[VectorIndex]] — the
  * materialized serving structure a production vector store keeps next
  * to its full-precision snapshot (v14's math as a persisted artifact,
  * the CorpusRefresh materialized-view posture applied to ANN):
  * [[refresh]] derives one packed 64-bit sign word per live vector plus
  * the corpus threshold statistics and stores both under the index dir;
  * [[serve]] answers top-k from the words alone — 8 bytes/vector
  * scanned instead of 256 — reading full-precision vectors only for the
  * rerank survivors.
  *
  * Freshness contract (spec-pinned): the sidecar is a SNAPSHOT of the
  * live membership at refresh time. A vector ADDED after refresh is not
  * served until the next refresh (the materialized-view lag, priced
  * like c1b's); a vector REMOVED after refresh vanishes from serve
  * immediately — serve semi-joins current [[VectorIndex.liveIds]], so a
  * takedown never waits on a rebuild (the d17/v5c takedown posture).
  *
  * Integer-exactness chain (the v14 gate's): codes are floor(x·2^7)
  * bigints (exponent shift, no rounding); the per-dim threshold compare
  * is icode[d]·N > Σ icode[d] — both sides exact integers, so the
  * stored words are bit-identical to what any engine derives from the
  * same rows; query words are computed against the STORED statistics
  * (the deployed posture: query-time quantization uses the trained
  * thresholds, not fresh ones). Candidate ranking is
  * bit_count(xor) — never a float before the rerank.
  *
  * 100 TB: refresh is one map pass + a 64-row aggregate broadcast back;
  * the serve scan is words-only and shuffles nothing corpus-sized (the
  * per-query top-depth is a window over broadcast-joined candidates,
  * the v7/v14 shape); rerank reads ≤ queries×depth full vectors by id.
  */
object BqSidecar {

  private def wordsPath(dir: String) = s"$dir/bq/words"
  private def statsPath(dir: String) = s"$dir/bq/stats"

  private def fsOf(spark: SparkSession, p: String) =
    new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def exists(spark: SparkSession, p: String): Boolean =
    fsOf(spark, p).exists(new org.apache.hadoop.fs.Path(p))

  private val icodeExpr =
    "transform(embedding, x -> cast(floor(cast(x as double) * 128.0D) as bigint))"

  private val packExpr =
    """aggregate(sequence(0, 63), cast(0 as bigint),
         (acc, b) -> acc + IF(element_at(icode, b + 1) * N > element_at(T, b + 1),
                              shiftleft(cast(1 as bigint), b), cast(0 as bigint)))"""

  /** Same fused kernel as VectorIndex/VectorOps — the rerank must match
    * the flat oracle bit-for-bit. */
  private def cosine(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    org.apache.spark.sql.graft.ColumnBridge.column(graft.functions.CosineSimilarity(
      org.apache.spark.sql.graft.ColumnBridge.expression(a),
      org.apache.spark.sql.graft.ColumnBridge.expression(b)))

  /** (Re)materialize the sidecar from the index's CURRENT live rows:
    * per-dim integer sums + count (the thresholds), one packed word per
    * vector. Serialized on the index's WriterLock; the swap is the
    * crash-safe GenLedger primitive, so a reader never sees a torn
    * sidecar. */
  def refresh(spark: SparkSession, dir: String): Unit =
      graft.store.WriterLock.forIndex(spark, dir).withLock {
    val verDir = VectorIndex.live(spark, dir)
    val vecs = VectorIndex.liveVectors(spark, verDir)
      .select(col("vec_id"), col("embedding"))
      .withColumn("icode", expr(icodeExpr))
    val stats = vecs.select(posexplode(col("icode")).as(Seq("dim", "c")))
      .groupBy("dim").agg(sum("c").as("t"), count(lit(1)).as("n"))
      .agg(expr("transform(array_sort(collect_list(struct(dim, t))), p -> p.t)").as("T"),
        max("n").as("N"))
    val words = vecs.crossJoin(broadcast(stats))
      .withColumn("word", expr(packExpr))
      .select("vec_id", "word")
    def put(p: String, content: DataFrame, n: Int): Unit =
      if (!exists(spark, p)) content.repartition(n).write.parquet(p)
      else { graft.store.GenLedger.swapIn(spark, p, content, n); () }
    put(statsPath(dir), stats, 1)
    put(wordsPath(dir), words, 4)
  }

  /** Top-`k` cosine neighbors per query (`qid`, `qe`) served from the
    * sidecar: Hamming top-`depth` candidates from the stored words
    * (filtered to CURRENT live membership), exact-cosine rerank reading
    * only the survivors' full vectors. Ties break by id, the family
    * rule. */
  def serve(spark: SparkSession, dir: String, queries: DataFrame,
      k: Int = 3, depth: Int = 20): DataFrame = {
    require(exists(spark, wordsPath(dir)), s"no sidecar at $dir — run refresh() first")
    val verDir = VectorIndex.live(spark, dir)
    val words = spark.read.parquet(wordsPath(dir))
      .join(VectorIndex.liveIds(spark, dir), Seq("vec_id"), "left_semi")
    val stats = spark.read.parquet(statsPath(dir))
    val q = queries.select(col("qid"), col("qe"))
      .withColumn("embedding", col("qe")).withColumn("icode", expr(icodeExpr))
      .crossJoin(broadcast(stats))
      .withColumn("qw", expr(packExpr))
      .select("qid", "qe", "qw")
    val cand = words.join(broadcast(q), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nid"), col("qe"),
        expr("cast(bit_count(word ^ qw) as int)").as("hamming"))
    val w1 = Window.partitionBy("qid").orderBy(col("hamming").asc, col("nid"))
    val top = cand.withColumn("r", row_number().over(w1)).where(col("r") <= depth)
    // rerank: only survivors load the full-precision vector
    val full = VectorIndex.liveVectors(spark, verDir)
      .select(col("vec_id").as("nid"), col("embedding").as("ne"))
    val rr = top.join(full, Seq("nid"))
      .withColumn("cos_sim", cosine(col("qe"), col("ne")))
    val w2 = Window.partitionBy("qid").orderBy(col("cos_sim").desc, col("nid"))
    rr.withColumn("rnk", row_number().over(w2).cast("int"))
      .where(col("rnk") <= k)
      .select("qid", "nid", "rnk", "hamming", "cos_sim")
  }
}
