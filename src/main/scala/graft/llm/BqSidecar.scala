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
  * Atomicity contract: stats and words are one logical artifact — the
  * words are only meaningful against the thresholds they were packed
  * with — so both live inside ONE versioned directory
  * (`bq/vNNNNNNNN/{stats,words}`) flipped by a single `_commit_` marker
  * (the [[VectorIndex]] version pattern). A reader resolves the highest
  * committed version and reads both tables from it; a crash anywhere in
  * refresh leaves either the previous committed version fully intact
  * (new dir has no marker → invisible) or the new one fully committed —
  * never new thresholds against old words. Interrupted-refresh debris
  * (uncommitted dirs, dangling markers) is reported/reclaimed by
  * [[repair]] via [[graft.store.GenLedger.repairVersions]], the family
  * discipline.
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

  private val CommitPrefix = "_commit_"
  private val KeepVersions = 2

  private def bqRoot(dir: String) = s"$dir/bq"

  private def fsOf(spark: SparkSession, p: String) =
    new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Highest version with a commit marker — serve's single read point.
    * (A marker is created only after both tables are fully written, so
    * resolution never lands on a torn artifact.) */
  private def currentVersion(spark: SparkSession, dir: String): Option[String] = {
    val p = new org.apache.hadoop.fs.Path(bqRoot(dir))
    val fs = fsOf(spark, dir)
    if (!fs.exists(p)) None
    else fs.listStatus(p).map(_.getPath.getName)
      .filter(_.startsWith(CommitPrefix))
      .sorted.lastOption.map(_.stripPrefix(CommitPrefix))
  }

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
    * vector, written together as the next version and flipped by one
    * commit marker. Serialized on the index's WriterLock. */
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
    val fs = fsOf(spark, dir)
    val root = bqRoot(dir)
    val next = f"v${currentVersion(spark, dir).map(_.drop(1).toInt).getOrElse(0) + 1}%08d"
    stats.repartition(1).write.parquet(s"$root/$next/stats")
    words.repartition(4).write.parquet(s"$root/$next/words")
    // the commit point: both tables become visible together exactly here
    fs.create(new org.apache.hadoop.fs.Path(root, CommitPrefix + next), true).close()
    // reap versions beyond the retention window (marker first, so a
    // crash mid-reap leaves an uncommitted dir — repair()'s case — and
    // never a dangling highest marker)
    fs.listStatus(new org.apache.hadoop.fs.Path(root))
      .map(_.getPath.getName).filter(_.startsWith(CommitPrefix))
      .sorted.dropRight(KeepVersions)
      .foreach { m =>
        val v = m.stripPrefix(CommitPrefix)
        fs.delete(new org.apache.hadoop.fs.Path(root, m), false)
        fs.delete(new org.apache.hadoop.fs.Path(root, v), true)
      }
    // pre-versioned flat layout (r12): superseded, reclaim
    fs.delete(new org.apache.hadoop.fs.Path(root, "stats"), true)
    fs.delete(new org.apache.hadoop.fs.Path(root, "words"), true)
  }

  /** Guarded repair of interrupted-refresh debris (dangling markers,
    * uncommitted version dirs) — [[graft.store.GenLedger.repairVersions]]
    * under the index WriterLock; `dryRun = true` (the default posture)
    * lists without touching. */
  def repair(spark: SparkSession, dir: String,
      dryRun: Boolean = true): Seq[(String, String, String, Boolean)] =
    graft.store.WriterLock.forIndex(spark, dir).withLock {
      graft.store.GenLedger
        .repairVersions(spark, bqRoot(dir), CommitPrefix, dryRun)
    }

  /** Top-`k` cosine neighbors per query (`qid`, `qe`) served from the
    * sidecar: Hamming top-`depth` candidates from the stored words
    * (filtered to CURRENT live membership), exact-cosine rerank reading
    * only the survivors' full vectors. Ties break by id, the family
    * rule. Stats and words read from ONE committed version — never a
    * torn pairing. */
  def serve(spark: SparkSession, dir: String, queries: DataFrame,
      k: Int = 3, depth: Int = 20): DataFrame = {
    val bqVer = currentVersion(spark, dir)
      .map(v => s"${bqRoot(dir)}/$v")
      .getOrElse(sys.error(s"no committed sidecar at $dir — run refresh() first"))
    val verDir = VectorIndex.live(spark, dir)
    val words = spark.read.parquet(s"$bqVer/words")
      .join(VectorIndex.liveIds(spark, dir), Seq("vec_id"), "left_semi")
    val stats = spark.read.parquet(s"$bqVer/stats")
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
