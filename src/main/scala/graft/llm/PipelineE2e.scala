package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.Q
import graft.queries.VectorOps.{duckCos, duckSqL2}

/** The END-TO-END pipeline composition gate (VERDICT r10 #5): every
  * stage below is individually oracle-gated, but the thing a real user
  * runs is the CHAIN — streaming corpus ingest into the refresh state,
  * the index trio serving decontamination queries over the prepared
  * corpus, an epoch plan over the survivors, and the deterministic
  * shuffle + sequence packing that materializes the training order.
  * p1 pins that composition against ONE flat DuckDB recompute, so a
  * contract drift at any stage boundary (a column rename, a changed
  * tie-break, a stats shift from decontamination) fails the gate even
  * while every stage's own gate stays green.
  *
  * Stage shapes (all previously proven 100 TB-safe):
  *  1. ingest — c1d's exactly-once streaming recipe: file-source
  *     micro-batches through foreachBatch → [[CorpusRefresh.refresh]]
  *     keyed by epoch id, with a real redelivery of the last batch;
  *  2. lexical decontamination — [[TextIndex]] built ONCE over the
  *     prepared corpus's redacted text, searched per serve (t8b's
  *     bit-exactness contract, term-pruned postings scan);
  *  3. semantic decontamination — [[VectorIndex]] built ONCE over the
  *     kept documents' embeddings under the pinned v5b codebook,
  *     probed by the sub-8 "benchmark" vectors (cell-pruned scan);
  *  4. epoch plan — c11's hierarchical greedy ([[CorpusEtl
  *     .epochPlanFrom]]) with language as the mixing key (the UniMax
  *     posture: balance languages, not sources);
  *  5. order + pack — the (doc, repeat) instances in the c12
  *     deterministic md5 permutation, positions AND token offsets
  *     assigned hierarchically (bucket offsets over a ≤256-row frame +
  *     in-bucket windows — never an epoch-wide single-partition
  *     window), sequence spans by c6's integer arithmetic (L=512).
  *
  * The oracle recomputes the whole chain flat: the c1 prep CTEs, the
  * t8-form BM25 top-20, the v5b-form IVF probe, c11's flat greedy, and
  * the single ORDER BY permutation + running-sum pack the hierarchical
  * plan refuses to execute. Output is one row per packed instance in
  * training order — a total ORDER BY pos, hash-compared exactly.
  */
object PipelineE2e {

  /** Decontamination probe terms (distinct from t8b/t8c's sets). */
  private val Terms = Seq("spark", "sort", "stream")

  private val L = 512
  private val TopK = 20

  /** p1's per-(session, data-dir) scratch root — shared by the gate and
    * the plan-inspection twin so both resolve the same built state. */
  private def p1Root(s: org.apache.spark.sql.SparkSession, d: String): String = {
    val tag = d.replaceAll("[^A-Za-z0-9]", "_")
    new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_pipeline_e2e/$tag/${graft.Sessions.sessionTag(s)}").getAbsolutePath
  }

  /** The serve chain with the final materialization suppressed — the
    * plan-inspection twin (the pageRankLazyPlan posture): the gate's
    * returned frame ends in Sort(ExistingRDD) since the r13 pre-sort
    * checkpoint, so PipelineE2eSpec's window/join shape assertions read
    * this form. Builds the gate's state first (memoized marker). */
  private[llm] def p1ServeLazyPlan(s: org.apache.spark.sql.SparkSession,
      d: String): DataFrame = {
    p1q.fn(s, d) // ensure state + indexes exist (session-memoized)
    val root = p1Root(s, d)
    servePacked(s, d, s"$root/state", s"$root/textidx", s"$root/vecidx",
      materializeFinal = false)
  }

  private val p1q: Q =
    Q("p1_pipeline_e2e",
      (s, d) => {
        val root = p1Root(s, d)
        val tag = d.replaceAll("[^A-Za-z0-9]", "_")
        val state = s"$root/state"
        val tIdx = s"$root/textidx"
        val vIdx = s"$root/vecidx"
        val marker = s"graft_p1_marker_$tag"
        if (!s.catalog.tableExists(marker)) {
          val docs = Tables.documents(s, d)
          // 1. streaming ingest (c1d's exactly-once recipe): three
          // landed files → three micro-batches → refresh keyed by the
          // stream's epoch id, then the last batch RE-DELIVERED (the
          // foreachBatch crash window) — the ledger must no-op it
          val landing = s"$root/landing"
          (0 until 3).foreach { i =>
            docs.where(col("doc_id") % 3 === i).coalesce(1)
              .write.mode("append").parquet(landing)
          }
          val capture = s"$root/capture"
          val stream = s.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1).parquet(landing)
          val q = stream.writeStream
            .option("checkpointLocation", s"$root/ckpt")
            .foreachBatch { (df: DataFrame, bid: Long) =>
              val ss = df.sparkSession
              df.write.mode("overwrite").parquet(s"$capture/b$bid")
              CorpusRefresh.refresh(ss, state,
                ss.read.parquet(s"$capture/b$bid"),
                batchId = Some(s"p1_$bid"))
            }.start()
          try q.processAllAvailable() finally q.stop()
          val lastBid = new java.io.File(capture).listFiles()
            .map(_.getName.stripPrefix("b").toLong).max
          CorpusRefresh.refresh(s, state,
            s.read.parquet(s"$capture/b$lastBid"),
            batchId = Some(s"p1_$lastBid"))
          // 2+3. build the serve indexes ONCE over the prepared corpus:
          // lexical on the redacted text (what the pipeline ships),
          // IVF on the kept docs' embeddings under the pinned codebook
          // (centroids are parameters from the full table, membership
          // is the prepared keeper set)
          val prepped = CorpusRefresh.prepared(s, state)
          TextIndex.add(s, tIdx,
            prepped.select(col("doc_id"), col("redacted").as("text")))
          val cents = Tables.embeddings(s, d).where(col("vec_id") < 16)
            .orderBy("vec_id").select("embedding").collect()
            .map(_.getSeq[Float](0).map(_.toDouble).toArray)
          val members = Tables.embeddings(s, d).select("vec_id", "embedding")
            .join(prepped.select(col("doc_id").as("vec_id")),
              Seq("vec_id"), "left_semi")
          VectorIndex.buildWith(s, vIdx, members, cents)
          s.emptyDataFrame.createOrReplaceTempView(marker)
        }

        servePacked(s, d, state, tIdx, vIdx)
      },
      Some(oracleSql))

  /** The measured serve path shared by p1 (batch-built indexes) and
    * p1b (stream-synced indexes): decontaminate → plan → pack. */
  private def servePacked(s: org.apache.spark.sql.SparkSession, d: String,
      state: String, tIdx: String, vIdx: String,
      materializeFinal: Boolean = true): DataFrame = {
        // metadata-only prepared: the serve path consumes survivor
        // (id, lang, n_tokens) — preparedMeta skips the scrub parquet
        // scan (redacted text bytes), its max-gen window and the left
        // join that [[CorpusRefresh.prepared]] would assemble just to be
        // projected away (Catalyst has no left-join elimination; same
        // keeper row set either way, pinned by the p1/p1b/p2 oracles).
        val prep = CorpusRefresh.preparedMeta(s, state)
        val lexHits = TextIndex.search(s, tIdx, Terms, TopK)
          .select("doc_id")
        val semHits = VectorIndex.search(s, vIdx,
            Tables.embeddings(s, d).where(col("vec_id") < 8)
              .select(col("vec_id").as("qid"), col("embedding").as("qe")),
            k = 5, nprobe = 2)
          .select(col("nid").as("doc_id"))
        // survivor METADATA only (id/lang/token-count — no text), and
        // materialized once: everything downstream consumes it through
        // several plan subtrees (the epoch plan's bucket aggregation +
        // join, the pack's offsets + join), and without the checkpoint
        // each consumer re-executes the whole prep assembly and both
        // index serves (CorpusEtl.prepare's documented survivors
        // pattern; measured 12.2 → 5.2 s on the serve path at sf0.1)
        val clean = prep.join(
            lexHits.unionByName(semHits).distinct(), Seq("doc_id"), "left_anti")
          .select(col("doc_id"), col("lang"),
            col("n_tokens").cast("long").as("n_tokens"))
          .localCheckpoint(true)

        // 4. epoch plan: language-balanced token budgets (c11's greedy)
        val plan = CorpusEtl.epochPlanFrom(clean.select(col("doc_id"),
          col("lang").as("source"), col("n_tokens"),
          md5(col("doc_id").cast("string")).as("h")))

        // 5. instances → deterministic global order → packed sequences.
        // Positions and token offsets both assign hierarchically: the
        // md5 hex prefix buckets the permutation (c12's invariant —
        // lowercase-hex lexicographic order agrees with the numeric
        // order of the first two chars), a ≤256-row aggregate frame
        // yields cumulative row/token offsets per bucket, and only
        // (bucket)-partitioned windows touch instance-sized data.
        val inst = plan.where(col("repeats") > 0)
          .select(col("doc_id"), col("n_tokens"),
            explode(expr("sequence(0L, repeats - 1L)")).as("rep"))
        val rows = inst
          .withColumn("h2", md5(concat(col("rep").cast("string"), lit(":"),
            col("doc_id").cast("string"))))
          .withColumn("bucket",
            conv(substring(col("h2"), 1, 2), 16, 10).cast("long"))
        val wOff = Window.orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, -1)
        val offsets = rows.groupBy("bucket")
          .agg(count(lit(1)).as("b_n"), sum("n_tokens").as("b_tok"))
          .withColumn("b_start", coalesce(sum("b_n").over(wOff), lit(0L)))
          .withColumn("b_tok_start", coalesce(sum("b_tok").over(wOff), lit(0L)))
          .select("bucket", "b_start", "b_tok_start")
        val wIn = Window.partitionBy("bucket").orderBy("h2", "doc_id", "rep")
        rows.join(offsets, Seq("bucket"))
          .withColumn("pos", col("b_start") + row_number().over(wIn))
          .withColumn("cum_in", sum("n_tokens").over(wIn))
          .withColumn("start_off",
            col("b_tok_start") + col("cum_in") - col("n_tokens"))
          .select(col("doc_id"), col("rep"), col("pos"), col("n_tokens"),
            col("start_off"),
            expr(s"start_off div $L").as("first_seq"),
            expr(s"(start_off + n_tokens - 1) div $L").as("last_seq"))
          // eager before the total ORDER BY (r13): the range
          // partitioner's sampling pass re-executes its child — here
          // the in-bucket pack window + offsets join — and p2 consumes
          // this frame again for its sequence count; one
          // instance-sized materialization serves all three readers.
          // (`materializeFinal = false` is the plan-inspection twin.)
          .transform(df => if (materializeFinal) df.localCheckpoint(true) else df)
          .orderBy("pos")
  }

  // p1b — the STREAMING serve loop (VERDICT r11 #9): p1 streams only
  // the ingest leg and then builds the serve indexes once, batch-style;
  // a production refresh loop re-serves after EVERY micro-batch, which
  // means the index trio must be kept in sync with the prepared corpus
  // as keepers arrive AND as later batches displace earlier keepers
  // (a smaller-id exact twin demotes an old keeper — the cross-batch
  // case with no per-batch shortcut). Each foreachBatch therefore:
  // refresh → diff the prepared keeper set against each index's live
  // membership → remove the displaced, add the new (both idempotent:
  // the services' ledger anti-joins make re-delivered syncs no-ops) →
  // run the full decontaminate→plan→pack serve ON THE OPEN STREAM'S
  // state. The gate returns the FINAL serve; its oracle is p1's flat
  // recompute VERBATIM — pinning that N per-batch incremental
  // maintenance rounds land bit-for-bit on the one-shot batch build.
  private val p1bq: Q =
    Q("p1b_pipeline_stream_serve",
      (s, d) => {
        val tag = d.replaceAll("[^A-Za-z0-9]", "_")
        val root = new java.io.File(sys.props("java.io.tmpdir"),
          s"graft_pipeline_p1b/$tag/${graft.Sessions.sessionTag(s)}").getAbsolutePath
        val state = s"$root/state"
        val tIdx = s"$root/textidx"
        val vIdx = s"$root/vecidx"
        val marker = s"graft_p1b_marker_$tag"
        if (!s.catalog.tableExists(marker)) {
          val docs = Tables.documents(s, d)
          val landing = s"$root/landing"
          (0 until 3).foreach { i =>
            docs.where(col("doc_id") % 3 === i).coalesce(1)
              .write.mode("append").parquet(landing)
          }
          val cents = Tables.embeddings(s, d).where(col("vec_id") < 16)
            .orderBy("vec_id").select("embedding").collect()
            .map(_.getSeq[Float](0).map(_.toDouble).toArray)
          val capture = s"$root/capture"
          // one micro-batch of the production loop: ingest + sync + (a
          // serve would run here; the gate measures the final one)
          def serveBatch(ss: org.apache.spark.sql.SparkSession, bid: Long): Unit = {
            CorpusRefresh.refresh(ss, state,
              ss.read.parquet(s"$capture/b$bid"),
              batchId = Some(s"p1b_$bid"))
            val prep = CorpusRefresh.prepared(ss, state)
              .select(col("doc_id"), col("redacted"))
            TextIndex.remove(ss, tIdx, TextIndex.liveDocIds(ss, tIdx)
              .join(prep.select("doc_id"), Seq("doc_id"), "left_anti"))
            TextIndex.add(ss, tIdx,
              prep.select(col("doc_id"), col("redacted").as("text")))
            val members = Tables.embeddings(ss, d).select("vec_id", "embedding")
              .join(prep.select(col("doc_id").as("vec_id")),
                Seq("vec_id"), "left_semi")
            if (VectorIndex.liveIds(ss, vIdx).isEmpty)
              VectorIndex.buildWith(ss, vIdx, members, cents)
            else {
              VectorIndex.remove(ss, vIdx, VectorIndex.liveIds(ss, vIdx)
                .join(members.select("vec_id"), Seq("vec_id"), "left_anti"))
              VectorIndex.add(ss, vIdx, members)
            }
          }
          val stream = s.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1).parquet(landing)
          val q = stream.writeStream
            .option("checkpointLocation", s"$root/ckpt")
            .foreachBatch { (df: DataFrame, bid: Long) =>
              df.write.mode("overwrite").parquet(s"$capture/b$bid")
              serveBatch(df.sparkSession, bid)
            }.start()
          try q.processAllAvailable() finally q.stop()
          // the crash window: the last batch RE-DELIVERED end to end —
          // refresh no-ops on its ledger tag, every index sync anti-join
          // finds nothing to move
          val lastBid = new java.io.File(capture).listFiles()
            .map(_.getName.stripPrefix("b").toLong).max
          serveBatch(s, lastBid)
          s.emptyDataFrame.createOrReplaceTempView(marker)
        }
        servePacked(s, d, state, tIdx, vIdx)
      },
      Some(oracleSql))

  // The pipeline taken to its true end state: p1's packed token stream
  // cut into fixed-size training SHARDS (c13's writer arithmetic over
  // p1's output instead of the raw table) — stream ingest →
  // decontaminate → plan → order+pack → shard. One more bounded
  // hierarchical permutation (md5 over the global sequence ids, bucket
  // offsets on a ≤256-row aggregate); the oracle extends p1's flat
  // recompute with the same four CTEs, so the hash pins the WHOLE
  // composition end-to-end.
  private val p2q: Q =
    Q("p2_pipeline_shards",
      (s, d) => {
        val S = 16L
        val packed = p1q.fn(s, d)
        val nseq = packed.agg(sum("n_tokens").as("t"))
          .select(expr(s"(t + ${L - 1}) div $L").as("n_seqs"))
        // n_seqs > 0 guard: sequence(0, -1) descends (phantom seqs)
        val seqs = nseq.where(col("n_seqs") > 0)
          .select(explode(expr("sequence(cast(0 as bigint), n_seqs - 1)")).as("seq"))
          .withColumn("h", md5(concat(lit("s:"), col("seq").cast("string"))))
          .withColumn("bucket",
            conv(substring(col("h"), 1, 2), 16, 10).cast("long"))
        val wOff = Window.orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, -1)
        val offsets = seqs.groupBy("bucket")
          .agg(count(lit(1)).as("b_n"))
          .withColumn("b_start", coalesce(sum("b_n").over(wOff), lit(0L)))
          .select("bucket", "b_start")
        val wIn = Window.partitionBy("bucket").orderBy("h", "seq")
        seqs.join(offsets, Seq("bucket"))
          .withColumn("spos", col("b_start") + row_number().over(wIn) - 1)
          .select(col("seq"),
            expr(s"spos div $S").as("shard_id"),
            expr(s"spos % $S").as("pos_in_shard"),
            (col("seq") * L).as("token_offset"))
          .orderBy("shard_id", "pos_in_shard")
      },
      Some(oracleCtes + s""",
        tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS t FROM packed),
        nseq AS (SELECT (t + ${L - 1}) // $L AS n_seqs FROM tot),
        sseqs AS (SELECT CAST(unnest(range(0, n_seqs)) AS BIGINT) AS seq FROM nseq),
        shh AS (SELECT seq, md5('s:' || CAST(seq AS VARCHAR)) AS h2s FROM sseqs),
        shp AS (SELECT seq, row_number() OVER (ORDER BY h2s, seq) - 1 AS spos FROM shh)
        SELECT seq, CAST(spos // 16 AS BIGINT) AS shard_id,
          CAST(spos % 16 AS BIGINT) AS pos_in_shard,
          CAST(seq * $L AS BIGINT) AS token_offset
        FROM shp ORDER BY shard_id, pos_in_shard"""))

  val all: Seq[Q] = Seq(p1q, p1bq, p2q)

  /** The flat recompute: prep CTEs → BM25 top-20 → IVF probe → c11
    * greedy → one-ORDER-BY permutation → running-sum pack. */
  private def oracleSql: String = oracleCtes + s"""
        SELECT doc_id, rep, pos, n_tokens, start_off,
          start_off // $L AS first_seq,
          (start_off + n_tokens - 1) // $L AS last_seq
        FROM packed ORDER BY pos"""

  /** Everything up to the `packed` CTE — shared by p1's final select
    * and p2's shard extension. */
  private def oracleCtes: String = {
    val tfCols = Terms.map(t =>
      s"CAST(len(list_filter(t, x -> x = '$t')) AS INT) AS tf_$t")
      .mkString(",\n            ")
    val dfCols = Terms.map(t =>
      s"SUM(CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END) AS df_$t")
      .mkString(",\n            ")
    val parts = Terms.map(t =>
      s"""((n_docs - df_$t + 0.5e0) / (df_$t + 0.5e0)) *
              (tf_$t * 2.2e0) /
              (tf_$t + 1.2e0 * (0.25e0 + 0.75e0 * (dl / (sum_dl / n_docs))))""")
      .mkString(" +\n          ")
    CorpusEtl.corpusPrepCtes("documents") + s""",
        bm_doc AS (
          SELECT doc_id, CAST(len(t) AS INT) AS dl,
            $tfCols
          FROM (SELECT doc_id, string_split(lower(redacted), ' ') AS t
                FROM prep)),
        bm_stats AS (
          SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl,
            $dfCols
          FROM bm_doc),
        bm AS MATERIALIZED (
          SELECT doc_id FROM (
            SELECT doc_id, $parts AS bm25 FROM bm_doc, bm_stats)
          WHERE bm25 > 0 ORDER BY bm25 DESC, doc_id LIMIT $TopK),
        vcents AS (
          SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cent_id,
            embedding AS ce
          FROM embeddings WHERE vec_id < 16),
        vscored AS (
          SELECT e.vec_id, e.embedding, cent_id,
            ${duckSqL2("ce", "e.embedding")} AS vdist
          FROM embeddings e CROSS JOIN vcents),
        vranked AS MATERIALIZED (
          SELECT *, row_number() OVER (PARTITION BY vec_id
                      ORDER BY vdist, cent_id) AS rn FROM vscored),
        vassigned AS (
          SELECT v.vec_id, v.embedding, v.cent_id AS cell
          FROM vranked v JOIN prep p ON v.vec_id = p.doc_id WHERE rn = 1),
        vprobes AS (
          SELECT vec_id AS qid, embedding AS qe, cent_id AS cell
          FROM vranked WHERE vec_id < 8 AND rn <= 2),
        vcand AS (
          SELECT qid, a.vec_id AS nid, ${duckCos("qe", "a.embedding")} AS cos_sim
          FROM vprobes p JOIN vassigned a
            ON p.cell = a.cell AND a.vec_id <> p.qid),
        sem AS MATERIALIZED (
          SELECT DISTINCT nid FROM (
            SELECT *, row_number() OVER (PARTITION BY qid
                        ORDER BY cos_sim DESC, nid) AS rnk FROM vcand)
          WHERE rnk <= 5),
        clean AS MATERIALIZED (
          SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens
          FROM prep
          WHERE doc_id NOT IN (SELECT doc_id FROM bm)
            AND doc_id NOT IN (SELECT nid FROM sem)),
        pdocs AS MATERIALIZED (
          SELECT doc_id, lang AS source, n_tokens,
            md5(CAST(doc_id AS VARCHAR)) AS h
          FROM clean),
        psrc AS (SELECT source, SUM(n_tokens) AS src_tokens
          FROM pdocs GROUP BY source),
        ptot AS (SELECT SUM(src_tokens) AS all_tokens, COUNT(*) AS n_src
          FROM psrc),
        pplan AS (SELECT source,
            ((SELECT all_tokens FROM ptot) * 2) // (SELECT n_src FROM ptot)
              AS target_s, src_tokens
          FROM psrc),
        pp2 AS (SELECT source, target_s // src_tokens AS full_epochs,
            target_s % src_tokens AS rem FROM pplan),
        pcum AS (SELECT doc_id, source, n_tokens,
            COALESCE(SUM(n_tokens) OVER (PARTITION BY source
              ORDER BY h, doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev
          FROM pdocs),
        reps AS (SELECT c.doc_id, c.n_tokens,
            CAST(p.full_epochs +
              CASE WHEN c.prev < p.rem THEN 1 ELSE 0 END AS BIGINT) AS repeats
          FROM pcum c JOIN pp2 p USING (source)),
        inst AS (SELECT doc_id, n_tokens,
            CAST(unnest(range(0, repeats)) AS BIGINT) AS rep
          FROM reps WHERE repeats > 0),
        ordr AS (SELECT doc_id, n_tokens, rep,
            md5(CAST(rep AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)) AS h2
          FROM inst),
        posd AS (SELECT *, row_number() OVER (ORDER BY h2, doc_id, rep) AS pos
          FROM ordr),
        packed AS MATERIALIZED (SELECT *,
            CAST(SUM(n_tokens) OVER (ORDER BY pos
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
              - n_tokens AS start_off
          FROM posd)"""
  }
}
