package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.{Components, Q, Redact, TextOps}

/** Tuning knobs for [[CorpusEtl.prepare]].
  *
  * @param minTokens     drop documents with fewer whitespace tokens
  * @param maxDup2gFrac  Gopher-style duplicate-2-gram ceiling
  * @param maxDup3gFrac  Gopher-style duplicate-3-gram ceiling
  * @param maxTopTokFrac most-frequent-token fraction ceiling
  * @param minJaccard    near-dup edge threshold; candidate generation
  *                      floors this at 0.05 (below that a pair must still
  *                      share a MinHash band to be seen at all)
  */
final case class CorpusEtlConfig(
    minTokens: Int = 5,
    maxDup2gFrac: Double = 0.9,
    maxDup3gFrac: Double = 0.8,
    maxTopTokFrac: Double = 0.2,
    minJaccard: Double = 0.05) {
  require(minJaccard >= 0.05,
    "candidate generation floors pairs at jaccard 0.05 (LSH recall limit)")
}

/** The composed corpus-preparation pipeline — the LLM-training analog of
  * `Oracle.runEtl`: one production entry point that strings the
  * individually-gated operators into the standard prepare-a-corpus job:
  *
  *  1. repetition/quality filter ([[TextOps.repetitionStats]], t6) —
  *     map-side stats + one doc_id-keyed count, cheapest first so
  *     everything downstream sees fewer rows;
  *  2. exact dedup (d1 shape) — one shuffle on the md5 content digest,
  *     `min(doc_id)` keeper per hash;
  *  3. near-dup dedup — MinHash-LSH verified Jaccard pairs
  *     ([[TextOps.jaccardPairsOf]], d2 shape) over the survivors, then
  *     hash-min connected components ([[Components.connectedComponents]],
  *     d7 shape); only each cluster's minimum doc_id survives;
  *  4. PII scrub ([[Redact.scrub]], r1 shape) — LAST, so content hashes
  *     and shingles upstream see the raw bytes and the scrub cost is paid
  *     only for kept documents.
  *
  * Every stage is the plan shape already proven 100 TB-safe by its
  * standalone gate: the only pairwise step is LSH-bucketed, the only
  * iteration is lineage-truncated, and nothing touches the driver. The
  * whole pipeline is ONE DataFrame program — Catalyst sees it end to end,
  * so the filter prunes the scan and the scrub runs fused over the final
  * keeper set.
  *
  * Gated end-to-end as `c1_corpus_prep` against a DuckDB oracle that
  * recomputes the same composition (recursive-CTE transitive closure for
  * the clustering step, like d7).
  */
object CorpusEtl {

  /** Run the pipeline over `(doc_id, lang, text, …)` documents.
    *
    * The filter+dedup survivor frame is materialized once because two
    * plan subtrees consume it (the pair-generation pipeline and the
    * final keeper join) — without it the corpus scan AND the stats
    * aggregation run twice. Same two modes as `DwmlFlatten.flattenAll`:
    * default eager `localCheckpoint` (blocks auto-released, but an
    * executor loss aborts the job), `reliableCache = true` →
    * `persist(MEMORY_AND_DISK)` (recomputable from lineage; stays
    * pinned until `clearCache()`).
    *
    * @return one row per kept (canonical) document: doc_id, lang,
    *         n_tokens, n_copies (exact duplicates it represents),
    *         cluster_size (near-dup cluster it represents, 1 if unique),
    *         n_emails/n_phones/n_ssns (PII redacted from it), redacted
    *         (the scrubbed text).
    */
  def prepare(docs: DataFrame,
      cfg: CorpusEtlConfig = CorpusEtlConfig(),
      reliableCache: Boolean = false): DataFrame = {
    // 1. repetition filter: stats are doc_id-keyed, one join back to text
    val stats = TextOps.repetitionStats(docs)
      .where(col("n_tokens") >= cfg.minTokens &&
        col("dup_2g_frac") <= cfg.maxDup2gFrac &&
        col("dup_3g_frac") <= cfg.maxDup3gFrac &&
        col("top_tok_frac") <= cfg.maxTopTokFrac)
      .select("doc_id", "n_tokens")
    val kept = docs.join(stats, Seq("doc_id"))

    // 2. exact dedup: keeper + represented-copy count per content digest.
    // One window over the digest does both in a SINGLE corpus shuffle —
    // the agg + join-back-on-doc_id alternative (d1's reporting shape)
    // shuffles the corpus twice.
    val byHash = Window.partitionBy("content_hash")
    val survivorsBase = kept
      .withColumn("content_hash", md5(col("text")))
      .withColumn("n_copies", count(lit(1)).over(byHash).cast("int"))
      .withColumn("__rn", row_number().over(byHash.orderBy("doc_id")))
      .where(col("__rn") === 1)
      .drop("__rn", "content_hash")
    val survivors =
      if (reliableCache)
        survivorsBase.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else survivorsBase.localCheckpoint(true)

    // 3. near-dup clustering on the survivors; a doc in no pair is its
    // own (size-1) cluster, so components join LEFT and label-coalesce
    val pairs = TextOps.jaccardPairsOf(survivors)
      .where(col("jaccard") >= cfg.minJaccard)
      .select("doc_a", "doc_b")
    val comp = Components.connectedComponents(pairs)
      .withColumnRenamed("node", "doc_id")
    val sizes = comp.groupBy("component")
      .agg(count(lit(1)).cast("int").as("cluster_size"))
    val canonical = survivors
      .join(comp, Seq("doc_id"), "left")
      .withColumn("component", coalesce(col("component"), col("doc_id")))
      .where(col("doc_id") === col("component"))
      .join(sizes, Seq("component"), "left")
      .withColumn("cluster_size", coalesce(col("cluster_size"), lit(1)))

    // 4. PII scrub, only on what survived
    Redact.scrub(canonical)
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("n_copies"),
        col("cluster_size"), col("n_emails"), col("n_phones"), col("n_ssns"),
        col("redacted"))
  }

  /** c1/c1b/c1c's shared oracle — the full from-scratch composition in
    * DuckDB (recursive-CTE closure for the clustering step), over `src`.
    * c1 runs [[prepare]] one-shot on the whole table; c1b must land on
    * the IDENTICAL output from the incremental [[CorpusRefresh]] state;
    * c1c from the refresh state AFTER a takedown — its oracle is the
    * from-scratch run on the SURVIVING subset. */
  /** The corpus-prep oracle's CTE chain over `src`, ending in a `prep`
    * CTE that exposes the kept canonical documents WITH their redacted
    * text — shared by the c1 family (which hashes the text in its final
    * projection) and the p1 end-to-end pipeline gate (which keeps
    * tokenizing it downstream). */
  private[llm] def corpusPrepCtes(src: String): String = s"""WITH RECURSIVE tok AS (
          SELECT doc_id, lang, text, string_split(lower(text), ' ') AS t
          FROM $src),
        g AS (SELECT doc_id,
            CAST(len(t) AS INT) AS n_tokens,
            CAST(len(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS INT) AS n_2g,
            CAST(len(list_distinct(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1]))) AS INT) AS n_2g_d,
            CAST(len(list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS INT) AS n_3g,
            CAST(len(list_distinct(list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS INT) AS n_3g_d
          FROM tok),
        tc AS (SELECT doc_id, CAST(MAX(c) AS INT) AS top_cnt FROM (
            SELECT doc_id, tok, COUNT(*) AS c
            FROM (SELECT doc_id, unnest(t) AS tok FROM tok)
            GROUP BY doc_id, tok)
          GROUP BY doc_id),
        kept AS (
          SELECT tok.doc_id, lang, text, n_tokens
          FROM tok JOIN g ON tok.doc_id = g.doc_id JOIN tc ON tok.doc_id = tc.doc_id
          WHERE n_tokens >= 5
            AND (CASE WHEN n_2g = 0 THEN 0.0
                 ELSE CAST(n_2g - n_2g_d AS DOUBLE) / CAST(n_2g AS DOUBLE) END) <= 0.9
            AND (CASE WHEN n_3g = 0 THEN 0.0
                 ELSE CAST(n_3g - n_3g_d AS DOUBLE) / CAST(n_3g AS DOUBLE) END) <= 0.8
            AND CAST(top_cnt AS DOUBLE) / CAST(n_tokens AS DOUBLE) <= 0.2),
        ex AS (SELECT MIN(doc_id) AS doc_id, CAST(COUNT(*) AS INT) AS n_copies
               FROM kept GROUP BY md5(text)),
        exk AS (SELECT k.doc_id, k.lang, k.text, k.n_tokens, e.n_copies
                FROM kept k JOIN ex e ON k.doc_id = e.doc_id),
        sig AS (${TextOps.duckSigsFrom("exk")}),
        bands AS (SELECT doc_id, k AS band, sigs[k + 1] AS mh FROM sig, range(0, 8) t(k)),
        cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                 FROM bands a JOIN bands b
                   ON a.band = b.band AND a.mh = b.mh AND a.doc_id < b.doc_id),
        sh AS (SELECT doc_id, ${TextOps.duckShingles} AS s
               FROM (SELECT doc_id, string_split(lower(text), ' ') AS t FROM exk)),
        pairs AS (SELECT doc_a, doc_b FROM (
            SELECT doc_a, doc_b,
              CAST(CAST(len(list_intersect(a.s, b.s)) AS INT) AS DOUBLE) /
                CAST(len(a.s) + len(b.s) - CAST(len(list_intersect(a.s, b.s)) AS INT) AS DOUBLE) AS jaccard
            FROM cand JOIN sh a ON cand.doc_a = a.doc_id
                      JOIN sh b ON cand.doc_b = b.doc_id)
          WHERE jaccard >= 0.05),
        edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
                  UNION SELECT doc_b, doc_a FROM pairs),
        reach(u, v) AS (
          SELECT u, u FROM (SELECT DISTINCT u FROM edges)
          UNION
          SELECT e.u, r.v FROM edges e JOIN reach r ON e.v = r.u),
        comp AS (SELECT u AS doc_id, MIN(v) AS component FROM reach GROUP BY u),
        cs AS (SELECT component, CAST(COUNT(*) AS INT) AS cluster_size
               FROM comp GROUP BY component),
        prep AS MATERIALIZED (
          SELECT exk.doc_id, exk.lang, exk.n_tokens, exk.n_copies,
            COALESCE(cs.cluster_size, 1) AS cluster_size,
            regexp_replace(regexp_replace(regexp_replace(exk.text,
              '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
              '\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b', '<SSN>', 'g'),
              '\\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\\b', '<PHONE>', 'g') AS redacted
          FROM exk
          LEFT JOIN comp ON exk.doc_id = comp.doc_id
          LEFT JOIN cs ON COALESCE(comp.component, exk.doc_id) = cs.component
          WHERE COALESCE(comp.component, exk.doc_id) = exk.doc_id)"""

  private def corpusPrepSqlFrom(src: String): String =
    corpusPrepCtes(src) + """
        SELECT doc_id, lang, n_tokens, n_copies, cluster_size,
          md5(redacted) AS redacted_md5
        FROM prep ORDER BY doc_id"""

  private lazy val corpusPrepSql: String = corpusPrepSqlFrom("documents")

  /** c1c's removal predicate, shared verbatim by the Spark fixture and
    * the DuckDB oracle's surviving-subset source. The test tables carry
    * no byte-identical documents, so this gate exercises unique-doc
    * removal, near-dup cluster membership/canonical changes, and the
    * full refresh→remove→compact composition against the oracle; the
    * exact-twin KEEPER HANDOVER class (impossible to reach here) is
    * pinned bit-for-bit by CorpusRefreshSpec's crafted fixture. */
  private[graft] val TakedownMod = 7L
  private[graft] val TakedownRem = 3L

  /** The c1 correctness gate: [[prepare]] at default config, with the
    * redacted text surfaced as its md5 (byte-exact cross-engine, and the
    * driver compare can't sort long strings with embedded newlines). */
  val all: Seq[Q] = Seq(
    Q("c1_corpus_prep",
      (s, d) => prepare(Tables.documentsSpread(s, d))
        .select(col("doc_id"), col("lang"), col("n_tokens"), col("n_copies"),
          col("cluster_size"), md5(col("redacted")).as("redacted_md5"))
        .orderBy("doc_id"),
      Some(corpusPrepSql)),

    // c1's INCREMENTAL twin: the same prepared corpus served from the
    // CorpusRefresh state after feeding the table in two batches —
    // yesterday's prep + today's batch, no from-scratch recompute. The
    // oracle is c1's own full-recompute SQL on the union, so the gate
    // pins the refresh composition end-to-end: per-batch filter/hash/
    // MinHash work, the exact-merge (keeper min + copy counts across
    // batches), pair accumulation through the dedup index (cross-batch
    // candidates included), per-refresh re-clustering, and scrub reuse.
    // Session-memoized state dir (v9b's discipline); CorpusRefreshSpec
    // additionally proves the Spark-vs-Spark bit-for-bit equality,
    // demotion and crash-replay cases this fixture can't force.
    Q("c1b_corpus_prep_incremental",
      (s, d) => {
        val tag = d.replaceAll("[^A-Za-z0-9]", "_")
        val dir = new java.io.File(sys.props("java.io.tmpdir"),
          s"graft_corpus_refresh/$tag/${graft.Sessions.sessionTag(s)}").getAbsolutePath
        val marker = s"graft_c1b_marker_$tag"
        if (!s.catalog.tableExists(marker)) {
          val docs = Tables.documentsSpread(s, d)
          CorpusRefresh.refresh(s, dir, docs.where(col("doc_id") % 2 === 1))
          CorpusRefresh.refresh(s, dir, docs.where(col("doc_id") % 2 === 0))
          s.emptyDataFrame.createOrReplaceTempView(marker)
        }
        CorpusRefresh.prepared(s, dir)
          .select(col("doc_id"), col("lang"), col("n_tokens"), col("n_copies"),
            col("cluster_size"), md5(col("redacted")).as("redacted_md5"))
          .orderBy("doc_id")
      },
      Some(corpusPrepSql)),

    // The TAKEDOWN gate: feed the table in two batches (with batch ids —
    // one batch deliberately RE-FED to prove the idempotence ledger
    // no-ops it), remove a slice of documents, compact the whole state,
    // and the served corpus must equal the from-scratch prepare on the
    // SURVIVING union — the oracle is c1's own full-recompute SQL on the
    // subset. This pins the takedown composition end-to-end: removals
    // leaving the MinHash index, near-dup clusters re-shaping around
    // removed members, scrub/pair state filtering, and compaction
    // preserving it all. (The exact-twin keeper-handover class can't
    // occur here — the table has no byte-identical docs — and is pinned
    // Spark-vs-Spark by CorpusRefreshSpec's crafted fixture.)
    Q("c1c_corpus_prep_takedown",
      (s, d) => {
        val tag = d.replaceAll("[^A-Za-z0-9]", "_")
        val dir = new java.io.File(sys.props("java.io.tmpdir"),
          s"graft_corpus_takedown/$tag/${graft.Sessions.sessionTag(s)}").getAbsolutePath
        val marker = s"graft_c1c_marker_$tag"
        if (!s.catalog.tableExists(marker)) {
          val docs = Tables.documentsSpread(s, d)
          CorpusRefresh.refresh(s, dir, docs.where(col("doc_id") % 2 === 1),
            batchId = Some("odd"))
          CorpusRefresh.refresh(s, dir, docs.where(col("doc_id") % 2 === 0),
            batchId = Some("even"))
          // at-least-once feed: the committed batch re-delivers — the
          // marker-recorded id must make this a no-op, not a double-count
          CorpusRefresh.refresh(s, dir, docs.where(col("doc_id") % 2 === 0),
            batchId = Some("even"))
          CorpusRefresh.remove(s, dir,
            docs.where(col("doc_id") % TakedownMod === TakedownRem)
              .select("doc_id"))
          CorpusRefresh.compact(s, dir)
          s.emptyDataFrame.createOrReplaceTempView(marker)
        }
        CorpusRefresh.prepared(s, dir)
          .select(col("doc_id"), col("lang"), col("n_tokens"), col("n_copies"),
            col("cluster_size"), md5(col("redacted")).as("redacted_md5"))
          .orderBy("doc_id")
      },
      Some(corpusPrepSqlFrom(
        s"(SELECT * FROM documents WHERE doc_id % $TakedownMod <> $TakedownRem)"))),

    // The STREAMING ingest path of the same refresh state: documents
    // land as files, a Structured Streaming file source feeds them
    // through foreachBatch → [[CorpusRefresh.refresh]] one micro-batch
    // at a time (maxFilesPerTrigger=1), each refresh keyed by the
    // stream's epoch id — the standard exactly-once recipe: the sink
    // (refresh's batch-tag ledger) dedupes on the (replayable) batch id,
    // so at-least-once delivery composes to exactly-once state. The
    // gate proves that composition with a REAL redelivery: each
    // micro-batch is captured to disk as it streams, and after the
    // drain the LAST batch is re-fed verbatim under its own id — the
    // foreachBatch crash-window (state committed, checkpoint not yet
    // advanced, batch replayed on restart). Served corpus must equal
    // the from-scratch batch prepare on the full table — c1's oracle.
    Q("c1d_corpus_prep_stream",
      (s, d) => {
        val tag = d.replaceAll("[^A-Za-z0-9]", "_")
        val dir = new java.io.File(sys.props("java.io.tmpdir"),
          s"graft_corpus_stream/$tag/${graft.Sessions.sessionTag(s)}").getAbsolutePath
        val marker = s"graft_c1d_marker_$tag"
        if (!s.catalog.tableExists(marker)) {
          val docs = Tables.documents(s, d)
          val landing = s"$dir/landing"
          // three landed files → three micro-batches
          (0 until 3).foreach { i =>
            docs.where(col("doc_id") % 3 === i).coalesce(1)
              .write.mode("append").parquet(landing)
          }
          val state = s"$dir/state"
          val capture = s"$dir/capture"
          val stream = s.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1).parquet(landing)
          val q = stream.writeStream
            .option("checkpointLocation", s"$dir/ckpt")
            .foreachBatch { (df: DataFrame, bid: Long) =>
              val ss = df.sparkSession
              df.write.mode("overwrite").parquet(s"$capture/b$bid")
              CorpusRefresh.refresh(ss, state,
                ss.read.parquet(s"$capture/b$bid"),
                batchId = Some(s"stream_$bid"))
            }.start()
          try q.processAllAvailable() finally q.stop()
          // redelivery of the final committed batch (crash before the
          // checkpoint advanced): the ledger must no-op it
          val lastBid = new java.io.File(capture).listFiles()
            .map(_.getName.stripPrefix("b").toLong).max
          CorpusRefresh.refresh(s, state,
            s.read.parquet(s"$capture/b$lastBid"),
            batchId = Some(s"stream_$lastBid"))
          s.emptyDataFrame.createOrReplaceTempView(marker)
        }
        CorpusRefresh.prepared(s, s"$dir/state")
          .select(col("doc_id"), col("lang"), col("n_tokens"), col("n_copies"),
            col("cluster_size"), md5(col("redacted")).as("redacted_md5"))
          .orderBy("doc_id")
      },
      Some(corpusPrepSql)),

    // Deterministic train/val/test split: bucket = first byte of
    // md5(doc_id), train < 230 (~89.8%), val < 243 (~5.1%), test
    // otherwise. Hash-based assignment is the production shape — stable
    // under re-runs, shard-count changes, and late-arriving data (no
    // row_number over a global sort, which would be a single-partition
    // bottleneck and reshuffle membership whenever the corpus grows).
    // Map-side bucket + one tiny 3-group aggregate; per-split stats
    // make the gate verify every membership without emitting 100 TB.
    Q("c2_train_split",
      (s, d) => Tables.documentsSpread(s, d)
        .withColumn("bucket",
          expr("cast(conv(substring(md5(cast(doc_id as string)), 1, 2), 16, 10) as int)"))
        .withColumn("split",
          when(col("bucket") < 230, "train")
            .when(col("bucket") < 243, "val").otherwise("test"))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast("long").as("sum_chars"),
          sum(col("doc_id")).cast("long").as("id_sig"))
        .orderBy("split"),
      Some("""WITH b AS (
          SELECT doc_id, n_chars,
            (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)),1,1))-1)*16 +
            (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)),2,1))-1) AS bucket
          FROM documents)
        SELECT CASE WHEN bucket < 230 THEN 'train'
                    WHEN bucket < 243 THEN 'val' ELSE 'test' END AS split,
          COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
          CAST(SUM(doc_id) AS BIGINT) AS id_sig
        FROM b GROUP BY 1 ORDER BY split""")),

    // Source-mixing weights: the per-source resampling factor that makes
    // the corpus mixture uniform across sources (the "data mixing" step
    // a training pipeline runs after dedup — weight > 1 means upsample /
    // repeat epochs, < 1 means downsample). One groupBy on the
    // low-cardinality source key (partial aggregation collapses it
    // map-side at any scale), then the 1-row totals broadcast back —
    // the weight is a single division of exact longs, so it hash-matches
    // bit-exactly cross-engine.
    Q("c3_source_mix",
      (s, d) => {
        val per = Tables.documentsSpread(s, d).groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).cast("long").as("sum_chars"))
        val totals = per.agg(sum(col("n_docs")).as("n_total"),
          count(lit(1)).as("k_sources"))
        per.crossJoin(broadcast(totals))
          .select(col("source"), col("n_docs"), col("sum_chars"),
            (col("n_total") / (col("k_sources") * col("n_docs")))
              .as("mix_weight"))
          .orderBy("source")
      },
      Some("""WITH per AS (
          SELECT source, COUNT(*) AS n_docs,
            CAST(SUM(n_chars) AS BIGINT) AS sum_chars
          FROM documents GROUP BY source),
        totals AS (SELECT SUM(n_docs) AS n_total, COUNT(*) AS k_sources FROM per)
        SELECT source, n_docs, sum_chars,
          n_total / (k_sources * n_docs) AS mix_weight
        FROM per, totals ORDER BY source""")),

    // Corpus composition report: per-language AND per-source document
    // counts in ONE pass — GROUPING SETS ((lang),(source)) lowers to a
    // single Expand over a single scan (each row fans out once per
    // grouping set), where the naive report would scan the corpus once
    // per dimension. The dim discriminator comes from GROUPING(), the
    // portable way to tell which set a row belongs to.
    Q("c4_corpus_report",
      (s, d) => {
        Tables.documentsSpread(s, d).createOrReplaceTempView("c4_documents")
        s.sql("""SELECT
            CASE WHEN GROUPING(lang) = 0 THEN 'lang' ELSE 'source' END AS dim,
            COALESCE(lang, source) AS key, COUNT(*) AS n_docs,
            CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
            CAST(MIN(n_chars) AS INT) AS min_chars,
            CAST(MAX(n_chars) AS INT) AS max_chars
          FROM c4_documents GROUP BY GROUPING SETS ((lang), (source))
          ORDER BY dim, key""")
      },
      Some("""SELECT
          CASE WHEN GROUPING(lang) = 0 THEN 'lang' ELSE 'source' END AS dim,
          COALESCE(lang, source) AS key, COUNT(*) AS n_docs,
          CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
          CAST(MIN(n_chars) AS INT) AS min_chars,
          CAST(MAX(n_chars) AS INT) AS max_chars
        FROM documents GROUP BY GROUPING SETS ((lang), (source))
        ORDER BY dim, key""")),

    // Deterministic weighted stratified sampling: per language, keep the
    // 3 documents with the smallest hash-priority u/w (u = first 8 md5
    // hex digits of doc_id as an integer, w = n_chars) — longer
    // documents are proportionally favored, selection is a pure function
    // of the row (re-runs, shard moves, and appends never reshuffle the
    // kept set, unlike rand()-based sampling), and the fixed-size pick
    // is a partitioned top-k window, never a global sort. The priority
    // is one division of exact ints so both engines rank identically.
    Q("c5_stratified_sample",
      (s, d) => {
        val w = Window.partitionBy(col("lang"))
          .orderBy(col("priority"), col("doc_id"))
        Tables.documentsSpread(s, d)
          .withColumn("priority", expr(
            """cast(conv(substring(md5(cast(doc_id as string)), 1, 8), 16, 10) as bigint)
               / n_chars"""))
          .withColumn("rk", row_number().over(w))
          .where(col("rk") <= 3)
          .select(col("lang"), col("rk"), col("doc_id"), col("n_chars"),
            col("priority"))
          .orderBy("lang", "rk")
      },
      Some("""SELECT lang, CAST(rk AS INT) AS rk, doc_id, n_chars, priority FROM (
          SELECT lang, doc_id, n_chars,
            ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
              / n_chars AS priority,
            ROW_NUMBER() OVER (PARTITION BY lang
                               ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                                        / n_chars, doc_id) AS rk
          FROM documents)
        WHERE rk <= 3 ORDER BY lang, rk""")),

    // c6 — sequence packing (concatenate-and-chunk): lay each source's
    // token stream end-to-end and record, per document, its start
    // offset and the fixed-length (512-token here) training sequences it spans — the last
    // packaging step before tokenized shards are written.
    //
    // The cumulative sum is HIERARCHICAL, not one window per source: a
    // single source at 100 TB would otherwise become one window
    // partition on one task. Documents bucket by `doc_id div 10000`;
    // the in-bucket cumsum window is bounded (≤10k rows per partition
    // at any corpus size), bucket totals are a tiny aggregate whose
    // own prefix-sum window is one row per bucket, and the final start
    // offset is in-bucket prefix + bucket base — same numbers as the
    // global window, bounded partitions everywhere. Offsets are exact
    // longs; chunk ids are integer division.
    Q("c6_sequence_pack",
      (s, d) => {
        val L = 512
        val docs = Tables.documentsSpread(s, d)
          .select(col("doc_id"), col("source"),
            size(split(lower(col("text")), " ")).cast("long").as("n_tokens"),
            expr("doc_id div 10000").as("bucket"))
        val wIn = Window.partitionBy("source", "bucket").orderBy("doc_id")
        val within = docs.withColumn("cum_in",
          sum(col("n_tokens")).over(wIn))
        val wBk = Window.partitionBy("source").orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, -1)
        val base = within.groupBy("source", "bucket")
          .agg(sum(col("n_tokens")).as("tot"))
          .withColumn("bucket_base", coalesce(sum(col("tot")).over(wBk), lit(0L)))
          .select("source", "bucket", "bucket_base")
        within.join(base, Seq("source", "bucket"))
          .withColumn("start_off", col("bucket_base") + col("cum_in") - col("n_tokens"))
          .select(col("doc_id"), col("source"), col("n_tokens"), col("start_off"),
            expr(s"start_off div $L").as("first_seq"),
            expr(s"(start_off + n_tokens - 1) div $L").as("last_seq"),
            (expr(s"(start_off + n_tokens - 1) div $L") -
              expr(s"start_off div $L") + 1L).as("n_seqs"))
          .orderBy("source", "doc_id")
      },
      Some("""WITH d AS (
          SELECT doc_id, source,
            CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tokens
          FROM documents),
        c AS (SELECT doc_id, source, n_tokens,
            -- SUM(BIGINT) OVER is HUGEINT in DuckDB; pin the schema
            CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
              - n_tokens AS start_off
          FROM d)
        SELECT doc_id, source, n_tokens, start_off,
          start_off // 512 AS first_seq,
          (start_off + n_tokens - 1) // 512 AS last_seq,
          (start_off + n_tokens - 1) // 512 - start_off // 512 + 1 AS n_seqs
        FROM c ORDER BY source, doc_id""")),

    // c7 — overlapping-window chunking: split each document's token
    // stream into fixed-size windows (L=128 tokens) advanced by a
    // stride (S=96, i.e. 32-token overlap) — the map-side op that turns
    // a long-document corpus into a retrieval/embedding corpus, and the
    // long-doc counterpart of c6's packing (c6 concatenates short docs
    // UP to L; c7 cuts long docs DOWN to L, keeping boundary context in
    // the overlap).
    //
    // Shape at scale: pure per-row fanout (sequence + posexplode-style
    // explode) — no shuffle at all except the output sort; each token
    // is replicated at most ⌈L/S⌉ ≈ 1.33× regardless of corpus size,
    // and chunk arithmetic is exact integer division (mirrored verbatim
    // in the oracle, so the gate is bit-exact). The chunk count per doc
    // is 1 + ⌈(n−L)/S⌉ — the last window is allowed to overlap its
    // predecessor by more than S so no token is ever dropped.
    Q("c7_chunk_overlap",
      (s, d) => {
        val L = 128; val S = 96
        Tables.documentsSpread(s, d)
          .select(col("doc_id"), split(lower(col("text")), " ").as("toks"))
          .withColumn("n_tokens", size(col("toks")).cast("long"))
          .withColumn("n_chunks", expr(
            s"case when n_tokens > $L then 1L + (n_tokens - $L + ${S - 1}) div $S else 1L end"))
          .withColumn("chunk_id", explode(expr("sequence(0L, n_chunks - 1L)")))
          .withColumn("tok_start", col("chunk_id") * S)
          .withColumn("tok_len", least(lit(L.toLong), col("n_tokens") - col("tok_start")))
          .select(col("doc_id"), col("chunk_id"), col("tok_start"), col("tok_len"),
            array_join(expr("slice(toks, cast(tok_start + 1 as int), cast(tok_len as int))"),
              " ").as("chunk_text"))
          .orderBy("doc_id", "chunk_id")
      },
      Some(s"""WITH d AS (
          SELECT doc_id, string_split(lower(text), ' ') AS toks,
            CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tokens
          FROM documents),
        c AS (SELECT doc_id, toks, n_tokens,
            unnest(range(0, CASE WHEN n_tokens > 128
                                 THEN 1 + (n_tokens - 128 + 95) // 96
                                 ELSE 1 END)) AS chunk_id
          FROM d)
        SELECT doc_id, chunk_id, chunk_id * 96 AS tok_start,
          LEAST(128, n_tokens - chunk_id * 96) AS tok_len,
          array_to_string(
            toks[CAST(chunk_id * 96 + 1 AS INT) :
                 CAST(chunk_id * 96 + LEAST(128, n_tokens - chunk_id * 96) AS INT)],
            ' ') AS chunk_text
        FROM c ORDER BY doc_id, chunk_id""")),

    // Temperature-based source mixing (the UniMax/mT5-shaped "sample
    // sources ∝ size^α" pass, α = 1/2 here): where c3 rebalances to a
    // UNIFORM mixture, c8 upweights small sources only partially —
    // weight ∝ sqrt(source size) — the standard compromise between
    // natural and uniform sampling for multi-source training corpora.
    // Determinism contract: sqrt is correctly-rounded IEEE in both
    // engines, and the weight is immediately QUANTIZED to a long
    // (floor(sqrt·100)), so total_w is an exact integer sum (a float
    // Σsqrt would be addition-order-dependent); every downstream ratio
    // (mix_share, upsample_factor) is ONE division of exact longs, and
    // the per-source keep threshold is pure integer arithmetic
    // ((n_total·w·256) div (total_w·n_docs), capped at 256 — sources
    // with factor ≥ 1 keep everything and repeat epochs instead).
    // Membership itself reuses c2's hash-bucket convention (first byte
    // of md5(doc_id)) — stable under re-runs and corpus growth, never a
    // global sort. Scale shape: one low-cardinality groupBy(source)
    // that collapses map-side, 1-row totals + per-source thresholds
    // broadcast back, and the sampling decision is a per-row map over
    // the scan; the integer products assume corpus counts ≪ 2^53 per
    // factor — at larger magnitudes the same ratios move to
    // DECIMAL(38) unchanged in shape.
    Q("c8_temperature_mix",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val per = docs.groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).cast("long").as("sum_chars"))
          .withColumn("weight",
            floor(sqrt(col("sum_chars").cast("double")) * 100).cast("long"))
        val totals = per.agg(sum(col("weight")).cast("long").as("total_w"),
          sum(col("n_docs")).cast("long").as("n_total"))
        val rated = per.crossJoin(broadcast(totals))
          .withColumn("mix_share",
            col("weight").cast("double") / col("total_w").cast("double"))
          .withColumn("upsample_factor",
            (col("n_total") * col("weight")).cast("double") /
              (col("total_w") * col("n_docs")).cast("double"))
          .withColumn("keep_buckets",
            least(lit(256L), expr("(n_total * weight * 256) div (total_w * n_docs)")))
        val kept = docs
          .withColumn("bucket",
            expr("cast(conv(substring(md5(cast(doc_id as string)), 1, 2), 16, 10) as int)"))
          .join(broadcast(rated.select("source", "keep_buckets")), Seq("source"))
          .where(col("bucket") < col("keep_buckets"))
          .groupBy("source").agg(count(lit(1)).as("n_sampled"))
        rated.join(kept, Seq("source"), "left")
          .select(col("source"), col("n_docs"), col("sum_chars"), col("weight"),
            col("mix_share"), col("upsample_factor"),
            coalesce(col("n_sampled"), lit(0L)).as("n_sampled"))
          .orderBy("source")
      },
      Some("""WITH per AS (
          SELECT source, COUNT(*) AS n_docs,
            CAST(SUM(n_chars) AS BIGINT) AS sum_chars
          FROM documents GROUP BY source),
        w AS (SELECT source, n_docs, sum_chars,
            CAST(floor(sqrt(CAST(sum_chars AS DOUBLE)) * 100) AS BIGINT) AS weight
          FROM per),
        totals AS (SELECT CAST(SUM(weight) AS BIGINT) AS total_w,
            CAST(SUM(n_docs) AS BIGINT) AS n_total FROM w),
        rated AS (
          SELECT source, n_docs, sum_chars, weight,
            CAST(weight AS DOUBLE) / CAST(total_w AS DOUBLE) AS mix_share,
            CAST(n_total * weight AS DOUBLE) / CAST(total_w * n_docs AS DOUBLE)
              AS upsample_factor,
            LEAST(256, (n_total * weight * 256) // (total_w * n_docs))
              AS keep_buckets
          FROM w, totals),
        b AS (
          SELECT source,
            (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)),1,1))-1)*16 +
            (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)),2,1))-1) AS bucket
          FROM documents),
        kept AS (
          SELECT b.source, COUNT(*) AS n_sampled
          FROM b JOIN rated ON b.source = rated.source
          WHERE bucket < keep_buckets GROUP BY b.source)
        SELECT rated.source, n_docs, sum_chars, weight, mix_share,
          upsample_factor, COALESCE(kept.n_sampled, 0) AS n_sampled
        FROM rated LEFT JOIN kept ON rated.source = kept.source
        ORDER BY rated.source""")),

    // Duplicate-span REMOVAL — the transform half of Lee et al. 2022's
    // "Deduplicating Training Data Makes Language Models Better": d15
    // detects cross-document duplicated passages; c9 REWRITES the corpus
    // so each duplicated chunk survives in exactly ONE place (its
    // keeper: the globally first occurrence by (doc_id, chunk index))
    // and is dropped everywhere else — turning detection into the
    // cleaned training set. Chunking is d15's content-defined cuts, so
    // removal is alignment-free too. The keeper is chosen with
    // AGGREGATES only (two-step argmin: min doc per digest, then min
    // index within that doc) — a per-digest map-side-combining groupBy,
    // never a corpus-wide window — and document reassembly is a bounded
    // per-doc collect + sort (a doc's own chunk list, ~n/8 entries).
    // Gate emits per-doc chunk counts + the md5 of the rewritten text,
    // so the oracle verifies every byte of every cleaned document
    // without shipping the corpus through the compare.
    Q("c9_dedup_rewrite",
      (s, d) => {
        val cuts =
          """filter(sequence(1, size(toks) - 1), i -> i >= 4 AND
             cast(conv(substring(md5(cast(concat_ws(' ', slice(toks, i - 3, 4)) as binary)), 1, 2), 16, 10) as int) % 8 = 0)"""
        val chunks = Tables.documentsSpread(s, d)
          .select(col("doc_id"), split(lower(col("text")), " ").as("toks"))
          .withColumn("cuts", expr(cuts))
          .select(col("doc_id"), posexplode(expr(
            """zip_with(
                 concat(array(1), transform(cuts, c -> c + 1)),
                 concat(cuts, array(size(toks))),
                 (s, e) -> concat_ws(' ', slice(toks, s, e - s + 1)))""")))
          .select(col("doc_id"), col("pos").cast("int").as("idx"),
            col("col").as("chunk_text"))
          .withColumn("digest", md5(col("chunk_text")))
        // The keeper is found with aggregates ONLY, in one pass over the
        // chunk stream: level-1 collapses to (digest, doc, min idx) — so
        // the digest-level count of level-1 rows IS the distinct-doc
        // count, no count-distinct Expand — and min(struct(doc, midx))
        // is the global first occurrence. That leaves exactly TWO
        // evaluations of the tokenize+md5 chunk pipeline (this aggregate
        // + the reassembly join below); a naive chunks⋈chunks keeper
        // self-join both re-evaluated it a third time and tripped
        // Spark's ambiguous-self-join check. The dup side's columns are
        // renamed (dd) so the reassembly join stays unambiguous.
        val l1 = chunks.groupBy("digest", "doc_id").agg(min(col("idx")).as("midx"))
        val dup = l1.groupBy("digest")
          .agg(count(lit(1)).as("nd"),
            min(struct(col("doc_id"), col("midx"))).as("kp"))
          .where(col("nd") >= 2)
          .select(col("digest").as("dd"),
            col("kp.doc_id").as("keeper_doc"), col("kp.midx").as("keeper_idx"))
        val marked = chunks.join(dup, col("digest") === col("dd"), "left")
          .withColumn("keep",
            col("keeper_doc").isNull ||
              (col("doc_id") === col("keeper_doc") && col("idx") === col("keeper_idx")))
        marked.groupBy("doc_id")
          .agg(count(lit(1)).cast("int").as("n_chunks"),
            sum(when(col("keep"), 0L).otherwise(1L)).cast("int").as("n_dropped"),
            md5(array_join(expr(
              "transform(array_sort(collect_list(case when keep then struct(idx, chunk_text) end)), x -> x.chunk_text)"),
              " ")).as("clean_md5"))
          .orderBy("doc_id")
      },
      Some("""WITH d AS (
          SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
        c AS (
          SELECT doc_id, toks,
            list_filter(range(1, len(toks)), i -> i >= 4 AND
              ((strpos('0123456789abcdef', substr(md5(array_to_string(toks[i-3:i], ' ')),1,1))-1)*16 +
               (strpos('0123456789abcdef', substr(md5(array_to_string(toks[i-3:i], ' ')),2,1))-1)) % 8 = 0) AS cuts
          FROM d),
        sp AS (
          SELECT doc_id, toks,
            list_prepend(1, list_transform(cuts, x -> x + 1)) AS starts,
            list_append(cuts, len(toks)) AS ends
          FROM c),
        e AS (
          SELECT doc_id, toks, starts, ends,
            unnest(range(1, len(starts) + 1)) AS k
          FROM sp),
        ch AS (
          SELECT doc_id, CAST(k - 1 AS INT) AS idx,
            array_to_string(toks[CAST(starts[k] AS INT):CAST(ends[k] AS INT)], ' ') AS chunk_text,
            md5(array_to_string(toks[CAST(starts[k] AS INT):CAST(ends[k] AS INT)], ' ')) AS digest
          FROM e),
        dup AS (
          SELECT digest, MIN(doc_id) AS keeper_doc
          FROM ch GROUP BY digest HAVING COUNT(DISTINCT doc_id) >= 2),
        keepers AS (
          SELECT ch.digest, MIN(ch.idx) AS keeper_idx, MIN(ch.doc_id) AS keeper_doc
          FROM ch JOIN dup ON ch.digest = dup.digest AND ch.doc_id = dup.keeper_doc
          GROUP BY ch.digest),
        marked AS (
          SELECT ch.doc_id, ch.idx, ch.chunk_text,
            (k.digest IS NULL OR
             (ch.doc_id = k.keeper_doc AND ch.idx = k.keeper_idx)) AS keep
          FROM ch LEFT JOIN keepers k ON ch.digest = k.digest)
        SELECT doc_id, CAST(COUNT(*) AS INT) AS n_chunks,
          CAST(SUM(CASE WHEN keep THEN 0 ELSE 1 END) AS INT) AS n_dropped,
          md5(COALESCE(array_to_string(list_transform(list_sort(
            list({'idx': idx, 'chunk_text': chunk_text})
              FILTER (WHERE keep)),
            x -> x.chunk_text), ' '), '')) AS clean_md5
        FROM marked GROUP BY doc_id ORDER BY doc_id""")),

    // Leakage-safe train/eval split — c2's deterministic md5-bucket
    // split COMPOSED with cross-split near-dup decontamination: a train
    // document that lands in the same MinHash band bucket as any
    // val/test document is a leakage risk (the eval set's near-dups
    // would be trained on, inflating eval scores) and is relabeled out
    // of train. The candidate test is the d3/d4 LSH bucket — the same
    // approximate-near-dup definition the dedup family uses, computed
    // once and shared by both sides. Emission is a 4-way label
    // (train / train_dropped / val / test) so the gate pins the dropped
    // set exactly, not just the survivor count. Scale shape: band
    // buckets are the ONLY join key (never doc text); the eval side of
    // the semi-join is |eval| × 8 band rows (a few % of the corpus by
    // construction); the final rollup is one map-side-combining
    // aggregate. No window, no pair materialization — contamination is
    // decided by a LEFT SEMI join, so no train row duplicates even
    // when a doc collides with many eval docs.
    Q("c10_leakage_safe_split",
      (s, d) => {
        val docs = Tables.documentsSpread(s, d)
        val split = docs.withColumn("bucket",
            expr("cast(conv(substring(md5(cast(doc_id as string)), 1, 2), 16, 10) as int)"))
          .withColumn("split",
            when(col("bucket") < 230, "train")
              .when(col("bucket") < 243, "val").otherwise("test"))
        // eager: the semi-join's build (eval bands) and probe (train
        // bands) sides are independent AQE stages, each re-evaluating
        // the MinHash pipeline when this frame is lazy (JobProbe r13:
        // three ~8 s-taskMs sigFrame passes per c10 run); 8 rows/doc
        val bands = TextOps.sigFrame(docs)
          .select(col("doc_id"), posexplode(col("sigs")).as(Seq("band", "h")))
          .join(split.select("doc_id", "split"), Seq("doc_id"))
          .localCheckpoint(true)
        val evalBands = bands.where(col("split") =!= "train")
          .select("band", "h")
        val contaminated = bands.where(col("split") === "train")
          .join(evalBands, Seq("band", "h"), "left_semi")
          .select("doc_id").distinct()
        split.join(contaminated.withColumn("cont", lit(true)), Seq("doc_id"), "left")
          .withColumn("label",
            when(col("split") === "train" && col("cont"), "train_dropped")
              .otherwise(col("split")))
          .groupBy("label")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).cast("long").as("sum_chars"),
            sum(col("doc_id")).cast("long").as("id_sig"))
          .orderBy("label")
      },
      Some(s"""WITH b AS (
          SELECT doc_id, n_chars,
            (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)),1,1))-1)*16 +
            (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)),2,1))-1) AS bucket
          FROM documents),
        sp AS (
          SELECT doc_id, n_chars,
            CASE WHEN bucket < 230 THEN 'train'
                 WHEN bucket < 243 THEN 'val' ELSE 'test' END AS split
          FROM b),
        sig AS (${TextOps.duckSigsFrom("documents")}),
        bands AS (
          SELECT s.doc_id, k AS band, sigs[k + 1] AS h, sp.split
          FROM sig s JOIN sp ON s.doc_id = sp.doc_id, range(0, 8) t(k)),
        contaminated AS (
          SELECT DISTINCT a.doc_id
          FROM bands a JOIN bands e ON a.band = e.band AND a.h = e.h
          WHERE a.split = 'train' AND e.split <> 'train')
        SELECT CASE WHEN sp.split = 'train' AND c.doc_id IS NOT NULL
                    THEN 'train_dropped' ELSE sp.split END AS label,
          COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
          CAST(SUM(sp.doc_id) AS BIGINT) AS id_sig
        FROM sp LEFT JOIN contaminated c ON sp.doc_id = c.doc_id
        GROUP BY 1 ORDER BY label""")),

    // Epoching plan — materializing a data recipe: c3/c8 compute mixing
    // WEIGHTS; this computes the integer per-document repeat counts that
    // actually build the training corpus for a fixed token budget (here
    // 2× corpus tokens, split evenly across sources). Per source:
    // `full_epochs = target div src_tokens` full passes, and the
    // remainder is filled by the greedy prefix of documents in md5
    // order — deterministic under re-runs and appends, like c2's split.
    // All arithmetic is exact longs, so the gate hash-matches DuckDB.
    //
    // Scale shape: the naive form is a per-source ORDER BY h cumsum —
    // a full sort of every source. Instead the prefix is found
    // hierarchically (the c6 trick): docs bucket by their first two hash
    // hex chars (256 buckets), a per-bucket token-sum frame (≤256 rows
    // per source) locates each bucket's global prefix start, buckets
    // strictly below/above the remainder classify without looking at
    // their documents, and ONLY the single boundary bucket per source
    // (~1/256th of the source) pays an ordered in-bucket window. The
    // oracle computes the same selection as the flat one-window cumsum —
    // which IS the semantic contract the hierarchical plan implements.
    Q("c11_epoch_plan",
      (s, d) => epochPlanFrom(
        Tables.documents(s, d).select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"),
          md5(col("doc_id").cast("string")).as("h"))),
      Some("""WITH docs AS (
          SELECT doc_id, source,
            CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
            md5(CAST(doc_id AS VARCHAR)) AS h
          FROM documents),
        src AS (SELECT source, SUM(n_tokens) AS src_tokens
          FROM docs GROUP BY source),
        tot AS (SELECT SUM(src_tokens) AS all_tokens, COUNT(*) AS n_src
          FROM src),
        plan AS (SELECT source,
            ((SELECT all_tokens FROM tot) * 2) // (SELECT n_src FROM tot)
              AS target_s, src_tokens
          FROM src),
        p2 AS (SELECT source, target_s // src_tokens AS full_epochs,
            target_s % src_tokens AS rem FROM plan),
        cum AS (SELECT doc_id, source, n_tokens,
            COALESCE(SUM(n_tokens) OVER (PARTITION BY source
              ORDER BY h, doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev
          FROM docs)
        SELECT c.doc_id, c.source, c.n_tokens,
          CAST(p.full_epochs +
            CASE WHEN c.prev < p.rem THEN 1 ELSE 0 END AS BIGINT) AS repeats
        FROM cum c JOIN p2 p USING (source)
        ORDER BY doc_id"""))
  ,

    // The training-ORDER materialization c11 plans for: every document,
    // once per epoch, in a deterministic epoch-keyed global shuffle —
    // position = rank of md5(epoch:doc_id) within the epoch. Training
    // runs need the permutation to be a pure function of (epoch, id):
    // re-runs, restarts, and shard re-splits reproduce the exact order,
    // and consecutive epochs decorrelate because the hash re-keys.
    //
    // Scale shape: the naive form is one row_number window PER EPOCH
    // over the whole corpus — a single-partition sort of every epoch.
    // Positions are instead assigned hierarchically (c6/c11's trick):
    // rows bucket by their hash's first two hex chars, a ≤256-row
    // per-epoch bucket-count frame turns into cumulative bucket offsets,
    // and each bucket independently numbers its own rows — the only
    // windows are over (epoch, bucket) partitions, each ~1/256th of an
    // epoch. The oracle is the flat per-epoch row_number the plan
    // refuses to execute.
    Q("c12_epoch_shuffle",
      (s, d) => epochShuffle(Tables.documents(s, d).select("doc_id"),
        nEpochs = 2),
      Some("""WITH docs AS (
          SELECT epoch, doc_id,
            md5(CAST(epoch AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)) AS h
          FROM documents CROSS JOIN (SELECT 0 AS epoch UNION ALL SELECT 1))
        SELECT epoch, doc_id,
          row_number() OVER (PARTITION BY epoch ORDER BY h, doc_id) AS pos
        FROM docs ORDER BY epoch, pos""")),

    // The SHARD WRITER's manifest — the step between c6's packing and
    // the bytes on disk: every packed L=512 sequence is assigned to a
    // fixed-size numbered shard (S=16 sequences/shard, the WebDataset/
    // MDS posture) in a deterministically shuffled order, so shard 0
    // is a uniform sample of the corpus, not the first source's head.
    // Sequence count per source comes from c6's packing arithmetic
    // (ceil of the source's token total / L); the global permutation is
    // md5-keyed and assigned HIERARCHICALLY (bucket counts → ≤256-row
    // cumulative-offset window → in-bucket row_number — c12's shape,
    // never an output-wide single-partition window); shard id and
    // in-shard position are integer div/mod on the permuted position.
    // Oracle: same arithmetic flat, with DuckDB's global row_number —
    // equal because the bucket is the md5's own 2-hex-char prefix.
    Q("c13_shard_manifest",
      (s, d) => {
        val L = 512L; val S = 16L
        val docs = Tables.documentsSpread(s, d)
          .select(col("source"),
            size(split(lower(col("text")), " ")).cast("long").as("n_tokens"))
        val nseq = docs.groupBy("source")
          .agg(expr(s"(sum(n_tokens) + ${L - 1}) div $L").as("n_seqs"))
        // n_seqs > 0 guard: sequence(0, -1) is a DESCENDING [0, -1] in
        // Spark (auto negative step), which would fabricate phantom
        // sequences for an empty source instead of none
        val seqs = nseq.where(col("n_seqs") > 0)
          .select(col("source"),
            explode(expr("sequence(cast(0 as bigint), n_seqs - 1)")).as("seq"))
          .withColumn("h",
            md5(concat(col("source"), lit(":"), col("seq").cast("string"))))
          .withColumn("bucket",
            conv(substring(col("h"), 1, 2), 16, 10).cast("long"))
        val wOff = Window.orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, -1)
        val offsets = seqs.groupBy("bucket")
          .agg(count(lit(1)).as("b_n"))
          .withColumn("b_start", coalesce(sum("b_n").over(wOff), lit(0L)))
          .select("bucket", "b_start")
        val wIn = Window.partitionBy("bucket")
          .orderBy(col("h"), col("source"), col("seq"))
        seqs.join(offsets, Seq("bucket"))
          .withColumn("pos", col("b_start") + row_number().over(wIn) - 1)
          .select(col("source"), col("seq"),
            expr(s"pos div $S").as("shard_id"),
            expr(s"pos % $S").as("pos_in_shard"),
            (col("seq") * L).as("token_offset"))
          .orderBy("shard_id", "pos_in_shard")
      },
      Some("""WITH d AS (
          SELECT source,
            CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tokens
          FROM documents),
        t AS (
          SELECT source, CAST((SUM(n_tokens) + 511) // 512 AS BIGINT) AS n_seqs
          FROM d GROUP BY source),
        seqs AS (
          SELECT source, CAST(unnest(range(0, n_seqs)) AS BIGINT) AS seq FROM t),
        h AS (
          SELECT source, seq,
            md5(source || ':' || CAST(seq AS VARCHAR)) AS h
          FROM seqs),
        p AS (
          SELECT source, seq,
            row_number() OVER (ORDER BY h, source, seq) - 1 AS pos
          FROM h)
        SELECT source, seq,
          CAST(pos // 16 AS BIGINT) AS shard_id,
          CAST(pos % 16 AS BIGINT) AS pos_in_shard,
          CAST(seq * 512 AS BIGINT) AS token_offset
        FROM p ORDER BY shard_id, pos_in_shard""")),

    // APPEND-ONLY shard growth — what a production shard store does
    // daily: shards already written are IMMUTABLE, so a corpus delta
    // opens NEW shards instead of reshuffling the world. Base corpus
    // (doc_id % 3 ≠ 0) gets c13's manifest verbatim; the delta's
    // per-source sequences continue each source's numbering at its base
    // count, get their own deterministic permutation, and land in
    // shards starting AFTER the last base shard (the base shard count
    // rides a broadcast 1-row frame — no driver action). Base rows are
    // therefore a pure function of the base corpus alone: re-running
    // with a different delta can never rewrite a shipped shard. Same
    // hierarchical position assignment as c13 on both sides of the
    // union; the oracle mirrors the arithmetic flat.
    Q("c13b_shard_append",
      (s, d) => {
        val L = 512L; val S = 16L
        val toks = Tables.documentsSpread(s, d)
          .select(col("doc_id"), col("source"),
            size(split(lower(col("text")), " ")).cast("long").as("n_tokens"))
        def nseq(docs: DataFrame) = docs.groupBy("source")
          .agg(expr(s"(sum(n_tokens) + ${L - 1}) div $L").as("n_seqs"))
        val baseN = nseq(toks.where(col("doc_id") % 3 =!= 0))
        val deltaN = nseq(toks.where(col("doc_id") % 3 === 0))
        def assign(seqs: DataFrame, shardBase: org.apache.spark.sql.Column): DataFrame = {
          val withH = seqs
            .withColumn("h",
              md5(concat(col("source"), lit(":"), col("seq").cast("string"))))
            .withColumn("bucket",
              conv(substring(col("h"), 1, 2), 16, 10).cast("long"))
          val wOff = Window.orderBy("bucket")
            .rowsBetween(Window.unboundedPreceding, -1)
          val offsets = withH.groupBy("bucket")
            .agg(count(lit(1)).as("b_n"))
            .withColumn("b_start", coalesce(sum("b_n").over(wOff), lit(0L)))
            .select("bucket", "b_start")
          val wIn = Window.partitionBy("bucket")
            .orderBy(col("h"), col("source"), col("seq"))
          withH.join(offsets, Seq("bucket"))
            .withColumn("pos", col("b_start") + row_number().over(wIn) - 1)
            .select(col("source"), col("seq"),
              (shardBase + expr(s"pos div $S")).as("shard_id"),
              expr(s"pos % $S").as("pos_in_shard"),
              (col("seq") * L).as("token_offset"))
        }
        // n_seqs > 0 guards (here and below): sequence(0, -1) descends
        val baseSeqs = baseN.where(col("n_seqs") > 0).select(col("source"),
          explode(expr("sequence(cast(0 as bigint), n_seqs - 1)")).as("seq"))
        val baseShards = baseSeqs
          .agg(expr(s"(count(1) + ${S - 1}) div $S").as("base_shards"))
        val deltaSeqs = deltaN.where(col("n_seqs") > 0)
          .join(baseN.withColumnRenamed("n_seqs", "base_n"), Seq("source"), "left")
          .select(col("source"),
            explode(expr("sequence(cast(0 as bigint), n_seqs - 1)")).as("s0"),
            coalesce(col("base_n"), lit(0L)).as("b0"))
          .select(col("source"), (col("s0") + col("b0")).as("seq"))
        val base = assign(baseSeqs, lit(0L)).withColumn("batch", lit("base"))
        val delta = assign(
            deltaSeqs.crossJoin(broadcast(baseShards)), col("base_shards"))
          .withColumn("batch", lit("delta"))
        base.unionByName(delta)
          .select("batch", "source", "seq", "shard_id", "pos_in_shard",
            "token_offset")
          .orderBy("shard_id", "pos_in_shard")
      },
      Some("""WITH d0 AS (
          SELECT doc_id, source,
            CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tokens
          FROM documents),
        bt AS (
          SELECT source, CAST((SUM(n_tokens) + 511) // 512 AS BIGINT) AS n_seqs
          FROM d0 WHERE doc_id % 3 <> 0 GROUP BY source),
        dt AS (
          SELECT source, CAST((SUM(n_tokens) + 511) // 512 AS BIGINT) AS n_seqs
          FROM d0 WHERE doc_id % 3 = 0 GROUP BY source),
        bseqs AS (
          SELECT source, CAST(unnest(range(0, n_seqs)) AS BIGINT) AS seq FROM bt),
        dseqs AS (
          SELECT d.source,
            CAST(unnest(range(0, d.n_seqs)) AS BIGINT) + COALESCE(b.n_seqs, 0) AS seq
          FROM dt d LEFT JOIN bt b USING (source)),
        bshards AS (
          SELECT CAST((COUNT(*) + 15) // 16 AS BIGINT) AS base_shards FROM bseqs),
        bp AS (
          SELECT source, seq, row_number() OVER (
            ORDER BY md5(source || ':' || CAST(seq AS VARCHAR)), source, seq) - 1
            AS pos
          FROM bseqs),
        dp AS (
          SELECT source, seq, row_number() OVER (
            ORDER BY md5(source || ':' || CAST(seq AS VARCHAR)), source, seq) - 1
            AS pos
          FROM dseqs)
        SELECT 'base' AS batch, source, seq,
          CAST(pos // 16 AS BIGINT) AS shard_id,
          CAST(pos % 16 AS BIGINT) AS pos_in_shard,
          CAST(seq * 512 AS BIGINT) AS token_offset
        FROM bp
        UNION ALL
        SELECT 'delta', source, seq,
          CAST(pos // 16 + (SELECT base_shards FROM bshards) AS BIGINT),
          CAST(pos % 16 AS BIGINT),
          CAST(seq * 512 AS BIGINT)
        FROM dp
        ORDER BY shard_id, pos_in_shard"""))
  )

  /** c12's plan body: the deterministic per-epoch global permutation of
    * `ids` (doc_id), positions assigned hierarchically — bucket counts →
    * cumulative offsets (a window over ≤256 rows per epoch) → in-bucket
    * row_number — instead of one epoch-wide single-partition window.
    * Correct because md5's lowercase-hex lexicographic order agrees with
    * the numeric order of its first two hex chars (c11's invariant). */
  private[graft] def epochShuffle(ids: DataFrame, nEpochs: Int): DataFrame = {
    val rows = ids
      .select(col("doc_id"),
        explode(array((0 until nEpochs).map(lit): _*)).as("epoch"))
      .withColumn("h",
        md5(concat(col("epoch").cast("string"), lit(":"),
          col("doc_id").cast("string"))))
      .withColumn("bucket", conv(substring(col("h"), 1, 2), 16, 10).cast("long"))
    val wOff = Window.partitionBy("epoch").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = rows.groupBy("epoch", "bucket")
      .agg(count(lit(1)).as("b_n"))
      .withColumn("b_start", coalesce(sum("b_n").over(wOff), lit(0L)))
      .select("epoch", "bucket", "b_start")
    val wIn = Window.partitionBy("epoch", "bucket").orderBy("h", "doc_id")
    rows.join(offsets, Seq("epoch", "bucket"))
      .withColumn("pos", col("b_start") + row_number().over(wIn))
      .select("epoch", "doc_id", "pos")
      .orderBy("epoch", "pos")
  }

  /** c11's plan body over an arbitrary `(doc_id, source, n_tokens, h)`
    * frame (`h` = any hex hash string; the gate passes md5(doc_id)).
    * `h` is lower-cased on entry: the hierarchical plan's equivalence to
    * the flat `ORDER BY h` greedy needs the numeric order of the first
    * two hex chars (`conv` base-16) to agree with full-string
    * lexicographic order — true for uniform-case hex, silently wrong for
    * mixed case ('A' < 'a' lexicographically, equal numerically), so the
    * plan normalizes rather than trusting the caller.
    * Extracted so EpochPlanSpec's fuzz can control the hash-prefix
    * distribution directly — the adversarial cases (remainder landing
    * exactly on a bucket boundary, rem = 0, a source entirely inside one
    * bucket) are unreachable from the real table. */
  private[graft] def epochPlanFrom(docsRaw: DataFrame): DataFrame = {
    val docs = docsRaw.withColumn("h", lower(col("h")))
    val src = docs.groupBy("source").agg(sum("n_tokens").as("src_tokens"))
    val tot = src.agg(sum("src_tokens").as("all_tokens"),
      count(lit(1)).as("n_src"))
    val plan = src.crossJoin(broadcast(tot))
      .withColumn("target_s", expr("(all_tokens * 2) div n_src"))
      .select(col("source"),
        expr("target_s div src_tokens").as("full_epochs"),
        (col("target_s") % col("src_tokens")).as("rem"))
    val withB = docs.withColumn("bucket",
      conv(substring(col("h"), 1, 2), 16, 10).cast("long"))
    val bsum = withB.groupBy("source", "bucket")
      .agg(sum("n_tokens").as("b_tokens"))
    val wB = Window.partitionBy("source").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val bcum = bsum.withColumn("b_start",
      coalesce(sum("b_tokens").over(wB), lit(0L)))
    val marked = withB
      .join(bcum, Seq("source", "bucket"))
      .join(plan, Seq("source"))
    // whole buckets classify from the frame; null marks the one
    // boundary bucket per source whose docs need the in-bucket order
    val base = marked.withColumn("extra0",
      when(col("b_start") + col("b_tokens") <= col("rem"), lit(1L))
        .when(col("b_start") >= col("rem"), lit(0L)))
    val wD = Window.partitionBy("source", "bucket")
      .orderBy("h", "doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val boundary = base.where(col("extra0").isNull)
      .withColumn("prev", coalesce(sum("n_tokens").over(wD), lit(0L)))
      .select(col("doc_id").as("b_doc_id"),
        when(col("b_start") + col("prev") < col("rem"), 1L)
          .otherwise(0L).as("extra_b"))
    base.join(boundary, col("doc_id") === col("b_doc_id"), "left")
      .select(col("doc_id"), col("source"), col("n_tokens"),
        (col("full_epochs") + coalesce(col("extra0"), col("extra_b")))
          .as("repeats"))
      .orderBy("doc_id")
  }
}
