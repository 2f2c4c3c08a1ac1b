package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Paragraph-granularity dedup and the removal-attribution funnel — the
  * two corpus-hygiene reports between document-level dedup (d1/d4) and
  * the packaging stages (c6/c13).
  *
  * d20 is the public Dolma/CCNet recipe at the granularity BELOW the
  * document: exact duplicate *paragraphs* are removed corpus-wide (first
  * occurrence in (doc_id, position) order wins) and each document is
  * rewritten from its surviving paragraphs — boilerplate headers and
  * license blocks repeat across millions of pages that are NOT document
  * duplicates, so document-level dedup never sees them.
  *
  * c14 is the attrition funnel every published pipeline ships (order of
  * rules is the contract: a document is attributed to its FIRST failing
  * rule, so stage counts are disjoint and sum to the corpus).
  *
  * t27 is CCNet's language step at the same granularity: language-ID
  * runs per PARAGRAPH (t1's marker heuristic) and the document's
  * language is the token-weighted majority vote over its paragraphs —
  * mixed-language pages get an honest majority fraction instead of a
  * whole-document guess.
  *
  * d21 is "soft dedup" (the D4/DoReMi-era resampling posture): exact
  * duplicates are down-weighted to 1/multiplicity instead of dropped,
  * so a cluster of m identical documents contributes one document's
  * worth of expected training tokens; the per-source rollup reports
  * effective vs raw token mass.
  *
  * Scale shape (100 TB):
  *  - d20's only wide operation is keyed by the paragraph hash — the
  *    shuffle carries (hash, doc_id, idx) triples, never text twice, and
  *    a hash's group is its duplicate multiplicity (bounded by the most
  *    duplicated boilerplate block, not the corpus). The rebuild is one
  *    doc_id-keyed aggregate.
  *  - c14 is map-side column work plus one (source, verdict) aggregate —
  *    at most |sources|·|stages| result rows from any corpus size.
  *  - t27's wide ops are keyed by doc_id (group ≤ the doc's paragraph
  *    count) and the vote window partition is ≤ |languages| rows.
  *  - d21 is ONE window keyed by the content hash (partition =
  *    multiplicity) plus a |sources|-row rollup; the weight is held
  *    integer-exact as ppm via `1000000 div m`, so the effective-token
  *    sum is an exact BIGINT cross-engine — no float summation order.
  */
object ParaOps {

  /** Deterministic paragraph fixture: each document's token stream is
    * cut into four quarter segments (exact integer boundaries i·n/4 so
    * both engines cut identically), then two duplicate classes are
    * planted by doc_id residue: every 7th-residue-3 document's second
    * paragraph becomes one of three shared boilerplate blocks
    * (cross-document duplicates, multiplicity ~n/21), and every
    * 11th-residue-5 document's third paragraph repeats its own first
    * (within-document duplicate — the second occurrence must drop even
    * though both live in the same doc). */
  private def paraFixture(docs: DataFrame): DataFrame = {
    def seg(i: Int): Column = array_join(
      expr(s"slice(t, cast(n * $i div 4 as int) + 1," +
        s" cast(n * ${i + 1} div 4 - n * $i div 4 as int))"), " ")
    val shared = concat(lit("shared boilerplate block "),
      (col("doc_id") % 3).cast("string"))
    docs
      .select(col("doc_id"), split(lower(col("text")), " ").as("t"))
      .withColumn("n", size(col("t")))
      .select(col("doc_id"), posexplode(array(
        seg(0),
        when(col("doc_id") % 7 === 3, shared).otherwise(seg(1)),
        when(col("doc_id") % 11 === 5, seg(0)).otherwise(seg(2)),
        seg(3))).as(Seq("idx", "para")))
      .where(col("para") =!= "")
  }

  /** The same fixture in DuckDB (list slices are 1-based inclusive;
    * `(n*i)//4` reproduces Spark's `div` exactly on non-negatives). */
  private val paraFixtureSql: String =
    """p AS (
        SELECT doc_id, idx, para FROM (
          SELECT doc_id,
            unnest([1, 2, 3, 4]) - 1 AS idx,
            unnest([
              array_to_string(t[1 : n // 4], ' '),
              CASE WHEN doc_id % 7 = 3
                   THEN 'shared boilerplate block ' || CAST(doc_id % 3 AS VARCHAR)
                   ELSE array_to_string(t[n // 4 + 1 : (n * 2) // 4], ' ') END,
              CASE WHEN doc_id % 11 = 5
                   THEN array_to_string(t[1 : n // 4], ' ')
                   ELSE array_to_string(t[(n * 2) // 4 + 1 : (n * 3) // 4], ' ') END,
              array_to_string(t[(n * 3) // 4 + 1 : n], ' ')]) AS para
          FROM (SELECT doc_id, string_split(lower(text), ' ') AS t,
                  len(string_split(lower(text), ' ')) AS n
                FROM documents))
        WHERE para <> '')"""

  /** c14's per-document signal frame: tokens over the PII-decorated
    * text (every 6th-residue-2 doc gains a planted contact line, so the
    * pii stage has members in the synthetic corpus), plus the t2-shaped
    * quality blend over length(text) — each ratio a single division of
    * exact ints, the blend in one operand order, so verdict boundaries
    * land identically cross-engine. */
  private def funnelSignals(docs: DataFrame): DataFrame =
    docs
      .withColumn("text2", concat(col("text"),
        when(col("doc_id") % 6 === 2,
          concat(lit(" contact user"), col("doc_id").cast("string"),
            lit("@mail.example.com"))).otherwise(lit(""))))
      .withColumn("t", split(lower(col("text2")), " "))
      .select(col("doc_id"), col("source"),
        size(col("t")).cast("int").as("n_tok"),
        size(array_distinct(col("t"))).cast("int").as("n_dis"),
        size(filter(col("t"), x => x.isin("the", "a", "and", "of")))
          .cast("int").as("n_stop"),
        length(col("text2")).cast("int").as("n_chars2"),
        regexp_count(col("text2"), lit(Redact.EmailPattern))
          .cast("int").as("n_emails"))
      .withColumn("dupf",
        lit(1.0) - col("n_dis").cast("double") / col("n_tok").cast("double"))
      .withColumn("q",
        lit(0.4) * (col("n_dis").cast("double") / col("n_tok").cast("double")) +
          lit(0.3) * (lit(1.0) - col("n_stop").cast("double") / col("n_tok").cast("double")) +
          lit(0.3) * least(lit(1.0),
            (col("n_chars2").cast("double") / col("n_tok").cast("double")) / lit(10.0)))

  /** Corpus-wide exact paragraph dedup + rewrite over a (doc_id, idx,
    * para) frame: a paragraph survives only at its first (doc_id, idx)
    * occurrence; each document is rebuilt from survivors in original
    * order (md5-pinned), with kept/dropped accounting. Documents whose
    * every paragraph was seen earlier still get a row (n_kept = 0,
    * md5 of the empty rewrite). */
  def dedupeParagraphs(paras: DataFrame): DataFrame = {
    val hashed = paras.withColumn("h", md5(col("para")))
    val kept = hashed
      .withColumn("rk", row_number().over(
        Window.partitionBy("h").orderBy("doc_id", "idx")))
      .where(col("rk") === 1)
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("int").as("n_kept"),
        md5(concat_ws("\n",
          expr("transform(array_sort(collect_list(struct(idx, para))), x -> x.para)")))
          .as("rebuilt_md5"))
    hashed.groupBy("doc_id")
      .agg(count(lit(1)).cast("int").as("n_paras"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_paras"),
        coalesce(col("n_kept"), lit(0)).as("n_kept"),
        (col("n_paras") - coalesce(col("n_kept"), lit(0))).as("n_dropped"),
        coalesce(col("rebuilt_md5"), md5(lit(""))).as("rebuilt_md5"))
      .orderBy("doc_id")
  }

  /** Token-weighted majority language vote over a (doc_id, n_tok,
    * guess) paragraph frame: one (doc_id, guess) aggregate, then a
    * ≤|languages|-row window per document; ties break by paragraph
    * count then lexicographic label so the election is deterministic. */
  def langVote(scored: DataFrame): DataFrame = {
    val perLang = scored.groupBy("doc_id", "guess")
      .agg(count(lit(1)).cast("int").as("n_paras_lang"),
        sum(col("n_tok")).cast("bigint").as("n_toks_lang"))
    val tot = Window.partitionBy("doc_id")
    val vote = Window.partitionBy("doc_id")
      .orderBy(col("n_toks_lang").desc, col("n_paras_lang").desc, col("guess").asc)
    perLang
      .withColumn("n_paras", sum(col("n_paras_lang")).over(tot).cast("int"))
      .withColumn("n_toks", sum(col("n_toks_lang")).over(tot))
      .withColumn("rk", row_number().over(vote))
      .where(col("rk") === 1)
      .select(col("doc_id"), col("guess").as("major_lang"), col("n_paras"),
        col("n_paras_lang").as("n_major_paras"),
        col("n_toks_lang").as("n_major_toks"),
        (col("n_toks_lang").cast("double") / col("n_toks").cast("double"))
          .as("frac_major_toks"))
      .orderBy("doc_id")
  }

  /** Soft-dedup rollup over a (source, h, n_tok) frame: multiplicity m
    * from ONE hash-keyed window (partition = m), per-copy weight held
    * integer-exact as `1000000 div m` ppm, then a |sources|-row
    * aggregate of exact BIGINTs. */
  def dupWeightRollup(docs: DataFrame): DataFrame =
    docs
      .withColumn("m", count(lit(1)).over(Window.partitionBy("h")).cast("int"))
      .withColumn("w_ppm", expr("1000000 div m"))
      .groupBy("source")
      .agg(count(lit(1)).cast("int").as("n_docs"),
        sum(when(col("m") > 1, 1).otherwise(0)).cast("int").as("n_dup_docs"),
        sum(col("n_tok")).cast("bigint").as("sum_tokens"),
        sum(col("n_tok").cast("bigint") * col("w_ppm")).cast("bigint")
          .as("eff_tokens_ppm"))
      .withColumn("eff_ratio",
        col("eff_tokens_ppm").cast("double") /
          (col("sum_tokens") * lit(1000000L)).cast("double"))
      .orderBy("source")

  val all: Seq[Q] = Seq(

    // d20 — exact paragraph-level dedup with document rewrite (the
    // Dolma recipe): hash every paragraph, keep only its first
    // (doc_id, idx) occurrence corpus-wide, and rebuild each document
    // from the survivors in original order. The fixture plants both
    // duplicate classes (cross-document boilerplate, within-document
    // repeat); the rebuilt md5 pins the rewrite byte-exactly, and
    // n_paras/n_kept pin the drop accounting. The wide op is one
    // window keyed by the paragraph hash — group size = duplicate
    // multiplicity, never corpus size.
    Q("d20_paragraph_dedup",
      (s, d) => dedupeParagraphs(paraFixture(Tables.documentsSpread(s, d))),
      Some(s"""WITH $paraFixtureSql,
          r AS (SELECT doc_id, idx, para,
              ROW_NUMBER() OVER (PARTITION BY md5(para)
                                 ORDER BY doc_id, idx) AS rk
            FROM p),
          k AS (SELECT doc_id, CAST(COUNT(*) AS INT) AS n_kept,
              md5(string_agg(para, chr(10) ORDER BY idx)) AS rebuilt_md5
            FROM r WHERE rk = 1 GROUP BY doc_id),
          t AS (SELECT doc_id, CAST(COUNT(*) AS INT) AS n_paras
            FROM p GROUP BY doc_id)
        SELECT t.doc_id, n_paras,
          COALESCE(n_kept, 0) AS n_kept,
          n_paras - COALESCE(n_kept, 0) AS n_dropped,
          COALESCE(rebuilt_md5, md5('')) AS rebuilt_md5
        FROM t LEFT JOIN k USING (doc_id) ORDER BY doc_id""")),

    // c14 — the removal funnel: each document attributed to its FIRST
    // failing filter (too_short → pii → repetitive → low_quality →
    // kept), rolled up per (source, verdict) with doc and token counts
    // — the attrition table a pipeline publishes alongside its corpus.
    // Rule order IS the semantics (stages are disjoint, counts sum to
    // the corpus); thresholds sit inside the synthetic corpus's signal
    // range so every stage has members at sf0.01. Map-side column work
    // + one small aggregate at any scale.
    Q("c14_removal_funnel",
      (s, d) => {
        funnelSignals(Tables.documentsSpread(s, d))
          .withColumn("verdict",
            when(col("n_tok") < 30, "1_too_short")
              .when(col("n_emails") > 0, "2_pii")
              .when(col("dupf") > 0.62, "3_repetitive")
              .when(col("q") < 0.60, "4_low_quality")
              .otherwise("5_kept"))
          .groupBy("source", "verdict")
          .agg(count(lit(1)).cast("int").as("n_docs"),
            sum(col("n_tok")).cast("bigint").as("sum_tokens"))
          .orderBy("source", "verdict")
      },
      Some("""WITH sig AS (
          SELECT doc_id, source,
            CAST(len(t) AS INT) AS n_tok,
            CAST(len(list_distinct(t)) AS INT) AS n_dis,
            CAST(len(list_filter(t, x -> x IN ('the','a','and','of'))) AS INT) AS n_stop,
            CAST(len(text2) AS INT) AS n_chars2,
            CAST(len(regexp_extract_all(text2,
              '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}')) AS INT) AS n_emails
          FROM (SELECT doc_id, source, text2, string_split(lower(text2), ' ') AS t
                FROM (SELECT doc_id, source, text ||
                    CASE WHEN doc_id % 6 = 2
                         THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@mail.example.com'
                         ELSE '' END AS text2
                  FROM documents))),
        v AS (SELECT source, n_tok,
            CASE WHEN n_tok < 30 THEN '1_too_short'
                 WHEN n_emails > 0 THEN '2_pii'
                 WHEN 1.0 - CAST(n_dis AS DOUBLE) / CAST(n_tok AS DOUBLE) > 0.62
                   THEN '3_repetitive'
                 WHEN 0.4 * (CAST(n_dis AS DOUBLE) / CAST(n_tok AS DOUBLE)) +
                      0.3 * (1.0 - CAST(n_stop AS DOUBLE) / CAST(n_tok AS DOUBLE)) +
                      0.3 * least(1.0, (CAST(n_chars2 AS DOUBLE) / CAST(n_tok AS DOUBLE)) / 10.0)
                      < 0.60
                   THEN '4_low_quality'
                 ELSE '5_kept' END AS verdict
          FROM sig)
        SELECT source, verdict, CAST(COUNT(*) AS INT) AS n_docs,
          CAST(SUM(n_tok) AS BIGINT) AS sum_tokens
        FROM v GROUP BY source, verdict ORDER BY source, verdict""")),

    // t27 — paragraph-level language ID + token-weighted majority vote
    // (CCNet's granularity): t1's marker heuristic runs per paragraph
    // of the d20 fixture, then each document votes with paragraph token
    // counts; ties break by paragraph count then lexicographic label —
    // the full tie chain is deterministic so both engines elect the
    // same language. frac_major_toks is the honest mixed-language
    // signal (1.0 = monolingual page). Wide ops: one (doc_id, guess)
    // aggregate and a ≤|languages|-row vote window per document.
    Q("t27_paragraph_langid",
      (s, d) => {
        val scored = paraFixture(Tables.documentsSpread(s, d))
          .withColumn("t", split(col("para"), " "))
          .select(col("doc_id"),
            size(col("t")).cast("int").as("n_tok"),
            size(filter(col("t"), t => t.isin("the", "a"))).cast("int").as("s_art"),
            size(filter(col("t"), t => t.isin("spark", "vector", "hash"))).cast("int").as("s_tech"),
            size(filter(col("t"), t => t.isin("table", "query", "join"))).cast("int").as("s_db"))
          .withColumn("guess",
            when(col("s_art") >= col("s_tech") && col("s_art") >= col("s_db"), "article")
              .when(col("s_tech") >= col("s_db"), "tech").otherwise("db"))
        langVote(scored)
      },
      Some(s"""WITH $paraFixtureSql,
          scored AS (
            SELECT doc_id,
              CAST(len(t) AS INT) AS n_tok,
              CAST(len(list_filter(t, x -> x IN ('the','a'))) AS INT) AS s_art,
              CAST(len(list_filter(t, x -> x IN ('spark','vector','hash'))) AS INT) AS s_tech,
              CAST(len(list_filter(t, x -> x IN ('table','query','join'))) AS INT) AS s_db
            FROM (SELECT doc_id, string_split(para, ' ') AS t FROM p)),
          g AS (SELECT doc_id, n_tok,
              CASE WHEN s_art >= s_tech AND s_art >= s_db THEN 'article'
                   WHEN s_tech >= s_db THEN 'tech' ELSE 'db' END AS guess
            FROM scored),
          pl AS (SELECT doc_id, guess,
              CAST(COUNT(*) AS INT) AS n_paras_lang,
              CAST(SUM(n_tok) AS BIGINT) AS n_toks_lang
            FROM g GROUP BY doc_id, guess),
          r AS (SELECT doc_id, guess, n_paras_lang, n_toks_lang,
              CAST(SUM(n_paras_lang) OVER (PARTITION BY doc_id) AS INT) AS n_paras,
              CAST(SUM(n_toks_lang) OVER (PARTITION BY doc_id) AS BIGINT) AS n_toks,
              ROW_NUMBER() OVER (PARTITION BY doc_id
                ORDER BY n_toks_lang DESC, n_paras_lang DESC, guess ASC) AS rk
            FROM pl)
          SELECT doc_id, guess AS major_lang, n_paras,
            n_paras_lang AS n_major_paras, n_toks_lang AS n_major_toks,
            CAST(n_toks_lang AS DOUBLE) / CAST(n_toks AS DOUBLE) AS frac_major_toks
          FROM r WHERE rk = 1 ORDER BY doc_id""")),

    // d21 — duplication-aware sampling weights ("soft dedup"): each
    // exact-duplicate copy is down-weighted to 1/multiplicity instead
    // of dropped, so a cluster of m identical documents contributes one
    // document's worth of expected training tokens. The weight lives as
    // integer parts-per-million (`1000000 div m`) so the per-source
    // effective-token mass is an exact BIGINT sum — no cross-engine
    // float-summation-order hazard; the only double is the final ratio,
    // one division of exact ints. Fixture plants multiplicity clusters
    // (every 5th-residue-1 doc collapses onto one of 40 shared bodies).
    Q("d21_dup_weights",
      (s, d) => {
        val docs = Tables.documentsSpread(s, d)
          .withColumn("text2",
            when(col("doc_id") % 5 === 1,
              concat(lit("shared duplicate document "), (col("doc_id") % 40).cast("string")))
              .otherwise(col("text")))
          .select(col("source"), md5(col("text2")).as("h"),
            size(split(lower(col("text2")), " ")).cast("int").as("n_tok"))
        dupWeightRollup(docs)
      },
      Some("""WITH docs AS (
          SELECT source, md5(text2) AS h,
            CAST(len(string_split(lower(text2), ' ')) AS INT) AS n_tok
          FROM (SELECT source,
              CASE WHEN doc_id % 5 = 1
                   THEN 'shared duplicate document ' || CAST(doc_id % 40 AS VARCHAR)
                   ELSE text END AS text2
            FROM documents)),
          wm AS (SELECT source, n_tok,
              CAST(COUNT(*) OVER (PARTITION BY h) AS INT) AS m
            FROM docs)
          SELECT source, CAST(COUNT(*) AS INT) AS n_docs,
            CAST(SUM(CASE WHEN m > 1 THEN 1 ELSE 0 END) AS INT) AS n_dup_docs,
            CAST(SUM(n_tok) AS BIGINT) AS sum_tokens,
            CAST(SUM(CAST(n_tok AS BIGINT) * (1000000 // m)) AS BIGINT) AS eff_tokens_ppm,
            CAST(SUM(CAST(n_tok AS BIGINT) * (1000000 // m)) AS DOUBLE) /
              CAST(SUM(n_tok) * 1000000 AS DOUBLE) AS eff_ratio
          FROM wm GROUP BY source ORDER BY source"""))
  )
}
