package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Text-analysis + deduplication operators over `documents` — the
  * LLM-training-pipeline surface (exact dedup, MinHash+LSH, SimHash,
  * n-gram Jaccard, language-ID, quality scoring, token counting,
  * fingerprinting, binary-column plumbing).
  *
  * Cross-engine determinism: hashes are md5 (identical hex in Spark and
  * DuckDB), set sizes are INTs, ratios are single double divisions of
  * exact ints, and every query ends in a total ORDER BY.
  *
  * Scale notes (100 TB): every op here is embarrassingly parallel per
  * document except the pair-join steps, which are written as *blocked*
  * joins (LSH band buckets / lang blocking) — never a full cross join —
  * so the shuffle key is the block, and skew is bounded by block size.
  */
object TextOps {

  /** Tokens of the lowercased text (space-split, matches DuckDB
    * string_split) — THE tokenization definition; every text operator
    * (Tokenize, x3, the specs) reuses this one expression so a future
    * change cannot silently diverge across gates. */
  private[queries] val tokens: Column = split(lower(col("text")), " ")

  /** Word n-grams of the lowercased text; empty (not
    * decreasing-sequence!) when under n tokens.
    *
    * Perf note: higher-order functions bypass codegen subexpression
    * elimination, so a naive `element_at(split(...), i)` inside the
    * lambda re-splits the text per element — O(tokens²) per document.
    * Wrapping the token array in `aggregate(array(...), ...)` binds it
    * to a lambda variable exactly once (~70× faster at bench scale).
    * Every n-gram consumer (shingles, bigram LM) shares this one fence. */
  private[queries] def ngramsExpr(n: Int, distinct: Boolean): Column = {
    val gram = (1 to n).map(j => s"element_at(t, i+$j)")
      .mkString("concat_ws(' ', ", ", ", ")")
    val grams = s"transform(sequence(0, size(t) - $n), i -> $gram)"
    val body = if (distinct) s"array_distinct($grams)" else grams
    expr(s"""aggregate(array(split(lower(text), ' ')), CAST(array() AS array<string>),
      (z, t) -> CASE WHEN size(t) >= $n THEN $body ELSE z END)""")
  }

  /** Distinct word 3-gram shingles. */
  private val shingles: Column = ngramsExpr(3, distinct = true)

  /** DuckDB equivalent of [[shingles]] over alias `t` (token list).
    * `private[graft]` so the composed corpus pipeline's oracle
    * ([[graft.llm.CorpusEtl]]) reuses the exact same SQL fragment. */
  private[graft] val duckShingles =
    """list_distinct(list_transform(range(1, len(t)-1),
       i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))"""

  /** Per-token 16-bit hash: first 4 hex nibbles of md5. Spark side. */
  private val hvalsExpr =
    "transform(split(lower(text), ' '), tok -> cast(conv(substring(md5(tok), 1, 4), 16, 10) as int))"

  /** Same in DuckDB (no hex-string cast, so parse nibbles by strpos),
    * over an arbitrary string-list expression. */
  private def duckHvalsOf(listExpr: String): String =
    s"""list_transform($listExpr, tok ->
        (strpos('0123456789abcdef', substr(md5(tok),1,1))-1)*4096 +
        (strpos('0123456789abcdef', substr(md5(tok),2,1))-1)*256 +
        (strpos('0123456789abcdef', substr(md5(tok),3,1))-1)*16 +
        (strpos('0123456789abcdef', substr(md5(tok),4,1))-1))"""

  private val duckHvals = duckHvalsOf("t")

  /** documents with doc_id, lang, distinct shingle set `s`. */
  private def shingled(s: SparkSession, d: String): DataFrame =
    Tables.documentsSpread(s, d).select(col("doc_id"), col("lang"), shingles.as("s"))

  /** Verified near-dup pairs: MinHash-LSH (band, minhash) bucket
    * candidates (first-matching-band emission — unique pairs, no dedup
    * exchange), exact Jaccard via the fused SortedIntersectCount
    * merge-scan on candidates only. One cached pass computes
    * shingles → (sorted hash array, size, sigs) per doc; it feeds both
    * candidate-join sides and both verify-join sides (Catalyst would
    * otherwise inline the shingle pipeline into every consumer,
    * ~4× recompute). Shared by d2 (the pair report), d7 (clustering) and
    * the composed corpus pipeline ([[graft.llm.CorpusEtl]]). */
  private def jaccardPairs(s: SparkSession, d: String): DataFrame =
    jaccardPairsOf(Tables.documentsSpread(s, d))

  /** [[jaccardPairs]] over an arbitrary `(doc_id, text, …)` frame — the
    * reusable form the composed pipeline runs on its filter/dedup
    * survivors. Candidates are floored at jaccard ≥ 0.05 (below that a
    * pair must still share a minhash band to be seen at all, so lower
    * thresholds would be LSH-recall-limited anyway). */
  /** Per-document dedup signature frame: `(doc_id, h sorted-xxhash64
    * shingles, n, sigs minhash array)` — the unit both the batch pair
    * pipeline and the incremental index ([[graft.llm.DedupIndex]])
    * persist/join on. */
  private[graft] def sigFrame(input: DataFrame): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    input.select(col("doc_id"), shingles.as("s")).select(col("doc_id"),
      sort_array(transform(col("s"), x => xxhash64(x))).as("h"),
      size(col("s")).cast("int").as("n"),
      ColumnBridge.column(graft.functions.MinHashSigs(
        ColumnBridge.expression(col("s")))).as("sigs"))
  }

  /** First index (0-based) where two minhash signature arrays agree —
    * the decide-per-row band dedup both pair pipelines share. */
  private[graft] val firstSharedBand =
    expr("array_position(zip_with(sig_a, sig_b, (x, y) -> x = y), true) - 1")

  /** Exact-verify LSH candidate pairs: join back the shingle-hash
    * arrays, fused merge-scan intersection, jaccard ≥ `minJaccard`.
    * `cand` must carry (doc_a, doc_b); `docs` is a [[sigFrame]]. */
  private[graft] def verifyPairs(cand: DataFrame, docs: DataFrame,
      minJaccard: Double): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    val nCommon = ColumnBridge.column(graft.functions.SortedIntersectCount(
      ColumnBridge.expression(col("ha")), ColumnBridge.expression(col("hb"))))
    cand
      .join(docs.select(col("doc_id").as("doc_a"),
        col("h").as("ha"), col("n").as("na")), Seq("doc_a"))
      .join(docs.select(col("doc_id").as("doc_b"),
        col("h").as("hb"), col("n").as("nb")), Seq("doc_b"))
      // explode(array(…)) fence: the threshold filter would otherwise
      // inline the merge-scan kernel a second time per pair
      .select(col("doc_a"), col("doc_b"), col("na"), col("nb"),
        explode(array(nCommon)).as("n_common"))
      .withColumn("jaccard",
        col("n_common").cast("double") /
          (col("na") + col("nb") - col("n_common")).cast("double"))
      .where(col("jaccard") >= minJaccard)
  }

  def jaccardPairsOf(input: DataFrame): DataFrame = {
    // EAGER materialization, not .cache(): the band self-join's two
    // exchange sides (and the verify join-backs) are independent AQE
    // shuffle stages that materialize CONCURRENTLY, and a lazy cache is
    // populated without locking — both stages found it cold and each
    // re-ran the full shingle+MinHash pipeline (JobProbe r13 on d16: two
    // parallel 35 s/47 s-taskMs jobs for one logical sigFrame pass).
    // The checkpoint is corpus-membership-sized (id + hash array + sigs).
    val docs = sigFrame(input).localCheckpoint(true)
    val bands = docs.select(col("doc_id"), col("sigs"),
      posexplode(col("sigs")).as(Seq("band", "mh")))
    val cand = bands.select(col("doc_id").as("doc_a"), col("sigs").as("sig_a"),
        col("band"), col("mh"))
      .join(bands.select(col("doc_id").as("doc_b"), col("sigs").as("sig_b"),
        col("band"), col("mh")), Seq("band", "mh"))
      .where(col("doc_a") < col("doc_b"))
      .where(col("band") === firstSharedBand)
      .select("doc_a", "doc_b")
    verifyPairs(cand, docs, 0.05)
  }

  /** All 8 md5 MinHash values packed into ONE array column — a single
    * reference, so ProjectCollapse can't duplicate the shingle
    * computation into 8 inlined copies. Computed by the hand-tuned
    * [[graft.functions.MinHashSigs]] kernel (same md5 semantics as the
    * oracle SQL, ~6× faster than the expression-tree form). */
  private def minhashSigs(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    shingled(s, d).select(col("doc_id"),
      ColumnBridge.column(graft.functions.MinHashSigs(
        ColumnBridge.expression(col("s")))).as("sigs"))
  }

  /** DuckDB MinHash signatures over any relation exposing
    * `(doc_id, text)` — the oracle-side twin of [[minhashSigs]] /
    * `MinHashSigs`, parameterized so composed pipelines can run it on a
    * filtered CTE instead of the raw table. */
  private[graft] def duckSigsFrom(src: String): String =
    s"""SELECT doc_id, list_transform(range(0, 8),
          k -> list_min(list_transform(sh, x -> md5(k::VARCHAR || '|' || x)))) AS sigs
        FROM (SELECT doc_id, $duckShingles AS sh
              FROM (SELECT doc_id, string_split(lower(text), ' ') AS t FROM $src))"""

  private val duckSigs = duckSigsFrom("documents")

  /** 64-bit SimHash via the hand-tuned [[graft.functions.SimHash64]]
    * kernel (same md5 semantics as the oracle SQL). 64 bits — not the
    * r1-r12 16-bit form — because the band join's bucket count is what
    * bounds Σbucket² pair work: 4-bit nibbles give 16 bucket values per
    * band (each holds ~N/64 of the corpus → quadratic growth, the
    * measured worst 10× grower), while 8 one-byte bands give 256 and
    * share [[graft.llm.HammingLsh]]'s pigeonhole-complete ≤7 join with
    * m4/m5. */
  private def simhashCol: Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.functions.SimHash64(
      ColumnBridge.expression(split(lower(col("text")), " "))))
  }

  /** DuckDB twin of [[simhashCol]]: per-token v = first 16 md5 hex
    * chars as UBIGINT; 64 bit-votes; result re-biased from the HUGEINT
    * bit-sum to the signed BIGINT two's-complement pattern Spark's
    * LongType carries. */
  private val duckSimhash =
    s"""SELECT doc_id, CAST(CASE WHEN h >= 9223372036854775808::HUGEINT
               THEN h - 18446744073709551616::HUGEINT ELSE h END AS BIGINT) AS simhash
        FROM (SELECT doc_id, list_sum(list_transform(range(0, 64), i ->
                CASE WHEN list_sum(list_transform(hs, v ->
                       CASE WHEN ((v >> i) & 1::UBIGINT) = 1::UBIGINT THEN 1 ELSE -1 END)) > 0
                     THEN (1::HUGEINT << i) ELSE 0::HUGEINT END)) AS h
              FROM (SELECT doc_id, list_transform(t,
                      tok -> ('0x' || substr(md5(tok), 1, 16))::UBIGINT) AS hs
                    FROM (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents)))"""

  private def dupFrac(tot: Column, dis: Column): Column =
    when(tot === 0, lit(0.0))
      .otherwise((tot - dis).cast("double") / tot.cast("double"))

  /** Heuristic document quality (type-token ratio, stop-word ratio,
    * mean token length — 0.4/0.3/0.3 weighted). All ratios are single
    * double divisions of exact ints and the blend is evaluated in
    * identical operand order on both engines, so the score is bit-exact
    * cross-engine — which is what lets d12 ORDER BY it for keeper
    * selection. Shared by the t2 gate and d12. */
  def qualityScores(docs: DataFrame): DataFrame =
    docs
      .withColumn("t", tokens)
      .select(col("doc_id"), col("n_chars"),
        size(col("t")).cast("int").as("n_tokens"),
        size(array_distinct(col("t"))).cast("int").as("n_distinct"),
        size(filter(col("t"), t => t.isin("the", "a", "and", "of"))).cast("int").as("n_stop"))
      .withColumn("ttr", col("n_distinct").cast("double") / col("n_tokens").cast("double"))
      .withColumn("stop_ratio", col("n_stop").cast("double") / col("n_tokens").cast("double"))
      .withColumn("mean_tok_len",
        (col("n_chars").cast("double") / col("n_tokens").cast("double")))
      .withColumn("quality",
        lit(0.4) * col("ttr") + lit(0.3) * (lit(1.0) - col("stop_ratio")) +
          lit(0.3) * least(lit(1.0), col("mean_tok_len") / lit(10.0)))

  /** Every gram-count stat in ONE expression with the token array bound
    * once (`includeTop` adds the map-side top-token count). Consumers
    * must materialize it through `explode(array(…))`: a Generate is a
    * predicate-pushdown substitution barrier, so a later filter on the
    * stats references the struct FIELD instead of re-inlining the full
    * HOF chain per conjunct — measured 7× on the composed pipeline
    * (26 s → 3.7 s for the filtered stats at sf0.1; the same trap as the
    * shingle binding above, one level up). */
  private def gramStatsStruct(includeTop: Boolean): Column = {
    val top = if (includeTop)
      ", cast(array_max(transform(array_distinct(t), x -> size(filter(t, y -> y = x)))) as int) AS top_cnt"
    else ""
    expr(s"""aggregate(array(split(lower(text), ' ')),
      CAST(NULL AS struct<n_tokens:int,n_2g:int,n_2g_d:int,n_3g:int,n_3g_d:int${
        if (includeTop) ",top_cnt:int" else ""}>),
      (z, t) -> struct(
        cast(size(t) as int) AS n_tokens,
        cast(CASE WHEN size(t) >= 2 THEN size(t) - 1 ELSE 0 END as int) AS n_2g,
        cast(CASE WHEN size(t) >= 2 THEN size(array_distinct(
          transform(sequence(1, size(t) - 1),
            i -> concat_ws(' ', element_at(t, i), element_at(t, i+1))))) ELSE 0 END as int) AS n_2g_d,
        cast(CASE WHEN size(t) >= 3 THEN size(t) - 2 ELSE 0 END as int) AS n_3g,
        cast(CASE WHEN size(t) >= 3 THEN size(array_distinct(
          transform(sequence(1, size(t) - 2),
            i -> concat_ws(' ', element_at(t, i), element_at(t, i+1), element_at(t, i+2))))) ELSE 0 END as int) AS n_3g_d
        $top))""")
  }

  /** Per-document repetition statistics (Gopher/MassiveText-style quality
    * rules, a public recipe): duplicate 2-/3-gram fractions, the
    * most-frequent-token fraction, and the keep/drop verdict at the
    * published default thresholds. The n-gram fractions are map-side HOFs
    * over the bound token array; the top-token count is the scalable
    * explode → (doc, token) count → per-doc max shape (shuffle keyed on
    * doc_id — never a per-doc quadratic scan). Fractions are single
    * double divisions of exact ints, so the verdict compares identically
    * cross-engine. Shared by the t6 gate and [[graft.llm.CorpusEtl]]. */
  def repetitionStats(input: DataFrame): DataFrame = {
    val base = input
      .select(col("doc_id"), explode(array(gramStatsStruct(includeTop = false))).as("rs"))
      .select(col("doc_id"), col("rs.n_tokens").as("n_tokens"),
        col("rs.n_2g").as("n_2g"), col("rs.n_2g_d").as("n_2g_d"),
        col("rs.n_3g").as("n_3g"), col("rs.n_3g_d").as("n_3g_d"))
    val top = input
      .select(col("doc_id"), explode(tokens).as("tok"))
      .groupBy("doc_id", "tok").count()
      .groupBy("doc_id").agg(max(col("count")).cast("int").as("top_cnt"))
    base.join(top, Seq("doc_id"))
      .withColumn("dup_2g_frac", dupFrac(col("n_2g"), col("n_2g_d")))
      .withColumn("dup_3g_frac", dupFrac(col("n_3g"), col("n_3g_d")))
      .withColumn("top_tok_frac",
        col("top_cnt").cast("double") / col("n_tokens").cast("double"))
      .withColumn("keep",
        col("dup_2g_frac") <= 0.9 && col("dup_3g_frac") <= 0.8 &&
          col("top_tok_frac") <= 0.2)
  }

  /** Shuffle-free twin of [[repetitionStats]]: ADDS the same stat columns
    * to the input (all original columns retained), computing the
    * top-token count per row with a nested HOF instead of the
    * explode → groupBy shape. Identical values (spec-asserted
    * differentially); cost is O(distinct_tokens × tokens) per document
    * instead of a doc_id-keyed shuffle — the form a STATELESS streaming
    * stage needs, and the better batch plan when the row already has to
    * be carried through (no join back). */
  def repetitionStatsInline(input: DataFrame): DataFrame =
    input
      .select(col("*"), explode(array(gramStatsStruct(includeTop = true))).as("__rs"))
      .withColumn("n_tokens", col("__rs.n_tokens"))
      .withColumn("top_cnt", col("__rs.top_cnt"))
      .withColumn("dup_2g_frac", dupFrac(col("__rs.n_2g"), col("__rs.n_2g_d")))
      .withColumn("dup_3g_frac", dupFrac(col("__rs.n_3g"), col("__rs.n_3g_d")))
      .withColumn("top_tok_frac",
        col("top_cnt").cast("double") / col("n_tokens").cast("double"))
      .withColumn("keep",
        col("dup_2g_frac") <= 0.9 && col("dup_3g_frac") <= 0.8 &&
          col("top_tok_frac") <= 0.2)
      .drop("__rs")

  /** BM25 (k1=1.2, b=0.75) scores for a fixed keyword query over a
    * `(doc_id, text, …)` corpus — one row per document with per-term
    * frequencies and the summed score. Uses the rational Robertson idf
    * `(N − df + 0.5)/(df + 0.5)` instead of the classic log form so the
    * score is pure +,*,/ over int-derived doubles: bit-exact across
    * engines AND across this function and the driver-side reference
    * interpreter (Bm25FuzzSpec). Scale shape: tf per term is a map-side
    * array `filter` (no explode, no per-term shuffle); the corpus stats
    * (N, Σdl, per-term df) are ONE aggregate row broadcast back over the
    * scan, so the only exchanges at any scale are the 1-row stats
    * aggregation and whatever the caller does with the scores. */
  /** t8's oracle SQL parameterized by term list and a documents WHERE
    * clause — the from-scratch recompute the stored-index gates
    * (t8b/t8c) are pinned against. Shape and arithmetic identical to
    * the inline t8 oracle; only the terms and the survivor filter vary. */
  private def duckBm25(terms: Seq[String], where: String): String = {
    val tfCols = terms.map(t =>
      s"CAST(len(list_filter(t, x -> x = '$t')) AS INT) AS tf_$t")
      .mkString(",\n            ")
    val dfCols = terms.map(t =>
      s"SUM(CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END) AS df_$t")
      .mkString(",\n            ")
    val parts = terms.map(t =>
      s"""((n_docs - df_$t + 0.5e0) / (df_$t + 0.5e0)) *
              (tf_$t * 2.2e0) /
              (tf_$t + 1.2e0 * (0.25e0 + 0.75e0 * (dl / (sum_dl / n_docs))))""")
      .mkString(" +\n          ")
    s"""WITH per_doc AS (
          SELECT doc_id, CAST(len(t) AS INT) AS dl,
            $tfCols
          FROM (SELECT doc_id, string_split(lower(text), ' ') AS t
                FROM documents $where)),
        stats AS (
          SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl,
            $dfCols
          FROM per_doc)
        SELECT doc_id, ${terms.map("tf_" + _).mkString(", ")},
          $parts AS bm25
        FROM per_doc, stats
        WHERE bm25 > 0 ORDER BY bm25 DESC, doc_id LIMIT 25"""
  }

  def bm25(input: DataFrame, terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty && terms.map(_.toLowerCase).distinct.size == terms.size,
      "terms must be non-empty and distinct")
    require(terms.forall(_.matches("[a-z0-9_]+")),
      s"terms must be bare lowercase tokens, got $terms")
    // One tokenization per document per pass: the token array binds once
    // via aggregate(array(...)) (HOF args bypass codegen subexpression
    // elimination — dl + one filter per term would otherwise re-split the
    // text per derived column), and the stats struct crosses a Generate
    // fence so downstream consumers reference the generated attribute
    // instead of re-inlining the chain (the d2/t6 lesson).
    val tfStruct = expr(s"""aggregate(array(split(lower(text), ' ')),
        cast(null as struct<dl:int${terms.map(t => s",tf_$t:int").mkString}>),
        (z, t) -> struct(size(t) as dl${terms.map(tm =>
          s", size(filter(t, x -> x = '$tm')) as tf_$tm").mkString}))""")
    val perDoc = input
      .select(col("doc_id"), explode(array(tfStruct)).as("__tf"))
      .select(col("doc_id") +: col("__tf.dl").as("dl") +:
        terms.map(t => col(s"__tf.tf_$t").as(s"tf_$t")): _*)
    val stats = perDoc.agg(
      count(lit(1)).as("n_docs"),
      sum(col("dl")).as("sum_dl") +:
        terms.map(t =>
          sum(when(col(s"tf_$t") > 0, 1L).otherwise(0L)).as(s"df_$t")): _*)
    def part(term: String): String =
      s"""((n_docs - df_$term + 0.5e0) / (df_$term + 0.5e0)) *
          (tf_$term * 2.2e0) /
          (tf_$term + 1.2e0 * (0.25e0 + 0.75e0 * (dl / (sum_dl / n_docs))))"""
    perDoc.crossJoin(broadcast(stats))
      .select(col("doc_id") +: terms.map(t => col(s"tf_$t")) :+
        expr(terms.map(part).mkString(" + ")).as("bm25"): _*)
  }

  /** Bigram-LM quality scores over a `(doc_id, text, …)` corpus — the
    * model is trained on the same corpus (bigram conditional counts),
    * every document is scored by its weakest/strongest bigram and its
    * rare-bigram count. Per-doc statistics are deliberately
    * order-independent (min/max/int-counts — never an agg-sum of true
    * doubles), so results are bit-exact across engines and against the
    * driver-side reference in BigramLmFuzzSpec. Documents with fewer
    * than 2 tokens have no bigrams and are absent from the output. */
  /** Corpus bigram stream rejoined with its own trained model: one row
    * per bigram OCCURRENCE, carrying the model counts `(c_bg, c_w1)` so
    * `p(w2|w1) = c_bg / c_w1`. Shared by t9 (probability stats) and t13
    * (surprisal quantization).
    *
    * Two tokenize+explode passes over the corpus (model training,
    * scoring) — and only two: the MODEL is cached, so the prefix
    * aggregate derives from it instead of re-tokenizing a third time
    * (Catalyst would otherwise inline the HOF chain into every
    * consumer). The cache deliberately holds the aggregated model, not
    * the exploded bigram stream: the model is vocabulary-bounded while
    * the stream is corpus-sized × tokens — the one you could never pin
    * at 100 TB.
    * Both the bigram and its prefix word are hashed to xxhash64 longs
    * in the narrow projection right after the explode: the model
    * aggregate, the prefix aggregate, and the corpus-sized scoring
    * join all exchange 8-byte keys instead of bigram strings, and
    * every aggregate stays on mutable-buffer types (a string-valued
    * agg would demote HashAggregate to SortAggregate). w1_h is
    * functionally dependent on bg_h, so grouping by both is the same
    * grouping; collisions (~n²/2⁶⁵) are negligible at any vocabulary
    * size, and the oracle keeps its string keys — values must agree. */
  private def bigramScored(input: DataFrame): DataFrame = {
    val docBg = input.select(col("doc_id"),
      explode(ngramsExpr(2, distinct = false)).as("bigram"))
      .select(col("doc_id"), xxhash64(col("bigram")).as("bg_h"),
        xxhash64(expr("element_at(split(bigram, ' '), 1)")).as("w1_h"))
    // eager, not .cache(): the prefix aggregate and the score join's
    // build side are independent AQE stages — a cold lazy cache re-runs
    // the corpus bigram explode + count per stage (see jaccardPairsOf);
    // the model is bigram-vocabulary-sized
    val model = docBg.groupBy("bg_h", "w1_h").agg(count(lit(1)).as("c_bg"))
      .localCheckpoint(true)
    val prefix = model.groupBy("w1_h").agg(sum(col("c_bg")).cast("long").as("c_w1"))
    docBg.join(model.join(prefix, Seq("w1_h")).select("bg_h", "c_bg", "c_w1"),
      Seq("bg_h"))
  }

  def bigramLm(input: DataFrame): DataFrame =
    bigramScored(input)
      .withColumn("p", col("c_bg").cast("double") / col("c_w1").cast("double"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("c_bg") <= 1, 1L).otherwise(0L)).as("n_rare"),
        min(col("p")).as("min_p"), max(col("p")).as("max_p"))

  /** Per-node degree + incident-triangle counts over a canonical
    * (doc_a < doc_b, distinct) undirected edge set — the dedup-graph QA
    * metric behind d10. Triangle enumeration is the ordered-edge join
    * (a<b<c: (a,b)⋈(b,c)⋈(a,c)), every step an equi-join on node ids;
    * the input is cached because it feeds five consumers. Canonical
    * edges are the caller's contract — a reversed or duplicate edge
    * would silently double-count (all in-repo producers emit
    * doc_a < doc_b distinct). Fuzzed against brute-force enumeration in
    * DupGraphFuzzSpec. */
  def dupGraphMetrics(pairsIn: DataFrame): DataFrame = {
    val Seq(ca, cb) = pairsIn.columns.toSeq.take(2)
    // eager, not .cache(): five consumers materialize as concurrent AQE
    // stages — a cold lazy cache re-runs the pair pipeline per stage
    // (see jaccardPairsOf); the edge list is membership-sized
    val pairs = pairsIn.select(col(ca).as("doc_a"), col(cb).as("doc_b"))
      .localCheckpoint(true)
    val deg = pairs.select(col("doc_a").as("doc_id"))
      .unionByName(pairs.select(col("doc_b").as("doc_id")))
      .groupBy("doc_id").agg(count(lit(1)).cast("int").as("degree"))
    val tri = pairs.select(col("doc_a").as("a"), col("doc_b").as("b"))
      .join(pairs.select(col("doc_a").as("b"), col("doc_b").as("c")), Seq("b"))
      .join(pairs.select(col("doc_a").as("a"), col("doc_b").as("c")), Seq("a", "c"))
    val triPerNode = tri
      .select(explode(array(col("a"), col("b"), col("c"))).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).cast("int").as("n_triangles"))
    deg.join(triPerNode, Seq("doc_id"), "left")
      .withColumn("n_triangles", coalesce(col("n_triangles"), lit(0)))
  }

  /** Fixed-point integer PageRank over an undirected pair graph —
    * importance scoring on the dedup graph (a high-rank node is the hub
    * of a duplicate family; rank mass concentrates where d10's
    * degree/triangle counts flag structure). Iterative-algorithm shape
    * beyond connected components: rank flows along edges each round,
    * one keyed shuffle per iteration (contributions partial-aggregate
    * map-side in the hash agg), never an all-pairs product.
    *
    * Determinism: transcendental-free. Ranks live in integer micro-units
    * (start 10^6); a node's contribution is `rank div degree` (exact
    * floor), damping is `150000 + (85 * Σcontrib) div 100` — pure long
    * arithmetic, bit-identical in any engine, where the float form would
    * hash-diverge on summation order. */
  def pageRank(pairsIn: DataFrame, iters: Int): DataFrame = {
    val Seq(ca, cb) = pairsIn.columns.toSeq.take(2)
    // eager, not .cache(): deg's aggregate exchange and adj's join-probe
    // exchange materialize concurrently under AQE, and each found the
    // lazy cache cold — the whole LSH-verify pipeline ran twice per d16
    // invocation (JobProbe r13: 35 s + 47 s taskMs twin jobs)
    val pairs = pairsIn.select(col(ca).as("src"), col(cb).as("dst"))
      .localCheckpoint(true)
    val ed = pairs.unionAll(
      pairs.select(col("dst").as("src"), col("src").as("dst")))
    val deg = ed.groupBy("src").agg(count(lit(1)).as("degree"))
    val adj = ed.join(deg, "src").cache() // (src, dst, degree)
    val rank = pageRankIterations(adj, deg, iters)
    // Eager checkpoint so the per-call caches can be released here (the
    // Components idiom): the returned frame no longer references adj, so
    // unpersisting can't force a recompute through the LSH pipeline, and
    // repeated invocations don't accumulate cached partitions.
    val out = rank.localCheckpoint(true)
    adj.unpersist()
    out
  }

  /** [[pageRank]]'s rank-flow loop as a LAZY plan (no cache, no
    * checkpoint): the form PlanShapeSpec inspects — the checkpointed
    * production frame's executed plan is just an ExistingRDD scan, which
    * would make a cartesian-free assertion on it vacuous. */
  private[queries] def pageRankLazyPlan(pairsIn: DataFrame,
      iters: Int): DataFrame = {
    val Seq(ca, cb) = pairsIn.columns.toSeq.take(2)
    val pairs = pairsIn.select(col(ca).as("src"), col(cb).as("dst"))
    val ed = pairs.unionAll(
      pairs.select(col("dst").as("src"), col("src").as("dst")))
    val deg = ed.groupBy("src").agg(count(lit(1)).as("degree"))
    pageRankIterations(ed.join(deg, "src"), deg, iters)
  }

  /** d16's full pipeline in [[pageRankLazyPlan]] form (plan inspection). */
  private[queries] def pageRankLazyGate(s: SparkSession,
      d: String): DataFrame =
    pageRankLazyPlan(jaccardPairs(s, d).select("doc_a", "doc_b"), 5)

  private def pageRankIterations(adj: DataFrame, deg: DataFrame,
      iters: Int): DataFrame = {
    var rank = deg.select(col("src").as("doc_id"), lit(1000000L).as("rank"))
    for (_ <- 1 to iters)
      rank = adj.join(rank, adj("src") === rank("doc_id"))
        .select(col("dst"), expr("rank div degree").as("c"))
        .groupBy("dst")
        .agg(expr("cast(150000 + (85 * sum(c)) div 100 as bigint)").as("rank"))
        .select(col("dst").as("doc_id"), col("rank"))
    rank
  }

  /** d16's oracle iterations — the same integer-unit rank flow as five
    * chained CTEs (fixed iteration count, so no recursive CTE needed;
    * DuckDB's `//`+HUGEINT matches Spark's `div`+long exactly). */
  private val duckPrIters = (1 to 5).map { i =>
    s"""it$i AS (SELECT e.dst AS doc_id,
          CAST(150000 + (85 * SUM(p.rank // dg.degree)) // 100 AS BIGINT) AS rank
        FROM it${i - 1} p JOIN deg dg ON p.doc_id = dg.src
                          JOIN ed e ON e.src = p.doc_id
        GROUP BY e.dst)"""
  }.mkString(",\n        ")

  /** m2/m3's shared frame contract — 16-BYTE frames sliced directly from
    * the binary payload, keep every 4th, md5 each byte slice. Lives once
    * so a stride/size change can't desynchronize the two gates.
    *
    * Addressing is in the BYTE domain (Spark `substring`/`length`/`md5`
    * all operate bytewise on BinaryType): this is the contract real
    * codec output needs — frames of an mp4/wav are byte ranges, and any
    * hex round-trip would double the scan/explode width for nothing.
    * FrameSampleSpec pins the bytewise semantics on non-UTF-8-boundary
    * payloads against JVM-computed digests, which the SQL oracle can't
    * exercise (see [[duckFrames]]). */
  private[queries] def sampledFrames(docs: DataFrame): DataFrame =
    docs.withColumn("payload", encode(col("text"), "UTF-8"))
      .withColumn("frame_idx", explode(expr(
        "filter(sequence(0, greatest(int(ceil(length(payload) / 16.0)), 1) - 1), i -> i % 4 = 0)")))
      .select(col("doc_id"), col("frame_idx").cast("int").as("frame_idx"),
        md5(expr("substring(payload, frame_idx * 16 + 1, 16)")).as("frame_md5"),
        length(expr("substring(payload, frame_idx * 16 + 1, 16)"))
          .cast("int").as("frame_bytes"))

  /** DuckDB twin of [[sampledFrames]] (same columns, same contract).
    * This DuckDB build has no BLOB substring/md5, so the oracle slices
    * the VARCHAR by characters and md5s that — byte-identical to the
    * Spark side exactly when the text is pure ASCII, which the corpus
    * is. The precondition is asserted IN the oracle (`error(...)`), so a
    * regenerated corpus with multi-byte text fails the gate loudly
    * instead of hash-diverging in silence. */
  private val duckFrames =
    """SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
         md5(substr(t, frame_idx * 16 + 1, 16)) AS frame_md5,
         CAST(length(substr(t, frame_idx * 16 + 1, 16)) AS INT) AS frame_bytes
       FROM (SELECT doc_id, t,
               unnest(range(0, greatest(CAST(ceil(length(t) / 16.0) AS INT), 1))) AS frame_idx
             FROM (SELECT doc_id,
                     CASE WHEN octet_length(encode(text)) = length(text) THEN text
                          ELSE error('duckFrames oracle requires ASCII text; char-slicing diverges from the byte frames the engine computes')
                     END AS t
                   FROM documents))
       WHERE frame_idx % 4 = 0"""

  val all: Seq[Q] = Seq(

    // Exact dedup: hash-groupBy on content digest. At 100 TB this is one
    // shuffle on a 128-bit key — the canonical first dedup pass.
    Q("d1_dedup_exact",
      (s, d) => Tables.documentsSpread(s, d)
        .groupBy(md5(col("text")).as("content_hash"))
        .agg(count(lit(1)).as("n_copies"), min("doc_id").as("keep_id"))
        .orderBy("content_hash"),
      Some("""SELECT md5(text) AS content_hash, COUNT(*) AS n_copies,
          MIN(doc_id) AS keep_id
        FROM documents GROUP BY md5(text) ORDER BY content_hash""")),

    // N-gram Jaccard near-dup, the production MinHash-LSH pipeline shape:
    // candidate pairs come from (band, minhash) bucket equi-joins (exactly
    // d4's shuffle-keyed join — quadratic only within a bucket), then
    // exact Jaccard verifies ONLY the candidates via the fused merge-scan
    // SortedIntersectCount on sorted xxhash64 arrays — string work happens
    // once per document, not once per pair. Nothing broadcasts or
    // cross-joins the corpus (plan-asserted in PlanShapeSpec), so the
    // shape survives 100 TB; the trade is LSH recall (a pair must share
    // ≥1 of 8 minhashes to be seen), which the oracle mirrors.
    Q("d2_dedup_ngram_jaccard",
      (s, d) => jaccardPairs(s, d)
        .select("doc_a", "doc_b", "n_common", "jaccard")
        .orderBy("doc_a", "doc_b"),
      Some(s"""WITH sig AS ($duckSigs),
          bands AS (SELECT doc_id, k AS band, sigs[k + 1] AS mh FROM sig, range(0, 8) t(k)),
          cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                   FROM bands a JOIN bands b
                     ON a.band = b.band AND a.mh = b.mh AND a.doc_id < b.doc_id),
          sh AS (SELECT doc_id, $duckShingles AS s
                 FROM (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents))
        SELECT doc_a, doc_b, n_common, jaccard FROM (
          SELECT doc_a, doc_b,
            CAST(len(list_intersect(a.s, b.s)) AS INT) AS n_common,
            CAST(CAST(len(list_intersect(a.s, b.s)) AS INT) AS DOUBLE) /
              CAST(len(a.s) + len(b.s) - CAST(len(list_intersect(a.s, b.s)) AS INT) AS DOUBLE) AS jaccard
          FROM cand JOIN sh a ON cand.doc_a = a.doc_id
                    JOIN sh b ON cand.doc_b = b.doc_id)
        WHERE jaccard >= 0.05 ORDER BY doc_a, doc_b""")),

    // The SAME near-dup pair contract served from the INCREMENTAL index
    // (graft.llm.DedupIndex) through its full lifecycle: the gate feeds
    // the corpus in two batches, REMOVES two id slices (takedown),
    // re-ADDS one of them (recall reversed), then queries the surviving
    // docs against the live index via the lookup path. The oracle is
    // d2's batch pipeline restricted to exactly the surviving ids — so
    // what's pinned is that tombstoned docs stop matching (as members
    // and as candidates), that a re-add after a removal is a fresh
    // membership indistinguishable from never-removed, and that the
    // lookup join (query postings × index postings on (band, mh))
    // reproduces the batch pipeline's candidate rule. Session-memoized
    // tmp dir, the v9b/v9c discipline.
    Q("d17_dedup_index_tombstone",
      (s, d) => {
        val tag = d.replaceAll("[^A-Za-z0-9]", "_")
        val dir = new java.io.File(sys.props("java.io.tmpdir"),
          s"graft_dedup_tomb/$tag/${graft.Sessions.sessionTag(s)}").getAbsolutePath
        val marker = s"graft_d17_marker_$tag"
        if (!s.catalog.tableExists(marker)) {
          val docs = Tables.documentsSpread(s, d).select("doc_id", "text")
          graft.llm.DedupIndex.checkAndAdd(s, dir, docs.where(col("doc_id") % 2 === 0))
          graft.llm.DedupIndex.checkAndAdd(s, dir, docs.where(col("doc_id") % 2 =!= 0))
          graft.llm.DedupIndex.remove(s, dir,
            docs.where(col("doc_id") % 13 === 2 || col("doc_id") % 13 === 5)
              .select("doc_id"))
          graft.llm.DedupIndex.checkAndAdd(s, dir, docs.where(col("doc_id") % 13 === 2))
          s.emptyDataFrame.createOrReplaceTempView(marker)
        }
        graft.llm.DedupIndex.matches(s, dir,
            Tables.documentsSpread(s, d).where(col("doc_id") % 13 =!= 5)
              .select("doc_id", "text"))
          .orderBy("doc_a", "doc_b")
      },
      Some(s"""WITH live AS (SELECT * FROM documents WHERE doc_id % 13 <> 5),
          sig AS (${duckSigsFrom("live")}),
          bands AS (SELECT doc_id, k AS band, sigs[k + 1] AS mh FROM sig, range(0, 8) t(k)),
          cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                   FROM bands a JOIN bands b
                     ON a.band = b.band AND a.mh = b.mh AND a.doc_id < b.doc_id),
          sh AS (SELECT doc_id, $duckShingles AS s
                 FROM (SELECT doc_id, string_split(lower(text), ' ') AS t FROM live))
        SELECT doc_a, doc_b, n_common, jaccard FROM (
          SELECT doc_a, doc_b,
            CAST(len(list_intersect(a.s, b.s)) AS INT) AS n_common,
            CAST(CAST(len(list_intersect(a.s, b.s)) AS INT) AS DOUBLE) /
              CAST(len(a.s) + len(b.s) - CAST(len(list_intersect(a.s, b.s)) AS INT) AS DOUBLE) AS jaccard
          FROM cand JOIN sh a ON cand.doc_a = a.doc_id
                    JOIN sh b ON cand.doc_b = b.doc_id)
        WHERE jaccard >= 0.05 ORDER BY doc_a, doc_b""")),

    // Dedup clustering: verified near-dup pairs → connected components →
    // (doc, canonical keeper). Spark runs iterative hash-min label
    // propagation (graft.queries.Components — one equi-join + groupBy-min
    // per round, rounds = cluster diameter, lineage-truncated); the
    // oracle recomputes components with a recursive-CTE transitive
    // closure. Two structurally different algorithms must agree on every
    // component. This is also where the iterative DataFrame model earns
    // its fixed costs: the closure's row count explodes quadratically in
    // cluster size while hash-min stays linear per round.
    Q("d7_dedup_clusters",
      (s, d) => Components
        .connectedComponents(jaccardPairs(s, d).select("doc_a", "doc_b"))
        .withColumnRenamed("node", "doc_id")
        .orderBy("doc_id"),
      Some(s"""WITH RECURSIVE sig AS ($duckSigs),
          bands AS (SELECT doc_id, k AS band, sigs[k + 1] AS mh FROM sig, range(0, 8) t(k)),
          cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                   FROM bands a JOIN bands b
                     ON a.band = b.band AND a.mh = b.mh AND a.doc_id < b.doc_id),
          sh AS (SELECT doc_id, $duckShingles AS s
                 FROM (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents)),
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
            SELECT e.u, r.v FROM edges e JOIN reach r ON e.v = r.u)
        SELECT u AS doc_id, MIN(v) AS component FROM reach GROUP BY u
        ORDER BY doc_id""")),

    // Adversarial-topology CC: the same component contract as d7, but on
    // a DEEP CHAIN graph (consecutive doc ids linked, broken every 200 —
    // diameter ≈ 200, far beyond hash-min's round budget) solved by the
    // two-phase large-star/small-star variant, which converges in
    // O(log diameter) rounds. d7 gates hash-min on shallow LSH clusters;
    // this row gates the log-round algorithm on the topology that needs
    // it, against the same recursive-closure oracle. At 100 TB this is
    // the difference between 8 shuffles and 200 on a pathological
    // near-dup chain (boilerplate A≈B≈C≈… drift).
    Q("d13_cc_chain",
      (s, d) => {
        val ids = Tables.documents(s, d).select(col("doc_id"))
        val pairs = ids.select(col("doc_id").as("doc_a"))
          .join(ids.select(col("doc_id").as("doc_b")),
            col("doc_b") === col("doc_a") + 1)
          .where(col("doc_a") % 200 =!= 199)
        Components.connectedComponentsStar(pairs)
          .withColumnRenamed("node", "doc_id")
          .orderBy("doc_id")
      },
      Some("""WITH RECURSIVE e AS (
            SELECT a.doc_id AS u, b.doc_id AS v
            FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
            WHERE a.doc_id % 200 <> 199),
          edges AS (SELECT u, v FROM e UNION SELECT v, u FROM e),
          reach(u, v) AS (
            SELECT u, u FROM (SELECT DISTINCT u FROM edges)
            UNION
            SELECT e.u, r.v FROM edges e JOIN reach r ON e.v = r.u)
        SELECT u AS doc_id, MIN(v) AS component FROM reach GROUP BY u
        ORDER BY doc_id""")),

    // The adversarial topology d13's ordered chain can't represent:
    // consecutive nodes in HASH order (md5 of the id), so component
    // minima sit at arbitrary chain positions and every id-locality
    // shortcut (min propagating monotonically along ids) is gone —
    // the worst case for label propagation, where hash-min needs
    // ~segment-length rounds. The star variant must still close in
    // O(log diameter) rounds (ComponentsSpec pins the ROUND COUNT on
    // this exact graph via connectedComponentsStarStats; this gate pins
    // the output against the recursive-closure oracle). Segment break
    // every 173 hash-ranks — prime, so segments don't align with any
    // id structure.
    Q("d13b_cc_hash_chain",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(md5(col("doc_id").cast("string")))
        val ranked = Tables.documents(s, d).select(col("doc_id"))
          .withColumn("rk", row_number().over(w))
        val pairs = ranked.select(col("doc_id").as("doc_a"), col("rk"))
          .join(ranked.select(col("doc_id").as("doc_b"), (col("rk") - 1).as("rk")),
            Seq("rk"))
          .where(col("rk") % 173 =!= 0)
          .select("doc_a", "doc_b")
        Components.connectedComponentsStar(pairs)
          .withColumnRenamed("node", "doc_id")
          .orderBy("doc_id")
      },
      Some("""WITH RECURSIVE r AS (
            SELECT doc_id, row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR))) AS rk
            FROM documents),
          e AS (
            SELECT a.doc_id AS u, b.doc_id AS v
            FROM r a JOIN r b ON b.rk = a.rk + 1
            WHERE a.rk % 173 <> 0),
          edges AS (SELECT u, v FROM e UNION SELECT v, u FROM e),
          reach(u, v) AS (
            SELECT u, u FROM (SELECT DISTINCT u FROM edges)
            UNION
            SELECT e.u, r2.v FROM edges e JOIN reach r2 ON e.v = r2.u)
        SELECT u AS doc_id, MIN(v) AS component FROM reach GROUP BY u
        ORDER BY doc_id""")),

    // Dedup-graph QA metrics: per-node degree and incident-triangle
    // counts over the verified near-dup graph — the health check a
    // production dedup run reports (dense triangle-rich clusters are
    // true duplicate families; high-degree low-triangle stars are LSH
    // false-positive hubs worth auditing). Triangle enumeration uses the
    // ordered-edge join (a<b<c: (a,b)⋈(b,c)⋈(a,c)) — every step an
    // equi-join keyed on node ids, the standard distributed shape, never
    // an all-pairs product; the verified pair set is cached because five
    // consumers would otherwise each re-run the full LSH-verify
    // pipeline.
    Q("d10_dup_graph_metrics",
      (s, d) => dupGraphMetrics(
        jaccardPairs(s, d).select("doc_a", "doc_b")).orderBy("doc_id"),
      Some(s"""WITH sig AS ($duckSigs),
          bands AS (SELECT doc_id, k AS band, sigs[k + 1] AS mh FROM sig, range(0, 8) t(k)),
          cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                   FROM bands a JOIN bands b
                     ON a.band = b.band AND a.mh = b.mh AND a.doc_id < b.doc_id),
          sh AS (SELECT doc_id, $duckShingles AS s
                 FROM (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents)),
          pairs AS (SELECT doc_a, doc_b FROM (
              SELECT doc_a, doc_b,
                CAST(CAST(len(list_intersect(a.s, b.s)) AS INT) AS DOUBLE) /
                  CAST(len(a.s) + len(b.s) - CAST(len(list_intersect(a.s, b.s)) AS INT) AS DOUBLE) AS jaccard
              FROM cand JOIN sh a ON cand.doc_a = a.doc_id
                        JOIN sh b ON cand.doc_b = b.doc_id)
            WHERE jaccard >= 0.05),
          deg AS (SELECT doc_id, CAST(COUNT(*) AS INT) AS degree FROM (
              SELECT doc_a AS doc_id FROM pairs
              UNION ALL SELECT doc_b FROM pairs) GROUP BY doc_id),
          tri AS (SELECT e1.doc_a AS a, e1.doc_b AS b, e2.doc_b AS c
                  FROM pairs e1
                  JOIN pairs e2 ON e1.doc_b = e2.doc_a
                  JOIN pairs e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b),
          tpn AS (SELECT doc_id, CAST(COUNT(*) AS INT) AS n_triangles FROM (
              SELECT a AS doc_id FROM tri
              UNION ALL SELECT b FROM tri
              UNION ALL SELECT c FROM tri) GROUP BY doc_id)
        SELECT deg.doc_id AS doc_id, degree, COALESCE(n_triangles, 0) AS n_triangles
        FROM deg LEFT JOIN tpn ON deg.doc_id = tpn.doc_id
        ORDER BY deg.doc_id""")),

    // Fixed-point PageRank on the verified near-dup graph — see
    // [[pageRank]] for the integer-unit determinism argument. The gate
    // runs 5 iterations; the oracle replays the identical rank flow as
    // five chained CTEs over the same verified pair set.
    Q("d16_pagerank",
      (s, d) => pageRank(jaccardPairs(s, d).select("doc_a", "doc_b"), 5)
        .orderBy("doc_id"),
      Some(s"""WITH sig AS ($duckSigs),
          bands AS (SELECT doc_id, k AS band, sigs[k + 1] AS mh FROM sig, range(0, 8) t(k)),
          cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                   FROM bands a JOIN bands b
                     ON a.band = b.band AND a.mh = b.mh AND a.doc_id < b.doc_id),
          sh AS (SELECT doc_id, $duckShingles AS s
                 FROM (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents)),
          pairs AS (SELECT doc_a, doc_b FROM (
              SELECT doc_a, doc_b,
                CAST(CAST(len(list_intersect(a.s, b.s)) AS INT) AS DOUBLE) /
                  CAST(len(a.s) + len(b.s) - CAST(len(list_intersect(a.s, b.s)) AS INT) AS DOUBLE) AS jaccard
              FROM cand JOIN sh a ON cand.doc_a = a.doc_id
                        JOIN sh b ON cand.doc_b = b.doc_id)
            WHERE jaccard >= 0.05),
          ed AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
                 UNION ALL SELECT doc_b, doc_a FROM pairs),
          deg AS (SELECT src, COUNT(*) AS degree FROM ed GROUP BY src),
          it0 AS (SELECT src AS doc_id, CAST(1000000 AS BIGINT) AS rank FROM deg),
          $duckPrIters
        SELECT doc_id, rank FROM it5 ORDER BY doc_id""")),

    // Quality-aware keeper selection: per near-dup cluster, keep the
    // HIGHEST-QUALITY member (ties → lowest doc_id) — the canonicali-
    // zation policy production dedup actually runs (min-id keeping, d7/
    // c1's default, discards the best copy whenever a cleaner duplicate
    // has a higher id). Composes the verified pair graph (d2), hash-min
    // clustering (d7), and the t2 quality score; the argmax is one
    // window over the component key, and singletons ride the same left
    // join + coalesce instead of a union pass. ORDER BY a double is
    // cross-engine-safe here because t2's gate proves the quality
    // blend bit-exact on both engines.
    Q("d12_quality_keeper",
      (s, d) => {
        val comp = Components
          .connectedComponents(jaccardPairs(s, d).select("doc_a", "doc_b"))
          .withColumnRenamed("node", "doc_id")
        val clustered = qualityScores(Tables.documentsSpread(s, d))
          .select("doc_id", "quality")
          .join(comp, Seq("doc_id"), "left")
          .withColumn("component", coalesce(col("component"), col("doc_id")))
        val byComp = org.apache.spark.sql.expressions.Window.partitionBy("component")
        clustered
          .withColumn("rk", row_number().over(
            byComp.orderBy(col("quality").desc, col("doc_id"))))
          .withColumn("cluster_size", count(lit(1)).over(byComp).cast("int"))
          .where(col("rk") === 1)
          .select(col("component"), col("doc_id").as("keeper_id"),
            col("cluster_size"), col("quality"))
          .orderBy("component")
      },
      Some(s"""WITH RECURSIVE sig AS ($duckSigs),
          bands AS (SELECT doc_id, k AS band, sigs[k + 1] AS mh FROM sig, range(0, 8) t(k)),
          cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                   FROM bands a JOIN bands b
                     ON a.band = b.band AND a.mh = b.mh AND a.doc_id < b.doc_id),
          sh AS (SELECT doc_id, $duckShingles AS s
                 FROM (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents)),
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
          q AS (SELECT doc_id,
              0.4 * (CAST(n_distinct AS DOUBLE) / CAST(n_tokens AS DOUBLE)) +
              0.3 * (1.0 - CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE)) +
              0.3 * least(1.0, (CAST(n_chars AS DOUBLE) / CAST(n_tokens AS DOUBLE)) / 10.0) AS quality
            FROM (SELECT doc_id, n_chars,
                CAST(len(t) AS INT) AS n_tokens,
                CAST(len(list_distinct(t)) AS INT) AS n_distinct,
                CAST(len(list_filter(t, x -> x IN ('the','a','and','of'))) AS INT) AS n_stop
              FROM (SELECT doc_id, n_chars, string_split(lower(text), ' ') AS t FROM documents))),
          cl AS (SELECT q.doc_id, COALESCE(c.component, q.doc_id) AS component, quality
                 FROM q LEFT JOIN comp c ON q.doc_id = c.doc_id)
        SELECT component, doc_id AS keeper_id, cluster_size, quality FROM (
            SELECT component, doc_id, quality,
              ROW_NUMBER() OVER (PARTITION BY component
                                 ORDER BY quality DESC, doc_id) AS rk,
              CAST(COUNT(*) OVER (PARTITION BY component) AS INT) AS cluster_size
            FROM cl)
        WHERE rk = 1 ORDER BY component""")),

    // MinHash signatures (8 hashes): the per-doc half of MinHash-LSH.
    // Surfaced as a comma-joined string (the driver's pandas compare can't
    // sort array columns); nulls (empty shingle sets) map to "-" so both
    // engines agree on the join.
    Q("d3_minhash_sigs",
      (s, d) => minhashSigs(s, d)
        .select(col("doc_id"),
          concat_ws(",", transform(col("sigs"), x => coalesce(x, lit("-"))))
            .as("sig_csv"))
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id,
          array_to_string(list_transform(sigs, x -> coalesce(x, '-')), ',') AS sig_csv
        FROM ($duckSigs) ORDER BY doc_id""")),

    // MinHash-LSH candidate pairs: explode signatures into (band, hash)
    // buckets, equi-join on the bucket — the 100 TB-safe shape (shuffle on
    // band hash, no quadratic blowup). Pairs colliding in several bands
    // are emitted only from the FIRST matching band (sig arrays ride the
    // explode; the first match is an array_position over zip_with), so
    // distinct-pairs needs no dedup exchange.
    Q("d4_minhash_pairs",
      (s, d) => {
        val bands = minhashSigs(s, d)
          .select(col("doc_id"), col("sigs"), posexplode(col("sigs")).as(Seq("band", "h")))
          // eager, not .cache(): the bucket self-join's two sides are
          // independent AQE stages, and both racing a cold lazy cache
          // re-runs the full MinHash pipeline per side (the r13
          // systemic finding, this site missed then). 8 rows/doc of
          // (id, sig array, band, hash) — membership-sized.
          .localCheckpoint(true)
        val a = bands.select(col("doc_id").as("doc_a"), col("sigs").as("sig_a"),
          col("band"), col("h"))
        val b = bands.select(col("doc_id").as("doc_b"), col("sigs").as("sig_b"),
          col("band"), col("h"))
        a.join(b, Seq("band", "h")).where(col("doc_a") < col("doc_b"))
          .where(col("band") ===
            expr("array_position(zip_with(sig_a, sig_b, (x, y) -> x = y), true) - 1"))
          .select("doc_a", "doc_b")
          .orderBy("doc_a", "doc_b")
      },
      Some(s"""WITH sig AS ($duckSigs),
        bands AS (SELECT doc_id, k AS band, sigs[k + 1] AS h FROM sig, range(0, 8) t(k))
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b ON a.band = b.band AND a.h = b.h AND a.doc_id < b.doc_id
        ORDER BY doc_a, doc_b""")),

    // SimHash: 64-bit signature from per-token hashes (frequency-weighted
    // bit votes).
    Q("d5_simhash",
      (s, d) => Tables.documentsSpread(s, d)
        .select(col("doc_id"), simhashCol.as("simhash"))
        .orderBy("doc_id"),
      Some(duckSimhash + " ORDER BY doc_id")),

    // SimHash near-dup pairs by Hamming distance ≤ 3, on the shared
    // HammingLsh 8×one-byte band join (m4/m5's machinery): ≤3 differing
    // bits touch at most 3 of the 8 bytes, so every qualifying pair
    // shares ≥1 identical (band, byte) — the equi-join is a COMPLETE
    // candidate generator (identical answer to the cross join) with
    // 256-value band buckets, the scale fix for the r1-r12 16-bit/
    // nibble scheme whose 16-value buckets each held ~N/64 of the
    // corpus (Σbucket² → quadratic; the suite's worst 10× grower at
    // 7.9×). Pair dedup stays a codegen first-shared-band predicate,
    // never a distinct exchange; plan-asserted cartesian-free in
    // PlanShapeSpec.
    Q("d6_simhash_pairs",
      (s, d) => {
        val sh = Tables.documentsSpread(s, d)
          .select(col("doc_id").as("asset_id"), simhashCol.as("hash"))
        graft.llm.HammingLsh.nearDupPairs(sh, maxHamming = 3)
          .select(col("asset_a").as("doc_a"), col("asset_b").as("doc_b"),
            col("hamming"))
          .orderBy("doc_a", "doc_b")
      },
      Some(s"""WITH sh AS ($duckSimhash)
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
        ORDER BY doc_a, doc_b""")),

    // Benchmark decontamination: flag corpus documents sharing ≥2 word
    // 3-gram shingles with any held-out benchmark document (the standard
    // n-gram-overlap decontamination pass an LLM training pipeline runs
    // before training; benchmark membership is a deterministic doc_id
    // residue so both engines pick the same set). Scale shape: the
    // benchmark side is tiny relative to the corpus (a few thousand eval
    // documents vs billions), so its exploded shingle table is
    // BROADCAST — the 100 TB corpus side never shuffles for the join;
    // only the matched (doc, bench) pairs (a sliver) hit the groupBy
    // exchange.
    Q("d8_decontaminate",
      (s, d) => {
        val sh = shingled(s, d)
        val bench = sh.where(col("doc_id") % 41 === 0)
          .select(col("doc_id").as("bench_id"), explode(col("s")).as("shingle"))
        val corpus = sh.where(col("doc_id") % 41 =!= 0)
          .select(col("doc_id"), explode(col("s")).as("shingle"))
        corpus.join(broadcast(bench), Seq("shingle"))
          .groupBy("doc_id", "bench_id")
          .agg(count(lit(1)).cast("int").as("n_overlap"))
          .where(col("n_overlap") >= 2)
          .orderBy("doc_id", "bench_id")
      },
      Some(s"""WITH sh AS (
          SELECT doc_id, unnest($duckShingles) AS shingle
          FROM (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents))
        SELECT c.doc_id AS doc_id, b.doc_id AS bench_id,
          CAST(COUNT(*) AS INT) AS n_overlap
        FROM sh c JOIN sh b ON c.shingle = b.shingle
        WHERE b.doc_id % 41 = 0 AND c.doc_id % 41 <> 0
        GROUP BY c.doc_id, b.doc_id HAVING COUNT(*) >= 2
        ORDER BY doc_id, bench_id""")),

    // d8's 100 TB form: the benchmark shingle set compacted into a
    // fixed-size Bloom filter (Spark's own BloomFilterAggregate over
    // xxhash64 keys — ~0.9 MB at 1M capacity / 3% fpp, vs broadcasting
    // every bench shingle STRING), shipped as a scalar subquery, and
    // applied with Spark's own BloomFilterMightContain — the expression
    // the runtime-row-group-filter rule injects, which deserializes the
    // filter ONCE per task and probes inside whole-stage codegen — as a
    // map-side prefilter on the corpus BEFORE the exact confirm join.
    // Bloom filters have no false negatives, so the confirm join sees
    // every true overlap and the final answer is byte-identical to d8's
    // exact result — which is exactly what this gate checks (same
    // oracle SQL, full hash compare). False positives only cost
    // confirm-join input volume (≤ fpp × corpus shingles). Honest scale
    // accounting: the win over d8 is the PROBE volume — the corpus side
    // is prefiltered map-side to a sliver before any join — while the
    // confirm join still broadcasts the exploded benchmark shingles,
    // which is the right plan exactly because decontamination benchmarks
    // are ≪ corpus by construction (shuffling the prefiltered corpus to
    // meet a bucketed bench would cost more than the broadcast saves).
    // If a bench side ever outgrew the broadcast threshold, the fallback
    // is a plain shuffle equi-join on shingle — drop the hint, same
    // semantics — not a different algorithm.
    Q("d14_bloom_decontaminate",
      (s, d) => {
        val sh = shingled(s, d)
        val bench = sh.where(col("doc_id") % 41 === 0)
          .select(col("doc_id").as("bench_id"), explode(col("s")).as("shingle"))
        val corpus = sh.where(col("doc_id") % 41 =!= 0)
          .select(col("doc_id"), explode(col("s")).as("shingle"))
        import org.apache.spark.sql.graft.ColumnBridge
        // coalesce(1) before the Bloom aggregate: the partial-aggregate
        // buffer is the FULL filter (1M capacity ≈ 1.27 MB of bits), so
        // a 32-partition build shuffles 32 × 1.27 MB of near-empty
        // partial filters to the 1-task merge (JobProbe r14: 40.7 MB
        // written / read for a 40 KB hash input). The bench side is ≪
        // corpus by construction (the broadcast argument below), so one
        // build task is the right shape at any scale — one 1.27 MB
        // partial, no merge fan-in.
        val bloom = bench.select(xxhash64(col("shingle")).as("h")).coalesce(1)
          .agg(ColumnBridge.column(
            new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
              ColumnBridge.expression(col("h")), 1000000L)
              .toAggregateExpression()).as("bf"))
        val pre = corpus
          .where(ColumnBridge.column(
            org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
              ColumnBridge.expression(bloom.scalar()),
              ColumnBridge.expression(xxhash64(col("shingle"))))))
          .select("doc_id", "shingle")
        pre.join(broadcast(bench), Seq("shingle"))
          .groupBy("doc_id", "bench_id")
          .agg(count(lit(1)).cast("int").as("n_overlap"))
          .where(col("n_overlap") >= 2)
          .orderBy("doc_id", "bench_id")
      },
      Some(s"""WITH sh AS (
          SELECT doc_id, unnest($duckShingles) AS shingle
          FROM (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents))
        SELECT c.doc_id AS doc_id, b.doc_id AS bench_id,
          CAST(COUNT(*) AS INT) AS n_overlap
        FROM sh c JOIN sh b ON c.shingle = b.shingle
        WHERE b.doc_id % 41 = 0 AND c.doc_id % 41 <> 0
        GROUP BY c.doc_id, b.doc_id HAVING COUNT(*) >= 2
        ORDER BY doc_id, bench_id""")),

    // Content-defined chunk duplication — the alignment-FREE form of d9
    // (FastCDC/Rabin chunking applied at token level): a cut is placed
    // after token i whenever the digest of the trailing 4-token window
    // satisfies `md5_byte0 mod 8 == 0` (expected chunk ≈ 8 tokens), so
    // chunk boundaries are a function of CONTENT ONLY — a shared passage
    // produces identical interior chunks at ANY offset in either
    // document, closing exactly the recall boundary d9 documents (its
    // stride grid misses passages whose occurrences disagree on offset
    // mod 20). This is the storage-dedup technique (LBFS/FastCDC)
    // applied to corpus text. Everything is engine-portable by
    // construction: cut decisions and chunk identities are md5 (same
    // hex in both engines) and integer arithmetic — no float anywhere.
    // Scale shape: cut detection and chunk assembly are per-row HOFs
    // over the token array (zero shuffle); the explode emits ~n/8
    // chunks per doc (bounded fanout); dup detection is a two-level
    // groupBy on the 128-bit chunk digest — (digest, doc) collapses
    // map-side first, so a boilerplate chunk repeated 10^6× inside one
    // shard never crosses the wire more than once per partition, the
    // same skew-bounding two-phase shape d9 uses.
    Q("d15_cdc_dup",
      (s, d) => {
        val cuts =
          """filter(sequence(1, size(toks) - 1), i -> i >= 4 AND
             cast(conv(substring(md5(cast(concat_ws(' ', slice(toks, i - 3, 4)) as binary)), 1, 2), 16, 10) as int) % 8 = 0)"""
        val chunks = Tables.documentsSpread(s, d)
          .select(col("doc_id"), split(lower(col("text")), " ").as("toks"))
          .withColumn("cuts", expr(cuts))
          .withColumn("span", explode(expr(
            """zip_with(
                 concat(array(1), transform(cuts, c -> c + 1)),
                 concat(cuts, array(size(toks))),
                 (s, e) -> named_struct('s', s, 'e', e))""")))
          .select(col("doc_id"),
            md5(concat_ws(" ",
              expr("slice(toks, span.s, span.e - span.s + 1)"))).as("digest"),
            (col("span.e") - col("span.s") + 1).as("n_tokens"))
        chunks.groupBy("digest", "doc_id")
          .agg(count(lit(1)).as("occ"), min(col("n_tokens")).as("nt"))
          .groupBy("digest")
          .agg(count(lit(1)).cast("int").as("n_docs"),
            sum(col("occ")).cast("int").as("n_occ"),
            min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"),
            min(col("nt")).cast("int").as("n_tokens"))
          .where(col("n_docs") >= 2)
          .orderBy("digest")
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
          SELECT doc_id,
            md5(array_to_string(toks[CAST(starts[k] AS INT):CAST(ends[k] AS INT)], ' ')) AS digest,
            ends[k] - starts[k] + 1 AS n_tokens
          FROM e),
        l1 AS (
          SELECT digest, doc_id, COUNT(*) AS occ, MIN(n_tokens) AS nt
          FROM ch GROUP BY digest, doc_id)
        SELECT digest, CAST(COUNT(*) AS INT) AS n_docs,
          CAST(SUM(occ) AS INT) AS n_occ,
          MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc,
          CAST(MIN(nt) AS INT) AS n_tokens
        FROM l1 GROUP BY digest HAVING COUNT(*) >= 2
        ORDER BY digest""")),

    // Substring-level duplication (the Lee-et-al "deduplicating training
    // data" modality — doc-level dedup misses long shared passages inside
    // otherwise-distinct documents): slide a 40-char window at stride 20
    // over each document, digest each window, and report windows seen in
    // more than one document. Stride trades recall for volume: windows
    // anchor on each document's own 20-char grid, so a shared passage is
    // detected only when its occurrences agree on start offset mod 20 —
    // which full-document copies, copies sharing a prefix, and
    // grid-aligned boilerplate all do. Arbitrary-offset passage recall
    // needs stride 1 on one side (20× the rows), the Lee-et-al suffix
    // construction, or d15's content-defined chunking (alignment-free
    // by construction); this strided form is the cheap screening pass
    // run before any of them. Scale shape: explode factor is
    // len/stride per doc (bounded), then ONE groupBy on the 128-bit
    // window digest with map-side partial aggregation — hot boilerplate
    // windows collapse before the shuffle, so skew is bounded.
    Q("d9_substring_dup",
      (s, d) => Tables.documentsSpread(s, d)
        .select(col("doc_id"), explode(expr(
          """CASE WHEN length(text) >= 40
             THEN transform(sequence(1, length(text) - 39, 20),
                            p -> md5(substring(lower(text), p, 40)))
             ELSE CAST(array() AS array<string>) END""")).as("gram_md5"))
        .groupBy("gram_md5")
        .agg(countDistinct(col("doc_id")).cast("int").as("n_docs"),
          count(lit(1)).cast("int").as("n_occurrences"),
          min("doc_id").as("min_doc"), max("doc_id").as("max_doc"))
        .where(col("n_docs") >= 2)
        .orderBy("gram_md5"),
      Some("""WITH g AS (
          SELECT doc_id,
            unnest(list_transform(range(1, greatest(length(text) - 38, 1), 20),
              p -> md5(substr(lower(text), p, 40)))) AS gram_md5
          FROM documents WHERE length(text) >= 40)
        SELECT gram_md5, CAST(COUNT(DISTINCT doc_id) AS INT) AS n_docs,
          CAST(COUNT(*) AS INT) AS n_occurrences,
          MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
        FROM g GROUP BY gram_md5 HAVING COUNT(DISTINCT doc_id) >= 2
        ORDER BY gram_md5""")),

    // Shingle-set CONTAINMENT (Broder's asymmetric resemblance twin):
    // |A∩B| / min(|A|,|B|). Symmetric Jaccard (d2) under-scores the
    // partial-copy case — a short document quoted inside a long one has
    // J = |A|/|B| (small when the lengths differ) but containment 1.0 —
    // and production dedup keeps missing exactly those pairs if it
    // gates on J alone. Candidates come from the SAME MinHash band join
    // as d2 (shared sigFrame/firstSharedBand machinery; recall for a
    // contained pair is 1-(1-J)^8, documented LSH-bounded like d2 —
    // both engines compute the identical md5 minhashes, so the
    // candidate set is deterministic even where recall < 1), verified
    // with the exact merge-scan intersection, thresholded on
    // containment instead of Jaccard. The quoted-pair class is planted
    // in-query (the m-series derived-fixture posture): every 25th
    // document ≥30 tokens contributes its 40%-prefix excerpt as a
    // +1e6-id row — its shingles are a strict subset of the source's,
    // so containment is exactly 1.0 while J sits near 0.4.
    // Scale shape: identical to d2 — banded equi-join candidates,
    // Σbucket² never corpus².
    Q("d19_containment",
      (s, d) => {
        val sp = Tables.documentsSpread(s, d)
        val base = sp.select(col("doc_id"), col("text"))
        val exc = sp
          .where(col("doc_id") % 25 === 0)
          .select(col("doc_id"), split(lower(col("text")), " ").as("t"))
          .where(size(col("t")) >= 30)
          .select((col("doc_id") + 1000000L).as("doc_id"),
            expr("concat_ws(' ', slice(t, 1, greatest((size(t) * 2) div 5, 1)))")
              .as("text"))
        val docs = sigFrame(base.unionByName(exc)).localCheckpoint(true)
        val bands = docs.select(col("doc_id"), col("sigs"),
          posexplode(col("sigs")).as(Seq("band", "mh")))
        val cand = bands.select(col("doc_id").as("doc_a"), col("sigs").as("sig_a"),
            col("band"), col("mh"))
          .join(bands.select(col("doc_id").as("doc_b"), col("sigs").as("sig_b"),
            col("band"), col("mh")), Seq("band", "mh"))
          .where(col("doc_a") < col("doc_b"))
          .where(col("band") === firstSharedBand)
          .select("doc_a", "doc_b")
        verifyPairs(cand, docs, 0.0)
          .withColumn("containment", col("n_common").cast("double") /
            least(col("na"), col("nb")).cast("double"))
          .where(col("containment") >= 0.5)
          .select(col("doc_a"), col("doc_b"), col("n_common"),
            col("na"), col("nb"), col("containment"), col("jaccard"))
          .orderBy("doc_a", "doc_b")
      },
      Some(s"""WITH exc AS (
          SELECT doc_id + 1000000 AS doc_id,
            array_to_string(t[1 : greatest(len(t) * 2 // 5, 1)], ' ') AS text
          FROM (SELECT doc_id, string_split(lower(text), ' ') AS t
                FROM documents WHERE doc_id % 25 = 0)
          WHERE len(t) >= 30),
        docs AS (SELECT doc_id, text FROM documents
                 UNION ALL SELECT doc_id, text FROM exc),
        sig AS (${duckSigsFrom("docs")}),
        bands AS (SELECT doc_id, k AS band, sigs[k + 1] AS mh FROM sig, range(0, 8) t(k)),
        cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                 FROM bands a JOIN bands b
                   ON a.band = b.band AND a.mh = b.mh AND a.doc_id < b.doc_id),
        sh AS (SELECT doc_id, $duckShingles AS s
               FROM (SELECT doc_id, string_split(lower(text), ' ') AS t FROM docs))
        SELECT doc_a, doc_b, n_common, na, nb, containment, jaccard FROM (
          SELECT doc_a, doc_b,
            CAST(len(list_intersect(a.s, b.s)) AS INT) AS n_common,
            CAST(len(a.s) AS INT) AS na, CAST(len(b.s) AS INT) AS nb,
            CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
              CAST(least(len(a.s), len(b.s)) AS DOUBLE) AS containment,
            CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
              CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS DOUBLE) AS jaccard
          FROM cand JOIN sh a ON cand.doc_a = a.doc_id
                    JOIN sh b ON cand.doc_b = b.doc_id)
        WHERE containment >= 0.5 ORDER BY doc_a, doc_b""")),

    // Language-ID: n-gram/stopword marker heuristic → argmax with a
    // deterministic tiebreak.
    Q("t1_langid",
      (s, d) => Tables.documents(s, d)
        .withColumn("t", tokens)
        .select(col("doc_id"), col("lang"),
          size(filter(col("t"), t => t.isin("the", "a"))).cast("int").as("s_art"),
          size(filter(col("t"), t => t.isin("spark", "vector", "hash"))).cast("int").as("s_tech"),
          size(filter(col("t"), t => t.isin("table", "query", "join"))).cast("int").as("s_db"))
        .withColumn("guess",
          when(col("s_art") >= col("s_tech") && col("s_art") >= col("s_db"), "article")
            .when(col("s_tech") >= col("s_db"), "tech").otherwise("db"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, lang, s_art, s_tech, s_db,
          CASE WHEN s_art >= s_tech AND s_art >= s_db THEN 'article'
               WHEN s_tech >= s_db THEN 'tech' ELSE 'db' END AS guess
        FROM (SELECT doc_id, lang,
            CAST(len(list_filter(t, x -> x IN ('the','a'))) AS INT) AS s_art,
            CAST(len(list_filter(t, x -> x IN ('spark','vector','hash'))) AS INT) AS s_tech,
            CAST(len(list_filter(t, x -> x IN ('table','query','join'))) AS INT) AS s_db
          FROM (SELECT doc_id, lang, string_split(lower(text), ' ') AS t FROM documents))
        ORDER BY doc_id""")),

    // Quality scoring: length / type-token ratio / stopword ratio /
    // mean token length composite.
    Q("t2_quality_score",
      (s, d) => qualityScores(Tables.documents(s, d)).orderBy("doc_id"),
      Some("""SELECT doc_id, n_chars, n_tokens, n_distinct, n_stop,
          CAST(n_distinct AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS ttr,
          CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS stop_ratio,
          CAST(n_chars AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS mean_tok_len,
          0.4 * (CAST(n_distinct AS DOUBLE) / CAST(n_tokens AS DOUBLE)) +
          0.3 * (1.0 - CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE)) +
          0.3 * least(1.0, (CAST(n_chars AS DOUBLE) / CAST(n_tokens AS DOUBLE)) / 10.0) AS quality
        FROM (SELECT doc_id, n_chars,
            CAST(len(t) AS INT) AS n_tokens,
            CAST(len(list_distinct(t)) AS INT) AS n_distinct,
            CAST(len(list_filter(t, x -> x IN ('the','a','and','of'))) AS INT) AS n_stop
          FROM (SELECT doc_id, n_chars, string_split(lower(text), ' ') AS t FROM documents))
        ORDER BY doc_id""")),

    // Token counting: whitespace tokens, regex word-ish tokens, and a
    // chars/4 BPE-style estimate.
    Q("t3_token_count",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("int").as("n_ws_tokens"),
          size(expr("regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^ ]', 0)"))
            .cast("int").as("n_re_tokens"),
          ceil(col("n_chars").cast("double") / lit(4.0)).cast("long").as("n_bpe_est"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
          CAST(len(string_split(text, ' ')) AS INT) AS n_ws_tokens,
          CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^ ]')) AS INT) AS n_re_tokens,
          CAST(ceil(CAST(n_chars AS DOUBLE) / 4.0) AS BIGINT) AS n_bpe_est
        FROM documents ORDER BY doc_id""")),

    // Document fingerprinting: content digest + position-weighted
    // polynomial hash of token hashes (rolling-hash flavored).
    Q("t4_fingerprint",
      (s, d) => Tables.documentsSpread(s, d)
        .withColumn("hs", expr(hvalsExpr))
        .select(col("doc_id"),
          md5(trim(lower(col("text")))).as("fp_md5"),
          substring(md5(trim(lower(col("text")))), 1, 8).as("fp_bucket"),
          expr("""aggregate(sequence(1, size(hs)), cast(0 as bigint),
              (acc, i) -> acc + cast(element_at(hs, i) as bigint) * ((i * 31) % 997))""")
            .as("fp_poly"))
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id, md5(trim(lower(text))) AS fp_md5,
          substr(md5(trim(lower(text))), 1, 8) AS fp_bucket,
          CAST(list_sum(list_transform(range(1, len(hs)+1),
            i -> CAST(hs[i] AS BIGINT) * ((i * 31) % 997))) AS BIGINT) AS fp_poly
        FROM (SELECT doc_id, text, $duckHvals AS hs
              FROM (SELECT doc_id, text, string_split(lower(text), ' ') AS t FROM documents))
        ORDER BY doc_id""")),

    // Corpus profiling: per-language doc-length distribution (count, mean,
    // exact median/p95) — the pre-training data-quality report every
    // pipeline runs before filtering. Exact interpolated percentiles match
    // DuckDB's quantile_cont definition; at 100 TB swap `percentile` for
    // `percentile_approx` (t-digest sketch, mergeable map-side) — the
    // query shape is identical.
    Q("t5_profile",
      (s, d) => Tables.documentsSpread(s, d)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          (sum(col("n_chars")).cast("double") / count(lit(1)).cast("double")).as("mean_chars"),
          expr("percentile(n_chars, 0.5)").as("median_chars"),
          expr("percentile(n_chars, 0.95)").as("p95_chars"))
        .orderBy("lang"),
      Some("""SELECT lang, COUNT(*) AS n_docs,
          CAST(SUM(n_chars) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_chars,
          quantile_cont(n_chars, 0.5) AS median_chars,
          quantile_cont(n_chars, 0.95) AS p95_chars
        FROM documents GROUP BY lang ORDER BY lang""")),

    // Repetition filtering: see [[repetitionStats]] (shared with the
    // composed corpus pipeline).
    Q("t6_repetition",
      (s, d) => repetitionStats(Tables.documentsSpread(s, d))
        .select(col("doc_id"), col("n_tokens"), col("dup_2g_frac"),
          col("dup_3g_frac"), col("top_cnt"), col("top_tok_frac"), col("keep"))
        .orderBy("doc_id"),
      Some("""WITH tok AS (
          SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
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
          GROUP BY doc_id)
        SELECT g.doc_id, n_tokens,
          CASE WHEN n_2g = 0 THEN 0.0
            ELSE CAST(n_2g - n_2g_d AS DOUBLE) / CAST(n_2g AS DOUBLE) END AS dup_2g_frac,
          CASE WHEN n_3g = 0 THEN 0.0
            ELSE CAST(n_3g - n_3g_d AS DOUBLE) / CAST(n_3g AS DOUBLE) END AS dup_3g_frac,
          top_cnt,
          CAST(top_cnt AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS top_tok_frac,
          (CASE WHEN n_2g = 0 THEN 0.0
             ELSE CAST(n_2g - n_2g_d AS DOUBLE) / CAST(n_2g AS DOUBLE) END) <= 0.9
            AND (CASE WHEN n_3g = 0 THEN 0.0
             ELSE CAST(n_3g - n_3g_d AS DOUBLE) / CAST(n_3g AS DOUBLE) END) <= 0.8
            AND CAST(top_cnt AS DOUBLE) / CAST(n_tokens AS DOUBLE) <= 0.2 AS keep
        FROM g JOIN tc ON g.doc_id = tc.doc_id
        ORDER BY g.doc_id""")),

    // Corpus vocabulary: top-50 tokens by occurrence count with document
    // frequency — the vocab/tokenizer-prep step of a training pipeline.
    // explode → two-level groupBy: partial counts combine map-side, so
    // the shuffle carries (token, partial) not raw occurrences; stop-word
    // skew is bounded by the combiner (each map task emits one row per
    // distinct token). countDistinct(doc_id) expands to the standard
    // two-phase distinct aggregate — same (tok, doc_id)-keyed shuffle
    // shape at any scale. Deterministic ties: count desc, token asc.
    Q("t7_vocab",
      (s, d) => Tables.documentsSpread(s, d)
        .select(col("doc_id"), explode(tokens).as("tok"))
        .groupBy("tok")
        .agg(count(lit(1)).as("n_occurrences"),
          countDistinct(col("doc_id")).as("n_docs"))
        .orderBy(col("n_occurrences").desc, col("tok"))
        .limit(50),
      Some("""SELECT tok, COUNT(*) AS n_occurrences,
          COUNT(DISTINCT doc_id) AS n_docs
        FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
              FROM documents)
        GROUP BY tok ORDER BY n_occurrences DESC, tok LIMIT 50""")),

    // BM25 relevance ranking for a fixed keyword query — the retrieval
    // scorer a data pipeline runs to select training documents near a
    // topic. Term frequencies come from a map-side `filter` over the
    // token array (no explode, no shuffle per term); the corpus stats
    // (N, Σdl, per-term df) are ONE tiny aggregate row broadcast back
    // over the scan, so the whole query is scan → 1-row agg → map-side
    // score → top-k: at 100 TB the only exchange is the single-row
    // stats exchange and the final TakeOrdered. Cross-engine exactness:
    // the classic log-idf is replaced by the rational Robertson idf
    // (N - df + 0.5)/(df + 0.5) — every term score is +,*,/ over
    // int-derived doubles evaluated in identical order on both engines,
    // so doubles hash-match bit-exactly (no transcendentals, whose
    // libm/JVM bits differ).
    Q("t8_bm25",
      (s, d) => bm25(Tables.documentsSpread(s, d), Seq("spark", "join", "vector"))
        .where(col("bm25") > 0d)
        .orderBy(col("bm25").desc, col("doc_id"))
        .limit(25),
      Some("""WITH per_doc AS (
          SELECT doc_id, CAST(len(t) AS INT) AS dl,
            CAST(len(list_filter(t, x -> x = 'spark')) AS INT) AS tf_spark,
            CAST(len(list_filter(t, x -> x = 'join')) AS INT) AS tf_join,
            CAST(len(list_filter(t, x -> x = 'vector')) AS INT) AS tf_vector
          FROM (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents)),
        stats AS (
          SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl,
            SUM(CASE WHEN tf_spark > 0 THEN 1 ELSE 0 END) AS df_spark,
            SUM(CASE WHEN tf_join > 0 THEN 1 ELSE 0 END) AS df_join,
            SUM(CASE WHEN tf_vector > 0 THEN 1 ELSE 0 END) AS df_vector
          FROM per_doc)
        SELECT doc_id, tf_spark, tf_join, tf_vector,
          ((n_docs - df_spark + 0.5e0) / (df_spark + 0.5e0)) *
              (tf_spark * 2.2e0) /
              (tf_spark + 1.2e0 * (0.25e0 + 0.75e0 * (dl / (sum_dl / n_docs)))) +
          ((n_docs - df_join + 0.5e0) / (df_join + 0.5e0)) *
              (tf_join * 2.2e0) /
              (tf_join + 1.2e0 * (0.25e0 + 0.75e0 * (dl / (sum_dl / n_docs)))) +
          ((n_docs - df_vector + 0.5e0) / (df_vector + 0.5e0)) *
              (tf_vector * 2.2e0) /
              (tf_vector + 1.2e0 * (0.25e0 + 0.75e0 * (dl / (sum_dl / n_docs)))) AS bm25
        FROM per_doc, stats
        WHERE bm25 > 0 ORDER BY bm25 DESC, doc_id LIMIT 25""")),

    // The SAME BM25 contract served from the PERSISTENT inverted index
    // (graft.llm.TextIndex — the lexical member of the index-service
    // trio): the gate feeds the corpus in two batches through add(),
    // then searches three terms t8 does not use. What's pinned: the
    // stored postings + doc-length ledger reproduce the from-scratch
    // scorer BIT-EXACTLY (same rational idf, same fixed-term-order
    // double arithmetic), documents tokenize once at add time and are
    // never re-read at search time, and the search plan is the shape
    // that survives 100 TB — a term-pruned postings scan, one 1-row
    // stats exchange, a TakeOrdered. Session-memoized tmp dir, the
    // d17/v9b discipline.
    Q("t8b_text_index",
      (s, d) => {
        val tag = d.replaceAll("[^A-Za-z0-9]", "_")
        val dir = new java.io.File(sys.props("java.io.tmpdir"),
          s"graft_textidx/$tag/${graft.Sessions.sessionTag(s)}").getAbsolutePath
        val marker = s"graft_t8b_marker_$tag"
        if (!s.catalog.tableExists(marker)) {
          val docs = Tables.documentsSpread(s, d).select("doc_id", "text")
          graft.llm.TextIndex.add(s, dir, docs.where(col("doc_id") % 2 === 0))
          graft.llm.TextIndex.add(s, dir, docs.where(col("doc_id") % 2 =!= 0))
          s.emptyDataFrame.createOrReplaceTempView(marker)
        }
        graft.llm.TextIndex.search(s, dir, Seq("hash", "scan", "merge"), 25)
      },
      Some(duckBm25(Seq("hash", "scan", "merge"), ""))),

    // The takedown + maintenance path of the stored text index: two-batch
    // build, REMOVE two id slices, re-ADD one (recall reversed), then a
    // physical compact — and only then the search. The oracle recomputes
    // BM25 from scratch over exactly the SURVIVING documents, so the gate
    // pins that a takedown shifts EVERY corpus statistic (N, avgdl,
    // per-term df — removed docs leave the denominator, not just the
    // result list), that a re-add after removal is indistinguishable
    // from never-removed, and that compaction (which drops the removed
    // docs' postings and the crash-replay duplicates) changes no search
    // result. Mirrors d17 (dedup) and v5c/v5d (vector) for lexical.
    Q("t8c_text_index_tombstone",
      (s, d) => {
        val tag = d.replaceAll("[^A-Za-z0-9]", "_")
        val dir = new java.io.File(sys.props("java.io.tmpdir"),
          s"graft_textidx_tomb/$tag/${graft.Sessions.sessionTag(s)}").getAbsolutePath
        val marker = s"graft_t8c_marker_$tag"
        if (!s.catalog.tableExists(marker)) {
          val docs = Tables.documentsSpread(s, d).select("doc_id", "text")
          graft.llm.TextIndex.add(s, dir, docs.where(col("doc_id") % 2 === 0))
          graft.llm.TextIndex.add(s, dir, docs.where(col("doc_id") % 2 =!= 0))
          graft.llm.TextIndex.remove(s, dir,
            docs.where(col("doc_id") % 13 === 2 || col("doc_id") % 13 === 5)
              .select("doc_id"))
          graft.llm.TextIndex.add(s, dir, docs.where(col("doc_id") % 13 === 2))
          graft.llm.TextIndex.compact(s, dir)
          s.emptyDataFrame.createOrReplaceTempView(marker)
        }
        graft.llm.TextIndex.search(s, dir, Seq("filter", "stream", "sort"), 25)
      },
      Some(duckBm25(Seq("filter", "stream", "sort"),
        "WHERE doc_id % 13 <> 5"))),

    // Bigram-LM quality scoring (the CCNet-style "score documents by a
    // corpus language model" pass): train bigram conditional counts over
    // the corpus, then score each document by its weakest/strongest
    // bigram and its rare-bigram count. Statistics are deliberately
    // order-independent (min / max / int counts — never an agg-sum of
    // true doubles, whose addition order differs across engines);
    // p(w2|w1) = c(w1 w2)/c(w1 ·) is a single division of exact longs.
    // Scale shape: the model is a count aggregate on the bigram key; the
    // scoring join is shuffle-keyed on the same bigram (a corpus-sized
    // model is NOT broadcastable — this is the co-partitioned form), and
    // per-doc reduction is one groupBy on doc_id.
    Q("t9_bigram_lm",
      (s, d) => bigramLm(Tables.documentsSpread(s, d)).orderBy("doc_id"),
      Some("""WITH tok AS (
          SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
        bg AS (
          SELECT doc_id, unnest(list_transform(range(1, len(t)),
            i -> t[i] || ' ' || t[i+1])) AS bigram
          FROM tok WHERE len(t) >= 2),
        model AS (
          SELECT bigram, COUNT(*) AS c_bg,
            string_split(bigram, ' ')[1] AS w1
          FROM bg GROUP BY bigram),
        prefix AS (
          SELECT w1, CAST(SUM(c_bg) AS BIGINT) AS c_w1 FROM model GROUP BY w1),
        scored AS (
          SELECT doc_id, m.c_bg,
            CAST(m.c_bg AS DOUBLE) / CAST(p.c_w1 AS DOUBLE) AS p
          FROM bg JOIN model m ON bg.bigram = m.bigram
                  JOIN prefix p ON m.w1 = p.w1)
        SELECT doc_id, COUNT(*) AS n_bigrams,
          CAST(SUM(CASE WHEN c_bg <= 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_rare,
          MIN(p) AS min_p, MAX(p) AS max_p
        FROM scored GROUP BY doc_id ORDER BY doc_id""")),

    // Linear quality-classifier inference (fastText-shaped, Joulin et
    // al. 2016): score = mean over tokens of w[hash(token)], keep docs
    // scoring > 0 — the model-based quality-filter stage of a training
    // pipeline (the heuristic stage is t2). Weights are a deterministic
    // dyadic function of THE shared 16-bit token hash (hvalsExpr /
    // duckHvals), so both engines compute bit-identical doubles: every
    // w is a multiple of 2^-13 in [-0.5, 0.5), sums of those are exact
    // in IEEE double at any corpus size, and the final divide is
    // correctly rounded — no tolerance games in the gate. Scale shape:
    // the entire model application is a per-row array fold (higher-order
    // aggregate over the token-hash array) — zero explode, ZERO shuffle;
    // at 100 TB this is a pure map over the scan, and a real trained
    // weight vector would ship the same way (a broadcast lookup keyed by
    // the same hash).
    Q("t11_classifier_score",
      (s, d) => Tables.documentsSpread(s, d)
        .withColumn("hs", expr(hvalsExpr))
        .select(col("doc_id"),
          size(col("hs")).cast("int").as("n_tokens"),
          expr("""aggregate(hs, 0D, (a, h) ->
              a + (cast((h * 2654435761) % 8192 as double) / 8192.0 - 0.5))
            / cast(greatest(size(hs), 1) as double)""").as("score"))
        .withColumn("keep", col("score") > 0.0)
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id, CAST(len(hs) AS INT) AS n_tokens,
          coalesce(list_sum(list_transform(hs, h ->
              CAST((h * 2654435761) % 8192 AS DOUBLE) / 8192.0 - 0.5)), 0.0)
            / CAST(greatest(len(hs), 1) AS DOUBLE) AS score,
          (coalesce(list_sum(list_transform(hs, h ->
              CAST((h * 2654435761) % 8192 AS DOUBLE) / 8192.0 - 0.5)), 0.0)
            / CAST(greatest(len(hs), 1) AS DOUBLE)) > 0.0 AS keep
        FROM (SELECT doc_id, $duckHvals AS hs
              FROM (SELECT doc_id, string_split(lower(text), ' ') AS t
                    FROM documents))
        ORDER BY doc_id""")),

    // Feature-hashing vectorizer (the hashing trick): tokens hash into a
    // FIXED 16-bucket count vector per document — the cheap, stateless,
    // vocabulary-free "embedding" a pipeline computes when model
    // inference is too expensive for a first pass (and the deterministic
    // stand-in for an FFI embedder: same schema/partitioning plumbing).
    // Shape: two-level groupBy — (doc, bucket) counts combine map-side,
    // the per-doc assembly is a 16-entry map; no shuffle carries more
    // than (doc_id, bucket, partial). The csv surface + one sqrt keeps
    // the hash compare engine-portable (sqrt is correctly rounded IEEE
    // on both sides).
    Q("t12_feature_hash",
      (s, d) => {
        // buckets derive from THE 16-bit token hash (hvalsExpr/duckHvals
        // — the single definition SimHash also uses), mod 16
        val bucketed = Tables.documentsSpread(s, d)
          .select(col("doc_id"), explode(expr(hvalsExpr)).as("hv"))
          .withColumn("bucket", col("hv") % 16)
          .groupBy("doc_id", "bucket").agg(count(lit(1)).as("c"))
        bucketed.groupBy("doc_id")
          .agg(map_from_entries(collect_list(struct(col("bucket"), col("c")))).as("m"))
          .select(col("doc_id"),
            expr("transform(sequence(0, 15), i -> coalesce(element_at(m, i), 0L))")
              .as("vec"))
          .select(col("doc_id"),
            concat_ws(",", expr("transform(vec, x -> cast(x as string))")).as("vec_csv"),
            sqrt(expr("aggregate(vec, 0D, (a, x) -> a + cast(x as double) * cast(x as double))"))
              .as("l2_norm"))
          .orderBy("doc_id")
      },
      Some(s"""WITH hv AS (
          SELECT doc_id, unnest($duckHvals) AS hv
          FROM (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents)),
        b AS (SELECT doc_id, CAST(hv % 16 AS INT) AS bucket, COUNT(*) AS c
          FROM hv GROUP BY doc_id, bucket),
        e AS (SELECT doc_id, list({'bucket': bucket, 'c': c}) AS entries
          FROM b GROUP BY doc_id),
        v AS (SELECT doc_id, list_transform(range(0, 16), i ->
            coalesce(list_sum(list_transform(
              list_filter(entries, x -> x.bucket = i), x -> x.c)), 0)) AS vec
          FROM e)
        SELECT doc_id, array_to_string(vec, ',') AS vec_csv,
          sqrt(CAST(list_sum(list_transform(vec, x -> x * x)) AS DOUBLE)) AS l2_norm
        FROM v ORDER BY doc_id""")),

    // DSIR importance weights (Xie et al. 2023, "Data Selection for
    // Language Models via Importance Resampling"): score every document
    // by how much more likely its hashed n-gram features are under a
    // TARGET distribution (here the lang='en' slice — the bootstrapped
    // in-corpus setup) than under the RAW corpus distribution; training
    // pipelines resample by these weights to shift the mixture toward
    // the target domain. Features are the paper's hashed n-grams at
    // n ∈ {1,2}: the shared 16-bit md5 token hash (hvals — the ONE
    // definition SimHash/t12 use) over unigrams and bigrams, folded
    // into 1024 buckets.
    //
    // Cross-engine exactness, the t13 discipline: the per-feature log
    // ratio log2(p_t(f)/p_r(f)) is QUANTIZED to exact integer space —
    // qlr(f) = bitlen((n_t+1)·N_r) − bitlen((n_r+1)·N_t), bitlen(x) =
    // length of x's exact binary string — because neither engine's
    // float log is correctly-rounded and a sum of true logs is not
    // hash-stable. A doc's weight is then the exact long
    // Σ_f c_f · qlr(f) (add-1 smoothing keeps absent features finite).
    //
    // Scale shape: one corpus-sized (doc, feature) aggregate, the
    // feature table is BUCKET-BOUNDED (≤1024 rows — broadcast back),
    // and the per-doc reduce is one doc_id-keyed aggregate; nothing
    // joins corpus-sized sides. (The bitlen products stay < 2^63 up to
    // ~10^9-token targets; past that the qlr table is precomputed
    // driver-side anyway — it is 1024 rows.)
    //
    // One-scan discipline (round-12): docF feeds two consumers — the
    // per-feature totals and the final per-doc reduce — and raw/tgt
    // are folded into ONE conditional aggregate (sum + sum(when en))
    // instead of two differently-filtered scans ReuseExchange cannot
    // merge. docF itself is localCheckpoint'd (docs×≤1024 rows, far
    // smaller than the exploded token stream) so the corpus-sized
    // ngram explode executes exactly once, not up to 3×.
    Q("t18_dsir_weights",
      (s, d) => {
        val B = 1024
        def h16(c: Column): Column = transform(c,
          tok => conv(substring(md5(tok), 1, 4), 16, 10).cast("int"))
        def bitlen(c: Column): Column = length(conv(c, 10, 2)).cast("long")
        val docF = Tables.documentsSpread(s, d)
          .select(col("doc_id"), col("lang"),
            explode(concat(h16(split(lower(col("text")), " ")),
              h16(ngramsExpr(2, distinct = false)))).as("hv"))
          .withColumn("f", col("hv") % B)
          .groupBy("doc_id", "lang", "f").agg(count(lit(1)).as("c"))
          // EAGER (r14): the lazy form raced — ft's aggregate stage and
          // the final join's probe stage are independent AQE stages, and
          // both finding this cold re-ran the corpus ngram explode
          // (JobProbe r14: twin 16-task jobs, ~2.8 s task-ms each,
          // writing identical 342 KB partials).
          .localCheckpoint(true)
        val ft = docF.groupBy("f").agg(sum("c").as("n_r"),
          sum(when(col("lang") === "en", col("c")).otherwise(0L)).as("n_t"))
        val totals = ft.agg(sum("n_r").as("nr_tot"),
          coalesce(sum("n_t"), lit(0L)).as("nt_tot"))
        val qlr = ft
          .crossJoin(broadcast(totals))
          .select(col("f"),
            (bitlen((col("n_t") + 1L) * col("nr_tot")) -
              bitlen((col("n_r") + 1L) * col("nt_tot"))).as("qlr"))
        docF.join(broadcast(qlr), Seq("f"))
          .groupBy("doc_id", "lang")
          .agg(sum("c").cast("long").as("n_feats"),
            sum(col("c") * col("qlr")).cast("long").as("dsir_bits"))
          .orderBy("doc_id")
      },
      Some(s"""WITH tok AS (
          SELECT doc_id, lang, string_split(lower(text), ' ') AS t
          FROM documents),
        tok2 AS (
          SELECT doc_id, lang, t,
            list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1]) AS bg
          FROM tok),
        allf AS (
          SELECT doc_id, lang,
            unnest(list_concat(${duckHvalsOf("t")}, ${duckHvalsOf("bg")})) AS hv
          FROM tok2),
        f AS (SELECT doc_id, lang, CAST(hv % 1024 AS INT) AS f, COUNT(*) AS c
          FROM allf GROUP BY 1, 2, 3),
        raw AS (SELECT f, SUM(c) AS n_r FROM f GROUP BY f),
        tgt AS (SELECT f, SUM(c) AS n_t FROM f WHERE lang = 'en' GROUP BY f),
        tot AS (SELECT (SELECT SUM(n_r) FROM raw) AS nr_tot,
                       (SELECT COALESCE(SUM(n_t), 0) FROM tgt) AS nt_tot),
        qlr AS (SELECT raw.f,
            -- SUM() is HUGEINT in DuckDB; format('{:b}') needs BIGINT
            CAST(length(format('{:b}',
              CAST((COALESCE(n_t, 0) + 1) * nr_tot AS BIGINT))) AS BIGINT)
          - CAST(length(format('{:b}',
              CAST((n_r + 1) * nt_tot AS BIGINT))) AS BIGINT) AS qlr
          FROM raw LEFT JOIN tgt ON raw.f = tgt.f, tot)
        SELECT doc_id, lang, CAST(SUM(c) AS BIGINT) AS n_feats,
          CAST(SUM(c * qlr) AS BIGINT) AS dsir_bits
        FROM f JOIN qlr ON f.f = qlr.f
        GROUP BY doc_id, lang ORDER BY doc_id""")),

    // Quantized-surprisal perplexity filter — the CCNet-shaped "score
    // documents by corpus-LM perplexity, keep the in-distribution ones"
    // pass (Wenzek et al. 2020), on the same bigram model t9 trains.
    // Each bigram's surprisal −log2 p(w2|w1) = log2(c_w1/c_bg) is
    // QUANTIZED to its integer floor, computed exactly in integer space:
    // for q = c_w1 div c_bg ≥ 1, floor(log2(c_w1/c_bg)) = bitlen(q) − 1
    // (2^k ≤ q ≤ c_w1/c_bg and c_w1/c_bg < q+1 ≤ 2^(k+1)), and bitlen
    // is the length of the exact integer→binary string (Spark `conv`,
    // DuckDB `format('{:b}')`). Why quantize: neither engine's float
    // log2 is guaranteed correctly rounded, so a sum of true logs is
    // not hash-stable cross-engine — whereas the quantized sum is an
    // exact long and mean_bits is ONE division of exact longs
    // (bit-identical IEEE in both). The true-log score differs only in
    // the final per-row map; the filter semantics (rank by mean
    // surprisal, threshold) are the same. Scale shape: identical to t9
    // — vocabulary-bounded model aggregate on hashed bigram keys, the
    // corpus-sized scoring join co-partitioned on the same 8-byte key,
    // one per-doc groupBy; quantization is a per-row integer map with
    // no extra shuffle.
    Q("t13_perplexity_filter",
      (s, d) => bigramScored(Tables.documentsSpread(s, d))
        .withColumn("bits",
          (length(conv(expr("c_w1 div c_bg"), 10, 2)) - 1).cast("long"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          sum(col("bits")).cast("long").as("sum_bits"),
          (sum(col("bits")).cast("double") / count(lit(1)).cast("double"))
            .as("mean_bits"))
        .withColumn("keep", col("mean_bits") <= 6.0)
        .orderBy("doc_id"),
      Some("""WITH tok AS (
          SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
        bg AS (
          SELECT doc_id, unnest(list_transform(range(1, len(t)),
            i -> t[i] || ' ' || t[i+1])) AS bigram
          FROM tok WHERE len(t) >= 2),
        model AS (
          SELECT bigram, COUNT(*) AS c_bg,
            string_split(bigram, ' ')[1] AS w1
          FROM bg GROUP BY bigram),
        prefix AS (
          SELECT w1, CAST(SUM(c_bg) AS BIGINT) AS c_w1 FROM model GROUP BY w1),
        scored AS (
          SELECT doc_id,
            CAST(length(format('{:b}', p.c_w1 // m.c_bg)) - 1 AS BIGINT) AS bits
          FROM bg JOIN model m ON bg.bigram = m.bigram
                  JOIN prefix p ON m.w1 = p.w1)
        SELECT doc_id, COUNT(*) AS n_bigrams,
          CAST(SUM(bits) AS BIGINT) AS sum_bits,
          CAST(SUM(bits) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_bits,
          (CAST(SUM(bits) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)) <= 6.0 AS keep
        FROM scored GROUP BY doc_id ORDER BY doc_id""")),

    // Character-entropy quality signal (low entropy = repeated-char /
    // boilerplate junk, very high = binary-ish noise — a standard cheap
    // web-corpus filter next to t2's ratios and t6's Gopher rules).
    // Shannon entropy needs log2 of counts; true log2 is transcendental
    // and NOT bit-stable cross-engine, so the t13 trick applies: per
    // count, take the EXACT integer floor(log2 c) = length(bin(c)) − 1,
    // making the quantized entropy
    //   hq = n·⌊log2 n⌋ − Σ_c cnt_c·⌊log2 cnt_c⌋
    // pure long arithmetic (bit-identical anywhere), with one final
    // division for the per-char rate. Characters are enumerated with
    // the SAME 1-based substring walk on both engines — no reliance on
    // engines' divergent empty-separator split semantics. Scale shape:
    // char explode → two keyed aggregations; duplicate chars collapse
    // MAP-SIDE in the (doc_id, ch) partial aggregate, so the exchange
    // carries ≤ |alphabet| rows per document, not n_chars.
    Q("t14_char_entropy",
      (s, d) => {
        // length ≥ 1 guard: Spark's sequence(1, 0) DESCENDS ([1, 0]) where
        // DuckDB's range(1, 1) is empty — an empty document would diverge.
        val chars = Tables.documentsSpread(s, d)
          .where(length(col("text")) >= 1)
          .select(col("doc_id"),
            explode(expr(
              "transform(sequence(1, length(text)), i -> substring(text, i, 1))"))
              .as("ch"))
        val perChar = chars.groupBy("doc_id", "ch")
          .agg(count(lit(1)).as("cnt"))
          .select(col("doc_id"), col("cnt"),
            ((length(bin(col("cnt"))) - 1).cast("long") * col("cnt")).as("cbits"))
        perChar.groupBy("doc_id")
          .agg(sum(col("cnt")).cast("long").as("n_chars_seen"),
            count(lit(1)).cast("long").as("n_distinct_chars"),
            sum(col("cbits")).cast("long").as("sum_cbits"))
          .select(col("doc_id"), col("n_chars_seen"), col("n_distinct_chars"),
            ((length(bin(col("n_chars_seen"))) - 1).cast("long") * col("n_chars_seen")
              - col("sum_cbits")).as("hq"))
          .withColumn("hq_rate", col("hq").cast("double") / col("n_chars_seen").cast("double"))
          .withColumn("keep", col("hq_rate") >= 1.0 && col("hq_rate") <= 5.0)
          .orderBy("doc_id")
      },
      Some("""WITH ch AS (
          SELECT doc_id, unnest(list_transform(range(1, length(text) + 1),
            i -> substr(text, i, 1))) AS ch
          FROM documents WHERE length(text) >= 1),
        per_char AS (
          SELECT doc_id, COUNT(*) AS cnt,
            (length(bin(COUNT(*))) - 1) * COUNT(*) AS cbits
          FROM ch GROUP BY doc_id, ch),
        per_doc AS (
          SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_chars_seen,
            CAST(COUNT(*) AS BIGINT) AS n_distinct_chars,
            CAST(SUM(cbits) AS BIGINT) AS sum_cbits
          FROM per_char GROUP BY doc_id)
        SELECT doc_id, n_chars_seen, n_distinct_chars,
          CAST((length(bin(n_chars_seen)) - 1) * n_chars_seen - sum_cbits AS BIGINT) AS hq,
          CAST((length(bin(n_chars_seen)) - 1) * n_chars_seen - sum_cbits AS DOUBLE)
            / CAST(n_chars_seen AS DOUBLE) AS hq_rate,
          (CAST((length(bin(n_chars_seen)) - 1) * n_chars_seen - sum_cbits AS DOUBLE)
            / CAST(n_chars_seen AS DOUBLE)) BETWEEN 1.0 AND 5.0 AS keep
        FROM per_doc ORDER BY doc_id""")),

    // Multimodal plumbing: opaque binary payload column + typed metadata
    // (the schema/partitioning side of image/audio handling; decode is
    // stubbed in graft.llm.Multimodal).
    Q("m1_blob_meta",
      (s, d) => Tables.documentsSpread(s, d)
        .withColumn("payload", encode(col("text"), "UTF-8"))
        // byte-domain: slice the 8 magic-number bytes THEN hex them —
        // hexing the whole payload to keep 16 chars doubles the scan
        // width (the oracle hexes first only because DuckDB can't slice
        // a BLOB; hex-of-slice == slice-of-hex at byte boundaries)
        .select(col("doc_id"),
          length(col("payload")).cast("int").as("n_bytes"),
          upper(hex(substring(col("payload"), 1, 8))).as("hex_prefix"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, CAST(octet_length(encode(text)) AS INT) AS n_bytes,
          upper(substr(hex(encode(text)), 1, 16)) AS hex_prefix
        FROM documents ORDER BY doc_id""")),

    // Frame-sampling plumbing (the declarative side of
    // graft.llm.Multimodal.sampleFrames): split an opaque payload into
    // fixed 16-byte frames, keep every 4th, digest each — one-to-many
    // via explode (executor-side, bounded per row), never a driver loop.
    // Frames are byte slices of the binary payload, digested directly
    // (the contract codec output needs); the frame contract (16-byte
    // frames / every 4th) lives ONCE in [[sampledFrames]] +
    // [[duckFrames]], shared with m3.
    Q("m2_frame_sample",
      (s, d) => sampledFrames(Tables.documentsSpread(s, d))
        .orderBy("doc_id", "frame_idx"),
      Some(s"""WITH fr AS ($duckFrames)
        SELECT doc_id, frame_idx, frame_md5, frame_bytes FROM fr
        ORDER BY doc_id, frame_idx""")),

    // Cross-asset frame dedup: m2's sampled frame digests grouped ACROSS
    // documents — the multimodal analog of d1 (shared intro/outro/
    // boilerplate frames repeat across videos; dedup keeps one). Exact
    // two-level aggregation (per-(digest, doc) partial first, q29's
    // shape — no count-distinct Expand), keeper = lowest doc_id, d1's
    // policy. At 100 TB the digest groupBy is one shuffle of 16-byte
    // keys; payload bytes never move (digests computed at the scan).
    Q("m3_frame_dedup",
      (s, d) => {
        val frames = sampledFrames(Tables.documentsSpread(s, d))
          .select("doc_id", "frame_md5")
        frames.groupBy("frame_md5", "doc_id")
          .agg(count(lit(1)).as("n_in_doc"))
          .groupBy("frame_md5")
          .agg(count(lit(1)).cast("long").as("n_docs"),
            sum("n_in_doc").cast("long").as("n_occurrences"),
            min("doc_id").as("keep_doc"))
          .where(col("n_docs") >= 2)
          .orderBy("frame_md5")
      },
      Some(s"""WITH fr AS ($duckFrames),
        pd AS (
          SELECT frame_md5, doc_id, COUNT(*) AS n_in_doc
          FROM fr GROUP BY frame_md5, doc_id)
        SELECT frame_md5, CAST(COUNT(*) AS BIGINT) AS n_docs,
          CAST(SUM(n_in_doc) AS BIGINT) AS n_occurrences,
          MIN(doc_id) AS keep_doc
        FROM pd GROUP BY frame_md5 HAVING COUNT(*) >= 2
        ORDER BY frame_md5""")),

    // Perceptual (pixel-level) image near-dup — the pass byte digests
    // (m2/m3) structurally miss: a re-encoded duplicate has different
    // bytes but the same pixels. graft.llm.ImagePhash: deterministic
    // grayscale fixtures are PNG/BMP-encoded executor-side, the hash
    // side decodes the REAL bytes with javax.imageio and computes an
    // integer-exact 64-bit average hash, and pairing is Hamming-band
    // LSH (8 one-byte bands — complete for distance ≤ 7 by pigeonhole,
    // never a cartesian pair scan). The oracle recomputes the identical
    // hash from the closed-form pixel formula in SQL — PNG/BMP are
    // lossless, so Spark's codec-round-tripped hash must match the
    // formula bit-for-bit; the planted re-encodes (PNG↔BMP, Hamming 0)
    // and one-pixel perturbations (small positive distance) are the
    // dup classes under test. At 100 TB: hashing is partition-local
    // over payload bytes that never shuffle; the pair join moves only
    // (band, byte) keys + 8-byte hashes.
    Q("m4_image_phash",
      (s, d) => {
        val hashes = graft.llm.ImagePhash.avgHash(
          graft.llm.ImagePhash.synthAssets(Tables.documentsSpread(s, d)))
        graft.llm.ImagePhash.nearDupPairs(hashes, maxHamming = 7)
          .orderBy("asset_a", "asset_b")
      },
      Some("""WITH assets AS (
          SELECT doc_id, 0 AS enc FROM documents
          UNION ALL SELECT doc_id, 1 FROM documents WHERE doc_id % 2 = 0
          UNION ALL SELECT doc_id, 2 FROM documents WHERE doc_id % 3 = 0),
        px AS (
          SELECT doc_id, enc, x, y,
            ((x * ((doc_id * 2654435761) % 256) + y * ((doc_id * 40503) % 256)
              + x * y * (1 + doc_id % 13) + doc_id % 251) % 256
              + CASE WHEN enc = 2 AND x = doc_id % 32 AND y = (doc_id // 32) % 32
                     THEN 64 ELSE 0 END) % 256 AS g
          FROM assets, range(0, 32) rx(x), range(0, 32) ry(y)),
        blk AS (
          SELECT doc_id, enc, (y // 4) * 8 + (x // 4) AS b, SUM(g) AS bs
          FROM px GROUP BY 1, 2, 3),
        tot AS (SELECT doc_id, enc, SUM(bs) AS ts FROM blk GROUP BY 1, 2),
        bits AS (
          SELECT blk.doc_id, blk.enc, b,
            CASE WHEN 64 * bs > ts THEN 1 ELSE 0 END AS bit
          FROM blk JOIN tot USING (doc_id, enc)),
        h AS (
          SELECT doc_id * 4 + enc AS asset_id, b // 8 AS band,
            CAST(SUM(bit << (b % 8)) AS INT) AS byte
          FROM bits GROUP BY 1, 2),
        cand AS (
          SELECT DISTINCT a.asset_id AS asset_a, b.asset_id AS asset_b
          FROM h a JOIN h b ON a.band = b.band AND a.byte = b.byte
            AND a.asset_id < b.asset_id),
        ham AS (
          SELECT asset_a, asset_b,
            SUM(bit_count(xor(ha.byte, hb.byte))) AS hamming
          FROM cand
          JOIN h ha ON ha.asset_id = asset_a
          JOIN h hb ON hb.asset_id = asset_b AND hb.band = ha.band
          GROUP BY 1, 2)
        SELECT asset_a, asset_b, CAST(hamming AS INT) AS hamming
        FROM ham WHERE hamming <= 7 ORDER BY asset_a, asset_b""")),

    // Perceptual (sample-level) audio near-dup — m4's posture
    // transposed to audio (graft.llm.AudioFingerprint): deterministic
    // ±amp(doc, block) waveforms are framed as REAL RIFF/WAVE bytes
    // executor-side, the hash side chunk-walks the container back to
    // 16-bit PCM and computes an integer-exact 64-bit energy-envelope
    // hash (block |sample| sum × 64 vs clip total — the
    // Haitsma-Kalker robust-hash family's simplest member), and
    // pairing is the SAME HammingLsh band join m4 uses. The oracle
    // recomputes the identical hash from the closed-form amplitude
    // formula (the block sum telescopes to BlockLen·amp — PCM is
    // lossless, so the codec round-trip must match bit-for-bit). Dup
    // classes planted: an extra-LIST-chunk re-frame (enc 1 — byte
    // digests differ, Hamming 0) and a one-block amplitude bump
    // (enc 2 — small positive distance). At 100 TB: hashing is
    // partition-local over payload bytes that never shuffle; the pair
    // join moves only (band, byte) keys + 8-byte hashes.
    Q("m5_audio_fingerprint",
      (s, d) => {
        val hashes = graft.llm.AudioFingerprint.envelopeHash(
          graft.llm.AudioFingerprint.synthAssets(Tables.documentsSpread(s, d)))
        graft.llm.AudioFingerprint.nearDupPairs(hashes, maxHamming = 7)
          .orderBy("asset_a", "asset_b")
      },
      Some("""WITH assets AS (
          SELECT doc_id, 0 AS enc FROM documents
          UNION ALL SELECT doc_id, 1 FROM documents WHERE doc_id % 2 = 0
          UNION ALL SELECT doc_id, 2 FROM documents WHERE doc_id % 3 = 0),
        blk AS (
          SELECT doc_id, enc, m,
            1 + (((doc_id * 2654435761) % 251) * (m + 1)
                 + (1 + doc_id % 29) * ((m * m) % 97) + doc_id % 127) % 251
              + CASE WHEN enc = 2 AND m = doc_id % 64 THEN 64 ELSE 0 END AS amp
          FROM assets, range(0, 64) r(m)),
        tot AS (SELECT doc_id, enc, SUM(amp) AS ts FROM blk GROUP BY 1, 2),
        bits AS (
          SELECT blk.doc_id, blk.enc, m,
            CASE WHEN 64 * amp > ts THEN 1 ELSE 0 END AS bit
          FROM blk JOIN tot USING (doc_id, enc)),
        h AS (
          SELECT doc_id * 4 + enc AS asset_id, m // 8 AS band,
            CAST(SUM(bit << (m % 8)) AS INT) AS byte
          FROM bits GROUP BY 1, 2),
        cand AS (
          SELECT DISTINCT a.asset_id AS asset_a, b.asset_id AS asset_b
          FROM h a JOIN h b ON a.band = b.band AND a.byte = b.byte
            AND a.asset_id < b.asset_id),
        ham AS (
          SELECT asset_a, asset_b,
            SUM(bit_count(xor(ha.byte, hb.byte))) AS hamming
          FROM cand
          JOIN h ha ON ha.asset_id = asset_a
          JOIN h hb ON hb.asset_id = asset_b AND hb.band = ha.band
          GROUP BY 1, 2)
        SELECT asset_a, asset_b, CAST(hamming AS INT) AS hamming
        FROM ham WHERE hamming <= 7 ORDER BY asset_a, asset_b""")),

    // The m-family's COMPOSITION stage — the media keep-list a
    // multimodal corpus prep actually ships (d12's keeper policy
    // transposed to media): both modality fingerprint passes (m4 image
    // aHash, m5 audio envelope) feed one connected-components pass over
    // the union of their Hamming-≤7 pair graphs (audio uids offset to
    // 2^40 so the id spaces can't collide and no cross-modality edge
    // can exist), keeper = min-uid per component (media has no quality
    // score; min-id is the production default), singletons ride the
    // d12 left-join + coalesce instead of a union pass. Output: one
    // row per surviving asset with its cluster size — the keep-list a
    // rewrite joins against. The oracle replays both closed-form hash
    // families and the recursive reachability closure flat; like
    // d7/d12, the RECURSIVE CTE is the oracle's scale limit (documented
    // DNF class at 10×), not the engine's — Spark's side is the
    // log-round hash-min CC.
    Q("m6_media_keeplist",
      (s, d) => {
        val docs = Tables.documentsSpread(s, d)
        val off = 1099511627776L // 2^40 — the audio uid space
        // Digest frames are consumed by both sides of the band self-join
        // AND the asset roster, and each recompute re-runs the codec
        // round-trip (PNG/BMP encode → ImageIO decode; RIFF frame → PCM
        // walk) — the query's dominant cost. Materialize ONCE as a
        // single unioned checkpoint (r13 optimization round): one job
        // runs both modality codec passes in parallel across the cores
        // instead of two serialized checkpoints, the audio uid offset is
        // applied before the union so the 16-byte/asset frame is already
        // in the final id space, and one frame feeds pairing + roster.
        val digests = graft.llm.ImagePhash.avgHash(
            graft.llm.ImagePhash.synthAssets(docs)).toDF
          .select(col("asset_id"), col("hash"))
          .unionByName(graft.llm.AudioFingerprint.envelopeHash(
              graft.llm.AudioFingerprint.synthAssets(docs)).toDF
            .select((col("asset_id") + off).as("asset_id"), col("hash")))
          .localCheckpoint(true)
        // ONE band self-join for both modalities (was one per modality):
        // `asset_id >= off` is the modality key, joined alongside
        // (band, byte), so no cross-modality candidate can pair and the
        // pair set is exactly the union of the two per-modality joins —
        // one exchange instead of two. Same first-shared-band codegen
        // dedup and Hamming ≤ 7 filter as HammingLsh.nearDupPairs.
        val br = graft.llm.HammingLsh.bandRows(digests)
          .withColumn("m", (col("asset_id") >= off).cast("int"))
        val pairs = br.select(col("asset_id").as("doc_a"),
            col("hash").as("ha"), col("m"), col("band"), col("byte"))
          .join(br.select(col("asset_id").as("doc_b"),
            col("hash").as("hb"), col("m"), col("band"), col("byte")),
            Seq("m", "band", "byte"))
          .where(col("doc_a") < col("doc_b"))
          .withColumn("xr", expr("ha ^ hb"))
          .where(col("band") === graft.llm.HammingLsh.firstSharedBand)
          .where(expr("bit_count(xr)") <= 7)
          .select("doc_a", "doc_b")
        // Star CC, not d7's hash-min: perceptual-band graphs CHAIN
        // (near-threshold transitivity — a~b~c each within Hamming 7,
        // a̸~c), so diameter grows with the corpus and hash-min pays a
        // round per hop (M6Probe at the 10× replica: hash-min 18.0 s
        // unbounded-diameter rounds vs star 10.6 s in 5 log-bound
        // rounds over the same 287k pairs). d7's graph is
        // Jaccard-verified and stays shallow — hash-min remains right
        // THERE (SCALING.md r11 adjudication); topology picks the
        // algorithm.
        // children-only labels: the digest roster below coalesces roots
        // and singletons to themselves, so the CC-internal node roster
        // (an extra checkpoint job + label join) is pure duplication
        val comp = Components.connectedComponentsStarChildren(pairs)
          .withColumnRenamed("node", "uid")
        val assets = digests.select(col("asset_id").as("uid"))
        assets.join(comp, Seq("uid"), "left")
          .withColumn("component", coalesce(col("component"), col("uid")))
          .groupBy("component")
          .agg(count(lit(1)).cast("int").as("cluster_size"))
          .withColumn("modality",
            when(col("component") >= off, lit("audio")).otherwise(lit("image")))
          .withColumn("aid", col("component") % off)
          .select(col("component"),
            col("modality"),
            expr("aid div 4").as("doc_id"),
            (col("aid") % 4).cast("int").as("enc"),
            col("cluster_size"))
          .orderBy("component")
      },
      Some("""WITH RECURSIVE assets AS (
          SELECT doc_id, 0 AS enc FROM documents
          UNION ALL SELECT doc_id, 1 FROM documents WHERE doc_id % 2 = 0
          UNION ALL SELECT doc_id, 2 FROM documents WHERE doc_id % 3 = 0),
        px AS (
          SELECT doc_id, enc, x, y,
            ((x * ((doc_id * 2654435761) % 256) + y * ((doc_id * 40503) % 256)
              + x * y * (1 + doc_id % 13) + doc_id % 251) % 256
              + CASE WHEN enc = 2 AND x = doc_id % 32 AND y = (doc_id // 32) % 32
                     THEN 64 ELSE 0 END) % 256 AS g
          FROM assets, range(0, 32) rx(x), range(0, 32) ry(y)),
        blki AS (
          SELECT doc_id, enc, (y // 4) * 8 + (x // 4) AS b, SUM(g) AS bs
          FROM px GROUP BY 1, 2, 3),
        toti AS (SELECT doc_id, enc, SUM(bs) AS ts FROM blki GROUP BY 1, 2),
        bitsi AS (
          SELECT blki.doc_id, blki.enc, b,
            CASE WHEN 64 * bs > ts THEN 1 ELSE 0 END AS bit
          FROM blki JOIN toti USING (doc_id, enc)),
        hi AS (
          SELECT doc_id * 4 + enc AS uid, b // 8 AS band,
            CAST(SUM(bit << (b % 8)) AS INT) AS byte
          FROM bitsi GROUP BY 1, 2),
        blka AS (
          SELECT doc_id, enc, m,
            1 + (((doc_id * 2654435761) % 251) * (m + 1)
                 + (1 + doc_id % 29) * ((m * m) % 97) + doc_id % 127) % 251
              + CASE WHEN enc = 2 AND m = doc_id % 64 THEN 64 ELSE 0 END AS amp
          FROM assets, range(0, 64) r(m)),
        tota AS (SELECT doc_id, enc, SUM(amp) AS ts FROM blka GROUP BY 1, 2),
        bitsa AS (
          SELECT blka.doc_id, blka.enc, m,
            CASE WHEN 64 * amp > ts THEN 1 ELSE 0 END AS bit
          FROM blka JOIN tota USING (doc_id, enc)),
        ha AS (
          SELECT doc_id * 4 + enc + 1099511627776 AS uid, m // 8 AS band,
            CAST(SUM(bit << (m % 8)) AS INT) AS byte
          FROM bitsa GROUP BY 1, 2),
        hb AS (SELECT * FROM hi UNION ALL SELECT * FROM ha),
        cand AS (
          SELECT DISTINCT a.uid AS ua, b.uid AS ub
          FROM hb a JOIN hb b ON a.band = b.band AND a.byte = b.byte
            AND a.uid < b.uid
            AND (a.uid < 1099511627776) = (b.uid < 1099511627776)),
        hamp AS (
          SELECT ua, ub, SUM(bit_count(xor(x.byte, y.byte))) AS hamming
          FROM cand
          JOIN hb x ON x.uid = ua
          JOIN hb y ON y.uid = ub AND y.band = x.band
          GROUP BY 1, 2),
        pairs AS (SELECT ua, ub FROM hamp WHERE hamming <= 7),
        edges AS (SELECT ua AS u, ub AS v FROM pairs
                  UNION SELECT ub, ua FROM pairs),
        reach(u, v) AS (
          SELECT u, u FROM (SELECT DISTINCT u FROM edges)
          UNION
          SELECT e.u, r.v FROM edges e JOIN reach r ON e.v = r.u),
        compg AS (SELECT u, MIN(v) AS component FROM reach GROUP BY u),
        alluid AS (
          SELECT doc_id * 4 + enc AS uid FROM assets
          UNION ALL SELECT doc_id * 4 + enc + 1099511627776 FROM assets),
        withc AS (
          SELECT uid, COALESCE(component, uid) AS component
          FROM alluid LEFT JOIN compg ON uid = u)
        SELECT component,
          CASE WHEN component >= 1099511627776 THEN 'audio' ELSE 'image' END AS modality,
          (component % 1099511627776) // 4 AS doc_id,
          CAST((component % 1099511627776) % 4 AS INT) AS enc,
          CAST(COUNT(*) AS INT) AS cluster_size
        FROM withc GROUP BY component ORDER BY component""")),

    // The media pipeline END TO END (p1 for documents, p3 for crawled
    // text — this is the binary-column third): scrub metadata out of
    // real container bytes (format-dispatched by SIGNATURE — PNG chunk
    // walk, JPEG marker walk, pass-through for containers with no
    // metadata concept), perceptually hash the SCRUBBED bytes (the
    // production order: PII leaves before anything derived is
    // persisted), Hamming-band pair join, star CC, min-uid keeper —
    // emitting the per-asset manifest a media corpus prep actually
    // ships: keep/duplicate verdict + component + bytes saved. The
    // strip preserves pixels bit-exactly, so the pair graph over
    // scrubbed bytes must equal m4's over originals — the oracle
    // replays the hash closed-form from the pixel formula, the
    // savings from the m9 chunk arithmetic (keyed by ASSET id), and
    // the components via the recursive closure (the documented
    // DNF-at-10× oracle class; Spark's side is log-round star CC).
    Q("p4_media_prep",
      (s, d) => {
        val prep = graft.llm.MediaPrep.prep(Tables.documentsSpread(s, d))
          .toDF.localCheckpoint(true)
        val pairs = graft.llm.HammingLsh.nearDupPairsOn(
            prep.select(col("asset_id"), col("hash")), maxHamming = 7)
          .select(col("asset_a").as("doc_a"), col("asset_b").as("doc_b"))
        // children-only labels (roster coalesce below — see m6)
        val comp = Components.connectedComponentsStarChildren(pairs)
          .withColumnRenamed("node", "uid")
        prep.join(comp, prep("asset_id") === comp("uid"), "left")
          .withColumn("component", coalesce(col("component"), col("asset_id")))
          .select(col("asset_id"), col("doc_id"), col("enc").cast("int").as("enc"),
            col("component"),
            (col("asset_id") === col("component")).as("keep"),
            col("meta_removed"))
          .orderBy("asset_id")
      },
      Some("""WITH RECURSIVE assets AS (
          SELECT doc_id, 0 AS enc FROM documents
          UNION ALL SELECT doc_id, 1 FROM documents WHERE doc_id % 2 = 0
          UNION ALL SELECT doc_id, 2 FROM documents WHERE doc_id % 3 = 0),
        px AS (
          SELECT doc_id, enc, x, y,
            ((x * ((doc_id * 2654435761) % 256) + y * ((doc_id * 40503) % 256)
              + x * y * (1 + doc_id % 13) + doc_id % 251) % 256
              + CASE WHEN enc = 2 AND x = doc_id % 32 AND y = (doc_id // 32) % 32
                     THEN 64 ELSE 0 END) % 256 AS g
          FROM assets, range(0, 32) rx(x), range(0, 32) ry(y)),
        blk AS (
          SELECT doc_id, enc, (y // 4) * 8 + (x // 4) AS b, SUM(g) AS bs
          FROM px GROUP BY 1, 2, 3),
        tot AS (SELECT doc_id, enc, SUM(bs) AS ts FROM blk GROUP BY 1, 2),
        bits AS (
          SELECT blk.doc_id, blk.enc, b,
            CASE WHEN 64 * bs > ts THEN 1 ELSE 0 END AS bit
          FROM blk JOIN tot USING (doc_id, enc)),
        h AS (
          SELECT doc_id * 4 + enc AS uid, b // 8 AS band,
            CAST(SUM(bit << (b % 8)) AS INT) AS byte
          FROM bits GROUP BY 1, 2),
        cand AS (
          SELECT DISTINCT a.uid AS ua, b.uid AS ub
          FROM h a JOIN h b ON a.band = b.band AND a.byte = b.byte
            AND a.uid < b.uid),
        ham AS (
          SELECT ua, ub, SUM(bit_count(xor(x.byte, y.byte))) AS hamming
          FROM cand
          JOIN h x ON x.uid = ua
          JOIN h y ON y.uid = ub AND y.band = x.band
          GROUP BY 1, 2),
        pairs AS (SELECT ua, ub FROM ham WHERE hamming <= 7),
        edges AS (SELECT ua AS u, ub AS v FROM pairs
                  UNION SELECT ub, ua FROM pairs),
        reach(u, v) AS (
          SELECT u, u FROM (SELECT DISTINCT u FROM edges)
          UNION
          SELECT e.u, r.v FROM edges e JOIN reach r ON e.v = r.u),
        compg AS (SELECT u, MIN(v) AS component FROM reach GROUP BY u),
        alluid AS (SELECT doc_id * 4 + enc AS uid, doc_id, enc FROM assets),
        withc AS (
          SELECT uid, doc_id, enc, COALESCE(component, uid) AS component
          FROM alluid LEFT JOIN compg ON uid = u)
        SELECT uid AS asset_id, doc_id, CAST(enc AS INT) AS enc, component,
          (uid = component) AS keep,
          CAST(CASE WHEN enc = 1 THEN 0 ELSE
              (12 + 7 + 5 + len(CAST(uid AS VARCHAR)))
              + CASE WHEN uid % 2 = 0 THEN 12 + 4 + 13 ELSE 0 END
              + CASE WHEN uid % 3 = 0 THEN 12 + 7 ELSE 0 END
            END AS BIGINT) AS meta_removed
        FROM withc ORDER BY asset_id""")),

    // The perceptual screen as a SERVICE under stream ingest —
    // DocStream.nearDupScreen's media twin (graft.llm.MediaIndex +
    // graft.streaming.MediaStream): the fixture lands each ENCODING
    // GENERATION as its own file (PNG originals, then the BMP
    // re-encodes, then the perturbed variants), one micro-batch per
    // file, so a doc's re-encode pair can only be found by screening
    // the new batch against the PERSISTENT index — the cross-generation
    // path, not m4's one-shot pairing. The union of emitted pairs
    // across batches must equal the batch m4 pair set exactly, so the
    // ORACLE IS m4's oracle verbatim — N incremental screen rounds ≡
    // the one-shot batch pass (the p1b≡p1 contract for media). Pairs
    // are at-least-once (hook commits before membership), so the gate
    // reads them back distinct-by-pair.
    Q("m7_stream_phash_screen",
      (s, d) => {
        val base = new java.io.File(sys.props("java.io.tmpdir"),
          s"graft_m7/${graft.Sessions.sessionTag(s)}/${new java.io.File(d).getName}")
          .getAbsolutePath
        val landing = s"$base/landing"
        val docs = Tables.documents(s, d)
          .select(col("doc_id").cast("long").as("doc_id"))
        val marker = new java.io.File(s"$base/_landed")
        if (!marker.exists()) {
          docs.withColumn("enc", lit(0)).coalesce(1)
            .write.mode("overwrite").parquet(landing)
          docs.where(col("doc_id") % 2 === 0).withColumn("enc", lit(1))
            .coalesce(1).write.mode("append").parquet(landing)
          docs.where(col("doc_id") % 3 === 0).withColumn("enc", lit(2))
            .coalesce(1).write.mode("append").parquet(landing)
          marker.getParentFile.mkdirs()
          marker.createNewFile()
        }
        val q = graft.streaming.MediaStream.phashScreen(s, landing,
          s.read.parquet(landing).schema,
          s"$base/index", s"$base/pairs", s"$base/ckpt")
        q.awaitTermination()
        s.read.parquet(s"$base/pairs")
          .select(col("asset_a"), col("asset_b"), col("hamming"))
          .distinct()
          .orderBy("asset_a", "asset_b")
      },
      Some("""WITH assets AS (
          SELECT doc_id, 0 AS enc FROM documents
          UNION ALL SELECT doc_id, 1 FROM documents WHERE doc_id % 2 = 0
          UNION ALL SELECT doc_id, 2 FROM documents WHERE doc_id % 3 = 0),
        px AS (
          SELECT doc_id, enc, x, y,
            ((x * ((doc_id * 2654435761) % 256) + y * ((doc_id * 40503) % 256)
              + x * y * (1 + doc_id % 13) + doc_id % 251) % 256
              + CASE WHEN enc = 2 AND x = doc_id % 32 AND y = (doc_id // 32) % 32
                     THEN 64 ELSE 0 END) % 256 AS g
          FROM assets, range(0, 32) rx(x), range(0, 32) ry(y)),
        blk AS (
          SELECT doc_id, enc, (y // 4) * 8 + (x // 4) AS b, SUM(g) AS bs
          FROM px GROUP BY 1, 2, 3),
        tot AS (SELECT doc_id, enc, SUM(bs) AS ts FROM blk GROUP BY 1, 2),
        bits AS (
          SELECT blk.doc_id, blk.enc, b,
            CASE WHEN 64 * bs > ts THEN 1 ELSE 0 END AS bit
          FROM blk JOIN tot USING (doc_id, enc)),
        h AS (
          SELECT doc_id * 4 + enc AS asset_id, b // 8 AS band,
            CAST(SUM(bit << (b % 8)) AS INT) AS byte
          FROM bits GROUP BY 1, 2),
        cand AS (
          SELECT DISTINCT a.asset_id AS asset_a, b.asset_id AS asset_b
          FROM h a JOIN h b ON a.band = b.band AND a.byte = b.byte
            AND a.asset_id < b.asset_id),
        ham AS (
          SELECT asset_a, asset_b,
            SUM(bit_count(xor(ha.byte, hb.byte))) AS hamming
          FROM cand
          JOIN h ha ON ha.asset_id = asset_a
          JOIN h hb ON hb.asset_id = asset_b AND hb.band = ha.band
          GROUP BY 1, 2)
        SELECT asset_a, asset_b, CAST(hamming AS INT) AS hamming
        FROM ham WHERE hamming <= 7 ORDER BY asset_a, asset_b""")),

    // m8 — video-frame perceptual dedup (graft.llm.VideoPhash): m2's
    // frame sampling composed with m4's aHash, end-to-end on real
    // bytes. Videos are length-prefixed containers of real PNG frames
    // (even docs also get a BMP-framed RE-ENCODE — byte-distinct
    // everywhere, pixel-identical); the hash side WALKS the container
    // back, samples every 2nd frame, decodes with ImageIO, and pairs
    // via the shared HammingLsh band join. A re-encoded video's
    // sampled frames pair at Hamming 0 — the dup class m3's byte
    // digests structurally miss. Oracle: the m4 pixel-formula replay
    // keyed by fid = doc_id·131 + k·7 + 1 over sampled k ∈ {0, 2}.
    // At 100 TB: container walk + decode + hash are partition-local
    // (payload bytes never shuffle); the pair join moves (band, byte)
    // keys + one long per side, cartesian-free (PlanShapeSpec).
    Q("m8_video_frame_phash",
      (s, d) => graft.llm.VideoPhash
        .nearDupFramePairs(Tables.documentsSpread(s, d), maxHamming = 7)
        .orderBy("asset_a", "asset_b"),
      Some("""WITH vids AS (
          SELECT doc_id, 0 AS enc FROM documents
          UNION ALL SELECT doc_id, 1 FROM documents WHERE doc_id % 2 = 0),
        fr AS (
          SELECT doc_id, enc, k, doc_id * 131 + k * 7 + 1 AS fid
          FROM vids, (SELECT unnest([0, 2]) AS k)),
        px AS (
          SELECT doc_id, enc, k, x, y,
            (x * ((fid * 2654435761) % 256) + y * ((fid * 40503) % 256)
              + x * y * (1 + fid % 13) + fid % 251) % 256 AS g
          FROM fr, range(0, 32) rx(x), range(0, 32) ry(y)),
        blk AS (
          SELECT doc_id, enc, k, (y // 4) * 8 + (x // 4) AS b, SUM(g) AS bs
          FROM px GROUP BY 1, 2, 3, 4),
        tot AS (SELECT doc_id, enc, k, SUM(bs) AS ts FROM blk GROUP BY 1, 2, 3),
        bits AS (
          SELECT blk.doc_id, blk.enc, blk.k, b,
            CASE WHEN 64 * bs > ts THEN 1 ELSE 0 END AS bit
          FROM blk JOIN tot USING (doc_id, enc, k)),
        h AS (
          SELECT doc_id * 16 + enc * 8 + k AS asset_id, b // 8 AS band,
            CAST(SUM(bit << (b % 8)) AS INT) AS byte
          FROM bits GROUP BY 1, 2),
        cand AS (
          SELECT DISTINCT a.asset_id AS asset_a, b.asset_id AS asset_b
          FROM h a JOIN h b ON a.band = b.band AND a.byte = b.byte
            AND a.asset_id < b.asset_id),
        ham AS (
          SELECT asset_a, asset_b,
            SUM(bit_count(xor(ha.byte, hb.byte))) AS hamming
          FROM cand
          JOIN h ha ON ha.asset_id = asset_a
          JOIN h hb ON hb.asset_id = asset_b AND hb.band = ha.band
          GROUP BY 1, 2)
        SELECT asset_a, asset_b, CAST(hamming AS INT) AS hamming
        FROM ham WHERE hamming <= 7 ORDER BY asset_a, asset_b""")),

    // m9 — PNG metadata strip (graft.llm.PngMeta): the binary twin of
    // r1/r2's text PII redaction — drop ancillary chunks (tEXt author,
    // GPS, tIME; the PNG spec's lowercase-first-letter rule) from real
    // encoder-produced containers while the pixels survive
    // bit-identically. The oracle recomputes the injected layout's
    // chunk counts + byte savings closed-form (the m5 posture) while
    // Spark's numbers travelled through a real signature/length/CRC
    // chunk walk; idempotence + decode-and-pixel-match ride as gate
    // booleans. Everything is mapPartitions-local — payload bytes
    // never shuffle at any scale.
    Q("m9_png_meta_strip",
      (s, d) => graft.llm.PngMeta.gate(Tables.documentsSpread(s, d)),
      Some(graft.llm.PngMeta.oracleSql)),

    // m10 — JPEG metadata strip (graft.llm.JpegMeta): m9 for the other
    // container a crawled image corpus arrives in. Drop COM + APP1-15
    // marker segments (Exif/XMP/IPTC — where camera, GPS, and
    // timestamp PII lives) via a real FFD8/marker/length walk over
    // real JDK-encoded JPEGs, keeping APP0 + every codec segment and
    // copying the entropy-coded scan verbatim (no re-encode — the gate
    // verifies the scan bytes survived byte-identically). Oracle is
    // the m9 closed-form posture; idempotence + scan-intact +
    // still-decodes ride as gate booleans. mapPartitions-local —
    // payload bytes never shuffle at any scale.
    Q("m10_jpeg_meta_strip",
      (s, d) => graft.llm.JpegMeta.gate(Tables.documentsSpread(s, d)),
      Some(graft.llm.JpegMeta.oracleSql)),

    // m11 — WAV metadata strip (graft.llm.WavMeta): the audio member
    // of the binary-redaction trio. Drop the RIFF LIST/INFO chunk
    // (IART artist / ICRD date / ICMT comment — where audio PII lives)
    // via a real top-level chunk walk over real hand-framed PCM WAVs,
    // copying fmt /data verbatim and rewriting the RIFF size — so the
    // strip restores the pre-injection container BYTE-EXACTLY
    // (restores_original), the strongest content-preservation
    // invariant in the family. Oracle is the m9 closed-form posture
    // (tag sizes + RIFF pad-to-even restated as SQL arithmetic).
    // mapPartitions-local — payload bytes never shuffle at any scale.
    Q("m11_wav_meta_strip",
      (s, d) => graft.llm.WavMeta.gate(Tables.documentsSpread(s, d)),
      Some(graft.llm.WavMeta.oracleSql)),

    // PII scrubbing (graft.queries.Redact): detect + redact emails /
    // NANP phones / SSN-shaped ids, keeping per-type counts. The
    // synthetic corpus is PII-free, so deterministic spans are injected
    // from doc_id on BOTH sides first; the md5 of the redacted text
    // verifies the replacement byte-exactly cross-engine. Pure
    // regexp_replace/regexp_count column work — codegen'd, map-side,
    // no shuffle at any scale. Patterns use the common Java/RE2 subset.
    Q("r1_pii_scrub",
      (s, d) => {
        val decorated = Tables.documentsSpread(s, d).withColumn("text",
          concat(col("text"),
            when(col("doc_id") % 3 === 0,
              concat(lit(" contact user"), col("doc_id").cast("string"),
                lit("@mail.example.com"))).otherwise(lit("")),
            when(col("doc_id") % 3 === 1,
              lit(" call 555-867-5309 or 555.867.1234")).otherwise(lit("")),
            when(col("doc_id") % 2 === 0,
              lit(" ssn 123-45-6789.")).otherwise(lit(""))))
        Redact.scrub(decorated)
          .select(col("doc_id"), col("n_emails"), col("n_phones"),
            col("n_ssns"), md5(col("redacted")).as("redacted_md5"))
          .orderBy("doc_id")
      },
      Some("""WITH decorated AS (
          SELECT doc_id, text ||
            CASE WHEN doc_id % 3 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@mail.example.com' ELSE '' END ||
            CASE WHEN doc_id % 3 = 1 THEN ' call 555-867-5309 or 555.867.1234' ELSE '' END ||
            CASE WHEN doc_id % 2 = 0 THEN ' ssn 123-45-6789.' ELSE '' END AS text
          FROM documents)
        SELECT doc_id,
          CAST(len(regexp_extract_all(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}')) AS INT) AS n_emails,
          CAST(len(regexp_extract_all(text, '\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b')) AS INT) AS n_phones,
          CAST(len(regexp_extract_all(text, '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b')) AS INT) AS n_ssns,
          md5(regexp_replace(regexp_replace(regexp_replace(text,
            '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
            '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b', '<SSN>', 'g'),
            '\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b', '<PHONE>', 'g')) AS redacted_md5
        FROM decorated ORDER BY doc_id""")),

    // r2 — the extended PII classes (IPv4, formatted card numbers) over
    // planted content, alongside an email so the combined five-pattern
    // redaction order is exercised. Same planted-case discipline as r1:
    // deterministic doc_id residues pick the decorations, so both
    // engines decorate identically and the scrub counts are exact.
    Q("r2_pii_extended",
      (s, d) => {
        val decorated = Tables.documentsSpread(s, d).withColumn("text",
          concat(col("text"),
            when(col("doc_id") % 4 === 0,
              concat(lit(" from host 10.42."), (col("doc_id") % 200).cast("string"),
                lit(".7"))).otherwise(lit("")),
            when(col("doc_id") % 5 === 0,
              lit(" paid with 4111-1111-1111-1111 yesterday")).otherwise(lit("")),
            when(col("doc_id") % 6 === 0,
              lit(" ping ops@net.example.org")).otherwise(lit(""))))
        Redact.scrubExtended(decorated)
          .select(col("doc_id"), col("n_emails"), col("n_ips"), col("n_cards"),
            md5(col("redacted")).as("redacted_md5"))
          .orderBy("doc_id")
      },
      Some("""WITH decorated AS (
          SELECT doc_id, text ||
            CASE WHEN doc_id % 4 = 0 THEN ' from host 10.42.' || CAST(doc_id % 200 AS VARCHAR) || '.7' ELSE '' END ||
            CASE WHEN doc_id % 5 = 0 THEN ' paid with 4111-1111-1111-1111 yesterday' ELSE '' END ||
            CASE WHEN doc_id % 6 = 0 THEN ' ping ops@net.example.org' ELSE '' END AS text
          FROM documents)
        SELECT doc_id,
          CAST(len(regexp_extract_all(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}')) AS INT) AS n_emails,
          CAST(len(regexp_extract_all(text, '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b')) AS INT) AS n_ips,
          CAST(len(regexp_extract_all(text, '\b[0-9]{4}[- ][0-9]{4}[- ][0-9]{4}[- ][0-9]{4}\b')) AS INT) AS n_cards,
          md5(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
            '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
            '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b', '<SSN>', 'g'),
            '\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b', '<PHONE>', 'g'),
            '\b[0-9]{4}[- ][0-9]{4}[- ][0-9]{4}[- ][0-9]{4}\b', '<CARD>', 'g'),
            '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IP>', 'g')) AS redacted_md5
        FROM decorated ORDER BY doc_id"""))
  )
}
