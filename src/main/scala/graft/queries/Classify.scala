package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Model-based quality filtering with the model TRAINED ON THE CLUSTER —
  * the CCNet/DCLM-style "curated-vs-crawl" classifier pass, as pure
  * aggregations. t11 scores with a fixed hash model and t18 reweights
  * with DSIR importance ratios; this operator closes the family's third
  * corner: supervised training against labeled sources, then held-out
  * evaluation, all in one DataFrame program (no driver loop, no MLlib).
  *
  * Model: Laplace-smoothed Naive Bayes in VOTE form. A token's class
  * evidence is the SIGN of its smoothed log-odds — `+1` where
  * P(tok|curated) > P(tok|crawl), `-1` for the reverse, `0` on exact
  * ties — and a document's score is the sum of votes over its token
  * occurrences. The sign is decided by exact int64 cross-multiplication
  * `(c_pos+1)·(T_neg+V) ⋛ (c_neg+1)·(T_pos+V)` (the m4/v14 bigint-
  * compare trick), so training and scoring are integer-exact and the
  * DuckDB oracle hash-matches bit-for-bit — no `ln()` crosses an engine
  * boundary. Headroom: the product is (token count)·(corpus tokens);
  * int64 holds to ~3·10⁹ corpus tokens per class — past that, the same
  * comparison lifts to DECIMAL(38,0) unchanged.
  *
  * Scale shape: training is one explode + two hash aggregations over
  * the train split (map-side partials; the (token) key space is the
  * vocabulary, a dimension not a fact). The corpus-level totals ride a
  * broadcast 1-row stats frame (the in-repo pattern). Scoring joins the
  * token stream against the broadcast vote table and re-aggregates per
  * document — at 100 TB the only shuffles are the two vocab-keyed aggs
  * and the per-doc score agg.
  *
  * The driver's synthetic corpus draws all sources from one vocabulary,
  * so held-out accuracy here hovers near chance — the GATE pins
  * train/score arithmetic exactly, while ClassifySpec proves learning
  * on a planted-signal corpus (markers push accuracy to 1.0) and pins
  * the tie/unseen-token contracts.
  */
object Classify {

  /** Labeled slice: src0/src1 = curated (+), src8/src9 = crawl (−);
    * other sources are out of the supervised universe. */
  private val PosSources = Seq("src0", "src1")
  private val NegSources = Seq("src8", "src9")

  private def labeled(docs: DataFrame): DataFrame =
    docs
      .where(col("source").isin(PosSources ++ NegSources: _*))
      .select(col("doc_id"), col("source").isin(PosSources: _*).as("label_pos"),
        split(lower(col("text")), " ").as("toks"))

  /** Deterministic 80/20 split on the stable id (c2's posture). */
  private def isTrain: Column = col("doc_id") % 5 =!= 0

  /** Train the vote table over `(label_pos, toks)` rows:
    * `(tok, vote ∈ {-1,0,1})`. */
  def tokenVotes(train: DataFrame): DataFrame = {
    val counts = train
      .select(col("label_pos"), explode(col("toks")).as("tok"))
      .groupBy("tok")
      .agg(
        sum(when(col("label_pos"), 1L).otherwise(0L)).as("c_pos"),
        sum(when(col("label_pos"), 0L).otherwise(1L)).as("c_neg"))
    val stats = counts.agg(
      sum("c_pos").as("t_pos"), sum("c_neg").as("t_neg"),
      count(lit(1)).as("v"))
    val lhs = (col("c_pos") + 1) * (col("t_neg") + col("v"))
    val rhs = (col("c_neg") + 1) * (col("t_pos") + col("v"))
    counts.crossJoin(broadcast(stats))
      .select(col("tok"),
        when(lhs > rhs, 1).when(lhs < rhs, -1).otherwise(0).as("vote"))
  }

  /** Score `(doc_id, label_pos, toks)` rows against a vote table:
    * per-doc vote sum over token occurrences, unseen tokens vote 0,
    * ties predict crawl (the conservative keep=false side). */
  def score(docs: DataFrame, votes: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), col("label_pos"), explode(col("toks")).as("tok"))
      .join(broadcast(votes), Seq("tok"), "left")
      .groupBy("doc_id", "label_pos")
      .agg(count(lit(1)).cast("int").as("n_tokens"),
        sum(coalesce(col("vote"), lit(0)).cast("long")).as("votes"))
      .withColumn("pred_pos", col("votes") > 0)
      .withColumn("correct", col("pred_pos") === col("label_pos"))

  def gate(s: SparkSession, d: String): DataFrame = {
    val lab = labeled(Tables.documents(s, d))
    score(lab.where(!isTrain), tokenVotes(lab.where(isTrain)))
      .select("doc_id", "label_pos", "n_tokens", "votes", "pred_pos", "correct")
      .orderBy("doc_id")
  }

  val all: Seq[Q] = Seq(
    Q("t29_nb_classifier",
      (s, d) => gate(s, d),
      Some("""WITH lab AS (
          SELECT doc_id, source IN ('src0','src1') AS label_pos,
            string_split(lower(text), ' ') AS toks
          FROM documents
          WHERE source IN ('src0','src1','src8','src9')),
        traintok AS (
          SELECT label_pos, unnest(toks) AS tok FROM lab WHERE doc_id % 5 <> 0),
        counts AS (
          SELECT tok,
            CAST(SUM(CASE WHEN label_pos THEN 1 ELSE 0 END) AS BIGINT) AS c_pos,
            CAST(SUM(CASE WHEN label_pos THEN 0 ELSE 1 END) AS BIGINT) AS c_neg
          FROM traintok GROUP BY tok),
        stats AS (
          SELECT CAST(SUM(c_pos) AS BIGINT) AS t_pos,
            CAST(SUM(c_neg) AS BIGINT) AS t_neg,
            CAST(COUNT(*) AS BIGINT) AS v
          FROM counts),
        votes AS (
          SELECT tok,
            CASE WHEN (c_pos + 1) * (t_neg + v) > (c_neg + 1) * (t_pos + v) THEN 1
                 WHEN (c_pos + 1) * (t_neg + v) < (c_neg + 1) * (t_pos + v) THEN -1
                 ELSE 0 END AS vote
          FROM counts, stats),
        evaltok AS (
          SELECT doc_id, label_pos, unnest(toks) AS tok FROM lab WHERE doc_id % 5 = 0),
        scored AS (
          SELECT doc_id, label_pos,
            CAST(COUNT(*) AS INT) AS n_tokens,
            CAST(SUM(coalesce(vote, 0)) AS BIGINT) AS votes
          FROM evaltok LEFT JOIN votes USING (tok)
          GROUP BY doc_id, label_pos)
        SELECT doc_id, label_pos, n_tokens, votes, votes > 0 AS pred_pos,
          (votes > 0) = label_pos AS correct
        FROM scored ORDER BY doc_id"""))
  )
}
