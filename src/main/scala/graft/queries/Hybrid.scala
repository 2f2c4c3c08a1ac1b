package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Hybrid lexical+vector retrieval — the fusion step a training-data /
  * RAG pipeline runs on top of t8's BM25 index and the v-family ANN:
  * Reciprocal Rank Fusion (Cormack et al. 2009),
  * `score(d) = Σ_lists 1/(k + rank_list(d))`, k = 60.
  *
  * Bit-exactness: each list contributes `1e0/(60 + rank)` — one
  * correctly-rounded double division of exact ints — and the fusion is
  * a two-term sum evaluated in fixed order (lexical first), so scores
  * hash-match cross-engine with no tolerance. RRF deliberately fuses
  * RANKS, not raw scores — BM25 and cosine live on incomparable scales,
  * which is exactly why it is the default hybrid in production search.
  *
  * Scale shape: both candidate lists end in a global top-k
  * (TakeOrdered — the k-bounded total sort Spark plans for
  * orderBy+limit, partial top-k map-side); the rank window then runs
  * over ≤ k rows (k-bounded single partition by construction), and the
  * fusion join is a ≤k × ≤k full outer join. Nothing downstream of the
  * scans carries more than k rows, at any corpus size.
  */
object Hybrid {

  private val k = 60

  val all: Seq[Q] = Seq(
    Q("h1_rrf_hybrid",
      (s, d) => {
        val terms = Seq("spark", "join", "vector")
        val lexTop = TextOps.bm25(Tables.documentsSpread(s, d), terms)
          .where(col("bm25") > 0d)
          .orderBy(col("bm25").desc, col("doc_id")).limit(50)
        val lex = lexTop
          .withColumn("lex_rank",
            row_number().over(Window.orderBy(col("bm25").desc, col("doc_id")))
              .cast("int"))
          .select(col("doc_id"), col("lex_rank"))

        val e = Tables.embeddingsSpread(s, d)
        val q0 = e.where(col("vec_id") === 0).select(col("embedding").as("qe"))
        val vecTop = e.where(col("vec_id") =!= 0)
          .crossJoin(broadcast(q0))
          .select(col("vec_id"),
            VectorOps.cosine(col("qe"), col("embedding")).as("cos_sim"))
          .orderBy(col("cos_sim").desc, col("vec_id")).limit(50)
        val vec = vecTop
          .withColumn("vec_rank",
            row_number().over(Window.orderBy(col("cos_sim").desc, col("vec_id")))
              .cast("int"))
          .select(col("vec_id"), col("vec_rank"))

        lex.join(vec, lex("doc_id") === vec("vec_id"), "full_outer")
          .select(
            coalesce(col("doc_id"), col("vec_id")).as("doc_id"),
            col("lex_rank"), col("vec_rank"),
            (coalesce(lit(1.0) / (lit(k) + col("lex_rank")), lit(0.0)) +
              coalesce(lit(1.0) / (lit(k) + col("vec_rank")), lit(0.0)))
              .as("rrf_score"))
          .orderBy(col("rrf_score").desc, col("doc_id")).limit(20)
      },
      Some(s"""WITH per_doc AS (
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
          FROM per_doc),
        bm AS (
          SELECT doc_id,
            ((n_docs - df_spark + 0.5e0) / (df_spark + 0.5e0)) *
                (tf_spark * 2.2e0) /
                (tf_spark + 1.2e0 * (0.25e0 + 0.75e0 * (dl / (sum_dl / n_docs)))) +
            ((n_docs - df_join + 0.5e0) / (df_join + 0.5e0)) *
                (tf_join * 2.2e0) /
                (tf_join + 1.2e0 * (0.25e0 + 0.75e0 * (dl / (sum_dl / n_docs)))) +
            ((n_docs - df_vector + 0.5e0) / (df_vector + 0.5e0)) *
                (tf_vector * 2.2e0) /
                (tf_vector + 1.2e0 * (0.25e0 + 0.75e0 * (dl / (sum_dl / n_docs)))) AS bm25
          FROM per_doc, stats),
        lex_top AS (
          SELECT doc_id, bm25 FROM bm WHERE bm25 > 0
          ORDER BY bm25 DESC, doc_id LIMIT 50),
        lex AS (
          SELECT doc_id, CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS INT)
            AS lex_rank FROM lex_top),
        q0 AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        scored AS (
          SELECT vec_id, ${VectorOps.duckCos("qe", "embedding")} AS cos_sim
          FROM embeddings, q0 WHERE vec_id <> 0),
        vec_top AS (
          SELECT vec_id, cos_sim FROM scored
          ORDER BY cos_sim DESC, vec_id LIMIT 50),
        vec AS (
          SELECT vec_id, CAST(row_number() OVER (ORDER BY cos_sim DESC, vec_id) AS INT)
            AS vec_rank FROM vec_top)
        SELECT coalesce(l.doc_id, v.vec_id) AS doc_id, l.lex_rank, v.vec_rank,
          coalesce(1e0 / ($k + l.lex_rank), 0e0) +
            coalesce(1e0 / ($k + v.vec_rank), 0e0) AS rrf_score
        FROM lex l FULL OUTER JOIN vec v ON l.doc_id = v.vec_id
        ORDER BY rrf_score DESC, doc_id LIMIT 20""")),

    // The SAME RRF contract served from the PERSISTENT index trio —
    // lexical candidates from graft.llm.TextIndex (stored postings +
    // ledger, built in two add() batches), vector candidates from
    // graft.llm.VectorIndex (stored IVF under the pinned v5b codebook,
    // buildWith + add halves, nprobe=4 of 16 cells). h1 gates the
    // fusion over BATCH scorers; this gates what a production RAG /
    // retrieval stack actually runs: two index serves + fusion, with
    // the oracle recomputing both sides flat from the raw tables — so
    // a drift anywhere in either service's stored state, the probe
    // discipline, or the fusion arithmetic breaks the hash. Scale
    // shape: both serves end in a k-bounded TakeOrdered before the
    // ≤k × ≤k full-outer fusion join; the only corpus-sized work is
    // the term-pruned postings scan and the 4 probed cell partitions.
    Q("h2_hybrid_index_serve",
      (s, d) => {
        val terms = Seq("query", "batch", "window")
        val tag = d.replaceAll("[^A-Za-z0-9]", "_")
        val base = new java.io.File(sys.props("java.io.tmpdir"),
          s"graft_hybidx/$tag/${graft.Sessions.sessionTag(s)}")
        val dirT = new java.io.File(base, "text").getAbsolutePath
        val dirV = new java.io.File(base, "vec").getAbsolutePath
        val marker = s"graft_h2_marker_$tag"
        if (!s.catalog.tableExists(marker)) {
          val docs = Tables.documentsSpread(s, d).select("doc_id", "text")
          graft.llm.TextIndex.add(s, dirT, docs.where(col("doc_id") % 2 === 0))
          graft.llm.TextIndex.add(s, dirT, docs.where(col("doc_id") % 2 =!= 0))
          val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
          graft.llm.VectorIndex.buildWith(s, dirV,
            emb.where(col("vec_id") % 2 === 0), VectorOps.pinnedCentroids(s, d))
          graft.llm.VectorIndex.add(s, dirV, emb.where(col("vec_id") % 2 =!= 0))
          s.emptyDataFrame.createOrReplaceTempView(marker)
        }
        val lex = graft.llm.TextIndex.search(s, dirT, terms, 50)
          .withColumn("lex_rank",
            row_number().over(Window.orderBy(col("bm25").desc, col("doc_id")))
              .cast("int"))
          .select("doc_id", "lex_rank")
        val q0 = Tables.embeddings(s, d).where(col("vec_id") === 0)
          .select(col("vec_id").as("qid"), col("embedding").as("qe"))
        val vec = graft.llm.VectorIndex.search(s, dirV, q0, k = 50, nprobe = 4)
          .select(col("nid"), col("rnk").as("vec_rank"))
        lex.join(vec, lex("doc_id") === vec("nid"), "full_outer")
          .select(
            coalesce(col("doc_id"), col("nid")).as("doc_id"),
            col("lex_rank"), col("vec_rank"),
            (coalesce(lit(1.0) / (lit(k) + col("lex_rank")), lit(0.0)) +
              coalesce(lit(1.0) / (lit(k) + col("vec_rank")), lit(0.0)))
              .as("rrf_score"))
          .orderBy(col("rrf_score").desc, col("doc_id")).limit(20)
      },
      Some(s"""WITH per_doc AS (
          SELECT doc_id, CAST(len(t) AS INT) AS dl,
            CAST(len(list_filter(t, x -> x = 'query')) AS INT) AS tf_query,
            CAST(len(list_filter(t, x -> x = 'batch')) AS INT) AS tf_batch,
            CAST(len(list_filter(t, x -> x = 'window')) AS INT) AS tf_window
          FROM (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents)),
        stats AS (
          SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl,
            SUM(CASE WHEN tf_query > 0 THEN 1 ELSE 0 END) AS df_query,
            SUM(CASE WHEN tf_batch > 0 THEN 1 ELSE 0 END) AS df_batch,
            SUM(CASE WHEN tf_window > 0 THEN 1 ELSE 0 END) AS df_window
          FROM per_doc),
        bm AS (
          SELECT doc_id,
            ((n_docs - df_query + 0.5e0) / (df_query + 0.5e0)) *
                (tf_query * 2.2e0) /
                (tf_query + 1.2e0 * (0.25e0 + 0.75e0 * (dl / (sum_dl / n_docs)))) +
            ((n_docs - df_batch + 0.5e0) / (df_batch + 0.5e0)) *
                (tf_batch * 2.2e0) /
                (tf_batch + 1.2e0 * (0.25e0 + 0.75e0 * (dl / (sum_dl / n_docs)))) +
            ((n_docs - df_window + 0.5e0) / (df_window + 0.5e0)) *
                (tf_window * 2.2e0) /
                (tf_window + 1.2e0 * (0.25e0 + 0.75e0 * (dl / (sum_dl / n_docs)))) AS bm25
          FROM per_doc, stats),
        lex_top AS (
          SELECT doc_id, bm25 FROM bm WHERE bm25 > 0
          ORDER BY bm25 DESC, doc_id LIMIT 50),
        lex AS (
          SELECT doc_id, CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS INT)
            AS lex_rank FROM lex_top),
        cents AS (
          SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cent_id,
            embedding AS ce
          FROM embeddings WHERE vec_id < 16),
        vscored AS (
          SELECT e.vec_id, e.embedding, cent_id,
            ${VectorOps.duckSqL2("ce", "e.embedding")} AS dist
          FROM embeddings e CROSS JOIN cents),
        vranked AS (
          SELECT *, row_number() OVER (PARTITION BY vec_id
                      ORDER BY dist, cent_id) AS rn FROM vscored),
        assigned AS (
          SELECT vec_id, embedding, cent_id AS cell FROM vranked WHERE rn = 1),
        probes AS (
          SELECT vec_id AS qid, embedding AS qe, cent_id AS cell FROM vranked
          WHERE vec_id = 0 AND rn <= 4),
        cand AS (
          SELECT qid, a.vec_id AS nid,
            ${VectorOps.duckCos("qe", "a.embedding")} AS cos_sim
          FROM probes p JOIN assigned a ON p.cell = a.cell AND a.vec_id <> p.qid),
        vec AS (
          SELECT nid, CAST(rnk AS INT) AS vec_rank FROM (
            SELECT *, row_number() OVER (PARTITION BY qid
                        ORDER BY cos_sim DESC, nid) AS rnk FROM cand)
          WHERE rnk <= 50)
        SELECT coalesce(l.doc_id, v.nid) AS doc_id, l.lex_rank, v.vec_rank,
          coalesce(1e0 / ($k + l.lex_rank), 0e0) +
            coalesce(1e0 / ($k + v.vec_rank), 0e0) AS rrf_score
        FROM lex l FULL OUTER JOIN vec v ON l.doc_id = v.nid
        ORDER BY rrf_score DESC, doc_id LIMIT 20"""))
  )
}
