package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Embedding similarity-search operators over `embeddings`
  * (Array[Float], 64-dim).
  *
  * Cosine is computed with an identical double-precision sequential
  * fold on both engines (verified bit-exact vs DuckDB list_sum), so the
  * oracle compare is exact — no tolerance games.
  *
  * Scale notes (100 TB): brute-force top-k is the correctness baseline
  * (broadcast the query set, map-side score, per-query top-k via window);
  * the LSH variant buckets by sign-bit signature so the join key is the
  * bucket — candidate generation is a shuffle on the signature, never a
  * cross join.
  */
object VectorOps {

  /** Sequential-fold double dot product of two float-array columns. */
  private[queries] def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Fused single-pass cosine (graft.functions.CosineSimilarity, codegen).
    * Bit-identical to `dot(a,b)/(√dot(a,a)·√dot(b,b))` — proven by
    * CosineSimilaritySpec — so the DuckDB oracle SQL stays the fold form. */
  private[graft] def cosine(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.functions.CosineSimilarity(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  /** DuckDB mirror of [[dot]] (list_sum is a sequential fold too). */
  private[graft] def duckDot(a: String, b: String): String =
    s"list_sum(list_transform(range(1, len($a)+1), i -> $a[i]::DOUBLE * $b[i]::DOUBLE))"

  private[graft] def duckCos(a: String, b: String): String =
    s"${duckDot(a, b)} / (sqrt(${duckDot(a, a)}) * sqrt(${duckDot(b, b)}))"

  /** 6-bit sign-signature over fixed dims (axis-aligned hyperplane LSH). */
  private val lshDims = Seq(1, 9, 17, 25, 33, 41) // 1-based

  /** The signature as a column / as DuckDB SQL — defined ONCE so v2's
    * query-set ANN and v9's kNN-join bucket identically on both engines
    * (a drifted copy would desynchronize their candidate sets while both
    * gates stayed individually green). */
  private[graft] def sigCol: Column = lshDims.zipWithIndex.map { case (dim, k) =>
    when(element_at(col("embedding"), dim) >= 0, 1 << k).otherwise(0)
  }.reduce(_ + _).cast("int")

  private[graft] val sigSql = lshDims.zipWithIndex.map { case (dim, k) =>
    s"CASE WHEN embedding[$dim] >= 0 THEN ${1 << k} ELSE 0 END"
  }.mkString(" + ")

  val all: Seq[Q] = Seq(

    // Brute-force cosine top-k: the exact baseline. Query set is small →
    // broadcast it; scoring is map-side over the big side.
    Q("v1_knn_brute",
      (s, d) => {
        val e = Tables.embeddingsSpread(s, d)
        val q = e.where(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("embedding").as("qe"))
        val scored = e.join(broadcast(q), col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id").as("nid"),
            cosine(col("qe"), col("embedding")).as("cos_sim"))
        val w = Window.partitionBy("qid").orderBy(col("cos_sim").desc, col("nid"))
        scored.withColumn("rnk", row_number().over(w).cast("int"))
          .where(col("rnk") <= 5)
          .select("qid", "nid", "rnk", "cos_sim")
          .orderBy("qid", "rnk")
      },
      Some(s"""WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 10),
        scored AS (
          SELECT qid, e.vec_id AS nid, ${duckCos("qe", "e.embedding")} AS cos_sim
          FROM embeddings e JOIN q ON e.vec_id <> q.qid)
        SELECT qid, nid, CAST(rnk AS INT) AS rnk, cos_sim FROM (
          SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cos_sim DESC, nid) AS rnk
          FROM scored)
        WHERE rnk <= 5 ORDER BY qid, rnk""")),

    // LSH-bucketed ANN: equi-join on the 6-bit sign signature, rank within
    // bucket — the scale path for candidate generation.
    Q("v2_knn_lsh",
      (s, d) => {
        val e = Tables.embeddings(s, d).withColumn("sig", sigCol)
        val q = e.where(col("vec_id") < 50)
          .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("sig"))
        val cand = e.join(q, Seq("sig")).where(col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id").as("nid"),
            cosine(col("qe"), col("embedding")).as("cos_sim"))
        val w = Window.partitionBy("qid").orderBy(col("cos_sim").desc, col("nid"))
        cand.withColumn("rnk", row_number().over(w).cast("int"))
          .where(col("rnk") <= 3)
          .select("qid", "nid", "rnk", "cos_sim")
          .orderBy("qid", "rnk")
      },
      Some {
        s"""WITH e AS (SELECT vec_id, embedding, CAST($sigSql AS INT) AS sig FROM embeddings),
          q AS (SELECT vec_id AS qid, embedding AS qe, sig FROM e WHERE vec_id < 50),
          cand AS (
            SELECT qid, e.vec_id AS nid, ${duckCos("qe", "e.embedding")} AS cos_sim
            FROM e JOIN q ON e.sig = q.sig AND e.vec_id <> q.qid)
          SELECT qid, nid, CAST(rnk AS INT) AS rnk, cos_sim FROM (
            SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cos_sim DESC, nid) AS rnk
            FROM cand)
          WHERE rnk <= 3 ORDER BY qid, rnk"""
      }),

    // IVF ANN — the other scale path next to sign-LSH (v2): partition the
    // corpus into inverted lists by nearest centroid (build = one
    // broadcast-join + per-vector argmax, a narrow map at any scale),
    // then search only the nprobe=2 closest lists per query (an equi-join
    // on the cell id — shuffle keyed by cell, never a scan of the corpus).
    // Centroids here are the first 16 vectors, pinned for determinism;
    // production builds them with graft.queries.KMeans.fit (distributed
    // Lloyd's, farthest-first init) — the operator shape (assign /
    // probe / rank) is identical and that is what this query gates.
    Q("v5_knn_ivf",
      (s, d) => {
        val e = Tables.embeddingsSpread(s, d)
        val cents = e.where(col("vec_id") < 16)
          .select(col("vec_id").as("cent_id"), col("embedding").as("ce"))
        // all (vector, centroid) cosines: 16 rows broadcast, map-side score
        // feeds both the assignment and the probe selection — and is
        // deliberately NOT cached: the probe branch's vec_id<50 filter
        // pushes into the parquet scan (a ~50-row recompute), while a
        // cache would pin corpus×16 rows WITH embeddings in executor
        // memory for the rest of the session and block the pushdown
        val scored = e.join(broadcast(cents))
          .select(col("vec_id"), col("embedding"), col("cent_id"),
            cosine(col("embedding"), col("ce")).as("ccos"))
        val byCent = Window.partitionBy("vec_id")
          .orderBy(col("ccos").desc, col("cent_id"))
        val assigned = scored.withColumn("rn", row_number().over(byCent))
          .where(col("rn") === 1)
          .select(col("vec_id"), col("embedding"), col("cent_id").as("cell"))
        val probes = scored.where(col("vec_id") < 50)
          .withColumn("rn", row_number().over(byCent)).where(col("rn") <= 2)
          .select(col("vec_id").as("qid"), col("embedding").as("qe"),
            col("cent_id").as("cell"))
        val cand = probes.join(assigned, Seq("cell"))
          .where(col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id").as("nid"),
            cosine(col("qe"), col("embedding")).as("cos_sim"))
        val byQ = Window.partitionBy("qid").orderBy(col("cos_sim").desc, col("nid"))
        cand.withColumn("rnk", row_number().over(byQ).cast("int"))
          .where(col("rnk") <= 3)
          .select("qid", "nid", "rnk", "cos_sim")
          .orderBy("qid", "rnk")
      },
      Some(s"""WITH cents AS (
            SELECT vec_id AS cent_id, embedding AS ce FROM embeddings WHERE vec_id < 16),
          scored AS (
            SELECT e.vec_id, e.embedding, cent_id, ${duckCos("e.embedding", "ce")} AS ccos
            FROM embeddings e CROSS JOIN cents),
          ranked AS (
            SELECT *, row_number() OVER (PARTITION BY vec_id
                        ORDER BY ccos DESC, cent_id) AS rn FROM scored),
          assigned AS (
            SELECT vec_id, embedding, cent_id AS cell FROM ranked WHERE rn = 1),
          probes AS (
            SELECT vec_id AS qid, embedding AS qe, cent_id AS cell
            FROM ranked WHERE vec_id < 50 AND rn <= 2),
          cand AS (
            SELECT qid, a.vec_id AS nid, ${duckCos("qe", "a.embedding")} AS cos_sim
            FROM probes p JOIN assigned a ON p.cell = a.cell AND a.vec_id <> p.qid)
        SELECT qid, nid, CAST(rnk AS INT) AS rnk, cos_sim FROM (
          SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cos_sim DESC, nid) AS rnk
          FROM cand)
        WHERE rnk <= 3 ORDER BY qid, rnk""")),

    // The SAME IVF search served from the STORED index
    // (graft.llm.VectorIndex): the gate pins the codebook (first 16
    // vectors, the v5/v6 fixture posture — production trains it with
    // KMeans.fit via build()), commits a version over HALF the corpus,
    // and appends the other half through add() — so what's oracle-gated
    // is the persisted lifecycle end-to-end: the atomic version flip,
    // map-side assignment against the stored codebook, the live-ledger
    // anti-join, and search's probe-under-the-assignment-metric
    // discipline (cells ranked by squared L2, the metric that PLACED
    // the vectors — v5's query-side gate ranks by cosine and is a
    // different operator). Session-memoized tmp dir, v9b's discipline.
    Q("v5b_knn_ivf_index",
      (s, d) => {
        val tag = d.replaceAll("[^A-Za-z0-9]", "_")
        val dir = new java.io.File(sys.props("java.io.tmpdir"),
          s"graft_vecidx/$tag/${graft.Sessions.sessionTag(s)}").getAbsolutePath
        val marker = s"graft_vecidx_marker_$tag"
        if (!s.catalog.tableExists(marker)) {
          val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
          graft.llm.VectorIndex.buildWith(s, dir,
            emb.where(col("vec_id") % 2 === 0), pinnedCentroids(s, d))
          graft.llm.VectorIndex.add(s, dir, emb.where(col("vec_id") % 2 =!= 0))
          s.emptyDataFrame.createOrReplaceTempView(marker)
        }
        graft.llm.VectorIndex.search(s, dir, ivfQueries(s, d), k = 3, nprobe = 2)
      },
      Some(ivfIndexSql(""))),

    // The takedown path of the SAME stored index: add in two batches,
    // REMOVE two id slices, re-ADD one of them, then search. The oracle
    // is the flat IVF SQL over exactly the SURVIVING corpus, so the
    // gate pins: tombstoned vectors vanish from every neighbor list the
    // moment the marker commits (no inverted-list rewrite), promotions
    // into the vacated top-k slots happen, and a re-add after a removal
    // is a fresh membership that lands bit-for-bit on the
    // never-removed build. Mirrors v9c for the kNN-graph index.
    Q("v5c_knn_ivf_tombstone",
      (s, d) => {
        val tag = d.replaceAll("[^A-Za-z0-9]", "_")
        val dir = new java.io.File(sys.props("java.io.tmpdir"),
          s"graft_vecidx_tomb/$tag/${graft.Sessions.sessionTag(s)}").getAbsolutePath
        val marker = s"graft_vecidxt_marker_$tag"
        if (!s.catalog.tableExists(marker)) {
          val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
          graft.llm.VectorIndex.buildWith(s, dir,
            emb.where(col("vec_id") % 2 === 0), pinnedCentroids(s, d))
          graft.llm.VectorIndex.add(s, dir, emb.where(col("vec_id") % 2 =!= 0))
          graft.llm.VectorIndex.remove(s, dir,
            emb.where(col("vec_id") % 10 === 1 || col("vec_id") % 10 === 6)
              .select("vec_id"))
          graft.llm.VectorIndex.add(s, dir, emb.where(col("vec_id") % 10 === 1))
          s.emptyDataFrame.createOrReplaceTempView(marker)
        }
        graft.llm.VectorIndex.search(s, dir,
          ivfQueries(s, d).where(col("qid") % 10 =!= 6), k = 3, nprobe = 2)
      },
      Some(ivfIndexSql("AND vec_id % 10 <> 6"))),

    // The COMPACTION path of the stored IVF index: v5c's full lifecycle
    // (two-batch build, remove, re-add), then a physical compact — the
    // reclamation-only rewrite that drops tombstoned rows under the
    // SAME codebook — then ANOTHER removal cycle against the compacted
    // version. The oracle is the flat IVF SQL over exactly the final
    // surviving corpus, so the gate pins oracle-side what
    // VectorIndexSpec pins Spark-vs-Spark: compact changes no search
    // result, carries no tombstone forward, and the generation ledger
    // restarts cleanly in the new version (the post-compact remove
    // lands at a generation above the compacted rows' floor).
    Q("v5d_knn_ivf_compact",
      (s, d) => {
        val tag = d.replaceAll("[^A-Za-z0-9]", "_")
        val dir = new java.io.File(sys.props("java.io.tmpdir"),
          s"graft_vecidx_cmp/$tag/${graft.Sessions.sessionTag(s)}").getAbsolutePath
        val marker = s"graft_vecidxc_marker_$tag"
        if (!s.catalog.tableExists(marker)) {
          val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
          graft.llm.VectorIndex.buildWith(s, dir,
            emb.where(col("vec_id") % 2 === 0), pinnedCentroids(s, d))
          graft.llm.VectorIndex.add(s, dir, emb.where(col("vec_id") % 2 =!= 0))
          graft.llm.VectorIndex.remove(s, dir,
            emb.where(col("vec_id") % 10 === 1 || col("vec_id") % 10 === 6)
              .select("vec_id"))
          graft.llm.VectorIndex.add(s, dir, emb.where(col("vec_id") % 10 === 1))
          graft.llm.VectorIndex.compact(s, dir)
          graft.llm.VectorIndex.remove(s, dir,
            emb.where(col("vec_id") % 10 === 3).select("vec_id"))
          s.emptyDataFrame.createOrReplaceTempView(marker)
        }
        graft.llm.VectorIndex.search(s, dir,
          ivfQueries(s, d).where(col("qid") % 10 =!= 6 && col("qid") % 10 =!= 3),
          k = 3, nprobe = 2)
      },
      Some(ivfIndexSql("AND vec_id % 10 <> 6 AND vec_id % 10 <> 3"))),

    // Vector plumbing sanity: dimension + L2 norm per vector.
    Q("v3_vector_norms",
      (s, d) => Tables.embeddings(s, d)
        .select(col("vec_id"), col("label"),
          size(col("embedding")).cast("int").as("dim"),
          sqrt(dot(col("embedding"), col("embedding"))).as("l2_norm"))
        .orderBy("vec_id"),
      Some(s"""SELECT vec_id, label, CAST(len(embedding) AS INT) AS dim,
          sqrt(${duckDot("embedding", "embedding")}) AS l2_norm
        FROM embeddings ORDER BY vec_id""")),

    // Embedding-cosine near-dup pairs above a threshold — banded sign-LSH
    // candidate generation (4 bands × 6 hyperplanes over dims 1..24): a
    // candidate pair must collide in ≥1 band, so the pair join is an
    // equi-join on (band, sig) — shuffle-keyed, never a cross join
    // (plan-asserted in PlanShapeSpec) — and exact cosine verifies the
    // candidates. The oracle mirrors the banding, so the compare is exact;
    // the trade vs the brute-force form is LSH recall, the standard
    // near-dup contract at corpus scale.
    Q("v4_embed_near_dup",
      (s, d) => {
        def bandSig(k: Int): Column = (0 until 6).map { j =>
          when(element_at(col("embedding"), k * 6 + j + 1) >= 0, 1 << j).otherwise(0)
        }.reduce(_ + _).cast("int")
        val bands = Tables.embeddingsSpread(s, d)
          .select(col("vec_id"), col("embedding"),
            posexplode(array((0 until 4).map(bandSig): _*)).as(Seq("band", "sig")))
        val a = bands.select(col("vec_id").as("vec_a"), col("embedding").as("ea"),
          col("band"), col("sig"))
        val b = bands.select(col("vec_id").as("vec_b"), col("embedding").as("eb"),
          col("band"), col("sig"))
        a.join(b, Seq("band", "sig")).where(col("vec_a") < col("vec_b"))
          // explode(array(…)) fence: keeps the threshold filter from
          // inlining a second cosine evaluation per candidate pair
          .select(col("vec_a"), col("vec_b"),
            explode(array(cosine(col("ea"), col("eb")))).as("cos_sim"))
          .where(col("cos_sim") > 0.35)
          .distinct()
          .orderBy("vec_a", "vec_b")
      },
      Some {
        val sigSql = (0 until 6).map { j =>
          s"CASE WHEN embedding[k*6 + ${j + 1}] >= 0 THEN ${1 << j} ELSE 0 END"
        }.mkString(" + ")
        s"""WITH bl AS (
            SELECT vec_id, embedding, k AS band, CAST($sigSql AS INT) AS sig
            FROM embeddings, range(0, 4) t(k))
          SELECT DISTINCT vec_a, vec_b, cos_sim FROM (
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
              ${duckCos("a.embedding", "b.embedding")} AS cos_sim
            FROM bl a JOIN bl b
              ON a.band = b.band AND a.sig = b.sig AND a.vec_id < b.vec_id)
          WHERE cos_sim > 0.35 ORDER BY vec_a, vec_b"""
      }),

    // Semantic dedup (SemDeDup, Abbas et al. 2023, arXiv:2303.09540):
    // cluster embeddings by nearest centroid, then inside each cluster
    // drop every vector whose cosine to a LOWER-id cluster-mate reaches
    // the threshold — the keep-one-representative rule, made
    // deterministic by keying on vec_id. Scale shape: the centroid
    // codebook is driver-sized at any corpus size (k grows with N but
    // stays thousands), so assignment is a broadcast + per-vector argmax
    // (narrow map); the prune join is an equi-join on the cluster id —
    // cluster sizes are bounded by construction (N/k), so the per-key
    // pair work is bounded and the join is shuffle-keyed, never a
    // cartesian. The N/k bound is only real if k GROWS WITH THE CORPUS:
    // SemDeDup's own protocol sets k ∝ N (the paper uses 50k clusters
    // on LAION-440M; expect O(√N)..O(N/1e4) in practice) so per-cell
    // pair work stays ~(N/k)² × k ≈ N²/k — with FIXED k the in-cell
    // pair join degenerates quadratically at scale. The 8-vector
    // codebook below is a GATE FIXTURE ONLY, pinned for a deterministic
    // oracle; the production path is graft.queries.KMeans.fit with
    // corpus-proportional k (or graft.llm.VectorIndex's persisted
    // codebook), and SemanticDedupSpec asserts the fixture's cell
    // occupancy stays within the N/k envelope this plan assumes.
    Q("v6_semantic_dedup",
      (s, d) => {
        val e = Tables.embeddingsSpread(s, d)
        val cents = e.where(col("vec_id") < 8)
          .select(col("vec_id").as("cent_id"), col("embedding").as("ce"))
        val scored = e.join(broadcast(cents))
          .select(col("vec_id"), col("embedding"), col("cent_id"),
            cosine(col("embedding"), col("ce")).as("ccos"))
        val byVec = Window.partitionBy("vec_id")
          .orderBy(col("ccos").desc, col("cent_id"))
        val assigned = scored.withColumn("rn", row_number().over(byVec))
          .where(col("rn") === 1)
          .select(col("vec_id"), col("embedding"), col("cent_id").as("cell"))
        val a = assigned.select(col("cell"), col("vec_id").as("va"),
          col("embedding").as("ea"))
        val b = assigned.select(col("cell"), col("vec_id").as("vb"),
          col("embedding").as("eb"))
        val dropped = a.join(b, Seq("cell")).where(col("va") < col("vb"))
          .where(cosine(col("ea"), col("eb")) >= 0.3)
          .select(col("vb").as("vec_id")).distinct()
        assigned.join(dropped, Seq("vec_id"), "left_anti")
          .select(col("vec_id"), col("cell"))
          .orderBy("vec_id")
      },
      Some(s"""WITH cents AS (
            SELECT vec_id AS cent_id, embedding AS ce FROM embeddings WHERE vec_id < 8),
          scored AS (
            SELECT e.vec_id, e.embedding, cent_id, ${duckCos("e.embedding", "ce")} AS ccos
            FROM embeddings e CROSS JOIN cents),
          ranked AS (
            SELECT *, row_number() OVER (PARTITION BY vec_id
                        ORDER BY ccos DESC, cent_id) AS rn FROM scored),
          assigned AS (
            SELECT vec_id, embedding, cent_id AS cell FROM ranked WHERE rn = 1),
          dropped AS (
            SELECT DISTINCT b.vec_id
            FROM assigned a JOIN assigned b
              ON a.cell = b.cell AND a.vec_id < b.vec_id
            WHERE ${duckCos("a.embedding", "b.embedding")} >= 0.3)
        SELECT vec_id, cell FROM assigned
        WHERE vec_id NOT IN (SELECT vec_id FROM dropped)
        ORDER BY vec_id""")),

    // Scalar-quantized two-stage ANN (the int8-SQ retrieval pattern,
    // e.g. FAISS SQ8 / Lucene int8 HNSW): quantize every dimension to
    // an int8 code, generate candidates under the INTEGER dot product
    // (4× smaller vectors, SIMD-friendly integer math, and — here —
    // an EXACT cross-engine gate, since code extraction multiplies by
    // 128 = 2^7, which shifts the float exponent without rounding, and
    // candidate ranking never touches a float), then re-rank the top-10
    // candidates with exact double cosine and keep 3. This is the
    // memory-bound scale lever ANN deployments stack on top of IVF/LSH
    // partition pruning (v2/v5 gate those): at 100 TB of embeddings the
    // scan reads 1 byte/dim instead of 4, and only re-ranked survivors
    // ever load the full-precision vector. Shape: broadcast the query
    // codes, map-side integer scoring, per-query top-k window — the
    // corpus never shuffles.
    Q("v7_sq_knn",
      (s, d) => {
        val codes = expr(
          "transform(embedding, x -> cast(floor(cast(x as double) * 128.0D) as int))")
        val e = Tables.embeddingsSpread(s, d).withColumn("code", codes)
        val q = e.where(col("vec_id") < 20)
          .select(col("vec_id").as("qid"), col("embedding").as("qe"),
            col("code").as("qc"))
        val cand = e.join(broadcast(q), col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id").as("nid"), col("qe"),
            col("embedding").as("ne"),
            expr("aggregate(zip_with(qc, code, (a, b) -> a * b), 0, (acc, v) -> acc + v)")
              .as("dot_q"))
        val w1 = Window.partitionBy("qid").orderBy(col("dot_q").desc, col("nid"))
        val top = cand.withColumn("r", row_number().over(w1)).where(col("r") <= 10)
          .withColumn("cos_sim", cosine(col("qe"), col("ne")))
        val w2 = Window.partitionBy("qid").orderBy(col("cos_sim").desc, col("nid"))
        top.withColumn("rnk", row_number().over(w2).cast("int"))
          .where(col("rnk") <= 3)
          .select("qid", "nid", "rnk", "dot_q", "cos_sim")
          .orderBy("qid", "rnk")
      },
      Some(s"""WITH e AS (
          SELECT vec_id, embedding,
            list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 128.0) AS INT)) AS code
          FROM embeddings),
        q AS (SELECT vec_id AS qid, embedding AS qe, code AS qc
              FROM e WHERE vec_id < 20),
        cand AS (
          SELECT qid, e.vec_id AS nid, qe, e.embedding AS ne,
            CAST(list_sum(list_transform(range(1, len(qc) + 1),
              i -> qc[i] * code[i])) AS INT) AS dot_q
          FROM e JOIN q ON e.vec_id <> q.qid),
        top AS (
          SELECT * FROM (
            SELECT *, row_number() OVER (PARTITION BY qid
                        ORDER BY dot_q DESC, nid) AS r FROM cand)
          WHERE r <= 10),
        rr AS (
          SELECT qid, nid, dot_q, ${duckCos("qe", "ne")} AS cos_sim FROM top)
        SELECT qid, nid, CAST(rnk AS INT) AS rnk, dot_q, cos_sim FROM (
          SELECT *, row_number() OVER (PARTITION BY qid
                      ORDER BY cos_sim DESC, nid) AS rnk FROM rr)
        WHERE rnk <= 3 ORDER BY qid, rnk""")),

    // Product-quantization ADC retrieval (Jégou et al. 2011 — the
    // 100 TB ANN standard FAISS IVF-PQ is built on, one lever beyond
    // v7's scalar quantization): split each 64-dim vector into m=4
    // 16-dim subvectors, encode each against a 16-codeword-per-subspace
    // codebook (here the deterministic fixture: the 16 lowest-id
    // vectors' subvectors — the production path trains per-subspace
    // k-means exactly like v6/KMeans), so a vector compresses 256 B →
    // 4 codes. Queries never decode: ADC precomputes a per-query
    // 4×16 distance TABLE and scores candidates by 4 table lookups —
    // compute per candidate is O(m), independent of dimension. Exact
    // cross-engine gate: every table entry is the same 16-term double
    // fold, the ADC sum is 4 terms in fixed subspace order, and argmin
    // encoding breaks ties on the lower codeword id (min-of-struct here,
    // rank window in the oracle). Scale shape: encoding is a broadcast
    // codebook join whose (vec, subspace) argmin collapses MAP-SIDE
    // (partial min-of-struct aggregate — the exchange carries m rows
    // per vector, no sort window); candidate scoring broadcasts the
    // 10-row query table; and ONLY the ≤10 ADC survivors per query
    // rejoin the full-precision vectors for the exact re-rank — the
    // corpus embedding column is never shuffled.
    Q("v8_pq_adc",
      (s, d) => {
        val e = Tables.embeddingsSpread(s, d)
        val subs = expr("transform(sequence(0, 3), s -> slice(embedding, s * 16 + 1, 16))")
        val parts = e.select(col("vec_id"),
          posexplode(subs).as(Seq("sub", "sv")))
        val cb = parts.where(col("vec_id") < 16)
          .select(col("vec_id").cast("int").as("j"), col("sub"), col("sv").as("cw"))
        val l2 = expr("""aggregate(zip_with(sv, cw,
            (x, y) -> (cast(x as double) - cast(y as double)) *
                      (cast(x as double) - cast(y as double))),
          0d, (acc, v) -> acc + v)""")
        val dists = parts.join(broadcast(cb), Seq("sub"))
          .select(col("vec_id"), col("sub"), col("j"), l2.as("dist"))
        val enc = dists
          .groupBy("vec_id", "sub")
          .agg(min(struct(col("dist"), col("j"))).as("m"))
          .select(col("vec_id"), col("sub"), col("m.j").as("code"))
          .groupBy("vec_id")
          .agg(expr("transform(array_sort(collect_list(struct(sub, code))), x -> x.code)")
            .as("codes"))
        val dtab = dists.where(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), (col("sub") * 16 + col("j")).as("pos"), col("dist"))
          .groupBy("qid")
          .agg(expr("transform(array_sort(collect_list(struct(pos, dist))), x -> x.dist)")
            .as("dt"))
        val adc = enc.join(broadcast(dtab), col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id").as("nid"),
            (element_at(col("dt"), expr("codes[0] + 1")) +
              element_at(col("dt"), expr("codes[1] + 17")) +
              element_at(col("dt"), expr("codes[2] + 33")) +
              element_at(col("dt"), expr("codes[3] + 49"))).as("adc_dist"))
        val w1 = Window.partitionBy("qid").orderBy(col("adc_dist"), col("nid"))
        val top = adc.withColumn("r", row_number().over(w1)).where(col("r") <= 10)
        val rr = top
          .join(e.select(col("vec_id").as("nid"), col("embedding").as("ne")), Seq("nid"))
          .join(broadcast(e.where(col("vec_id") < 10)
            .select(col("vec_id").as("qid"), col("embedding").as("qe"))), Seq("qid"))
          .select(col("qid"), col("nid"), col("adc_dist"),
            cosine(col("qe"), col("ne")).as("cos_sim"))
        val w2 = Window.partitionBy("qid").orderBy(col("cos_sim").desc, col("nid"))
        rr.withColumn("rnk", row_number().over(w2).cast("int"))
          .where(col("rnk") <= 3)
          .select("qid", "nid", "rnk", "adc_dist", "cos_sim")
          .orderBy("qid", "rnk")
      },
      Some(s"""WITH sub AS (
          SELECT vec_id, s AS sub, embedding[s*16+1 : s*16+16] AS sv
          FROM embeddings, range(0, 4) t(s)),
        cb AS (SELECT vec_id AS j, sub, sv AS cw FROM sub WHERE vec_id < 16),
        dist AS (
          SELECT p.vec_id, p.sub, c.j,
            list_sum(list_transform(range(1, 17),
              i -> (p.sv[i]::DOUBLE - c.cw[i]::DOUBLE) *
                   (p.sv[i]::DOUBLE - c.cw[i]::DOUBLE))) AS dist
          FROM sub p JOIN cb c ON p.sub = c.sub),
        enc1 AS (
          SELECT vec_id, sub, j AS code FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id, sub
                        ORDER BY dist, j) AS rn FROM dist)
          WHERE rn = 1),
        enc AS (SELECT vec_id, list(code ORDER BY sub) AS codes
                FROM enc1 GROUP BY vec_id),
        dtab AS (SELECT vec_id AS qid, list(dist ORDER BY sub, j) AS dt
                 FROM dist WHERE vec_id < 10 GROUP BY vec_id),
        adc AS (
          SELECT qid, e.vec_id AS nid,
            dt[codes[1] + 1] + dt[codes[2] + 17] +
            dt[codes[3] + 33] + dt[codes[4] + 49] AS adc_dist
          FROM enc e, dtab WHERE e.vec_id <> qid),
        top AS (
          SELECT * FROM (
            SELECT *, row_number() OVER (PARTITION BY qid
                        ORDER BY adc_dist, nid) AS r FROM adc)
          WHERE r <= 10),
        rr AS (
          SELECT qid, nid, adc_dist,
            ${duckCos("qe.embedding", "ne.embedding")} AS cos_sim
          FROM top JOIN embeddings ne ON top.nid = ne.vec_id
                   JOIN embeddings qe ON top.qid = qe.vec_id)
        SELECT qid, nid, CAST(rnk AS INT) AS rnk, adc_dist, cos_sim FROM (
          SELECT *, row_number() OVER (PARTITION BY qid
                      ORDER BY cos_sim DESC, nid) AS rnk FROM rr)
        WHERE rnk <= 3 ORDER BY qid, rnk""")),

    // IVF-PQ — v5's coarse quantizer COMPOSED with v8's product codes:
    // the actual FAISS-default 100 TB ANN configuration (Jégou et al.
    // 2011), where IVF bounds WHICH candidates are scored (only the
    // nprobe probed cells — the corpus never self-joins) and PQ bounds
    // WHAT scoring costs (4 table lookups per candidate, independent of
    // dimension; vectors live as 4-byte codes, 64× smaller than the
    // raw embedding). Both levers are load-bearing at scale and both
    // oracles already exist separately (v5, v8) — this gate pins their
    // COMPOSITION: candidates come from the probed-cell join, distances
    // from the ADC tables, and only the ≤10 ADC survivors per query
    // rejoin full-precision embeddings for the exact cosine re-rank.
    // Same exactness posture as v8: fixed-order 16-term folds, 4-term
    // ADC sums in subspace order, argmin/rank ties on the lower id.
    Q("v10_ivf_pq",
      (s, d) => ivfPqSearch(Tables.embeddingsSpread(s, d),
        col("vec_id") < 50, k = 3, adcKeep = 10, nprobe = 2),
      Some(s"""WITH cents AS (
          SELECT vec_id AS cent_id, embedding AS ce FROM embeddings WHERE vec_id < 16),
        cscored AS (
          SELECT e.vec_id, cent_id, ${duckCos("e.embedding", "ce")} AS ccos
          FROM embeddings e CROSS JOIN cents),
        cranked AS (
          SELECT *, row_number() OVER (PARTITION BY vec_id
                      ORDER BY ccos DESC, cent_id) AS rn FROM cscored),
        assigned AS (SELECT vec_id, cent_id AS cell FROM cranked WHERE rn = 1),
        probes AS (SELECT vec_id AS qid, cent_id AS cell
                   FROM cranked WHERE vec_id < 50 AND rn <= 2),
        sub AS (
          SELECT vec_id, s AS sub, embedding[s*16+1 : s*16+16] AS sv
          FROM embeddings, range(0, 4) t(s)),
        cb AS (SELECT vec_id AS j, sub, sv AS cw FROM sub WHERE vec_id < 16),
        dist AS (
          SELECT p.vec_id, p.sub, c.j,
            list_sum(list_transform(range(1, 17),
              i -> (p.sv[i]::DOUBLE - c.cw[i]::DOUBLE) *
                   (p.sv[i]::DOUBLE - c.cw[i]::DOUBLE))) AS dist
          FROM sub p JOIN cb c ON p.sub = c.sub),
        enc1 AS (
          SELECT vec_id, sub, j AS code FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id, sub
                        ORDER BY dist, j) AS rn FROM dist)
          WHERE rn = 1),
        enc AS (SELECT vec_id, list(code ORDER BY sub) AS codes
                FROM enc1 GROUP BY vec_id),
        dtab AS (SELECT vec_id AS qid, list(dist ORDER BY sub, j) AS dt
                 FROM dist WHERE vec_id < 50 GROUP BY vec_id),
        cand AS (
          SELECT qid, a.vec_id AS nid
          FROM probes p JOIN assigned a ON p.cell = a.cell AND a.vec_id <> p.qid),
        adc AS (
          SELECT qid, nid,
            dt[codes[1] + 1] + dt[codes[2] + 17] +
            dt[codes[3] + 33] + dt[codes[4] + 49] AS adc_dist
          FROM cand JOIN enc e ON cand.nid = e.vec_id
                    JOIN dtab USING (qid)),
        top AS (
          SELECT * FROM (
            SELECT *, row_number() OVER (PARTITION BY qid
                        ORDER BY adc_dist, nid) AS r FROM adc)
          WHERE r <= 10),
        rr AS (
          SELECT qid, nid, adc_dist,
            ${duckCos("qe.embedding", "ne.embedding")} AS cos_sim
          FROM top JOIN embeddings ne ON top.nid = ne.vec_id
                   JOIN embeddings qe ON top.qid = qe.vec_id)
        SELECT qid, nid, CAST(rnk AS INT) AS rnk, adc_dist, cos_sim FROM (
          SELECT *, row_number() OVER (PARTITION BY qid
                      ORDER BY cos_sim DESC, nid) AS rnk FROM rr)
        WHERE rnk <= 3 ORDER BY qid, rnk""")),

    // Semantic decontamination — the EMBEDDING-space twin of d8/d14's
    // n-gram eval-set scrub (paraphrased leakage shares no 13-gram; it
    // does share a neighborhood in embedding space). For every corpus
    // vector, its best eval-set match at cosine ≥ 0.3, joined back to
    // the documents table for the per-source contamination report the
    // pipeline acts on. Scale shape: the eval set is broadcast (eval
    // sets are small — that asymmetry is the whole design), the corpus
    // is scanned ONCE with a map-side fused-cosine score, and the
    // per-vector argmax is a partial-aggregating max-of-struct (ties to
    // the lower eval id via the negated field), so nothing corpus-sized
    // ever shuffles: the exchange carries only the ≥-threshold hits.
    Q("d18_semantic_decontaminate",
      (s, d) => {
        val e = Tables.embeddingsSpread(s, d)
        val eval = e.where(col("vec_id") < 20)
          .select(col("vec_id").as("eval_id"), col("embedding").as("ee"))
        val hits = e.where(col("vec_id") >= 20).join(broadcast(eval))
          .select(col("vec_id"),
            col("eval_id"), cosine(col("embedding"), col("ee")).as("cos_sim"))
          .where(col("cos_sim") >= 0.3)
        val best = hits
          .groupBy("vec_id")
          .agg(max(struct(col("cos_sim"), (lit(0L) - col("eval_id")).as("neg"))).as("m"))
          .select(col("vec_id"), (lit(0L) - col("m.neg")).as("eval_id"),
            col("m.cos_sim").as("cos_sim"))
        best
          .join(Tables.documentsSpread(s, d).select(col("doc_id").as("vec_id"),
            col("source")), Seq("vec_id"))
          .select("vec_id", "source", "eval_id", "cos_sim")
          .orderBy("vec_id")
      },
      Some(s"""WITH eval AS (
          SELECT vec_id AS eval_id, embedding AS ee FROM embeddings WHERE vec_id < 20),
        pairs AS (
          SELECT e.vec_id, eval_id, ${duckCos("e.embedding", "ee")} AS cos_sim
          FROM embeddings e CROSS JOIN eval WHERE e.vec_id >= 20),
        hits AS (SELECT * FROM pairs WHERE cos_sim >= 0.3)
        SELECT h.vec_id, d.source, eval_id, cos_sim FROM (
          SELECT *, row_number() OVER (PARTITION BY vec_id
                      ORDER BY cos_sim DESC, eval_id) AS rn
          FROM hits) h JOIN documents d ON d.doc_id = h.vec_id
        WHERE rn = 1 ORDER BY vec_id""")),

    // v9 — kNN-JOIN (the full neighbor graph): every vector gets its
    // top-3 cosine neighbors, not just a query set. v1-v8 answer
    // queries; the kNN graph is the INPUT to graph-based curation
    // (SemDeDup cells, d16's rank flow, cluster pruning). Candidate
    // generation is the v2 sign-LSH bucket SELF-join — work is
    // Σ bucket², bounded by the 64-signature fanout, never corpus² —
    // and the per-vector top-3 is one partitioned window over
    // candidates. At 100 TB: more hyperplanes → smaller buckets; the
    // shuffle stays keyed on the signature.
    Q("v9_knn_graph",
      (s, d) => {
        val e = Tables.embeddings(s, d).withColumn("sig", sigCol)
        val b = e.select(col("sig"), col("vec_id").as("nid"),
          col("embedding").as("ne"))
        val cand = e.join(b, Seq("sig")).where(col("vec_id") =!= col("nid"))
          .select(col("vec_id"), col("nid"),
            cosine(col("embedding"), col("ne")).as("cos_sim"))
        val w = Window.partitionBy("vec_id")
          .orderBy(col("cos_sim").desc, col("nid"))
        cand.withColumn("rnk", row_number().over(w).cast("int"))
          .where(col("rnk") <= 3)
          .select("vec_id", "nid", "rnk", "cos_sim")
          .orderBy("vec_id", "rnk")
      },
      Some(knnGraphSql)),

    // The SAME graph served from the STORED index
    // (graft.llm.KnnGraphIndex): the gate builds the index inside a
    // session-unique tmp dir by feeding the corpus in TWO batches — so
    // what's oracle-gated here is the incremental merge path end-to-end
    // (new-vector finalization + displaced-list rewrite + ledger
    // discipline), against the ONE-SHOT flat SQL v9 uses. Memoized per
    // session via a temp-view marker (q47's discipline: an on-disk
    // marker would serve stale graphs after a testdata regen; a shared
    // path would let two sessions race). Steady-state cost is the
    // parquet read + latest-generation resolve — the consumer-side
    // economics that justify storing the graph at all.
    Q("v9b_knn_graph_index",
      (s, d) => {
        val tag = d.replaceAll("[^A-Za-z0-9]", "_")
        val dir = new java.io.File(sys.props("java.io.tmpdir"),
          s"graft_knngraph/$tag/${graft.Sessions.sessionTag(s)}").getAbsolutePath
        val marker = s"graft_knng_marker_$tag"
        if (!s.catalog.tableExists(marker)) {
          val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
          graft.llm.KnnGraphIndex.add(s, dir, emb.where(col("vec_id") % 2 === 0), 3)
          graft.llm.KnnGraphIndex.add(s, dir, emb.where(col("vec_id") % 2 =!= 0), 3)
          s.emptyDataFrame.createOrReplaceTempView(marker)
        }
        graft.llm.KnnGraphIndex.neighbors(s, dir)
          .orderBy("vec_id", "rnk")
      },
      Some(knnGraphSql)),

    // The tombstone path of the SAME stored index: the gate replays the
    // full lifecycle a production corpus hits — add in two batches,
    // REMOVE two id slices (takedown), re-ADD one of them (recall
    // reversed) — and serves the resulting graph. The oracle is the
    // one-shot flat SQL over exactly the SURVIVING ids, so three things
    // are pinned at once: removed ids vanish as nodes and neighbors,
    // every affected list is re-ranked over its remaining live
    // bucket-mates (promotions included — the part a lazy nid-filter
    // would get wrong), and a re-add after a removal is a fresh
    // membership that lands bit-for-bit on the never-removed build.
    // Same session-memoized tmp-dir discipline as v9b.
    Q("v9c_knn_graph_tombstone",
      (s, d) => {
        val tag = d.replaceAll("[^A-Za-z0-9]", "_")
        val dir = new java.io.File(sys.props("java.io.tmpdir"),
          s"graft_knngraph_tomb/$tag/${graft.Sessions.sessionTag(s)}").getAbsolutePath
        val marker = s"graft_knngt_marker_$tag"
        if (!s.catalog.tableExists(marker)) {
          val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
          graft.llm.KnnGraphIndex.add(s, dir, emb.where(col("vec_id") % 2 === 0), 3)
          graft.llm.KnnGraphIndex.add(s, dir, emb.where(col("vec_id") % 2 =!= 0), 3)
          graft.llm.KnnGraphIndex.remove(s, dir,
            emb.where(col("vec_id") % 10 === 1 || col("vec_id") % 10 === 6)
              .select("vec_id"), 3)
          graft.llm.KnnGraphIndex.add(s, dir, emb.where(col("vec_id") % 10 === 1), 3)
          s.emptyDataFrame.createOrReplaceTempView(marker)
        }
        graft.llm.KnnGraphIndex.neighbors(s, dir)
          .orderBy("vec_id", "rnk")
      },
      Some(knnGraphSqlOver("WHERE vec_id % 10 <> 6"))),

    // Graph-descent ANN SERVE over the stored kNN graph — the
    // HNSW-shaped alternative to IVF probing (VERDICT r10 #9): queries
    // start at the deterministic entry point and walk the stored
    // adjacency lists, beam-limited, exact-cosine-scored, for a fixed
    // hop budget. Batch-synchronous beam (whole frontier per hop, fixed
    // hops) instead of the classical priority queue, so the oracle can
    // enumerate the exact same traversal as unrolled flat SQL over the
    // v9-form graph. Per-query work is O(beam × degree × hops) — the
    // per-hop adjacency read prunes to the frontier ids (pushed
    // IN-list, asserted by KnnGraphIndexSpec). Same two-batch build +
    // session-memoized dir as v9b.
    Q("v11_knn_beam",
      (s, d) => {
        val tag = d.replaceAll("[^A-Za-z0-9]", "_")
        val dir = new java.io.File(sys.props("java.io.tmpdir"),
          s"graft_knngraph/$tag/${graft.Sessions.sessionTag(s)}").getAbsolutePath
        val marker = s"graft_knng_marker_$tag"
        if (!s.catalog.tableExists(marker)) {
          val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
          graft.llm.KnnGraphIndex.add(s, dir, emb.where(col("vec_id") % 2 === 0), 3)
          graft.llm.KnnGraphIndex.add(s, dir, emb.where(col("vec_id") % 2 =!= 0), 3)
          s.emptyDataFrame.createOrReplaceTempView(marker)
        }
        // entry = nearest pinned centroid per query (the v5 16-row
        // codebook; centroids are corpus vectors, hence graph nodes) —
        // the HNSW upper-layer routing that keeps hop budget
        // independent of graph diameter (VERDICT r11 #4)
        graft.llm.KnnGraphIndex.beamSearch(s, dir,
          Tables.embeddings(s, d).where(col("vec_id") < 10)
            .select(col("vec_id").as("qid"), col("embedding").as("qe")),
          k = 5, beam = 4, hops = 3,
          centroids = Some(Tables.embeddings(s, d).where(col("vec_id") < 16)
            .select(col("vec_id").as("cent_id"), col("embedding").as("ce"))))
      },
      Some(beamSql(k = 5, beam = 4, hops = 3))),

    // FILTERED ANN — the metadata-predicate vector search every
    // production vector store serves ("nearest eligible neighbors", here
    // label % 3 = 1): the predicate applies to the CANDIDATE corpus
    // BEFORE any scoring (pre-filtering — post-filtering an unfiltered
    // top-k silently loses recall whenever fewer than k of the true
    // neighbors are eligible, the classic filtered-search bug), while
    // queries stay unfiltered (any caller may search the eligible
    // slice). Same IVF discipline as v5 (pinned 16-cell codebook,
    // cosine probe ranking to match cosine assignment). Scale shape:
    // the row-wise predicate composes with the scan (pushed filter —
    // with the stored index it rides the cell-pruned read), assignment
    // stays the zero-shuffle broadcast map over ONLY eligible rows, and
    // per-query work is still Σ probed-cell sizes, now smaller by the
    // predicate's selectivity.
    Q("v12_ann_filtered",
      (s, d) => {
        val e = Tables.embeddingsSpread(s, d)
        val cents = e.where(col("vec_id") < 16)
          .select(col("vec_id").as("cent_id"), col("embedding").as("ce"))
        val byCent = Window.partitionBy("vec_id")
          .orderBy(col("ccos").desc, col("cent_id"))
        val assigned = e.where(col("label") % 3 === 1)
          .join(broadcast(cents))
          .select(col("vec_id"), col("embedding"), col("cent_id"),
            cosine(col("embedding"), col("ce")).as("ccos"))
          .withColumn("rn", row_number().over(byCent))
          .where(col("rn") === 1)
          .select(col("vec_id"), col("embedding"), col("cent_id").as("cell"))
        val probes = e.where(col("vec_id") < 30)
          .join(broadcast(cents))
          .select(col("vec_id"), col("embedding"), col("cent_id"),
            cosine(col("embedding"), col("ce")).as("ccos"))
          .withColumn("rn", row_number().over(byCent)).where(col("rn") <= 3)
          .select(col("vec_id").as("qid"), col("embedding").as("qe"),
            col("cent_id").as("cell"))
        val cand = probes.join(assigned, Seq("cell"))
          .where(col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id").as("nid"),
            cosine(col("qe"), col("embedding")).as("cos_sim"))
        val byQ = Window.partitionBy("qid").orderBy(col("cos_sim").desc, col("nid"))
        cand.withColumn("rnk", row_number().over(byQ).cast("int"))
          .where(col("rnk") <= 5)
          .select("qid", "nid", "rnk", "cos_sim")
          .orderBy("qid", "rnk")
      },
      Some(s"""WITH cents AS (
            SELECT vec_id AS cent_id, embedding AS ce FROM embeddings WHERE vec_id < 16),
          escored AS (
            SELECT e.vec_id, e.embedding, cent_id, ${duckCos("e.embedding", "ce")} AS ccos
            FROM embeddings e CROSS JOIN cents WHERE e.label % 3 = 1),
          eranked AS (
            SELECT *, row_number() OVER (PARTITION BY vec_id
                        ORDER BY ccos DESC, cent_id) AS rn FROM escored),
          assigned AS (
            SELECT vec_id, embedding, cent_id AS cell FROM eranked WHERE rn = 1),
          qscored AS (
            SELECT e.vec_id, e.embedding, cent_id, ${duckCos("e.embedding", "ce")} AS ccos
            FROM embeddings e CROSS JOIN cents WHERE e.vec_id < 30),
          qranked AS (
            SELECT *, row_number() OVER (PARTITION BY vec_id
                        ORDER BY ccos DESC, cent_id) AS rn FROM qscored),
          probes AS (
            SELECT vec_id AS qid, embedding AS qe, cent_id AS cell
            FROM qranked WHERE rn <= 3),
          cand AS (
            SELECT qid, a.vec_id AS nid, ${duckCos("qe", "a.embedding")} AS cos_sim
            FROM probes p JOIN assigned a ON p.cell = a.cell AND a.vec_id <> p.qid)
        SELECT qid, nid, CAST(rnk AS INT) AS rnk, cos_sim FROM (
          SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cos_sim DESC, nid) AS rnk
          FROM cand)
        WHERE rnk <= 5 ORDER BY qid, rnk""")),

    // v12's filtered search served from the STORED index — the
    // allow-list form of the graft.llm.VectorIndex service: build the
    // v5b lifecycle (pinned codebook, two add() halves), then search
    // with `eligible` = the label slice's ids, a left-semi join the
    // service applies to the inverted-list scan BEFORE scoring, inside
    // the cell-pruned read. Queries stay unfiltered; probe ranking is
    // squared L2 (the assignment metric — the stored-index discipline
    // v5b pins), so this gate and v12 (cosine-probed batch form) are
    // different operators sharing the pre-filter semantics. The oracle
    // flattens the whole thing: pinned codebook, L2 assignment,
    // label-filtered membership, L2-probed cells, cosine top-5.
    Q("v12b_ann_filtered_index",
      (s, d) => {
        val tag = d.replaceAll("[^A-Za-z0-9]", "_")
        val dir = new java.io.File(sys.props("java.io.tmpdir"),
          s"graft_vecidx_flt/$tag/${graft.Sessions.sessionTag(s)}").getAbsolutePath
        val marker = s"graft_vecidxf_marker_$tag"
        if (!s.catalog.tableExists(marker)) {
          val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
          graft.llm.VectorIndex.buildWith(s, dir,
            emb.where(col("vec_id") % 2 === 0), pinnedCentroids(s, d))
          graft.llm.VectorIndex.add(s, dir, emb.where(col("vec_id") % 2 =!= 0))
          s.emptyDataFrame.createOrReplaceTempView(marker)
        }
        val eligible = Tables.embeddings(s, d)
          .where(col("label") % 3 === 1).select("vec_id")
        graft.llm.VectorIndex.search(s, dir,
          Tables.embeddings(s, d).where(col("vec_id") < 30)
            .select(col("vec_id").as("qid"), col("embedding").as("qe")),
          k = 5, nprobe = 3, eligible = Some(eligible))
      },
      Some(s"""WITH cents AS (
            SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cent_id,
              embedding AS ce
            FROM embeddings WHERE vec_id < 16),
          scored AS (
            SELECT e.vec_id, e.embedding, e.label, cent_id,
              ${duckSqL2("ce", "e.embedding")} AS dist
            FROM embeddings e CROSS JOIN cents),
          ranked AS (
            SELECT *, row_number() OVER (PARTITION BY vec_id
                        ORDER BY dist, cent_id) AS rn FROM scored),
          assigned AS (
            SELECT vec_id, embedding, cent_id AS cell FROM ranked
            WHERE rn = 1 AND label % 3 = 1),
          probes AS (
            SELECT vec_id AS qid, embedding AS qe, cent_id AS cell FROM ranked
            WHERE vec_id < 30 AND rn <= 3),
          cand AS (
            SELECT qid, a.vec_id AS nid, ${duckCos("qe", "a.embedding")} AS cos_sim
            FROM probes p JOIN assigned a ON p.cell = a.cell AND a.vec_id <> p.qid)
        SELECT qid, nid, CAST(rnk AS INT) AS rnk, cos_sim FROM (
          SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cos_sim DESC, nid) AS rnk
          FROM cand)
        WHERE rnk <= 5 ORDER BY qid, rnk""")),

    // MMR diversified rerank (Carbonell & Goldstein 1998) — the
    // serve-edge diversity pass a retrieval stack runs on its top-k:
    // greedily pick argmax λ·sim(q,d) − (1−λ)·max_{s∈S} sim(d,s),
    // λ = 0.7, 10 picks from the cosine top-25. The greedy loop is
    // inherently sequential over ≤ pool candidates, so it runs at the
    // SAME k-bounded driver boundary the API edge and pinnedCentroids
    // use: the corpus is touched exactly once (the distributed
    // TakeOrdered producing the pool — the only scale-sized work), the
    // driver receives 25 rows × 64 floats, and every pairwise sim is
    // the identical sequential fold duckCos defines, so scores
    // hash-match with no tolerance. Constants are written 0.7/0.3
    // literally on BOTH sides — deriving 1−λ in floating point yields
    // 0.30000000000000004 and breaks the hash.
    Q("v13_mmr_rerank",
      (s, d) => {
        val e = Tables.embeddingsSpread(s, d)
        val q0 = e.where(col("vec_id") === 0).select(col("embedding").as("qe"))
        val pool = e.where(col("vec_id") =!= 0)
          .crossJoin(broadcast(q0))
          .select(col("vec_id").as("nid"), col("embedding"),
            cosine(col("qe"), col("embedding")).as("simq"))
          .orderBy(col("simq").desc, col("nid")).limit(25)
          .collect()
          .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getDouble(2)))
        def dot(a: Array[Float], b: Array[Float]): Double = {
          var acc = 0.0; var i = 0
          while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
          acc
        }
        def cos(a: Array[Float], b: Array[Float]): Double =
          dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
        val sel = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Double)]
        val selEmb = scala.collection.mutable.ArrayBuffer.empty[Array[Float]]
        var remaining = pool.toBuffer
        for (step <- 1 to 10) {
          val scored = remaining.map { case c @ (_, emb, simq) =>
            val maxSim = if (selEmb.isEmpty) 0.0
              else selEmb.map(se => cos(emb, se)).max
            (c, 0.7 * simq - 0.3 * maxSim)
          }
          val ((nid, emb, _), score) =
            scored.minBy { case ((n, _, _), sc) => (-sc, n) }
          sel += ((nid, step, score)); selEmb += emb
          remaining = remaining.filterNot(_._1 == nid)
        }
        import s.implicits._
        sel.toSeq.toDF("nid", "rnk", "mmr_score").orderBy("rnk")
      },
      Some(mmrSql(k = 10, pool = 25))),

    // Binary-quantized two-stage ANN (the 1-bit BQ retrieval pattern —
    // modern vector stores' memory floor, 32× smaller than float32):
    // threshold every dimension at its CORPUS MEAN to one bit, pack the
    // 64 bits into ONE long, generate candidates under Hamming distance
    // (bit_count(xor) — one codegen'd instruction pair per candidate),
    // then re-rank the top-20 with exact double cosine and keep 3.
    // Integer-exactness chain: codes are floor(x·128) ints (exact —
    // ×2^7 shifts the float exponent, the v7 posture); the per-dim
    // threshold compare is icode[d]·N > Σ_corpus icode[d] (both sides
    // exact bigints — the m4 trick, so no float mean and no rounding
    // mode can drift the bits cross-engine); candidate ranking never
    // touches a float. The per-dim sums are ONE 64-row aggregate
    // broadcast back (the bounded-frame posture) — at 100 TB that is a
    // map-side partial agg + a 520-byte broadcast, and the scan reads
    // 8 bytes/vector instead of 256: the corpus never shuffles, only
    // re-ranked survivors load the full-precision vector.
    Q("v14_binary_quant",
      (s, d) => {
        val e = Tables.embeddingsSpread(s, d).select(col("vec_id"), col("embedding"),
          expr("transform(embedding, x -> cast(floor(cast(x as double) * 128.0D) as bigint))")
            .as("icode"))
        val stats = e.select(posexplode(col("icode")).as(Seq("dim", "c")))
          .groupBy("dim").agg(sum("c").as("t"), count(lit(1)).as("n"))
          .agg(expr("transform(array_sort(collect_list(struct(dim, t))), p -> p.t)").as("T"),
            max("n").as("N"))
        val coded = e.crossJoin(broadcast(stats))
          .withColumn("word", expr(
            """aggregate(sequence(0, 63), cast(0 as bigint),
                 (acc, b) -> acc + IF(element_at(icode, b + 1) * N > element_at(T, b + 1),
                                      shiftleft(cast(1 as bigint), b), cast(0 as bigint)))"""))
          .select("vec_id", "embedding", "word")
        val q = coded.where(col("vec_id") < 20)
          .select(col("vec_id").as("qid"), col("embedding").as("qe"),
            col("word").as("qw"))
        val cand = coded.join(broadcast(q), col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id").as("nid"), col("qe"),
            col("embedding").as("ne"),
            expr("cast(bit_count(word ^ qw) as int)").as("hamming"))
        val w1 = Window.partitionBy("qid").orderBy(col("hamming").asc, col("nid"))
        val top = cand.withColumn("r", row_number().over(w1)).where(col("r") <= 20)
          .withColumn("cos_sim", cosine(col("qe"), col("ne")))
        val w2 = Window.partitionBy("qid").orderBy(col("cos_sim").desc, col("nid"))
        top.withColumn("rnk", row_number().over(w2).cast("int"))
          .where(col("rnk") <= 3)
          .select("qid", "nid", "rnk", "hamming", "cos_sim")
          .orderBy("qid", "rnk")
      },
      Some(s"""WITH e AS (
          SELECT vec_id, embedding,
            list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 128.0) AS BIGINT)) AS icode
          FROM embeddings),
        dims AS (
          SELECT d, SUM(icode[d]) AS t, COUNT(*) AS n
          FROM e, range(1, 65) r(d) GROUP BY d),
        st AS (SELECT array_agg(t ORDER BY d) AS tarr, MAX(n) AS nvec FROM dims),
        b AS (
          SELECT vec_id, embedding,
            list_transform(range(1, 65),
              d -> CASE WHEN icode[d] * nvec > tarr[d] THEN 1 ELSE 0 END) AS bits
          FROM e, st),
        q AS (SELECT vec_id AS qid, embedding AS qe, bits AS qb
              FROM b WHERE vec_id < 20),
        cand AS (
          SELECT qid, b.vec_id AS nid, qe, b.embedding AS ne,
            CAST(list_sum(list_transform(range(1, 65),
              i -> CASE WHEN bits[i] <> qb[i] THEN 1 ELSE 0 END)) AS INT) AS hamming
          FROM b JOIN q ON b.vec_id <> q.qid),
        top AS (
          SELECT * FROM (
            SELECT *, row_number() OVER (PARTITION BY qid
                        ORDER BY hamming ASC, nid) AS r FROM cand)
          WHERE r <= 20),
        rr AS (
          SELECT qid, nid, hamming, ${duckCos("qe", "ne")} AS cos_sim FROM top)
        SELECT qid, nid, CAST(rnk AS INT) AS rnk, hamming, cos_sim FROM (
          SELECT *, row_number() OVER (PARTITION BY qid
                      ORDER BY cos_sim DESC, nid) AS rnk FROM rr)
        WHERE rnk <= 3 ORDER BY qid, rnk""")),

    // The SAME binary-quantized search served from a PERSISTED sidecar
    // over the stored VectorIndex (graft.llm.BqSidecar — v14's serve
    // twin, the v5b/v12b pattern): refresh materializes one packed
    // 64-bit sign word per live vector plus the corpus thresholds under
    // the index dir; serve answers from the words alone (8 bytes/vector
    // scanned instead of 256), reads full vectors only for the rerank
    // survivors, and semi-joins CURRENT live membership so takedowns
    // never wait on a rebuild. Reuses v5b's session-memoized index
    // (same corpus: half built, half appended), so the oracle is v14's
    // flat SQL verbatim — a drift anywhere in the stored words, the
    // threshold statistics, the live filter, or the rerank breaks the
    // hash.
    Q("v14b_bq_index_serve",
      (s, d) => {
        val tag = d.replaceAll("[^A-Za-z0-9]", "_")
        val dir = new java.io.File(sys.props("java.io.tmpdir"),
          s"graft_vecidx/$tag/${graft.Sessions.sessionTag(s)}").getAbsolutePath
        val marker = s"graft_vecidx_marker_$tag"
        if (!s.catalog.tableExists(marker)) {
          val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
          graft.llm.VectorIndex.buildWith(s, dir,
            emb.where(col("vec_id") % 2 === 0), pinnedCentroids(s, d))
          graft.llm.VectorIndex.add(s, dir, emb.where(col("vec_id") % 2 =!= 0))
          s.emptyDataFrame.createOrReplaceTempView(marker)
        }
        // the refresh is session-memoized like the index build: the
        // gate's measured path is SERVE-FROM-STORED-STATE (the c1b
        // materialized-view posture); refresh idempotence and the
        // freshness contract are BqSidecarSpec's job
        val bqMarker = s"graft_bq_marker_$tag"
        if (!s.catalog.tableExists(bqMarker)) {
          graft.llm.BqSidecar.refresh(s, dir)
          s.emptyDataFrame.createOrReplaceTempView(bqMarker)
        }
        val q = Tables.embeddings(s, d).where(col("vec_id") < 20)
          .select(col("vec_id").as("qid"), col("embedding").as("qe"))
        graft.llm.BqSidecar.serve(s, dir, q, k = 3, depth = 20)
          .orderBy("qid", "rnk")
      },
      Some(s"""WITH e AS (
          SELECT vec_id, embedding,
            list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 128.0) AS BIGINT)) AS icode
          FROM embeddings),
        dims AS (
          SELECT d, SUM(icode[d]) AS t, COUNT(*) AS n
          FROM e, range(1, 65) r(d) GROUP BY d),
        st AS (SELECT array_agg(t ORDER BY d) AS tarr, MAX(n) AS nvec FROM dims),
        b AS (
          SELECT vec_id, embedding,
            list_transform(range(1, 65),
              d -> CASE WHEN icode[d] * nvec > tarr[d] THEN 1 ELSE 0 END) AS bits
          FROM e, st),
        q AS (SELECT vec_id AS qid, embedding AS qe, bits AS qb
              FROM b WHERE vec_id < 20),
        cand AS (
          SELECT qid, b.vec_id AS nid, qe, b.embedding AS ne,
            CAST(list_sum(list_transform(range(1, 65),
              i -> CASE WHEN bits[i] <> qb[i] THEN 1 ELSE 0 END)) AS INT) AS hamming
          FROM b JOIN q ON b.vec_id <> q.qid),
        top AS (
          SELECT * FROM (
            SELECT *, row_number() OVER (PARTITION BY qid
                        ORDER BY hamming ASC, nid) AS r FROM cand)
          WHERE r <= 20),
        rr AS (
          SELECT qid, nid, hamming, ${duckCos("qe", "ne")} AS cos_sim FROM top)
        SELECT qid, nid, CAST(rnk AS INT) AS rnk, hamming, cos_sim FROM (
          SELECT *, row_number() OVER (PARTITION BY qid
                      ORDER BY cos_sim DESC, nid) AS rnk FROM rr)
        WHERE rnk <= 3 ORDER BY qid, rnk""")),

    // TRAINED coarse quantizer — the Lloyd loop itself as an oracle
    // gate. v5/v10/v12 pin their centroids so their search gates stay
    // deterministic, and graft.queries.KMeans.fit is the float
    // production trainer (whose double means no cross-engine hash can
    // pin — reduction order moves the low bits). This gate closes the
    // gap between the two: KMeans.fitQGate runs the SAME
    // assign/update loop in exact int64 micro-units (round(x·1e6), the
    // m4/v14 integer posture; floor(sum/n) evaluated with the one
    // IEEE-identical formula both engines share), so the TRAINED
    // codebook hash-matches a DuckDB replay of the identical three
    // rounds. Scale shape per round: assignment is map-side against a
    // k×dim literal (no join), the update is one combiner-state
    // shuffle keyed (cell, pos), and only k×dim longs reach the
    // driver — the KMeans.fit scaladoc contract, now verified
    // end-to-end instead of asserted.
    Q("v15_kmeans_train",
      (s, d) => KMeans.fitQGate(Tables.embeddingsSpread(s, d), k = 8, iters = 3),
      Some {
        def round(r: Int, prev: String): String =
          s"""d$r AS (
            SELECT qe.vid, c.cell, SUM((qe.qx - c.cx) * (qe.qx - c.cx)) AS d2
            FROM qe JOIN $prev c USING (pos) GROUP BY qe.vid, c.cell),
          a$r AS (
            SELECT vid, cell FROM (
              SELECT vid, cell,
                row_number() OVER (PARTITION BY vid ORDER BY d2, cell) AS rn
              FROM d$r) WHERE rn = 1),
          m$r AS (
            SELECT a$r.cell, qe.pos,
              CAST(floor(CAST(SUM(qe.qx) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)) AS BIGINT) AS cx
            FROM qe JOIN a$r USING (vid) GROUP BY a$r.cell, qe.pos),
          c$r AS (
            SELECT p.cell, p.pos, coalesce(m$r.cx, p.cx) AS cx
            FROM $prev p LEFT JOIN m$r ON m$r.cell = p.cell AND m$r.pos = p.pos)"""
        s"""WITH q AS (
          SELECT vec_id AS vid,
            list_transform(embedding,
              x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qv
          FROM embeddings),
        qe AS (SELECT vid, unnest(range(1, 65)) AS pos, unnest(qv) AS qx FROM q),
        c0 AS (SELECT vid AS cell, pos, qx AS cx FROM qe WHERE vid < 8),
        ${round(1, "c0")},
        ${round(2, "c1")},
        ${round(3, "c2")},
        df AS (
          SELECT qe.vid, c.cell, SUM((qe.qx - c.cx) * (qe.qx - c.cx)) AS d2
          FROM qe JOIN c3 c USING (pos) GROUP BY qe.vid, c.cell),
        af AS (
          SELECT vid, cell FROM (
            SELECT vid, cell,
              row_number() OVER (PARTITION BY vid ORDER BY d2, cell) AS rn
            FROM df) WHERE rn = 1),
        cnt AS (SELECT cell, CAST(COUNT(*) AS INT) AS n_members FROM af GROUP BY cell)
        SELECT CAST(c3.cell AS INT) AS cell, CAST(c3.pos AS INT) AS pos,
          c3.cx AS cval, coalesce(cnt.n_members, 0) AS n_members
        FROM c3 LEFT JOIN cnt USING (cell)
        ORDER BY cell, pos"""
      })
  )

  /** v13's oracle: the greedy MMR selection unrolled to flat SQL — the
    * cosine top-`pool` candidate CTE, the full candidate×candidate sim
    * matrix, then one CTE per pick: score the unselected by
    * 0.7·simq − 0.3·max-sim-to-selected, take the (score, nid) argmax. */
  private def mmrSql(k: Int, pool: Int): String = {
    val base = s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
      cand AS MATERIALIZED (
        SELECT vec_id AS nid, embedding, ${duckCos("qe", "embedding")} AS simq
        FROM embeddings, q WHERE vec_id <> 0
        ORDER BY simq DESC, nid LIMIT $pool),
      pair AS MATERIALIZED (
        SELECT a.nid AS na, b.nid AS nb,
          ${duckCos("a.embedding", "b.embedding")} AS ps
        FROM cand a JOIN cand b ON a.nid <> b.nid),
      s1 AS MATERIALIZED (
        SELECT nid, 1 AS rnk, 0.7e0 * simq AS mmr_score FROM cand
        ORDER BY simq DESC, nid LIMIT 1)"""
    val steps = (2 to k).map { h =>
      s""",
      s$h AS MATERIALIZED (
        SELECT * FROM s${h - 1}
        UNION ALL
        SELECT nid, $h AS rnk, score AS mmr_score FROM (
          SELECT c.nid,
            0.7e0 * c.simq - 0.3e0 * (
              SELECT MAX(ps) FROM pair
              WHERE na = c.nid AND nb IN (SELECT nid FROM s${h - 1})) AS score
          FROM cand c WHERE c.nid NOT IN (SELECT nid FROM s${h - 1})
          ORDER BY score DESC, c.nid LIMIT 1))"""
    }.mkString
    base + steps + s"""
      SELECT nid, CAST(rnk AS INT) AS rnk, mmr_score FROM s$k ORDER BY rnk"""
  }

  /** v11's oracle: the beam traversal unrolled to flat SQL — the v9
    * graph (top-3 sig-bucket cosine edges), the min-id entry point,
    * then per hop: expand the beam's adjacency, score the newly reached
    * ids exactly, union into the visited set, re-take the beam. */
  private def beamSql(k: Int, beam: Int, hops: Int): String = {
    def beamOf(src: String, name: String): String =
      s"""$name AS (SELECT qid, nid, cos_sim FROM (
            SELECT *, row_number() OVER (PARTITION BY qid
                        ORDER BY cos_sim DESC, nid) AS r FROM $src)
          WHERE r <= $beam)"""
    val base = s"""WITH e AS (
          SELECT vec_id, embedding, CAST($sigSql AS INT) AS sig FROM embeddings),
        gcand AS (
          SELECT a.vec_id, b.vec_id AS nid,
            ${duckCos("a.embedding", "b.embedding")} AS cos_sim
          FROM e a JOIN e b ON a.sig = b.sig AND a.vec_id <> b.vec_id),
        g AS (SELECT vec_id, nid FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id
                        ORDER BY cos_sim DESC, nid) AS rnk FROM gcand)
          WHERE rnk <= 3),
        q AS (SELECT vec_id AS qid, embedding AS qe FROM e WHERE vec_id < 10),
        cents AS (SELECT vec_id AS cent_id, embedding AS ce
          FROM e WHERE vec_id < 16),
        seed AS (
          SELECT qid, cent_id AS nid FROM (
            SELECT q.qid, c.cent_id,
              row_number() OVER (PARTITION BY q.qid
                ORDER BY ${duckCos("qe", "ce")} DESC, cent_id) AS r
            FROM q CROSS JOIN cents c) WHERE r = 1),
        s0 AS (
          SELECT seed.qid, seed.nid, ${duckCos("qe", "n.embedding")} AS cos_sim
          FROM seed JOIN e n ON n.vec_id = seed.nid JOIN q ON q.qid = seed.qid),
        ${beamOf("s0", "b0")}"""
    val hopCtes = (1 to hops).map { h =>
      s""",
        x$h AS (
          SELECT DISTINCT b.qid, g.nid FROM b${h - 1} b
          JOIN g ON b.nid = g.vec_id
          WHERE NOT EXISTS (SELECT 1 FROM s${h - 1} s
                            WHERE s.qid = b.qid AND s.nid = g.nid)),
        sx$h AS (
          SELECT x.qid, x.nid, ${duckCos("qe", "n.embedding")} AS cos_sim
          FROM x$h x JOIN e n ON x.nid = n.vec_id JOIN q ON x.qid = q.qid),
        s$h AS (SELECT * FROM s${h - 1} UNION ALL SELECT * FROM sx$h),
        ${beamOf(s"s$h", s"b$h")}"""
    }.mkString
    base + hopCtes + s"""
        SELECT qid, nid, CAST(rnk AS INT) AS rnk, cos_sim FROM (
          SELECT *, row_number() OVER (PARTITION BY qid
                      ORDER BY cos_sim DESC, nid) AS rnk
          FROM s$hops WHERE nid <> qid)
        WHERE rnk <= $k ORDER BY qid, rnk"""
  }

  /** The v10 IVF-PQ search pipeline, parameterized so the oracle gate
    * (pinned fixture: 50 queries, top-3 from 10 ADC survivors, 2
    * probes) and AnnRecallSpec's 10×-replica recall measurement drive
    * the SAME code. Coarse quantizer and the 4×16 PQ codewords both
    * come from the first 16 vectors (the v5/v8 fixture posture);
    * candidates are probed-cell members only, distances are 4 ADC
    * table lookups, and only the `adcKeep` ADC survivors per query
    * rejoin full-precision embeddings for the exact cosine re-rank.
    * Fixed-order 16-term folds, 4-term ADC sums in subspace order,
    * argmin/rank ties on the lower id — the oracle-matched arithmetic. */
  private[graft] def ivfPqSearch(e: DataFrame, isQuery: Column, k: Int,
      adcKeep: Int, nprobe: Int, pqCb: Option[DataFrame] = None): DataFrame = {
    // coarse quantizer: v5's pinned 16-centroid cosine assignment
    val cents = e.where(col("vec_id") < 16)
      .select(col("vec_id").as("cent_id"), col("embedding").as("ce"))
    // NOT cached (v5's rationale): the probe branch's filter pushes
    // into the scan when uncached, and a cached corpus×16 frame
    // would stay pinned in executor memory for the whole session
    val scored = e.join(broadcast(cents))
      .select(col("vec_id"), col("cent_id"),
        cosine(col("embedding"), col("ce")).as("ccos"))
    val byCent = Window.partitionBy("vec_id")
      .orderBy(col("ccos").desc, col("cent_id"))
    val assigned = scored.withColumn("rn", row_number().over(byCent))
      .where(col("rn") === 1)
      .select(col("vec_id"), col("cent_id").as("cell"))
    val probes = scored.where(isQuery)
      .withColumn("rn", row_number().over(byCent)).where(col("rn") <= nprobe)
      .select(col("vec_id").as("qid"), col("cent_id").as("cell"))
    // product codes: v8's 4×16-codeword encoding + per-query tables
    val subs = expr("transform(sequence(0, 3), s -> slice(embedding, s * 16 + 1, 16))")
    val parts = e.select(col("vec_id"),
      posexplode(subs).as(Seq("sub", "sv")))
    // codebook: the deterministic gate fixture by default; a TRAINED
    // per-subspace codebook ([[pqTrainCodebooks]]) when supplied —
    // same (sub, j, cw) shape, so encode/ADC/rerank are untouched
    val cb = pqCb.getOrElse(parts.where(col("vec_id") < 16)
      .select(col("vec_id").cast("int").as("j"), col("sub"), col("sv").as("cw")))
    val l2 = expr("""aggregate(zip_with(sv, cw,
        (x, y) -> (cast(x as double) - cast(y as double)) *
                  (cast(x as double) - cast(y as double))),
      0d, (acc, v) -> acc + v)""")
    val dists = parts.join(broadcast(cb), Seq("sub"))
      .select(col("vec_id"), col("sub"), col("j"), l2.as("dist"))
    val enc = dists
      .groupBy("vec_id", "sub")
      .agg(min(struct(col("dist"), col("j"))).as("m"))
      .select(col("vec_id"), col("sub"), col("m.j").as("code"))
      .groupBy("vec_id")
      .agg(expr("transform(array_sort(collect_list(struct(sub, code))), x -> x.code)")
        .as("codes"))
    val dtab = dists.where(isQuery)
      .select(col("vec_id").as("qid"), (col("sub") * 16 + col("j")).as("pos"), col("dist"))
      .groupBy("qid")
      .agg(expr("transform(array_sort(collect_list(struct(pos, dist))), x -> x.dist)")
        .as("dt"))
    // the composition: candidates are probed-cell members only (a
    // vector has ONE cell, so a (qid, nid) pair arises at most once
    // per probed cell)
    val cand = probes.join(assigned, Seq("cell"))
      .where(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nid"))
    val adc = cand
      .join(enc.select(col("vec_id").as("nid"), col("codes")), Seq("nid"))
      .join(broadcast(dtab), Seq("qid"))
      .select(col("qid"), col("nid"),
        (element_at(col("dt"), expr("codes[0] + 1")) +
          element_at(col("dt"), expr("codes[1] + 17")) +
          element_at(col("dt"), expr("codes[2] + 33")) +
          element_at(col("dt"), expr("codes[3] + 49"))).as("adc_dist"))
    val w1 = Window.partitionBy("qid").orderBy(col("adc_dist"), col("nid"))
    val top = adc.withColumn("r", row_number().over(w1)).where(col("r") <= adcKeep)
    // ONLY the ADC survivors rejoin full-precision embeddings
    val rr = top
      .join(e.select(col("vec_id").as("nid"), col("embedding").as("ne")), Seq("nid"))
      .join(broadcast(e.where(isQuery)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"))), Seq("qid"))
      .select(col("qid"), col("nid"), col("adc_dist"),
        cosine(col("qe"), col("ne")).as("cos_sim"))
    val w2 = Window.partitionBy("qid").orderBy(col("cos_sim").desc, col("nid"))
    rr.withColumn("rnk", row_number().over(w2).cast("int"))
      .where(col("rnk") <= k)
      .select("qid", "nid", "rnk", "adc_dist", "cos_sim")
      .orderBy("qid", "rnk")
  }

  /** Production PQ TRAINING — the step the v8/v10 gate fixtures stand
    * in for: one k-means codebook per subspace (Jégou et al.'s product
    * quantizer), trained on the corpus's own subvectors with the
    * deterministic farthest-first [[KMeans.fit]] (no RNG — reproducible
    * across runs and engines). Returns the (sub, j, cw) frame
    * [[ivfPqSearch]] accepts: m × k rows, driver-sized at any corpus
    * scale (the codebook is a model parameter, not data).
    * AnnRecallSpec measures the trained codebooks' recall against the
    * fixture's at the 10× replica. */
  private[graft] def pqTrainCodebooks(e: DataFrame, m: Int = 4,
      dSub: Int = 16, k: Int = 16): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    (0 until m).flatMap { sub =>
      val slice = e.select(col("vec_id"),
        expr(s"slice(embedding, ${sub * dSub + 1}, $dSub)").as("embedding"))
      KMeans.fit(slice, k)._1.zipWithIndex.map { case (cw, j) =>
        (sub, j, cw.toSeq)
      }
    }.toDF("sub", "j", "cw")
  }

  /** v5b/v5c's pinned codebook: the first 16 vectors (by id), as
    * doubles, cell id = rank. The DuckDB oracle reconstructs exactly
    * this with a row_number over the same ORDER BY. Shared with h2's
    * stored-trio hybrid serve. */
  private[graft] def pinnedCentroids(s: SparkSession, d: String): Array[Array[Double]] =
    Tables.embeddings(s, d).where(col("vec_id") < 16)
      .orderBy("vec_id").select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)

  /** v5b/v5c's query set: the sub-50 ids as (qid, qe). */
  private def ivfQueries(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d).where(col("vec_id") < 50)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))

  /** DuckDB mirror of KMeans' squared-L2 fold (list_sum is the same
    * sequential double fold duckDot relies on, so cell ranking is
    * bit-identical cross-engine). */
  private[graft] def duckSqL2(a: String, b: String): String =
    s"list_sum(list_transform(range(1, len($a)+1), " +
      s"i -> ($a[i]::DOUBLE - $b[i]::DOUBLE) * ($a[i]::DOUBLE - $b[i]::DOUBLE)))"

  /** v5b / v5c's shared oracle — the stored-index IVF search flattened
    * to one-shot SQL: pinned codebook (first 16 ids, cell = rank),
    * every corpus vector assigned to its squared-L2-nearest cell
    * (first-min tie-break = lowest cell, matching array_position),
    * sub-50 queries probe their 2 nearest cells under the SAME metric,
    * cosine top-3 per query. `whereClause` restricts CORPUS membership
    * (v5c's survivors); the codebook stays pinned on the full table —
    * centroids are parameters, not members. */
  private def ivfIndexSql(whereClause: String): String =
    s"""WITH cents AS (
        SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cent_id,
          embedding AS ce
        FROM embeddings WHERE vec_id < 16),
      scored AS (
        SELECT e.vec_id, e.embedding, cent_id,
          ${duckSqL2("ce", "e.embedding")} AS dist
        FROM embeddings e CROSS JOIN cents),
      ranked AS (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                    ORDER BY dist, cent_id) AS rn FROM scored),
      assigned AS (
        SELECT vec_id, embedding, cent_id AS cell FROM ranked
        WHERE rn = 1 $whereClause),
      probes AS (
        SELECT vec_id AS qid, embedding AS qe, cent_id AS cell FROM ranked
        WHERE vec_id < 50 AND rn <= 2 $whereClause),
      cand AS (
        SELECT qid, a.vec_id AS nid, ${duckCos("qe", "a.embedding")} AS cos_sim
        FROM probes p JOIN assigned a ON p.cell = a.cell AND a.vec_id <> p.qid)
      SELECT qid, nid, CAST(rnk AS INT) AS rnk, cos_sim FROM (
        SELECT *, row_number() OVER (PARTITION BY qid
                    ORDER BY cos_sim DESC, nid) AS rnk FROM cand)
      WHERE rnk <= 3 ORDER BY qid, rnk"""

  /** v9 / v9b's shared oracle — the flat one-shot kNN-join SQL. Both
    * gates must produce THIS, whether computed per-query (v9) or served
    * from the incrementally-built index (v9b); v9c uses the same SQL
    * restricted to its post-removal surviving ids. */
  private def knnGraphSql: String = knnGraphSqlOver("")

  private def knnGraphSqlOver(whereClause: String): String =
    s"""WITH e AS (SELECT vec_id, embedding, CAST($sigSql AS INT) AS sig FROM embeddings $whereClause),
      cand AS (
        SELECT a.vec_id, b.vec_id AS nid,
          ${duckCos("a.embedding", "b.embedding")} AS cos_sim
        FROM e a JOIN e b ON a.sig = b.sig AND a.vec_id <> b.vec_id)
      SELECT vec_id, nid, CAST(rnk AS INT) AS rnk, cos_sim FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cos_sim DESC, nid) AS rnk
        FROM cand)
      WHERE rnk <= 3 ORDER BY vec_id, rnk"""

  /** Production SemDeDup (the scale path v6's gate fixture stands in
    * for): learn a corpus-proportional k-means codebook
    * ([[KMeans.fit]] — SemDeDup's own clustering step, L2 on the
    * embeddings), assign every vector to its nearest centroid with a
    * ZERO-SHUFFLE map (the k × dim codebook is a plan literal), then
    * keep, per cell, only vectors with no lower-id cell-mate at ≥
    * `threshold` cosine. Callers size `k ∝ corpus` (the paper's 50k
    * clusters on LAION-440M; O(√N) is a sane default) — that is what
    * keeps per-cell pair work at ~N²/k instead of quadratic.
    *
    * @return keepers as (`idCol`, cell)
    */
  def semanticDedup(embeddings: DataFrame, k: Int, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val (cents, _) = KMeans.fit(embeddings, k, idCol = idCol, vecCol = vecCol)
    val assigned = embeddings
      .select(col(idCol), col(vecCol),
        KMeans.assignCell(cents, col(vecCol)).as("cell"))
    val a = assigned.select(col("cell"), col(idCol).as("va"),
      col(vecCol).as("ea"))
    val b = assigned.select(col("cell"), col(idCol).as("vb"),
      col(vecCol).as("eb"))
    val dropped = a.join(b, Seq("cell")).where(col("va") < col("vb"))
      .where(cosine(col("ea"), col("eb")) >= threshold)
      .select(col("vb").as(idCol)).distinct()
    assigned.join(dropped, Seq(idCol), "left_anti")
      .select(col(idCol), col("cell"))
  }
}
