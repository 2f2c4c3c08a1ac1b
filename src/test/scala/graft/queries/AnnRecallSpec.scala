package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** ANN QUALITY gate: the k-means-trained IVF index must actually
  * retrieve near neighbors, not just run — recall@10 against the exact
  * brute-force ranking, measured per nprobe. (v5 gates the operator
  * SHAPE with pinned centroids; this spec gates the trained path's
  * retrieval quality end to end.) Deterministic: farthest-first k-means
  * init, no RNG anywhere.
  */
class AnnRecallSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.01"
  private lazy val spark = TestSpark.spark

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  test("k-means IVF recall@10 grows with nprobe and hits 1.0 at full probe") {
    val k = 16
    val topK = 10
    val nQueries = 20

    val (centroids, assignDf) = KMeans.fit(Tables.embeddings(spark, sf), k)
    val cells: Map[Long, Int] = assignDf.collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val vecs: Map[Long, Array[Float]] = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).toArray).toMap
    val queries = vecs.keys.toSeq.sorted.take(nQueries)

    // exact top-10 per query (ties by id, same rule as v1)
    val exact: Map[Long, Set[Long]] = queries.map { q =>
      q -> vecs.keySet.filter(_ != q).toSeq
        .sortBy(n => (-cos(vecs(q), vecs(n)), n)).take(topK).toSet
    }.toMap

    // probe ranking uses SQUARED L2 — the same metric KMeans.assignCell
    // used to place the vectors (a mismatched probe metric would rank
    // loose small-norm centroids differently than assignment did)
    def centL2sq(q: Array[Float], c: Array[Double]): Double = {
      var s = 0.0
      var i = 0
      while (i < q.length) {
        val d = q(i).toDouble - c(i); s += d * d
        i += 1
      }
      s
    }

    def recallAt(nprobe: Int): Double = {
      val r = queries.map { q =>
        val probeCells = centroids.indices
          .sortBy(ci => (centL2sq(vecs(q), centroids(ci)), ci)).take(nprobe).toSet
        val cand = vecs.keySet.filter(n => n != q && probeCells.contains(cells(n)))
        val got = cand.toSeq.sortBy(n => (-cos(vecs(q), vecs(n)), n)).take(topK).toSet
        (got intersect exact(q)).size.toDouble / topK
      }
      r.sum / r.length
    }

    val r1 = recallAt(1); val r4 = recallAt(4); val rAll = recallAt(k)
    info(f"recall@10: nprobe=1 $r1%.3f  nprobe=4 $r4%.3f  nprobe=$k $rAll%.3f")
    assert(rAll == 1.0, "full probe must recover the exact ranking")
    assert(r4 >= r1 - 1e-9, "recall must not degrade with more probes")
    assert(r4 >= 0.5, f"nprobe=4 recall collapsed: $r4%.3f")
    assert(r1 >= 0.2, f"nprobe=1 recall collapsed: $r1%.3f")
  }

  test("IVF-PQ (v10 composition) recall@10 on the 10x replica holds its floor") {
    // The configuration actually shipped at 100 TB is IVF × PQ-ADC ×
    // exact-rerank (v10). Its oracle gate pins arithmetic at sf0.01;
    // THIS pins retrieval quality at the 10× replica (20k vectors):
    // the Spark pipeline itself runs (not a driver-side re-derivation),
    // recall is measured against brute-force exact top-10, and the
    // floors are pinned from measurement so a quantization or probe
    // regression fails loudly. Cancels (not fails) when the replica
    // hasn't been built on this host (ScaleBuild writes it to /tmp).
    val replica = "/tmp/graft-scale/full10x"
    assume(new java.io.File(s"$replica/embeddings.parquet").exists,
      "10x replica not built on this host")
    val topK = 10
    val e = Tables.embeddings(spark, replica)
    val vecs: Map[Long, Array[Float]] = e
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val queries = (0L until 20L).toSeq
    val exact: Map[Long, Set[Long]] = queries.map { q =>
      q -> vecs.keySet.filter(_ != q).toSeq
        .sortBy(n => (-cos(vecs(q), vecs(n)), n)).take(topK).toSet
    }.toMap
    def recallAt(nprobe: Int, adcKeep: Int): Double = {
      val got: Map[Long, Set[Long]] = VectorOps.ivfPqSearch(
          e.select("vec_id", "embedding"), col("vec_id") < 20,
          k = topK, adcKeep = adcKeep, nprobe = nprobe)
        .select("qid", "nid").collect()
        .groupBy(_.getLong(0))
        .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
      val rs = queries.map { q =>
        (got.getOrElse(q, Set.empty) intersect exact(q)).size.toDouble / topK
      }
      rs.sum / rs.length
    }
    val r20 = recallAt(2, 20)
    val r100 = recallAt(2, 100)
    val r200 = recallAt(2, 200)
    info(f"IVF-PQ recall@10 at 10x (nprobe=2): adcKeep=20 $r20%.3f  100 $r100%.3f  200 $r200%.3f")
    // Measured round 11 (full grid in the commit): with the pinned
    // fixture codebook (first 16 vectors as coarse centroids AND PQ
    // codewords — the oracle posture, NOT trained), recall is
    // ADC-BOUNDED, not probe-bounded: widening nprobe 2→8 left
    // recall flat (0.195→0.185) while deepening the exact-rerank pool
    // adcKeep 20→200 lifted it 0.195→0.565 — more candidates only
    // help once the rerank can rescue what coarse ADC ordering
    // misranks. That is the production lever too (rerank depth
    // 10-100× k); the trained-quantizer path's probe-scaling recall
    // is gated by the k-means test above. Floors pinned just under
    // measurement so a quantization/indexing regression fails loudly.
    assert(r100 >= r20 - 1e-9 && r200 >= r100 - 1e-9,
      f"recall must not degrade with rerank depth: $r20%.3f/$r100%.3f/$r200%.3f")
    assert(r20 >= 0.15, f"IVF-PQ 10x adcKeep=20 recall collapsed: $r20%.3f")
    assert(r100 >= 0.35, f"IVF-PQ 10x adcKeep=100 recall collapsed: $r100%.3f")
    assert(r200 >= 0.50, f"IVF-PQ 10x adcKeep=200 recall collapsed: $r200%.3f")
  }

  test("TRAINED per-subspace PQ: measured against the sampled-codeword fixture at 10x") {
    // The production quantizer (pqTrainCodebooks: farthest-first k-means
    // per subspace) vs the gate fixture (the first 16 corpus vectors'
    // subvectors — which is itself a legitimate production init:
    // codewords sampled from data). MEASURED NEGATIVE RESULT, kept on
    // purpose: on this synthetic unit-norm corpus the trained codebooks
    // win every classical codebook metric (reconstruction error 0.78 vs
    // 1.08, full 4-bit code entropy, 17k vs 11.7k distinct code tuples
    // over 20k vectors — numpy replication in SCALING.md) and still
    // RANK worse at every rerank depth (0.27 vs 0.425 @adcKeep=100,
    // 0.725 vs 0.795 @800): true neighbors here differ by noise-dim
    // alignment within tight label clusters, which Lloyd-averaged
    // centroids cannot encode (the within-cluster residual quantizes to
    // ~nothing, ADC ties, and the id tie-break fills the pool), while
    // data-sampled codewords share the corpus's noise structure and
    // keep ADC weakly informative. Residual (FAISS-style) encoding was
    // measured too: 0.205 — no rescue at this 4-bit budget. The spec
    // pins the structural truths: the trained path runs end-to-end,
    // recall climbs with rerank depth (the ADC-bounded lever v10's note
    // established), and it holds a floor.
    val replica = "/tmp/graft-scale/full10x"
    assume(new java.io.File(s"$replica/embeddings.parquet").exists,
      "10x replica not built on this host")
    val topK = 10
    val e = Tables.embeddings(spark, replica)
    val vecs: Map[Long, Array[Float]] = e
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val queries = (0L until 20L).toSeq
    val exact: Map[Long, Set[Long]] = queries.map { q =>
      q -> vecs.keySet.filter(_ != q).toSeq
        .sortBy(n => (-cos(vecs(q), vecs(n)), n)).take(topK).toSet
    }.toMap
    def recall(cb: Option[org.apache.spark.sql.DataFrame], adcKeep: Int): Double = {
      val got = VectorOps.ivfPqSearch(e.select("vec_id", "embedding"),
          col("vec_id") < 20, k = topK, adcKeep = adcKeep, nprobe = 2, pqCb = cb)
        .select("qid", "nid").collect()
        .groupBy(_.getLong(0))
        .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
      val rs = queries.map { q =>
        (got.getOrElse(q, Set.empty) intersect exact(q)).size.toDouble / topK
      }
      rs.sum / rs.length
    }
    val cb = VectorOps.pqTrainCodebooks(e.select("vec_id", "embedding"))
    val t100 = recall(Some(cb), 100)
    val t200 = recall(Some(cb), 200)
    val fixture = recall(None, 100)
    info(f"PQ recall@10 at 10x (nprobe=2): fixture@100 $fixture%.3f  trained@100 $t100%.3f  trained@200 $t200%.3f")
    assert(t200 >= t100 - 1e-9,
      f"trained recall must not degrade with rerank depth: $t100%.3f -> $t200%.3f")
    assert(t100 >= 0.12, f"trained-PQ recall collapsed: $t100%.3f")
    assert(t200 >= 0.25, f"trained-PQ recall@200 collapsed: $t200%.3f")
  }

  test("beam descent: centroid seeding >= fixed min-id entry at equal hops (10x)") {
    // VERDICT r11 #4: v11's original entry point was the global minimum
    // live id — descent depth then grows with graph diameter. Seeding
    // from the nearest coarse centroid (the HNSW upper-layer trick,
    // machinery the IVF path already stores) starts every query one
    // quantizer step from its target region. This pins the claim AT THE
    // 10x REPLICA: recall@5 with centroid seeds must be >= the fixed
    // entry's at every measured hop budget, and the centroid-seeded
    // SHALLOW walk must already beat the fixed entry's DEEPER one
    // (fewer hops needed — each hop is a driver-synchronized round at
    // cluster scale, so hops saved is latency saved).
    val replica = "/tmp/graft-scale/full10x"
    assume(new java.io.File(s"$replica/embeddings.parquet").exists,
      "10x replica not built on this host")
    val topK = 5
    val e = Tables.embeddings(spark, replica).select("vec_id", "embedding")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_beamseed").toString
    graft.llm.KnnGraphIndex.add(spark, dir, e, 3)
    val vecs: Map[Long, Array[Float]] = e.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val queries = (0L until 20L).toSeq
    val exact: Map[Long, Set[Long]] = queries.map { q =>
      q -> vecs.keySet.filter(_ != q).toSeq
        .sortBy(n => (-cos(vecs(q), vecs(n)), n)).take(topK).toSet
    }.toMap
    val qDf = e.where(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val cents = e.where(col("vec_id") < 16)
      .select(col("vec_id").as("cent_id"), col("embedding").as("ce"))
    def recallAt(hops: Int, seeded: Boolean): Double = {
      val got = graft.llm.KnnGraphIndex.beamSearch(spark, dir, qDf,
          k = topK, beam = 4, hops = hops,
          centroids = if (seeded) Some(cents) else None)
        .select("qid", "nid").collect()
        .groupBy(_.getLong(0))
        .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
      queries.map { q =>
        (got.getOrElse(q, Set.empty) intersect exact(q)).size.toDouble / topK
      }.sum / queries.length
    }
    val fixed2 = recallAt(2, seeded = false)
    val fixed3 = recallAt(3, seeded = false)
    val seed2 = recallAt(2, seeded = true)
    val seed3 = recallAt(3, seeded = true)
    info(f"beam recall@5 at 10x: fixed h2=$fixed2%.3f h3=$fixed3%.3f  " +
      f"centroid h2=$seed2%.3f h3=$seed3%.3f")
    assert(seed2 >= fixed2 - 1e-9 && seed3 >= fixed3 - 1e-9,
      "centroid seeding must not lose to the fixed entry at equal hops")
    assert(seed2 >= fixed3 - 1e-9,
      "centroid seeding at 2 hops should match the fixed entry's 3-hop walk")
  }
}
