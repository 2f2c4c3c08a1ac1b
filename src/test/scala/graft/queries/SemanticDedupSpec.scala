package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, Tables, TestSpark}

/** Gates for the round-5 additions v6_semantic_dedup (SemDeDup) and
  * t11_classifier_score (linear quality classifier).
  *
  * v6's rule is re-derived here from first principles on the raw
  * embeddings (sequential-fold cosine, the same arithmetic the
  * CosineSimilarity expression is spec'd bit-exact against): a vector
  * survives iff no lower-id vector in its cluster reaches the 0.3
  * threshold. t11's scale claim — model application is a pure map —
  * is locked in as a plan assertion (no hash-partition exchange
  * anywhere; the only exchange is the presentation sort's range
  * partitioning).
  */
class SemanticDedupSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"
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

  test("v6_semantic_dedup: keepers are exactly the lowest-id survivors per cluster") {
    val vecs: Map[Long, Array[Float]] = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val cents = vecs.filter(_._1 < 8).toSeq.sortBy(_._1)
    // argmax cosine; tie → lowest centroid id (v6's row_number order)
    val assigned: Map[Long, Long] = vecs.map { case (id, v) =>
      id -> cents.map { case (cid, cv) => (cid, cos(v, cv)) }
        .maxBy { case (cid, c) => (c, -cid) }._1
    }
    val ids = vecs.keys.toSeq.sorted
    val expected = ids.filter { id =>
      !ids.exists(u => u < id && assigned(u) == assigned(id) &&
        cos(vecs(u), vecs(id)) >= 0.3)
    }

    val got = SparkEntry.queries("v6_semantic_dedup")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.map(_._1).toSeq == expected, "keeper set mismatch")
    got.foreach { case (id, cell) =>
      assert(cell == assigned(id), s"vec $id assigned $cell, expected ${assigned(id)}")
    }
    // the dedup must actually drop something on this corpus
    assert(got.length < ids.length, "threshold dropped nothing — gate is vacuous")
  }

  test("v6: fixture cell occupancy stays within the N/k plan envelope") {
    // The intra-cell pair join is bounded only while cells hold ~N/k
    // vectors (SemDeDup sets k ∝ corpus; the 8-centroid codebook is a
    // gate fixture). Guard the fixture's own premise: if the embedding
    // distribution ever collapsed most vectors into one cell, the gate
    // would silently be exercising a quadratic plan instead of the
    // bounded one the operator claims. Envelope: max cell ≤ 4× the
    // uniform share, measured on the FULL assignment (pre-prune — that
    // is what the pair join sees).
    val vecs: Map[Long, Array[Float]] = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val cents = vecs.filter(_._1 < 8).toSeq.sortBy(_._1)
    val n = vecs.size.toLong
    val k = 8L
    val maxCell = vecs.valuesIterator.map { v =>
      cents.map { case (cid, cv) => (cid, cos(v, cv)) }
        .maxBy { case (cid, c) => (c, -cid) }._1
    }.toSeq.groupBy(identity).valuesIterator.map(_.size.toLong).max
    assert(maxCell <= 4L * (n / k + 1L),
      s"max cell $maxCell exceeds 4×(N/k) with N=$n k=$k — fixture no " +
        "longer represents the bounded-cell plan v6 is specified for")
  }

  test("production semanticDedup: parity with the first-principles rule at corpus-proportional k") {
    val n = Tables.embeddings(spark, sf).count().toInt
    val k = math.max(8, math.sqrt(n.toDouble).toInt) // k ∝ corpus, paper-style
    val (cents, _) = KMeans.fit(Tables.embeddings(spark, sf), k)

    // re-derive expected keepers from raw vectors + the SAME codebook
    val vecs: Map[Long, Array[Float]] = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def l2sq(c: Array[Double], v: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < c.length) { val d = c(i) - v(i); s += d * d; i += 1 }
      s
    }
    val assigned: Map[Long, Int] = vecs.map { case (id, v) =>
      // nearest centroid; ties → first index (array_position semantics)
      id -> cents.zipWithIndex.minBy { case (c, i) => (l2sq(c, v), i) }._2
    }
    val ids = vecs.keys.toSeq.sorted
    val expected = ids.filter { id =>
      !ids.exists(u => u < id && assigned(u) == assigned(id) &&
        cos(vecs(u), vecs(id)) >= 0.3)
    }

    // KMeans.fit is deterministic (farthest-first init, no RNG), so the
    // production call re-fits the identical codebook internally.
    val got = VectorOps.semanticDedup(Tables.embeddings(spark, sf), k, 0.3)
      .orderBy("vec_id").collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(got.map(_._1).toSeq == expected, "keeper set mismatch")
    got.foreach { case (id, cell) =>
      assert(cell == assigned(id), s"vec $id assigned $cell, expected ${assigned(id)}")
    }

    // the k ∝ N property the operator exists for: cells stay bounded
    val maxCell = assigned.valuesIterator.toSeq
      .groupBy(identity).valuesIterator.map(_.size).max
    assert(maxCell <= 8 * (n / k + 1),
      s"max cell $maxCell vs N/k=${n / k} — codebook not spreading the corpus")
  }

  test("t11_classifier_score: zero-shuffle map; keep ⇔ score>0; scores bounded") {
    val df = SparkEntry.queries("t11_classifier_score")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"model application should be a pure map, found a hash shuffle:\n$plan")
    val rows = df.collect()
    assert(rows.nonEmpty)
    var kept = 0
    rows.foreach { r =>
      val score = r.getDouble(2); val keep = r.getBoolean(3)
      assert(keep == (score > 0.0))
      assert(score >= -0.5 && score <= 0.5, s"score out of range: $score")
      if (keep) kept += 1
    }
    // weights are ~uniform on [-0.5, 0.5): a degenerate all-keep or
    // all-drop outcome would mean the hash→weight map collapsed
    assert(kept > 0 && kept < rows.length, s"degenerate split: $kept/${rows.length}")
  }
}
