package graft.llm

import java.security.MessageDigest

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Differential fuzz of the composed corpus pipeline: a driver-side
  * literal interpreter of the same recipe (MessageDigest minhash,
  * brute-force jaccard over LSH-recalled candidates, union-find
  * clustering) must agree with [[CorpusEtl.prepare]] on random corpora
  * seeded with exact dups, near-dups, spam and short docs. This guards
  * the COMPOSITION (stage order, keeper selection, count semantics) the
  * way the single-op gates guard each stage.
  */
class CorpusEtlFuzzSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString

  /** The reference recipe, interpreted literally on the driver. */
  private def interpret(corpus: Seq[(Long, String)]): Map[Long, (Int, Int)] = {
    // 1. repetition filter (defaults of CorpusEtlConfig)
    def tokens(text: String) = text.toLowerCase.split(" ", -1).toSeq
    def grams(t: Seq[String], n: Int) =
      if (t.size >= n) t.sliding(n).map(_.mkString(" ")).toSeq else Seq.empty
    def dupFrac(g: Seq[String]) =
      if (g.isEmpty) 0.0 else (g.size - g.distinct.size).toDouble / g.size
    val kept = corpus.filter { case (_, text) =>
      val t = tokens(text)
      val topFrac = t.groupBy(identity).values.map(_.size).max.toDouble / t.size
      t.size >= 5 && dupFrac(grams(t, 2)) <= 0.9 &&
        dupFrac(grams(t, 3)) <= 0.8 && topFrac <= 0.2
    }
    // 2. exact dedup: min doc_id keeper per identical text
    val exact = kept.groupBy(_._2).map { case (text, rows) =>
      val ids = rows.map(_._1)
      (ids.min, text, ids.size)
    }.toSeq
    // 3. near-dup: shingles → 8 md5 minhashes → candidates share a band →
    // exact jaccard ≥ 0.05 → union-find
    def shingleSet(text: String) = grams(tokens(text), 3).distinct.toSet
    def sig(sh: Set[String]) =
      (0 until 8).map(k => sh.map(x => md5hex(s"$k|$x")).min)
    val withSig = exact.map { case (id, text, n) =>
      (id, n, shingleSet(text), sig(shingleSet(text)))
    }
    val pairs = for {
      (a, i) <- withSig.zipWithIndex
      b <- withSig.drop(i + 1)
      if a._4.zip(b._4).exists { case (x, y) => x == y }
      nCommon = (a._3 & b._3).size
      j = nCommon.toDouble / (a._3.size + b._3.size - nCommon).toDouble
      if j >= 0.05
    } yield (math.min(a._1, b._1), math.max(a._1, b._1))
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    for ((a, b) <- pairs) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val byComp = withSig.map(_._1).groupBy(find)
    // keepers: component minimum; value = (n_copies, cluster_size)
    val copies = withSig.map(w => w._1 -> w._2).toMap
    byComp.map { case (root, members) => root -> (copies(root), members.size) }
  }

  private val vocab = Seq("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta", "iota", "kappa", "lambda", "mu")

  test("random corpora: prepare matches the driver-side interpreter") {
    val rnd = new scala.util.Random(23)
    for (round <- 1 to 6) {
      var id = 0L
      def nextId() = { id += 1; id }
      val base = Seq.fill(12 + rnd.nextInt(8)) {
        val n = 1 + rnd.nextInt(24)
        (nextId(), Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val mutated = base.flatMap { case (_, text) =>
        val roll = rnd.nextInt(10)
        if (roll < 3) Seq((nextId(), text)) // exact dup
        else if (roll < 6) { // near-dup: swap one token
          val t = text.split(" ", -1)
          t(rnd.nextInt(t.length)) = vocab(rnd.nextInt(vocab.size))
          Seq((nextId(), t.mkString(" ")))
        } else if (roll < 7)
          Seq((nextId(), Seq.fill(30)("spam").mkString(" "))) // filtered
        else Seq.empty
      }
      val corpus = rnd.shuffle(base ++ mutated)
      val expected = interpret(corpus)

      val out = CorpusEtl.prepare(
          corpus.map { case (i, t) => (i, "en", t) }.toDF("doc_id", "lang", "text"))
        .select("doc_id", "n_copies", "cluster_size")
        .collect()
        .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2)))
        .toMap
      assert(out == expected, s"round $round diverged (seed 23)")
    }
  }
}
