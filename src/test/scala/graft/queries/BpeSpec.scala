package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** BPE trainer: the iterative merge loop must reproduce the classic
  * greedy algorithm (leftmost-first non-overlapping merges, argmax pair
  * by count with lexicographic tie-break) computed independently in
  * plain Scala.
  */
class BpeSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  /** Reference BPE in plain Scala over a word-count map. */
  private def referenceBpe(
      words: Map[String, Long], nMerges: Int): Seq[(String, String)] = {
    var vocab: Map[Vector[String], Long] =
      words.groupMapReduce { case (w, _) => w.map(_.toString).toVector } {
        case (_, c) => c
      }(_ + _)
    val merges = Seq.newBuilder[(String, String)]
    var i = 0
    var done = false
    while (i < nMerges && !done) {
      val counts = collection.mutable.Map.empty[(String, String), Long]
      for ((syms, c) <- vocab; j <- 0 until syms.length - 1)
        counts((syms(j), syms(j + 1))) =
          counts.getOrElse((syms(j), syms(j + 1)), 0L) + c
      if (counts.isEmpty) done = true
      else {
        // argmax by count, ties by "a b" string ascending (the trainer's
        // orderBy(n desc, pair) rule)
        val ((a, b), _) = counts.minBy { case ((x, y), n) => (-n, s"$x $y") }
        merges += ((a, b))
        vocab = vocab.groupMapReduce { case (syms, _) =>
          // greedy leftmost-first fold, same rule as Tokenize.applyMerge
          syms.foldLeft(Vector.empty[String]) { (acc, x) =>
            if (acc.nonEmpty && acc.last == a && x == b)
              acc.init :+ (a + b)
            else acc :+ x
          }
        } { case (_, c) => c }(_ + _)
      }
      i += 1
    }
    merges.result()
  }

  test("bpeTrain reproduces the greedy reference merges") {
    import spark.implicits._
    val docs = Seq(
      "hug hug hug hug hug hug hug hug hug hug",
      "pug pug pug pug pug",
      "pun pun pun pun pun pun pun pun pun pun pun pun",
      "bun bun bun bun",
      "hugs hugs hugs hugs hugs").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

    val words = docs.as[(Long, String)].collect()
      .flatMap(_._2.split(" "))
      .groupMapReduce(identity)(_ => 1L)(_ + _)

    val expected = referenceBpe(words, 6)
    val (got, vocab) = Tokenize.bpeTrain(docs, 6)
    assert(got === expected)

    // the final vocabulary must contain the fully merged top word
    val symsOfHug = vocab
      .where(org.apache.spark.sql.functions.expr("array_join(symbols, '') = 'hug'"))
      .collect()
    assert(symsOfHug.nonEmpty)
    vocab.unpersist()
  }

  test("applyMerge is leftmost-first and non-overlapping") {
    import spark.implicits._
    val vocab = Seq((Seq("a", "a", "a"), 1L), (Seq("a", "a", "a", "a"), 1L))
      .toDF("symbols", "wc")
    val merged = Tokenize.applyMerge(vocab, "a", "a")
      .select("symbols").as[Seq[String]].collect().toSet
    assert(merged === Set(Seq("aa", "a"), Seq("aa", "aa")))
  }

  test("batched trainer with k=1 degenerates to the sequential trainer") {
    import spark.implicits._
    val docs = Seq(
      "hug hug hug hug hug hug hug hug hug hug",
      "pug pug pug pug pug",
      "pun pun pun pun pun pun pun pun pun pun pun pun",
      "bun bun bun bun",
      "hugs hugs hugs hugs hugs").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val (seqLog, v1) = Tokenize.bpeTrainLog(docs, 4)
    val (batLog, v2) = Tokenize.bpeTrainBatchedLog(docs, rounds = 4, k = 1)
    // k=1: every round's single candidate is trivially compatible, so
    // the policy IS the sequential argmax — logs must agree exactly
    assert(batLog.map { case (r, _, a, b, n) => (r, a, b, n) } === seqLog)
    v1.unpersist(); v2.unpersist()
  }

  test("batched trainer: 8 rounds reach 64+ merges, rounds symbol-disjoint") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val (log, _) = Tokenize.bpeTrainBatchedLog(docs, rounds = 8, k = 64)
    assert(log.map(_._1).distinct.size <= 8)
    assert(log.size >= 64, s"only ${log.size} merges kept in 8 rounds")
    // kept ⊆ candidates, and each kept pair was checked against every
    // higher-ranked candidate — so kept pairs are pairwise
    // symbol-disjoint within a round (the batch-validity invariant that
    // keeps selection-time counts honest)
    for ((r, group) <- log.groupBy(_._1)) {
      // per-merge symbol SET (a self-pair like (g,g) is one symbol);
      // disjointness is across DIFFERENT kept merges
      val symSets = group.map(m => Set(m._3, m._4))
      for (pair <- symSets.combinations(2))
        assert(pair.head.intersect(pair.last).isEmpty,
          s"round $r kept merges sharing a symbol: $group")
    }
  }
}
