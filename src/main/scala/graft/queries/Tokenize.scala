package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Tokenizer-training (BPE) and cross-source contamination operators —
  * the corpus-preparation steps that sit between raw text and a trained
  * tokenizer in an LLM data pipeline.
  *
  * Scale notes (100 TB):
  *  - BPE pair statistics are computed over the *word-count vocabulary*,
  *    not the raw corpus: the first `groupBy(word)` is the classic BPE
  *    trick that collapses a corpus-sized problem to a vocab-sized one
  *    (the corpus contributes only word frequencies; pair extraction
  *    runs once per DISTINCT word). The corpus-sized shuffle carries
  *    (word, partial-count) pairs with map-side combine; everything
  *    after is vocab-sized.
  *  - the source-overlap matrix joins on the shingle (the blocked key),
  *    never on documents: a shingle shared by k sources contributes
  *    k·(k−1)/2 pair rows, bounded by the (small, fixed) source count —
  *    a per-key fan-out of ≤ |sources|², independent of corpus size.
  */
object Tokenize {

  /** The engine-wide tokenization (TextOps.tokens). */
  private val tokens: Column = TextOps.tokens

  /** The DuckDB replay of the 4-merge BPE train + encode fold (t17's
    * oracle machinery, shared with t20's fertility rollup): CTEs
    * `w0..w4`, where `w4` maps every distinct corpus word `tok` to its
    * encoded `syms` pieces. */
  private def bpeW4Cte: String = {
    val iters = (1 to 4).map { i =>
      s"""p$i AS (SELECT syms[i] AS a, syms[i+1] AS b, CAST(SUM(f) AS BIGINT) AS cnt
           FROM (SELECT f, syms, unnest(range(1, len(syms))) AS i FROM w${i - 1})
           GROUP BY 1, 2),
         m$i AS (SELECT a, b FROM p$i ORDER BY cnt DESC, a, b LIMIT 1),
         w$i AS (SELECT tok, f, list_reduce(list_transform(syms, s -> [s]),
                   (acc, x) -> CASE WHEN acc[-1] = m.a AND x[1] = m.b
                               THEN list_concat(acc[1:len(acc)-1], [m.a || m.b])
                               ELSE list_concat(acc, x) END) AS syms
                 FROM w${i - 1} CROSS JOIN m$i m)"""
    }.mkString(",\n        ")
    s"""w0 AS (
        SELECT tok, string_split(tok, '') AS syms, CAST(COUNT(*) AS BIGINT) AS f
        FROM (SELECT unnest(string_split(lower(text), ' ')) AS tok FROM documents)
        WHERE tok <> '' GROUP BY tok),
      $iters"""
  }

  /** Word frequencies over the corpus: the map-side-combined groupBy
    * that turns corpus scale into vocabulary scale. */
  def wordCounts(docs: DataFrame): DataFrame =
    docs.select(explode(tokens).as("tok"))
      .where(col("tok") =!= "")
      .groupBy("tok")
      .agg(count(lit(1)).as("wc"))

  /** Adjacent-symbol pair counts over a (symbols, wc) vocabulary frame —
    * one BPE iteration's statistics. `symbols` is an array<string>
    * column; each adjacent pair is weighted by the word's corpus count. */
  def pairCounts(vocab: DataFrame): DataFrame =
    vocab
      .where(size(col("symbols")) >= 2)
      .select(col("wc"), explode(expr(
        """transform(sequence(0, size(symbols) - 2),
           i -> concat_ws(' ', element_at(symbols, i + 1), element_at(symbols, i + 2)))"""))
        .as("pair"))
      .groupBy("pair")
      .agg(sum(col("wc")).as("n"))

  /** Initial character-symbol vocabulary from word counts. The empty
    * strings Spark's `split(tok, '')` can emit are filtered so the
    * symbol list matches DuckDB's `string_split(tok, '')` exactly. */
  def charVocab(words: DataFrame): DataFrame =
    words.select(col("wc"),
      expr("filter(split(tok, ''), x -> x <> '')").as("symbols"))

  /** Apply one merge (a, b) → a||b to every word's symbol array,
    * greedy leftmost-first and non-overlapping — the standard BPE merge
    * rule — as a single left fold, so one plan handles every word.
    *
    * The fold keeps the invariant "last element of the accumulator is
    * never the left half of an already-applied merge at this position":
    * when the previous element is `a` and the current is `b` they fuse;
    * the fused `a||b` differs from `a` (b is non-empty), so it cannot
    * fuse again — which is exactly the non-overlapping semantics
    * ("aaa" + merge (a,a) → [aa, a], not [aa, aa]). */
  def applyMerge(vocab: DataFrame, a: String, b: String): DataFrame = {
    val aLit = lit(a)
    val bLit = lit(b)
    vocab.withColumn("symbols",
      aggregate(
        col("symbols"),
        array().cast("array<string>"),
        (acc, x) =>
          when(size(acc) > 0 &&
              element_at(acc, -1) === aLit && x === bLit,
            concat(slice(acc, lit(1), size(acc) - 1), array(concat(aLit, bLit))))
            .otherwise(concat(acc, array(x)))))
  }

  /** Apply a SET of compatible merges in ONE leftmost-greedy fold pass
    * — the batched counterpart of [[applyMerge]]. Membership is an
    * `array_contains` over the batch's "a b" keys (symbols never
    * contain ' ': they are concatenations of characters from
    * space-split tokens, so the key is unambiguous). Semantics, pinned
    * by the t16b oracle's identical `list_reduce`: one pass, merging
    * (acc.last, x) whenever the pair is in the set — a symbol fused
    * earlier in the pass can fuse again as a LEFT half (cascade), but
    * never as a right half (the fold moved past it); the per-merge
    * multi-pass of the sequential trainer is deliberately NOT emulated,
    * because one pass per round is the whole point of batching. */
  def applyMergeBatch(vocab: DataFrame, pairs: Seq[(String, String)]): DataFrame = {
    val keys = typedLit(pairs.map(p => p._1 + " " + p._2))
    vocab.withColumn("symbols",
      aggregate(
        col("symbols"),
        array().cast("array<string>"),
        (acc, x) =>
          when(size(acc) > 0 &&
              array_contains(keys, concat_ws(" ", element_at(acc, -1), x)),
            concat(slice(acc, lit(1), size(acc) - 1),
              array(concat(element_at(acc, -1), x))))
            .otherwise(concat(acc, array(x)))))
  }

  /** MERGE-BATCHED BPE training (VERDICT r12 #2 — the production-scale
    * trainer shape): per round, ONE vocab-sized Spark job fetches the
    * top-`k` candidate pairs (count desc, then the split halves — t16's
    * tie order), a driver-side GREEDY pass keeps each candidate iff it
    * is symbol-disjoint from every already-KEPT one (the maximal
    * compatible prefix set — still oracle-expressible, because greedy
    * over a bounded ranked list is one `list_reduce` fold), and one
    * [[applyMergeBatch]] fold applies the whole batch. Rounds are O(vocab/k), not O(vocab): a 50k-merge
    * tokenizer trains in ~thousands of scans instead of 50k driver
    * round-trips. Job accounting: the round's single `collect`
    * doubles as the cache materialization of the round's vocab (the
    * cache is marked lazily; the previous round's is dropped only
    * after the collect lands), so `rounds` rounds cost exactly
    * `rounds` jobs.
    *
    * Why batch-compatibility demands symbol-disjointness: the counts
    * that ranked the batch were computed BEFORE any of its merges
    * applied, and a merge only invalidates counts of pairs touching
    * its symbols — disjoint pairs keep their selection-time counts
    * valid (the Youtokentome/fast-BPE batching argument).
    *
    * Returns (round, candidate-rank, left, right, selection count) per
    * kept merge, plus the final vocab (lazy; intermediates are
    * unpersisted). With k=1 the policy degenerates to exactly the
    * sequential trainer — TokenizeSpec pins that differential. */
  def bpeTrainBatchedLog(docs: DataFrame, rounds: Int, k: Int)
      : (Seq[(Int, Int, String, String, Long)], DataFrame) = {
    var vocab = charVocab(wordCounts(docs)).cache()
    var toFree: Option[DataFrame] = None
    val log = Seq.newBuilder[(Int, Int, String, String, Long)]
    for (r <- 1 to rounds) {
      val top = pairCounts(vocab)
        .withColumn("pa", split(col("pair"), " ", 2).getItem(0))
        .withColumn("pb", split(col("pair"), " ", 2).getItem(1))
        .orderBy(col("n").desc, col("pa"), col("pb"))
        .limit(k)
        .select("pa", "pb", "n")
        .collect() // the round's one job; materializes vocab's cache
      toFree.foreach(_.unpersist())
      toFree = None
      // greedy prefix selection: keep a candidate iff it is
      // symbol-disjoint from every already-KEPT one (not from every
      // higher-ranked candidate — that stricter rank-window rule
      // saturates at ~4 keeps/round, because one dropped candidate
      // poisons its symbols for the whole window). Greedy over a
      // BOUNDED list is still oracle-expressible: a list_reduce fold
      // over the ranked candidates.
      val kept = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      for ((row, idx) <- top.zipWithIndex) {
        val (a, b, n) = (row.getString(0), row.getString(1), row.getLong(2))
        val conflict = kept.exists { case (ka, kb) =>
          ka == a || ka == b || kb == a || kb == b
        }
        if (!conflict) {
          log += ((r, idx + 1, a, b, n))
          kept += ((a, b))
        }
      }
      val keptSeq = kept.toSeq
      if (keptSeq.nonEmpty) {
        toFree = Some(vocab)
        // EAGER checkpoint, not cache (r14): the lazy-cache form kept
        // the full fold-on-fold lineage — one aggregate() HOF layer per
        // round — so Catalyst re-analyzed an O(rounds)-deep plan before
        // every round's job (JobProbe: per-round driver gaps growing to
        // ~0.1 s by round 8). Truncating per round keeps planning O(1);
        // the checkpoint job replaces the cache-materialization scan
        // the next round's collect paid anyway.
        vocab = applyMergeBatch(vocab, keptSeq).localCheckpoint(true)
      }
    }
    toFree.foreach(_.unpersist())
    (log.result(), vocab)
  }

  /** Train `nMerges` BPE merges over the corpus. Each iteration is one
    * vocab-sized Spark job: count pairs, take the argmax on the driver
    * (a single `head` of a 1-row sorted limit — the merge table IS
    * driver-sized by construction; real tokenizers ship it as a file),
    * rewrite the symbol arrays. Ties break lexicographically so the
    * result is deterministic across partitionings.
    *
    * Returns the ordered merge list and the final vocabulary frame. */
  def bpeTrain(docs: DataFrame, nMerges: Int): (Seq[(String, String)], DataFrame) = {
    val (log, vocab) = bpeTrainLog(docs, nMerges)
    (log.map(m => (m._2, m._3)), vocab)
  }

  /** [[bpeTrain]] with the full training log — (iteration, left, right,
    * pair count at selection time), the artifact the t16 gate pins
    * (counts expose a subtly-wrong merge application even when the
    * chosen pairs happen to agree). */
  def bpeTrainLog(docs: DataFrame,
      nMerges: Int): (Seq[(Int, String, String, Long)], DataFrame) = {
    // The round's single collect doubles as the cache materialization
    // (t16b's job accounting, applied to the sequential trainer): the
    // lazily-marked vocab cache is populated by the FIRST pairCounts
    // scan — its only consumer, so no concurrent-stage race — and the
    // previous round's cache is dropped only after the collect lands.
    // nMerges rounds cost nMerges jobs, not 1 + 2·nMerges.
    var vocab = charVocab(wordCounts(docs)).cache()
    var toFree: Option[DataFrame] = None
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var i = 0
    var done = false
    while (i < nMerges && !done) {
      // Tie order is (count desc, a, b) on the SPLIT halves, not on the
      // concat'd "a b" string: the two only agree when every symbol
      // character sorts above the ' ' separator, which control
      // characters (tab/newline inside a space-split token) violate —
      // ordering on the halves matches the oracle's ORDER BY a, b for
      // ALL inputs.
      val top = pairCounts(vocab)
        .withColumn("pa", split(col("pair"), " ", 2).getItem(0))
        .withColumn("pb", split(col("pair"), " ", 2).getItem(1))
        .orderBy(col("n").desc, col("pa"), col("pb"))
        .limit(1)
        .collect()
      toFree.foreach(_.unpersist())
      toFree = None
      if (top.isEmpty) done = true
      else {
        val Array(a, b) = top(0).getString(0).split(" ", 2) match {
          case Array(x, y) => Array(x, y)
          case other       => other
        }
        merges += ((i + 1, a, b, top(0).getLong(1)))
        toFree = Some(vocab)
        vocab = applyMerge(vocab, a, b).cache()
      }
      i += 1
    }
    toFree.foreach(_.unpersist())
    (merges.result(), vocab)
  }

  /** Session-memoized training log for the ENCODE-side gates (t17/t20):
    * a production encode job loads the merges artifact the trainer
    * shipped — it does not retrain per query — so the serve gates price
    * encoding, not training (t16 gates the real training pass and stays
    * unmemoized). The log is a handful of driver-side tuples; the
    * trailing vocab frame is unpersisted since only the log is kept. */
  // Keyed by the session TAG (graft.Sessions.sessionTag — the temp-view
  // markers' posture), not the SparkSession object: an object key would
  // strongly retain every session (and its merge log) for the process
  // lifetime in a multi-session service. Compute runs OUTSIDE the map
  // (get → train → putIfAbsent), so no full Spark training job ever
  // holds a ConcurrentHashMap bin lock; a lost race retrains once and
  // both winners hold the identical deterministic log.
  private val trainLogCache = new java.util.concurrent.ConcurrentHashMap[
    (String, String, Int), Seq[(Int, String, String, Long)]]()

  private def bpeMergesArtifact(s: SparkSession, d: String,
      nMerges: Int): Seq[(Int, String, String, Long)] = {
    val key = (graft.Sessions.sessionTag(s), d, nMerges)
    Option(trainLogCache.get(key)).getOrElse {
      val (log, vocab) = bpeTrainLog(Tables.documentsSpread(s, d), nMerges)
      vocab.unpersist()
      trainLogCache.putIfAbsent(key, log)
      log
    }
  }

  val all: Seq[Q] = Seq(

    // t10 — BPE first-iteration pair statistics: the top-50 adjacent
    // character pairs by corpus frequency, the exact quantity a BPE
    // trainer maximizes each round. Shape: corpus-sized word-count
    // groupBy (map-side combined) → vocab-sized pair explode → pair
    // groupBy. At 100 TB the only corpus-sized exchange carries
    // (word, count) partials; pair work is per-distinct-word.
    Q("t10_bpe_pairs",
      (s, d) => pairCounts(charVocab(wordCounts(Tables.documentsSpread(s, d))))
        .select(col("pair"), col("n").cast("long").as("n"))
        .orderBy(col("n").desc, col("pair"))
        .limit(50),
      Some("""WITH words AS (
          SELECT tok, COUNT(*) AS wc FROM (
            SELECT unnest(string_split(lower(text), ' ')) AS tok FROM documents)
          WHERE tok <> '' GROUP BY tok),
        sym AS (SELECT wc, string_split(tok, '') AS c FROM words),
        p AS (SELECT wc, unnest(list_transform(range(1, len(c)),
                i -> c[i] || ' ' || c[i+1])) AS pair
              FROM sym WHERE len(c) >= 2)
        SELECT pair, CAST(SUM(wc) AS BIGINT) AS n
        FROM p GROUP BY pair ORDER BY n DESC, pair LIMIT 50""")),

    // The FULL iterative BPE trainer, oracle-gated: four merge rounds,
    // each = pair-count aggregate (vocab-sized, never corpus-sized — the
    // corpus scan happened once at wordCounts) → deterministic argmax
    // (count desc, then pair; the 1-row driver decision every real
    // tokenizer trainer makes) → greedy leftmost non-overlapping merge
    // applied as one left fold over every word's symbol array. The gate
    // output is the training LOG (it, left, right, count) — the
    // artifact a tokenizer ships — and the oracle replays all four
    // rounds as chained CTEs whose DuckDB list_reduce lambda implements
    // the IDENTICAL fold, so a drifted merge rule (overlap handling,
    // tie order, count-after-merge bookkeeping) hash-mismatches even
    // when the first chosen pair agrees. Ordering note: both engines
    // break count ties on (a, b) — Spark re-splits the pair string into
    // its halves for the argmax, since ordering on the concat'd "a b"
    // form diverges when a symbol contains a character below ' '
    // (tab/newline survive the space split).
    Q("t16_bpe_train",
      (s, d) => {
        import s.implicits._
        val (log, _) = bpeTrainLog(Tables.documentsSpread(s, d), 4)
        log.toDF("it", "merge_left", "merge_right", "pair_count")
          .select(col("it").cast("int").as("it"), col("merge_left"),
            col("merge_right"), col("pair_count").cast("long").as("pair_count"))
          .orderBy("it")
      },
      Some {
        val iters = (1 to 4).map { i =>
          s"""p$i AS (SELECT syms[i] AS a, syms[i+1] AS b, CAST(SUM(f) AS BIGINT) AS cnt
               FROM (SELECT f, syms, unnest(range(1, len(syms))) AS i FROM w${i - 1})
               GROUP BY 1, 2),
             m$i AS (SELECT a, b, cnt FROM p$i ORDER BY cnt DESC, a, b LIMIT 1),
             w$i AS (SELECT f, list_reduce(list_transform(syms, s -> [s]),
                       (acc, x) -> CASE WHEN acc[-1] = m.a AND x[1] = m.b
                                   THEN list_concat(acc[1:len(acc)-1], [m.a || m.b])
                                   ELSE list_concat(acc, x) END) AS syms
                     FROM w${i - 1} CROSS JOIN m$i m)"""
        }.mkString(",\n        ")
        s"""WITH w0 AS (
            SELECT string_split(tok, '') AS syms, CAST(COUNT(*) AS BIGINT) AS f
            FROM (SELECT unnest(string_split(lower(text), ' ')) AS tok FROM documents)
            WHERE tok <> '' GROUP BY 1),
          $iters
          SELECT * FROM (
            SELECT 1 AS it, a AS merge_left, b AS merge_right, cnt AS pair_count FROM m1
            UNION ALL SELECT 2, a, b, cnt FROM m2
            UNION ALL SELECT 3, a, b, cnt FROM m3
            UNION ALL SELECT 4, a, b, cnt FROM m4)
          ORDER BY it"""
      }),

    // t16b — MERGE-BATCHED BPE training (the production-training path:
    // rounds are O(vocab/k), not O(vocab)). Per round: one job fetches
    // top-64 candidates, a greedy pass keeps each candidate iff it is
    // symbol-disjoint from every already-kept one (the maximal
    // compatible prefix set), one fold applies the whole batch —
    // 8 rounds train a 64+-merge vocab in 8 jobs where the sequential
    // trainer needs one per merge. The oracle replays the IDENTICAL
    // policy: same candidate ranking (count desc, split halves), the
    // greedy selection as a bounded list_reduce fold over the ranked
    // candidate list, and the same one-pass membership fold — so a
    // drift in the compatibility rule, the batch application's cascade
    // semantics, or tie order hash-mismatches even when round 1 agrees.
    // (Oracle fold note: the greedy lambda always returns
    // list_concat(acc, kept-or-empty) — a CASE branch returning BARE
    // acc corrupts DuckDB 1.0's list_reduce accumulator on longer
    // lists; measured: [5,1,6,2,7,3] keep-if-no-larger gave [7]
    // instead of [5,6,7].)
    Q("t16b_bpe_train_batched",
      (s, d) => {
        import s.implicits._
        val (log, _) = bpeTrainBatchedLog(Tables.documentsSpread(s, d),
          rounds = 8, k = 64)
        log.toDF("round", "rn", "merge_left", "merge_right", "pair_count")
          .select(col("round").cast("int").as("round"),
            col("rn").cast("int").as("rn"), col("merge_left"),
            col("merge_right"), col("pair_count").cast("long").as("pair_count"))
          .orderBy("round", "rn")
      },
      Some {
        val iters = (1 to 8).map { i =>
          s"""p$i AS (SELECT syms[i] AS a, syms[i+1] AS b, CAST(SUM(f) AS BIGINT) AS cnt
               FROM (SELECT f, syms, unnest(range(1, len(syms))) AS i FROM w${i - 1})
               GROUP BY 1, 2),
             t$i AS (SELECT a, b, cnt, rn FROM (
                 SELECT a, b, cnt, row_number() OVER (ORDER BY cnt DESC, a, b) AS rn
                 FROM p$i)
               WHERE rn <= 64),
             c$i AS (SELECT list(struct_pack(a := a, b := b, cnt := cnt, rn := rn)
                       ORDER BY rn) AS cands FROM t$i),
             g$i AS (SELECT list_reduce(list_transform(cands, c -> [c]),
                       (acc, x) -> list_concat(acc, CASE WHEN len(list_filter(acc,
                           kk -> kk.a IN (x[1].a, x[1].b) OR kk.b IN (x[1].a, x[1].b))) = 0
                         THEN x ELSE [] END)) AS kept
                     FROM c$i WHERE len(cands) > 0),
             k$i AS (SELECT u.a AS a, u.b AS b, u.cnt AS cnt, u.rn AS rn
                     FROM (SELECT unnest(kept) AS u FROM g$i)),
             kl$i AS (SELECT coalesce(list(a || ' ' || b), []::VARCHAR[]) AS ks FROM k$i),
             w$i AS (SELECT f, list_reduce(list_transform(syms, s -> [s]),
                       (acc, x) -> CASE WHEN list_contains(ks, acc[-1] || ' ' || x[1])
                                   THEN list_concat(acc[1:len(acc)-1], [acc[-1] || x[1]])
                                   ELSE list_concat(acc, x) END) AS syms
                     FROM w${i - 1} CROSS JOIN kl$i)"""
        }.mkString(",\n        ")
        val union = (1 to 8).map(i =>
          s"SELECT $i AS round, CAST(rn AS INT) AS rn, a AS merge_left, " +
            s"b AS merge_right, cnt AS pair_count FROM k$i")
          .mkString("\n            UNION ALL ")
        s"""WITH w0 AS (
            SELECT string_split(tok, '') AS syms, CAST(COUNT(*) AS BIGINT) AS f
            FROM (SELECT unnest(string_split(lower(text), ' ')) AS tok FROM documents)
            WHERE tok <> '' GROUP BY 1),
          $iters
          SELECT * FROM (
            $union)
          ORDER BY round, rn"""
      }),

    // t17 — BPE ENCODE: apply t16's trained merges to every document —
    // the job a pipeline actually runs at 100 TB once the tokenizer is
    // trained (the trainer touches the vocab; the encoder touches the
    // corpus). The scale trick mirrors training: merges are applied to
    // the DISTINCT-word vocabulary only (4 chained folds over
    // vocab-sized rows), and the corpus-sized work is one (pos, tok)
    // explode joined to the encoded vocab on the word key — the fold
    // never runs on corpus rows, and the join is shuffle-keyed on the
    // token (broadcastable when the vocab is; AQE decides). Per-doc
    // output is order-exact: pieces reassemble by token position, and
    // the gate pins the full piece STREAM via md5, so a drifted merge
    // rule, tie order, or position handling mismatches even when counts
    // agree. The oracle retrains and re-encodes from scratch with the
    // identical list_reduce fold.
    Q("t17_bpe_encode",
      (s, d) => {
        val docs = Tables.documentsSpread(s, d)
        val log = bpeMergesArtifact(s, d, 4)
        var enc = wordCounts(docs).select(col("tok"),
          expr("filter(split(tok, ''), x -> x <> '')").as("symbols"))
        for ((_, a, b, _) <- log) enc = applyMerge(enc, a, b)
        val stream = docs
          .select(col("doc_id"), posexplode(tokens).as(Seq("pos", "tok")))
          .where(col("tok") =!= "")
        stream.join(enc.select("tok", "symbols"), Seq("tok"))
          .groupBy("doc_id")
          .agg(
            count(lit(1)).cast("int").as("n_words"),
            expr("""flatten(transform(
                array_sort(collect_list(struct(pos, symbols))),
                x -> x.symbols))""").as("pieces"))
          .select(col("doc_id"), col("n_words"),
            size(col("pieces")).cast("int").as("n_pieces"),
            md5(concat_ws("\u0001", col("pieces"))).as("pieces_md5"))
          .orderBy("doc_id")
      },
      Some {
        s"""WITH $bpeW4Cte,
          stream AS (
            SELECT doc_id, unnest(t) AS tok, unnest(range(1, len(t) + 1)) AS pos
            FROM (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents)),
          perdoc AS (
            SELECT doc_id, CAST(COUNT(*) AS INT) AS n_words,
              flatten(list(syms ORDER BY pos)) AS pieces
            FROM stream JOIN w4 USING (tok)
            GROUP BY doc_id)
          SELECT doc_id, n_words, CAST(len(pieces) AS INT) AS n_pieces,
            md5(array_to_string(pieces, chr(1))) AS pieces_md5
          FROM perdoc ORDER BY doc_id"""
      }),

    // Tokenizer EVAL — per-language fertility (pieces per word) of the
    // trained BPE, the number a tokenizer team actually ships reports
    // on (a vocabulary that fragments one language 2× more than
    // another skews its effective compute share in training). Reuses
    // t16/t17's train+encode machinery end-to-end; the rollup keeps
    // the counts exact bigints and performs ONE double division (same
    // operands both engines → same bits, the q1/cents posture). At
    // 100 TB: the encode is a distinct-WORD frame join (vocabulary-
    // sized state, corpus-sized stream map-side), the rollup is a
    // |langs|-row aggregate.
    Q("t20_bpe_fertility",
      (s, d) => {
        val docs = Tables.documentsSpread(s, d)
        val log = bpeMergesArtifact(s, d, 4)
        var enc = wordCounts(docs).select(col("tok"),
          expr("filter(split(tok, ''), x -> x <> '')").as("symbols"))
        for ((_, a, b, _) <- log) enc = applyMerge(enc, a, b)
        val stream = docs
          .select(col("lang"), explode(tokens).as("tok"))
          .where(col("tok") =!= "")
        stream.join(enc.select(col("tok"), size(col("symbols")).as("n_sym")),
            Seq("tok"))
          .groupBy("lang")
          .agg(count(lit(1)).cast("bigint").as("n_words"),
            sum("n_sym").cast("bigint").as("n_pieces"))
          .withColumn("fertility",
            col("n_pieces").cast("double") / col("n_words").cast("double"))
          .select("lang", "n_words", "n_pieces", "fertility")
          .orderBy("lang")
      },
      Some(s"""WITH $bpeW4Cte,
          stream AS (
            SELECT lang, unnest(string_split(lower(text), ' ')) AS tok
            FROM documents),
          j AS (
            SELECT lang, len(syms) AS n_sym
            FROM stream JOIN w4 USING (tok) WHERE tok <> '')
          SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_words,
            CAST(SUM(n_sym) AS BIGINT) AS n_pieces,
            CAST(SUM(n_sym) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS fertility
          FROM j GROUP BY lang ORDER BY lang""")),

    // d11 — cross-source contamination matrix: distinct-shingle Jaccard
    // overlap between every pair of corpus sources (the "is my web crawl
    // leaking into my books split?" QA report). The pair join is keyed
    // on the shingle — a shingle present in k sources emits C(k,2) rows,
    // k ≤ |sources| — so the shuffle is shingle-blocked, never a
    // document cross join. Jaccard = |A∩B| / (|A|+|B|−|A∩B|), one
    // division of exact longs.
    Q("d11_source_overlap",
      (s, d) => {
        // (source, shingle) distinct pairs; per-doc duplicates collapse in
        // the same global distinct, so the cheaper non-distinct gram form
        // is used per document (TextOps' aggregate-fenced expression — a
        // naive per-element split would be O(tokens²) per doc).
        // Shingles are hashed to 8-byte xxhash64 keys in the narrow
        // projection right after the explode, BEFORE the distinct: the
        // global distinct and the pair self-join then exchange longs
        // instead of ~30-byte trigram strings (measured ~4x on this
        // query — the shuffles carry the full text volume otherwise).
        // Distinct-hash counts equal distinct-string counts modulo
        // 64-bit collisions (~n²/2⁶⁵ — negligible at any corpus size
        // this report runs at), so the oracle keeps counting strings.
        val sh = Tables.documentsSpread(s, d)
          .select(col("source"),
            explode(TextOps.ngramsExpr(3, distinct = false)).as("shingle"))
          .select(col("source"), xxhash64(col("shingle")).as("sh"))
          .distinct()
        val sizes = sh.groupBy("source").agg(count(lit(1)).as("n"))
        val a = sh.select(col("source").as("src_a"), col("sh"))
        val b = sh.select(col("source").as("src_b"), col("sh").as("sh_b"))
        a.join(b, col("sh") === col("sh_b") && col("src_a") < col("src_b"))
          .groupBy("src_a", "src_b")
          .agg(count(lit(1)).as("n_common"))
          .join(sizes.select(col("source").as("src_a"), col("n").as("n_a")), "src_a")
          .join(sizes.select(col("source").as("src_b"), col("n").as("n_b")), "src_b")
          .select(col("src_a"), col("src_b"),
            col("n_common").cast("long").as("n_common"),
            col("n_a").cast("long").as("n_a"),
            col("n_b").cast("long").as("n_b"),
            (col("n_common").cast("double") /
              (col("n_a") + col("n_b") - col("n_common")).cast("double")).as("jaccard"))
          .orderBy("src_a", "src_b")
      },
      Some("""WITH tok AS (
          SELECT source, string_split(lower(text), ' ') AS t FROM documents),
        sh AS (SELECT DISTINCT source, unnest(list_transform(range(1, len(t)-1),
                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
               FROM tok WHERE len(t) >= 3),
        sizes AS (SELECT source, COUNT(*) AS n FROM sh GROUP BY source),
        inter AS (SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS n_common
                  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.source < b.source
                  GROUP BY 1, 2)
        SELECT src_a, src_b, CAST(n_common AS BIGINT) AS n_common,
          sa.n AS n_a, sb.n AS n_b,
          CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) AS jaccard
        FROM inter
        JOIN sizes sa ON src_a = sa.source
        JOIN sizes sb ON src_b = sb.source
        ORDER BY src_a, src_b""")),

    // t15 — per-document n-gram novelty: the fraction of a document's
    // distinct 3-gram shingles that appear in NO other document. The
    // per-doc curation signal between t2's intrinsic quality and the
    // d-family's pairwise dedup: low novelty flags boilerplate/templated
    // content that near-dup thresholds may not catch, high novelty marks
    // genuinely fresh text worth upweighting. Shape: d11's exact
    // machinery pointed at docs instead of sources — shingles hash to
    // 8-byte xxhash64 keys BEFORE the distinct (the d11 lesson: long
    // shuffle keys, not ~30-byte trigram strings; the oracle keeps
    // counting strings, identical modulo ~n²/2⁶⁵ collisions), one
    // doc-count aggregate per shingle, one join back. Novelty is a
    // single division of exact longs — bit-stable.
    Q("t15_ngram_novelty",
      (s, d) => {
        val sh = Tables.documentsSpread(s, d)
          .select(col("doc_id"),
            explode(TextOps.ngramsExpr(3, distinct = false)).as("shingle"))
          .select(col("doc_id"), xxhash64(col("shingle")).as("sh"))
          .distinct() // per-doc distinct shingles
        val docsPer = sh.groupBy("sh").agg(count(lit(1)).as("n_docs"))
        sh.join(docsPer, "sh")
          .groupBy("doc_id")
          .agg(count(lit(1)).cast("long").as("n_shingles"),
            sum(when(col("n_docs") === 1, 1L).otherwise(0L)).cast("long")
              .as("n_unique"))
          .withColumn("novelty",
            col("n_unique").cast("double") / col("n_shingles").cast("double"))
          .orderBy("doc_id")
      },
      Some("""WITH tok AS (
          SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
        sh AS (SELECT DISTINCT doc_id, unnest(list_transform(range(1, len(t)-1),
                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
               FROM tok WHERE len(t) >= 3),
        dps AS (SELECT shingle, COUNT(*) AS n_docs FROM sh GROUP BY shingle)
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
          CAST(SUM(CASE WHEN n_docs = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
          CAST(SUM(CASE WHEN n_docs = 1 THEN 1 ELSE 0 END) AS DOUBLE) /
            CAST(COUNT(*) AS DOUBLE) AS novelty
        FROM sh JOIN dps USING (shingle)
        GROUP BY doc_id ORDER BY doc_id""")),

    // t19 — UNIGRAM-LM tokenizer training (SentencePiece-shaped; Kudo
    // 2018), the other production tokenizer default next to BPE
    // (t16/t17): seed a piece vocabulary from substring statistics,
    // then run one hard-EM (Viterbi-EM) iteration — E-step segments
    // every word optimally under the current piece costs, M-step
    // re-estimates costs from the pieces the optimal segmentations
    // actually used. Gate output is the re-estimated vocabulary
    // (piece, n, qcost).
    //
    // Cross-engine exactness (the t13/t18 discipline): likelihoods are
    // INTEGER-QUANTIZED — cost(p) = bitlen(total div n_p) ≈ the piece's
    // surprisal in whole bits (bitlen = length of the exact binary
    // string; pure long arithmetic, bit-identical anywhere) — and the
    // E-step avoids tie-breaking entirely: instead of backtracking ONE
    // optimal segmentation (whose tie order is a float-free but fiddly
    // contract), it counts every piece occurrence lying on ANY optimal
    // path — occurrence (j, L) is on an optimal path iff
    // dpF[j] + cost + dpB[n-j-L] = dpF[n], with dpF/dpB the
    // forward/backward Viterbi arrays. That set is unique by
    // construction (the 0-temperature posterior support), so no
    // tie-break can drift between engines.
    //
    // Scale shape: everything after wordCounts is VOCAB-sized (the BPE
    // trick): substring seeding, the DP (one aggregate() fold per
    // DISTINCT word — array HOFs, codegen'd, no UDF), and the
    // occurrence explode (≤ 3·len per distinct word). The piece-cost
    // table is bounded (singles + top-150 multis) and broadcast as two
    // one-row map frames; the only corpus-sized work remains the
    // word-count shuffle with map-side combine.
    Q("t19_unigram_lm",
      (s, d) => {
        val INF = "cast(1000000000 as bigint)"
        // forward Viterbi over `tokCol` with piece-cost map `mapCol`:
        // dp[0] = 0; dp[i] = min over L in 1..3 of dp[i-L] + cost
        def dpExpr(tokCol: String, mapCol: String) = expr(
          s"""aggregate(sequence(1, length($tokCol)),
             array(cast(0 as bigint)),
             (acc, i) -> concat(acc, array(least(
               element_at(acc, i) +
                 coalesce(element_at($mapCol, substring($tokCol, i, 1)), $INF),
               if(i >= 2, element_at(acc, i - 1) +
                 coalesce(element_at($mapCol, substring($tokCol, i - 1, 2)), $INF), $INF),
               if(i >= 3, element_at(acc, i - 2) +
                 coalesce(element_at($mapCol, substring($tokCol, i - 2, 3)), $INF), $INF)))))""")
        val words = wordCounts(Tables.documentsSpread(s, d))
        // seed statistics: every substring occurrence of length 1..3,
        // weighted by word frequency (vocab-sized explode)
        val seed = words.select(col("wc"),
          explode(expr("""flatten(transform(sequence(1, length(tok)),
              j -> transform(sequence(1, least(3, length(tok) - j + 1)),
                L -> substring(tok, j, L))))""")).as("piece"))
          .groupBy("piece").agg(sum("wc").as("n"))
        // kept vocabulary: ALL single chars (so every word stays
        // segmentable) + the top-150 multi-char pieces (TakeOrdered,
        // no global window)
        // materialized once (≤ singles + 150 rows): `costed` and its
        // broadcast total would otherwise each re-run the substring
        // seed explode + aggregate
        val kept = seed.where(length(col("piece")) === 1).unionByName(
          seed.where(length(col("piece")) >= 2)
            .orderBy(col("n").desc, col("piece")).limit(150))
          .localCheckpoint(true)
        val costed = kept
          .crossJoin(broadcast(kept.agg(sum("n").as("tot"))))
          .select(col("piece"),
            length(conv(expr("tot div n"), 10, 2)).cast("long").as("qc"))
        val pmDf = costed.agg(map_from_entries(
          collect_list(struct(col("piece"), col("qc")))).as("pm"))
        val pmrDf = costed.agg(map_from_entries(
          collect_list(struct(reverse(col("piece")), col("qc")))).as("pmr"))
        val withDp = words
          .crossJoin(broadcast(pmDf)).crossJoin(broadcast(pmrDf))
          .withColumn("rtok", reverse(col("tok")))
          .withColumn("dpf", dpExpr("tok", "pm"))
          .withColumn("dpb", dpExpr("rtok", "pmr"))
        // E-step: pieces on ANY optimal path (tie-free posterior support)
        val eocc = withDp.select(col("wc"),
          explode(expr(
            s"""filter(flatten(transform(sequence(0, length(tok) - 1),
                j -> transform(sequence(1, least(3, length(tok) - j)),
                  L -> struct(substring(tok, j + 1, L) AS piece,
                    element_at(dpf, j + 1) AS pre,
                    element_at(dpb, length(tok) - j - L + 1) AS post)))),
              o -> o.pre + coalesce(element_at(pm, o.piece), $INF) + o.post
                   = element_at(dpf, -1))""")).as("o"))
          .select(col("wc"), col("o.piece").as("piece"))
        // M-step: re-estimated counts and requantized costs. The counts
        // frame is materialized ONCE (vocab-sized) — its two consumers
        // (the output rows and the broadcast total) would otherwise each
        // re-run the whole E-step DP + occurrence explode, the query's
        // dominant term (r14).
        val mstep = eocc.groupBy("piece").agg(sum("wc").as("n"))
          .localCheckpoint(true)
        mstep
          .crossJoin(broadcast(mstep.agg(sum("n").as("tot"))))
          .select(col("piece"), col("n").cast("long").as("n"),
            length(conv(expr("tot div n"), 10, 2)).cast("long").as("qcost"))
          .orderBy("piece")
      },
      Some("""WITH words AS (
          SELECT tok, CAST(COUNT(*) AS BIGINT) AS wc FROM (
            SELECT unnest(string_split(lower(text), ' ')) AS tok FROM documents)
          WHERE tok <> '' GROUP BY tok),
        s0 AS (SELECT wc, tok, unnest(range(1, length(tok) + 1)) AS j FROM words),
        s1 AS (SELECT wc,
            substring(tok, CAST(j AS INT), CAST(L AS INT)) AS piece
          FROM s0, (VALUES (1), (2), (3)) Ls(L)
          WHERE j + L - 1 <= length(tok)),
        seed AS (SELECT piece, CAST(SUM(wc) AS BIGINT) AS n FROM s1 GROUP BY piece),
        kept AS (
          SELECT piece, n FROM seed WHERE length(piece) = 1
          UNION ALL
          SELECT piece, n FROM (SELECT piece, n FROM seed
            WHERE length(piece) >= 2 ORDER BY n DESC, piece LIMIT 150)),
        tot AS (SELECT SUM(n) AS t FROM kept),
        costed AS (SELECT piece,
            CAST(length(format('{:b}', CAST(t // n AS BIGINT))) AS BIGINT) AS qc
          FROM kept, tot),
        maps AS (SELECT
            map(list(piece ORDER BY piece), list(qc ORDER BY piece)) AS pm,
            map(list(reverse(piece) ORDER BY piece), list(qc ORDER BY piece)) AS pmr
          FROM costed),
        dpw AS (
          SELECT wc, tok, pm,
            list_reduce(
              list_concat([[CAST(0 AS BIGINT)]],
                list_transform(range(1, length(tok) + 1), i -> [i])),
              (acc, x) -> list_concat(acc, [least(
                acc[CAST(x[1] AS INT)] + coalesce(
                  map_extract(pm, substring(tok, CAST(x[1] AS INT), 1))[1], 1000000000),
                CASE WHEN x[1] >= 2 THEN acc[CAST(x[1] AS INT) - 1] + coalesce(
                  map_extract(pm, substring(tok, CAST(x[1] AS INT) - 1, 2))[1], 1000000000)
                  ELSE 1000000000 END,
                CASE WHEN x[1] >= 3 THEN acc[CAST(x[1] AS INT) - 2] + coalesce(
                  map_extract(pm, substring(tok, CAST(x[1] AS INT) - 2, 3))[1], 1000000000)
                  ELSE 1000000000 END)])) AS dpf,
            list_reduce(
              list_concat([[CAST(0 AS BIGINT)]],
                list_transform(range(1, length(tok) + 1), i -> [i])),
              (acc, x) -> list_concat(acc, [least(
                acc[CAST(x[1] AS INT)] + coalesce(
                  map_extract(pmr, substring(reverse(tok), CAST(x[1] AS INT), 1))[1], 1000000000),
                CASE WHEN x[1] >= 2 THEN acc[CAST(x[1] AS INT) - 1] + coalesce(
                  map_extract(pmr, substring(reverse(tok), CAST(x[1] AS INT) - 1, 2))[1], 1000000000)
                  ELSE 1000000000 END,
                CASE WHEN x[1] >= 3 THEN acc[CAST(x[1] AS INT) - 2] + coalesce(
                  map_extract(pmr, substring(reverse(tok), CAST(x[1] AS INT) - 2, 3))[1], 1000000000)
                  ELSE 1000000000 END)])) AS dpb
          FROM words, maps),
        e0 AS (SELECT wc, tok, pm, dpf, dpb,
            unnest(range(0, length(tok))) AS j FROM dpw),
        e AS (SELECT wc,
            substring(tok, CAST(j + 1 AS INT), CAST(L AS INT)) AS piece
          FROM e0, (VALUES (1), (2), (3)) Ls(L)
          WHERE j + L <= length(tok)
            AND dpf[CAST(j + 1 AS INT)]
              + coalesce(map_extract(pm,
                  substring(tok, CAST(j + 1 AS INT), CAST(L AS INT)))[1], 1000000000)
              + dpb[CAST(length(tok) - j - L + 1 AS INT)]
              = dpf[-1]),
        newc AS (SELECT piece, CAST(SUM(wc) AS BIGINT) AS n FROM e GROUP BY piece),
        newtot AS (SELECT SUM(n) AS t FROM newc)
        SELECT piece, n,
          CAST(length(format('{:b}', CAST(t // n AS BIGINT))) AS BIGINT) AS qcost
        FROM newc, newtot ORDER BY piece""")),

    // p5 — tokenized training shards end to end: the composition a
    // shard writer actually ships. Documents are BPE-encoded with the
    // trained merges (t17's vocabulary-frame join — the corpus-sized
    // stream is map-side against vocab-sized encode state), each
    // source's piece stream is laid end to end (c6's HIERARCHICAL
    // cumsum: in-bucket window bounded at 10k rows, bucket bases a
    // per-bucket prefix — no single-partition window at any corpus
    // size), and every fixed-length 256-piece training sequence is
    // emitted with its piece count, contributing-doc count, and a
    // content md5 over the pieces in stream order — the row a shard
    // manifest signs. One (source, seq) shuffle of (gpos, piece) pairs
    // is the only corpus-sized exchange after the encode join.
    Q("p5_token_shards",
      (s, d) => {
        val L = 256
        val docs = Tables.documentsSpread(s, d)
        val log = bpeMergesArtifact(s, d, 4)
        var enc = wordCounts(docs).select(col("tok"),
          expr("filter(split(tok, ''), x -> x <> '')").as("symbols"))
        for ((_, a, b, _) <- log) enc = applyMerge(enc, a, b)
        val stream = docs
          .select(col("doc_id"), col("source"), posexplode(tokens).as(Seq("pos", "tok")))
          .where(col("tok") =!= "")
        // eager: the in-bucket window and the bucket-base aggregate are
        // independent consumers whose column-pruned copies of this
        // subtree canonicalize differently, so exchange reuse does NOT
        // fire — the token explode + encode join + collect_list agg ran
        // twice (JobProbe r13: twin 1.4/1.5 s jobs writing the same
        // 30.8 MB). One checkpoint, pieces-stream-sized.
        val perDoc = stream.join(enc.select("tok", "symbols"), Seq("tok"))
          .groupBy("doc_id", "source")
          .agg(expr("""flatten(transform(
              array_sort(collect_list(struct(pos, symbols))),
              x -> x.symbols))""").as("pieces"))
          .withColumn("n_pieces", size(col("pieces")).cast("long"))
          .withColumn("bucket", expr("doc_id div 10000"))
          // pre-partition by the window key BEFORE materializing: AQE
          // coalesces the collect_list aggregate's output to one ~30 MB
          // partition, and a 1-partition checkpoint serializes the next
          // exchange's whole map side (JobProbe r14: a 0.58 s single-task
          // job re-writing the 30.8 MB pieces stream). The checkpoint
          // preserves its partitioning, so the in-bucket window AND the
          // bucket-base aggregate both read it pre-partitioned — the
          // repartition replaces the window exchange instead of adding one.
          .repartition(col("source"), col("bucket"))
          .localCheckpoint(true)
        import org.apache.spark.sql.expressions.Window
        val wIn = Window.partitionBy("source", "bucket").orderBy("doc_id")
        val within = perDoc.withColumn("cum_in", sum(col("n_pieces")).over(wIn))
        val wBk = Window.partitionBy("source").orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, -1)
        val base = within.groupBy("source", "bucket")
          .agg(sum(col("n_pieces")).as("tot"))
          .withColumn("bucket_base", coalesce(sum(col("tot")).over(wBk), lit(0L)))
          .select("source", "bucket", "bucket_base")
        within.join(base, Seq("source", "bucket"))
          .withColumn("start_off", col("bucket_base") + col("cum_in") - col("n_pieces"))
          .select(col("source"), col("doc_id"), col("start_off"),
            posexplode(col("pieces")).as(Seq("i", "piece")))
          .withColumn("gpos", col("start_off") + col("i"))
          .groupBy(col("source"), expr(s"gpos div $L").as("seq_id"))
          .agg(count(lit(1)).cast("int").as("n_pieces"),
            countDistinct(col("doc_id")).cast("int").as("n_docs"),
            md5(concat_ws("\u0001",
              expr("transform(array_sort(collect_list(struct(gpos, piece))), x -> x.piece)")))
              .as("seq_md5"))
          // eager before the total ORDER BY: the range partitioner's
          // sampling pass re-executes its child, and here the child is
          // the per-sequence collect+md5 aggregate (JobProbe r13: a
          // 1.8 s sampling twin of the 1.2 s output job). The sequence
          // manifest is rows-of-digests — tiny.
          .localCheckpoint(true)
          .orderBy("source", "seq_id")
      },
      Some {
        s"""WITH $bpeW4Cte,
          stream AS (
            SELECT doc_id, source, unnest(t) AS tok, unnest(range(1, len(t) + 1)) AS pos
            FROM (SELECT doc_id, source, string_split(lower(text), ' ') AS t FROM documents)),
          perdoc AS (
            SELECT doc_id, source, flatten(list(syms ORDER BY pos)) AS pieces
            FROM stream JOIN w4 USING (tok)
            GROUP BY doc_id, source),
          off AS (
            SELECT doc_id, source, pieces,
              CAST(SUM(len(pieces)) OVER (PARTITION BY source ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                - len(pieces) AS start_off
            FROM perdoc),
          pp AS (
            SELECT source, doc_id,
              start_off + unnest(range(0, len(pieces))) AS gpos,
              unnest(pieces) AS piece
            FROM off)
          SELECT source, gpos // 256 AS seq_id,
            CAST(COUNT(*) AS INT) AS n_pieces,
            CAST(COUNT(DISTINCT doc_id) AS INT) AS n_docs,
            md5(string_agg(piece, chr(1) ORDER BY gpos)) AS seq_md5
          FROM pp GROUP BY source, seq_id ORDER BY source, seq_id"""
      })
  )
}
