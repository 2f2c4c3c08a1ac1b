package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp
import java.time.Instant

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.queries.TextOps

class DocStreamSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.from(Instant.parse(s))

  private val good = ("the quick brown fox jumps over a lazy dog while " +
    "seventeen sparrows argue about breadcrumbs near the old stone bridge")
  private val withPii = ("every database engine eventually reinvents half " +
    "of a filesystem, writes to admin@db.example.com and calls 555-867-5309")

  test("streaming ingest filters, dedups within watermark, and scrubs") {
    val base = Files.createTempDirectory("graft-docstream").toString
    val landing = s"$base/landing"; val out = s"$base/out"; val ckpt = s"$base/ckpt"

    def docs(rows: (Long, String, String, Timestamp)*) =
      rows.toDF("doc_id", "lang", "text", "ingest_ts")
    val schema = docs((1L, "en", "x", ts("2024-08-12T00:00:00Z"))).schema

    // batch 1: a good doc, an exact dup of it, a too-short doc, spam
    docs(
      (1L, "en", good, ts("2024-08-12T00:00:00Z")),
      (2L, "en", good, ts("2024-08-12T00:10:00Z")),
      (3L, "en", "too short to keep", ts("2024-08-12T00:20:00Z")),
      (4L, "en", Seq.fill(40)("spam").mkString(" "), ts("2024-08-12T00:30:00Z")))
      .coalesce(1).write.parquet(s"$landing/b1")

    DocStream.preparedIngest(spark, s"$landing/*", schema, out, ckpt)
      .awaitTermination()
    val got1 = spark.read.parquet(out)
    assert(got1.select("doc_id").as[Long].collect().toSet == Set(1L))

    // batch 2: another dup of the first doc (inside the 1 h watermark of
    // the running state) and a new doc with PII — only the new one lands
    docs(
      (5L, "en", good, ts("2024-08-12T00:40:00Z")),
      (6L, "en", withPii, ts("2024-08-12T00:50:00Z")))
      .coalesce(1).write.parquet(s"$landing/b2")

    DocStream.preparedIngest(spark, s"$landing/*", schema, out, ckpt)
      .awaitTermination()
    val got2 = spark.read.parquet(out)
    assert(got2.select("doc_id").as[Long].collect().toSet == Set(1L, 6L))

    val r6 = got2.where($"doc_id" === 6L).collect().head
    assert(r6.getAs[Int]("n_emails") == 1)
    assert(r6.getAs[Int]("n_phones") == 1)
    val red = r6.getAs[String]("redacted")
    assert(red.contains("<EMAIL>") && red.contains("<PHONE>"))
    assert(!red.contains("example.com") && !red.contains("867"))
    // content hash travels with the row (the batch d1/c1 collapse key)
    assert(r6.getAs[String]("content_hash").length == 32)
  }

  test("inline repetition stats match the shuffle-shaped batch stats") {
    val rnd = new scala.util.Random(7)
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    val docs = (1L to 60L).map { i =>
      val n = 1 + rnd.nextInt(30)
      (i, Seq.fill(n)(words(rnd.nextInt(words.size))).mkString(" "))
    }.toDF("doc_id", "text")
    val cols = Seq("doc_id", "n_tokens", "top_cnt",
      "dup_2g_frac", "dup_3g_frac", "top_tok_frac", "keep")
    val inline = TextOps.repetitionStatsInline(docs)
      .selectExpr(cols: _*).orderBy("doc_id").collect().toSeq
    val shuffled = TextOps.repetitionStats(docs)
      .selectExpr(cols: _*).orderBy("doc_id").collect().toSeq
    assert(inline == shuffled)
  }

  test("the inline stat stage adds no shuffle to a streaming-less plan") {
    val docs = Seq((1L, good)).toDF("doc_id", "text")
    val plan = TextOps.repetitionStatsInline(docs)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("nearDupScreen accumulates index state across streaming runs") {
    val base = Files.createTempDirectory("graft-neardup-stream").toString
    val landing = s"$base/landing"; val index = s"$base/index"
    val pairs = s"$base/pairs"; val ckpt = s"$base/ckpt"

    val aText = good
    val bText = good + " with one extra clause appended at the end"
    def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")
    val schema = docs((0L, "x")).schema

    // run 1: two unrelated-ish docs — near-dup pair (1,2) found in-batch
    docs((1L, aText), (2L, bText)).coalesce(1).write.parquet(s"$landing/w1")
    DocStream.nearDupScreen(spark, s"$landing/*", schema, index, pairs, ckpt)
      .awaitTermination()
    val p1 = spark.read.parquet(pairs)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(p1 == Set((1L, 2L)))

    // run 2 (separate query, same checkpoint): a doc near-dup of run 1's
    // content — caught against the PERSISTED index, beyond any watermark
    docs((7L, aText + " trailing")).coalesce(1).write.parquet(s"$landing/w2")
    DocStream.nearDupScreen(spark, s"$landing/*", schema, index, pairs, ckpt)
      .awaitTermination()
    val p2 = spark.read.parquet(pairs)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(p2.contains((1L, 7L)) && p2.contains((2L, 7L)), p2.toString)
    assert(graft.llm.DedupIndex.size(spark, index) == 3L)
  }

  test("nearDupScreen compacts the index on its batch cadence") {
    val base = Files.createTempDirectory("graft-neardup-compact").toString
    val landing = s"$base/landing"; val index = s"$base/index"
    val pairs = s"$base/pairs"; val ckpt = s"$base/ckpt"
    // four distinct docs in four files → four single-file batches at
    // maxFilesPerTrigger=1; compactEvery=2 fires the fold at batches 1,3
    val texts = Seq(
      "alpha " + good, "bravo " + withPii.replace("admin", "ops"),
      "charlie seventeen storks discuss estuaries at dawn near the weir",
      "delta a completely different sentence about compilers and marshes")
    texts.zipWithIndex.foreach { case (t, i) =>
      Seq((i.toLong + 1, t)).toDF("doc_id", "text")
        .coalesce(1).write.parquet(s"$landing/f$i")
    }
    val schema = Seq((0L, "x")).toDF("doc_id", "text").schema
    DocStream.nearDupScreen(spark, s"$landing/*", schema, index, pairs, ckpt,
      maxFilesPerTrigger = 1, compactEvery = 2, compactTargetFiles = 1)
      .awaitTermination()

    // batch 3's compaction folded everything appended since batch 1's:
    // both index tables sit at the target file count, and the ledger
    // still carries all four docs
    for (t <- Seq("sigs", "bands")) {
      val n = new java.io.File(s"$index/$t")
        .listFiles().count(f => f.getName.endsWith(".parquet"))
      assert(n == 1, s"$t holds $n files after cadence compaction")
    }
    assert(graft.llm.DedupIndex.size(spark, index) == 4L)
  }

  test("textIngest accumulates the lexical index across runs and compacts on cadence") {
    val base = Files.createTempDirectory("graft-textidx-stream").toString
    val landing = s"$base/landing"; val index = s"$base/index"
    val ckpt = s"$base/ckpt"
    val sf = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "text")
    val schema = docs.schema
    val terms = Seq("hash", "scan", "merge")
    import org.apache.spark.sql.functions.col
    def batchTopK(d: org.apache.spark.sql.DataFrame) =
      TextOps.bm25(d, terms).where(col("bm25") > 0d)
        .orderBy(col("bm25").desc, col("doc_id")).limit(25)
        .collect().map(_.toSeq).toSeq
    def idxTopK() =
      graft.llm.TextIndex.search(spark, index, terms, 25)
        .collect().map(_.toSeq).toSeq

    // run 1: first half of the corpus in two landed files → two batches
    // at maxFilesPerTrigger=1; compactEvery=2 fires the fold at batch 1
    docs.where(col("doc_id") % 2 === 0).coalesce(1)
      .write.parquet(s"$landing/w1")
    docs.where(col("doc_id") % 2 =!= 0 && col("doc_id") % 4 === 1)
      .coalesce(1).write.parquet(s"$landing/w2")
    DocStream.textIngest(spark, s"$landing/*", schema, index, ckpt,
      maxFilesPerTrigger = 1, compactEvery = 2, compactTargetFiles = 1)
      .awaitTermination()
    for (t <- Seq("postings", "docs")) {
      val n = new java.io.File(s"$index/$t")
        .listFiles().count(f => f.getName.endsWith(".parquet"))
      assert(n == 1, s"$t holds $n files after cadence compaction")
    }
    assert(idxTopK() ==
      batchTopK(docs.where(col("doc_id") % 4 =!= 3)))

    // run 2 (separate query, same checkpoint): the rest of the corpus —
    // the stored index must now serve the FULL corpus scorer bit-exactly
    docs.where(col("doc_id") % 4 === 3).coalesce(1)
      .write.parquet(s"$landing/w3")
    DocStream.textIngest(spark, s"$landing/*", schema, index, ckpt,
      maxFilesPerTrigger = 1, compactEvery = 2, compactTargetFiles = 1)
      .awaitTermination()
    assert(graft.llm.TextIndex.size(spark, index) == docs.count())
    assert(idxTopK() == batchTopK(docs))
  }
}
