package graft.llm

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, Tables, TestSpark}

/** c11_epoch_plan — the hierarchical (bucket-then-boundary) remainder
  * prefix must equal the flat one-window greedy it replaces, and the
  * materialized token counts must hit the budget envelope.
  */
class EpochPlanSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.01"
  private lazy val spark = TestSpark.spark

  private def gated = SparkEntry.queries("c11_epoch_plan")(spark, sf)

  test("hierarchical prefix equals the flat per-source cumsum greedy") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("source"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"),
      md5(col("doc_id").cast("string")).as("h"))
    val src = docs.groupBy("source").agg(sum("n_tokens").as("src_tokens"))
    val tot = src.agg(sum("src_tokens").as("all_tokens"), count(lit(1)).as("n_src"))
    val plan = src.crossJoin(broadcast(tot))
      .withColumn("target_s", expr("(all_tokens * 2) div n_src"))
      .select(col("source"), expr("target_s div src_tokens").as("full_epochs"),
        (col("target_s") % col("src_tokens")).as("rem"))
    val w = Window.partitionBy("source").orderBy("h", "doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val flat = docs
      .withColumn("prev", coalesce(sum("n_tokens").over(w), lit(0L)))
      .join(plan, Seq("source"))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        (col("full_epochs") +
          when(col("prev") < col("rem"), 1L).otherwise(0L)).as("repeats"))
      .orderBy("doc_id")
    assert(gated.collect().toSeq == flat.collect().toSeq)
  }

  test("per-source materialized tokens land in [target, target + max_doc)") {
    val out = gated
    val docs = Tables.documents(spark, sf)
      .select(col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val total = docs.agg(sum("n_tokens")).head.getLong(0)
    val nSrc = docs.select("source").distinct().count()
    val target = (total * 2) / nSrc
    val bySource = out.groupBy("source")
      .agg(sum(col("repeats") * col("n_tokens")).as("got"),
        max("n_tokens").as("max_doc"))
      .collect()
    assert(bySource.nonEmpty)
    for (r <- bySource) {
      val (got, maxDoc) = (r.getLong(1), r.getLong(2))
      assert(got >= target && got < target + maxDoc,
        s"${r.getString(0)}: materialized $got outside [$target, ${target + maxDoc})")
    }
  }

  test("fuzz: hierarchical prefix equals flat greedy on adversarial hash fixtures") {
    import spark.implicits._
    // flat reference over a (doc_id, source, n_tokens, h) fixture
    def flat(docs: org.apache.spark.sql.DataFrame) = {
      val src = docs.groupBy("source").agg(sum("n_tokens").as("src_tokens"))
      val tot = src.agg(sum("src_tokens").as("all_tokens"), count(lit(1)).as("n_src"))
      val plan = src.crossJoin(broadcast(tot))
        .withColumn("target_s", expr("(all_tokens * 2) div n_src"))
        .select(col("source"), expr("target_s div src_tokens").as("full_epochs"),
          (col("target_s") % col("src_tokens")).as("rem"))
      val w = Window.partitionBy("source").orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      docs.withColumn("prev", coalesce(sum("n_tokens").over(w), lit(0L)))
        .join(plan, Seq("source"))
        .select(col("doc_id"), col("source"), col("n_tokens"),
          (col("full_epochs") +
            when(col("prev") < col("rem"), 1L).otherwise(0L)).as("repeats"))
        .orderBy("doc_id").collect().toSeq
    }
    val rnd = new scala.util.Random(20260814L)
    def hex(n: Int) = (1 to n).map(_ => "0123456789abcdef"(rnd.nextInt(16))).mkString
    // adversarial: two equal sources (rem = 0), a single-doc source, a
    // source whose docs all share one hash prefix (one bucket), plus
    // random rounds
    val crafted = Seq(
      (1L, "eq", 10L, "aa" + hex(6)), (2L, "eq", 10L, "bb" + hex(6)),
      (3L, "eq2", 10L, "cc" + hex(6)), (4L, "eq2", 10L, "dd" + hex(6)),
      (5L, "solo", 7L, hex(8)),
      (6L, "onebkt", 3L, "7f" + hex(6)), (7L, "onebkt", 4L, "7f" + hex(6)),
      (8L, "onebkt", 5L, "7f" + hex(6)))
    val craftedDf = crafted.toDF("doc_id", "source", "n_tokens", "h")
    assert(CorpusEtl.epochPlanFrom(craftedDf).collect().toSeq == flat(craftedDf))
    for (round <- 1 to 3) {
      val rows = (1 to 300).map(i =>
        (i.toLong, s"s${rnd.nextInt(5)}", (1 + rnd.nextInt(50)).toLong, hex(8)))
      val df = rows.toDF("doc_id", "source", "n_tokens", "h")
      assert(CorpusEtl.epochPlanFrom(df).collect().toSeq == flat(df),
        s"round $round diverged")
    }
  }

  test("mixed-case hex input is normalized, not mis-ordered") {
    import spark.implicits._
    // 'F' < 'a' lexicographically but 0xF? > 0xa? numerically, so without
    // lower() the bucket order (numeric, via conv) and the in-bucket /
    // flat order (lexicographic) disagree and the remainder prefix lands
    // on the wrong docs. The contract is "greedy over lower(h)": the
    // plan must equal the flat greedy computed over the LOWERED hashes
    // regardless of the case the caller passed in.
    val rnd = new scala.util.Random(42L)
    def hexMixed(n: Int) =
      (1 to n).map(_ => "0123456789abcdefABCDEF"(rnd.nextInt(22))).mkString
    val rows = (1 to 200).map(i =>
      (i.toLong, s"s${rnd.nextInt(3)}", (1 + rnd.nextInt(40)).toLong, hexMixed(8)))
    val df = rows.toDF("doc_id", "source", "n_tokens", "h")
    val lowered = df.withColumn("h", lower(col("h")))
    def flatLow(docs: org.apache.spark.sql.DataFrame) = {
      val src = docs.groupBy("source").agg(sum("n_tokens").as("src_tokens"))
      val tot = src.agg(sum("src_tokens").as("all_tokens"), count(lit(1)).as("n_src"))
      val plan = src.crossJoin(broadcast(tot))
        .withColumn("target_s", expr("(all_tokens * 2) div n_src"))
        .select(col("source"), expr("target_s div src_tokens").as("full_epochs"),
          (col("target_s") % col("src_tokens")).as("rem"))
      val w = Window.partitionBy("source").orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      docs.withColumn("prev", coalesce(sum("n_tokens").over(w), lit(0L)))
        .join(plan, Seq("source"))
        .select(col("doc_id"), col("source"), col("n_tokens"),
          (col("full_epochs") +
            when(col("prev") < col("rem"), 1L).otherwise(0L)).as("repeats"))
        .orderBy("doc_id").collect().toSeq
    }
    assert(CorpusEtl.epochPlanFrom(df).collect().toSeq == flatLow(lowered))
  }

  test("no unpartitioned window anywhere in the plan") {
    // Every Window must carry a partition spec: an ORDER BY-only window
    // would mean a global single-partition sort at corpus scale. (The
    // 1-row totals aggregate legitimately passes through SinglePartition
    // — its input is the per-source frame, not the corpus — so the
    // assertion targets windows, not exchanges.)
    val windows = gated.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.nonEmpty)
    for (w <- windows)
      assert(w.partitionSpec.nonEmpty, s"unpartitioned window: $w")
  }
}
