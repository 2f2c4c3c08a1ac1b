package graft.llm

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The c6 sequence-packing cumsum is HIERARCHICAL (bounded in-bucket
  * windows + a bucket-base prefix) for scale; this fuzz proves it
  * byte-equal to the single global window it replaces, on random
  * corpora with adversarial shapes: sparse/dense doc_ids, empty
  * buckets, single-doc sources, and bucket-boundary straddles.
  */
class SequencePackFuzzSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("seeded fuzz: hierarchical start offsets equal the global window on 5 corpora") {
    val rnd = new scala.util.Random(2024)
    for (trial <- 0 until 5) {
      val nDocs = 50 + rnd.nextInt(150)
      val rows = (0 until nDocs).map { _ =>
        // sparse ids straddle the div-10000 bucket boundary on purpose
        val id = rnd.nextInt(40000).toLong
        val src = s"s${rnd.nextInt(4)}"
        val nTok = 1 + rnd.nextInt(600)
        (id, src, Seq.fill(nTok)("w").mkString(" "))
      }.distinctBy(_._1)
      val docs = rows.toDF("doc_id", "source", "text")

      val hier = graft.llm.CorpusEtl.all.find(_.name == "c6_sequence_pack").get
      // run the gated hierarchical query on a temp dir-less frame: write
      // rows to a temp parquet table dir the Q reads
      val dir = java.nio.file.Files.createTempDirectory("graft-c6-fuzz").toString
      docs.write.parquet(s"$dir/documents.parquet")
      val got = hier.fn(spark, dir).select("doc_id", "start_off")
        .as[(Long, Long)].collect().toMap

      val w = Window.partitionBy("source").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val expected = docs
        .select(col("doc_id"), col("source"),
          size(split(lower(col("text")), " ")).cast("long").as("n_tokens"))
        .withColumn("start_off", sum(col("n_tokens")).over(w) - col("n_tokens"))
        .select("doc_id", "start_off").as[(Long, Long)].collect().toMap

      assert(got == expected, s"trial $trial: ${nDocs} docs diverged")
    }
  }
}
