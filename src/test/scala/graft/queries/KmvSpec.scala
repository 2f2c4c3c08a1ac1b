package graft.queries

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** x4_kmv_jaccard QUALITY gate (the oracle gates cross-engine
  * agreement; this gates that the estimate estimates): KMV Jaccard has
  * standard error ≈ √(J(1−J)/k) ≤ 0.063 at k=64, so every pair must
  * land within a generous 4σ ≈ 0.25 of the exact Jaccard — checked on
  * planted corpora where the true overlap is controlled (half-shared
  * ⇒ J = 1/3, disjoint ⇒ J = 0), and on the driver testdata against
  * an exact driver-side computation over the same md5-prefix hashes.
  */
class KmvSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def corpusDir(rows: Seq[(Long, String, String)]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-kmv").toString
    rows.map { case (id, text, src) => (id, text, "en", src, text.length) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def estimates(dir: String): Map[(String, String), Double] =
    SparkEntry.queries("x4_kmv_jaccard")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(4)).toMap

  test("planted overlap: half-shared pair estimates J=1/3, disjoint pair estimates 0") {
    val rnd = new scala.util.Random(17)
    def doc() = Seq.fill(20)("w" + rnd.nextInt(100000)).mkString(" ")
    val shared = Seq.fill(300)(doc())
    val onlyA = Seq.fill(300)(doc())
    val onlyB = Seq.fill(300)(doc())
    val onlyC = Seq.fill(300)(doc())
    var id = -1L
    def rows(texts: Seq[String], src: String) =
      texts.map { t => id += 1; (id, t, src) }
    val dir = corpusDir(
      rows(shared ++ onlyA, "sa") ++ rows(shared ++ onlyB, "sb") ++
        rows(onlyC, "sc"))
    val est = estimates(dir)
    // |A∩B| = 300, |A∪B| = 900 ⇒ J = 1/3
    assert(math.abs(est(("sa", "sb")) - 1.0 / 3.0) <= 0.25,
      s"half-shared pair: ${est(("sa", "sb"))}")
    // sc shares nothing: KMV can only report a (rare) hash coincidence
    assert(est(("sa", "sc")) <= 0.05 && est(("sb", "sc")) <= 0.05, est.toString)
  }

  test("driver testdata: every pair estimate within 4 sigma of exact Jaccard") {
    val sf = "/root/testdata/sf0.01"
    val docs = graft.Tables.documents(spark, sf)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    def h(t: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map(b => f"$b%02x").mkString.take(15)
    val bySrc: Map[String, Set[String]] =
      docs.groupBy(_._1).view.mapValues(_.map(d => h(d._2)).toSet).toMap
    val est = estimates(sf)
    for (((s1, s2), e) <- est) {
      val (a, b) = (bySrc(s1), bySrc(s2))
      val exact = (a intersect b).size.toDouble / (a union b).size.toDouble
      assert(math.abs(e - exact) <= 0.25, s"($s1,$s2): est $e vs exact $exact")
    }
  }
}
