package graft.llm

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.KMeans

/** Persistent IVF similarity index — the ANN service lifecycle next to
  * [[DedupIndex]]: build once (k-means centroids + cell assignments on
  * disk), append new vectors by assigning them to the EXISTING
  * centroids (no retrain per batch — the standard IVF posture; retrain
  * is a scheduled rebuild), search by probing the nprobe nearest cells.
  *
  * On-disk layout under `dir`:
  *  - `centroids/` — (cent_id, centroid array<double>); k rows, the
  *    driver-sized model.
  *  - `vectors/`   — (vec_id, embedding, cell); append-only, the
  *    inverted lists. At scale this is what you partition BY `cell` so
  *    a probe reads only its lists.
  *
  * Search shape: queries × broadcast centroids (map-side cell ranking)
  * → equi-join on `cell` against the vectors table → per-query top-k
  * window. The corpus never cross-joins the queries; the only shuffle
  * is keyed on the probed cells.
  */
object VectorIndex {

  private def centroidsPath(dir: String) = s"$dir/centroids"
  private def vectorsPath(dir: String) = s"$dir/vectors"

  /** Fused cosine via the native expression (same kernel as v1/v5). */
  private def cosine(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    org.apache.spark.sql.graft.ColumnBridge.column(graft.functions.CosineSimilarity(
      org.apache.spark.sql.graft.ColumnBridge.expression(a),
      org.apache.spark.sql.graft.ColumnBridge.expression(b)))

  /** Train k-means on `embeddings` (vec_id, embedding) and persist the
    * index. Returns the centroid count actually used. */
  def build(spark: SparkSession, dir: String, embeddings: DataFrame, k: Int): Int = {
    val (centroids, assigned) = KMeans.fit(embeddings, k)
    import spark.implicits._
    centroids.zipWithIndex.toSeq.map { case (c, i) => (i, c.toSeq) }
      .toDF("cent_id", "centroid")
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(centroidsPath(dir))
    embeddings.join(assigned, "vec_id")
      .select(col("vec_id"), col("embedding"), col("cell"))
      .write.mode(SaveMode.Overwrite).parquet(vectorsPath(dir))
    centroids.length
  }

  private def loadCentroids(spark: SparkSession, dir: String): Array[Array[Double]] =
    spark.read.parquet(centroidsPath(dir))
      .orderBy("cent_id").collect()
      .map(_.getSeq[Double](1).toArray)

  /** Append new vectors, assigned to the existing centroids — one
    * map-side pass (the centroid literal is plan-baked, like KMeans
    * assignment), one append. */
  def add(spark: SparkSession, dir: String, newVectors: DataFrame): Unit = {
    val cs = loadCentroids(spark, dir)
    newVectors
      .select(col("vec_id"), col("embedding"),
        KMeans.assignCell(cs, col("embedding")).as("cell"))
      .write.mode(SaveMode.Append).parquet(vectorsPath(dir))
  }

  /** Per-cell inverted-list sizes — the index-health report (heavily
    * skewed lists mean the centroids have drifted from the data and a
    * scheduled rebuild is due). */
  def cellStats(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(vectorsPath(dir))
      .groupBy("cell").agg(count(lit(1)).as("n_vectors"))
      .orderBy("cell")

  /** Top-`k` cosine neighbors per query vector, probing the `nprobe`
    * nearest cells. `queries` carries (qid, qe array<float>). Returns
    * (qid, nid, rnk, cos_sim), deterministic ties by id. */
  def search(spark: SparkSession, dir: String, queries: DataFrame,
      k: Int, nprobe: Int): DataFrame = {
    val cs = loadCentroids(spark, dir)
    require(nprobe >= 1 && nprobe <= cs.length, s"nprobe must be in [1, ${cs.length}]")
    // rank cells per query on the driver-sized centroid list: explode a
    // literal (cent_id, centroid) array against the (small) query set —
    // map-side, no corpus involvement. Ranked by SQUARED L2, the same
    // metric KMeans.assignCell used to place the vectors — probing under
    // a different metric (e.g. cosine) would rank loose small-norm
    // centroids differently than assignment did and silently skip the
    // cell holding a query's true neighbor.
    val centLit = array(cs.zipWithIndex.map { case (c, i) =>
      struct(lit(i).as("cell"), array(c.map(lit(_)): _*).as("ce"))
    }: _*)
    val probes = queries
      .select(col("qid"), col("qe"), explode(centLit).as("c"))
      .select(col("qid"), col("qe"), col("c.cell").as("cell"),
        expr("""aggregate(zip_with(c.ce, qe,
          (x, y) -> (x - cast(y as double)) * (x - cast(y as double))),
          0d, (a, v) -> a + v)""").as("dist"))
      .withColumn("crn", row_number().over(
        Window.partitionBy("qid").orderBy(col("dist"), col("cell"))))
      .where(col("crn") <= nprobe)
      .select("qid", "qe", "cell")
    val cand = probes
      .join(spark.read.parquet(vectorsPath(dir)), Seq("cell"))
      .where(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nid"),
        cosine(col("qe"), col("embedding")).as("cos_sim"))
    cand
      .withColumn("rnk", row_number().over(
        Window.partitionBy("qid").orderBy(col("cos_sim").desc, col("nid"))).cast("int"))
      .where(col("rnk") <= k)
      .select("qid", "nid", "rnk", "cos_sim")
      .orderBy("qid", "rnk")
  }
}
