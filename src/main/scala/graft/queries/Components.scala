package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a near-dup pair graph — the step between
  * pair generation (d2/d4/d6/v4) and actually deduplicating a corpus:
  * each component is one duplicate cluster, its minimum doc id the
  * canonical keeper.
  *
  * Algorithm: hash-min label propagation. Every node starts labeled with
  * itself; each round every node takes the min label among itself and its
  * neighbors; converged when no label changes. Rounds needed = graph
  * diameter (near-dup clusters are dense, so typically ≤ 3-4). Each round
  * is one equi-join on node id + one groupBy min — all shuffle-keyed on
  * node, nothing quadratic, no driver-side graph. This is the standard
  * large-scale CC shape (the simple form of the small-star/large-star
  * map-reduce algorithms).
  */
object Components {

  /** @param pairs two-column DataFrame of undirected edges (a, b)
    * @return (node, component) — component = min node id reachable */
  def connectedComponents(pairs: DataFrame, maxIters: Int = 20): DataFrame = {
    val Seq(ca, cb) = pairs.columns.toSeq.take(2)
    // symmetric edge list + self-loops picked up via the node seed below
    val edges = pairs.select(col(ca).as("u"), col(cb).as("v"))
      .unionByName(pairs.select(col(cb).as("u"), col(ca).as("v")))
      .cache()
    // localCheckpoint per round: iterative plans otherwise nest one level
    // per iteration until analysis itself blows up — lineage truncation is
    // mandatory for any loop-until-fixpoint DataFrame algorithm.
    var labels = edges.select(col("u").as("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint(true)
    var iter = 0
    var converged = false
    while (iter < maxIters && !converged) {
      // each node's new label: min of its own and every neighbor's label
      val neighborLabels = edges
        .join(labels.withColumnRenamed("node", "v"), Seq("v"))
        .select(col("u").as("node"), col("label"))
      val next = labels.unionByName(neighborLabels)
        .groupBy("node").agg(min("label").as("label"))
        .localCheckpoint(true)
      val changed = labels.select(col("node"), col("label").as("old_label"))
        .join(next, Seq("node"))
        .where(col("old_label") =!= col("label")).limit(1).count()
      labels = next
      converged = changed == 0
      iter += 1
    }
    edges.unpersist()
    if (!converged)
      // Silent truncation here would split components (wrong keeper
      // selection downstream) — surface it. Diameter > maxIters means the
      // caller should raise the cap (or we should switch to large-star/
      // small-star, whose round count is O(log n)).
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"connectedComponents hit maxIters=$maxIters before convergence; " +
          "labels may split long chains — raise maxIters")
    labels.select(col("node"), col("label").as("component"))
  }
}
