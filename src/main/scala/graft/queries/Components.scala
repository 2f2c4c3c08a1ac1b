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

  /** Runs `body` with AQE disabled and `spark.sql.shuffle.partitions`
    * pinned to `partitions` (both restored after). For the star fixpoint
    * loop only: every in-loop frame is O(|edges|), so the shuffle width
    * the input checkpoint materialized at (AQE-coalesced to target size
    * before the loop starts) is the right width for every round — there
    * is nothing left for runtime re-planning to learn, and measured on
    * the d13 chain graph AQE's per-stage re-plan jobs put a ~0.8 s floor
    * under each round while plain static plans at the checkpoint's width
    * run the same round in ~0.4 s. Skew in the corpus-sized PAIR
    * GENERATION feeding the loop still gets AQE: inputs are materialized
    * by the eager checkpoint before this wrapper runs. Session-scoped
    * set/restore — the engine's query entry points run one statement at
    * a time per session. */
  private def withLoopConf[T](spark: org.apache.spark.sql.SparkSession,
      partitions: Int)(body: => T): T = {
    val aqeKey = "spark.sql.adaptive.enabled"
    val partKey = "spark.sql.shuffle.partitions"
    val aqeWas = spark.conf.get(aqeKey, "true")
    val partWas = spark.conf.get(partKey, "32")
    spark.conf.set(aqeKey, "false")
    spark.conf.set(partKey, math.max(partitions, 1).toString)
    try body finally {
      spark.conf.set(aqeKey, aqeWas)
      spark.conf.set(partKey, partWas)
    }
  }

  /** @param pairs two-column DataFrame of undirected edges (a, b)
    * @return (node, component) — component = min node id reachable */
  def connectedComponents(pairs: DataFrame, maxIters: Int = 20): DataFrame = {
    val Seq(ca, cb) = pairs.columns.toSeq.take(2)
    // Materialize the PAIR INPUT eagerly before anything fans out: the
    // symmetric union below scans it twice inside one job, and callers
    // feed corpus-priced pipelines (LSH + verify) whose double
    // evaluation dominated the d7/d12/c1 profiles (JobProbe r13). The
    // checkpoint is edge-list-sized.
    val p0 = pairs.select(col(ca).as("u"), col(cb).as("v"))
      .localCheckpoint(true)
    // symmetric edge list + self-loops picked up via the node seed below;
    // cached (cheap rebuild from the checkpoint) so round joins see
    // materialized stats and broadcast when small
    val edges = p0
      .unionByName(p0.select(col("v").as("u"), col("u").as("v")))
      .cache()
    // localCheckpoint per round: iterative plans otherwise nest one level
    // per iteration until analysis itself blows up — lineage truncation is
    // mandatory for any loop-until-fixpoint DataFrame algorithm.
    var labels = edges.select(col("u").as("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint(true)
    var iter = 0
    var converged = false
    // AQE stays ON here (unlike the star loop): `edges` is cached with
    // known stats, so the per-round join already broadcasts when small at
    // plan time, and dense near-dup graphs converge in ≤3-4 rounds — the
    // measured AQE job overhead never dominates. Disabling it regressed
    // this path (checkpointed `labels` has unknown stats → both join
    // sides fall back to 32-partition sort-merge exchanges).
    while (iter < maxIters && !converged) {
      // Each node's new label: min of its own and every neighbor's label.
      // The node's OWN previous label rides the same aggregate (tagged
      // rows + conditional min — every node has exactly one own row), so
      // convergence detection is a filter over the checkpointed result
      // instead of a second shuffle join per round: one shuffle job per
      // round total.
      val neighborLabels = edges
        .join(labels.withColumnRenamed("node", "v"), Seq("v"))
        .select(col("u").as("node"), col("label"), lit(false).as("own"))
      val next = labels.withColumn("own", lit(true))
        .unionByName(neighborLabels)
        .groupBy("node")
        .agg(min("label").as("label"),
          min(when(col("own"), col("label"))).as("old_label"))
        .localCheckpoint(true)
      val changed = next.where(col("label") =!= col("old_label"))
        .limit(1).count()
      labels = next.select("node", "label")
      converged = changed == 0
      iter += 1
    }
    edges.unpersist()
    if (!converged)
      // Silent truncation here would split components (wrong keeper
      // selection downstream) — surface it. Diameter > maxIters means the
      // caller should raise the cap or use [[connectedComponentsStar]],
      // whose round count is logarithmic rather than diameter-bounded.
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"connectedComponents hit maxIters=$maxIters before convergence; " +
          "labels may split long chains — raise maxIters")
    labels.select(col("node"), col("label").as("component"))
  }

  /** Connected components via alternating large-star/small-star rounds
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC'14 — a public algorithm). Same contract as
    * [[connectedComponents]]; the difference is the round bound:
    * hash-min needs `diameter` rounds (a 10⁶-node chain needs 10⁶
    * rounds), alternating stars converge in O(log² n) — in practice
    * single digits on any graph — so this is the shape that survives
    * adversarial chain-of-near-dups inputs at corpus scale.
    *
    * Measured on the d7 pair graph at sf0.1 (dense shallow clusters,
    * diameter ≤ 4): hash-min 1.9 s steady-state vs 2.5 s here — two
    * star passes per round cost more than one hash-min pass when the
    * diameter is already tiny. That is why d7 gates hash-min; this
    * variant is for graphs whose diameter you cannot bound up front.
    *
    * State is an edge set in canonical child>parent direction; each round
    * is two (groupBy-min + equi-join) passes, everything shuffle-keyed on
    * node id, nothing quadratic, no driver-side graph:
    *  - large-star: every node attaches its *larger* neighbors to its
    *    minimum neighborhood member — long tails flatten geometrically;
    *  - small-star: every node re-points its smaller neighbors (its
    *    parents) at the minimum parent — stars consolidate.
    * Both preserve connectivity (every rewire keeps endpoints connected
    * through the pivot node) and strictly reduce the potential function,
    * so the fixpoint is a star forest rooted at component minima.
    *
    * Convergence is detected exactly and WITHOUT a confirm round: the
    * fixpoint characterization (Kiveris et al. §3) is "the edge set is a
    * PROPER star forest" — no node appears as both child and parent, and
    * no child keeps two parents — a property of the round's own output.
    * Checking it per round stops the loop at round R instead of running
    * round R+1 to observe set equality with round R; at local-mode stage-launch floors (~0.45 s a
    * round) that is a whole round saved, and at cluster scale it is one
    * fewer barrier over the full edge set. Soundness: edges stay
    * canonical child>parent, connectivity is preserved every round, so a
    * star forest over the current edge set labels every node with its
    * original component's minimum — exactly the contract. A graph not
    * yet at fixpoint cannot pass the check (some chain of length ≥ 2
    * survives ⟹ its middle node is both child and parent).
    *
    * The check stays a SEPARATE action per round BY MEASUREMENT, not
    * oversight. Fusing it into the round job (the 1-row violation count
    * cross-joined back onto every row through the round's own distinct()
    * exchange, so the checkpoint materializes the verdict and the exit
    * test becomes a 1-row take) was built and measured in round 11
    * (FusionProbe, d13 chain at sf0.1): the FIRST round's plan reuses
    * exchanges as designed (6 Exchange / 5 ReusedExchange), but from
    * round 2 on — once the loop input is a checkpoint that itself came
    * from a fused round — ReuseExchange stops matching entirely (31
    * exchanges, 0 reused, the round lineage expanded ~6×), and a round
    * costs 2.5-3.3 s / ~7000 task-ms vs 0.9-1.1 s / ~650 task-ms for
    * this two-action shape. Whole-query: d13 4.7 → 14.6 s, d13b 3.8 →
    * 12.7 s. The check job reads the just-written checkpoint blocks, so
    * its marginal cost is one shuffle over O(|edges|) local data —
    * cheaper than any known way of hiding it.
    */
  def connectedComponentsStar(pairs: DataFrame, maxIters: Int = 40): DataFrame =
    connectedComponentsStarStats(pairs, maxIters)._1

  /** [[connectedComponentsStar]] returning CHILD labels only — rows
    * (node, component) for nodes that point at a component minimum in
    * the fixpoint star forest; roots and edge-less nodes are ABSENT
    * (they label themselves). For callers that left-join the labels
    * onto a full roster and `coalesce(component, id)` anyway (m6, p4),
    * the roster scan, its checkpoint job and the final label join here
    * are pure duplication — this variant skips all three. The groupBy
    * min keeps the output well-defined even if maxIters truncated
    * mid-consolidation (duplicate parents collapse to the minimum, the
    * same guarantee the roster form gives). */
  def connectedComponentsStarChildren(pairs: DataFrame,
      maxIters: Int = 40): DataFrame =
    connectedComponentsStarImpl(pairs, maxIters, roster = false)._1

  /** [[connectedComponentsStar]] plus the ROUND COUNT it converged in —
    * the algorithm's actual scale contract (O(log² n), single digits in
    * practice) made observable, so specs can pin it on adversarial
    * topologies instead of trusting the output alone (ComponentsSpec:
    * a hash-scrambled chain, far beyond hash-min's budget, must close
    * in ≤ ~2·log₂(diameter) rounds; the d13b gate runs the same
    * topology against the recursive-closure oracle). */
  def connectedComponentsStarStats(pairs: DataFrame,
      maxIters: Int = 40): (DataFrame, Int) =
    connectedComponentsStarImpl(pairs, maxIters, roster = true)

  private def connectedComponentsStarImpl(pairs: DataFrame,
      maxIters: Int, roster: Boolean): (DataFrame, Int) = {
    val Seq(ca, cb) = pairs.columns.toSeq.take(2)
    // One eager materialization of the raw pair input: the node roster
    // consumes it twice and the canonical edge set once — three
    // evaluations of the caller's pair pipeline (m6's band joins, d13b's
    // global-window ranking) before this checkpoint existed (JobProbe
    // r13). Edge-list-sized.
    val p0 = pairs.select(col(ca).as("pu"), col(cb).as("pv"))
      .localCheckpoint(true)
    // nodes derive from the RAW pairs: a node appearing only in
    // self-pairs has no surviving edge but must still label itself
    // (same contract as connectedComponents). Skipped in the
    // children-only form — its callers carry their own roster.
    val nodes =
      if (!roster) null
      else p0.select(col("pu").as("node"))
        .unionByName(p0.select(col("pv").as("node")))
        .distinct()
        .localCheckpoint(true)
    var edges = p0
      .select(greatest(col("pu"), col("pv")).as("u"), least(col("pu"), col("pv")).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(true)

    var iter = 0
    var converged = edges.isEmpty
    // The exact fixpoint test, one map-side-combined shuffle + isEmpty
    // over the just-checkpointed round output. A PROPER star forest —
    // 2-level and single-parent — violates in exactly two ways: a node
    // carries both a child row and a parent row (a chain of length ≥ 2
    // survives), or a node carries ≥ 2 child rows (two parents, which
    // the next small-star would still rewire, as in {(3,1),(3,2)}).
    // `deg` counts n's parents (edge set is distinct, so plain sum).
    def isStarForest(df: DataFrame): Boolean =
      df.select(col("u").as("n"), lit(1).as("deg"), lit(0).as("p"))
        .unionByName(df.select(col("v").as("n"), lit(0).as("deg"), lit(1).as("p")))
        .groupBy("n").agg(sum(col("deg")).as("deg"), max(col("p")).as("p"))
        .where((col("p") === 1 && col("deg") > 0) || col("deg") > 1)
        .isEmpty
    // Loop shuffle width = the width the input checkpoint materialized
    // at: AQE already coalesced it to target partition size, every
    // in-loop frame is O(|edges|), and a static width keeps each round
    // at its 3-exchange minimum (see withLoopConf). At toy scale this is
    // 1 partition; at cluster scale it is the data-sized width.
    val loopPartitions = if (converged) 1 else edges.rdd.getNumPartitions
    // One large-star + small-star round, pure lineage (no materialization).
    def round(edges0: DataFrame): DataFrame = {
      // large-star: symmetrize; m(x) = min(Γ(x) ∪ {x}); attach every
      // neighbor y > x to m(x). Every canonical edge is re-emitted from
      // the perspective of its smaller endpoint, so connectivity holds.
      val sym = edges0.select(col("u"), col("v"))
        .unionByName(edges0.select(col("v").as("u"), col("u").as("v")))
      val largeMins = sym.groupBy("u")
        .agg(least(min(col("v")), first(col("u"))).as("m"))
      // No dedup between the stars: the large-star output stays
      // u-hash-partitioned out of its join, so the small-star groupBy
      // and join below need NO further exchange — a distinct() here
      // would repartition on (u,v) and force two extra exchanges per
      // round. Duplicate (u,v) rows (several neighbors attaching v to
      // the same min) are absorbed map-side by the min aggregate and
      // swept by the round-end distinct; volume stays O(|edges|).
      val afterLarge = sym.where(col("v") > col("u"))
        .join(largeMins, Seq("u"))
        .select(col("v").as("u"), col("m").as("v"))
      // small-star: per node, re-point all parents (smaller neighbors)
      // at the minimum parent, keeping the node's own link to it.
      val smallMins = afterLarge.groupBy("u").agg(min(col("v")).as("m"))
      afterLarge.join(smallMins, Seq("u"))
        .where(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .unionByName(smallMins.select(col("u"), col("m").as("v")))
    }
    withLoopConf(pairs.sparkSession, loopPartitions) {
      converged = converged || isStarForest(edges)
      while (iter < maxIters && !converged) {
        // ONE round per eager localCheckpoint. Fusing two rounds into a
        // single lineage was measured 6-10× SLOWER (23-57 s vs ~4 s at
        // sf0.1): the checkpoint is not only lineage truncation but
        // MEMOIZATION — `sym` feeds both the groupBy and the join probe,
        // so an unmaterialized round gets recomputed once per consumer,
        // compounding across the fused pair. Spark shares no common
        // subplans within a job beyond exchange reuse.
        val next = round(edges)
          .distinct()
          .localCheckpoint(true)
        converged = isStarForest(next)
        edges = next
        iter += 1
      }
    }
    if (!converged)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"connectedComponentsStar hit maxIters=$maxIters before convergence")
    // fixpoint is a star forest: child → component-min parent; roots and
    // isolated nodes label themselves. groupBy-min also makes the output
    // well-defined if the cap was hit mid-consolidation.
    val labels =
      if (!roster)
        edges.select(col("u").as("node"), col("v").as("c0"))
          .groupBy("node").agg(min(col("c0")).as("component"))
          .select(col("node"), col("component"))
      else nodes
        .join(edges.select(col("u").as("node"), col("v").as("label")),
          Seq("node"), "left")
        .groupBy("node")
        .agg(coalesce(min(col("label")), first(col("node"))).as("component"))
        .select(col("node"), col("component"))
    (labels, iter)
  }
}
