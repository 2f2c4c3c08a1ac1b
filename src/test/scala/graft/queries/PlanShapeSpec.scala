package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** Physical-plan regression gate: locks in the scale claims the code
  * documents (SCALING.md) so a refactor can't silently reintroduce a
  * cartesian pair join or lose scan pushdown.
  *
  *  - Every pair-join / self-join query must shuffle on a blocking key:
  *    no BroadcastNestedLoopJoin, no CartesianProduct anywhere in its
  *    executed plan.
  *  - Scans with selective predicates must reach parquet as PushedFilters.
  */
class PlanShapeSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark

  /** Queries whose core is a pair/self join — the 100 TB danger zone. */
  private val pairJoinQueries = Seq(
    "d2_dedup_ngram_jaccard", "d4_minhash_pairs", "d6_simhash_pairs",
    "v2_knn_lsh", "v4_embed_near_dup", "q12_bucket_join", "q14_range_join",
    "q22_asof_join", "q23_salted_agg", "t6_repetition", "c1_corpus_prep",
    "d8_decontaminate", "t9_bigram_lm", "t13_perplexity_filter",
    "d10_dup_graph_metrics", "d11_source_overlap", "d15_cdc_dup",
    "t15_ngram_novelty", "v9_knn_graph",
    "c9_dedup_rewrite", "c10_leakage_safe_split", "m8_video_frame_phash",
    "d19_containment", "d20_paragraph_dedup", "p5_token_shards",
    "t27_paragraph_langid", "d21_dup_weights",
    // correlated subqueries must decorrelate to windows/joins —
    // per-outer-row re-execution would surface as a nested-loop join
    "q36_lateral_topk", "q38_scalar_subquery")

  for (name <- pairJoinQueries)
    test(s"$name: no cartesian / nested-loop join in the physical plan") {
      val plan = SparkEntry.queries(name)(spark, sf)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"$name plan contains BroadcastNestedLoopJoin:\n$plan")
      assert(!plan.contains("CartesianProduct"),
        s"$name plan contains CartesianProduct:\n$plan")
    }

  test("d16_pagerank: no cartesian / nested-loop join (lazy-plan form)") {
    // The gated d16 frame is eagerly checkpointed (its executed plan is
    // an ExistingRDD scan — asserting on it would be vacuous and would
    // run the whole job), so the assertion targets the SAME pipeline in
    // its lazy form.
    val plan = TextOps.pageRankLazyGate(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"d16 lazy plan contains BroadcastNestedLoopJoin:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"d16 lazy plan contains CartesianProduct:\n$plan")
  }

  test("q4_inlist_project: IN-list + range predicates push to the parquet scan") {
    val plan = SparkEntry.queries("q4_inlist_project")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters"), plan)
    assert(plan.contains("In(l_returnflag"), s"IN-list not pushed:\n$plan")
  }

  test("q5_time_range: timestamp range predicate pushes to the parquet scan") {
    val plan = SparkEntry.queries("q5_time_range")(spark, sf)
      .queryExecution.executedPlan.toString
    // both bounds push: ts < … directly, and the date_trunc('day', ts) >= …
    // lower bound via the ImpliedScanRanges trunc transfer.
    assert(plan.contains("PushedFilters"), plan)
    assert(plan.contains("LessThan(ts"), s"ts upper bound not pushed:\n$plan")
    assert(plan.contains("GreaterThanOrEqual(ts"), s"trunc lower bound not pushed:\n$plan")
  }

  test("d8_decontaminate: benchmark shingle side broadcasts (corpus never shuffles for the join)") {
    val plan = SparkEntry.queries("d8_decontaminate")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"benchmark side should broadcast:\n$plan")
  }

  test("x4_kmv_jaccard: sketch built by the bounded min-k aggregate, never a corpus window sort") {
    val plan = SparkEntry.queries("x4_kmv_jaccard")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("min_k_distinct"),
      s"KMV sketch should use MinKDistinctLongs:\n$plan")
    // the scale property: the CORPUS-side per-source top-k must be the
    // k-bounded aggregate, never a row_number window partitioned by
    // source (that sorts the corpus one source per task). The pair-stage
    // union rank IS a window — over (s1, s2), sketch-sized by
    // construction — so assert on the partition spec, not on Window
    // existing at all.
    assert(!plan.contains("windowspecdefinition(source"),
      s"corpus-sorting per-source window crept back into the sketch stage:\n$plan")
  }

  test("t8_bm25: one tokenization per pass and only the stats row exchanges") {
    val plan = SparkEntry.queries("t8_bm25")(spark, sf)
      .queryExecution.executedPlan.toString
    // the token array binds once behind the Generate fence: each of the
    // two passes over documents (stats agg, scoring side) tokenizes
    // exactly once — dl + per-term tf all read the generated struct
    val tokenizations = "split\\(lower\\(text".r.findAllIn(plan).size
    assert(tokenizations <= 2,
      s"tokenization re-inlined ($tokenizations sites):\n$plan")
    // one Exchange pair for the 1-row stats aggregate (partial → single),
    // none keyed on the corpus — the scan side stays map-side.
    val corpusExchanges = "Exchange hashpartitioning\\(doc_id".r
      .findAllIn(plan).size
    assert(corpusExchanges == 0,
      s"corpus side must not shuffle on doc_id:\n$plan")
  }

  test("SparkEntry registry: names unique, well-formed, oracles non-blank") {
    val names = SparkEntry.allQs.map(_.name)
    assert(names.distinct.size == names.size,
      s"duplicate query names: ${names.diff(names.distinct)}")
    // a dup would silently collapse in the queries Map the driver uses
    assert(SparkEntry.queries.size == names.size)
    assert(names.forall(_.matches("[a-z0-9_]+")), s"ill-formed name in $names")
    assert(SparkEntry.allQs.flatMap(_.oracle).forall(_.trim.nonEmpty),
      "blank oracle SQL would crash the driver compare")
  }

  test("q1_pricing_summary: scan reads only the referenced columns") {
    val plan = SparkEntry.queries("q1_pricing_summary")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("l_comment"), s"column pruning lost l_comment:\n$plan")
  }

  test("q29_table_stats: corpus-side aggregate is a hash aggregate (no Expand)") {
    // the group-by-value shape: Generate(explode) feeding HashAggregate.
    // The multi-countDistinct alternative shows up as an Expand whose
    // whole output goes through SortAggregate (string min/max buffer) —
    // measured 4-6× slower; lock it out.
    val plan = SparkEntry.queries("q29_table_stats")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), s"q29 regressed to the Expand plan:\n$plan")
    assert(plan.contains("HashAggregate"), s"q29 lost the hash aggregate:\n$plan")
  }

  test("t10_bpe_pairs: pair explode runs over the word-count aggregate, not the corpus") {
    // two aggregates (word counts, then pair counts) with the Generate
    // between them — the BPE vocab trick. A Generate directly over the
    // file scan would mean per-occurrence pair explosion.
    val qe = SparkEntry.queries("t10_bpe_pairs")(spark, sf).queryExecution
    val plan = qe.executedPlan.toString
    assert(plan.contains("Generate"), s"t10 lost the explode:\n$plan")
    // tree prints root-first, so the PAIR explode is the first Generate
    // and the token explode (over the scan) is the last; the word-count
    // aggregate must sit between the pair explode and the corpus scan
    val gen = plan.linesIterator.zipWithIndex.filter(_._1.contains("Generate")).map(_._2).toSeq
    val aggs = plan.linesIterator.zipWithIndex.filter(_._1.contains("HashAggregate")).map(_._2).toSeq
    val scan = plan.linesIterator.zipWithIndex.find(_._1.contains("Scan parquet")).map(_._2).getOrElse(-1)
    assert(gen.nonEmpty && scan >= 0 &&
      aggs.exists(a => a > gen.head && a < scan),
      s"t10: no aggregate between the pair explode and the corpus scan:\n$plan")
  }

  test("v8_pq_adc: encoding argmin is a map-side aggregate, codebook broadcasts") {
    val plan = SparkEntry.queries("v8_pq_adc")(spark, sf)
      .queryExecution.executedPlan.toString
    // PQ encoding must be the min-of-struct HASH aggregate (partial
    // combine map-side) — a row_number window partitioned by
    // (vec_id, sub) would sort the m-times-exploded corpus instead.
    assert(!plan.contains("windowspecdefinition(vec_id"),
      s"v8 encoding regressed to a per-vector sort window:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"v8 codebook should broadcast:\n$plan")
  }

  test("h1_rrf_hybrid: both candidate lists end in k-bounded top-k sorts") {
    val plan = SparkEntry.queries("h1_rrf_hybrid")(spark, sf)
      .queryExecution.executedPlan.toString
    // orderBy+limit must plan as TakeOrdered (partial top-k map-side),
    // never a full global Sort of the corpus feeding a Limit.
    assert("TakeOrderedAndProject".r.findAllIn(plan).size >= 2,
      s"h1 lost the k-bounded top-k on a candidate branch:\n$plan")
  }

  test("h2_hybrid_index_serve: stored-trio serve keeps both k-bounded top-ks, no cartesian") {
    val plan = SparkEntry.queries("h2_hybrid_index_serve")(spark, sf)
      .queryExecution.executedPlan.toString
    // each index serve must end in its own TakeOrdered before fusion —
    // the ≤k × ≤k full-outer join is the only thing downstream
    assert("TakeOrderedAndProject".r.findAllIn(plan).size >= 2,
      s"h2 lost a serve-side k-bounded top-k:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"h2 fusion must not plan a cartesian:\n$plan")
  }

  test("c13_shard_manifest: the only unpartitioned window rides the bounded bucket aggregate") {
    // the p1/c6 rule: cumulative offsets may ride ONE unpartitioned
    // window whose input is the ≤256-row bucket aggregate; everything
    // else (in-bucket numbering) must carry a partition spec
    val plan = SparkEntry.queries("c13_shard_manifest")(spark, sf)
      .queryExecution.optimizedPlan
    val windows = plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.nonEmpty)
    val unpart = windows.filter(_.partitionSpec.isEmpty)
    assert(unpart.size <= 1,
      s"more than one unpartitioned window:\n${unpart.mkString("\n")}")
    for (w <- unpart)
      assert(w.collectFirst {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate
            if a.groupingExpressions.size == 1 => a
      }.nonEmpty,
        s"the unpartitioned window must consume the bucket aggregate:\n$w")
  }

  test("c7_chunk_overlap: pure per-row fanout — only the output sort exchanges") {
    // chunking must stay a map-side Generate; any groupBy/join sneaking
    // in would shuffle the full token volume at corpus scale
    val plan = SparkEntry.queries("c7_chunk_overlap")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Generate"), s"c7 lost the explode:\n$plan")
    val exchanges = plan.linesIterator.count(_.contains("Exchange"))
    assert(exchanges <= 2, // rangepartitioning for the sort (+AQE read)
      s"c7 has $exchanges exchanges — chunking should not shuffle:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("HashJoin"),
      s"c7 plan contains a join:\n$plan")
  }

  test("TextIndex.search: the term IN-list reaches the postings scan as a pushed filter") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft-plan-textidx").toString
    graft.llm.TextIndex.add(spark, dir,
      graft.Tables.documents(spark, sf).select("doc_id", "text")
        .where(col("doc_id") < 50))
    val plan = graft.llm.TextIndex.search(spark, dir, Seq("hash", "scan"), 25)
      .queryExecution.executedPlan.toString
    // the 100 TB claim: the postings scan prunes to the queried terms
    // (the bucket-pruned read), so the filter must reach parquet
    assert(plan.contains("In(tok"), s"term IN-list not pushed:\n$plan")
  }
}
