package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Scale-pattern exemplars: the three table-maintenance moves a 100 TB
  * deployment of this engine leans on daily, each oracle-gated like every
  * other operator.
  *
  *  - q45: incremental rollup maintenance — merging stored partial
  *    aggregate states with a delta batch's states instead of rescanning
  *    history (the reference recomputes its daily forecast rollups from
  *    the full snapshot each request, crates/oracle/src/db/weather_data.rs:172-212;
  *    at 100 TB the only viable form is state merge).
  *  - q46: bucketed co-located fact join — both sides pre-bucketed on the
  *    join key so the join needs NO shuffle of either table (the layout
  *    contract `repartition` can only fake per-job; bucketing persists it).
  *  - x5: mergeable-sketch rollup — per-day HLL sketches union-merged to
  *    a coarser grain, answering week/month NDV without touching raw data
  *    (the x1 sketch made storable and re-aggregatable).
  */
object ScaleOps {

  /** Exact 2-dp double sum via long cents — [[Relational.cents]], where
    * the bit-exactness argument lives. */
  private def cents(c: Column): Column = Relational.cents(c)

  /** Token unique per (JVM, session instance) — the layout queries write
    * under it so no two sessions ever share (and race on) a directory. */
  private def sessionTag(s: SparkSession): String = graft.Sessions.sessionTag(s)

  /** q46's catalog table names for (session, data dir) — session-tagged
    * for the same reason the paths are (see q46 body); exposed so
    * ScaleOpsSpec can plan-assert against the exact tables the gated
    * query materialized. */
  private[queries] def bucketTableNames(s: SparkSession, d: String): (String, String) = {
    val tag = d.replaceAll("[^A-Za-z0-9]", "_")
    val sTag = sessionTag(s).replaceAll("[^A-Za-z0-9]", "_")
    (s"graft_bkt_orders_${tag}_$sTag", s"graft_bkt_lineitem_${tag}_$sTag")
  }

  /** q49's hierarchical exact nearest-rank percentiles over an arbitrary
    * `(rf, v, c)` frame (`c` = any order-isomorphic long of `v`; the gate
    * passes cents). Extracted so HierPercentileFuzz can differential it
    * against the one-window form on adversarial fixtures (ties at every
    * boundary, single-row groups, all-equal groups). */
  private[queries] def hierPercentiles(in: DataFrame): DataFrame = {
    val li = in.withColumn("bucket", expr("c div 16384"))
    hierPercentilesFrom(li,
      li.groupBy("rf", "bucket").agg(count(lit(1)).as("bc")))
  }

  /** [[hierPercentiles]] with the final materialization suppressed —
    * the plan-inspection twin (the pageRankLazyPlan posture): the
    * production form ends in Sort(ExistingRDD) since the r14 pre-sort
    * checkpoint, so HierPercentileFuzzSpec's window/prefilter shape
    * assertions read this form. */
  private[queries] def hierPercentilesLazyPlan(in: DataFrame): DataFrame = {
    val li = in.withColumn("bucket", expr("c div 16384"))
    hierPercentilesFrom(li,
      li.groupBy("rf", "bucket").agg(count(lit(1)).as("bc")),
      materializeFinal = false)
  }

  /** Measured one-window ↔ hierarchical crossover (rows in the scanned
    * percentile frame). BENCH_SF1 r12: at the 10× replica (~6M lineitem
    * rows) the one-window in-partition sort costs 6.59 s vs the
    * boundary-bucket hierarchy's 1.5 s; at sf0.1 (~600k rows) both land
    * ~1 s with the one-window slightly ahead (one pass, no second
    * boundary read). The break-even sits between — recorded with the
    * sweep in SCALING.md r13. */
  private[queries] val HierCrossoverRows = 2000000L

  /** The q41 one-window exact nearest-rank form over the same
    * `(rf, v, c)` frame [[hierPercentiles]] takes: ONE hash exchange on
    * the group key + ONE in-partition sort serves every rank. The cheap
    * plan when groups fit a sort comfortably; the hierarchy's two-pass
    * boundary read only pays off past [[HierCrossoverRows]]. */
  private[queries] def oneWindowPercentiles(in: DataFrame,
      materializeFinal: Boolean = true): DataFrame = {
    val ranked = in
      .withColumn("rn", row_number().over(
        Window.partitionBy("rf").orderBy("v")))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("rf")))
    ranked.groupBy(col("rf").as("l_returnflag"))
      .agg(max("n").cast("long").as("n_rows"),
        max(when(col("rn") === expr("cast(ceil(0.25 * n) as bigint)"), col("v"))).as("p25"),
        max(when(col("rn") === expr("cast(ceil(0.5 * n) as bigint)"), col("v"))).as("p50"),
        max(when(col("rn") === expr("cast(ceil(0.75 * n) as bigint)"), col("v"))).as("p75"),
        max(when(col("rn") === col("n"), col("v"))).as("p100"))
      // eager before the total ORDER BY: the range sampler re-executes
      // its child — here the in-partition sort + windows, the whole
      // query's cost (JobProbe r14: twin ~1.2 s-taskMs jobs reading the
      // same 21.6 MB exchange). One row per group survives.
      // (`materializeFinal = false` is the plan-inspection twin.)
      .transform(df => if (materializeFinal) df.localCheckpoint(true) else df)
      .orderBy("l_returnflag")
  }

  /** ONE exact-percentile entry point (VERDICT r12 #8): dispatches the
    * `(rf, v, c)` frame to [[oneWindowPercentiles]] or
    * [[hierPercentiles]] on the optimizer's row estimate vs the
    * measured [[HierCrossoverRows]]. Both plans implement the identical
    * nearest-rank contract (values PRESENT in the data — bit-equal
    * outputs), so the dispatch is a pure cost decision, like AQE's
    * join-strategy pick but driven by the sort-vs-two-pass crossover
    * Catalyst doesn't model. The estimate is plan statistics
    * (`optimizedPlan.stats` — file-size-derived for scans, no job);
    * `rowsHint` overrides it when the caller knows better (a metastore
    * row count, or a test pinning the path). */
  private[queries] def exactPercentiles(in: DataFrame,
      rowsHint: Option[Long] = None,
      materializeFinal: Boolean = true): DataFrame = {
    val est = rowsHint.getOrElse {
      val st = in.queryExecution.optimizedPlan.stats
      st.rowCount.map(_.toLong).getOrElse {
        // sizeInBytes for a parquet scan is COMPRESSED file bytes of
        // the pruned columns — ~8 B/row for this 3-column numeric
        // projection (measured: the /40 in-memory-width first guess
        // put the 10× replica's 6M rows at ~1.2M "rows", under the
        // crossover, and dispatched a 9.7 s one-window sort where the
        // hierarchy runs 1.2 s). The estimate only has to land on the
        // right side of a ~5× cost cliff.
        (st.sizeInBytes / 8).toLong
      }
    }
    if (est >= HierCrossoverRows) {
      if (materializeFinal) hierPercentiles(in) else hierPercentilesLazyPlan(in)
    } else oneWindowPercentiles(in, materializeFinal)
  }

  /** q49's machinery with the count frame supplied by the CALLER — the
    * q50 form, where `bframe` is not computed from the scan but MERGED
    * from stored finer-grain states (counts are an exact monoid, so the
    * merged frame is bit-identical to a fresh aggregation and every
    * boundary-bucket location lands exactly where a from-scratch run
    * would). `li` must already carry the same `bucket` column the
    * states were keyed by. */
  private[queries] def hierPercentilesFrom(li: DataFrame,
      bframe: DataFrame, materializeFinal: Boolean = true): DataFrame = {
    val wB = Window.partitionBy("rf").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val bcum = bframe
      .withColumn("bstart", coalesce(sum("bc").over(wB), lit(0L)))
    val totals = bframe.groupBy("rf").agg(sum("bc").as("n"))
    val specs = totals.select(col("rf").as("s_rf"), col("n"),
      explode(array(
        struct(lit("p25").as("p"), expr("cast(ceil(0.25 * n) as bigint)").as("r")),
        struct(lit("p50").as("p"), expr("cast(ceil(0.5 * n) as bigint)").as("r")),
        struct(lit("p75").as("p"), expr("cast(ceil(0.75 * n) as bigint)").as("r")),
        struct(lit("p100").as("p"), col("n").as("r")))).as("t"))
      .select(col("s_rf"), col("n"), col("t.p").as("p"), col("t.r").as("r"))
    // Each spec's boundary bucket: the one whose prefix straddles r.
    // Neither join carries a broadcast HINT on purpose: the count frame
    // is groups × ~650 rows and `needed` is groups × ≤4 rows, so a
    // forced broadcast is groups-proportional driver memory — fine for
    // a handful of return flags, a driver OOM when the group column is
    // high-cardinality. AQE (on in every graft session) converts these
    // to broadcast joins at runtime from their MEASURED post-shuffle
    // sizes, which is the size-gated behavior we want: small frames
    // broadcast, large ones stay as shuffle joins on (rf[, bucket]) —
    // and the boundary-bucket prefilter semantics are identical either
    // way (HierPercentileFuzzSpec plan-asserts the ordered window still
    // sits above the prefilter join, never over the raw input).
    val located = specs.join(bcum,
      col("s_rf") === col("rf") &&
        col("bstart") < col("r") &&
        col("r") <= col("bstart") + col("bc"))
      .select(col("rf"), col("p"), col("n"),
        col("bucket").as("b"), (col("r") - col("bstart")).as("local_r"))
    val needed = located.select(col("rf").as("n_rf"), col("b")).distinct()
    val inBucket = li.join(needed,
      col("rf") === col("n_rf") && col("bucket") === col("b"))
    val wD = Window.partitionBy("rf", "bucket").orderBy("c")
    val rankedRows = inBucket
      .withColumn("rn", row_number().over(wD))
      .select(col("rf").as("v_rf"), col("bucket").as("v_b"),
        col("rn"), col("v"))
    located.join(rankedRows,
      col("rf") === col("v_rf") && col("b") === col("v_b") &&
        col("local_r") === col("rn"))
      .groupBy(col("rf").as("l_returnflag"))
      .agg(max("n").as("n_rows"),
        max(when(col("p") === "p25", col("v"))).as("p25"),
        max(when(col("p") === "p50", col("v"))).as("p50"),
        max(when(col("p") === "p75", col("v"))).as("p75"),
        max(when(col("p") === "p100", col("v"))).as("p100"))
      // eager before the total ORDER BY: same sort-sampler dedup as the
      // one-window path — the child here is the boundary-bucket window
      // + three joins. One row per group survives.
      // (`materializeFinal = false` is the plan-inspection twin.)
      .transform(df => if (materializeFinal) df.localCheckpoint(true) else df)
      .orderBy("l_returnflag")
  }

  /** Partial aggregate state for one batch of events: the algebraic
    * (commutative-monoid) form of the q45 rollup — count, exact cent sum,
    * min, max per event_type. Any partition of the input into batches
    * merges back to the same state, which is the property incremental
    * maintenance relies on. */
  private def partialState(ev: DataFrame): DataFrame =
    ev.groupBy("event_type").agg(
      count(lit(1)).as("cnt"),
      sum(cents(col("value"))).as("cents"),
      min("value").as("vmin"),
      max("value").as("vmax"))

  val all: Seq[Q] = Seq(

    // Incremental aggregate maintenance (incremental view maintenance for
    // distributive/algebraic aggregates): history's partial states plus a
    // delta batch's partial states re-aggregate to exactly the full
    // recompute. Here the "stored" state is everything before the cutoff
    // and the "delta" is everything after; at scale the base state is
    // read from a tiny state table (one row per group) while the delta
    // scan touches only the new partition — the full-history scan the
    // oracle performs never happens. avg is derived from the merged
    // exact sum and count at the END (avg is algebraic, not
    // distributive: merging averages directly would be wrong under
    // unequal batch sizes — the classic IVM trap).
    // Bit-exactness: counts and cent-sums are exact longs, so the merged
    // values are literally the full-scan values; the two final double
    // divisions see identical operands in both engines.
    Q("q45_incremental_rollup",
      (s, d) => {
        val ev = Tables.events(s, d)
        val cutoff = lit("2024-01-16").cast("timestamp")
        // NULL timestamps ride the delta batch (a `>=` alone would drop
        // them from BOTH partitions while the oracle's COUNT(*)/SUM over
        // the whole table keeps them — a latent divergence the moment the
        // generator emits a null ts). base ∪ delta must equal the table.
        val base  = partialState(ev.where(col("ts") < cutoff))
        val delta = partialState(
          ev.where(col("ts") >= cutoff || col("ts").isNull))
        base.unionAll(delta)
          .groupBy("event_type")
          .agg(sum("cnt").as("n"),
            (sum("cents") / 100.0).as("total_value"),
            min("vmin").as("min_value"),
            max("vmax").as("max_value"))
          .withColumn("avg_value", col("total_value") / col("n"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, COUNT(*) AS n,
          SUM(CAST(floor(value*100 + 0.5) AS BIGINT))/100.0 AS total_value,
          MIN(value) AS min_value, MAX(value) AS max_value,
          (SUM(CAST(floor(value*100 + 0.5) AS BIGINT))/100.0) / COUNT(*) AS avg_value
        FROM events GROUP BY event_type ORDER BY event_type""")),

    // Bucketed co-located join: orders and lineitem are materialized ONCE
    // as bucketed tables (8 buckets on the order key, sorted within
    // buckets), after which every join on that key reads matching buckets
    // side-by-side — no exchange of either table, ever again. This is the
    // layout contract that makes repeated 100 TB fact-to-fact joins
    // affordable: the shuffle is paid once at write time and amortized
    // over every subsequent query (Spark's bucketed-scan path; the
    // BucketedJoinSpec plan-asserts the join runs with ZERO shuffle
    // exchanges when broadcast is disabled). The write is memoized per
    // (session, data dir) via the catalog, so re-runs only pay the read.
    Q("q46_bucketed_join",
      (s, d) => {
        val tag = d.replaceAll("[^A-Za-z0-9]", "_")
        // session-unique path, same reasoning as q47's layout directory
        val base = new java.io.File(sys.props("java.io.tmpdir"),
          s"graft_buckets/$tag/${sessionTag(s)}").getAbsolutePath
        def ensure(name: String, sub: String, key: String,
                   df: => DataFrame): Unit =
          if (!s.catalog.tableExists(name))
            graft.store.Bucketed.write(df, name, Seq(key), 8,
              path = Some(s"$base/$sub"))
        // The table NAME carries the session tag too, not just the path:
        // the external catalog is shared by every SparkSession of one
        // SparkContext, so a dir-only tag lets two sessions both pass
        // !tableExists and race saveAsTable on the same name (Overwrite
        // repoints the table out from under the first), and a long-lived
        // JVM would serve a stale bucketed copy after the source dir is
        // regenerated. Session-unique name + session-unique path has
        // neither failure, matching q47's marker discipline.
        val (oT, lT) = bucketTableNames(s, d)
        ensure(oT, "orders", "o_orderkey",
          Tables.orders(s, d).select("o_orderkey", "o_orderpriority"))
        ensure(lT, "lineitem", "l_orderkey",
          Tables.lineitem(s, d).select("l_orderkey", "l_extendedprice"))
        s.table(lT)
          .join(s.table(oT), col("l_orderkey") === col("o_orderkey"))
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n_items"),
            (sum(cents(col("l_extendedprice"))) / 100.0).as("total_price"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority, COUNT(*) AS n_items,
          SUM(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT))/100.0 AS total_price
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // Dynamic partition pruning — the star-schema workhorse: the fact
    // table is laid out partitioned by day (the reference snapshots
    // partition by date the same way, store/WeatherStore.scala), the
    // dimension carries the selective predicate (weekday = Monday), and
    // the PLANNER turns the dim's filtered join keys into a runtime
    // IN-filter on the fact's partition column — so the fact scan reads
    // only Monday partitions even though no literal date appears in the
    // query. At 100 TB this is the difference between scanning 1/7th of
    // the fact and scanning all of it; static pushdown (S11) can't do it
    // because the date set is only known after filtering the dim.
    // ScaleOpsSpec asserts `dynamicpruningexpression` lands in the fact
    // scan's PartitionFilters. The partitioned layout is written once per
    // (SESSION, dir) into a SESSION-UNIQUE directory, memoized via a
    // session-scoped temp-view marker. Session-unique because the two
    // simpler policies both fail: an on-disk marker outlives the JVM and
    // silently serves a stale copy after the source dataset is
    // regenerated (the round-5 testdata regen scenario), while a shared
    // path + per-session rewrite lets one session overwrite the
    // directory mid-scan of another. A fresh path per session has
    // neither staleness nor a cross-process race.
    Q("q47_dpp_join",
      (s, d) => {
        val tag = d.replaceAll("[^A-Za-z0-9]", "_")
        val base = new java.io.File(sys.props("java.io.tmpdir"),
          s"graft_dpp/$tag/${sessionTag(s)}").getAbsolutePath
        val marker = s"graft_dpp_marker_$tag"
        if (!s.catalog.tableExists(marker)) {
          Tables.events(s, d)
            .withColumn("event_date", to_date(col("ts")))
            .write.mode("overwrite").partitionBy("event_date").parquet(base)
          s.emptyDataFrame.createOrReplaceTempView(marker)
        }
        val fact = s.read.parquet(base)
        val dim = Tables.events(s, d)
          .select(to_date(col("ts")).as("dd")).distinct()
          .withColumn("dow", date_format(col("dd"), "EEEE"))
        fact.join(dim, col("event_date") === col("dd"))
          .where(col("dow") === "Monday")
          .groupBy("event_date")
          .agg(count(lit(1)).as("n"),
            (sum(cents(col("value"))) / 100.0).as("total_value"))
          .orderBy("event_date")
      },
      Some("""SELECT CAST(ts AS DATE) AS event_date, COUNT(*) AS n,
          SUM(CAST(floor(value*100 + 0.5) AS BIGINT))/100.0 AS total_value
        FROM events
        WHERE dayname(CAST(ts AS DATE)) = 'Monday'
        GROUP BY 1 ORDER BY 1""")),

    // Snapshot diff audit — what changed between two corpus versions:
    // per key, added / removed / changed / unchanged decided by content
    // digest, reported as per-status counts plus an id-sum signature
    // (so the gate pins WHICH rows, not just how many). The daily
    // sanity report a 100 TB pipeline runs before promoting a snapshot;
    // ONE full-outer shuffle on the key — digests computed at the scan,
    // text never moves — where naive diffing would ship both corpora.
    // The two "snapshots" derive deterministically from the documents
    // table (membership by id mod, drift as a text suffix on every 5th
    // doc), identical on both engines.
    Q("q48_snapshot_diff",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val snapA = docs.where(col("doc_id") % 7 =!= 0)
          .select(col("doc_id").as("id_a"), md5(col("text")).as("h_a"))
        val snapB = docs.where(col("doc_id") % 11 =!= 3)
          .select(col("doc_id").as("id_b"),
            md5(when(col("doc_id") % 5 === 0, concat(col("text"), lit(" v2")))
              .otherwise(col("text"))).as("h_b"))
        snapA.join(snapB, col("id_a") === col("id_b"), "full_outer")
          .select(coalesce(col("id_a"), col("id_b")).as("doc_id"),
            when(col("id_a").isNull, "added")
              .when(col("id_b").isNull, "removed")
              .when(col("h_a") =!= col("h_b"), "changed")
              .otherwise("unchanged").as("status"))
          .groupBy("status")
          .agg(count(lit(1)).cast("long").as("n_docs"),
            sum(col("doc_id")).cast("long").as("id_sig"))
          .orderBy("status")
      },
      Some("""WITH a AS (
          SELECT doc_id AS id_a, md5(text) AS h_a
          FROM documents WHERE doc_id % 7 <> 0),
        b AS (
          SELECT doc_id AS id_b,
            md5(CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END) AS h_b
          FROM documents WHERE doc_id % 11 <> 3),
        j AS (
          SELECT COALESCE(id_a, id_b) AS doc_id,
            CASE WHEN id_a IS NULL THEN 'added'
                 WHEN id_b IS NULL THEN 'removed'
                 WHEN h_a <> h_b THEN 'changed'
                 ELSE 'unchanged' END AS status
          FROM a FULL OUTER JOIN b ON id_a = id_b)
        SELECT status, CAST(COUNT(*) AS BIGINT) AS n_docs,
          CAST(SUM(doc_id) AS BIGINT) AS id_sig
        FROM j GROUP BY status ORDER BY status""")),

    // Hierarchical EXACT percentiles — the answer to q41's documented
    // trade ("with a billion rows per group the in-partition sort is
    // the cost"): nearest-rank percentiles found WITHOUT ever sorting a
    // group. Cents give an exact order-isomorphic long for the 2-dp
    // domain (for arbitrary doubles the raw-IEEE-bits map plays the
    // same role); values bucket by `cents div 2^14` ($163.84-wide
    // buckets — ~650 populated per group on this price range, so the
    // count frame stays thousands of rows while each bucket holds
    // ~n/650 of the group), a tiny cumsum window over that frame
    // locates each requested rank's boundary bucket, and ONLY the ≤4
    // boundary buckets' rows — measured ~0.6% of the group — pay an
    // ordered window for the final in-bucket rank. Same
    // boundary-bucket pattern as c11's remainder prefix, applied to
    // rank selection. The oracle is the plain one-window nearest-rank
    // SQL — the semantic contract the hierarchical plan implements;
    // nearest-rank returns a value PRESENT in the data, so both plans
    // agree bit-for-bit (q41's determinism argument).
    Q("q49_percentile_hier",
      (s, d) => hierPercentiles(
        Tables.lineitem(s, d)
          .select(col("l_returnflag").as("rf"),
            col("l_extendedprice").as("v"),
            cents(col("l_extendedprice")).as("c"))),
      Some("""WITH ranked AS (
          SELECT l_returnflag, l_extendedprice,
            ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS rn,
            COUNT(*) OVER (PARTITION BY l_returnflag) AS n
          FROM lineitem)
        SELECT l_returnflag, CAST(MAX(n) AS BIGINT) AS n_rows,
          MAX(CASE WHEN rn = CAST(ceil(0.25 * n) AS BIGINT) THEN l_extendedprice END) AS p25,
          MAX(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT) THEN l_extendedprice END) AS p50,
          MAX(CASE WHEN rn = CAST(ceil(0.75 * n) AS BIGINT) THEN l_extendedprice END) AS p75,
          MAX(CASE WHEN rn = n THEN l_extendedprice END) AS p100
        FROM ranked GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // The DISPATCHED percentile entry point, gated: same frame and
    // contract as q49, routed through exactPercentiles — at this SF the
    // stats estimate sits below the crossover so the one-window plan
    // runs, and the oracle (the flat nearest-rank SQL both plans
    // implement) pins that the dispatch is semantically invisible.
    // ScaleOpsSpec pins the cost side: the picked plan flips exactly at
    // HierCrossoverRows under a rowsHint sweep.
    Q("q52_percentile_auto",
      (s, d) => exactPercentiles(
        Tables.lineitem(s, d)
          .select(col("l_returnflag").as("rf"),
            col("l_extendedprice").as("v"),
            cents(col("l_extendedprice")).as("c"))),
      Some("""WITH ranked AS (
          SELECT l_returnflag, l_extendedprice,
            ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS rn,
            COUNT(*) OVER (PARTITION BY l_returnflag) AS n
          FROM lineitem)
        SELECT l_returnflag, CAST(MAX(n) AS BIGINT) AS n_rows,
          MAX(CASE WHEN rn = CAST(ceil(0.25 * n) AS BIGINT) THEN l_extendedprice END) AS p25,
          MAX(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT) THEN l_extendedprice END) AS p50,
          MAX(CASE WHEN rn = CAST(ceil(0.75 * n) AS BIGINT) THEN l_extendedprice END) AS p75,
          MAX(CASE WHEN rn = n THEN l_extendedprice END) AS p100
        FROM ranked GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // EXACT percentile rollup from stored state — x5's rollup idea with
    // q49's machinery, and the reason the boundary-bucket form matters
    // beyond one query: per-(day, bucket) COUNTS are the stored artifact
    // (kilobytes per day; an exact monoid, unlike rank sketches), any
    // coarser grain merges them with one tiny sum, the merged frame
    // locates each rank's boundary bucket exactly as a from-scratch run
    // would, and only those buckets' raw rows are re-read (~1/190th of
    // each group at this bucket width). At 100 TB: percentiles at any
    // grain over years of history without ever rescanning or sorting
    // history — the raw-read is prunable because production layouts
    // store/partition the bucket column. Bucket width here is $2.56
    // (`c div 256`) — events.value spans only [0.01, 490], so q49's
    // $163.84 width would give 3 buckets and a vacuous hierarchy.
    // The oracle is the same flat one-window nearest-rank contract.
    Q("q50_percentile_rollup",
      (s, d) => {
        val ev = Tables.events(s, d)
          .where(col("ts").isNotNull && col("value").isNotNull)
          .select(to_date(col("ts")).as("day"), col("value").as("v"),
            cents(col("value")).as("c"))
          .withColumn("bucket", expr("c div 256"))
        // the STORED daily state (what a deployment materializes nightly)
        val daily = ev.groupBy("day", "bucket").agg(count(lit(1)).as("bc"))
        // answering at week grain costs ONE merge of the daily states
        val weekly = daily
          .groupBy(trunc(col("day"), "week").as("rf"), col("bucket"))
          .agg(sum("bc").as("bc"))
        val li = ev.select(trunc(col("day"), "week").as("rf"),
          col("v"), col("c"), col("bucket"))
        hierPercentilesFrom(li, weekly)
          .withColumnRenamed("l_returnflag", "week")
          .orderBy("week")
      },
      Some("""WITH ranked AS (
          SELECT date_trunc('week', CAST(ts AS DATE)) AS week, value,
            ROW_NUMBER() OVER (PARTITION BY date_trunc('week', CAST(ts AS DATE)) ORDER BY value) AS rn,
            COUNT(*) OVER (PARTITION BY date_trunc('week', CAST(ts AS DATE))) AS n
          FROM events WHERE ts IS NOT NULL AND value IS NOT NULL)
        SELECT week, CAST(MAX(n) AS BIGINT) AS n_rows,
          MAX(CASE WHEN rn = CAST(ceil(0.25 * n) AS BIGINT) THEN value END) AS p25,
          MAX(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT) THEN value END) AS p50,
          MAX(CASE WHEN rn = CAST(ceil(0.75 * n) AS BIGINT) THEN value END) AS p75,
          MAX(CASE WHEN rn = n THEN value END) AS p100
        FROM ranked GROUP BY week ORDER BY week""")),

    // Mergeable-sketch rollup (the "sketch cube"): per-DAY HLL sketches of
    // a high-ish-cardinality composite are the stored artifact; any
    // coarser grain (here ISO weeks) is answered by union-merging the
    // fixed-size daily states — the raw scan happens once, at the finest
    // grain, and every re-aggregation after it moves kilobytes. This is
    // what x1's one-shot sketch becomes when the question is asked at
    // many grains over 100 TB of history. Gate shape follows x1: sketch
    // values are engine-specific, so Spark emits the exact weekly NDV
    // plus an in-plan boolean asserting the MERGED estimate landed within
    // ±5% (lgK=12 ⇒ σ≈1.6%, so the bound is ~3σ — generous, non-vacuous),
    // and DuckDB emits the exact NDV with TRUE.
    Q("x5_sketch_rollup",
      (s, d) => {
        // Explicit null contract: rows with a null ts/user_id/props are
        // excluded on BOTH sides. Without the filter the engines diverge
        // subtly — concat_ws skips nulls where SQL `||` propagates them,
        // COUNT(DISTINCT) drops a null key where Dataset.distinct keeps
        // the row, and a null week never survives the equi-join.
        val ev = Tables.events(s, d)
          .where(col("ts").isNotNull && col("user_id").isNotNull
            && col("props").isNotNull)
          .select(to_date(col("ts")).as("day"),
            concat_ws("|", col("user_id"), col("props")).as("uk"))
        val daily = ev.groupBy("day")
          .agg(hll_sketch_agg(col("uk"), lit(12)).as("sk"))
        val weekly = daily.groupBy(trunc(col("day"), "week").as("week"))
          .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
        val exact = ev.select(trunc(col("day"), "week").as("wk"), col("uk"))
          .distinct()
          .groupBy("wk").agg(count(lit(1)).as("exact_ndv"))
        weekly.join(broadcast(exact), col("week") === col("wk"))
          .select(col("week"), col("exact_ndv"),
            (abs(col("est") - col("exact_ndv"))
              <= col("exact_ndv") * lit(0.05)).as("ndv_ok"))
          .orderBy("week")
      },
      Some("""SELECT date_trunc('week', CAST(ts AS DATE)) AS week,
          COUNT(DISTINCT CAST(user_id AS VARCHAR) || '|' || props) AS exact_ndv,
          TRUE AS ndv_ok
        FROM events
        WHERE ts IS NOT NULL AND user_id IS NOT NULL AND props IS NOT NULL
        GROUP BY 1 ORDER BY 1"""))
  )
}
