package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** One correctness-gated query: a Spark DataFrame program plus (optionally)
  * the equivalent ANSI SQL the DuckDB oracle runs on the same tables.
  *
  * Determinism rules used throughout (so the driver's hash compare is
  * stable across engines):
  *  - every double aggregate goes through DECIMAL(18,2) so the sum is
  *    exact, then casts back to DOUBLE (identical bits in both engines);
  *  - averages are computed as exact-sum / count in DOUBLE (one division,
  *    same operands → same result);
  *  - every query ends in a total ORDER BY;
  *  - ranks/counts are cast to fixed-width types (INT/BIGINT) because
  *    DuckDB widens differently than Spark.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** Relational operator exemplars from SURVEY.md §2 (P*, J*, A*, W*, O*, F*)
  * expressed Spark-first on the driver's synthetic tables.
  *
  * Each query cites the reference operator(s) it re-expresses.
  */
object Relational {

  /** Exact sum of a 2-dp double column via long cents, surfaced as DOUBLE
    * — same bits as `sum(cast(decimal(18,2))) cast double` (the oracle
    * SQL form) with cheaper codegen and agg state than Decimal (measured
    * ~40% on q17).
    *
    * Exactness for a 2-dp-valued double `v ≈ c/100` (either sign): the
    * double error is ≪ 0.5 ulp-of-cents, so `floor(v·100 + 0.5) = c`
    * exactly; the long sum S is exact (≪ 2^63); and `S / 100.0` is the
    * correctly rounded double of S/100 — the same bits
    * `decimal(18,2) → double` yields. Verified bit-identical to the
    * decimal form on every sf0.1 group. */
  private[queries] def cents(c: Column): Column =
    floor(c * 100 + 0.5).cast("long")
  private def centsSum(c: Column): Column = sum(cents(c)) / 100.0

  /** `Σ price·(1−discount)` in exact 10^-4 units: the decimal product
    * `(c1/100)·((100−c2)/100)` is `c1·(100−c2)/10^4` exactly, and the
    * integer products (≤ 10^9 per row) sum exactly in a long. Same bits
    * as the decimal-product sum cast to double. */
  private def discPriceSum(price: Column, discount: Column): Column =
    sum(cents(price) * (lit(100L) - cents(discount))) / 10000.0

  val all: Seq[Q] = Seq(

    // A2/F5/P3 — TPC-H Q1-shaped pricing summary (observation daily
    // summary shape: crates/oracle/src/db/weather_data.rs:172-212).
    Q("q1_pricing_summary",
      (s, d) => {
        Tables.lineitem(s, d)
          .where(col("l_shipdate") <= lit("1999-12-31").cast("timestamp"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            centsSum(col("l_quantity")).as("sum_qty"),
            centsSum(col("l_extendedprice")).as("sum_base_price"),
            discPriceSum(col("l_extendedprice"), col("l_discount")).as("sum_disc_price"),
            (centsSum(col("l_quantity")) / count(lit(1)).cast("double")).as("avg_qty"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus")
      },
      Some("""SELECT l_returnflag, l_linestatus,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_qty,
        COUNT(*) AS count_order
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1999-12-31 00:00:00'
        GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""")),

    // A1 — the flagship two-level daily rollup (weather_data.rs:92-146):
    // level 1 dedups/collapses per (key, fine-grain ts), level 2 re-aggregates
    // per day. Here: events per (user, hour) → per (user, day).
    Q("q2_daily_rollup",
      (s, d) => {
        val ev = Tables.events(s, d)
        val l1 = ev
          .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hour"))
          .agg(min("ts").as("min_ts"), max("ts").as("max_ts"),
            min("value").as("min_v"), max("value").as("max_v"),
            count(lit(1)).as("cnt"))
        l1.groupBy(col("user_id"), to_date(col("hour")).as("date"))
          .agg(min("min_ts").as("first_ts"), max("max_ts").as("last_ts"),
            min("min_v").as("min_value"), max("max_v").as("max_value"),
            sum("cnt").cast("long").as("n_events"))
          .orderBy("user_id", "date")
      },
      Some("""WITH l1 AS (
          SELECT user_id, date_trunc('hour', ts) AS hour,
                 MIN(ts) AS min_ts, MAX(ts) AS max_ts,
                 MIN(value) AS min_v, MAX(value) AS max_v, COUNT(*) AS cnt
          FROM events GROUP BY user_id, date_trunc('hour', ts))
        SELECT user_id, CAST(hour AS DATE) AS date,
               MIN(min_ts) AS first_ts, MAX(max_ts) AS last_ts,
               MIN(min_v) AS min_value, MAX(max_v) AS max_value,
               CAST(SUM(cnt) AS BIGINT) AS n_events
        FROM l1 GROUP BY user_id, CAST(hour AS DATE)
        ORDER BY user_id, date""")),

    // A3 — DISTINCT projection (stations dedup, weather_data.rs:224-259).
    Q("q3_distinct",
      (s, d) => Tables.events(s, d)
        .select("user_id", "event_type").distinct()
        .orderBy("user_id", "event_type"),
      Some("""SELECT DISTINCT user_id, event_type FROM events
        ORDER BY user_id, event_type""")),

    // P1/P2 — dynamic IN-list + range predicate + projection
    // (weather_data.rs:107-116).
    Q("q4_inlist_project",
      (s, d) => Tables.lineitem(s, d)
        .where(col("l_returnflag").isin("A", "R") &&
          col("l_quantity").between(10, 40))
        .select("l_orderkey", "l_linenumber", "l_quantity",
          "l_extendedprice", "l_returnflag")
        .orderBy("l_orderkey", "l_linenumber").limit(500),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag
        FROM lineitem WHERE l_returnflag IN ('A','R') AND l_quantity BETWEEN 10 AND 40
        ORDER BY l_orderkey, l_linenumber LIMIT 500""")),

    // P3/F1 — time-range predicates with DATE_TRUNC (weather_data.rs:117-131).
    Q("q5_time_range",
      (s, d) => Tables.events(s, d)
        .where(date_trunc("day", col("ts")) >= lit("2024-01-03").cast("timestamp") &&
          col("ts") < lit("2024-01-10").cast("timestamp"))
        .select("event_id", "ts", "user_id", "event_type", "value")
        .orderBy("event_id"),
      Some("""SELECT event_id, ts, user_id, event_type, value
        FROM events
        WHERE date_trunc('day', ts) >= TIMESTAMP '2024-01-03 00:00:00'
          AND ts < TIMESTAMP '2024-01-10 00:00:00'
        ORDER BY event_id""")),

    // P4/P6/F3 — null-guard filter + COALESCE (download_observations.rs:242-250,
    // event_data.rs:615).
    Q("q6_null_guard",
      (s, d) => {
        val big = when(col("value") >= 100, col("value"))
        Tables.events(s, d)
          .withColumn("big_value", big)
          .where(col("big_value").isNotNull)
          .select(col("event_id"), col("big_value"),
            coalesce(when(col("event_type") === "error", col("value")), lit(0.0))
              .as("error_value"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id,
          CASE WHEN value >= 100 THEN value END AS big_value,
          COALESCE(CASE WHEN event_type = 'error' THEN value END, 0.0) AS error_value
        FROM events WHERE (CASE WHEN value >= 100 THEN value END) IS NOT NULL
        ORDER BY event_id""")),

    // J1 — 3-way inner join on keys (event_data.rs:450-472). customer is
    // the join's SMALL side here, but unlike nation (a fixed 25-row dim)
    // it scales with the fact tables — a forced broadcast hint would be
    // wrong the day the deployment is 100 TB (driver/executor OOM on a
    // TB-sized build side). Same posture as q49's count frames: no
    // hint; AQE converts to a broadcast join at runtime from the
    // MEASURED size while it fits, and degrades to a shuffle join when
    // it doesn't.
    Q("q7_threeway_join",
      (s, d) => Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_items"), centsSum(col("l_extendedprice")).as("revenue"))
        .orderBy("c_mktsegment"),
      Some("""SELECT c_mktsegment, COUNT(*) AS n_items,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment ORDER BY c_mktsegment""")),

    // J2 — inner join + group by (event_data.rs:479-487).
    Q("q8_join_groupby",
      (s, d) => Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("n_customers"), centsSum(col("c_acctbal")).as("total_acctbal"))
        .orderBy("n_name"),
      Some("""SELECT n_name, COUNT(*) AS n_customers,
          CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n_name""")),

    // J4/A4 — left join on aggregate subquery + COALESCE(cnt,0)
    // (event_data.rs:603-624).
    Q("q9_left_join_agg",
      (s, d) => {
        val counts = Tables.orders(s, d)
          .groupBy("o_custkey").agg(count(lit(1)).as("cnt"))
        Tables.customer(s, d)
          .join(counts, col("c_custkey") === col("o_custkey"), "left")
          .select(col("c_custkey"), col("c_name"),
            coalesce(col("cnt"), lit(0L)).cast("long").as("total_orders"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_name, CAST(COALESCE(cnt, 0) AS BIGINT) AS total_orders
        FROM customer LEFT JOIN
          (SELECT o_custkey, COUNT(*) AS cnt FROM orders GROUP BY o_custkey) oc
          ON c_custkey = oc.o_custkey
        ORDER BY c_custkey""")),

    // J5 — UPDATE ... FROM (VALUES ...) score write-back shape
    // (event_data.rs:405-448), expressed as the equivalent join+select.
    Q("q10_update_join",
      (s, d) => {
        val scores = s.createDataFrame(Seq(
          ("BUILDING", 10), ("AUTOMOBILE", 20), ("MACHINERY", 30)
        )).toDF("seg", "bonus")
        Tables.customer(s, d)
          .join(broadcast(scores), col("c_mktsegment") === col("seg"), "left")
          .select(col("c_custkey"),
            coalesce(col("bonus"), lit(0)).cast("int").as("bonus"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, CAST(COALESCE(bonus, 0) AS INT) AS bonus
        FROM customer LEFT JOIN
          (VALUES ('BUILDING', 10), ('AUTOMOBILE', 20), ('MACHINERY', 30)) scores(seg, bonus)
          ON c_mktsegment = seg
        ORDER BY c_custkey""")),

    // J6 — per-key list assembly (Rust HashMap<entry, Vec<choice>>,
    // event_data.rs:520-537) → collect_list, sorted for determinism and
    // surfaced as a comma-joined string (the driver's pandas compare
    // can't sort array columns).
    Q("q11_collect_list",
      (s, d) => Tables.lineitem(s, d)
        .groupBy("l_orderkey")
        .agg(
          array_join(
            transform(sort_array(collect_list(col("l_linenumber"))),
              x => x.cast("string")), ",").as("lines"),
          count(lit(1)).as("n_lines"))
        .orderBy("l_orderkey"),
      Some("""SELECT l_orderkey,
          array_to_string(list_sort(list(l_linenumber)), ',') AS lines,
          COUNT(*) AS n_lines
        FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""")),

    // J8/F7 — equi-join on rounded numeric buckets (coordinate 2-dp match,
    // download_forecast.rs:831-863). DECIMAL round: both engines round
    // half-away-from-zero on exact decimals.
    Q("q12_bucket_join",
      (s, d) => {
        val sup = Tables.supplier(s, d)
          .select(col("s_suppkey"),
            round(col("s_acctbal").cast("decimal(18,2)"), -1).cast("double").as("bucket"))
        val cust = Tables.customer(s, d)
          .select(col("c_custkey"),
            round(col("c_acctbal").cast("decimal(18,2)"), -1).cast("double").as("bucket"))
        sup.join(cust, "bucket")
          .select("s_suppkey", "c_custkey", "bucket")
          .orderBy("s_suppkey", "c_custkey")
      },
      Some("""SELECT s_suppkey, c_custkey,
          CAST(ROUND(CAST(s_acctbal AS DECIMAL(18,2)), -1) AS DOUBLE) AS bucket
        FROM supplier JOIN customer
          ON ROUND(CAST(s_acctbal AS DECIMAL(18,2)), -1) = ROUND(CAST(c_acctbal AS DECIMAL(18,2)), -1)
        ORDER BY s_suppkey, c_custkey""")),

    // W1/J9 — forward-fill: carry the last non-null observation forward per
    // key (download_forecast.rs:431-571).
    Q("q13_forward_fill",
      (s, d) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(s, d)
          .withColumn("filled_error",
            last(when(col("event_type") === "error", col("value")), ignoreNulls = true).over(w))
          .select("event_id", "user_id", "ts", "filled_error")
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id, ts,
          last_value(CASE WHEN event_type = 'error' THEN value END IGNORE NULLS)
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_error
        FROM events ORDER BY event_id""")),

    // W2 — interval-index assignment (time-layout containment,
    // download_forecast.rs:573-589) done the scalable way: equi-join on the
    // derived day bucket with the range predicate as residual.
    Q("q14_range_join",
      (s, d) => {
        val ev = Tables.events(s, d)
        val ranges = ev.select(to_date(col("ts")).as("d")).distinct()
          .select(col("d"), col("d").cast("timestamp").as("range_start"),
            (col("d").cast("timestamp") + expr("INTERVAL 1 DAY")).as("range_end"))
        ev.join(broadcast(ranges),
            to_date(col("ts")) === col("d") &&
              col("ts") >= col("range_start") && col("ts") < col("range_end"))
          .select(col("event_id"), col("d").as("slot_date"))
          .orderBy("event_id")
      },
      Some("""WITH ranges AS (
          SELECT DISTINCT CAST(ts AS DATE) AS d,
            CAST(CAST(ts AS DATE) AS TIMESTAMP) AS range_start,
            CAST(CAST(ts AS DATE) AS TIMESTAMP) + INTERVAL 1 DAY AS range_end
          FROM events)
        SELECT event_id, d AS slot_date
        FROM events JOIN ranges ON CAST(ts AS DATE) = d
          AND ts >= range_start AND ts < range_end
        ORDER BY event_id""")),

    // W3/A7 — top-K per group via row_number over desc score
    // (oracle.rs:597-617).
    Q("q15_topk_rank",
      (s, d) => {
        val agg = Tables.events(s, d)
          .groupBy("event_type", "user_id")
          .agg(centsSum(col("value")).as("total"))
        val w = Window.partitionBy("event_type")
          .orderBy(col("total").desc, col("user_id"))
        agg.withColumn("rnk", row_number().over(w).cast("int"))
          .where(col("rnk") <= 3)
          .orderBy("event_type", "rnk")
      },
      Some("""SELECT event_type, user_id, total, CAST(rnk AS INT) AS rnk FROM (
          SELECT event_type, user_id, total,
            ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY total DESC, user_id) AS rnk
          FROM (SELECT event_type, user_id,
                  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
                FROM events GROUP BY event_type, user_id))
        WHERE rnk <= 3 ORDER BY event_type, rnk""")),

    // O1/O3 — multi-key sort + limit (ui/main.js:52).
    Q("q16_sort_limit",
      (s, d) => Tables.events(s, d)
        .select("event_id", "user_id", "ts", "event_type")
        .orderBy(col("user_id"), col("ts").desc, col("event_id"))
        .limit(200),
      Some("""SELECT event_id, user_id, ts, event_type FROM events
        ORDER BY user_id, ts DESC, event_id LIMIT 200""")),

    // O4/S10 — UNION ALL of heterogeneous scans then re-aggregate
    // (multi-file read_parquet scan shape).
    Q("q17_union_agg",
      (s, d) => {
        val a = Tables.lineitem(s, d).where(col("l_returnflag") === "A")
          .select(col("l_orderkey").as("k"), col("l_extendedprice").as("v"))
        val b = Tables.orders(s, d)
          .select(col("o_orderkey").as("k"), col("o_totalprice").as("v"))
        a.unionByName(b)
          .groupBy("k")
          .agg(count(lit(1)).as("n"), centsSum(col("v")).as("sv"))
          .orderBy("k")
      },
      Some("""WITH u AS (
          SELECT l_orderkey AS k, l_extendedprice AS v FROM lineitem WHERE l_returnflag = 'A'
          UNION ALL
          SELECT o_orderkey AS k, o_totalprice AS v FROM orders)
        SELECT k, COUNT(*) AS n, CAST(SUM(CAST(v AS DECIMAL(18,2))) AS DOUBLE) AS sv
        FROM u GROUP BY k ORDER BY k""")),

    // F1/F2/F6/F7/F9 — scalar function pack: date_trunc, casts, RFC-3339
    // formatting, decimal rounding, string ops (weather_data.rs:94-128;
    // mod.rs:211-227).
    Q("q18_scalar_funcs",
      (s, d) => Tables.orders(s, d)
        .select(
          col("o_orderkey"),
          to_date(date_trunc("day", col("o_orderdate"))).as("order_day"),
          date_format(col("o_orderdate"), "yyyy-MM-dd'T'HH:mm:ss'Z'").as("rfc3339"),
          year(col("o_orderdate")).cast("int").as("order_year"),
          round(col("o_totalprice").cast("decimal(18,2)"), 1).cast("double").as("rounded_price"),
          upper(col("o_orderpriority")).as("prio_upper"),
          concat(col("o_orderstatus"), lit("-"), col("o_orderpriority")).as("status_prio"),
          coalesce(nullif(col("o_orderstatus"), lit("O")), lit("open")).as("status_or_open"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
          CAST(date_trunc('day', o_orderdate) AS DATE) AS order_day,
          strftime(o_orderdate, '%Y-%m-%dT%H:%M:%SZ') AS rfc3339,
          CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year,
          CAST(ROUND(CAST(o_totalprice AS DECIMAL(18,2)), 1) AS DOUBLE) AS rounded_price,
          UPPER(o_orderpriority) AS prio_upper,
          o_orderstatus || '-' || o_orderpriority AS status_prio,
          COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS status_or_open
        FROM orders ORDER BY o_orderkey""")),

    // A6 — CASE-based scoring + deterministic tiebreak
    // (oracle.rs:445-588: Par=20, Over/Under=10, score*10000+tiebreak).
    Q("q19_case_scoring",
      (s, d) => {
        val points = when(col("event_type") === "purchase", 20)
          .when(col("event_type") === "click", 10).otherwise(0)
        Tables.events(s, d)
          .groupBy("user_id")
          .agg(sum(points).cast("long").as("points"))
          .select(col("user_id"), col("points"),
            (col("points") * 10000 + (lit(9999) - pmod(col("user_id"), lit(10000))))
              .cast("long").as("score"))
          .orderBy(col("score").desc, col("user_id"))
      },
      Some("""SELECT user_id, points,
          CAST(points * 10000 + (9999 - user_id % 10000) AS BIGINT) AS score
        FROM (SELECT user_id,
                CAST(SUM(CASE event_type WHEN 'purchase' THEN 20 WHEN 'click' THEN 10 ELSE 0 END) AS BIGINT) AS points
              FROM events GROUP BY user_id)
        ORDER BY score DESC, user_id""")),

    // Streaming-shaped sessionization: lag + gap > 30 min starts a session
    // (hourly snapshot cadence analog, daemon/src/main.rs:39-50).
    Q("q20_session_gap",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        Tables.events(s, d)
          .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
          .withColumn("new_session",
            when(col("prev_us").isNull ||
              unix_micros(col("ts")) - col("prev_us") > 1800000000L, 1).otherwise(0))
          .groupBy("user_id")
          .agg(sum(col("new_session")).cast("long").as("sessions"),
            count(lit(1)).as("n_events"))
          .orderBy("user_id")
      },
      Some("""SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS sessions,
          COUNT(*) AS n_events
        FROM (SELECT user_id,
                CASE WHEN lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                      OR epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
                     THEN 1 ELSE 0 END AS new_session
              FROM events)
        GROUP BY user_id ORDER BY user_id""")),

    // J9 — the general as-of (point-in-time) join: for every click, the
    // latest preceding purchase by the same user. Spark side runs the
    // scalable union+window encoding (graft.queries.AsOf — one shuffle on
    // the key, no range join); the oracle uses DuckDB's native ASOF LEFT
    // JOIN, so two independent as-of implementations must agree. Misses
    // surface as (-1, epoch) to keep the compare null-free.
    Q("q22_asof_join",
      (s, d) => {
        val ev = Tables.events(s, d)
        val clicks = ev.where(col("event_type") === "click")
          .select("event_id", "user_id", "ts")
        val purchases = ev.where(col("event_type") === "purchase")
          .groupBy("user_id", "ts").agg(max("event_id").as("pid"))
        AsOf.joinBackwardFlat(clicks, purchases, Seq("user_id"), "ts", "ts",
            prefix = "last_", defaults = Map(
              "pid" -> lit(-1L),
              "ts" -> lit("1970-01-01 00:00:00").cast("timestamp")))
          .orderBy("event_id")
      },
      Some("""WITH p AS (SELECT user_id, ts, max(event_id) AS pid FROM events
                WHERE event_type = 'purchase' GROUP BY user_id, ts),
             c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click')
        SELECT c.event_id, c.user_id, c.ts,
          COALESCE(p.ts, TIMESTAMP '1970-01-01 00:00:00') AS last_ts,
          COALESCE(p.pid, -1) AS last_pid
        FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts >= p.ts
        ORDER BY c.event_id""")),

    // Skew-safe aggregation gate: event_type has only ~5 values — the
    // canonical hot-key groupBy. Spark runs the two-phase salted shape
    // (graft.queries.Skew.saltedAgg: partials on (key, salt), then merge);
    // the oracle is the plain GROUP BY, so the rewrite must be exact.
    Q("q23_salted_agg",
      (s, d) => Skew.saltedAgg(
          Tables.events(s, d).select("event_type", "value"),
          Seq("event_type"), factor = 16)(
          partial = Seq(count(lit(1)).as("p_n"),
            sum(col("value").cast("decimal(18,2)")).as("p_sv")),
          merge = Seq(sum("p_n").cast("long").as("n"),
            sum("p_sv").cast("double").as("sv")))
        .orderBy("event_type"),
      Some("""SELECT event_type, COUNT(*) AS n,
          CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sv
        FROM events GROUP BY event_type ORDER BY event_type""")),

    // Skew-safe JOIN gate, completing q23's pair: the replicate-side
    // salted join (graft.queries.Skew.saltedJoin — skewed side salted,
    // other side exploded across all salt values) must be row-for-row
    // the plain join. The skewed side is events on its ~5-value hot key;
    // the other side is a DATA-DERIVED per-type mean (the "too dynamic
    // to broadcast by hint" case salting exists for — a literal dim
    // would make the gate vacuous). Mean = exact cent sum / 100 /
    // count, so both engines compare against bit-identical doubles.
    Q("q51_salted_join",
      (s, d) => {
        val ev = Tables.events(s, d).select("event_type", "value")
        val dim = ev.groupBy("event_type")
          .agg((sum(cents(col("value"))) / 100.0 / count(lit(1)))
            .as("mean_value"))
        Skew.saltedJoin(ev, dim, Seq("event_type"), factor = 16)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            sum(when(col("value") > col("mean_value"), 1L).otherwise(0L))
              .cast("long").as("n_above"))
          .orderBy("event_type")
      },
      Some("""WITH m AS (SELECT event_type,
            SUM(CAST(floor(value*100 + 0.5) AS BIGINT))/100.0/COUNT(*) AS mean_value
          FROM events GROUP BY event_type)
        SELECT e.event_type, COUNT(*) AS n,
          CAST(SUM(CASE WHEN e.value > m.mean_value THEN 1 ELSE 0 END) AS BIGINT) AS n_above
        FROM events e JOIN m USING (event_type)
        GROUP BY e.event_type ORDER BY e.event_type""")),

    // F16 at scale: the outcome permutation space as a distributed
    // cross-product of index ranges (the reference's single-threaded
    // generator marks n=200 "slow"); gated by an aggregate signature so
    // both engines must produce the identical 970,200-row space.
    Q("q24_perm_signature",
      (s, d) => graft.oracle.Outcomes.permutationsDF(s, 100, 3)
        .agg(count(lit(1)).as("n_perms"),
          sum(col("p0") * 10000 + col("p1") * 100 + col("p2")).cast("long").as("sig")),
      Some("""SELECT COUNT(*) AS n_perms,
          CAST(SUM(p0 * 10000 + p1 * 100 + p2) AS BIGINT) AS sig
        FROM range(100) t0(p0), range(100) t1(p1), range(100) t2(p2)
        WHERE p0 <> p1 AND p0 <> p2 AND p1 <> p2""")),

    // §3.3 — the ad-hoc SQL surface: user-typed SQL over registered temp
    // views, run through the parser-backed SELECT-only guard
    // (ui/main.js:112-141; the reference's guard was a TODO).
    Q("q21_adhoc_sql",
      (s, d) => {
        Tables.registerAll(s, d)
        graft.sql.AdHoc.run(s,
          """SELECT event_id, user_id, ts, event_type FROM events
            |ORDER BY user_id, ts DESC, event_id LIMIT 200""".stripMargin)
      },
      Some("""SELECT event_id, user_id, ts, event_type FROM events
        ORDER BY user_id, ts DESC, event_id LIMIT 200""")),

    // A1 generalized — multi-level ROLLUP in one pass (per-group, per-flag
    // subtotal, grand total). Spark's rollup lowers to a single Expand +
    // hash aggregate: one scan, one shuffle regardless of how many
    // grouping levels, which is the 100 TB shape (vs unioning three
    // GROUP BYs = three scans). NULL grouping cells are coalesced to a
    // sentinel on both sides (the driver compare can't sort mixed
    // NULL/str columns), which also keeps the output unambiguous since
    // 'ALL' collides with no TPC-H flag value.
    Q("q25_rollup",
      (s, d) => Tables.lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(centsSum(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("n_rows"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("l_returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("l_linestatus"),
          col("sum_qty"), col("n_rows"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
          COALESCE(l_linestatus, 'ALL') AS l_linestatus,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
          COUNT(*) AS n_rows
        FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        ORDER BY l_returnflag, l_linestatus""")),

    // W-family completion — frame-based rolling aggregate (ROWS BETWEEN),
    // the one window shape w1-w5 don't exercise (they use rank /
    // unbounded fills). Partitioned by user → scales with user
    // cardinality; (ts, event_id) makes the frame order total, so both
    // engines see identical frame contents; the rolling sum rides the
    // exact long-cents form. The user filter is a pushed scan predicate,
    // not a post-window filter.
    Q("q26_moving_avg",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(-3, Window.currentRow)
        Tables.events(s, d)
          .where(col("user_id") % 97 === 0)
          .select(col("event_id"), col("user_id"), col("ts"),
            (sum(cents(col("value"))).over(w) / 100.0).as("mov_sum"),
            count(lit(1)).over(w).as("mov_n"))
          .orderBy("user_id", "ts", "event_id")
      },
      Some("""SELECT event_id, user_id, ts,
          CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS mov_sum,
          COUNT(*) OVER w AS mov_n
        FROM events WHERE user_id % 97 = 0
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
        ORDER BY user_id, ts, event_id""")),

    // J-family completion — LEFT ANTI join (NOT EXISTS): customers with
    // no big-ticket order. Plans as a shuffle-keyed anti hash join (or
    // broadcast when the right side is small): existence is decided at
    // the join, no aggregate-then-filter detour over the big side, and
    // the price predicate prunes the orders scan before the join.
    Q("q27_anti_join",
      (s, d) => Tables.customer(s, d)
        .join(Tables.orders(s, d).where(col("o_totalprice") > 300000d),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_name FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_totalprice > 300000)
        ORDER BY c_custkey""")),

    // J-family completion — LEFT SEMI join (EXISTS): suppliers with at
    // least one shipped lineitem. Semi stops at first match per key and
    // never duplicates the left side — the correct shape for existence
    // filters against a fact table (an inner-join-distinct would shuffle
    // every matching fact row).
    Q("q28_semi_join",
      (s, d) => Tables.supplier(s, d)
        .join(Tables.lineitem(s, d),
          col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select(col("s_suppkey"), col("s_name"))
        .orderBy("s_suppkey"),
      Some("""SELECT s_suppkey, s_name FROM supplier s
        WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_suppkey = s.s_suppkey)
        ORDER BY s_suppkey""")),

    // ANALYZE-style statistics collection — the per-column
    // ndv / null-count / min / max pass a cost-based optimizer (and any
    // data-quality monitor) runs over every table. One scan, one
    // aggregate; countDistinct plans as a two-phase partial-distinct
    // aggregate (dedup map-side per partition, exact merge after — not a
    // naive global set). At 100 TB the exact ndv is what you'd swap for
    // the HLL sketch gated separately as x1_approx_ndv.
    Q("q29_table_stats",
      (s, d) => {
        // ONE scan for every column's stats, via group-by-value
        // pre-aggregation: each row fans out once per profiled column
        // into a (column_name, typed-value) key, and the FIRST aggregate
        // is a plain count — a HashAggregate whose map-side combine
        // collapses the stream to the per-column distinct values. All
        // order-sensitive work (ndv, min/max — min over a STRING has an
        // immutable agg buffer, which would force the whole corpus
        // through SortAggregate in the naive multi-countDistinct plan;
        // measured 6× slower) then runs over that ndv-sized remnant.
        // Values stay typed (one nullable slot per type class) so
        // min/max order numerically, not lexicographically.
        val perValue = Tables.lineitem(s, d)
          .select(explode(array(
            struct(lit("l_suppkey").as("column_name"),
              col("l_suppkey").as("lv"),
              lit(null).cast("double").as("dv"),
              lit(null).cast("string").as("sv")),
            struct(lit("l_quantity").as("column_name"),
              lit(null).cast("bigint").as("lv"),
              col("l_quantity").as("dv"),
              lit(null).cast("string").as("sv")),
            struct(lit("l_returnflag").as("column_name"),
              lit(null).cast("bigint").as("lv"),
              lit(null).cast("double").as("dv"),
              col("l_returnflag").as("sv")))).as("v"))
          .select(col("v.column_name"), col("v.lv"), col("v.dv"), col("v.sv"))
          .groupBy("column_name", "lv", "dv", "sv")
          .agg(count(lit(1)).as("cnt"))
        val isNullRow =
          col("lv").isNull && col("dv").isNull && col("sv").isNull
        perValue.groupBy("column_name")
          .agg(
            sum(col("cnt")).as("n_rows"),
            coalesce(sum(when(isNullRow, col("cnt"))), lit(0L)).as("n_nulls"),
            count(when(!isNullRow, lit(1))).as("ndv"),
            coalesce(min(col("lv")).cast("string"),
              min(col("dv")).cast("string"), min(col("sv"))).as("min_str"),
            coalesce(max(col("lv")).cast("string"),
              max(col("dv")).cast("string"), max(col("sv"))).as("max_str"))
          .orderBy("column_name")
      },
      Some("""SELECT * FROM (
          SELECT 'l_suppkey' AS column_name, COUNT(*) AS n_rows,
            CAST(SUM(CASE WHEN l_suppkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
            COUNT(DISTINCT l_suppkey) AS ndv,
            CAST(MIN(l_suppkey) AS VARCHAR) AS min_str,
            CAST(MAX(l_suppkey) AS VARCHAR) AS max_str
          FROM lineitem
          UNION ALL
          SELECT 'l_quantity', COUNT(*),
            CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT),
            COUNT(DISTINCT l_quantity),
            CAST(MIN(l_quantity) AS VARCHAR), CAST(MAX(l_quantity) AS VARCHAR)
          FROM lineitem
          UNION ALL
          SELECT 'l_returnflag', COUNT(*),
            CAST(SUM(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT),
            COUNT(DISTINCT l_returnflag),
            CAST(MIN(l_returnflag) AS VARCHAR), CAST(MAX(l_returnflag) AS VARCHAR)
          FROM lineitem)
        ORDER BY column_name""")),

    // Set operations — EXCEPT/INTERSECT as first-class operators. Spark
    // plans both as a left-anti / left-semi join plus distinct hash
    // aggregates — every stage keyed on the set column (the q27/q28
    // shuffle shape), nothing materializes-and-diffs row bags. Both
    // branches ride one output with a discriminator column.
    Q("q30_set_ops",
      (s, d) => {
        val custN = Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
        val suppN = Tables.supplier(s, d).select(col("s_nationkey").as("nationkey"))
        custN.except(suppN).withColumn("op", lit("except"))
          .unionByName(custN.intersect(suppN).withColumn("op", lit("intersect")))
          .select("op", "nationkey")
          .orderBy("op", "nationkey")
      },
      Some("""SELECT 'except' AS op, nationkey FROM (
          SELECT c_nationkey AS nationkey FROM customer
          EXCEPT SELECT s_nationkey FROM supplier)
        UNION ALL
        SELECT 'intersect' AS op, nationkey FROM (
          SELECT c_nationkey AS nationkey FROM customer
          INTERSECT SELECT s_nationkey FROM supplier)
        ORDER BY op, nationkey""")),

    // PIVOT — long-to-wide reshaping with an EXPLICIT value list (an
    // inferred list would mean an extra distinct pass over the fact
    // table AND a nondeterministic column order; at scale the domain is
    // always declared). Plans as one aggregate with per-value
    // conditional counts — one scan, one shuffle on the grouping key.
    Q("q31_pivot",
      (s, d) => Tables.events(s, d)
        .where(col("user_id") % 29 === 0)
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy("user_id"),
      Some("""SELECT user_id,
          COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
          COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view,
          COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
          COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
          COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error
        FROM events WHERE user_id % 29 = 0
        GROUP BY user_id ORDER BY user_id""")),

    // The 100 TB forms of the two expensive exact statistics: HLL++
    // distinct-count and GK-sketch quantiles — fixed-size mergeable
    // sketch state per partition instead of a distinct shuffle / global
    // sort. Sketch VALUES are engine-specific (no cross-engine compare
    // possible), so the oracle gate is the error-bound CONTRACT computed
    // in-plan: Spark emits the exact statistic plus a boolean asserting
    // the sketch landed inside its published bound, DuckDB emits the
    // exact statistic with TRUE — hash-comparable, and a sketch
    // regression flips the boolean and fails the gate. ApproxSpec keeps
    // the tighter numeric assertions.
    Q("x1_approx_ndv",
      (s, d) => {
        // The sketch and the exact NDV are SEPARATE aggregates joined on
        // the tiny group key — never one agg: mixing countDistinct with
        // an imperative sketch forces the distinct-rewrite Expand plan,
        // where the 4 KB HLL buffer rides every expanded row (measured
        // 64 s vs 0.9+0.8 s split at sf0.1). The exact side is two-level
        // (distinct pairs, then count) so neither plan ever expands.
        val li = Tables.lineitem(s, d)
        val approx = li.groupBy("l_returnflag")
          .agg(approx_count_distinct(col("l_orderkey"), 0.02).as("approx_ndv"),
            count(lit(1)).as("n_rows"))
        val exact = li.select("l_returnflag", "l_orderkey").distinct()
          .groupBy(col("l_returnflag").as("rf"))
          .agg(count(lit(1)).as("exact_ndv"))
        // rsd 0.02 ⇒ ±5% covers 2.5σ — a generous but non-vacuous gate
        approx.join(broadcast(exact), col("l_returnflag") === col("rf"))
          .select(col("l_returnflag"), col("exact_ndv"), col("n_rows"),
            (abs(col("approx_ndv") - col("exact_ndv"))
              <= col("exact_ndv") * lit(0.05)).as("ndv_ok"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag, COUNT(DISTINCT l_orderkey) AS exact_ndv,
          COUNT(*) AS n_rows, TRUE AS ndv_ok
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // x2 — GK-sketch quantiles, gated by the RANK sandwich (the sketch's
    // actual guarantee: the returned element's rank is within ε·n of the
    // target; value-space error is unbounded, rank error is not). For
    // each approx quantile v at fraction q: #(< v) ≤ q·n + ε·n and
    // #(≤ v) ≥ q·n − ε·n, duplicate-safe on both sides. One broadcast of
    // the 3-row approx frame back over the scan.
    Q("x2_approx_quantile",
      (s, d) => {
        val li = Tables.lineitem(s, d).select(col("l_returnflag"), col("l_extendedprice"))
        val approx = li.groupBy("l_returnflag")
          .agg(percentile_approx(col("l_extendedprice"),
            array(lit(0.5), lit(0.95), lit(0.99)), lit(10000)).as("qs"))
          .select(col("l_returnflag").as("rf"),
            col("qs").getItem(0).as("v50"),
            col("qs").getItem(1).as("v95"),
            col("qs").getItem(2).as("v99"))
        def lt(v: String) = sum(when(col("l_extendedprice") < col(v), 1L).otherwise(0L))
        def le(v: String) = sum(when(col("l_extendedprice") <= col(v), 1L).otherwise(0L))
        def ok(q: Double, ltc: Column, lec: Column, n: Column): Column = {
          val slack = n * lit(1.0 / 10000) + lit(1.0)
          (ltc <= n * lit(q) + slack) && (lec >= n * lit(q) - slack)
        }
        li.join(broadcast(approx), col("l_returnflag") === col("rf"))
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n_rows"),
            lt("v50").as("lt50"), le("v50").as("le50"),
            lt("v95").as("lt95"), le("v95").as("le95"),
            lt("v99").as("lt99"), le("v99").as("le99"))
          .select(col("l_returnflag"), col("n_rows"),
            ok(0.50, col("lt50"), col("le50"), col("n_rows")).as("ok_p50"),
            ok(0.95, col("lt95"), col("le95"), col("n_rows")).as("ok_p95"),
            ok(0.99, col("lt99"), col("le99"), col("n_rows")).as("ok_p99"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag, COUNT(*) AS n_rows,
          TRUE AS ok_p50, TRUE AS ok_p95, TRUE AS ok_p99
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // x3 — heavy hitters via a count-min sketch: the fixed-size mergeable
    // state that replaces t7's exact (token, count) shuffle at 100 TB.
    // The corpus pass is ONE sketch aggregate (partials merge in the
    // combiner, ε=0.001 ⇒ ~27 KB of state regardless of corpus size);
    // probing is the top-20 exact tokens joined against the broadcast
    // one-row sketch through the native CmsEstimate expression. Gate:
    // CMS never undercounts and overcounts by at most ε·N (per-probe
    // confidence 99%; 20 probes all inside the bound is the contract the
    // oracle's TRUE column checks).
    Q("x3_cms_heavy_hitters",
      (s, d) => {
        val toks = Tables.documentsSpread(s, d)
          .select(explode(TextOps.tokens).as("tok"))
        val sketch = toks.agg(
          expr("count_min_sketch(tok, 0.001d, 0.99d, 42)").as("cms"),
          count(lit(1)).as("total_toks"))
        val top = toks.groupBy("tok").agg(count(lit(1)).as("exact_n"))
          .orderBy(col("exact_n").desc, col("tok")).limit(20)
        val est = org.apache.spark.sql.graft.ColumnBridge.column(
          graft.functions.CmsEstimate(
            org.apache.spark.sql.graft.ColumnBridge.expression(col("cms")),
            org.apache.spark.sql.graft.ColumnBridge.expression(col("tok"))))
        top.crossJoin(broadcast(sketch))
          .select(col("tok"), col("exact_n"),
            (est >= col("exact_n") &&
              est <= col("exact_n") + ceil(col("total_toks") * lit(0.001)))
              .as("cms_ok"))
          .orderBy(col("exact_n").desc, col("tok"))
      },
      Some("""SELECT tok, COUNT(*) AS exact_n, TRUE AS cms_ok
        FROM (SELECT unnest(string_split(lower(text), ' ')) AS tok FROM documents)
        GROUP BY tok ORDER BY exact_n DESC, tok LIMIT 20""")),

    // KMV (k-minimum-values) sketch set operations — estimated
    // cross-source content overlap (Beyer et al. 2007): per source,
    // the sketch is the k=64 smallest values of a uniform content hash
    // over its DISTINCT documents; for each source pair, the k smallest
    // of the sketch union are inspected and Jaccard ≈ |in both| / k.
    // This is the SCALE path for pairwise overlap matrices: d11
    // computes the exact answer by shuffling corpus-sized shingle sets;
    // KMV reduces every source to a fixed k values, so the pair stage
    // is sketch-sized (pairs × 2k rows) no matter how big the corpus.
    // The sketch itself is built by [[graft.functions.MinKDistinctLongs]]
    // — a bounded-state Catalyst aggregate whose partials are ≤k-element
    // sorted sets merged map-side, so the ONLY corpus-sized work is the
    // scan: no distinct, no per-source window sort, and the shuffle
    // carries at most k longs per (map partition × source). Deterministic
    // by construction: the "uniform hash" is the first 15 hex chars of
    // md5 (identical in both engines) parsed as an exact 60-bit integer,
    // every rank is over exact integers, and the estimate is ONE
    // division of exact ints — no float anywhere until the last
    // division. (The oracle computes the same sketch the readable way —
    // distinct + ranked window — which IS the semantic contract the
    // aggregate implements.)
    Q("x4_kmv_jaccard",
      (s, d) => {
        val k = 64
        val docs = Tables.documentsSpread(s, d)
        import org.apache.spark.sql.graft.ColumnBridge
        val sk = docs.select(col("source"),
          expr("cast(conv(substring(md5(text), 1, 15), 16, 10) as bigint)").as("hv"))
          .groupBy("source")
          .agg(ColumnBridge.column(
            graft.functions.MinKDistinctLongs(
              ColumnBridge.expression(col("hv")), k)
              .toAggregateExpression()).as("mink"))
          .select(col("source"), explode(col("mink")).as("hv"))
        val srcs = sk.select("source").distinct()
        val pairs = srcs.select(col("source").as("s1"))
          .crossJoin(srcs.select(col("source").as("s2")))
          .where(col("s1") < col("s2"))
        val members = pairs
          .join(sk.select(col("source").as("s1"), col("hv"), lit(1).as("in_a")),
            Seq("s1"))
          .select(col("s1"), col("s2"), col("hv"), col("in_a"), lit(0).as("in_b"))
          .unionByName(pairs
            .join(sk.select(col("source").as("s2"), col("hv"), lit(1).as("in_b")),
              Seq("s2"))
            .select(col("s1"), col("s2"), col("hv"), lit(0).as("in_a"), col("in_b")))
          .groupBy("s1", "s2", "hv")
          .agg(max(col("in_a")).as("in_a"), max(col("in_b")).as("in_b"))
        val wu = Window.partitionBy("s1", "s2").orderBy("hv")
        members.withColumn("rn", row_number().over(wu)).where(col("rn") <= k)
          .groupBy("s1", "s2")
          .agg(count(lit(1)).cast("int").as("k_used"),
            sum(col("in_a") * col("in_b")).cast("int").as("n_shared"))
          .withColumn("jaccard_est",
            col("n_shared").cast("double") / col("k_used").cast("double"))
          .orderBy("s1", "s2")
      },
      Some("""WITH hv AS (
          SELECT DISTINCT source,
            ('0x' || substr(md5(text), 1, 15))::BIGINT AS hv
          FROM documents),
        sk AS (
          SELECT source, hv FROM (
            SELECT source, hv,
              row_number() OVER (PARTITION BY source ORDER BY hv) AS rn
            FROM hv)
          WHERE rn <= 64),
        srcs AS (SELECT DISTINCT source FROM sk),
        pairs AS (
          SELECT a.source AS s1, b.source AS s2
          FROM srcs a JOIN srcs b ON a.source < b.source),
        members AS (
          SELECT s1, s2, hv, MAX(in_a) AS in_a, MAX(in_b) AS in_b FROM (
            SELECT p.s1, p.s2, k.hv, 1 AS in_a, 0 AS in_b
            FROM pairs p JOIN sk k ON p.s1 = k.source
            UNION ALL
            SELECT p.s1, p.s2, k.hv, 0 AS in_a, 1 AS in_b
            FROM pairs p JOIN sk k ON p.s2 = k.source)
          GROUP BY s1, s2, hv),
        unioned AS (
          SELECT s1, s2, in_a, in_b,
            row_number() OVER (PARTITION BY s1, s2 ORDER BY hv) AS rn
          FROM members)
        SELECT s1, s2, CAST(COUNT(*) AS INT) AS k_used,
          CAST(SUM(in_a * in_b) AS INT) AS n_shared,
          CAST(SUM(in_a * in_b) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS jaccard_est
        FROM unioned WHERE rn <= 64
        GROUP BY s1, s2 ORDER BY s1, s2""")),

    // CUBE + GROUPING() — all 2^k grouping-set aggregates in ONE pass:
    // Spark plans cube as a single Expand + hash aggregate (each input
    // row fans out to its 4 grouping sets before the shuffle, partials
    // combine map-side), not 4 scans. gid disambiguates a real NULL key
    // from a subtotal row — the reason GROUPING() exists.
    Q("q32_cube",
      (s, d) => Tables.orders(s, d)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(centsSum(col("o_totalprice")).as("sum_price"),
          count(lit(1)).as("n_orders"),
          // grouping() is only resolvable inside the cube's own Aggregate
          (grouping(col("o_orderstatus")) * 2 + grouping(col("o_orderpriority")))
            .cast("int").as("gid"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("o_orderstatus"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("o_orderpriority"),
          col("gid"), col("sum_price"), col("n_orders"))
        .orderBy("gid", "o_orderstatus", "o_orderpriority"),
      Some("""SELECT COALESCE(o_orderstatus, 'ALL') AS o_orderstatus,
          COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,
          CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS INT) AS gid,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
          COUNT(*) AS n_orders
        FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        ORDER BY gid, o_orderstatus, o_orderpriority""")),

    // RANGE window frames — VALUE-based sliding windows (everything
    // within 7 days of the current event), the batch twin of streaming
    // sliding windows and the other frame mode next to q26's ROWS
    // frames. RANGE frames include peers by ORDER VALUE, so the result
    // is deterministic under timestamp ties with no tiebreak column.
    // Via the SQL surface: interval RANGE bounds are SQL-only (the
    // DataFrame rangeBetween API takes numeric offsets).
    Q("q40_range_frame",
      (s, d) => {
        Tables.registerAll(s, d)
        s.sql("""SELECT event_id, user_id, ts,
            CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sliding_sum,
            COUNT(*) OVER w AS n_in_window
          FROM events WHERE user_id % 50 = 0
          WINDOW w AS (PARTITION BY user_id ORDER BY ts
                       RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW)
          ORDER BY user_id, ts, event_id""")
      },
      Some("""SELECT event_id, user_id, ts,
          CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sliding_sum,
          COUNT(*) OVER w AS n_in_window
        FROM events WHERE user_id % 50 = 0
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW)
        ORDER BY user_id, ts, event_id""")),

    // FULL OUTER join — the last J-family shape (inner/left/anti/semi
    // are gated elsewhere): per-nation customer vs supplier counts with
    // deliberately asymmetric sides so left-only, overlapping, and
    // right-only key regions all exist. Plans as a shuffle (or
    // broadcast-capable since Spark 3.4) full-outer hash join keyed on
    // the join column; COALESCE resolves the side-specific nulls.
    Q("q39_full_outer",
      (s, d) => {
        val c = Tables.customer(s, d).where(col("c_nationkey") < 15)
          .groupBy(col("c_nationkey").as("nationkey"))
          .agg(count(lit(1)).as("n_cust"))
        val sup = Tables.supplier(s, d).where(col("s_nationkey") >= 10)
          .groupBy(col("s_nationkey").as("skey"))
          .agg(count(lit(1)).as("n_supp"))
        c.join(sup, col("nationkey") === col("skey"), "full_outer")
          .select(coalesce(col("nationkey"), col("skey")).as("nationkey"),
            coalesce(col("n_cust"), lit(0L)).as("n_cust"),
            coalesce(col("n_supp"), lit(0L)).as("n_supp"))
          .orderBy("nationkey")
      },
      Some("""WITH c AS (SELECT c_nationkey AS nationkey, COUNT(*) AS n_cust
            FROM customer WHERE c_nationkey < 15 GROUP BY 1),
          s AS (SELECT s_nationkey AS skey, COUNT(*) AS n_supp
            FROM supplier WHERE s_nationkey >= 10 GROUP BY 1)
        SELECT COALESCE(nationkey, skey) AS nationkey,
          COALESCE(n_cust, 0) AS n_cust, COALESCE(n_supp, 0) AS n_supp
        FROM c FULL OUTER JOIN s ON c.nationkey = s.skey
        ORDER BY nationkey""")),

    // Correlated SCALAR subqueries in the projection — the other
    // decorrelation path next to q36's lateral: Catalyst rewrites each
    // per-row subquery into an aggregate + left outer join (including
    // the COUNT-bug handling: a customer with no orders must count 0,
    // not NULL — the classic decorrelation trap). Per-row re-execution
    // is what cannot scale; one aggregate per subquery can.
    Q("q38_scalar_subquery",
      (s, d) => {
        Tables.registerAll(s, d)
        s.sql("""SELECT c.c_custkey,
            COALESCE((SELECT CAST(MAX(o_totalprice) AS DOUBLE) FROM orders o
                      WHERE o.o_custkey = c.c_custkey), 0.0) AS max_price,
            COALESCE((SELECT CAST(COUNT(*) AS BIGINT) FROM orders o
                      WHERE o.o_custkey = c.c_custkey), 0) AS n_orders
          FROM customer c WHERE c.c_custkey % 13 = 0
          ORDER BY c.c_custkey""")
      },
      Some("""SELECT c.c_custkey,
          COALESCE((SELECT CAST(MAX(o_totalprice) AS DOUBLE) FROM orders o
                    WHERE o.o_custkey = c.c_custkey), 0.0) AS max_price,
          COALESCE((SELECT CAST(COUNT(*) AS BIGINT) FROM orders o
                    WHERE o.o_custkey = c.c_custkey), 0) AS n_orders
        FROM customer c WHERE c.c_custkey % 13 = 0
        ORDER BY c.c_custkey""")),

    // Explicit GROUPING SETS — two INDEPENDENT groupings (by status, by
    // priority) in one pass; not expressible as a rollup/cube prefix
    // chain. Same single-Expand plan family as q25/q32: each row fans
    // out once per set before the shuffle, partials combine map-side.
    Q("q37_grouping_sets",
      (s, d) => Tables.orders(s, d)
        .groupingSets(
          Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority"))),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          centsSum(col("o_totalprice")).as("sum_price"),
          (grouping(col("o_orderstatus")) * 2 + grouping(col("o_orderpriority")))
            .cast("int").as("gid"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("o_orderstatus"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("o_orderpriority"),
          col("gid"), col("n_orders"), col("sum_price"))
        .orderBy("gid", "o_orderstatus", "o_orderpriority"),
      Some("""SELECT COALESCE(o_orderstatus, 'ALL') AS o_orderstatus,
          COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,
          CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS INT) AS gid,
          COUNT(*) AS n_orders,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        ORDER BY gid, o_orderstatus, o_orderpriority""")),

    // LATERAL correlated subquery — top-2 orders PER customer written
    // the way an analyst writes it. Exercises a genuinely distinct
    // planner path: Catalyst DECORRELATES the per-row subquery (limit
    // and all) into a partitioned window/join plan instead of executing
    // it per outer row — per-row re-execution is exactly what cannot
    // scale. Gated through the ad-hoc SQL surface (SURVEY §3.3), same
    // SQL on both engines.
    Q("q36_lateral_topk",
      (s, d) => {
        Tables.registerAll(s, d)
        s.sql("""SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
          FROM customer c, LATERAL (
            SELECT o_orderkey, o_totalprice FROM orders o
            WHERE o.o_custkey = c.c_custkey
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
          WHERE c.c_custkey % 11 = 0
          ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey""")
      },
      Some("""SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM customer c, LATERAL (
          SELECT o_orderkey, o_totalprice FROM orders o
          WHERE o.o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        WHERE c.c_custkey % 11 = 0
        ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey""")),

    // UNPIVOT (wide → long), the inverse of q31's PIVOT: Spark's native
    // unpivot plans as ONE Expand pass over the wide frame (each row
    // fans out once per measure) — no per-measure rescan, no union of N
    // subplans. Measures share a type by contract (all cast to double
    // via the exact-cents path first, so values hash-match). The oracle
    // expresses the same reshape as a UNION ALL, which is what unpivot
    // means relationally.
    Q("q35_unpivot",
      (s, d) => Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(centsSum(col("l_quantity")).as("sum_qty"),
          centsSum(col("l_extendedprice")).as("sum_price"),
          count(lit(1)).cast("double").as("n_rows"))
        .unpivot(
          Array(col("l_returnflag")),
          Array(col("sum_qty"), col("sum_price"), col("n_rows")),
          "measure", "value")
        .orderBy("l_returnflag", "measure"),
      Some("""WITH w AS (
          SELECT l_returnflag,
            CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
            CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
            CAST(COUNT(*) AS DOUBLE) AS n_rows
          FROM lineitem GROUP BY l_returnflag)
        SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS value FROM w
        UNION ALL SELECT l_returnflag, 'sum_price', sum_price FROM w
        UNION ALL SELECT l_returnflag, 'n_rows', n_rows FROM w
        ORDER BY l_returnflag, measure""")),

    // Semi-structured extraction — the JSON-properties column every
    // event stream carries (the reference serializes nonce/announcement
    // blobs as JSON, F15; `events.props` is the query-side twin).
    // `from_json` with a DECLARED schema parses once into a struct
    // (Catalyst prunes unreferenced fields from the parse), vs
    // get_json_object re-walking the document per extraction. Stays a
    // map-side projection feeding a normal aggregate at any scale.
    Q("q34_json_extract",
      (s, d) => Tables.events(s, d)
        .where(col("user_id") % 7 === 0)
        .select(col("event_type"),
          from_json(col("props"), "k BIGINT", Map.empty[String, String])
            .getField("k").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy("event_type"),
      Some("""SELECT event_type, COUNT(*) AS n,
          CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
          CAST(MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
          CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
        FROM events WHERE user_id % 7 = 0
        GROUP BY event_type ORDER BY event_type""")),

    // W-family completion — LAG/LEAD/NTILE over per-user event streams
    // (the "previous/next reading" and quartile-bucketing shapes).
    // One window spec ⇒ one sort within each user partition serves all
    // three functions; the partition key is the shuffle key, so the
    // plan is a single hash exchange + in-partition sort at any scale.
    // lag/lead copy values bit-for-bit (no arithmetic), ntile is
    // deterministic under the (ts, event_id) total order.
    Q("q33_lead_lag",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        Tables.events(s, d)
          .select(col("event_id"), col("user_id"), col("ts"), col("value"),
            lag(col("value"), 1).over(w).as("prev_value"),
            lead(col("value"), 1).over(w).as("next_value"),
            ntile(4).over(w).cast("int").as("quartile"))
          .orderBy("user_id", "ts", "event_id")
      },
      Some("""SELECT event_id, user_id, ts, value,
          LAG(value, 1) OVER w AS prev_value,
          LEAD(value, 1) OVER w AS next_value,
          CAST(NTILE(4) OVER w AS INT) AS quartile
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ORDER BY user_id, ts, event_id""")),

    // Exact distributed percentiles (nearest-rank), the exact twin of
    // x2's GK sketch: ONE hash exchange on the group key + ONE
    // in-partition sort serves every requested percentile (the window's
    // row_number and count share the sort). The value at rank
    // ceil(p·n) is deterministic under ORDER BY the value alone —
    // duplicate values at the boundary rank all carry the same value —
    // so no tiebreak column is needed for a stable gate. Interpolating
    // percentile_cont is deliberately NOT used: its float interpolation
    // (`lo + frac·(hi−lo)`) is evaluated in engine-specific operand
    // order, while nearest-rank returns a value PRESENT in the data,
    // bit-identical on both engines. The rank arithmetic stays exact:
    // 0.25/0.5/0.75 parse as DECIMAL literals in both engines, so
    // ceil(p·n) is exact decimal math, never float. Scale: with a
    // billion rows per group the in-partition sort is the cost —
    // that is the known price of EXACT percentiles (x2 is the sketch
    // path when ε-approximation is acceptable).
    Q("q41_percentile",
      (s, d) => {
        Tables.registerAll(s, d)
        s.sql(percentileSql)
      },
      Some(percentileSql)),

    // Z-order (Morton) interleave — the multi-dimensional data-layout
    // key behind min/max data skipping (Delta/Iceberg OPTIMIZE ZORDER;
    // the reference's date-partition pruning generalized to 2 keys).
    // Writing files clustered by zval keeps BOTH pk16 and sk16 locally
    // narrow in every file, so a predicate on EITHER column prunes
    // ~√F of F files via footer min/max instead of scanning all of
    // them (ZOrderSpec measures the span shrinkage on real range
    // partitions). The interleave itself is 32 codegen'd bit ops per
    // row — a pure map over the scan, no exchange; the gate aggregates
    // the full table into 256 z-buckets to pin every row's key on both
    // engines.
    Q("q42_zorder",
      (s, d) => {
        Tables.registerAll(s, d)
        s.sql(zorderSql)
      },
      Some(zorderSql)),

    // Time-series resampling with linear interpolation — the gap-fill
    // step between q13's forward fill (step function) and a model-ready
    // regular grid: project each user's event stream onto an hourly
    // grid, interpolating between the surrounding events. Same
    // union+one-window shape as AsOf/q13: grid points and events merge
    // into ONE stream, a single per-user sort serves BOTH directions
    // (last non-null before via the preceding frame, first non-null
    // after via the following frame) — never a per-grid-point range
    // join. Bit-exactness: anchor times are exact epoch-µs longs, the
    // interpolation is one double division plus a fixed-order
    // fused-free chain (`vp + (vn−vp)·ratio`), identical text on both
    // engines; an on-grid event hits ratio=0 and returns vp exactly.
    // Edges clamp to the available neighbor. Scale: the shuffle key is
    // user_id; grid density is a constant per key, so skew follows the
    // event skew and the q23 salting applies if a key is hot.
    Q("q43_resample",
      (s, d) => {
        val ev = Tables.events(s, d).where(col("user_id") % 100 === 0)
          .select(col("user_id"), col("ts"), col("value"))
        val grid = ev.groupBy("user_id")
          .agg(date_trunc("hour", min(col("ts"))).as("t0"),
            date_trunc("hour", max(col("ts"))).as("t1"))
          .select(col("user_id"),
            explode(expr("sequence(t0, t1, interval 1 hour)")).as("ts"))
        val ptT = "struct<t:bigint,v:double>"
        val evm = ev.select(col("user_id"), col("ts"), lit(0).as("is_grid"),
          struct(unix_micros(col("ts")).as("t"), col("value").as("v")).as("pt"))
        val gm = grid.select(col("user_id"), col("ts"), lit(1).as("is_grid"),
          lit(null).cast(ptT).as("pt"))
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("is_grid"))
        val wPrev = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wNext = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        evm.unionAll(gm)
          .select(col("user_id"), col("ts"), col("is_grid"),
            last(col("pt"), ignoreNulls = true).over(wPrev).as("p"),
            first(col("pt"), ignoreNulls = true).over(wNext).as("n"))
          .where(col("is_grid") === 1)
          .select(col("user_id"), col("ts"),
            when(col("p").isNull, col("n.v"))
              .when(col("n").isNull, col("p.v"))
              .when(col("n.t") === col("p.t"), col("p.v"))
              .otherwise(col("p.v") + (col("n.v") - col("p.v")) *
                ((unix_micros(col("ts")) - col("p.t")).cast("double") /
                  (col("n.t") - col("p.t")).cast("double")))
              .as("v_interp"),
            col("p").isNotNull.as("has_prev"), col("n").isNotNull.as("has_next"))
          .orderBy("user_id", "ts")
      },
      Some("""WITH ev AS (
          SELECT user_id, ts, value FROM events WHERE user_id % 100 = 0),
        b AS (
          SELECT user_id, date_trunc('hour', min(ts)) AS t0,
            date_trunc('hour', max(ts)) AS t1
          FROM ev GROUP BY user_id),
        grid AS (
          SELECT user_id, unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS ts
          FROM b),
        u AS (
          SELECT user_id, ts, 0 AS is_grid,
            {'t': epoch_us(ts), 'v': value} AS pt FROM ev
          UNION ALL
          SELECT user_id, ts, 1, CAST(NULL AS STRUCT(t BIGINT, v DOUBLE)) FROM grid),
        wv AS (
          SELECT user_id, ts, is_grid,
            last_value(pt IGNORE NULLS) OVER (PARTITION BY user_id
              ORDER BY ts, is_grid
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p,
            first_value(pt IGNORE NULLS) OVER (PARTITION BY user_id
              ORDER BY ts, is_grid
              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS n
          FROM u)
        SELECT user_id, ts,
          CASE WHEN p IS NULL THEN n.v
               WHEN n IS NULL THEN p.v
               WHEN n.t = p.t THEN p.v
               ELSE p.v + (n.v - p.v) *
                 (CAST(epoch_us(ts) - p.t AS DOUBLE) / CAST(n.t - p.t AS DOUBLE))
          END AS v_interp,
          p IS NOT NULL AS has_prev, n IS NOT NULL AS has_next
        FROM wv WHERE is_grid = 1 ORDER BY user_id, ts""")),

    // Deequ-style data-quality audit — the validation gate a pipeline
    // runs before publishing a snapshot (the reference validates uploads
    // file-by-file, upload.rs; this is the table-level generalization).
    // One check SUITE, three honest passes, each the minimal plan for
    // its check class: (1) completeness + range checks fold into a
    // SINGLE conditional-aggregate scan (adding a check adds a column,
    // not a pass); (2) key uniqueness is the two-phase partial-distinct
    // aggregate (q29's shape); (3) referential integrity is ONE
    // left-anti join against the parent keys. Metrics are exact-count
    // divisions — bit-stable. Output is long-format (check, value,
    // pass) so a scheduler can diff suites across snapshots.
    Q("q44_quality_audit",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val scan = li.agg(
          count(lit(1)).as("n"),
          sum(when(col("l_returnflag").isNull, 1L).otherwise(0L)).as("null_rf"),
          sum(when(col("l_quantity").isNull, 1L).otherwise(0L)).as("null_qty"),
          sum(when(col("l_quantity") < 1 || col("l_quantity") > 50, 1L)
            .otherwise(0L)).as("range_qty"))
        val checksScan = scan.select(explode(array(
          struct(lit("completeness_l_returnflag").as("check"),
            ((col("n") - col("null_rf")).cast("double") / col("n").cast("double")).as("value"),
            (col("null_rf") === 0).as("pass")),
          struct(lit("completeness_l_quantity").as("check"),
            ((col("n") - col("null_qty")).cast("double") / col("n").cast("double")).as("value"),
            (col("null_qty") === 0).as("pass")),
          struct(lit("range_l_quantity_1_50").as("check"),
            col("range_qty").cast("double").as("value"),
            (col("range_qty") === 0).as("pass")),
          struct(lit("row_count_positive").as("check"),
            col("n").cast("double").as("value"), (col("n") > 0).as("pass"))))
          .as("c")).select("c.*")
        val uniq = li.groupBy("l_orderkey", "l_linenumber")
          .agg(count(lit(1)).as("cnt"))
          .agg(count(lit(1)).as("n_keys"),
            sum(when(col("cnt") > 1, 1L).otherwise(0L)).as("dup_keys"))
          .select(lit("uniqueness_orderkey_linenumber").as("check"),
            col("dup_keys").cast("double").as("value"),
            (col("dup_keys") === 0).as("pass"))
        val o = Tables.orders(s, d)
        val fk = li.join(o, li("l_orderkey") === o("o_orderkey"), "left_anti")
          .agg(count(lit(1)).as("orphans"))
          .select(lit("fk_lineitem_orders").as("check"),
            col("orphans").cast("double").as("value"),
            (col("orphans") === 0).as("pass"))
        checksScan.unionAll(uniq).unionAll(fk).orderBy("check")
      },
      Some("""WITH scan AS (
          SELECT COUNT(*) AS n,
            SUM(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS null_rf,
            SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS null_qty,
            SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS range_qty
          FROM lineitem),
        uniq AS (
          SELECT COUNT(*) AS n_keys,
            SUM(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS dup_keys
          FROM (SELECT l_orderkey, l_linenumber, COUNT(*) AS cnt
                FROM lineitem GROUP BY l_orderkey, l_linenumber)),
        fk AS (
          SELECT COUNT(*) AS orphans FROM lineitem
          WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders))
        SELECT * FROM (
          SELECT 'completeness_l_returnflag' AS "check",
            CAST(n - null_rf AS DOUBLE) / CAST(n AS DOUBLE) AS value,
            null_rf = 0 AS pass FROM scan
          UNION ALL SELECT 'completeness_l_quantity',
            CAST(n - null_qty AS DOUBLE) / CAST(n AS DOUBLE), null_qty = 0 FROM scan
          UNION ALL SELECT 'range_l_quantity_1_50',
            CAST(range_qty AS DOUBLE), range_qty = 0 FROM scan
          UNION ALL SELECT 'row_count_positive',
            CAST(n AS DOUBLE), n > 0 FROM scan
          UNION ALL SELECT 'uniqueness_orderkey_linenumber',
            CAST(dup_keys AS DOUBLE), dup_keys = 0 FROM uniq
          UNION ALL SELECT 'fk_lineitem_orders',
            CAST(orphans AS DOUBLE), orphans = 0 FROM fk)
        ORDER BY "check""""))
  )

  /** Shared engine-identical SQL for q41 (see the Q for semantics). */
  private lazy val percentileSql =
    """WITH ranked AS (
        SELECT l_returnflag, l_quantity,
          ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS rn,
          COUNT(*) OVER (PARTITION BY l_returnflag) AS n
        FROM lineitem)
      SELECT l_returnflag, CAST(MAX(n) AS BIGINT) AS n_rows,
        MAX(CASE WHEN rn = CAST(ceil(0.25 * n) AS BIGINT) THEN l_quantity END) AS p25,
        MAX(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT) THEN l_quantity END) AS p50,
        MAX(CASE WHEN rn = CAST(ceil(0.75 * n) AS BIGINT) THEN l_quantity END) AS p75,
        MAX(CASE WHEN rn = n THEN l_quantity END) AS p100
      FROM ranked GROUP BY l_returnflag ORDER BY l_returnflag"""

  /** Shared engine-identical SQL for q42: 16+16-bit Morton interleave of
    * (l_partkey, l_suppkey), generated as explicit shift/mask terms —
    * disjoint bits, so `+` composes them on both engines with no
    * precedence traps. */
  private lazy val zorderSql = {
    val terms = (0 until 16).map(i =>
      s"(((pk16 >> $i) & 1) << ${2 * i}) + (((sk16 >> $i) & 1) << ${2 * i + 1})")
      .mkString(" + ")
    s"""WITH keyed AS (
        SELECT l_orderkey, (l_partkey % 65536) AS pk16, (l_suppkey % 65536) AS sk16
        FROM lineitem),
      z AS (SELECT l_orderkey, pk16, sk16, CAST($terms AS BIGINT) AS zval FROM keyed)
      SELECT (zval >> 12) AS zbucket, COUNT(*) AS n,
        CAST(MIN(zval) AS BIGINT) AS min_z, CAST(MAX(zval) AS BIGINT) AS max_z,
        CAST(MIN(pk16) AS BIGINT) AS min_pk, CAST(MAX(pk16) AS BIGINT) AS max_pk,
        CAST(SUM(l_orderkey) AS BIGINT) AS id_sig
      FROM z GROUP BY 1 ORDER BY zbucket"""
  }
}
