package graft.store

import java.nio.file.Files
import java.sql.Timestamp
import java.time.Instant

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.store.WeatherStore.Kinds

class WeatherStoreSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.from(Instant.parse(s))

  private def newStore() = {
    val dir = Files.createTempDirectory("graft-store").toString
    (new WeatherStore(spark, dir), dir)
  }

  test("landFile validates names and lands bytes where the next scan reads them") {
    val (store, _) = newStore()
    // traversal / shape / extension rejections (upload.rs path_is_valid)
    for (bad <- Seq("../evil.parquet", "/abs.parquet", "a/b.parquet",
        "nope.csv", ".parquet", ""))
      intercept[IllegalArgumentException](
        store.landFile(bad, Array[Byte](1), Kinds.Observations, ts("2024-08-12T01:00:00Z")))

    // a genuine parquet payload (snapshot schema incl. snapshot_ts) lands
    // under kind/date and is served by the pruned read
    val tmp = Files.createTempDirectory("graft-upload").toString
    Seq(("KLND", 42L)).toDF("station_id", "value")
      .withColumn("begin_time", org.apache.spark.sql.functions.lit(ts("2024-08-12T06:00:00Z")))
      .withColumn("snapshot_ts", org.apache.spark.sql.functions.lit(ts("2024-08-12T01:00:00Z")))
      .coalesce(1).write.parquet(s"$tmp/one")
    val part = new java.io.File(s"$tmp/one").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    store.landFile("uploaded.parquet", Files.readAllBytes(part.toPath),
      Kinds.Observations, ts("2024-08-12T01:00:00Z"))

    val got = store.read(Kinds.Observations,
      ts("2024-08-12T00:00:00Z"), ts("2024-08-12T23:00:00Z")).get
    assert(got.where(org.apache.spark.sql.functions.col("station_id") === "KLND").count() == 1)
  }

  test("read of an empty store is None (early-exit guard)") {
    val (store, _) = newStore()
    assert(store.read(Kinds.Forecasts, ts("2024-08-12T00:00:00Z"), ts("2024-08-13T00:00:00Z")).isEmpty)
  }

  test("date pruning keeps in-range snapshots, forecasts pad start −1 day") {
    val (store, _) = newStore()
    def snap(day: String, v: Long) =
      Seq(("KXYZ", v)).toDF("station_id", "value")
        .withColumn("begin_time", org.apache.spark.sql.functions.lit(ts(s"${day}T06:00:00Z")))
    store.write(snap("2024-08-10", 1), Kinds.Forecasts, ts("2024-08-10T01:00:00Z"))
    store.write(snap("2024-08-11", 2), Kinds.Forecasts, ts("2024-08-11T01:00:00Z"))
    store.write(snap("2024-08-12", 3), Kinds.Forecasts, ts("2024-08-12T01:00:00Z"))
    store.write(snap("2024-08-12", 4), Kinds.Observations, ts("2024-08-12T02:00:00Z"))

    // start=08-12: forecast pad pulls in the 08-11 snapshot but not 08-10
    val f = store.read(Kinds.Forecasts, ts("2024-08-12T00:00:00Z"), ts("2024-08-12T23:00:00Z")).get
    assert(f.select("value").collect().map(_.getLong(0)).sorted.toSeq == Seq(2L, 3L))

    // observations: no pad
    val o = store.read(Kinds.Observations, ts("2024-08-12T00:00:00Z"), ts("2024-08-12T23:00:00Z")).get
    assert(o.select("value").collect().map(_.getLong(0)).toSeq == Seq(4L))
  }

  test("partition pruning shows in the physical plan") {
    val (store, _) = newStore()
    store.write(Seq(("A", 1L)).toDF("station_id", "value"), Kinds.Forecasts, ts("2024-08-10T01:00:00Z"))
    store.write(Seq(("B", 2L)).toDF("station_id", "value"), Kinds.Forecasts, ts("2024-08-12T01:00:00Z"))
    val df = store.read(Kinds.Forecasts, ts("2024-08-12T00:00:00Z"), ts("2024-08-12T23:00:00Z")).get
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"))
    // only one date partition survives pruning
    assert(df.select("value").collect().map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("schema drift across snapshots is union-merged (union_by_name analog)") {
    val (store, _) = newStore()
    store.write(Seq(("A", 1L)).toDF("station_id", "value"), Kinds.Observations, ts("2024-08-12T01:00:00Z"))
    store.write(Seq(("B", 2L, 9.9)).toDF("station_id", "value", "extra"), Kinds.Observations, ts("2024-08-12T02:00:00Z"))
    val df = store.read(Kinds.Observations, ts("2024-08-12T00:00:00Z"), ts("2024-08-12T23:00:00Z")).get
    assert(df.columns.contains("extra"))
    val rows = df.select("station_id", "extra").collect()
      .map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(rows("A").isEmpty && rows("B").contains(9.9))
  }

  test("snapshot_ts upper bound excludes snapshots written after `end`") {
    val (store, _) = newStore()
    store.write(Seq(("A", 1L)).toDF("station_id", "value"), Kinds.Observations, ts("2024-08-12T01:00:00Z"))
    store.write(Seq(("B", 2L)).toDF("station_id", "value"), Kinds.Observations, ts("2024-08-12T22:00:00Z"))
    val df = store.read(Kinds.Observations, ts("2024-08-12T00:00:00Z"), ts("2024-08-12T12:00:00Z")).get
    assert(df.select("value").collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("compactPartition merges a day's snapshot files; every read is unchanged") {
    val (store, dir) = newStore()
    for (h <- 1 to 5)
      store.write(Seq((s"S$h", h.toLong)).toDF("station_id", "value"),
        Kinds.Observations, ts(f"2024-08-12T$h%02d:00:00Z"))
    def snapshot() = store
      .read(Kinds.Observations, ts("2024-08-12T00:00:00Z"), ts("2024-08-12T23:00:00Z")).get
      .select("station_id", "value", "snapshot_ts", "date", "kind")
      .collect().map(_.toSeq).toSet
    val before = snapshot()

    val (nOld, nNew) = store.compactPartition(Kinds.Observations,
      java.time.LocalDate.parse("2024-08-12"))
    assert(nOld == 5 && nNew == 1)
    val files = new java.io.File(s"$dir/kind=observations/date=2024-08-12")
      .listFiles().filter(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
    assert(files.length == 1)

    // rows (snapshot_ts included) and the pruned time-window read survive
    assert(snapshot() == before)
    val pruned = store
      .read(Kinds.Observations, ts("2024-08-12T00:00:00Z"), ts("2024-08-12T03:00:00Z")).get
      .select("value").collect().map(_.getLong(0)).toSet
    assert(pruned == Set(1L, 2L, 3L))

    // idempotent: already at target
    assert(store.compactPartition(Kinds.Observations,
      java.time.LocalDate.parse("2024-08-12")) == (1, 1))
    // missing partition is a no-op
    assert(store.compactPartition(Kinds.Observations,
      java.time.LocalDate.parse("1999-01-01")) == (0, 0))
  }

  test("zOrderPartition: rows unchanged, files clustered for two-column skipping") {
    import org.apache.spark.sql.functions.col
    val (store, dir) = newStore()
    val date = java.time.LocalDate.parse("2024-08-12")
    // 24 hourly snapshots × 8 stations — the shape a closed ingest day has
    for (h <- 0 until 24)
      store.write((0 until 8).map(s => (f"S$s%02d", h.toLong * 8 + s))
        .toDF("station_id", "value"),
        Kinds.Observations, ts(f"2024-08-12T$h%02d:00:00Z"))
    def all() = store.readAll(Kinds.Observations).get
      .select("station_id", "value", "snapshot_ts")
      .collect().map(_.toSeq).toSet
    val before = all()

    assert(store.zOrderPartition(Kinds.Observations, date, targetFiles = 4) == (24, 4))
    assert(all() == before)

    // Each rewritten file covers a narrow station range (z clustering →
    // narrow per-file min/max → footer skipping on station predicates):
    // no file may span the whole universe.
    val files = new java.io.File(s"$dir/kind=observations/date=$date")
      .listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.length == 4)
    for (f <- files) {
      val ids = spark.read.parquet(f.getAbsolutePath)
        .select("station_id").distinct().collect().map(_.getString(0))
      assert(ids.length < 8, s"${f.getName} spans the whole station universe")
    }
    // idempotent at target; maintain() covers both kinds without error
    assert(store.zOrderPartition(Kinds.Observations, date, targetFiles = 4) == (4, 4))
    assert(store.maintain(date, targetFiles = 4)(Kinds.Observations) == (4, 4))
  }

  test("a one-snapshot day still gets clustered exactly once (filename marker, not file count)") {
    val (store, dir) = newStore()
    val date = java.time.LocalDate.parse("2024-08-12")
    // ONE snapshot lands for the whole day: at or under every
    // targetFiles, but raw — never z-ordered, no per-file min/max
    // locality. The filename marker (not the file count) must schedule
    // it for its single clustering pass.
    store.write((0 until 8).map(s => (f"S$s%02d", s.toLong))
      .toDF("station_id", "value"),
      Kinds.Observations, ts("2024-08-12T06:00:00Z"))
    assert(store.datesNeedingMaintenance(
        java.time.LocalDate.parse("2024-08-13")).contains(date),
      "raw one-snapshot day missing from the maintenance backlog")
    def before = store.readAll(Kinds.Observations).get
      .select("station_id", "value", "snapshot_ts")
      .collect().map(_.toSeq).toSet
    val want = before
    assert(store.zOrderPartition(Kinds.Observations, date) == (1, 1))
    val files = new java.io.File(s"$dir/kind=observations/date=$date")
      .listFiles().filter(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
    assert(files.length == 1 && files.head.getName.startsWith("compact-"),
      s"day not clustered: ${files.map(_.getName).toSeq}")
    assert(before == want, "rows changed across the clustering rewrite")
    // ...and exactly once: the marker retires it from the backlog and
    // a re-run is a no-op (no perpetual rewrite of every small day)
    assert(!store.datesNeedingMaintenance(
      java.time.LocalDate.parse("2024-08-13")).contains(date))
    val m = files.head.lastModified()
    assert(store.zOrderPartition(Kinds.Observations, date) == (1, 1))
    val files2 = new java.io.File(s"$dir/kind=observations/date=$date")
      .listFiles().filter(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
    assert(files2.head.getName == files.head.getName &&
      files2.head.lastModified() == m, "already-clustered day was rewritten")
  }

  test("zOrderPartition carries a 100k-station universe (rank join, not a plan literal)") {
    import org.apache.spark.sql.functions.{col, sum => fsum}
    val (store, dir) = newStore()
    val date = java.time.LocalDate.parse("2024-08-12")
    // 8 snapshots × 12,500 stations, ids INTERLEAVED across snapshots so
    // rank does not correlate with file order — the naive layout spans
    // the whole universe per file and only real z-clustering narrows it.
    // A universe this size is exactly where the old collected typedLit
    // rank map was a plan hazard (100k-entry literal in the plan tree);
    // the broadcast rank-dimension join must handle it routinely.
    for (h <- 0 until 8)
      store.write(
        (0 until 100000).filter(_ % 8 == h).map(i => (f"S$i%06d", i.toLong))
          .toDF("station_id", "value"),
        Kinds.Observations, ts(f"2024-08-12T$h%02d:00:00Z"))
    val before = store.readAll(Kinds.Observations).get
      .agg(fsum("value"), org.apache.spark.sql.functions.count("*")).head()
    assert(store.zOrderPartition(Kinds.Observations, date, targetFiles = 4) == (8, 4))
    val after = store.readAll(Kinds.Observations).get
      .agg(fsum("value"), org.apache.spark.sql.functions.count("*")).head()
    assert(after == before)
    // every rewritten file concentrates on a narrow rank band (rank =
    // the id's numeric suffix; zero-padded so lexicographic = numeric).
    // Measured as the p5–p95 spread, not min/max: repartitionByRange
    // boundaries come from sampling, and a boundary landing a hair
    // inside the next z-region spills a few SCATTERED ranks into the
    // file — which wrecks min/max but not the bulk distribution. A
    // 4-way z split halves the rank dimension (~50k bulk spread); the
    // naive interleaved-by-snapshot layout puts every 8th rank in every
    // file (~90k spread at any percentile).
    val files = new java.io.File(s"$dir/kind=observations/date=$date")
      .listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.length == 4)
    for (f <- files) {
      val qs = spark.read.parquet(f.getAbsolutePath)
        .selectExpr("cast(substring(station_id, 2) as int) as rk")
        .selectExpr("percentile_approx(rk, array(0.05, 0.95), 10000) as q")
        .head().getSeq[Int](0)
      val spread = qs(1) - qs(0)
      assert(spread < 70000,
        s"${f.getName}: p5-p95 rank spread $spread of the 100k universe")
    }
  }

  test("zOrderPartition tolerates null station ids (coalesced to rank 0)") {
    val (store, _) = newStore()
    val date = java.time.LocalDate.parse("2024-08-12")
    for (h <- 0 until 3)
      store.write(Seq((Option.when(h != 1)(s"S$h"), h.toLong))
        .toDF("station_id", "value"),
        Kinds.Observations, ts(f"2024-08-12T$h%02d:00:00Z"))
    def all() = store.readAll(Kinds.Observations).get
      .select("station_id", "value").collect()
      .map(r => (Option(r.getString(0)), r.getLong(1))).toSet
    val before = all()
    assert(before.contains((None, 1L)))
    assert(store.zOrderPartition(Kinds.Observations, date) == (3, 1))
    assert(all() == before)
  }
}
