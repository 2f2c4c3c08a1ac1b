package graft

/** Benchmark main (driver contract): runs every registered query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Measurement notes:
  *  - results go to the `noop` sink — forces full evaluation of every
  *    column (a bare `count()` would let Catalyst prune the projections
  *    being measured) without paying write I/O;
  *  - per-query time is the SECOND of two runs at the measured SF —
  *    steady-state throughput, the regime that matters at 100 TB where
  *    per-plan JIT cost amortizes to nothing. The first run warms
  *    whole-stage codegen for THIS plan at THIS scale (AQE re-plans from
  *    runtime stats, so a small-SF warmup compiles the wrong plan — we
  *    measured r2's all-queries-at-sf0.001 warmup failing exactly that
  *    way, plus 52 queries overflow the 100-entry codegen class cache)
  *    and the OS page cache. The DuckDB baseline is timed warm the same
  *    way, so this is the apples-to-apples comparison;
  *  - `clearCache()` before EVERY run (warm-in and measured): queries
  *    that internally `.cache()` intermediates rebuild them inside the
  *    measured run — codegen and page cache are warm, but all scan/
  *    shuffle/aggregate work is re-done, so the number is real work, not
  *    a cache readback.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.local(cpus, "graft-bench")

    def runOnce(name: String): Double = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}"); return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    /** Warm-in run (compile codegen for this plan/scale, touch inputs),
      * then the measured steady-state value: the MIN of up to five
      * post-warm runs, stopping early once two runs agree within 15% —
      * so a stable query pays two runs, and only a query whose spread
      * stays wide keeps sampling (round-5 evidence: one d13 measurement
      * saw 8.05/9.82/6.29 — an interference window outlasting three
      * runs; two more samples are cheap insurance against exactly that).
      *
      * Why min-of-N: this box is a shared microVM and round-4's sweeps
      * recorded random 2-8× per-query inflation that a full diagnostic
      * pass (GC logs: <1 s of pause inside a 47 s stall; code cache:
      * never full, compilation never disabled; zero task retries) traced
      * to UNIFORM slowdown — job time and driver gaps inflating together,
      * the signature of external CPU interference, not engine state.
      * Interference strictly adds time, so the minimum over a few runs
      * estimates the interference-free steady state; two-agreeing-runs
      * is the cheap exit so a quiet machine pays only the old 2-run cost.
      *
      * The System.gc() between queries still matters at this query
      * count: the ContextCleaner only releases finished queries' shuffle
      * files and broadcast blocks after a driver GC. It runs before the
      * warm-in — outside any measured window. */
    def measure(name: String): Double = {
      System.gc()
      val w = runOnce(name)
      var runs = List(runOnce(name))
      // Agreement alone can exit after two runs that are both above
      // steady state when the JVM is still shallow-warm (measured: d13
      // 4.67/4.16 early-exit vs 3.1 s after more runs); queries slow
      // enough for JIT depth to matter (>1 s) must earn at least three.
      def minRuns = if (runs.min > 1.0) 3 else 2
      while (runs.length < 5 && runs.exists(_ < 0) == false &&
          (runs.length < minRuns || runs.max > runs.min * 1.15))
        runs = runOnce(name) :: runs
      val m = if (runs.exists(_ < 0)) -1.0 else runs.min
      val up = java.lang.management.ManagementFactory.getRuntimeMXBean.getUptime / 1e3
      System.err.println(f"[bench] $name%-24s warm=$w%8.3f meas=$m%8.3f " +
        f"runs=${runs.reverse.map(r => f"$r%.2f").mkString("/")}%s up=$up%8.1f")
      m
    }

    // executor/JVM spin-up so the first warm-in isn't also paying that
    spark.range(1000000L).selectExpr("sum(id)").collect()

    /** Host-calibration anchor (VERDICT r11 #2): rounds 9/10/11 each
      * hand-adjudicated the same ambient-interference fingerprint —
      * diffuse sub-second inflation across untouched queries. Automate
      * the triage: a fixed data-independent CPU probe (pure codegen'd
      * arithmetic over range(), 32 threads, warm + min-of-3 — the same
      * protocol as the queries), recorded in the artifact as
      * `host_probe_sec` / `host_factor`. (The engines' probes differ
      * in row count only because their per-row cost differs ~10×; each
      * carries its own pinned reference.) The reference constant is the
      * probe's min on the round-12 build host at a quiet moment; a
      * host_factor of e.g. 1.3 says THIS sweep ran on a ~30%-slower
      * host, so a ~30% diffuse drift is the machine, not the code.
      * duckdb_bench.py runs the SAME probe SQL with its own pinned
      * reference, so both artifacts carry their own anchor. */
    val ProbeRefSec = 0.50 // pinned 2026-08-15 (round 12), quiet host
    def hostProbe(): Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        spark.range(4000000000L).selectExpr("sum(id % 1000003)").collect()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm codegen
      Seq.fill(3)(once()).min
    }
    val probeStart = hostProbe()

    // optional args = run only these queries (the isolated fresh-JVM
    // measurement protocol SCALING.md's drift adjudications use); no
    // args = the driver's full sweep
    val names =
      if (args.nonEmpty) args.toSeq.sorted.map { n =>
        require(SparkEntry.queries.contains(n), s"unknown query: $n"); n
      }
      else SparkEntry.queries.keys.toSeq.sorted
    val results = names.map(n => n -> measure(n))
    // probe again after the sweep — interference varies over a sweep's
    // minutes; the factor is the mean of the two anchors
    val probeEnd = hostProbe()
    val hostFactor = (probeStart + probeEnd) / 2.0 / ProbeRefSec
    System.err.println(f"[bench] host_probe start=$probeStart%.3f " +
      f"end=$probeEnd%.3f factor=$hostFactor%.2f (ref=$ProbeRefSec)")
    // 3-decimal (millisecond) precision: full-double repr made the line
    // ~3.5 KB and the round harness records only a 2000-char output tail,
    // truncating the artifact mid-JSON (ADVICE r5). ms precision is below
    // run-to-run noise anyway.
    def r3(v: Double): String =
      if (v < 0) "-1" else BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val qs = results.map { case (k, v) => "\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val hf = f"$hostFactor%.3f"
    // Bench-pair drift guard (VERDICT r10 #1): every registered query
    // must have a row in the committed DuckDB baseline sweep, or the 2×
    // bar silently loses coverage as queries are added. Full sweeps
    // surface the gap in the artifact line; subset runs skip the check.
    val unpaired =
      if (args.nonEmpty) Seq.empty
      else try {
        val txt = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get("BENCH_DUCKDB.json")))
        SparkEntry.queries.keys.toSeq.sorted
          .filterNot(k => txt.contains("\"" + k + "\""))
      } catch { case _: Throwable => Seq.empty }
    if (unpaired.nonEmpty)
      System.err.println(s"[bench] WARNING: ${unpaired.size} queries have " +
        s"no BENCH_DUCKDB.json pair: ${unpaired.mkString(",")} — " +
        "re-run scripts/duckdb_bench.py and commit the refreshed sweep")
    // Output contract: exactly ONE JSON line on stdout — metric, value,
    // unit, queries, sf in that order (the driver's documented shape).
    // Diagnostic scalars (host anchor, normalized total, pair guard)
    // trail the queries map so the harness's 2000-char output tail —
    // which beheads the ~5 KB line from the left — still shows them;
    // total = value_norm × host_factor reconstructs the headline from
    // the tail alone. The full line is also persisted to
    // BENCH_FULL.json for the committed artifact (subset runs must NOT
    // clobber the full-sweep artifact). Until round 13 a second short
    // summary JSON line followed this one; it never parsed either
    // (BENCH_r13 parsed:null) and a two-line output violates the ONE
    // JSON line contract, so round 14 dropped it — the same scalars now
    // live at the tail-visible END of the canonical line.
    val line = s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$qs,"sf":"$sfDir","host_probe_start":${r3(probeStart)},"host_probe_end":${r3(probeEnd)},"host_factor":$hf,"value_norm":${r3(total / hostFactor)},"n_queries":${results.size},"unpaired_duckdb":${unpaired.size}}"""
    if (args.isEmpty)
      try java.nio.file.Files.writeString(
        java.nio.file.Paths.get("BENCH_FULL.json"), line + "\n")
      catch { case _: Throwable => () }
    println(line)
    spark.stop()
  }
}
