package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated synthetic tables (TESTDATA.md).
  *
  * All tables are plain single-file Parquet. `events.ts` has been
  * observed in TWO generator encodings across rounds — TIMESTAMP(NANOS)
  * (which Spark's schema inference rejects) and TIMESTAMP(MICROS) (which
  * it reads natively) — so [[Tables.events]] dispatches on the parquet
  * footer's actual type instead of assuming either one. Both branches
  * yield the same µs-precision TimestampType values DuckDB produces, so
  * the oracle and Spark agree bit-for-bit.
  */
object Tables {

  // Memoized per (session, path): re-reading a table in every query would
  // re-list files and re-parse parquet footers each time — a real
  // per-query tax both locally and against an object store at scale. The
  // cached DataFrame carries its resolved FileIndex, exactly what a table
  // catalog provides.
  //
  // Eviction is listener-based, not weak-keyed: a cached DataFrame
  // strongly references its SparkSession, and a WeakHashMap entry whose
  // value reaches the key is never reclaimed (the documented WeakHashMap
  // caveat) — so instead every session's entries are dropped when its
  // SparkContext ends, which is the moment the plans become useless.
  private val relationCache =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, scala.collection.concurrent.TrieMap[String, DataFrame]]()

  private def perSession(spark: SparkSession): scala.collection.concurrent.TrieMap[String, DataFrame] =
    relationCache.computeIfAbsent(spark, s => {
      val sc = s.sparkContext // capture the context, not the session
      sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onApplicationEnd(
            end: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit =
          relationCache.keySet().removeIf(_.sparkContext eq sc)
      })
      scala.collection.concurrent.TrieMap.empty[String, DataFrame]
    })

  /** Plain parquet table at `dir/name.parquet`. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    perSession(spark).getOrElseUpdate(path, spark.read.parquet(path))
  }

  /** Parallelism floor for KERNEL-HEAVY consumers: a parquet row group is
    * the minimum unit one task can read, so a table written as few large
    * row groups (the driver's testdata is ONE group per table) pins the
    * whole scan stage — including per-row kernel work — to that many
    * tasks no matter the cluster. Where the kernels (MinHash/SimHash md5,
    * shingle explode, cosine) dominate the scan by orders of magnitude,
    * re-spreading once is worth an exchange: measured 2-4× on the dedup
    * family at sf0.1. Applied at the CONSUMER (the kernel call sites in
    * TextOps/VectorOps/CorpusEtl), NOT behind the shared relation —
    * round 3 measured a blanket floor taxing every light query on the
    * same tables (t1/t2/t3/v2/v3 +0.1-0.6 s each) for no benefit. At
    * target scale file counts exceed cores and the floor is a no-op
    * either way. */
  def spread(spark: SparkSession, df: DataFrame): DataFrame = {
    val target = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 <= target) df.repartition(target) else df
  }

  /** Memoized [[spread]] of a named table: `df.rdd.getNumPartitions`
    * builds an RDD lineage on every call, so the spread-or-not decision
    * (stable per session × path) is cached next to the plain relation
    * under a `#spread` key. */
  private def tableSpread(s: SparkSession, d: String, name: String): DataFrame =
    perSession(s).getOrElseUpdate(s"$d/$name.parquet#spread",
      spread(s, table(s, d, name)))

  /** [[documents]] with the kernel-consumer parallelism floor. */
  def documentsSpread(s: SparkSession, d: String): DataFrame =
    tableSpread(s, d, "documents")

  /** [[embeddings]] with the kernel-consumer parallelism floor. */
  def embeddingsSpread(s: SparkSession, d: String): DataFrame =
    tableSpread(s, d, "embeddings")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Parquet physical schema of `events.parquet`, with `ts` read as its
    * raw INT64 nanosecond value. Supplying this explicitly bypasses
    * schema inference — the only step that rejects TIMESTAMP(NANOS)
    * without the `nanosAsLong` legacy flag — so `events` loads from any
    * vanilla `SparkSession`. */
  private val eventsRawSchema = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", LongType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType)))
  }

  /** `events` with `ts` normalized to TimestampType (µs, UTC), driven by
    * the parquet footer's ACTUAL encoding instead of a hard-coded
    * assumption (the round-5 lesson: the generator regenerated the data
    * as TIMESTAMP(MICROS) and an assumed-nanos `div 1000` collapsed every
    * timestamp onto 1970-01-20). Three footer shapes are handled:
    *
    *  - `ts` infers as TimestampType — TIMESTAMP(MICROS/MILLIS) physical
    *    data. Used as-is: Spark reads it natively and plain predicate
    *    pushdown already works, no rewrite needed.
    *  - schema inference REJECTS the footer — TIMESTAMP(NANOS), which a
    *    vanilla session refuses without the `nanosAsLong` legacy flag.
    *    Read through [[eventsRawSchema]] (raw INT64) and floor-divide:
    *    `ts div 1000` is integer division on the raw nanosecond long
    *    (float division would lose precision above 2^53 ns); the µs
    *    floor matches DuckDB's own ns→µs truncation bit-for-bit.
    *  - `ts` infers as LongType — an unannotated raw-nanos INT64 column
    *    (the [[ScaleBuild]] replica format). Same `div 1000` path.
    *
    * Self-contained either way: no session flag needed, ad-hoc sessions
    * work unmodified. [[graft.plans.ImpliedScanRanges]] keeps time-range
    * pushdown working on the nanos branches; the micros branch needs no
    * help.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    perSession(spark).getOrElseUpdate(path, {
      import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
      // Inference is eager (the footer is read at load), so NANOS data
      // throws here and falls through to the raw-schema branch.
      val native = scala.util.Try(spark.read.parquet(path)).toOption.flatMap {
        df =>
          df.schema.fields.find(_.name == "ts").map(_.dataType) match {
            case Some(TimestampType) => Some(df)
            // isAdjustedToUTC=false footers (pyarrow's default) infer as
            // NTZ; the generator's wall-clock values ARE UTC instants, so
            // convert with an explicitly-UTC cast — NOT the session-zone
            // cast `.cast(TimestampType)` would plan — making the loaded
            // instants correct even from an ad-hoc session configured
            // with a non-UTC spark.sql.session.timeZone. µs values pass
            // through untouched (UTC→UTC is the identity on the raw
            // micros), matching DuckDB's naive read bit-for-bit.
            case Some(TimestampNTZType) =>
              import org.apache.spark.sql.graft.ColumnBridge
              Some(df.withColumn("ts", ColumnBridge.column(
                org.apache.spark.sql.catalyst.expressions.Cast(
                  ColumnBridge.expression(col("ts")), TimestampType,
                  Some("UTC")))))
            case _ => None // raw INT64 nanos (ScaleBuild replicas) et al.
          }
      }
      native.getOrElse {
        spark.read.schema(eventsRawSchema).parquet(path)
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      }
    })
  }

  /** Streaming twin of [[events]]: a file-source micro-batch stream over
    * the same path with the same footer-dispatched `ts` normalization,
    * so watermarked consumers (w13b, DocStream-style jobs) see exactly
    * the µs-precision UTC instants the batch reader produces. The batch
    * probe below reads only the footer (and is how the dispatch learns
    * the physical encoding — a stream source needs an explicit schema).
    * Not memoized: a streaming DataFrame is a fresh query per start. */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    val path = s"$dir/events.parquet"
    val glob = s"$dir/[e]vents.parquet"
    val footer = scala.util.Try(spark.read.parquet(path).schema).toOption
    footer.flatMap(sch => sch.fields.find(_.name == "ts").map(f => (sch, f.dataType))) match {
      // The source path is a single FILE. FileStreamSource force-sets
      // basePath to the source path itself for NON-glob paths (and then
      // rejects it: "Option 'basePath' must be a directory"), so the
      // stream reads a glob form of the same name, which keeps the
      // explicit directory basePath below in effect.
      case Some((sch, TimestampType)) =>
        spark.readStream.schema(sch).option("basePath", dir).parquet(glob)
      case Some((sch, TimestampNTZType)) =>
        import org.apache.spark.sql.graft.ColumnBridge
        spark.readStream.schema(sch).option("basePath", dir).parquet(glob)
          .withColumn("ts", ColumnBridge.column(
            org.apache.spark.sql.catalyst.expressions.Cast(
              ColumnBridge.expression(col("ts")), TimestampType, Some("UTC"))))
      case _ =>
        spark.readStream.schema(eventsRawSchema)
          .option("basePath", dir).parquet(glob)
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    }
  }

  /** Register every table as a temp view (ad-hoc SQL surface; SURVEY §3.3). */
  def registerAll(spark: SparkSession, dir: String): Unit = {
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings")
      .foreach(n => table(spark, dir, n).createOrReplaceTempView(n))
    events(spark, dir).createOrReplaceTempView("events")
  }
}
