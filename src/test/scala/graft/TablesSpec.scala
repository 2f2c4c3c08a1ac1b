package graft

import org.scalatest.funsuite.AnyFunSuite

/** Regression lock for the `events.ts` encoding contract.
  *
  * The driver's generator has produced `events.parquet` in different
  * physical encodings across rounds — TIMESTAMP(NANOS) (rejected by
  * Spark's schema inference) through round 4, TIMESTAMP(MICROS) (read
  * natively) from round 5 — and a loader that assumes either one
  * silently corrupts every timestamp when the other shows up (round 5:
  * an assumed-nanos `div 1000` put all of 2024 on 1970-01-20 and redded
  * 12 oracle gates). [[Tables.events]] therefore dispatches on the
  * parquet footer. This spec writes THE SAME logical rows in all four
  * observed physical shapes — Spark-native TIMESTAMP_MICROS, pyarrow-style
  * NTZ micros, raw
  * unannotated INT64 nanos (the ScaleBuild replica format), and true
  * annotation-level TIMESTAMP(NANOS) via parquet-mr — and asserts the
  * loader yields identical 2024-range values from each, so a future
  * generator regen in any encoding cannot silently flip queries again.
  */
class TablesSpec extends AnyFunSuite {

  private def s = TestSpark.spark

  /** Logical fixture: (event_id, micros-since-epoch). Sub-µs remainders
    * are added on the nanos encodings to exercise the ns→µs floor. */
  private val rows: Seq[(Long, Long)] = {
    val base = java.time.Instant.parse("2024-03-01T12:34:56.789012Z")
      .getEpochSecond * 1000000L + 789012L
    (0L until 5L).map(i => (i, base + i * 86400L * 1000000L + i * 7L))
  }

  private lazy val fixtures: Map[String, String] = {
    val spark = s
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("tables-enc").toString

    // -- micros: Spark's default parquet timestamp output ---------------
    val microsDir = s"$root/micros"
    rows.toDF("event_id", "us")
      .selectExpr("event_id", "timestamp_micros(us) AS ts",
        "event_id AS user_id", "'click' AS event_type",
        "1.5 AS value", "'{}' AS props")
      .coalesce(1).write.parquet(s"$microsDir/events.parquet")

    // -- ntz: isAdjustedToUTC=false micros — pyarrow's default, what the
    // round-5 generator actually ships; infers as TimestampNTZType ------
    val ntzDir = s"$root/ntz"
    rows.toDF("event_id", "us")
      .selectExpr("event_id",
        "cast(timestamp_micros(us) AS timestamp_ntz) AS ts",
        "event_id AS user_id", "'click' AS event_type",
        "1.5 AS value", "'{}' AS props")
      .coalesce(1).write.parquet(s"$ntzDir/events.parquet")

    // -- rawlong: unannotated INT64 nanoseconds (ScaleBuild replicas) ---
    val rawDir = s"$root/rawlong"
    rows.toDF("event_id", "us")
      .selectExpr("event_id", "us * 1000 + 500 AS ts",
        "event_id AS user_id", "'click' AS event_type",
        "1.5 AS value", "'{}' AS props")
      .coalesce(1).write.parquet(s"$rawDir/events.parquet")

    // -- nanos: true TIMESTAMP(NANOS) annotation, via parquet-mr --------
    val nanosDir = s"$root/nanos"
    writeNanosAnnotated(s"$nanosDir/events.parquet")

    Map("micros" -> microsDir, "ntz" -> ntzDir,
      "rawlong" -> rawDir, "nanos" -> nanosDir)
  }

  /** The round-1..4 generator shape: INT64 annotated TIMESTAMP(NANOS),
    * which vanilla-session schema inference refuses to read. */
  private def writeNanosAnnotated(path: String): Unit = {
    import org.apache.parquet.example.data.simple.SimpleGroup
    import org.apache.parquet.hadoop.example.ExampleParquetWriter
    import org.apache.parquet.schema.{LogicalTypeAnnotation, Types}
    import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._

    val schema = Types.buildMessage()
      .required(INT64).named("event_id")
      .required(INT64)
      .as(LogicalTypeAnnotation.timestampType(true, TimeUnit.NANOS)).named("ts")
      .required(INT64).named("user_id")
      .required(BINARY).as(LogicalTypeAnnotation.stringType()).named("event_type")
      .required(DOUBLE).named("value")
      .required(BINARY).as(LogicalTypeAnnotation.stringType()).named("props")
      .named("events")

    val w = ExampleParquetWriter
      .builder(new org.apache.hadoop.fs.Path(path))
      .withType(schema)
      .build()
    try rows.foreach { case (id, us) =>
      val g = new SimpleGroup(schema)
      g.add("event_id", id)
      g.add("ts", us * 1000L + 500L) // sub-µs remainder: floor must drop it
      g.add("user_id", id)
      g.add("event_type", "click")
      g.add("value", 1.5d)
      g.add("props", "{}")
      w.write(g)
    } finally w.close()
  }

  private def loadedMicros(dir: String): Map[Long, Long] = {
    val spark = s
    import spark.implicits._
    Tables.events(spark, dir)
      .selectExpr("event_id", "unix_micros(ts) AS us")
      .as[(Long, Long)].collect().toMap
  }

  test("every observed physical encoding load to identical µs timestamps") {
    val expected = rows.toMap
    for ((name, dir) <- fixtures) {
      val got = loadedMicros(dir)
      assert(got == expected, s"encoding '$name' mismatched the fixture")
      assert(Tables.events(s, dir).schema("ts").dataType ==
        org.apache.spark.sql.types.TimestampType, s"encoding '$name'")
    }
  }

  test("2024 range predicate matches rows under every encoding (q5 shape)") {
    for ((name, dir) <- fixtures) {
      val n = Tables.events(s, dir)
        .where("ts >= timestamp'2024-01-01 00:00:00' AND ts < timestamp'2025-01-01 00:00:00'")
        .count()
      assert(n == rows.size.toLong, s"encoding '$name' lost 2024 rows")
    }
  }

  test("nanos-annotated fixture really is the inference-rejected shape") {
    // Guards the fixture itself: if parquet-mr ever wrote something a
    // vanilla read accepts as TimestampType, the fallback branch would
    // be untested without this failing first.
    val t = scala.util.Try(
      s.read.parquet(s"${fixtures("nanos")}/events.parquet").schema)
    assert(t.isFailure, "vanilla inference unexpectedly accepted TIMESTAMP(NANOS)")
  }

  test("NTZ decode is UTC regardless of the session timezone") {
    // Ad-hoc sessions may carry any spark.sql.session.timeZone; the
    // loader bakes UTC into the cast, so loaded instants must not shift.
    val zoned = TestSpark.spark.newSession()
    zoned.conf.set("spark.sql.session.timeZone", "America/New_York")
    try {
      val got = {
        import zoned.implicits._
        Tables.events(zoned, fixtures("ntz"))
          .selectExpr("event_id", "unix_micros(ts) AS us")
          .as[(Long, Long)].collect().toMap
      }
      assert(got == rows.toMap,
        "non-UTC session shifted the NTZ-decoded instants")
    } finally zoned.conf.set("spark.sql.session.timeZone", "UTC")
  }

  test("driver testdata shape canary: silent generator changes must fail loudly") {
    // Round 5 lesson: the generator can regenerate any table with a new
    // physical shape at any time. Events is now footer-dispatched; for
    // the rest, lock the COLUMN CONTRACT the operators assume, so a
    // regen that renames or retypes a load-bearing column reds this one
    // named test instead of corrupting dozens of query gates.
    val s2 = s
    def cols(t: String) =
      Tables.table(s2, "/root/testdata/sf0.001", t).schema.fields
        .map(f => f.name -> f.dataType).toMap
    val docs = cols("documents")
    assert(docs.contains("doc_id") && docs.contains("text") && docs.contains("source"),
      s"documents columns changed: ${docs.keys.toSeq.sorted}")
    val emb = cols("embeddings")
    assert(emb.contains("vec_id") && emb.contains("embedding"),
      s"embeddings columns changed: ${emb.keys.toSeq.sorted}")
    emb("embedding") match {
      case org.apache.spark.sql.types.ArrayType(et, _) =>
        assert(et == org.apache.spark.sql.types.FloatType,
          s"embedding element type changed to $et — cosine kernels and " +
            "their DuckDB oracle mirrors assume float32 input")
      case other => fail(s"embedding is no longer an array: $other")
    }
    val li = cols("lineitem")
    for (c <- Seq("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_returnflag", "l_shipdate"))
      assert(li.contains(c), s"lineitem lost $c: ${li.keys.toSeq.sorted}")
  }

  test("driver testdata loads from a vanilla SparkSession with ts as timestamp") {
    val vanilla = TestSpark.spark.newSession()
    assert(vanilla.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").forall(_ == "false"))
    val ev = Tables.events(vanilla, "/root/testdata/sf0.001")
    assert(ev.schema("ts").dataType == org.apache.spark.sql.types.TimestampType)
    // The regression's signature was ALL timestamps collapsing onto 1970;
    // whatever encoding the driver ships, loaded values must stay in a
    // plausible modern range.
    val years = ev.selectExpr("min(year(ts))", "max(year(ts))").head()
    assert(years.getInt(0) >= 2000 && years.getInt(1) <= 2100,
      s"events.ts decoded outside a plausible range: $years")
  }
}
