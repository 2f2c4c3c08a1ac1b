package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The hand-tuned hash kernels must match the SQL expression forms the
  * DuckDB oracle runs, exactly. */
class TextHashesSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet").limit(100)

  test("MinHashSigs equals the transform/array_min md5 SQL form") {
    val withShingles = docs.select(col("doc_id"), expr(
      """aggregate(array(split(lower(text), ' ')), CAST(array() AS array<string>),
        (z, t) -> array_distinct(transform(sequence(0, size(t) - 3),
          i -> concat_ws(' ', element_at(t, i+1), element_at(t, i+2), element_at(t, i+3)))))""").as("s"))
    val diff = withShingles.select(
      ColumnBridge.column(MinHashSigs(ColumnBridge.expression(col("s")))).as("fast"),
      expr("""transform(sequence(0, 7),
        k -> array_min(transform(s, x -> md5(concat(cast(k as string), '|', x)))))""").as("slow"))
      .where("fast <> slow").count()
    assert(diff == 0)
  }

  test("SimHash16 equals the bit-vote md5 SQL form") {
    val diff = docs.select(
      ColumnBridge.column(SimHash16(
        ColumnBridge.expression(split(lower(col("text")), " ")))).as("fast"),
      expr("""cast(aggregate(array(transform(split(lower(text), ' '),
          tok -> cast(conv(substring(md5(tok), 1, 4), 16, 10) as int))), 0, (z, hs) ->
        aggregate(sequence(0, 15), 0, (acc, i) -> acc +
          IF(aggregate(hs, 0, (a, v) -> a + IF((shiftright(v, i) & 1) = 1, 1, -1)) > 0,
             shiftleft(1, i), 0))) as int)""").as("slow"))
      .where("fast <> slow").count()
    assert(diff == 0)
  }

  test("SimHash64 equals the bit-vote md5 SQL form") {
    // Per-token value = first 16 md5 hex chars as a raw 64-bit pattern,
    // assembled from two 8-hex halves (conv's string result overflows a
    // direct 16-hex bigint cast when bit 63 is set).
    val diff = docs.select(
      ColumnBridge.column(SimHash64(
        ColumnBridge.expression(split(lower(col("text")), " ")))).as("fast"),
      expr("""cast(aggregate(array(transform(split(lower(text), ' '),
          tok -> shiftleft(cast(conv(substring(md5(tok), 1, 8), 16, 10) as bigint), 32)
                 | cast(conv(substring(md5(tok), 9, 8), 16, 10) as bigint))),
        cast(0 as bigint), (z, hs) ->
        aggregate(sequence(0, 63), cast(0 as bigint), (acc, i) -> acc +
          IF(aggregate(hs, 0, (a, v) -> a + IF((shiftrightunsigned(v, i) & 1) = 1, 1, -1)) > 0,
             shiftleft(cast(1 as bigint), i), cast(0 as bigint)))) as bigint)""").as("slow"))
      .where("fast <> slow").count()
    assert(diff == 0)
  }

  test("Md5Short fast path is enabled (constants reproduce MessageDigest)") {
    // Guards the RFC 1321 constant derivation: a regression there (e.g.
    // Double.toInt saturation) would silently fall back to MessageDigest
    // and this is the only place that would notice.
    assert(Md5Short.enabled)
    assert(Md5Short.K(0) == 0xd76aa478 && Md5Short.K(63) == 0xeb86d391)
  }

  test("MinHashSigs of an empty set is 8 nulls") {
    val out = Seq(Seq.empty[String]).toDF("s")
      .select(ColumnBridge.column(MinHashSigs(ColumnBridge.expression(col("s")))).as("sigs"))
      .head().getAs[scala.collection.Seq[String]]("sigs")
    assert(out.length == 8 && out.forall(_ == null))
  }
}
