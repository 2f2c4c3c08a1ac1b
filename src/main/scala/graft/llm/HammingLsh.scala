package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hamming-band LSH pairing over 64-bit perceptual fingerprints — the
  * shared candidate generator behind m4 (image aHash) and m5 (audio
  * energy-envelope hash). One packed long per asset; the 64 bits split
  * into 8 one-byte bands; any pair within Hamming distance ≤ 7 shares
  * at least one identical band (pigeonhole), so a band equi-join is a
  * COMPLETE candidate generator for the ≤ 7 threshold — never a
  * cartesian pair scan.
  *
  * A pair collides in up to 8 bands; instead of dedup-by-shuffle (d6's
  * lesson — a `distinct` over the candidate set is an exchange the size
  * of the collision volume), each pair is emitted only from its FIRST
  * matching band, decidable per row from xor of the two hashes — dedup
  * costs a codegen predicate, and every per-candidate operation (band
  * extraction, first-match CASE, bit_count) is plain long arithmetic
  * inside whole-stage codegen.
  *
  * 100 TB shape: pairing shuffles only (band, byte) keys + one packed
  * long per side. The collision volume is bucket-occupancy-bound
  * (Σ per-(band,byte) n² — d6's documented shape): one-byte bands
  * saturate past ~10⁵ assets, and the scale path is a wider hash
  * (e.g. 256-bit → 2-byte bands at the same completeness radius), not
  * a different join.
  */
object HammingLsh {

  /** The 8 one-byte bands of `hash`, as an array expression (band i =
    * bits 8i..8i+7) — posexplode to (band, byte) rows. */
  val bandBytesExpr: String =
    "transform(sequence(0, 7), i -> cast(shiftrightunsigned(hash, i * 8) & 255 as int))"

  /** Band rows (asset_id, hash, band, byte) for `hashes` (columns
    * `asset_id`, `hash`) — the persisted index layout and the join key
    * shape. */
  def bandRows(hashes: DataFrame): DataFrame =
    hashes.select(col("asset_id"), col("hash"),
      posexplode(expr(bandBytesExpr)).as(Seq("band", "byte")))

  /** The FIRST band in which the two hashes of xor `xr` agree — the
    * codegen predicate that emits each colliding pair from exactly one
    * band (d6's lesson: dedup by predicate, not by shuffle). */
  val firstSharedBand: org.apache.spark.sql.Column = expr("""CASE
      WHEN (xr & 255) = 0 THEN 0
      WHEN (shiftrightunsigned(xr, 8) & 255) = 0 THEN 1
      WHEN (shiftrightunsigned(xr, 16) & 255) = 0 THEN 2
      WHEN (shiftrightunsigned(xr, 24) & 255) = 0 THEN 3
      WHEN (shiftrightunsigned(xr, 32) & 255) = 0 THEN 4
      WHEN (shiftrightunsigned(xr, 40) & 255) = 0 THEN 5
      WHEN (shiftrightunsigned(xr, 48) & 255) = 0 THEN 6
      ELSE 7 END""")

  /** Near-dup pairs over `hashes` (columns `asset_id: long`,
    * `hash: long`): one row per unordered pair (asset_a < asset_b)
    * within `maxHamming`, with its exact distance. */
  def nearDupPairs(hashes: DataFrame, maxHamming: Int = 7): DataFrame = {
    // Both sides of the band self-join read `hashes`, and Spark
    // re-evaluates the frame per side — for digest inputs that cost a
    // codec round-trip (m4's ImageIO decode, m5's PCM walk) or a full
    // corpus hash (d6's SimHash64), that doubles the query's dominant
    // term. The frame is 16 bytes/asset, so materializing it once is
    // membership-sized while the savings are one full digest pass per
    // call (measured on m6 at the 10× replica; SCALING.md r13).
    nearDupPairsOn(hashes.localCheckpoint(true), maxHamming)
  }

  /** [[nearDupPairs]] minus the defensive materialization — for callers
    * whose `hashes` frame is ALREADY an eager checkpoint (p4 pairs over
    * its prep manifest): re-evaluating an ExistingRDD projection per
    * join side is free, so the extra copy job is pure overhead there. */
  def nearDupPairsOn(hashes: DataFrame, maxHamming: Int = 7): DataFrame = {
    require(maxHamming <= 7,
      "8 one-byte bands are only a complete candidate generator up to Hamming 7")
    val bandRows0 = bandRows(hashes)
    val a = bandRows0.select(col("asset_id").as("asset_a"),
      col("hash").as("ha"), col("band"), col("byte"))
    val b = bandRows0.select(col("asset_id").as("asset_b"),
      col("hash").as("hb"), col("band"), col("byte"))
    a.join(b, Seq("band", "byte")).where(col("asset_a") < col("asset_b"))
      .withColumn("xr", expr("ha ^ hb"))
      .where(col("band") === firstSharedBand)
      .select(col("asset_a"), col("asset_b"),
        expr("cast(bit_count(xr) as int)").as("hamming"))
      .where(col("hamming") <= maxHamming)
  }
}
