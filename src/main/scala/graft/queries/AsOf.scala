package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join — for each left row, the latest right row with
  * `right.ts <= left.ts` per key. The reference needs this shape to align
  * observations against the most recent forecast (J9, SURVEY §2.3); it is
  * also the canonical point-in-time join of any time-series / training
  * feature pipeline.
  *
  * Spark has no built-in as-of join; the naive encodings are a range join
  * (BroadcastNestedLoop — dies at scale) or a per-left-row subquery. The
  * scalable encoding used here: tag both sides, UNION them, and run ONE
  * window pass per key ordered by (ts, side) carrying the last seen right
  * payload forward — exactly one shuffle on the key, no pair enumeration,
  * state bounded per partition. Right payload travels as a single struct,
  * so "last known" is atomic — never a Frankenstein row mixing fields
  * from different right rows.
  *
  * Ties: a right row at exactly left.ts is visible (sorts before the left
  * row) — the `>=` as-of contract. If several right rows share a key and
  * timestamp, pre-aggregate the right side to one row per (key, ts);
  * otherwise which of the tied rows wins is unspecified (same as DuckDB's
  * ASOF JOIN).
  */
object AsOf {

  /** Left columns pass through unchanged; the matched right row (all its
    * non-key columns, including its timestamp) lands in one nullable
    * struct column `asofCol` — null when no right row precedes. */
  def joinBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTsCol: String, rightTsCol: String,
      asofCol: String = "asof"): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one key column")
    val leftCols = left.columns.toSeq
    require(!leftCols.contains(asofCol), s"left already has a '$asofCol' column")
    // The union/window encoding below claims these two names internally; an
    // input that already uses them would silently join wrong — fail fast.
    for (c <- Seq("__ts", "__side"); (side, cols) <-
        Seq("left" -> leftCols, "right" -> right.columns.toSeq))
      require(!cols.contains(c), s"$side input already has a '$c' column " +
        "(reserved internally by AsOf.joinBackward)")

    val rightVals = right.columns.toSeq.filterNot(keys.contains)
    val rvType = {
      val r = right.select(struct(rightVals.map(col): _*).as(asofCol))
      r.schema(asofCol).dataType
    }

    val lFrame = left
      .withColumn("__ts", col(leftTsCol))
      .withColumn("__side", lit(1))
      .withColumn(asofCol, lit(null).cast(rvType))
    val rFrame = right
      .select(keys.map(col) :+ col(rightTsCol).as("__ts") :+
        struct(rightVals.map(col): _*).as(asofCol): _*)
      .withColumn("__side", lit(0))
      // left-only columns are null on right rows; unionByName fills them
    val unioned = lFrame.unionByName(rFrame, allowMissingColumns = true)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn(asofCol, last(col(asofCol), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select((leftCols.map(col) :+ col(asofCol)): _*)
  }

  /** Convenience: unpack the matched struct next to the left columns,
    * with `prefix`ed names and per-field default values for misses. */
  def joinBackwardFlat(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTsCol: String, rightTsCol: String, prefix: String = "asof_",
      defaults: Map[String, Column] = Map.empty): DataFrame = {
    val joined = joinBackward(left, right, keys, leftTsCol, rightTsCol)
    val rightVals = right.columns.toSeq.filterNot(keys.contains)
    rightVals.foldLeft(joined) { (df, v) =>
      val raw = col("asof").getField(v)
      df.withColumn(prefix + v, defaults.get(v).map(coalesce(raw, _)).getOrElse(raw))
    }.drop("asof")
  }
}
