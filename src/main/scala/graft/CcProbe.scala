package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Diagnostic-only main: times the d13 chain-CC star loop round by round
  * under different session configs to locate the per-round floor.
  * Not part of the driver contract.
  *
  * Usage: runMain graft.CcProbe <sfDir> <mode>
  * mode: aqe    — AQE on, intermediate distinct (round-4 shape)
  *       noaqe  — AQE off @32 partitions (9c9533f shape)
  *       aqe2   — AQE on, NO intermediate distinct (partitioning reuse)
  *       p1     — AQE off, 1 shuffle partition, NO intermediate distinct
  *       p1d    — AQE off, 1 shuffle partition, with distinct
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mode = if (args.length > 1) args(1) else "aqe"
    val spark = Sessions.local("32", "graft-cc-probe")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    val ids = Tables.documents(spark, sfDir).select(col("doc_id"))
    val pairs = ids.select(col("doc_id").as("doc_a"))
      .join(ids.select(col("doc_id").as("doc_b")),
        col("doc_b") === col("doc_a") + 1)
      .where(col("doc_a") % 200 =!= 199)

    mode match {
      case "noaqe" => spark.conf.set("spark.sql.adaptive.enabled", "false")
      case "p1" | "p1d" =>
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.shuffle.partitions", "1")
      case "p1nc" =>
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.shuffle.partitions", "1")
        spark.conf.set("spark.sql.codegen.wholeStage", "false")
      case _ => ()
    }
    val interDistinct = mode == "aqe" || mode == "noaqe" || mode == "p1d"
    // p1nc also skips the intermediate distinct, like p1

    val t0 = System.nanoTime()
    var edges = pairs
      .select(greatest(col("doc_a"), col("doc_b")).as("u"),
        least(col("doc_a"), col("doc_b")).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(true)
    println(f"[cc] setup ${(System.nanoTime() - t0) / 1e9}%6.2f s  edges=${edges.count()}")

    var iter = 0
    var converged = false
    var prevSig = {
      val r = edges.agg(count(lit(1)), bit_xor(xxhash64(col("u"), col("v")))).head()
      (r.getLong(0), r.getLong(1))
    }
    while (iter < 40 && !converged) {
      val r0 = System.nanoTime()
      val sym = edges.select(col("u"), col("v"))
        .unionByName(edges.select(col("v").as("u"), col("u").as("v")))
      val largeMins = sym.groupBy("u")
        .agg(least(min(col("v")), first(col("u"))).as("m"))
      val afterLarge0 = sym.where(col("v") > col("u"))
        .join(largeMins, Seq("u"))
        .select(col("v").as("u"), col("m").as("v"))
      val afterLarge = if (interDistinct) afterLarge0.distinct() else afterLarge0
      val smallMins = afterLarge.groupBy("u").agg(min(col("v")).as("m"))
      val next = afterLarge.join(smallMins, Seq("u"))
        .where(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .unionByName(smallMins.select(col("u"), col("m").as("v")))
        .distinct()
        .localCheckpoint(true)
      val tChk = (System.nanoTime() - r0) / 1e9
      val r1 = System.nanoTime()
      val sig = {
        val r = next.agg(count(lit(1)), bit_xor(xxhash64(col("u"), col("v")))).head()
        (r.getLong(0), r.getLong(1))
      }
      val tSig = (System.nanoTime() - r1) / 1e9
      val r2 = System.nanoTime()
      converged = sig == prevSig && next.join(edges, Seq("u", "v"), "left_anti").isEmpty
      val tAnti = (System.nanoTime() - r2) / 1e9
      println(f"[cc] round $iter%2d  chk=$tChk%6.2f sig=$tSig%5.2f anti=$tAnti%5.2f  edges=${sig._1}")
      prevSig = sig
      edges = next
      iter += 1
    }
    println(f"[cc] total ${(System.nanoTime() - t0) / 1e9}%6.2f s  rounds=$iter")
    spark.stop()
  }
}
