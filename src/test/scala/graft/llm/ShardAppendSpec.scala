package graft.llm

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** Structural contract of append-only shard growth (c13b) — what the
  * oracle's hash can't state as properties: shipped shards are full and
  * immutable, the delta opens strictly-later shards, and the layout is
  * a bijection.
  */
class ShardAppendSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark

  private def rows(): Seq[(String, String, Long, Long, Long, Long)] =
    SparkEntry.queries("c13b_shard_append")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq

  test("delta opens strictly-later shards; every shard but each batch's last is full") {
    val out = rows()
    val base = out.filter(_._1 == "base")
    val delta = out.filter(_._1 == "delta")
    assert(base.nonEmpty && delta.nonEmpty)
    assert(delta.map(_._4).min > base.map(_._4).max,
      "a delta sequence landed in (or before) a shipped base shard")

    for ((batch, group) <- Seq("base" -> base, "delta" -> delta)) {
      val byShard = group.groupBy(_._4)
      val last = byShard.keys.max
      for ((shard, rs) <- byShard) {
        val sizeOk = if (shard == last) rs.size <= 16 else rs.size == 16
        assert(sizeOk, s"$batch shard $shard has ${rs.size} sequences")
        assert(rs.map(_._5).sorted == (0L until rs.size).toSeq,
          s"$batch shard $shard in-shard positions are not 0..n-1")
      }
    }
  }

  test("(shard, pos) is a bijection over all sequences; per-source numbering is contiguous") {
    val out = rows()
    assert(out.map(r => (r._4, r._5)).distinct.size == out.size,
      "duplicate (shard_id, pos_in_shard) slot")
    assert(out.map(r => (r._2, r._3)).distinct.size == out.size,
      "duplicate (source, seq)")
    for ((src, rs) <- out.groupBy(_._2)) {
      val seqs = rs.map(_._3).sorted
      assert(seqs == (0L until seqs.size).toSeq,
        s"source $src sequence ids not contiguous from 0: delta must continue base numbering")
    }
  }

  test("deterministic: two runs agree exactly") {
    assert(rows() == rows())
  }
}
