package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Bounded k-minimum-distinct-values aggregate: the k smallest DISTINCT
  * longs of the group, as a sorted ascending array — i.e. a KMV sketch
  * builder (Beyer et al. 2007) as a first-class Catalyst aggregate.
  *
  * Why an aggregate and not a window: `row_number() OVER (PARTITION BY
  * key ORDER BY v) <= k` computes the same set but funnels EVERY row of
  * a key into one task and sorts it — at corpus scale that is a full
  * shuffle plus an O(n log n) sort per key, and a single hot key
  * serializes. This buffer is a ≤k-element sorted set: partial
  * aggregates are built map-side (each shuffle record carries at most k
  * longs per key per map partition), merges are set-unions truncated at
  * k, and no sort ever sees more than k elements. That turns the KMV
  * sketch stage from sort-the-corpus into a hash aggregate with
  * constant-size state — the property that makes sketch set-operations
  * (x4) viable at 100 TB.
  *
  * State is a TreeSet (dedup + order in one structure); k is
  * plan-constant and small (64 in x4), so log k set ops per row are
  * cheaper than the codegen'd sort they replace. Rows with null input
  * are skipped (KMV over present values).
  */
case class MinKDistinctLongs(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k > 0, s"min_k_distinct needs k > 0, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"min_k_distinct expects a bigint column, got ${t.simpleString}")
    }

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit =
    if (buf.size < k) { buf.add(v); () }
    else if (v < buf.last) { if (buf.add(v)) { buf.pollLast(); () } }

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(
      buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): MinKDistinctLongs =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MinKDistinctLongs =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinKDistinctLongs =
    copy(child = newChildren.head)

  override def prettyName: String = "min_k_distinct"
}
