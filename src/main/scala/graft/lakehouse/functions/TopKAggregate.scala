package graft.lakehouse.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native mergeable top-k aggregate (`graft_topk(col, k)` → the k largest
  * values, descending): a [[TypedImperativeAggregate]] carrying a bounded
  * min-heap through Spark's partial-aggregation protocol — each partition
  * keeps at most k values, partial buffers serialize as k doubles, and the
  * final merge is k·log k. The DataFrame alternative (window rank + filter)
  * shuffles EVERY row to rank it; this shuffles k values per partition per
  * group — the difference between O(rows) and O(k·partitions) exchange
  * volume at 100 TB. (The same bounded-heap idea as
  * [[graft.lakehouse.ext.Similarity.cosineTopK]]'s mapPartitions plan, but
  * packaged as a first-class aggregate usable in any groupBy/SQL.)
  */
case class DoubleTopK(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.PriorityQueue[java.lang.Double]]
    with UnaryLike[Expression] {

  require(k >= 1, "graft_topk needs k >= 1")

  override def prettyName: String = "graft_topk"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case DoubleType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_topk requires a double argument, got ${other.simpleString}")
    }

  override def createAggregationBuffer(): java.util.PriorityQueue[java.lang.Double] =
    new java.util.PriorityQueue[java.lang.Double](k + 1) // min-heap

  private def offer(buf: java.util.PriorityQueue[java.lang.Double],
      d: Double): Unit = {
    if (buf.size < k) buf.add(d)
    else if (buf.peek() < d) { buf.poll(); buf.add(d) }
  }

  override def update(buf: java.util.PriorityQueue[java.lang.Double],
      input: InternalRow): java.util.PriorityQueue[java.lang.Double] = {
    val v = child.eval(input)
    if (v != null) offer(buf, v.asInstanceOf[Double])
    buf
  }

  override def merge(b1: java.util.PriorityQueue[java.lang.Double],
      b2: java.util.PriorityQueue[java.lang.Double])
      : java.util.PriorityQueue[java.lang.Double] = {
    val it = b2.iterator()
    while (it.hasNext) offer(b1, it.next())
    b1
  }

  override def eval(buf: java.util.PriorityQueue[java.lang.Double]): Any = {
    val arr = new Array[Double](buf.size)
    var i = 0
    val it = buf.iterator()
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    java.util.Arrays.sort(arr)
    // descending
    var lo = 0; var hi = arr.length - 1
    while (lo < hi) { val t = arr(lo); arr(lo) = arr(hi); arr(hi) = t; lo += 1; hi -= 1 }
    ArrayData.toArrayData(arr)
  }

  override def serialize(buf: java.util.PriorityQueue[java.lang.Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putDouble(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[java.lang.Double] = {
    val buf = createAggregationBuffer()
    val bb = java.nio.ByteBuffer.wrap(bytes)
    while (bb.hasRemaining) offer(buf, bb.getDouble())
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): DoubleTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): DoubleTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): DoubleTopK =
    copy(child = newChild)
}

object DoubleTopK {
  import org.apache.spark.sql.catalyst.expressions.Literal
  import org.apache.spark.sql.types.IntegerType

  /** SQL-registration shape: graft_topk(col, k) with a foldable int k. */
  def fromExprs(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "graft_topk(col, k) takes two arguments")
    val k = exprs(1) match {
      case Literal(i: Int, IntegerType) => i
      case other => throw new IllegalArgumentException(
        s"graft_topk's k must be an integer literal, got $other")
    }
    DoubleTopK(exprs(0), k).toAggregateExpression()
  }
}
