package graft.lakehouse.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native mergeable DISTINCT bottom-k aggregate (`graft_bottomk(col, k)` →
  * the k smallest distinct longs, ascending): a [[TypedImperativeAggregate]]
  * carrying a bounded sorted set through Spark's partial-aggregation
  * protocol. This is the state a KMV (k-minimum-values) distinct sketch
  * needs — see [[graft.lakehouse.ext.Sketches.kmvSketch]] — and the reason
  * it must be a native aggregate: the DataFrame alternative (distinct +
  * window rank ≤ k) shuffles every distinct value and sorts whole groups,
  * while this ships at most k longs per group per partition and merges in
  * O(k log k). Distinctness is set semantics inside the buffer, so
  * duplicate inputs (the common case for a value stream) never inflate the
  * state.
  */
case class LongBottomK(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
    with UnaryLike[Expression] {

  require(k >= 1, "graft_bottomk needs k >= 1")

  override def prettyName: String = "graft_bottomk"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_bottomk requires a bigint argument, got ${other.simpleString}")
    }

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def offer(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
    if (buf.size < k) { buf.add(v); () }
    else if (v < buf.last()) {
      // only mutate when v is genuinely new — TreeSet.add dedupes, but
      // polling last BEFORE a duplicate insert would lose a value
      if (buf.add(v)) buf.pollLast()
      ()
    }
  }

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) offer(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: java.util.TreeSet[java.lang.Long],
      b2: java.util.TreeSet[java.lang.Long])
      : java.util.TreeSet[java.lang.Long] = {
    val it = b2.iterator()
    while (it.hasNext) offer(b1, it.next())
    b1
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Long](buf.size)
    var i = 0
    val it = buf.iterator() // ascending
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    ArrayData.toArrayData(arr)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val buf = createAggregationBuffer()
    val bb = java.nio.ByteBuffer.wrap(bytes)
    while (bb.hasRemaining) offer(buf, bb.getLong())
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): LongBottomK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): LongBottomK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): LongBottomK =
    copy(child = newChild)
}

object LongBottomK {
  import org.apache.spark.sql.catalyst.expressions.Literal
  import org.apache.spark.sql.types.IntegerType

  /** SQL-registration shape: graft_bottomk(col, k) with a foldable int k. */
  def fromExprs(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "graft_bottomk(col, k) takes two arguments")
    val k = exprs(1) match {
      case Literal(i: Int, IntegerType) => i
      case other => throw new IllegalArgumentException(
        s"graft_bottomk's k must be an integer literal, got $other")
    }
    LongBottomK(exprs(0), k).toAggregateExpression()
  }
}
