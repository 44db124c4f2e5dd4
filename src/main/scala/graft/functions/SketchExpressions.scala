package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** KMV (k-minimum-values) distinct-count sketch as a native Catalyst
  * aggregate. State is the k smallest DISTINCT hash values seen —
  * O(k) memory per group regardless of stream size, partial-aggregable
  * (map-side combine merges two sketches by keeping the k smallest of
  * the union), so the full-shuffle `count(DISTINCT x)` a 100 TB corpus
  * cannot afford is replaced by k longs per group per partition.
  *
  * The estimator (Bar-Yossef et al., "Counting distinct elements in a
  * data stream", RANDOM 2002) is (k-1)/u_k with u_k the k-th smallest
  * normalized hash; with fewer than k distinct values the sketch IS
  * the distinct set and the count is exact. Determinism: the output is
  * the sorted hash array itself — a pure set function of the input,
  * independent of row order and partitioning — so the driver oracle
  * can rebuild it in SQL (row_number over sorted distinct hashes) and
  * hash-compare the estimate bit-for-bit.
  */
case class KmvSketch(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {
  require(k >= 2, "kmv_sketch needs k >= 2")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_sketch"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(
      buf: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
    if (buf.size < k) { buf.add(v); () }
    else if (v < buf.last) {
      // strictly smaller than the current k-th value: displace it
      // (no-op if v is already present — TreeSet add dedups first)
      if (buf.add(v)) buf.pollLast()
      ()
    }
  }

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
    val out = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(
      buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(
      bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val buf = createAggregationBuffer()
    val bb = ByteBuffer.wrap(bytes)
    while (bb.hasRemaining) buf.add(bb.getLong)
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(c: Expression): KmvSketch =
    copy(child = c)
}

object SketchFunctions {
  import org.apache.spark.sql.graft.shims.{column, expression}

  /** k smallest distinct values of `h` per group, sorted ascending. */
  def kmv_sketch(h: Column, k: Int): Column =
    column(KmvSketch(expression(h), k).toAggregateExpression())
}
