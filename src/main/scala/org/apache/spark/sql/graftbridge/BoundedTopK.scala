package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, StructType}

/** Bounded top-k accumulator: the k SMALLEST struct rows of the group
  * under the struct's natural (field-by-field, ascending, NULLS FIRST)
  * ordering — the aggregate form of
  * `row_number() OVER (PARTITION BY g ORDER BY ord) <= k` when `ord`
  * is the struct's first field and is unique within the group.
  *
  * Why an aggregate and not the window (guide §2.3 "aggregate before
  * you shuffle"): the window path must sort EVERY group row and, under
  * a partial WindowGroupLimit, still ships every surviving map-side
  * row through the exchange; this buffer holds at most k entries per
  * group at every stage (update, partial ship, merge), so a degenerate
  * million-row bucket costs k copies in memory and k rows on the wire
  * instead of a million-row sort. The eviction comparison runs BEFORE
  * the defensive row copy, so rows that lose to the current max are
  * never copied at all.
  *
  * Determinism contract (the capBuckets tie audit): when the first
  * struct field is unique per group the selection is EXACTLY the
  * window's; the remaining fields are a total-order tiebreak, so even
  * a non-unique first field yields a deterministic (if not
  * window-identical) selection rather than a partition-order one.
  */
case class BoundedTopKRows(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[InternalRow]]
  with UnaryLike[Expression] {

  require(k > 0, s"bounded_topk needs k > 0, got $k")

  private lazy val structType = child.dataType.asInstanceOf[StructType]
  @transient private lazy val ordering: Ordering[InternalRow] =
    TypeUtils.getInterpretedOrdering(structType)
      .asInstanceOf[Ordering[InternalRow]]
  @transient private lazy val toUnsafe = UnsafeProjection.create(structType)

  override def dataType: DataType = ArrayType(structType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): java.util.PriorityQueue[InternalRow] =
    // max-heap (reversed ordering): peek() is the current worst row,
    // the one a smaller arrival evicts
    new java.util.PriorityQueue[InternalRow](
      math.min(k, 16) + 1, ordering.reverse)

  override def update(buf: java.util.PriorityQueue[InternalRow],
                      input: InternalRow): java.util.PriorityQueue[InternalRow] = {
    val row = child.eval(input).asInstanceOf[InternalRow]
    if (row != null) {
      if (buf.size < k) {
        buf.add(toUnsafe(row).copy())
      } else if (ordering.lt(row, buf.peek())) {
        buf.poll()
        buf.add(toUnsafe(row).copy())
      }
    }
    buf
  }

  override def merge(buf: java.util.PriorityQueue[InternalRow],
                     other: java.util.PriorityQueue[InternalRow])
      : java.util.PriorityQueue[InternalRow] = {
    val it = other.iterator()
    while (it.hasNext) {
      val row = it.next()
      if (buf.size < k) buf.add(row)
      else if (ordering.lt(row, buf.peek())) { buf.poll(); buf.add(row) }
    }
    buf
  }

  override def eval(buf: java.util.PriorityQueue[InternalRow]): Any = {
    val arr = buf.toArray(new Array[InternalRow](buf.size))
    java.util.Arrays.sort(arr, ordering)
    new GenericArrayData(arr.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: java.util.PriorityQueue[InternalRow]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(out)
    dos.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) {
      val u = toUnsafe(it.next()) // already unsafe post-update; cheap re-project otherwise
      val bytes = u.getBytes
      dos.writeInt(bytes.length)
      dos.write(bytes)
    }
    dos.flush()
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[InternalRow] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      val row = new UnsafeRow(structType.length)
      row.pointTo(b, len)
      buf.add(row)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): BoundedTopKRows =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BoundedTopKRows =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): BoundedTopKRows =
    copy(child = newChild)
  override def prettyName: String = "bounded_topk"
}

object BoundedTopK {
  import org.apache.spark.sql.classic.ExpressionUtils.{column, expression}

  /** `bounded_topk(k, struct)` as an aggregate Column: array of the k
    * smallest struct rows, ascending. */
  def bounded_topk(k: Int, structCol: Column): Column =
    column(BoundedTopKRows(expression(structCol), k).toAggregateExpression())
}
