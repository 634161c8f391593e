package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftshim.{toColumn, toExpression}
import org.apache.spark.sql.types.{DataType, LongType, StructType}

/** Last-writer-wins aggregate: keeps the `value` (a struct) of the row
  * with the greatest `offset` (long). Equal offsets (duplicate
  * (key, orderCol) rows) are broken by the serialized payload bytes —
  * greatest wins — so the winner is stable under repartitioning and
  * arrival order (the window-function formulation and the reference's
  * reduceGroups are both arrival-order-dependent on ties).
  *
  * Why not the built-in `max_by`: MaxBy is a DeclarativeAggregate whose
  * buffer holds a struct, which HashAggregateExec cannot put in its
  * mutable unsafe buffer — Spark silently falls back to SortAggregate
  * (observed in every LWW plan: Sort + SortAggregate per side of the
  * shuffle, n·log n per partition on 10^10 events). This
  * TypedImperativeAggregate runs in ObjectHashAggregateExec: true hash
  * aggregation with object buffers, partial/final merge preserved (so
  * map-side combine and the skew-proofing it provides stay intact),
  * spill-safe via ObjectHashAggregate's sort-based fallback.
  */
case class LastByOffset(
    value: Expression,
    offset: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LastByOffset.Buf] {

  // resolved lazily: children are unresolved when the Column is built
  @transient private lazy val valueSchema: StructType = {
    require(offset.dataType == LongType, "offset must be LONG")
    value.dataType.asInstanceOf[StructType]
  }
  @transient private lazy val toUnsafe = UnsafeProjection.create(valueSchema)

  override def children: Seq[Expression] = Seq(value, offset)
  override def nullable: Boolean = true
  override def dataType: DataType = value.dataType

  override def createAggregationBuffer(): LastByOffset.Buf =
    new LastByOffset.Buf(Long.MinValue, null)

  override def update(buf: LastByOffset.Buf, input: InternalRow): LastByOffset.Buf = {
    val o = offset.eval(input)
    if (o != null) {
      val off = o.asInstanceOf[Long]
      if (buf.row == null || off > buf.off) {
        val v = value.eval(input)
        buf.row = if (v == null) null else toUnsafe(v.asInstanceOf[InternalRow]).copy()
        buf.off = off
      } else if (off == buf.off) {
        // deterministic tie-break: greatest serialized payload wins
        val v = value.eval(input)
        if (v != null) {
          val cand = toUnsafe(v.asInstanceOf[InternalRow])
          if (LastByOffset.compareBytes(cand.getBytes, buf.row.getBytes) > 0) {
            buf.row = cand.copy()
          }
        }
      }
    }
    buf
  }

  override def merge(b1: LastByOffset.Buf, b2: LastByOffset.Buf): LastByOffset.Buf =
    if (b2.row == null) b1
    else if (b1.row == null || b2.off > b1.off) b2
    else if (b2.off == b1.off &&
      LastByOffset.compareBytes(b2.row.getBytes, b1.row.getBytes) > 0) b2
    else b1

  override def eval(buf: LastByOffset.Buf): Any = buf.row

  override def serialize(buf: LastByOffset.Buf): Array[Byte] = {
    val rowBytes = if (buf.row == null) Array.emptyByteArray else buf.row.getBytes
    val bb = ByteBuffer.allocate(8 + 4 + rowBytes.length)
    bb.putLong(buf.off); bb.putInt(rowBytes.length); bb.put(rowBytes)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): LastByOffset.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val off = bb.getLong
    val len = bb.getInt
    if (len == 0) new LastByOffset.Buf(off, null)
    else {
      val arr = new Array[Byte](len)
      bb.get(arr)
      val row = new UnsafeRow(valueSchema.length)
      row.pointTo(arr, len)
      new LastByOffset.Buf(off, row)
    }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): LastByOffset =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): LastByOffset =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): LastByOffset =
    copy(value = newChildren(0), offset = newChildren(1))
}

object LastByOffset {
  final class Buf(var off: Long, var row: UnsafeRow)

  /** Unsigned lexicographic byte comparison — a deterministic total order
    * on serialized rows, shared by the tie-breaking aggregates. */
  private[functions] def compareBytes(x: Array[Byte], y: Array[Byte]): Int = {
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val c = (x(i) & 0xFF) - (y(i) & 0xFF)
      if (c != 0) return c
      i += 1
    }
    x.length - y.length
  }

  def lastByOffset(value: Column, offset: Column): Column =
    toColumn(LastByOffset(toExpression(value), toExpression(offset))
      .toAggregateExpression())
}
