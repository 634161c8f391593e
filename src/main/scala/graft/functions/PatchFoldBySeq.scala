package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftshim.{toColumn, toExpression}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Ordered CDC fold for merge-on-read reconstruction with PARTIAL
  * updates: collects each key's (seq, row) contributions, sorts by seq
  * at evaluation, and folds them like the reference's patch applier —
  * 'c'/'r' (and full 'u') rows replace the accumulator, 'u' rows with a
  * `_patch_mask` copy only the masked fields onto it, 'd' empties it.
  * Returns the folded payload struct, or null when the key's final
  * state is deleted/absent.
  *
  * Last-writer-wins reconstruction ([[LastByOffset]]) is WRONG in the
  * presence of patch deltas (the last patch carries only its masked
  * fields); this aggregate is the general path. Buffer size is bounded
  * by the number of contributing commits per key (≤ 1 row per commit,
  * bounded by the compaction threshold), so the state stays small.
  *
  * The input `value` struct = payload fields ++ (`operation`: string,
  * `_patch_mask`: array<string>); the output struct carries the payload
  * fields only.
  */
case class PatchFoldBySeq(
    value: Expression,
    seq: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[PatchFoldBySeq.Buf] {

  @transient private lazy val valueSchema: StructType = {
    require(seq.dataType == LongType, "seq must be LONG")
    value.dataType.asInstanceOf[StructType]
  }
  @transient private lazy val opIdx = valueSchema.fieldIndex("operation")
  @transient private lazy val maskIdx = valueSchema.fieldIndex("_patch_mask")
  @transient private lazy val payloadIdx =
    valueSchema.fields.indices.filter(i => i != opIdx && i != maskIdx)
  @transient private lazy val nameToIdx =
    valueSchema.fieldNames.zipWithIndex.toMap
  @transient private lazy val outSchema =
    StructType(payloadIdx.map(valueSchema.fields))
  @transient private lazy val toUnsafe = UnsafeProjection.create(valueSchema)

  override def children: Seq[Expression] = Seq(value, seq)
  override def nullable: Boolean = true
  override def dataType: DataType = outSchema

  override def createAggregationBuffer(): PatchFoldBySeq.Buf =
    new PatchFoldBySeq.Buf(ArrayBuffer.empty)

  override def update(buf: PatchFoldBySeq.Buf, input: InternalRow): PatchFoldBySeq.Buf = {
    val s = seq.eval(input)
    val v = value.eval(input)
    if (s != null && v != null)
      buf.rows += ((s.asInstanceOf[Long],
        toUnsafe(v.asInstanceOf[InternalRow]).copy()))
    buf
  }

  override def merge(b1: PatchFoldBySeq.Buf, b2: PatchFoldBySeq.Buf): PatchFoldBySeq.Buf = {
    b1.rows ++= b2.rows
    b1
  }

  override def eval(buf: PatchFoldBySeq.Buf): Any = {
    if (buf.rows.isEmpty) return null
    // secondary sort on the serialized row: rows sharing a seq (duplicate
    // keys inside one un-reduced append() commit) fold in a deterministic
    // order regardless of partitioning / buffer-merge order
    val sorted = buf.rows.sortWith { case ((s1, r1), (s2, r2)) =>
      if (s1 != s2) s1 < s2
      else LastByOffset.compareBytes(r1.getBytes, r2.getBytes) < 0
    }
    var acc: Array[Any] = null
    sorted.foreach { case (_, row) =>
      val op = row.getUTF8String(opIdx)
      val opStr = if (op == null) "r" else op.toString
      val mask = if (row.isNullAt(maskIdx)) null else row.getArray(maskIdx)
      opStr match {
        case "d" => acc = null
        case "u" if mask != null && acc != null =>
          var i = 0
          while (i < mask.numElements()) {
            val f = mask.getUTF8String(i).toString
            nameToIdx.get(f).foreach { idx =>
              if (idx != opIdx && idx != maskIdx)
                acc(idx) = get(row, idx)
            }
            i += 1
          }
        case _ => // c / r / full u (or a patch with no base: treat as replace)
          acc = valueSchema.fields.indices.map(i => get(row, i)).toArray
      }
    }
    if (acc == null) null
    else new GenericInternalRow(payloadIdx.map(acc).toArray)
  }

  private def get(row: UnsafeRow, i: Int): Any =
    if (row.isNullAt(i)) null else row.get(i, valueSchema.fields(i).dataType)

  override def serialize(buf: PatchFoldBySeq.Buf): Array[Byte] = {
    val entries = buf.rows.map { case (s, r) => (s, r.getBytes) }
    val size = 4 + entries.map(e => 8 + 4 + e._2.length).sum
    val bb = ByteBuffer.allocate(size)
    bb.putInt(entries.length)
    entries.foreach { case (s, bytes) =>
      bb.putLong(s); bb.putInt(bytes.length); bb.put(bytes)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): PatchFoldBySeq.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val rows = ArrayBuffer.empty[(Long, UnsafeRow)]
    var i = 0
    while (i < n) {
      val s = bb.getLong
      val len = bb.getInt
      val arr = new Array[Byte](len)
      bb.get(arr)
      val row = new UnsafeRow(valueSchema.length)
      row.pointTo(arr, len)
      rows += ((s, row))
      i += 1
    }
    new PatchFoldBySeq.Buf(rows)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): PatchFoldBySeq =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): PatchFoldBySeq =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): PatchFoldBySeq =
    copy(value = newChildren(0), seq = newChildren(1))
}

object PatchFoldBySeq {
  final class Buf(val rows: ArrayBuffer[(Long, UnsafeRow)])

  def patchFoldBySeq(value: Column, seq: Column): Column =
    toColumn(PatchFoldBySeq(toExpression(value), toExpression(seq))
      .toAggregateExpression())
}
