package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.{toColumn, toExpression}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Bounded top-k aggregate over (score: double, id: long) pairs: keeps
  * the k best ids ordered by (score DESC, id ASC) and evaluates to them
  * as an `array<long>` in rank order.
  *
  * This replaces the `groupBy(query, neighbor).agg(max(sim))` +
  * `Window(row_number over (partition by query order by sim desc, id))`
  * tail of the ANN top-k operators: that shape shuffles EVERY candidate
  * pair twice (pair-dedup exchange, then rank exchange + sort) when the
  * result per group is k rows. Here partial aggregation reduces each map
  * partition to ≤ k entries per query BEFORE the single shuffle — the
  * guide §2.3 "aggregate before you shuffle" move; at 10^10 candidate
  * pairs the two full-pair exchanges simply disappear.
  *
  * Semantics match the window formulation exactly:
  *  - score ordering is Spark's descending double order (NaN greatest,
  *    nulls last), ties broken by ascending id — `java.lang.Double
  *    .compare` is that order for non-null scores;
  *  - duplicate (score, id) pairs collapse (the ANN pipelines only ever
  *    produce duplicates with IDENTICAL scores — the same two vectors —
  *    so this is exactly the pair-dedup the groupBy performed);
  *  - null ids are ignored (a window over a null id row would rank it,
  *    but no caller produces null ids; documented contract).
  * Runs in ObjectHashAggregateExec (object buffer, partial/final merge,
  * sort-based spill fallback). Buffer is O(k) per group.
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKByScore.Buf] {

  require(k >= 1, s"k must be >= 1, got $k")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): TopKByScore.Buf =
    new TopKByScore.Buf(new java.util.TreeSet[TopKByScore.Entry](TopKByScore.ord))

  override def update(buf: TopKByScore.Buf, input: InternalRow): TopKByScore.Buf = {
    require(score.dataType == DoubleType && id.dataType == LongType,
      "topKByScore(score: double, id: long)")
    val idV = id.eval(input)
    if (idV != null) {
      val s = score.eval(input)
      buf.add(new TopKByScore.Entry(
        s != null, if (s == null) 0.0 else s.asInstanceOf[Double],
        idV.asInstanceOf[Long]), k)
    }
    buf
  }

  override def merge(b1: TopKByScore.Buf, b2: TopKByScore.Buf): TopKByScore.Buf = {
    val it = b2.set.iterator()
    while (it.hasNext) b1.add(it.next(), k)
    b1
  }

  override def eval(buf: TopKByScore.Buf): Any = {
    val out = new Array[Long](buf.set.size())
    val it = buf.set.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next().id; i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: TopKByScore.Buf): Array[Byte] = {
    val n = buf.set.size()
    val bb = ByteBuffer.allocate(4 + n * 17)
    bb.putInt(n)
    val it = buf.set.iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.put(if (e.hasScore) 1.toByte else 0.toByte)
      bb.putDouble(e.score)
      bb.putLong(e.id)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKByScore.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      buf.add(new TopKByScore.Entry(bb.get() == 1, bb.getDouble, bb.getLong), k)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(score = newChildren(0), id = newChildren(1))
}

object TopKByScore {
  final class Entry(val hasScore: Boolean, val score: Double, val id: Long)

  /** (score DESC with NaN greatest / nulls last, id ASC); 0 == duplicate. */
  private[functions] val ord: java.util.Comparator[Entry] =
    new java.util.Comparator[Entry] {
      override def compare(a: Entry, b: Entry): Int = {
        if (a.hasScore != b.hasScore) return if (a.hasScore) -1 else 1
        if (a.hasScore) {
          val c = java.lang.Double.compare(b.score, a.score) // descending
          if (c != 0) return c
        }
        java.lang.Long.compare(a.id, b.id)
      }
    }

  final class Buf(val set: java.util.TreeSet[Entry]) {
    def add(e: Entry, k: Int): Unit = {
      if (set.size() < k) { set.add(e); () }
      else if (ord.compare(e, set.last()) < 0) {
        if (set.add(e)) { set.remove(set.last()); () }
      }
    }
  }

  def topKByScore(score: Column, id: Column, k: Int): Column =
    toColumn(TopKByScore(toExpression(score), toExpression(id), k)
      .toAggregateExpression())
}
