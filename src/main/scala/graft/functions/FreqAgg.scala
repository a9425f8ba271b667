package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items sketch as a real aggregate function.
  *
  * Exact heavy-hitter counting (`groupBy(token).count`) shuffles EVERY
  * distinct token — at 100 TB the token dictionary itself is the problem.
  * Misra-Gries keeps at most `k` counters per aggregation buffer; merging
  * two summaries (count-sum, then subtract the (k+1)-th largest and drop
  * ≤0 — Agarwal et al., "Mergeable Summaries") preserves the guarantee:
  *
  *   any item with true count > n/(k+1) is IN the sketch, and every
  *   sketch estimate undercounts by at most n/(k+1).
  *
  * Estimates depend on merge order (nondeterministic under parallelism);
  * MEMBERSHIP of true heavy hitters does not. The production pattern is
  * therefore sketch → candidate set → one exact verification pass over
  * just the candidates (graft.ext.Curation.heavyHitters).
  *
  * Plan shape: ordinary two-phase ObjectHashAggregate — O(k) state per
  * map task, one ≤k-entry summary per task through the shuffle.
  */
case class FreqSketch(
    item: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(k > 0, "frequent-items sketch requires k > 0")

  override def children: Seq[Expression] = Seq(item)
  override def nullable: Boolean = false
  override def prettyName: String = "freq_sketch"
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("item", StringType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  // Compiled input projection — same rationale as TopKByScore.inputProj:
  // the item expression (a cast, or a whole tokenize tree once callers
  // inline one) would otherwise be evaluated via interpreted eval per row.
  @transient private lazy val inputProj =
    org.apache.spark.sql.catalyst.expressions.UnsafeProjection.create(Seq(item))

  override def update(buf: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val row = inputProj(input)
    if (!row.isNullAt(0)) {
      val s = row.getUTF8String(0).toString
      buf.get(s) match {
        case Some(c) => buf.update(s, c + 1)
        case None if buf.size < k => buf.update(s, 1L)
        case None => // decrement-all step: every counter pays one
          val dead = mutable.ArrayBuffer.empty[String]
          buf.foreach { case (key, c) =>
            if (c == 1L) dead += key else buf.update(key, c - 1)
          }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long],
                     other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (key, c) => buf.update(key, buf.getOrElse(key, 0L) + c) }
    if (buf.size > k) {
      // subtract the (k+1)-th largest count from everything, drop ≤0
      val cut = buf.values.toArray.sorted(Ordering.Long.reverse).apply(k)
      val dead = mutable.ArrayBuffer.empty[String]
      buf.foreach { case (key, c) =>
        if (c <= cut) dead += key else buf.update(key, c - cut)
      }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val sorted = buf.toArray.sortBy { case (s, c) => (-c, s) }
    new GenericArrayData(sorted.map { case (s, c) =>
      InternalRow(UTF8String.fromString(s), c): Any
    })
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val entries = buf.toArray.map { case (s, c) => (s.getBytes(StandardCharsets.UTF_8), c) }
    val bb = ByteBuffer.allocate(4 + entries.map(_._1.length + 12).sum)
    bb.putInt(entries.length)
    entries.foreach { case (b, c) => bb.putInt(b.length); bb.put(b); bb.putLong(c) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var j = 0
    while (j < n) {
      val b = new Array[Byte](bb.getInt)
      bb.get(b)
      buf.update(new String(b, StandardCharsets.UTF_8), bb.getLong)
      j += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): FreqSketch =
    copy(item = newChildren(0))
}

object FreqAgg {
  import org.apache.spark.sql.graftbridge.ExprBridge.{toColumn => column, toExpression => expression}

  /** array<struct<item,est>> of ≤ k frequent-item candidates (est desc,
    * item asc). Guaranteed superset of items with true count > n/(k+1). */
  def freqSketch(item: Column, k: Int): Column =
    column(FreqSketch(expression(item.cast("string")), k).toAggregateExpression())
}
