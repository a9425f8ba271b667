package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k as a real aggregate function.
  *
  * `row_number().over(Window.partitionBy(query))` funnels EVERY candidate of
  * a query through one window partition — one task holds (and sorts) the
  * whole candidate set, which is the scale ceiling of the windowed top-k
  * (at 100 TB a hot query's candidates won't fit one task). An aggregate
  * gets partial aggregation for free: each map task keeps only its local
  * k-heap, the shuffle carries ≤ k entries per (group × task), and the
  * reducer merges heaps — memory is O(k) everywhere and the plan is the
  * ordinary two-phase HashAggregate.
  *
  * Ordering: score desc, then id asc (the deterministic tie-break used by
  * every ranked query in this repo). Null scores/ids are skipped.
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  require(k > 0, "top-k requires k > 0")

  // head of the queue = the WORST retained entry (lowest score, largest id)
  private def worstFirst: Ordering[(Double, Long)] =
    Ordering.by { case (s, i) => (-s, i) }

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def prettyName: String = "top_k_by_score"
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty[(Double, Long)](worstFirst)

  private def better(c: (Double, Long), w: (Double, Long)): Boolean =
    c._1 > w._1 || (c._1 == w._1 && c._2 < w._2)

  private def offer(buf: mutable.PriorityQueue[(Double, Long)],
                    cand: (Double, Long)): Unit = {
    if (buf.size < k) buf.enqueue(cand)
    else if (better(cand, buf.head)) { buf.dequeue(); buf.enqueue(cand) }
  }

  // Compiled input projection: `score` arrives as the caller's full
  // expression tree (CollapseProject inlines any pre-projection into the
  // aggregate), and TypedImperativeAggregate.update sits outside
  // whole-stage codegen — `score.eval(input)` would walk that tree
  // INTERPRETED once per row (in x22 that's the entire qualityScore
  // expression). UnsafeProjection.create codegens the children once per
  // task instead; by first update the children are bound references.
  @transient private lazy val inputProj =
    org.apache.spark.sql.catalyst.expressions.UnsafeProjection.create(Seq(score, id))

  override def update(buf: mutable.PriorityQueue[(Double, Long)],
                      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val row = inputProj(input)
    if (!row.isNullAt(0) && !row.isNullAt(1))
      offer(buf, (row.getDouble(0), row.getLong(1)))
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(Double, Long)],
                     other: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    other.foreach(offer(buf, _))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    val sorted = buf.toArray.sortBy { case (s, i) => (-s, i) }
    new GenericArrayData(sorted.map { case (s, i) => InternalRow(s, i): Any })
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var j = 0
    while (j < n) { buf.enqueue((bb.getDouble, bb.getLong)); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(score = newChildren(0), id = newChildren(1))
}

/** [[TopKByScore]] with STRING ids (terms, URLs, digests) — same bounded
  * heap, same (score desc, id asc) order with binary string comparison
  * (Spark's UTF8String ordering = DuckDB's default collation, so ranked
  * outputs stay oracle-comparable). Kept as a separate physical aggregate
  * rather than a generic one: the buffer stays primitive-typed and the
  * serialization format fixed-width where possible. */
case class TopKByScoreString(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, org.apache.spark.unsafe.types.UTF8String)]] {
  import org.apache.spark.unsafe.types.UTF8String

  require(k > 0, "top-k requires k > 0")

  // head of the queue = the WORST retained entry (lowest score, largest id)
  private def worstFirst: Ordering[(Double, UTF8String)] =
    new Ordering[(Double, UTF8String)] {
      override def compare(x: (Double, UTF8String), y: (Double, UTF8String)): Int = {
        val c = java.lang.Double.compare(y._1, x._1)
        if (c != 0) c else x._2.compareTo(y._2)
      }
    }

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def prettyName: String = "top_k_by_score_string"
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType, nullable = false),
      StructField("id", StringType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, UTF8String)] =
    mutable.PriorityQueue.empty[(Double, UTF8String)](worstFirst)

  private def better(c: (Double, UTF8String), w: (Double, UTF8String)): Boolean =
    c._1 > w._1 || (c._1 == w._1 && c._2.compareTo(w._2) < 0)

  private def offer(buf: mutable.PriorityQueue[(Double, UTF8String)],
                    cand: (Double, UTF8String)): Unit = {
    if (buf.size < k) buf.enqueue(cand)
    else if (better(cand, buf.head)) { buf.dequeue(); buf.enqueue(cand) }
  }

  @transient private lazy val inputProj =
    org.apache.spark.sql.catalyst.expressions.UnsafeProjection.create(Seq(score, id))

  override def update(buf: mutable.PriorityQueue[(Double, UTF8String)],
                      input: InternalRow): mutable.PriorityQueue[(Double, UTF8String)] = {
    val row = inputProj(input)
    if (!row.isNullAt(0) && !row.isNullAt(1))
      // the projection reuses its output buffer — the string must be copied
      // out before the next row overwrites it
      offer(buf, (row.getDouble(0), row.getUTF8String(1).copy()))
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(Double, UTF8String)],
                     other: mutable.PriorityQueue[(Double, UTF8String)]): mutable.PriorityQueue[(Double, UTF8String)] = {
    other.foreach(offer(buf, _))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Double, UTF8String)]): Any = {
    val sorted = buf.toArray.sortWith { (a, b) =>
      a._1 > b._1 || (a._1 == b._1 && a._2.compareTo(b._2) < 0)
    }
    new GenericArrayData(sorted.map { case (s, i) => InternalRow(s, i): Any })
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, UTF8String)]): Array[Byte] = {
    val entries = buf.toArray
    // 8B score + 4B length prefix + bytes per entry — sized exactly, the
    // whole array ships through the shuffle
    val bb = ByteBuffer.allocate(4 + entries.map(12 + _._2.numBytes()).sum)
    bb.putInt(entries.length)
    entries.foreach { case (s, i) =>
      val bytes = i.getBytes
      bb.putDouble(s); bb.putInt(bytes.length); bb.put(bytes)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, UTF8String)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var j = 0
    while (j < n) {
      val s = bb.getDouble
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      buf.enqueue((s, UTF8String.fromBytes(b)))
      j += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScoreString =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScoreString =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKByScoreString =
    copy(score = newChildren(0), id = newChildren(1))
}

object TopKAgg {
  import org.apache.spark.sql.graftbridge.ExprBridge.{toColumn => column, toExpression => expression}

  /** array<struct<score,id>> of the k largest scores (ties → smallest id).
    * Score is cast to double and id to long — the buffer's fixed physical
    * types — so any numeric input column works. */
  def topK(score: Column, id: Column, k: Int): Column =
    column(TopKByScore(expression(score.cast("double")), expression(id.cast("long")), k)
      .toAggregateExpression())

  /** The ranked-unfold companion: per `group`, the k best (score, id)
    * pairs as rows (group, rk 1-based, id, score). The aggregate keeps an
    * O(k) heap per map task and ships ≤ k entries per task through an
    * ordinary partial+final HashAggregate — never a per-group window over
    * the group's full candidate set. Rows with a NULL score or NULL id are
    * excluded — no rankable information / no addressable result (a group
    * with only such rows emits nothing). */
  def rankTopK(df: org.apache.spark.sql.DataFrame, group: Column, score: Column,
               id: Column, k: Int): org.apache.spark.sql.DataFrame =
    rankedUnfold(df, group, topK(score, id, k))

  /** [[topK]] for string-typed ids (terms, URLs, digests). */
  def topKString(score: Column, id: Column, k: Int): Column =
    column(TopKByScoreString(expression(score.cast("double")), expression(id.cast("string")), k)
      .toAggregateExpression())

  /** [[rankTopK]] for string-typed ids. */
  def rankTopKString(df: org.apache.spark.sql.DataFrame, group: Column, score: Column,
                     id: Column, k: Int): org.apache.spark.sql.DataFrame =
    rankedUnfold(df, group, topKString(score, id, k))

  private def rankedUnfold(df: org.apache.spark.sql.DataFrame, group: Column,
                           agg: Column): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, posexplode}
    df.groupBy(group.as("group"))
      .agg(agg.as("__top"))
      .select(col("group"), posexplode(col("__top")).as(Seq("__pos", "__e")))
      .select(col("group"), (col("__pos") + 1).cast("long").as("rk"),
        col("__e.id").as("id"), col("__e.score").as("score"))
  }
}
