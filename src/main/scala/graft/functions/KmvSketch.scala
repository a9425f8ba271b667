package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** KMV (k-minimum-values) DISTINCT-VALUE SAMPLE as a real aggregate.
  *
  * Keeps the k distinct input values whose 64-bit hashes are smallest —
  * a uniform random sample of the column's DISTINCT values (not its
  * rows: duplicates hash identically and occupy one slot). That is the
  * primitive a single-pass equi-height histogram needs: per-bin distinct
  * counts for boundaries that are only known AFTER the pass, answered
  * from the sketch at the driver — `ndv_bin ≈ ndv_total × |sample ∩
  * bin| / |sample|`, and EXACT whenever the column's NDV ≤ k (the
  * sketch then holds every distinct value). The alternative — one
  * range-conditioned HLL per (column, bin) in a second O(rows) pass —
  * was the measured 3–9× ANALYZE overhead this replaces
  * ([[graft.io.ColStats.analyze]]).
  *
  * Scale shape: the buffer is O(k) on every map task, partial
  * aggregation ships ≤ k (hash, value) pairs per task, and the merge is
  * a bounded union — the ordinary two-phase aggregate, never a distinct
  * shuffle. Nulls are skipped (histograms describe non-null values). */
case class KmvValues(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeMap[Long, Double]] {

  require(k > 0, "KMV sketch requires k > 0")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_values"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def createAggregationBuffer(): java.util.TreeMap[Long, Double] =
    new java.util.TreeMap[Long, Double]()

  private def offer(buf: java.util.TreeMap[Long, Double],
                    h: Long, v: Double): Unit = {
    if (buf.size < k) buf.put(h, v)
    else if (h < buf.lastKey()) { buf.put(h, v); buf.remove(buf.lastKey()) }
  }

  // TypedImperativeAggregate.update runs outside whole-stage codegen; a
  // compiled projection evaluates the (possibly composite) child once per
  // row instead of walking its tree interpreted (the TopKAgg pattern)
  @transient private lazy val inputProj =
    org.apache.spark.sql.catalyst.expressions.UnsafeProjection.create(Seq(child))

  override def update(buf: java.util.TreeMap[Long, Double],
                      input: InternalRow): java.util.TreeMap[Long, Double] = {
    val row = inputProj(input)
    if (!row.isNullAt(0)) {
      val v = row.getDouble(0)
      // canonicalize so 0.0 / -0.0 (and any NaN payload) hash identically
      val bits = java.lang.Double.doubleToLongBits(v + 0.0)
      offer(buf, XxHash64Function.hash(bits, LongType, 42L), v)
    }
    buf
  }

  override def merge(buf: java.util.TreeMap[Long, Double],
                     other: java.util.TreeMap[Long, Double]): java.util.TreeMap[Long, Double] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      offer(buf, e.getKey, e.getValue)
    }
    buf
  }

  override def eval(buf: java.util.TreeMap[Long, Double]): Any =
    new GenericArrayData(buf.values().toArray(Array.empty[java.lang.Double])
      .map(_.doubleValue(): Any))

  override def serialize(buf: java.util.TreeMap[Long, Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putLong(e.getKey); bb.putDouble(e.getValue)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeMap[Long, Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var j = 0
    while (j < n) { buf.put(bb.getLong, bb.getDouble); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvValues =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvValues =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): KmvValues =
    copy(child = newChildren(0))
}

object KmvSketch {
  import org.apache.spark.sql.graftbridge.ExprBridge.{toColumn => column, toExpression => expression}

  /** array<double> of (up to) k distinct values sampled uniformly by
    * hash. Input is cast to double — the estimator-numeric image every
    * histogram column already uses. */
  def kmvValues(c: Column, k: Int): Column =
    column(KmvValues(expression(c.cast("double")), k).toAggregateExpression())
}
