package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Probabilistic-membership expression over Spark's own
  * `util.sketch.BloomFilter` (the `df.stat.bloomFilter` sketch). The filter
  * rides a BROADCAST handle, not the expression tree: a bloom sized for
  * 1e8+ history keys is tens of MB — embedded in the plan it would be
  * re-shipped with every task binary; broadcast, executors fetch it once.
  *
  * No false negatives ever: `mightContain = false` is PROOF the key was
  * never added — the property incremental dedup builds on.
  */
object SketchExprs {

  /** true iff the bloom might contain the (string) child value. Matches
    * `DataFrameStatFunctions.bloomFilter` hashing for string columns. */
  case class BloomMightContainString(child: Expression, bloom: Broadcast[BloomFilter])
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = BooleanType
    override def prettyName: String = "bloom_might_contain"
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain needs STRING input, got ${child.dataType.catalogString}")

    override protected def nullSafeEval(input: Any): Any =
      bloom.value.mightContainString(input.asInstanceOf[UTF8String].toString)

    override protected def withNewChildInternal(newChild: Expression): BloomMightContainString =
      copy(child = newChild)
  }

  def mightContain(key: Column, bloom: Broadcast[BloomFilter]): Column = {
    import org.apache.spark.sql.graftbridge.ExprBridge.{toColumn, toExpression}
    toColumn(BloomMightContainString(toExpression(key.cast("string")), bloom))
  }

  /** true iff a SERIALIZED bloom (binary child, `BloomFilter.writeTo`
    * bytes) might contain ANY of the probe strings. The file-index probe
    * shape ([[graft.io.Snapshots.readPoint]]): evaluated once per INDEX
    * ROW (one row = one data file's bloom), so the per-row deserialization
    * is amortized over the whole file the row prunes — never a hot path.
    * Probes ride the expression as a literal: point lookups carry a
    * handful of keys, not a broadcast-sized set. */
  case class BloomBytesAnyContain(child: Expression, probes: Seq[String])
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = BooleanType
    override def prettyName: String = "bloom_bytes_any_contain"
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (child.dataType == BinaryType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bloom_bytes_any_contain needs BINARY input, got ${child.dataType.catalogString}")

    override protected def nullSafeEval(input: Any): Any = {
      val bf = BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(input.asInstanceOf[Array[Byte]]))
      probes.exists(bf.mightContainString)
    }

    override protected def withNewChildInternal(newChild: Expression): BloomBytesAnyContain =
      copy(child = newChild)
  }

  def bloomAnyContain(bytes: Column, probes: Seq[String]): Column = {
    import org.apache.spark.sql.graftbridge.ExprBridge.{toColumn, toExpression}
    toColumn(BloomBytesAnyContain(toExpression(bytes), probes))
  }
}
