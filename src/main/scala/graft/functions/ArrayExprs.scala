package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Generic compiled array helpers for broadcast-table lookups that would
  * otherwise run as interpreted higher-order functions on the hot path.
  */
object ArrayExprs {

  /** Number of elements of a SORTED double array strictly less than
    * `value` — binary search, O(log n) per row (the HOF
    * `size(filter(bounds, b => b < v))` walks the whole array
    * interpreted). The building block for quantile-bucket ranking:
    * bounds = per-group quantile boundaries, result / buckets =
    * percentile rank. Null value or null bounds → null.
    *
    * Construct ONLY through [[ArrayExprs.lowerBoundCount]] or the SQL
    * registration — both cast the inputs to (double, array<double>);
    * a raw int-array child would make getDouble read bytes at the wrong
    * stride. (`ImplicitCastInputTypes` would declare this in-expression,
    * but its `AbstractDataType` is private[sql] in Spark 4.) */
  case class LowerBoundCount(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = IntegerType
    override def prettyName: String = "lower_bound_count"
    override def nullable: Boolean = true

    /** left = value double, right = sorted array<double>. */
    override protected def nullSafeEval(v: Any, arr: Any): Any = {
      val x = v.asInstanceOf[Double]
      val bounds = arr.asInstanceOf[ArrayData]
      var lo = 0
      var hi = bounds.numElements()
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (bounds.getDouble(mid) < x) lo = mid + 1 else hi = mid
      }
      lo
    }

    override protected def withNewChildrenInternal(l: Expression, r: Expression): LowerBoundCount =
      copy(left = l, right = r)
  }

  /** Concatenate the elements of an `array<binary>` into one binary value
    * with a single length-summing pass and one allocation — O(total bytes).
    * The SQL alternative, `aggregate(arr, X'', (acc, x) -> concat(acc, x))`,
    * re-copies the growing accumulator per element: O(n · total bytes),
    * which turns a linear fixture build quadratic the moment per-group
    * element counts grow with the corpus (`array_join` covers strings but
    * has no binary form). Null elements are skipped (concat-of-present
    * semantics, matching array_join); null array → null.
    *
    * Construct only with BINARY element type ([[binaryConcat]] / the SQL
    * registration check it) — the eval reads elements via getBinary. */
  case class BinaryConcat(child: Expression)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression with CodegenFallback {
    override def dataType: DataType = BinaryType
    override def prettyName: String = "binary_concat"
    override def nullable: Boolean = true
    override def checkInputDataTypes():
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(BinaryType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"binary_concat needs ARRAY<BINARY>, got ${other.catalogString}")
      }

    override protected def nullSafeEval(arr: Any): Any = {
      val a = arr.asInstanceOf[ArrayData]
      val n = a.numElements()
      var total = 0L
      var i = 0
      while (i < n) {
        if (!a.isNullAt(i)) total += a.getBinary(i).length
        i += 1
      }
      if (total > Int.MaxValue) return null // would not fit one array
      val out = new Array[Byte](total.toInt)
      var off = 0
      i = 0
      while (i < n) {
        if (!a.isNullAt(i)) {
          val b = a.getBinary(i)
          System.arraycopy(b, 0, out, off, b.length)
          off += b.length
        }
        i += 1
      }
      out
    }

    override protected def withNewChildInternal(newChild: Expression): BinaryConcat =
      copy(child = newChild)
  }

  import org.apache.spark.sql.graftbridge.ExprBridge.{toColumn => column, toExpression => expression}
  def lowerBoundCount(value: Column, sortedBounds: Column): Column =
    column(LowerBoundCount(expression(value.cast("double")),
      expression(sortedBounds.cast("array<double>"))))
  def binaryConcat(arr: Column): Column =
    column(BinaryConcat(expression(arr.cast("array<binary>"))))
}
