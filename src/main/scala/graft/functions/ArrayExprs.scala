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

  import org.apache.spark.sql.graftbridge.ExprBridge.{toColumn => column, toExpression => expression}
  def lowerBoundCount(value: Column, sortedBounds: Column): Column =
    column(LowerBoundCount(expression(value.cast("double")),
      expression(sortedBounds.cast("array<double>"))))
}
