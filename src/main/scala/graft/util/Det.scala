package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Determinism helpers for cross-engine (Spark ↔ DuckDB oracle) value
  * parity.
  *
  * Floating-point SUM/AVG over a shuffled dataset is order-dependent; two
  * engines (or two runs) can differ in the last ulp, which breaks
  * hash-comparison after `round(·, 2)` whenever a group total lands near a
  * half-cent boundary. We therefore aggregate "money-like" doubles in
  * fixed-point: round each value to integer cents first (exact long
  * arithmetic from then on), and divide back at the end. The division of an
  * exact long by 100.0 is a single IEEE op → bit-identical everywhere.
  *
  * The DuckDB-side equivalent of `moneySum(c)` is
  * `sum(CAST(round(c * 100) AS BIGINT)) / 100.0`.
  */
object Det {
  /** Exact fixed-point (cents) sum of a double column. */
  def centsSum(c: Column): Column = sum(round(c * 100, 0).cast("long"))

  /** Order-independent deterministic sum of a money-like double column. */
  def moneySum(c: Column): Column = centsSum(c) / 100.0

  /** Order-independent deterministic mean at 1e-4 precision.
    *
    * `round(double, n)` itself diverges between engines at representation
    * boundaries (Spark uses BigDecimal-of-the-exact-binary-expansion,
    * DuckDB scales in float math), so the half-up rounding is done in exact
    * integer arithmetic instead: e4 = ⌊(cents·100 + n/2) / n⌋, emitted as
    * e4 / 10⁴. The double division is exact while the numerator < 2⁵³
    * (~9e15 cents·100 — fine below ~90 T$ per group).
    * DuckDB equivalent: floor((sum_cents*100 + count(*)//2)/count(*))/10000.0
    */
  def moneyAvg(c: Column, scale: Int = 4): Column = {
    require(scale == 4, "fixed 1e-4 grid; widen Det if another scale is needed")
    floor((centsSum(c) * 100 + shiftright(n, 1)).cast("double") / n) / 10000.0
  }

  /** count(*) as BIGINT (matches DuckDB count(*) type). */
  def n: Column = count(lit(1))
}
