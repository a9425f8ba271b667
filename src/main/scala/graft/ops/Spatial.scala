package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Planar radius self-join: all point pairs within Euclidean distance `r`,
  * without the all-pairs cross join. Points land in an `r × r` grid; a
  * pair within `r` necessarily sits in the same or an adjacent cell, so
  * candidate generation is a 9-cell-offset EQUI-join (shuffle on cell id)
  * and the exact `dist² ≤ r²` test runs only on co-cell candidates. With
  * cell size = radius, expected candidates per point is ~9·ρr² — constant
  * when the radius tracks density (see [[adaptiveGridRadiusSelfJoin]]) —
  * so output and work stay LINEAR in points at every SF.
  *
  * All-integer coordinates and distances: `dist²` in long arithmetic, no
  * float comparisons to disagree across engines at the boundary.
  */
object Spatial {

  /** Radius self-join with the radius derived from the point count so the
    * expected neighborhood size is scale-free:
    * `r = 2 · ⌊extent / ⌈√n⌉⌋` over an `extent × extent` plane (then
    * ρr² = 4·extent²/n · n/extent² = 4, ~12 expected neighbors). Both the
    * count and the division are exact integer/IEEE ops, reproducible in
    * SQL as `2*(extent // CAST(ceil(sqrt(n)) AS BIGINT))`.
    *
    * `pts` columns `id` (unique long), `x`, `y` (longs in [0, extent)).
    * Output: `id_a < id_b`, `dist2 = (Δx)² + (Δy)²`, plus `rad` — each
    * qualifying pair exactly once (a pair's cell delta is a single
    * (dx, dy) ∈ {−1,0,1}², so the 9-way expansion cannot duplicate it). */
  def adaptiveGridRadiusSelfJoin(pts: DataFrame, id: Column, x: Column,
                                 y: Column, extent: Long = 65536L): DataFrame = {
    val p = pts.select(id.as("id"), x.as("x"), y.as("y"))
    val radDf = p.agg(count(lit(1)).as("__n"))
      .select((lit(2L) * floor(lit(extent).cast("double") /
        ceil(sqrt(col("__n").cast("double")))).cast("long")).as("rad"))
    // rad rides along as a broadcast one-row frame: no driver action, the
    // plan stays lazy and the scan isn't run twice for a scalar
    val cells = p.crossJoin(broadcast(radDf))
      .withColumn("cx", floor(col("x") / col("rad")).cast("long"))
      .withColumn("cy", floor(col("y") / col("rad")).cast("long"))
    val aSide = cells
      .select(col("id").as("id_a"), col("x").as("xa"), col("y").as("ya"),
        col("cx"), col("cy"), col("rad"))
      .withColumn("dx", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("dy", explode(array(lit(-1L), lit(0L), lit(1L))))
    val bSide = cells
      .select(col("id").as("id_b"), col("x").as("xb"), col("y").as("yb"),
        col("cx").as("bcx"), col("cy").as("bcy"))
    val dist2 = (col("xa") - col("xb")) * (col("xa") - col("xb")) +
      (col("ya") - col("yb")) * (col("ya") - col("yb"))
    aSide.join(bSide,
        col("cx") + col("dx") === col("bcx") &&
        col("cy") + col("dy") === col("bcy"))
      .filter(col("id_a") < col("id_b") &&
        dist2 <= col("rad") * col("rad"))
      .select(col("id_a"), col("id_b"), dist2.as("dist2"))
  }
}
