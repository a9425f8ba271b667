package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution drift between two corpus snapshots — the data-quality
  * gate a recurring 100 TB ingest needs before a new crawl/dump is allowed
  * into the training mix: per-category Population Stability Index (PSI)
  * over any discrete feature (language, source, quality bucket, …).
  *
  *   PSI = Σ_buckets (p_new − p_ref) × ln(p_new / p_ref)
  *
  * with the standard ε-floor on empty buckets so appearing/vanishing
  * categories contribute a large-but-finite term. Rule of thumb:
  * PSI < 0.1 stable, 0.1–0.25 drifting, > 0.25 broken.
  *
  * Scale shape: ONE aggregation per snapshot (map-side combined counts on
  * the bucket key), a tiny full-outer join of the two bucket tables
  * (rows = #categories), and a scalar fold — the snapshots are never
  * joined row-to-row, so the cost is two scans no matter how large either
  * side is.
  */
object Drift {

  /** Per-bucket drift table: (bucket, p_ref, p_new, psi_term), ε-floored.
    * All ratios are exact integer-count divisions rounded to 6 dp before
    * the logarithm, pinning cross-engine determinism. A NULL category is
    * a real bucket: the two sides join null-safely, so null-in-both
    * counts as one matched bucket, never as a vanished + appeared pair
    * (which would inflate a zero-drift PSI past the alarm threshold). */
  def psiByBucket(ref: DataFrame, newer: DataFrame, bucket: Column,
                  eps: Double = 1e-4): DataFrame = {
    def dist(df: DataFrame, bCol: String, pCol: String) = {
      val counts = df.select(bucket.cast("string").as(bCol))
        .groupBy(bCol).agg(count(lit(1)).as("__c"))
      counts.crossJoin(broadcast(counts.agg(sum(col("__c")).as("__t"))))
        .select(col(bCol),
          round(col("__c").cast("double") / col("__t"), 6).as(pCol))
    }
    dist(ref, "__b_ref", "p_ref")
      .join(dist(newer, "__b_new", "p_new"), col("__b_ref") <=> col("__b_new"), "full_outer")
      .select(coalesce(col("__b_ref"), col("__b_new")).as("bucket"),
        coalesce(col("p_ref"), lit(0.0)).as("p_ref"),
        coalesce(col("p_new"), lit(0.0)).as("p_new"))
      .withColumn("psi_term",
        round((greatest(col("p_new"), lit(eps)) - greatest(col("p_ref"), lit(eps))) *
          log(greatest(col("p_new"), lit(eps)) / greatest(col("p_ref"), lit(eps))), 6))
  }

  /** The scalar gate: total PSI over the feature. Terms are summed in
    * fixed-point micro-units (exact long arithmetic — a float sum over
    * buckets would be merge-order-dependent in the last ulp). */
  def psi(ref: DataFrame, newer: DataFrame, bucket: Column,
          eps: Double = 1e-4): DataFrame =
    psiByBucket(ref, newer, bucket, eps)
      .agg((sum(round(col("psi_term") * 1e6, 0).cast("long")) / 1e6).as("psi"))
}
