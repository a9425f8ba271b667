package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Order-independent dataset content digest: one number that changes iff
  * the dataset's ROWS change — the cheap answer to "is this re-delivered
  * dump byte-for-byte the same data?" before any expensive diff
  * ([[Reconcile]]) runs. Per row, the first 60 bits of md5 over a
  * canonical field encoding; rows COMBINE BY SUM (exact decimal), so the
  * digest is independent of partitioning, ordering, and merge order —
  * and computable by any engine with md5 (the DuckDB oracle runs the
  * identical formula).
  *
  * One aggregation pass, map-side combined. Multiset semantics: duplicate
  * rows each count (a sum, not an xor — xor would cancel even-multiplicity
  * rows). Collision posture: 60-bit hashes summed over n rows — detecting
  * a k-row difference fails with probability ~2^-60 per differing row;
  * fine as a change detector, not a cryptographic commitment.
  *
  * Canonical encoding: fields cast to string, null → empty string, joined
  * with the \u001f unit separator (so ("ab","c") ≠ ("a","bc")); pass
  * integer/string/date columns (float FORMATTING differs across engines —
  * cast money to integer cents upstream if it must participate).
  */
object Digest {

  def rowHash(fields: Seq[Column]): Column = {
    require(fields.nonEmpty,
      "digest over zero fields would reduce to a row counter — content " +
        "changes at constant row count would pass undetected")
    conv(substring(md5(
      concat_ws("\u001f", fields.map(c => coalesce(c.cast("string"), lit(""))): _*)
        .cast("binary")), 1, 15), 16, 10).cast("decimal(38,0)")
  }

  /** (n_rows, digest) — the dataset fingerprint. */
  def datasetDigest(df: DataFrame, fields: Seq[Column]): DataFrame =
    df.agg(count(lit(1)).as("n_rows"),
      sum(rowHash(fields)).cast("decimal(38,0)").as("digest"))
}
