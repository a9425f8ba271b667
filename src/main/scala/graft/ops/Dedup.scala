package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators (SURVEY §2.4) plus the set-membership anti-join
  * (§2.3 J1).
  */
object Dedup {

  /** DD1 — argmax dedup (`data_processing.py:212-224`): per `keys`, keep the
    * single row maximizing `ord` (ties broken by `tieBreak` for
    * determinism — the reference iterates dict-ordered, we pin an explicit
    * total order). One shuffle on `keys`; whole-stage-codegen window.
    */
  def latestPerKey(df: DataFrame, keys: Seq[Column], ord: Column, tieBreak: Column*): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy((ord.desc +: tieBreak.map(_.desc)): _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** DD2 — exact full-row dedup (`DP:116-121`); null-safe like pandas
    * `drop_duplicates`. Keeps an arbitrary row of each duplicate class
    * (SURVEY §7.5.8) — invisible for full-row dedup.
    */
  def exact(df: DataFrame): DataFrame = df.dropDuplicates()

  /** DD2 keyed variant with deterministic retention: keep min(`order`) row. */
  def exactByKey(df: DataFrame, keys: Seq[Column], keep: Column): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(keep.asc)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** J1 — idempotency anti-join (`DP:342-345`): rows of `left` whose key has
    * no match in `right`. `right` is auto-broadcast when small; force it for
    * the tracker-sized case.
    */
  def antiJoin(left: DataFrame, right: DataFrame, cond: Column, broadcastRight: Boolean = true): DataFrame =
    left.join(if (broadcastRight) broadcast(right) else right, cond, "left_anti")

  def semiJoin(left: DataFrame, right: DataFrame, cond: Column): DataFrame =
    left.join(right, cond, "left_semi")

  /** Fuzzy record-linkage self-join at edit distance ≤ 1 — the FastSS
    * deletion-neighborhood rule (Bocek, Hunt & Stiller 2007, "Fast
    * Similarity Search in Large Dictionaries"): if ed(A,B) ≤ 1 then
    * {A} ∪ del1(A) intersects {B} ∪ del1(B), where del1 is the set of
    * single-character deletions — a substitution deletes the differing
    * position from both sides, an insertion/deletion makes the shorter
    * string itself a variant of the longer, equality matches on self. An
    * equi-join on deletion variants is therefore a COMPLETE candidate
    * generator (recall 1 by theorem), and the built-in `levenshtein`
    * verifies candidates exactly. Returns (id_a, id_b, dist) with
    * id_a < id_b and dist ∈ {0, 1}.
    *
    * Scale shape: |s|+1 variant rows per record, one equi-join on the
    * variant string, verification only on candidates — never all pairs.
    * Per-key fan-out is bounded by how many records share a variant
    * (~alphabet size for id-like strings); a corpus where millions of
    * records share one NAME is a caller-side duplicate explosion, not a
    * join problem (the output itself is quadratic there). The variant
    * HOF is interpreted, not codegen'd — acceptable for the
    * dimension-table cardinalities record linkage runs at; lift to a
    * native expression if it ever feeds a fact-table-sized scan. */
  def editDistanceOnePairs(df: DataFrame, id: Column, str: Column): DataFrame = {
    val base = df.select(id.as("__id"), str.as("__s"))
    val s = col("__s")
    val dels = transform(sequence(lit(1), length(s)),
      i => concat(s.substr(lit(1), i - 1), s.substr(i + 1, length(s))))
    // join + dedup on a 64-bit variant HASH and bare ids — variant
    // strings and record strings stay out of the wide shuffles (a
    // collision only adds a candidate; the exact verify decides). The
    // first formulation carried both name strings through the pair
    // distinct and was 10× the volume for nothing.
    val v = base
      .withColumn("__v", explode(array_union(array(s), dels)))
      .select(col("__id"), xxhash64(col("__v")).as("__vh"), length(s).as("__len"))
    val cands = v.as("a").join(v.as("b"),
        col("a.__vh") === col("b.__vh") && col("a.__id") < col("b.__id") &&
          abs(col("a.__len") - col("b.__len")) <= 1)
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"))
      .distinct() // a pair can collide on several variants (all |s|+1 for exact dups)
    cands
      .join(base.select(col("__id").as("id_a"), col("__s").as("__sa")), "id_a")
      .join(base.select(col("__id").as("id_b"), col("__s").as("__sb")), "id_b")
      // threshold-bounded levenshtein: O(|s|) band, early exit past 1
      .withColumn("dist", levenshtein(col("__sa"), col("__sb"), 1).cast("long"))
      .filter(col("dist") >= 0 && col("dist") <= 1)
      .select(col("id_a"), col("id_b"), col("dist"))
  }
}
