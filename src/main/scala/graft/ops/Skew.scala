package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys at scale. AQE's skew-join splitting handles
  * most cases at runtime; these are the explicit, planner-independent tools
  * for when a handful of keys dominate a shuffle.
  *
  * Semantically invisible: salting only changes the partitioning of
  * intermediate state, never results — which is what makes the operators
  * oracle-checkable against plain SQL.
  */
object Skew {

  /** Two-phase salted aggregation: groupBy(keys ++ salt) partial → drop the
    * salt → final groupBy(keys). The hot key's partial state is spread over
    * `saltBuckets` reducers; the second shuffle carries only
    * #distinct-keys × saltBuckets rows. Aggregates must be decomposable
    * (sum/count/min/max — pass the partial→final mapping explicitly).
    */
  def saltedAgg(df: DataFrame, keys: Seq[Column], saltBuckets: Int)(
      partial: Seq[Column], finalAgg: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt", pmod(monotonically_increasing_id(), lit(saltBuckets)))
    salted.groupBy(keys :+ col("__salt"): _*)
      .agg(partial.head, partial.tail: _*)
      .groupBy(keys: _*)
      .agg(finalAgg.head, finalAgg.tail: _*)
  }

  /** Salted sum/count (the common case): exact results, skew-proof. */
  def saltedSumCount(df: DataFrame, keys: Seq[Column], value: Column,
                     saltBuckets: Int = 32): DataFrame =
    saltedAgg(df, keys, saltBuckets)(
      Seq(sum(value).as("__psum"), count(lit(1)).as("__pcnt")),
      Seq(sum(col("__psum")).as("sum_value"), sum(col("__pcnt")).as("n_rows")))

  /** Skewed-join salting: replicate the small side `saltBuckets` times with
    * an explicit salt column, salt the big side randomly-but-deterministically,
    * and join on (key, salt). Each hot key spreads over `saltBuckets` tasks.
    * Exact join semantics for equi-joins (every big-side row still meets its
    * small-side match exactly once).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 saltBuckets: Int = 8): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(saltBuckets)))
    val replicatedSmall = small
      .withColumn("__salt", explode(sequence(lit(0L), lit(saltBuckets - 1L))))
    saltedBig.join(replicatedSmall, Seq(key, "__salt")).drop("__salt")
  }
}
