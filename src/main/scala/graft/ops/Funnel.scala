package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered funnel analysis: how many users progress through a sequence of
  * event types, each step strictly after the previous step's instant and
  * within a per-step conversion deadline. The canonical product-analytics
  * query; the streaming st-queries sessionize, this is its batch
  * conversion-attribution counterpart.
  *
  * Stage k is `min(ts)` over events of the k-th type that land in
  * `(t_{k−1}, t_{k−1} + deadline]` for users who reached stage k−1 — the
  * earliest-qualifying-event semantics (a later cheaper path can't
  * retroactively beat an earlier conversion).
  *
  * Plan shape: per stage, one filter over the events scan (pushed to the
  * type column) + one shuffle on the user key for the min-agg and the join
  * with the previous stage's (user, t) frame — every shuffle is on the
  * same key, stage frames only ever shrink, and nothing is collected.
  * Stages are sequential by definition (stage k's predicate reads stage
  * k−1's timestamp), so the k-pass shape is inherent, not an artifact.
  */
object Funnel {

  /** One row per stage: `stage_idx` (1-based), `stage`, `n_users`,
    * `sum_delay_s` (total whole seconds from the previous stage's instant,
    * floor division; 0 for the first stage). */
  def funnelStages(events: DataFrame, user: String, time: String,
                   etype: String, stages: Seq[String],
                   deadlineSec: Long): DataFrame = {
    require(stages.nonEmpty, "need at least one funnel stage")
    val base = events.filter(col(time).isNotNull)
    var cur = base.filter(col(etype) === stages.head)
      .groupBy(user).agg(min(col(time)).as("t"))
      .withColumn("delay_s", lit(0L))
    var out = cur.agg(lit(1L).as("stage_idx"), lit(stages.head).as("stage"),
      count(lit(1)).as("n_users"),
      coalesce(sum(col("delay_s")), lit(0L)).as("sum_delay_s"))
    for ((st, i) <- stages.zipWithIndex.drop(1)) {
      val nxt = base.filter(col(etype) === st)
        .join(cur.select(col(user), col("t").as("__tp")), user)
        .filter(col(time) > col("__tp") &&
          unix_micros(col(time)) - unix_micros(col("__tp")) <=
            lit(deadlineSec) * 1000000L)
        .groupBy(user).agg(min(col(time)).as("t"), max(col("__tp")).as("__tp"))
        .withColumn("delay_s",
          floor((unix_micros(col("t")) - unix_micros(col("__tp"))) /
            lit(1000000.0)).cast("long"))
        .drop("__tp")
      out = out.unionByName(nxt.agg(lit(i + 1L).as("stage_idx"),
        lit(st).as("stage"), count(lit(1)).as("n_users"),
        coalesce(sum(col("delay_s")), lit(0L)).as("sum_delay_s")))
      cur = nxt
    }
    out
  }
}
