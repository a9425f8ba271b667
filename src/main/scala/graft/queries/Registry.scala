package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One demonstrable operator from SURVEY §2 (or a north-star extension):
  * a Spark implementation plus (when SQL-expressible) a DuckDB oracle query
  * producing the identical result on the same parquet tables.
  *
  * Output conventions for exact cross-engine hash parity:
  *   - every output column is STRING, BIGINT, or DOUBLE;
  *   - float aggregates use fixed-point cents (see graft.util.Det);
  *   - every query ends in a total ORDER BY (both sides).
  */
final case class QuerySpec(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Registry {
  def all: Seq[QuerySpec] =
    CoreQueries.all ++ Seq(TaxiE2E.spec, TaxiE2E.jobSpec,
      TaxiE2E.flagsSpec, TaxiE2E.paymentSpec, TaxiE2E.pickupSpec) ++ ExtQueries.all

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** Benchmark set: everything except (a) the deliberately-quadratic exact
    * all-pairs verifiers (x02/x04/x13 exist to oracle-check the LSH/sketch
    * scale paths x03/x06 — brute force is not the operator we'd run at
    * scale, so it isn't the operator we benchmark) and (b) the queries that
    * re-run q26's exact pipeline purely as additional correctness
    * projections of it: st04 (whole-program + file staging + CSV
    * round-trip) and q29/q30/q31 (flag/metric-table projections). q26
    * itself carries the pipeline's bench signal. */
  val quadraticVerifiers: Set[String] =
    Set("x02_neardup_jaccard", "x04_simhash", "x13_cosine_neardup",
      // ANN recall verifiers: x52/x53/x60 re-run the x18/x41/x56 serve
      // paths plus a brute-force top-k purely to pin recall — the benched
      // entries time the persisted-index serve alone, the thing that runs
      // at 100 TB
      "x52_ann_ivf_verify", "x53_pq_ann_verify", "x60_ann_ivf_append_verify",
      "x78_pq_append_verify")
  val pipelineReplays: Set[String] =
    Set("st04_taxi_job", "q29_vendor_flags", "q30_payment_analysis", "q31_pickup_locations")
  val benchExcluded: Set[String] = quadraticVerifiers ++ pipelineReplays
  def benchQueries: Map[String, (SparkSession, String) => DataFrame] =
    all.filterNot(q => benchExcluded(q.name)).map(q => q.name -> q.fn).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
