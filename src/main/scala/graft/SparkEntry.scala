package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The operator inventory lives in graft.queries.{CoreQueries, ExtQueries};
  * this object only adapts it to the harness shape.
  */
object SparkEntry {
  /** Flagship query (SURVEY §7.3 "hourly demand") on sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_hourly_demand")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 (+ extensions). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Registry.queries

  /** DuckDB-equivalent ANSI SQL per query (omitted for approximate /
    * hash-function-specific operators → rows-only driver check). */
  def oracleSql: Map[String, String] =
    graft.queries.Registry.oracleSql
}
