package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dump x66's INNER plan (materialize = false — the declared query hides
  * the dataflow behind its localCheckpoint) to
  * `plans/r17/x66_exact_substr_inner_<suffix>.txt`. */
object ProbeX66 {
  def main(args: Array[String]): Unit = {
    val suffix = args.headOption.getOrElse("now")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val plan = graft.ext.ExactSubstr.removeRepeatedSpans(
        graft.Tables.documents(spark, sfDir), col("doc_id"), col("text"),
        k = 8, materialize = false)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get("plans/r17"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"plans/r17/x66_exact_substr_inner_$suffix.txt"), plan)
    println(s"[probe] wrote plans/r17/x66_exact_substr_inner_$suffix.txt")
    spark.stop()
  }
}
