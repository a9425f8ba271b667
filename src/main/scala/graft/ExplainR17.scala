package graft

import org.apache.spark.sql.SparkSession

/** Dump the FULL formatted physical plan of named queries to
  * `plans/r17/<name>_<suffix>.txt` under the bench session config —
  * the optimization round's before/after plan evidence.
  * Usage: `runMain graft.ExplainR17 <suffix> <query> [<query> …]`. */
object ExplainR17 {
  def main(args: Array[String]): Unit = {
    val suffix = args.head
    val names = args.tail
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.sql.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get("plans/r17"))
    for (name <- names) {
      try {
        val plan = graft.queries.Registry.queries(name)(spark, sfDir)
          .queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"plans/r17/${name}_$suffix.txt"), plan)
        println(s"[explain] wrote plans/r17/${name}_$suffix.txt")
      } catch {
        case scala.util.control.NonFatal(e) =>
          println(s"[explain] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
