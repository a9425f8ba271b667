package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway diagnostic for the r7→r8 sf0.1 slowdown cluster: measure a
  * CPU-heavy first-stage query (q08's exact group median) against (a) the
  * driver's single-file single-ROW-GROUP lineitem as-is, and (b) the same
  * rows rewritten as 32 parquet files — parquet scans parallelize only at
  * row-group boundaries, so (a) decodes 600k rows on ONE core while (b)
  * spreads them across the machine. The ratio is the slowdown mechanism.
  * Delete after BASELINE.md records the numbers.
  */
object ScanProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect() // warmup

    def q08(src: org.apache.spark.sql.DataFrame) =
      src.groupBy("l_returnflag")
        .agg(percentile(col("l_quantity"), lit(0.5)).as("med_qty"),
          percentile(col("l_extendedprice"), lit(0.5)).as("med_price"))

    def time(label: String)(fn: => Unit): Double = {
      val t0 = System.nanoTime(); fn; val s = (System.nanoTime() - t0) / 1e9
      println(f"SCANPROBE $label%-14s $s%8.3f s"); s
    }

    val single = spark.read.parquet(s"$dir/lineitem.parquet")
    val multi = "/tmp/scanprobe_lineitem32"
    single.repartition(32).write.mode("overwrite").parquet(multi)
    val spread = spark.read.parquet(multi)
    // two timed runs each, interleaved; min is the number
    val a = (1 to 2).map(_ => time("single-rg")(q08(single).collect())).min
    val b = (1 to 2).map(_ => time("32-files")(q08(spread).collect())).min
    println(f"SCANPROBE ratio ${a / b}%.2f  single=$a%.3f multi=$b%.3f " +
      s"tasks_single=${single.rdd.getNumPartitions} tasks_multi=${spread.rdd.getNumPartitions}")
    spark.stop()
  }
}
