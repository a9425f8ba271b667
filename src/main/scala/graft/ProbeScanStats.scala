package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway diagnostic (the ProbeMor pattern): SQL-scan PLANNING cost as
  * the live-file count grows — the zone-map verdict evaluation in
  * [[graft.sql.GraftRelation.buildScan]] runs on the DRIVER below
  * `spark.graft.scan.statsDistributeThreshold` and as a Spark job over
  * the manifests above it. This measures both paths at file counts 100×
  * apart, so the crossover (and the flat-driver claim for the
  * distributed path) is a number, not an assertion.
  *
  *   sbt "runMain graft.ProbeScanStats [nSmall] [nBig]"
  */
object ProbeScanStats {
  def main(args: Array[String]): Unit = {
    val nSmall = args.lift(0).map(_.toInt).getOrElse(64)
    val nBig = args.lift(1).map(_.toInt).getOrElse(6400)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.io.Snapshots

    def stage(n: Int): String = {
      val tmp = java.nio.file.Files.createTempDirectory(s"graft_pss_$n").toString
      val tbl = s"$tmp/tbl"
      // n range-clustered files in ONE commit, id zone maps per file
      Snapshots.commitAppend(
        spark.range(n * 200L).select(col("id"), (col("id") * 2).as("m"))
          .repartitionByRange(n, col("id")),
        tbl, recordSchema = true, statsCols = Seq("id"))
      val cat = s"pss_${tbl.hashCode.toHexString.takeRight(8)}"
      spark.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
      spark.conf.set(s"spark.sql.catalog.$cat.root", tmp)
      cat
    }

    def time(cat: String, threshold: Int, reps: Int): (Double, Int) = {
      spark.conf.set("spark.graft.scan.statsDistributeThreshold", threshold.toString)
      var kept = 0
      val t0 = System.nanoTime()
      (0 until reps).foreach { i =>
        graft.sql.GraftScanInfo.last = None
        spark.sql(s"SELECT sum(m) FROM $cat.tbl WHERE id BETWEEN ${i * 10} AND ${i * 10 + 99}")
          .collect()
        kept = graft.sql.GraftScanInfo.last.get.candidates
      }
      ((System.nanoTime() - t0) / 1e6 / reps, kept)
    }

    val out = Seq(nSmall, nBig).map { n =>
      val cat = stage(n)
      val (driverMs, k1) = time(cat, Int.MaxValue, 5) // always driver
      val (distMs, k2) = time(cat, 1, 5)              // always distributed
      require(k1 == k2, s"paths disagree at n=$n: $k1 vs $k2")
      s""""n$n":{"files":$n,"driver_ms":${driverMs.round},"distributed_ms":${distMs.round},"kept":$k1}"""
    }
    println(s"""{"metric":"scan_stats_paths",${out.mkString(",")}}""")
    spark.stop()
  }
}
