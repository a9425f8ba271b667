package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures what manifest statistics BUY at join planning time — the
  * x144 join shape, same data, two plans:
  *
  *  - `bcast`: the default path. [[graft.sql.GraftScan]] reports
  *    pruned-candidate byte sums through `SupportsReportStatistics`
  *    (carried across the V1 wrapper by StatsShim), the dim side sizes
  *    in KB, and the planner picks BroadcastHashJoin — the fact side
  *    never shuffles.
  *  - `smj`: the counterfactual. `autoBroadcastJoinThreshold = -1`
  *    reproduces exactly the plan every DSv2 V1-fallback relation got
  *    BEFORE this repo forwarded statistics (defaultSizeInBytes ≈ 8 EiB
  *    → never auto-broadcast): SortMergeJoin, both sides shuffled.
  *
  * Prints one JSON line with min-of-N seconds per variant and the
  * plan assertions that make the comparison honest. The gap grows with
  * the fact side — at 100 TB it is the whole job. */
object ProbeJoinStats {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("benchdata/sf10")
    val runs = args.lift(1).map(_.toInt).getOrElse(2)
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

    val tmp = java.nio.file.Files.createTempDirectory("graft_probejoin").toString
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("n_chars").cast("long").as("n_chars"))
    graft.io.Snapshots.commitAppend(docs, s"$tmp/fact", recordSchema = true,
      recordRowCounts = true)
    graft.io.Snapshots.commitAppend(
      docs.select(col("source")).distinct()
        .withColumn("category", concat(lit("cat_"), col("source"))).coalesce(1),
      s"$tmp/dim", recordSchema = true)
    spark.conf.set("spark.sql.catalog.pjs", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.pjs.root", tmp)
    val sql = """SELECT d.category, count(*) AS n, CAST(sum(f.n_chars) AS BIGINT) AS c
                 FROM pjs.fact f JOIN pjs.dim d ON f.source = d.source
                 GROUP BY d.category"""

    // wall-clock AND shuffle write bytes per variant: at local[32] a
    // "shuffle" is a memory copy, so seconds alone cannot show what a
    // network shuffle of the fact side costs on a real cluster — bytes
    // written to shuffle are the transferable number (SMJ writes the
    // whole fact projection; broadcast writes only the agg partials)
    val shuffled = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        shuffled.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })
    def time(label: String, expectPlan: String): (Double, Long) = {
      var best = Double.MaxValue
      var bytes = 0L
      (0 until runs).foreach { _ =>
        val q = spark.sql(sql)
        val plan = q.queryExecution.executedPlan.toString
        require(plan.contains(expectPlan), s"$label expected $expectPlan:\n$plan")
        shuffled.set(0L)
        val t0 = System.nanoTime()
        q.collect()
        val dt = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300) // listener bus drain — metrics only, outside the timing
        best = math.min(best, dt)
        bytes = shuffled.get()
      }
      (best, bytes)
    }

    val (bcast, bcastBytes) = time("bcast", "BroadcastHashJoin")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val (smj, smjBytes) = time("smj", "SortMergeJoin")
    println(f"""{"probe":"join_stats","sf":"$sfDir","bcast_s":$bcast%.3f,""" +
      f""""smj_s":$smj%.3f,"time_ratio":${smj / bcast}%.2f,""" +
      f""""bcast_shuffle_bytes":$bcastBytes,"smj_shuffle_bytes":$smjBytes,""" +
      f""""shuffle_ratio":${smjBytes.toDouble / math.max(bcastBytes, 1)}%.1f,"runs":$runs}""")
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    // SKEWED-KEY JOIN OUTPUT ESTIMATE (the x177 shape): a 95/5 band fact
    // joined to a rare-bands dim. NDV-uniform join estimation prices the
    // output as rows×rows/ndv; with histograms on BOTH key columns
    // Spark's JoinEstimation switches to per-bin overlap arithmetic and
    // the rare-band join prices at its real share — the estimate that
    // decides whether the join RESULT broadcasts downstream.
    val fact2 = docs.select(
      col("doc_id"),
      when(pmod(col("doc_id"), lit(20)) =!= 19, lit(0L))
        .otherwise(floor(pmod(col("doc_id"), lit(380)) / 20) + 1)
        .cast("long").as("band"),
      col("n_chars"))
    graft.io.Snapshots.commitAppend(fact2.repartition(8), s"$tmp/sfact",
      recordSchema = true, recordRowCounts = true)
    graft.io.Snapshots.commitAppend(
      fact2.filter(col("band") >= 10).select(col("band")).distinct().coalesce(1),
      s"$tmp/srdim", recordSchema = true, recordRowCounts = true)
    val trueJ = fact2.filter(col("band") >= 10).count()
    val innerSql = """SELECT f.doc_id, f.n_chars
                      FROM pjs.sfact f JOIN pjs.srdim d ON f.band = d.band"""
    def jEst(): BigInt = spark.sql(innerSql).queryExecution.optimizedPlan
      .stats.rowCount.getOrElse(BigInt(-1))
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.sql("CALL pjs.system.analyze('sfact', 'band,n_chars')")
    spark.sql("CALL pjs.system.analyze('srdim', 'band')")
    val estNdv = jEst()
    val t0h = System.nanoTime()
    spark.sql("CALL pjs.system.analyze('sfact', 'band,n_chars', 64)")
    spark.sql("CALL pjs.system.analyze('srdim', 'band', 64)")
    val analyzeHistS = (System.nanoTime() - t0h) / 1e9
    val estHist = jEst()
    spark.conf.set("spark.sql.cbo.enabled", "false")
    println(f"""{"probe":"join_stats_skew","sf":"$sfDir","true_join":$trueJ,""" +
      f""""est_ndv":$estNdv,"est_hist":$estHist,""" +
      f""""ndv_over":${estNdv.toDouble / trueJ}%.1f,""" +
      f""""hist_over":${estHist.toDouble / trueJ}%.2f,""" +
      f""""analyze_hist_s":$analyzeHistS%.2f}""")
    spark.stop()
  }
}
