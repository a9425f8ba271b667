package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Optimization-round profiler (guide §1): runs named bench queries under
  * the bench's exact session config with the noop sink and reports, per
  * query, where the wall-clock went — number of Spark jobs, the sum of job
  * wall times, total task time, shuffle bytes, and the driver-side gap
  * (wall − Σ job wall), which is planning/commit/collect-glue time no
  * executor ever sees. `ProbeQueryJobs q1 q2 …` or no args = top-N from
  * BENCH_REF.json.
  */
object ProbeQueryJobs {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
    spark.sparkContext.setLogLevel("WARN")
    // headroom measurement only: how much of a fixture's wall is AQE
    // per-stage orchestration? (the shipped change is data-conditional)
    if (sys.env.contains("SPARK_GRAFT_PROBE_NOAQE"))
      spark.conf.set("spark.sql.adaptive.enabled", "false")
    sys.env.get("SPARK_GRAFT_PROBE_SHUFFLE").foreach(n =>
      spark.conf.set("spark.sql.shuffle.partitions", n))

    val nJobs = new AtomicInteger(0)
    val jobWallNs = new AtomicLong(0L)
    val taskTimeMs = new AtomicLong(0L)
    val shuffleRead = new AtomicLong(0L)
    val shuffleWrite = new AtomicLong(0L)
    val nTasks = new AtomicInteger(0)
    val nStages = new AtomicInteger(0)
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val inFlight = new AtomicInteger(0)
    // SPARK_GRAFT_PROBE_JOBS=1: per-job trace (callsite + wall) — which
    // ACTIONS a fixture runs, for hunting redundant jobs
    val traceJobs = sys.env.contains("SPARK_GRAFT_PROBE_JOBS")
    val jobSite = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        nJobs.incrementAndGet(); inFlight.incrementAndGet()
        jobStart.put(e.jobId, System.nanoTime())
        if (traceJobs) {
          // the last stage's name carries the action's callsite
          val d = e.stageInfos.lastOption.map(_.name).getOrElse("?")
          jobSite.put(e.jobId, d)
        }
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        inFlight.decrementAndGet()
        val t0 = jobStart.remove(e.jobId)
        if (t0 != null) {
          val ns = System.nanoTime() - t0
          jobWallNs.addAndGet(ns)
          if (traceJobs)
            println(f"    job ${e.jobId}%4d ${ns / 1e9}%7.3f  ${Option(jobSite.remove(e.jobId)).getOrElse("?")}")
        }
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        nStages.incrementAndGet()
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        nTasks.incrementAndGet()
        val m = e.taskMetrics
        if (m != null) {
          taskTimeMs.addAndGet(m.executorRunTime)
          if (m.shuffleReadMetrics != null)
            shuffleRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          if (m.shuffleWriteMetrics != null)
            shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    // GAP SAMPLER: every 10 ms, when no Spark job is in flight (the
    // listener's in-flight counter is ~0), record the main thread's top
    // interesting frame — attributes the driver-side gap (wall − Σ job
    // wall) to planning / manifest IO / commit glue by code location.
    val mainThread = Thread.currentThread()
    val gapFrames = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    val sampling = new java.util.concurrent.atomic.AtomicBoolean(false)
    val pyDumped = new java.util.concurrent.atomic.AtomicBoolean(false)
    val sampler = new Thread(() => {
      while (true) {
        if (sampling.get() && inFlight.get() == 0) {
          val st = mainThread.getStackTrace
          val top = st.find { f =>
            val c = f.getClassName
            (c.startsWith("org.apache.spark") || c.startsWith("graft")) &&
              !c.contains("ProbeQueryJobs")
          }
          top.foreach { f =>
            val key = s"${f.getClassName.stripPrefix("org.apache.spark.")}.${f.getMethodName}"
            gapFrames.merge(key, 1, (a, b) => a + b)
            if (key.contains("Python") && pyDumped.compareAndSet(false, true))
              System.err.println("[gap] PYTHON STACK:\n  " +
                st.take(40).mkString("\n  "))
          }
          // main blocked in awaitTermination tells us nothing about WHERE
          // a streaming drain's between-job time goes — attribute it to
          // the microbatch ("stream execution") thread's own top frame
          if (top.exists(_.getMethodName == "awaitTermination")) {
            import scala.jdk.CollectionConverters._
            Thread.getAllStackTraces.asScala.foreach { case (t, frames) =>
              if (t.getName.startsWith("stream execution thread"))
                frames.find { f =>
                  val c = f.getClassName
                  c.startsWith("org.apache.spark") || c.startsWith("graft")
                }.foreach { f =>
                  val key = "st: " + f.getClassName.stripPrefix("org.apache.spark.") +
                    "." + f.getMethodName
                  gapFrames.merge(key, 1, (a, b) => a + b)
                }
            }
          }
        }
        Thread.sleep(10)
      }
    })
    sampler.setDaemon(true)
    sampler.start()

    // warmup identical to Bench
    spark.range(1000000).selectExpr("sum(id)").collect()
    graft.queries.Registry.queries("q02_pricing_summary")(spark, sfDir).count()

    val names: Seq[String] =
      if (args.nonEmpty) args.toSeq
      else {
        val ref = Bench.loadRefQueries("BENCH_REF.json")
        ref.toSeq.sortBy(-_._2).take(30).map(_._1)
      }
    val fns = graft.queries.Registry.benchQueries
    println(f"${"query"}%-32s ${"wall_s"}%8s ${"jobs"}%5s ${"jobwall"}%8s ${"gap_s"}%7s ${"taskmin"}%8s ${"tasks"}%6s ${"stages"}%6s ${"shR_MB"}%7s ${"shW_MB"}%7s")
    for (name <- names; fn <- fns.get(name)) {
      // settle listener bus (private API — a short sleep suffices locally),
      // then reset counters
      Thread.sleep(400)
      nJobs.set(0); jobWallNs.set(0L); taskTimeMs.set(0L)
      shuffleRead.set(0L); shuffleWrite.set(0L); nTasks.set(0); nStages.set(0)
      gapFrames.clear(); sampling.set(true)
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      } catch {
        case scala.util.control.NonFatal(e) =>
          println(s"$name FAILED: ${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(200)}")
      }
      val wall = (System.nanoTime() - t0) / 1e9
      sampling.set(false)
      Thread.sleep(400)
      if (sys.env.contains("SPARK_GRAFT_PROBE_GAP")) {
        import scala.jdk.CollectionConverters._
        gapFrames.asScala.toSeq.sortBy(-_._2).take(20).foreach { case (k, c) =>
          println(f"    gap $c%4d  $k")
        }
      }
      val jw = jobWallNs.get() / 1e9
      println(f"$name%-32s $wall%8.2f ${nJobs.get()}%5d $jw%8.2f ${wall - jw}%7.2f ${taskTimeMs.get() / 60000.0}%8.2f ${nTasks.get()}%6d ${nStages.get()}%6d ${shuffleRead.get() / 1e6}%7.1f ${shuffleWrite.get() / 1e6}%7.1f")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.valuesIterator
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
