package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** COST-LAW PROBE: equi-height histogram estimation quality and ANALYZE
  * cost vs table size. For a 95/5-skewed band column it prints, per
  * scale: the ANALYZE wall time with and without histograms (pinning the
  * ONE-aggregation-pass law — boundaries from percentile_approx and
  * per-bin NDVs from a KMV distinct-value sample ride the same pass as
  * plain ANALYZE; round-16 fix, previously a second range-conditioned
  * HLL pass measured 3–9× plain) and the
  * optimizer's row estimate for a rare band under (a) no stats, (b)
  * NDV+min/max, (c) 64-bin histogram, against the true count. The
  * histogram estimate should track truth within small factors while the
  * NDV-uniform estimate is ~19× off by construction — the gap that flips
  * a rare-slice probe from shuffle join to broadcast at 100 TB.
  *
  * Run: sbt "runMain graft.ProbeHist [rows ...]" (default 200k 2M). */
object ProbeHist {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.extensions", "graft.sql.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val sizes = if (args.nonEmpty) args.toSeq.map(_.toLong)
                else Seq(200000L, 2000000L)
    sizes.foreach { n =>
      val tmp = java.nio.file.Files.createTempDirectory("graft_probehist").toString
      // catalog instances are cached per session — one name per scale
      val cat = s"ph_$n"
      spark.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
      spark.conf.set(s"spark.sql.catalog.$cat.root", tmp)
      val fact = spark.range(1, n + 1).select(
        col("id"),
        when(pmod(col("id"), lit(20)) =!= 19, lit(0L))
          .otherwise(floor(pmod(col("id"), lit(380)) / 20) + 1)
          .cast("long").as("band"),
        concat(lit("s"), pmod(col("id"), lit(5))).as("src"),
        (col("id") * 2).as("m"))
      graft.io.Snapshots.commitAppend(fact.repartition(8), s"$tmp/fact",
        recordSchema = true, recordRowCounts = true)
      val trueRare = fact.filter(col("band") === 19).count()
      def timed[T](f: => T): (T, Double) = {
        val t0 = System.nanoTime(); val r = f
        (r, (System.nanoTime() - t0) / 1e9)
      }
      spark.conf.set("spark.sql.cbo.enabled", "true")
      def estRare(): BigInt = spark.sql(
        s"SELECT src FROM $cat.fact WHERE band = 19").queryExecution
        .optimizedPlan.collect {
          case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
            f.stats.rowCount.getOrElse(BigInt(-1))
        }.headOption.getOrElse(BigInt(-1))
      val estNone = estRare()
      val (_, tPlain) = timed(
        spark.sql(s"CALL $cat.system.analyze('fact', 'band,src,m')").collect())
      val estNdv = estRare()
      val (_, tHist) = timed(
        spark.sql(s"CALL $cat.system.analyze('fact', 'band,src,m', 64)").collect())
      val estHist = estRare()
      spark.conf.set("spark.sql.cbo.enabled", "false")
      println(f"""{"probe":"hist","rows":$n,"true_rare":$trueRare,""" +
        f""""est_none":$estNone,"est_ndv":$estNdv,"est_hist":$estHist,""" +
        f""""analyze_s":$tPlain%.2f,"analyze_hist_s":$tHist%.2f}""")
    }
    spark.stop()
  }
}
