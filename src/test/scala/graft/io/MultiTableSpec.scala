package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** MultiTable: a ledger-published cut is atomic — a reader racing a
  * writer that commits data, then index, then the cut, must NEVER
  * observe the index ahead of or behind the data (the pair is stale or
  * current, always consistent); cuts are immutable history.
  */
class MultiTableSpec extends SparkSpec {
  import spark.implicits._

  test("cuts publish atomically; resolveAt replays history; non-members reject") {
    val base = java.nio.file.Files.createTempDirectory("graft_mt").toString
    val data = s"$base/data"; val idx = s"$base/idx"; val led = s"$base/ledger"
    assert(MultiTable.resolve(spark, led) === Map.empty)
    val vD1 = Snapshots.commitAppend(Seq((1L, "a"), (2L, "b")).toDF("id", "g")
      .coalesce(1), data, recordSchema = true)
    val vI1 = Snapshots.commitAppend(Seq(("a", 1L), ("b", 1L)).toDF("g", "n")
      .coalesce(1), idx, recordSchema = true)
    val l1 = MultiTable.publish(spark, led, Map(data -> vD1, idx -> vI1))
    assert(MultiTable.resolve(spark, led) === Map(data -> 1L, idx -> 1L))
    // data moves ahead WITHOUT a new cut: consistent reads stay pinned
    Snapshots.commitAppend(Seq((3L, "a")).toDF("id", "g").coalesce(1), data)
    assert(MultiTable.readConsistent(spark, led, data).count() === 2L)
    // a new cut advances both; the old cut still replays
    val vI2 = Snapshots.commitAppend(Seq(("a", 2L), ("b", 1L)).toDF("g", "n")
      .coalesce(1), idx)
    val l2 = MultiTable.publish(spark, led, Map(data -> 2L, idx -> vI2))
    assert(l2 === l1 + 1)
    assert(MultiTable.readConsistent(spark, led, data).count() === 3L)
    assert(MultiTable.resolveAt(spark, led, l1) === Map(data -> 1L, idx -> 1L))
    intercept[IllegalArgumentException] {
      MultiTable.readConsistent(spark, led, s"$base/other")
    }
  }

  test("race: a reader never observes index-ahead-of-data (or behind)") {
    val base = java.nio.file.Files.createTempDirectory("graft_mtr").toString
    val data = s"$base/data"; val idx = s"$base/idx"; val led = s"$base/ledger"
    def step(i: Int): Unit = {
      // data grows by one chunk; the index is the full per-group count,
      // re-derived and committed as a replacement; then ONE cut
      val vD = Snapshots.commitAppend(
        (1 to 10).map(x => ((i * 10 + x).toLong, s"g${x % 3}")).toDF("id", "g")
          .coalesce(1), data, recordSchema = i == 0)
      val counts = Snapshots.readAt(spark, data, Some(vD))
        .groupBy("g").agg(count(lit(1)).as("n"))
      val old = Snapshots.liveFiles(spark, idx)
      val dir = s"$idx/data/ix-$i"
      counts.coalesce(1).write.parquet(dir)
      val p = new org.apache.hadoop.fs.Path(dir)
      val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val parts = f.listStatus(p).toSeq
        .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
        .map(_.getPath.toString)
      val vI = Snapshots.commit(spark, idx, adds = parts, removes = old,
        schemaJson = if (i == 0) Some(counts.schema.json) else None)
      MultiTable.publish(spark, led, Map(data -> vD, idx -> vI))
    }
    step(0)
    import java.util.concurrent.Executors
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val pool = Executors.newFixedThreadPool(2)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    @volatile var stop = false
    val reader = Future {
      var samples = 0; var violations = 0
      while (!stop || samples == 0) {
        val cut = MultiTable.resolve(spark, led)
        val d = Snapshots.readAt(spark, data, Some(cut(data)))
          .groupBy("g").agg(count(lit(1)).as("n"))
          .as[(String, Long)].collect().toMap
        val ix = Snapshots.readAt(spark, idx, Some(cut(idx)))
          .as[(String, Long)].collect().toMap
        if (d != ix) violations += 1
        samples += 1
      }
      (samples, violations)
    }
    (1 to 4).foreach(step)
    stop = true
    val (samples, violations) = Await.result(reader, 120.seconds)
    pool.shutdown()
    assert(samples > 0 && violations === 0,
      s"$violations of $samples consistent-cut samples mixed data and index")
    // final state: index == direct derivation, 50 rows across 5 chunks
    assert(MultiTable.readConsistent(spark, led, data).count() === 50L)
    assert(MultiTable.readConsistent(spark, led, idx)
      .as[(String, Long)].collect().toMap ===
      Map("g0" -> 15L, "g1" -> 20L, "g2" -> 15L))
  }
}
