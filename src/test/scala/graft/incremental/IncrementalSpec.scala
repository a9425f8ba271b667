package graft.incremental

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** SURVEY §2.10 incremental semantics: exactly-once file processing via
  * tracker anti-join, watermark monotonicity, rerun idempotency (the
  * reference's own claimed invariant, DP:921).
  */
class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("graft_inc_spec").toString

  test("run processes each file exactly once; rerun is a no-op") {
    val root = tmp()
    Seq(1, 2, 3).toDF("v").write.parquet(s"$root/src/f1")
    Seq(4, 5).toDF("v").write.parquet(s"$root/src/f2")

    val n1 = Incremental.run(spark, s"$root/src", s"$root/state", s"$root/out")(identity)
    assert(n1 > 0)
    assert(spark.read.parquet(s"$root/out").count() === 5)

    val n2 = Incremental.run(spark, s"$root/src", s"$root/state", s"$root/out")(identity)
    assert(n2 === 0)
    assert(spark.read.parquet(s"$root/out").count() === 5) // unchanged
  }

  test("new files arriving later are picked up without reprocessing old ones") {
    val root = tmp()
    Seq(1).toDF("v").write.parquet(s"$root/src/f1")
    Incremental.run(spark, s"$root/src", s"$root/state", s"$root/out")(identity)
    Seq(2, 3).toDF("v").write.parquet(s"$root/src/f2")
    Incremental.run(spark, s"$root/src", s"$root/state", s"$root/out")(identity)
    val vals = spark.read.parquet(s"$root/out").collect().map(_.getInt(0)).sorted.toSeq
    assert(vals === Seq(1, 2, 3))
  }

  test("watermark is monotonically non-decreasing across runs") {
    val root = tmp()
    Seq(1).toDF("v").write.parquet(s"$root/src/f1")
    Incremental.run(spark, s"$root/src", s"$root/state", s"$root/out")(identity)
    val w1 = Incremental.readWatermark(spark, s"$root/state")
    Incremental.run(spark, s"$root/src", s"$root/state", s"$root/out")(identity)
    val w2 = Incremental.readWatermark(spark, s"$root/state")
    assert(w1 > 0L)
    assert(w2 >= w1)
  }

  test("transform is applied to each new batch") {
    val root = tmp()
    Seq(1, 2).toDF("v").write.parquet(s"$root/src/f1")
    Incremental.run(spark, s"$root/src", s"$root/state", s"$root/out")(
      df => df.withColumn("v", col("v") * 10))
    val vals = spark.read.parquet(s"$root/out").collect().map(_.getInt(0)).sorted.toSeq
    assert(vals === Seq(10, 20))
  }

  test("discover filters by pattern and sorts by mtime") {
    val root = tmp()
    Seq(1).toDF("v").write.parquet(s"$root/src/a")
    Files.writeString(java.nio.file.Paths.get(root, "src", "note.txt"), "skip me")
    val metas = Incremental.discover(spark, s"$root/src")
    assert(metas.nonEmpty)
    assert(metas.forall(_.path.endsWith(".parquet")))
    assert(metas.map(_.mtime) === metas.map(_.mtime).sorted)
  }
}
