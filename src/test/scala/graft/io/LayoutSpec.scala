package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Proof-of-layout specs: partition pruning actually prunes, bucketed
  * joins actually avoid the shuffle. Asserted against the physical plan —
  * the thing that matters at 100 TB, checkable at any scale.
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def physicalPlan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("partitioned write + filter → partition pruning (no full scan)") {
    val dir = Files.createTempDirectory("graft_layout").toString + "/events_by_type"
    val df = (1 to 1000).map(i => (i.toLong, s"type_${i % 4}", i * 1.5))
      .toDF("id", "event_type", "value")
    Layout.writePartitioned(df, dir, "event_type")
    // directory layout is hive-style
    assert(new java.io.File(dir).list().count(_.startsWith("event_type=")) === 4)

    val read = spark.read.parquet(dir).filter($"event_type" === "type_1")
    assert(read.count() === 250)
    val scan = read.queryExecution.executedPlan.collectLeaves().head.toString
    // the scan must carry the partition filter and touch 1 of 4 partitions
    assert(scan.contains("PartitionFilters"))
    assert(scan.contains("event_type"))
  }

  test("bucketed tables join without an Exchange; unbucketed join shuffles") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    try {
      val left = (1 to 5000).map(i => (i.toLong, s"l$i")).toDF("k", "lv")
      val right = (1 to 5000).map(i => (i.toLong, s"r$i")).toDF("k", "rv")

      // unbucketed baseline: sort-merge join needs two Exchanges
      val plain = left.join(right, "k")
      assert(physicalPlan(plain).contains("Exchange"))

      Layout.writeBucketed(left, "graft_bleft", "k", 8)
      Layout.writeBucketed(right, "graft_bright", "k", 8)
      val bucketed = Layout.table(spark, "graft_bleft")
        .join(Layout.table(spark, "graft_bright"), "k")
      assert(bucketed.count() === 5000)
      // bucket layout replaces both shuffles
      assert(!physicalPlan(bucketed).contains("Exchange"),
        s"bucketed join should not shuffle:\n${physicalPlan(bucketed)}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS graft_bleft")
      spark.sql("DROP TABLE IF EXISTS graft_bright")
    }
  }

  test("bucketed aggregation on the bucket key needs no Exchange") {
    try {
      Layout.writeBucketed((1 to 1000).map(i => (i.toLong % 50, i * 2.0)).toDF("k", "v"),
        "graft_bagg", "k", 8)
      val agg = Layout.table(spark, "graft_bagg").groupBy("k").agg(sum($"v"))
      assert(agg.count() === 50)
      assert(!physicalPlan(agg).contains("Exchange"),
        s"bucketed agg should not shuffle:\n${physicalPlan(agg)}")
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_bagg")
    }
  }
}
