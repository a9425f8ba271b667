package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pins the bounded top-k aggregate against the window formulation it
  * replaces: identical ranking (score desc, id asc), bounded output,
  * null skipping, and survival of partial aggregation across partitions.
  */
class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  test("topK returns the k largest scores ordered desc, ties broken by smallest id") {
    val df = Seq(
      ("g", 1.0, 10L), ("g", 3.0, 11L), ("g", 3.0, 7L), ("g", 2.0, 1L), ("g", 0.5, 2L)
    ).toDF("k", "s", "id")
    val out = df.groupBy("k").agg(TopKAgg.topK($"s", $"id", 3).as("t"))
      .select(explode($"t").as("e")).select("e.score", "e.id").collect()
      .map(r => (r.getDouble(0), r.getLong(1))).toSeq
    assert(out === Seq((3.0, 7L), (3.0, 11L), (2.0, 1L)))
  }

  test("topK yields fewer than k entries when the group is small, skips nulls") {
    val df = Seq(
      (Some(1.0), Some(1L)), (None, Some(2L)), (Some(2.0), None)
    ).toDF("s", "id")
    val out = df.agg(TopKAgg.topK($"s", $"id", 5).as("t"))
      .select(size($"t")).first().getInt(0)
    assert(out === 1)
  }

  test("topK equals the row_number() window formulation on a many-partition frame") {
    // 10k rows over 32 partitions → exercises partial/merge/serialize paths
    val df = spark.range(10000).repartition(32)
      .select(($"id" % 7).as("grp"),
        (($"id" * 2654435761L) % 1000).cast("double").as("s"), $"id")
    val viaAgg = df.groupBy("grp")
      .agg(TopKAgg.topK($"s", $"id", 10).as("t"))
      .select($"grp", posexplode($"t").as(Seq("pos", "e")))
      .select($"grp", ($"pos" + 1).cast("long").as("rk"), $"e.id".as("id"))
    val w = Window.partitionBy($"grp").orderBy($"s".desc, $"id".asc)
    val viaWindow = df.withColumn("rk", row_number().over(w).cast("long"))
      .filter($"rk" <= 10).select($"grp", $"rk", $"id")
    assert(viaAgg.exceptAll(viaWindow).isEmpty && viaWindow.exceptAll(viaAgg).isEmpty)
  }

  test("topKString ranks by score desc then binary string asc, skips nulls") {
    val df = Seq(
      (Some(3.0), Some("banana")), (Some(3.0), Some("apple")), (Some(1.0), Some("zebra")),
      (None, Some("ghost")), (Some(9.0), None)
    ).toDF("s", "t")
    val out = df.agg(TopKAgg.topKString($"s", $"t", 2).as("t"))
      .select(explode($"t").as("e")).select("e.score", "e.id").collect()
      .map(r => (r.getDouble(0), r.getString(1))).toSeq
    assert(out === Seq((3.0, "apple"), (3.0, "banana")))
  }

  test("topKString equals the window formulation across partitions (serialize/merge path)") {
    // string ids force the variable-length buffer serialization to round-trip
    val df = spark.range(10000).repartition(32)
      .select(($"id" % 5).as("grp"),
        (($"id" * 2654435761L) % 500).cast("double").as("s"),
        concat(lit("item-"), format_string("%05d", $"id")).as("t"))
    val viaAgg = TopKAgg.rankTopKString(df, $"grp", $"s", $"t", 7)
      .select($"group", $"rk", $"id")
    val w = Window.partitionBy($"grp").orderBy($"s".desc, $"t".asc)
    val viaWindow = df.withColumn("rk", row_number().over(w).cast("long"))
      .filter($"rk" <= 7).select($"grp".as("group"), $"rk", $"t".as("id"))
    assert(viaAgg.exceptAll(viaWindow).isEmpty && viaWindow.exceptAll(viaAgg).isEmpty)
  }

  test("topK plans as a two-phase aggregate (partial before the shuffle)") {
    val df = spark.range(100).select(($"id" % 3).as("g"), $"id".cast("double").as("s"), $"id")
    val plan = df.groupBy("g").agg(TopKAgg.topK($"s", $"id", 2))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_top_k_by_score"), plan)
  }
}
