package graft.pipeline

import graft.SparkSpec
import graft.functions.TextExprs
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.schema.TaxiSchema

/** Degenerate inputs and native-vs-HOF cross-checks. */
class EdgeCaseSpec extends SparkSpec {
  import spark.implicits._

  test("clean + transform survive an EMPTY frame (all scalar jobs return null)") {
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], TaxiSchema.schema)
    val out = TaxiPipeline.transform(TaxiPipeline.clean(empty))
    assert(out.count() === 0)
    assert(out.columns.contains("is_valid_trip"))
  }

  test("metrics on an empty frame yield empty tables, correct schemas") {
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], TaxiSchema.schema)
    val m = TaxiPipeline.metrics(TaxiPipeline.transform(TaxiPipeline.clean(empty)))
    assert(m("vendor_performance").count() === 0)
    assert(m("vendor_performance").columns.length === 11)
  }

  test("approx-percentile mode (the 100 TB path) runs the full pipeline") {
    val ts0 = java.sql.Timestamp.valueOf("2024-03-04 10:00:00")
    val ts1 = java.sql.Timestamp.valueOf("2024-03-04 10:30:00")
    val rows = (1 to 50).map { i =>
      Row(1.toByte, ts0, ts1, 2.toByte, i.toFloat, 1.toByte, "N",
        10.toShort, 20.toShort, 1.toByte, 10.0f, 1.0f, 0.5f, 2.0f, 0.0f,
        0.3f, 13.8f, 0.0f, 0.0f)
    }
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows), TaxiSchema.schema)
    val cleaned = TaxiPipeline.clean(df, exactPercentiles = false)
    assert(cleaned.count() === 50)
  }

  test("native shingles/ngrams match the independent HOF formulation on tricky strings") {
    val tricky = Seq("", " ", "a", "a ", " a", "a  b", "A B C d",
      "ä ö ü", "one two three four five", "x\ty", "double  space  run")
    val df = tricky.toDF("text")
    for (k <- Seq(1, 2, 3)) {
      val t = split(lower(col("text")), " ")
      val hofNgrams = when(size(t) >= k,
        transform(sequence(lit(1), size(t) - (k - 1)),
          i => concat_ws(" ", (0 until k).map(o => element_at(t, i + o)): _*)))
        .otherwise(array().cast("array<string>"))
      val rows = df.select(
        TextExprs.wordNgrams(col("text"), k).as("native"),
        hofNgrams.as("hof"),
        TextExprs.wordShingles(col("text"), k).as("nativeSh"),
        array_distinct(when(size(t) >= k, hofNgrams)
          .otherwise(array(concat_ws(" ", t)))).as("hofSh")).collect()
      rows.zip(tricky).foreach { case (r, input) =>
        assert(r.getSeq[String](0) === r.getSeq[String](1), s"ngrams k=$k on '$input'")
        assert(r.getSeq[String](2) === r.getSeq[String](3), s"shingles k=$k on '$input'")
      }
    }
  }

  test("native jaccard matches array_intersect/array_union on overlapping arrays") {
    val df = Seq(
      (Seq("a", "b", "c"), Seq("b", "c", "d")),
      (Seq("a"), Seq("a")),
      (Seq("a", "b"), Seq("c", "d")),
      (Seq[String](), Seq[String]())).toDF("x", "y")
    val rows = df.select(
      TextExprs.jaccardSim(col("x"), col("y")).as("native"),
      coalesce(size(array_intersect(col("x"), col("y"))).cast("double") /
        nullif(size(array_union(col("x"), col("y"))), lit(0)), lit(0.0)).as("hof")).collect()
    rows.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
  }
}
