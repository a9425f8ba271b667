package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** ArrayExprs.BinaryConcat: one-pass array<binary> concatenation — element
  * order, null-element skip, null-array propagation, and agreement with the
  * (quadratic) aggregate/concat fold it replaces.
  */
class ArrayExprsSpec extends SparkSpec {
  import spark.implicits._

  test("concatenates in element order; empty array → empty bytes") {
    val df = Seq(
      (1L, Seq[Array[Byte]](Array(1, 2), Array(3), Array(4, 5, 6))),
      (2L, Seq[Array[Byte]]()))
      .toDF("id", "arr")
      .select($"id", ArrayExprs.binaryConcat($"arr").as("b"))
      .orderBy("id").collect()
    assert(df(0).getAs[Array[Byte]]("b").toSeq === Seq[Byte](1, 2, 3, 4, 5, 6))
    assert(df(1).getAs[Array[Byte]]("b").toSeq === Seq.empty[Byte])
  }

  test("null elements are skipped; null array propagates null") {
    val withNullElem = Seq(Tuple1(Seq(Array[Byte](9), null, Array[Byte](8))))
      .toDF("arr").select(ArrayExprs.binaryConcat($"arr").as("b")).head()
    assert(withNullElem.getAs[Array[Byte]]("b").toSeq === Seq[Byte](9, 8))
    val nullArr = Seq(Tuple1(null: Seq[Array[Byte]])).toDF("arr")
      .select(ArrayExprs.binaryConcat($"arr").as("b")).head()
    assert(nullArr.isNullAt(0))
  }

  test("bit-identical to the aggregate/concat fold on grouped data") {
    val rows = (0L until 200L).map(i =>
      (i % 7, i, Array.fill((i % 13).toInt + 1)((i % 251).toByte)))
    val df = rows.toDF("bucket", "id", "payload")
      .groupBy("bucket")
      .agg(expr("array_sort(collect_list(struct(id, payload)))").as("ms"))
      .select($"bucket",
        ArrayExprs.binaryConcat(expr("transform(ms, x -> x.payload)")).as("fast"),
        expr("aggregate(ms, CAST(X'' AS BINARY), (acc, x) -> concat(acc, x.payload))")
          .as("fold"))
      .collect()
    assert(df.nonEmpty)
    df.foreach { r =>
      assert(r.getAs[Array[Byte]]("fast").toSeq === r.getAs[Array[Byte]]("fold").toSeq)
    }
  }

  test("SQL registration: binary_concat") {
    graft.ext.GraftFunctions.register(spark)
    val b = spark.sql("SELECT binary_concat(array(X'01', X'0203')) AS b").head()
      .getAs[Array[Byte]]("b")
    assert(b.toSeq === Seq[Byte](1, 2, 3))
  }
}
