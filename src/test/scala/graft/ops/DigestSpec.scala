package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Content-digest semantics: order/partitioning independence, change
  * sensitivity, multiset behavior, null vs empty distinction. */
class DigestSpec extends SparkSpec {
  import spark.implicits._

  private def digestOf(rows: Seq[(Long, String)], parts: Int = 1): java.math.BigDecimal = {
    val df = rows.toDF("k", "v").repartition(parts)
    Digest.datasetDigest(df, Seq(col("k"), col("v"))).first().getDecimal(1)
  }

  test("digest ignores row order and partitioning") {
    val rows = (1L to 100L).map(i => (i, s"row$i"))
    assert(digestOf(rows) === digestOf(scala.util.Random.shuffle(rows), parts = 7))
  }

  test("digest detects any single-row change, insertion, or duplication") {
    val rows = (1L to 50L).map(i => (i, s"row$i"))
    val base = digestOf(rows)
    assert(digestOf(rows.updated(3, (4L, "row4-changed"))) !== base)
    assert(digestOf(rows :+ (51L, "row51")) !== base)
    assert(digestOf(rows :+ rows.head) !== base) // multiset: dup rows count
  }

  test("field boundaries and nulls are unambiguous") {
    val a = Seq(("ab", "c")).toDF("x", "y")
    val b = Seq(("a", "bc")).toDF("x", "y")
    def d(df: org.apache.spark.sql.DataFrame) =
      Digest.datasetDigest(df, Seq(col("x"), col("y"))).first().getDecimal(1)
    assert(d(a) !== d(b))
    val withNull = Seq((Some("a"), Option.empty[String])).toDF("x", "y")
    val withEmpty = Seq((Some("a"), Some(""))).toDF("x", "y")
    // null and "" intentionally encode alike (both vanish); what must NOT
    // collide is either of them with the literal string "null"
    val withLiteral = Seq((Some("a"), Some("null"))).toDF("x", "y")
    assert(d(withNull) === d(withEmpty))
    assert(d(withNull) !== d(withLiteral))
  }
}
