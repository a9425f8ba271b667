package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Exact-substring dedup: cross-doc and within-doc repeated spans removed
  * from every occurrence, shorter docs and unique text untouched.
  */
class ExactSubstrSpec extends SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], k: Int): Map[Long, (String, Long)] =
    ExactSubstr.removeRepeatedSpans(docs.toDF("doc_id", "text"),
        col("doc_id"), col("text"), k)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap

  test("a span shared by two docs is cut from BOTH; unique prefixes survive") {
    val r = run(Seq(1L -> "x y z a b c", 2L -> "q r s a b c"), k = 3)
    assert(r(1L) === (("x y z", 3L)))
    assert(r(2L) === (("q r s", 3L)))
  }

  test("whole-document duplicates collapse to empty text") {
    val r = run(Seq(1L -> "a b c d", 2L -> "a b c d", 3L -> "e f g h"), k = 3)
    assert(r(1L) === (("", 4L)))
    assert(r(2L) === (("", 4L)))
    assert(r(3L) === (("e f g h", 0L)))
  }

  test("overlapping duplicated shingles merge into one covered run") {
    // "a b c" and "b c d" both repeat → positions 0..3 covered in both docs
    val r = run(Seq(1L -> "a b c d x", 2L -> "a b c d y"), k = 3)
    assert(r(1L) === (("x", 4L)))
    assert(r(2L) === (("y", 4L)))
  }

  test("within-doc repetition is removed too (all copies, per the paper)") {
    val r = run(Seq(1L -> "a b c z z a b c", 2L -> "u v w t s r q p"), k = 3)
    assert(r(1L) === (("z z", 6L)))
  }

  test("documents shorter than k are never touched") {
    val r = run(Seq(1L -> "a b", 2L -> "a b", 3L -> "c"), k = 3)
    assert(r(1L) === (("a b", 0L)))
    assert(r(2L) === (("a b", 0L)))
    assert(r(3L) === (("c", 0L)))
  }

  test("separator keeps token boundaries: 'ab c' vs 'a bc' never collide") {
    val r = run(Seq(1L -> "ab c d", 2L -> "a bc d"), k = 3)
    assert(r(1L) === (("ab c d", 0L)))
    assert(r(2L) === (("a bc d", 0L)))
  }
}
