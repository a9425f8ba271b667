package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** ZstdExprs: frame round-trip, concatenated-frame draining, salvage on
  * corrupt tails, bomb guard, and totality on junk input.
  */
class ZstdExprsSpec extends SparkSpec {
  import spark.implicits._

  private def frame(s: String): Array[Byte] =
    Seq(Tuple1(s)).toDF("t").select(ZstdExprs.zstdFrame($"t").as("z"))
      .head().getAs[Array[Byte]]("z")

  private def unzstd(b: Array[Byte]): Option[String] = {
    val r = Seq(Tuple1(b)).toDF("b").select(ZstdExprs.unzstdText($"b").as("t")).head()
    if (r.isNullAt(0)) None else Some(r.getString(0))
  }

  test("single-frame round-trip, including multi-byte text") {
    val s = "hello zstd 日本語テキスト éè"
    assert(unzstd(frame(s)) === Some(s))
    assert(unzstd(frame("")) === Some(""))
  }

  test("concatenated frames drain to the true end of input") {
    // the first-frame-only reader bug would return just "part one\n"
    val cat = frame("part one\n") ++ frame("part two\n") ++ frame("part three")
    assert(unzstd(cat) === Some("part one\npart two\npart three"))
  }

  test("corrupt tail after a complete frame keeps the salvage") {
    val cat = frame("kept") ++ Array[Byte](1, 2, 3, 4, 5, 6, 7, 8)
    assert(unzstd(cat) === Some("kept"))
  }

  test("non-zstd and empty input are null, never an error") {
    assert(unzstd("not zstd at all".getBytes("UTF-8")) === None)
    assert(unzstd(Array.emptyByteArray) === None)
  }

  test("decompression bomb → null row, not an OOM") {
    // 65 MiB of a single byte compresses to ~KBs; expansion guard refuses
    assert(unzstd(frame("x" * (65 * 1024 * 1024))) === None)
  }

  test("SQL registration: zstd_frame / unzstd_text") {
    graft.ext.GraftFunctions.register(spark)
    val r = spark.sql("SELECT unzstd_text(zstd_frame('round trip')) AS t").head()
    assert(r.getString(0) === "round trip")
  }
}
