package graft.io

import graft.SparkSpec
import org.apache.spark.sql.types._

/** Capability probe: Spark 4's parquet readers support widening type
  * promotions (SPARK-40876) — reading an INT32/FLOAT file under a
  * BIGINT/DOUBLE read schema. ALTER COLUMN TYPE widening rests on this. */
class WideningProbeSpec extends SparkSpec {
  import spark.implicits._

  test("parquet reads promote int32→bigint and float→double under a wide schema") {
    val dir = java.nio.file.Files.createTempDirectory("graft_widen_probe").toString
    Seq((1, 1.5f), (2, 2.5f)).toDF("i", "f").write.parquet(s"$dir/t")
    val wide = StructType(Seq(
      StructField("i", LongType), StructField("f", DoubleType)))
    val got = spark.read.schema(wide).parquet(s"$dir/t")
      .orderBy("i").as[(Long, Double)].collect().toSeq
    assert(got === Seq((1L, 1.5), (2L, 2.5)))
  }
}
