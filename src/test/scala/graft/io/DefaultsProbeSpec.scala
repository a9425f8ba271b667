package graft.io

import graft.SparkSpec
import org.apache.spark.sql.types._

/** Capability probe: Spark's parquet reader fills columns ABSENT from a
  * file with the read schema's EXISTS_DEFAULT metadata (SPARK-38334
  * existence defaults) instead of null. ADD COLUMN DEFAULT rests on
  * this — old files serve the default with zero rewrites. */
class DefaultsProbeSpec extends SparkSpec {
  import spark.implicits._

  test("missing parquet column reads as the EXISTS_DEFAULT literal") {
    val dir = java.nio.file.Files.createTempDirectory("graft_def_probe").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "s").write.parquet(s"$dir/t")
    val md = new MetadataBuilder()
      .putString("CURRENT_DEFAULT", "42")
      .putString("EXISTS_DEFAULT", "42")
      .build()
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("s", StringType),
      StructField("m", LongType, nullable = true, metadata = md)))
    val got = spark.read.schema(schema).parquet(s"$dir/t")
      .orderBy("id").select("id", "m").as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 42L), (2L, 42L)))
  }
}
