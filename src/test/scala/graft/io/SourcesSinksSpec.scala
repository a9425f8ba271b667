package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Scan/sink operators: filename pattern filters and year/month extraction
  * (P1/P3), filename-vs-data validation (P4), CSV metric sink (S5), latest
  * copy (S8), text artifacts (S6).
  */
class SourcesSinksSpec extends SparkSpec {
  import spark.implicits._

  test("P1/P3 filename pattern filter and year/month extraction") {
    val df = Seq(
      "raw/yellow_tripdata_2024-03.parquet",
      "raw/yellow_tripdata_2023-11.parquet",
      "raw/green_tripdata_2024-03.parquet",
      "raw/yellow_tripdata_2024-03.csv").toDF("key")
    val kept = df.filter(Sources.filenamePatternFilter($"key", "yellow_tripdata_", ".parquet"))
    assert(kept.count() === 2)
    val ym = kept.select(
      Sources.yearFromFilename(Sources.basename($"key")).as("y"),
      Sources.monthFromFilename(Sources.basename($"key")).as("m"))
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(ym === Set((2024, 3), (2023, 11)))
  }

  test("P3 extraction yields null on non-matching names") {
    val r = Seq("something_else.parquet").toDF("key")
      .select(Sources.yearFromFilename($"key")).first()
    assert(r.isNullAt(0))
  }

  test("P4 mismatchReport counts offending rows with distinct bad years/months") {
    val df = Seq(
      ("2024-03-01 10:00:00", "yellow_tripdata_2024-03.parquet"),
      ("2024-04-02 10:00:00", "yellow_tripdata_2024-03.parquet"), // bad month
      ("2023-03-02 10:00:00", "yellow_tripdata_2024-03.parquet")  // bad year
    ).toDF("ts", "file").select(to_timestamp($"ts").as("ts"), $"file")
    val valid = Sources.validateAgainstFilename(df, $"ts", $"file")
    assert(valid.count() === 1)
    val rep = Sources.mismatchReport(df, $"ts", $"file").first()
    assert(rep.getLong(0) === 2L)
    assert(rep.getSeq[Int](1).toSet === Set(2023, 2024))
  }

  test("P4 validation passes rows through when the filename doesn't parse (DP:27-33)") {
    // reference returns the frame UNCHANGED when year/month can't be
    // extracted; a null-extraction equality would drop every row
    val df = Seq(
      ("2024-03-01 10:00:00", "oddly_named.parquet"),
      ("2019-07-02 10:00:00", "oddly_named.parquet"),
      ("2024-04-02 10:00:00", "yellow_tripdata_2024-03.parquet") // real mismatch
    ).toDF("ts", "file").select(to_timestamp($"ts").as("ts"), $"file")
    assert(Sources.validateAgainstFilename(df, $"ts", $"file").count() === 2)
    // and unparseable-file rows are never counted as mismatches
    assert(Sources.mismatchReport(df, $"ts", $"file").first().getLong(0) === 1L)
  }

  test("S5 metricsCsv writes a single headered csv readable back") {
    val dir = Files.createTempDirectory("graft_sink").toString + "/metrics"
    Sinks.metricsCsv(Seq(("a", 1.5), ("b", 2.5)).toDF("k", "v"), dir)
    val back = spark.read.option("header", "true").csv(dir)
    assert(back.columns.toSeq === Seq("k", "v"))
    assert(back.count() === 2)
  }

  test("JSONL and ORC round-trip adversarial strings and types byte-exactly") {
    val dir = Files.createTempDirectory("graft_fmt").toString
    val rows = Seq(
      (1L, "plain ascii"),
      (2L, "newline\nand\ttab"),
      (3L, "quotes \" and backslash \\ and {json: \"braces\"}"),
      (4L, "unicode: café 中文 😀"),
      (5L, "")
    ).toDF("id", "text")
    Sinks.jsonl(rows, s"$dir/j")
    Sinks.orc(rows, s"$dir/o")
    val fromJ = Sources.jsonl(spark, rows.schema, s"$dir/j")
    val fromO = Sources.orc(spark, s"$dir/o")
    assert(fromJ.exceptAll(rows).isEmpty && rows.exceptAll(fromJ).isEmpty)
    assert(fromO.exceptAll(rows).isEmpty && rows.exceptAll(fromO).isEmpty)
  }

  test("S8 copyToLatest replicates a written dir; re-copy overwrites") {
    val root = Files.createTempDirectory("graft_latest").toString
    Seq(1, 2).toDF("v").write.parquet(s"$root/v1")
    Sinks.copyToLatest(spark, s"$root/v1", s"$root/latest")
    assert(spark.read.parquet(s"$root/latest").count() === 2)
    Seq(1, 2, 3).toDF("v").write.parquet(s"$root/v2")
    Sinks.copyToLatest(spark, s"$root/v2", s"$root/latest")
    assert(spark.read.parquet(s"$root/latest").count() === 3)
  }

  test("S6 text artifact round-trips; absent path reads None") {
    val root = Files.createTempDirectory("graft_txt").toString
    Sinks.writeText(spark, s"$root/wm.txt", "2024-01-01T00:00:00Z")
    assert(Sinks.readText(spark, s"$root/wm.txt") === Some("2024-01-01T00:00:00Z"))
    assert(Sinks.readText(spark, s"$root/nope.txt") === None)
  }

  test("parquetRowGroups: a SINGLE file carries parallel scan work; default is one task") {
    import org.apache.spark.sql.functions._
    val root = java.nio.file.Files.createTempDirectory("graft_rg").toString
    val df = spark.range(120000)
      .select(col("id"), concat(lit("padpadpadpadpadpad-"), col("id")).as("s"))
      .coalesce(1)
    Sinks.parquetRowGroups(df, s"$root/rg", 64 * 1024)
    Sinks.parquet(df, s"$root/plain")
    // parquet splits at ROW-GROUP boundaries: with byte-ranged input
    // splits, only ranges containing a row-group start produce rows —
    // the default 128 MB block leaves ONE working task per small file
    // (the BASELINE q08 layout finding), small row groups fan it out
    def workingTasks(path: String): Long = {
      val prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
      spark.conf.set("spark.sql.files.maxPartitionBytes", (256 * 1024).toString)
      try spark.read.parquet(path).rdd
        .mapPartitions(it => Iterator(if (it.hasNext) 1L else 0L)).sum().toLong
      finally spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
    }
    val rg = workingTasks(s"$root/rg")
    val plain = workingTasks(s"$root/plain")
    assert(plain === 1L, s"default single file should be one working task, got $plain")
    assert(rg > 4L, s"row-grouped single file should split, got $rg working tasks")
    // content identical either way
    assert(spark.read.parquet(s"$root/rg").count() === 120000L)
  }
}
