package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway diagnostic (the CountX113/ProbeSt20 pattern): the
  * copy-on-write vs merge-on-read DELETE cost law, measured. Stages the
  * x101/x127 8-slice zone-mapped snapshot table from `documents`, then
  * deletes the SAME 8 scattered keys (one per slice — every file grazed)
  * both ways on independent copies and prints wall seconds, files
  * rewritten, and BYTES WRITTEN for each. The claim under test: MoR
  * write cost is O(matched keys) — flat across SF — while CoW rewrites
  * every grazed file, so its bytes grow with the table.
  *
  *   sbt "runMain graft.ProbeMor benchdata/sf1"
  */
object ProbeMor {
  def main(args: Array[String]): Unit = {
    val d = args.lift(0).getOrElse("benchdata/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.io.Snapshots

    val docs = Tables.load(spark, d, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
    val w = docs.agg(max(col("doc_id"))).first().getLong(0) / 8 + 1
    // one EXISTING key per slice (benchdata ids are replica-shifted with
    // gaps, so synthetic positions would delete nothing — the x127 lesson)
    val delKeys = docs.groupBy(floor(col("doc_id") / w).cast("long").as("k"))
      .agg(min(col("doc_id")).as("id"))
      .orderBy("k").select("id").collect().map(_.getLong(0)).toSeq

    def stage(): String = {
      val tbl = java.nio.file.Files.createTempDirectory("graft_probemor").toString + "/tbl"
      (0 until 8).foreach { i =>
        Snapshots.commitAppend(
          docs.filter(col("doc_id") >= i * w && col("doc_id") < (i + 1) * w).coalesce(1),
          tbl, recordSchema = true, statsCols = Seq("doc_id"))
      }
      tbl
    }
    def dataBytes(paths: Seq[String]): Long =
      paths.map(p => new java.io.File(new java.net.URI("file://" + p).getPath).length())
        .sum
    def newBytes(tbl: String, before: Set[String], dvs: Seq[String]): Long = {
      val after = Snapshots.liveFiles(spark, tbl).toSet
      dataBytes((after -- before).toSeq ++ dvs)
    }

    // MoR: one tombstone commit
    val t1 = stage()
    val before1 = Snapshots.liveFiles(spark, t1).toSet
    val tableBytes = dataBytes(before1.toSeq)
    val s1 = System.nanoTime()
    val mor = Snapshots.deleteWhereMor(spark, t1, col("doc_id").isin(delKeys: _*),
      keys = Seq("doc_id"))
    val morSec = (System.nanoTime() - s1) / 1e9
    val morBytes = newBytes(t1, before1, Snapshots.liveDvFiles(spark, t1))
    println(f"[probe-mor] sf=$d mode=mor tableBytes=$tableBytes keys=${mor.tombstoned} " +
      f"filesRewritten=${mor.dataFilesRewritten} bytesWritten=$morBytes wallSec=$morSec%.2f")

    // CoW: same predicate, full rewrite of every grazed file
    val t2 = stage()
    val before2 = Snapshots.liveFiles(spark, t2).toSet
    val s2 = System.nanoTime()
    val cow = Snapshots.deleteWhere(spark, t2, col("doc_id").isin(delKeys: _*))
    val cowSec = (System.nanoTime() - s2) / 1e9
    val cowBytes = newBytes(t2, before2, Nil)
    println(f"[probe-mor] sf=$d mode=cow tableBytes=$tableBytes keys=${delKeys.size} " +
      f"filesRewritten=${cow.rewritten.size} bytesWritten=$cowBytes wallSec=$cowSec%.2f")
    spark.stop()
  }
}
