package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway diagnostic (the ProbeMor pattern): the anti-join DML cost
  * law, measured. Stages the 8-slice zone-mapped snapshot table from
  * `documents`, keeps a key set covering all but a handful of rows, and
  * runs `DELETE … WHERE doc_id NOT IN (keys)` two ways on independent
  * copies:
  *
  *   - BANDED: with a plain `doc_id BETWEEN` conjunct — the zone-map
  *     bound prunes candidates to ONE slice, so the join reads and the
  *     rewrite touch O(band), not O(table);
  *   - UNBANDED: membership needs every candidate file read (a missing
  *     key can hide anywhere — that is the anti form's intrinsic floor),
  *     but the REWRITE still touches only the files that actually lose
  *     rows.
  *
  * Claim under test: banded anti-DML scales with the band; unbanded
  * scales its READ with the table but its WRITE with the change.
  *
  *   sbt "runMain graft.ProbeAnti benchdata/sf1"
  */
object ProbeAnti {
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
    val maxId = docs.agg(max(col("doc_id"))).first().getLong(0)
    val w = maxId / 8 + 1
    // survivors: everything except 2 scattered rows per slice
    val victims = docs.groupBy(floor(col("doc_id") / w).cast("long").as("k"))
      .agg(min(col("doc_id")).as("a"), max(col("doc_id")).as("b"))
      .select(explode(array(col("a"), col("b"))).as("id"))
    victims.persist().count()

    def stage(): String = {
      val tbl = java.nio.file.Files.createTempDirectory("graft_probeanti").toString + "/tbl"
      (0 until 8).foreach { i =>
        Snapshots.commitAppend(
          docs.filter(col("doc_id") >= i * w && col("doc_id") < (i + 1) * w).coalesce(1),
          tbl, recordSchema = true, statsCols = Seq("doc_id"))
      }
      tbl
    }
    def bytes(paths: Seq[String]): Long =
      paths.map(p => new java.io.File(new java.net.URI("file://" + p).getPath).length()).sum

    // keys the rows must match to SURVIVE (the NOT IN set)
    val keep = docs.join(victims, docs("doc_id") === victims("id"), "left_anti")
      .select(col("doc_id"))

    // BANDED: the plain conjunct bounds candidates to slice 0
    val t1 = stage()
    val s1 = System.nanoTime()
    val r1 = Snapshots.mutateAnti(spark, t1, keep, Seq("doc_id"),
      nullKeyMutates = false, extraCond = Some(col("doc_id") < w),
      assignments = Nil, prune = Some(("doc_id", "0", (w - 1).toString)))
    val e1 = (System.nanoTime() - s1) / 1e9
    println(f"[probe-anti] banded:   ${e1}%.2f s, rewrote ${r1.rewritten.size} files, " +
      f"${bytes(r1.rewritten)}%d bytes retired")

    // UNBANDED: every candidate read, only losing files rewritten
    val t2 = stage()
    val s2 = System.nanoTime()
    val r2 = Snapshots.mutateAnti(spark, t2, keep, Seq("doc_id"),
      nullKeyMutates = false, extraCond = None, assignments = Nil, prune = None)
    val e2 = (System.nanoTime() - s2) / 1e9
    println(f"[probe-anti] unbanded: ${e2}%.2f s, rewrote ${r2.rewritten.size} files, " +
      f"${bytes(r2.rewritten)}%d bytes retired")
    spark.stop()
  }
}
