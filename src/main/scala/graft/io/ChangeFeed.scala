package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.lit

/** Incremental CHANGE-FEED consumer over a snapshot table — the
  * `readChangeFeed` shape: materialize the row-level CDC records
  * ([[Snapshots.rowDiff]]) of every version committed since the last
  * sync, one deterministic directory per version, and advance a cursor.
  * A downstream consumer (index maintenance, cache invalidation, a
  * training-set delta builder) calls [[sync]] on its own schedule and
  * reads contiguous, replay-safe deltas — never the table.
  *
  * Exactly-once by the same discipline as the incremental tracker
  * ([[graft.incremental.Incremental]]): per-version output dirs are
  * DETERMINISTIC (`v%010d`), data is written BEFORE the cursor
  * advances, and a crash between the two overwrites its own partial
  * output on replay — the cursor file is the ledger, the dirs are
  * idempotent. A re-sync with no new versions is a no-op.
  *
  * Scale posture: each version's diff costs O(files that version
  * changed) (the [[Snapshots.rowDiff]] law — copy-on-write file
  * immutability plus the dv-delta semi-join), so a feed consumer pays
  * for WHAT CHANGED, never for table size; the cursor keeps re-syncs
  * from re-reading history.
  *
  * Requires the table to record its schema ([[Snapshots.commitAppend]]
  * `recordSchema = true`): the v0→v1 diff needs a schema for the empty
  * before-side, and the feed's parquet output should be stable across
  * widening commits (both sides of every diff resolve under the newer
  * recorded schema).
  *
  * Reference analog: none (north-star extension) — composes the
  * watermark/cursor discipline (`DP:368`-style) with the snapshot CDC
  * read.
  */
object ChangeFeed {

  private def cursorPath(outDir: String) = s"$outDir/_cursor"

  /** The feed's cursor: the last table version whose diff has been
    * materialized (0 = nothing consumed yet). The cursor FILE's first
    * line is the version; an optional second line records the feed's CDC
    * schema as of that sync (sources with a recorded schema), which lets
    * [[read]] enumerate the dirs under ONE explicit schema instead of
    * `mergeSchema` — schema merging opens every dir's footers in a
    * driver-coordinated job, O(acknowledged versions) metadata work per
    * read that the recorded shape answers for free. */
  def cursor(spark: SparkSession, outDir: String): Long =
    Sinks.readText(spark, cursorPath(outDir))
      .map(_.linesIterator.next().trim.toLong).getOrElse(0L)

  /** The CDC schema the last sync recorded in the cursor file, if any.
    * Dirs acknowledged by that cursor were all written at or before it,
    * and recorded schemas only widen, so reading every acknowledged dir
    * under this shape equals the mergeSchema union (older dirs
    * null-pad). */
  private def cursorSchema(spark: SparkSession, outDir: String)
      : Option[org.apache.spark.sql.types.StructType] =
    Sinks.readText(spark, cursorPath(outDir)).flatMap { txt =>
      val it = txt.linesIterator
      if (!it.hasNext) None
      else {
        it.next()
        if (!it.hasNext) None
        else scala.util.Try(
          org.apache.spark.sql.types.DataType.fromJson(it.next())
            .asInstanceOf[org.apache.spark.sql.types.StructType]).toOption
      }
    }

  /** Materialize diffs for every version in (cursor, currentVersion]
    * under `outDir/v<version>/`, stamped with a `version` column, then
    * advance the cursor. Returns the versions processed (empty = the
    * feed was already current).
    *
    * Pending versions derive CONCURRENTLY (bounded pool): each version's
    * diff is an independent Spark job over its own changed files (the
    * [[Snapshots.rowDiff]] law), so a consumer that lags k versions pays
    * ~max(per-version job) wall-clock instead of the sum — per-version
    * fixed job cost was the dominant term of a catch-up sync. The
    * exactly-once discipline is UNCHANGED: every dir lands before the
    * cursor advances (any failed derivation fails the whole sync,
    * nothing acknowledged), dirs stay deterministic and idempotent, and
    * concurrent jobs write to DISTINCT dirs so they never race each
    * other. */
  def sync(spark: SparkSession, table: String, keys: Seq[String],
           outDir: String): Seq[Long] = {
    val from = cursor(spark, outDir)
    val now = Snapshots.currentVersion(spark, table)
    val vs = (from + 1) to now
    if (vs.isEmpty) return Seq.empty
    // feed dirs follow the same write-then-acknowledge discipline as
    // snapshot data (the cursor is the atomicity point; a crashed sync's
    // partial dir is overwritten wholesale on replay), so they take the
    // same direct-rename committer ([[Snapshots.writeData]])
    if (vs.size == 1) {
      Snapshots.writeData(
        Snapshots.rowDiff(spark, table, now - 1, now, keys)
          .withColumn("version", lit(now)),
        f"$outDir/v$now%010d", overwrite = true)
    } else {
      import scala.concurrent.{Await, ExecutionContext, Future}
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(8, vs.size))
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      try Await.result(Future.sequence(vs.map { v =>
        Future {
          Snapshots.writeData(
            Snapshots.rowDiff(spark, table, v - 1, v, keys)
              .withColumn("version", lit(v)),
            f"$outDir/v$v%010d", overwrite = true)
        }
      }), scala.concurrent.duration.Duration.Inf)
      finally pool.shutdown()
    }
    // record the feed's CDC shape with the cursor (one write — the
    // cursor is still the single acknowledgment object): sources with a
    // recorded schema let readers skip mergeSchema entirely
    val schemaLine = Snapshots.tableSchema(spark, table)
      .map(sc => "\n" + cdcSchema(sc, keys).json).getOrElse("")
    Sinks.writeText(spark, cursorPath(outDir), now.toString + schemaLine)
    vs
  }

  /** Read the materialized feed — exactly the versions the cursor has
    * acknowledged. The cursor is the ledger: a dir written by a crashed
    * sync (data landed, cursor didn't advance) or by a concurrently
    * racing sync is NOT part of the feed until its cursor advance lands,
    * so the read enumerates `v1..vcursor` explicitly instead of globbing
    * the directory (which would surface half-written/unacknowledged
    * dirs). Every enumerated dir exists and is complete by the
    * write-data-then-advance-cursor discipline.
    *
    * Cursor 0 (created-but-never-synced feed) THROWS by contract: with no
    * acknowledged version there is no materialized schema to shape an
    * empty result from. A consumer that may poll before the first sync
    * uses [[readOrEmpty]], which derives the CDC schema from the source
    * table's recorded schema instead. */
  def read(spark: SparkSession, outDir: String): DataFrame = {
    val cur = cursor(spark, outDir)
    require(cur > 0, s"change feed at $outDir has no acknowledged versions yet " +
      "(cursor=0); use readOrEmpty for early-polling consumers")
    val dirs = (1L to cur).map(v => f"$outDir/v$v%010d")
    cursorSchema(spark, outDir) match {
      case Some(sc) => spark.read.schema(sc).parquet(dirs: _*)
      case None     => spark.read.option("mergeSchema", "true").parquet(dirs: _*)
    }
  }

  /** The feed's row shape for a table with recorded schema `sc` and CDC
    * keys `keys`: `keys…, change, <col>_before, <col>_after…, version` —
    * exactly what [[sync]] materializes ([[Snapshots.rowDiff]] plus the
    * version stamp). */
  def cdcSchema(sc: org.apache.spark.sql.types.StructType,
                keys: Seq[String]): org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    StructType(
      keys.map(k => StructField(k, sc(k).dataType, nullable = true)) ++
        Seq(StructField("change", StringType, nullable = true)) ++
        sc.fields.toSeq.filterNot(f => keys.contains(f.name)).flatMap(f => Seq(
          StructField(s"${f.name}_before", f.dataType, nullable = true),
          StructField(s"${f.name}_after", f.dataType, nullable = true))) :+
        StructField("version", LongType, nullable = true))
  }

  /** [[read]], except a cursor-0 feed returns an EMPTY frame in the CDC
    * shape (derived from the source table's recorded schema — present by
    * the feed contract) instead of throwing — the early/empty-feed
    * consumer's entry point. */
  def readOrEmpty(spark: SparkSession, table: String, keys: Seq[String],
                  outDir: String): DataFrame = {
    if (cursor(spark, outDir) > 0) read(spark, outDir)
    else {
      val sc = Snapshots.tableSchema(spark, table).getOrElse(
        throw new IllegalArgumentException(
          s"$table records no schema; a change feed requires recordSchema = true"))
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], cdcSchema(sc, keys))
    }
  }
}
