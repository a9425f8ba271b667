package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.StreamSourceProvider
import org.apache.spark.sql.types.StructType

import graft.io.{ChangeFeed, Snapshots}

/** STREAMING CHANGE-FEED SOURCE over a snapshot table — `readStream`
  * directly on a table's CDC, completing [[graft.io.ChangeFeed]]'s
  * pull-only story: a downstream consumer (index maintenance, a
  * continuously-maintained view, a training-delta builder) subscribes
  * instead of polling, and Structured Streaming's checkpoint owns the
  * progress cursor.
  *
  * {{{
  *   spark.readStream.format("graft.streaming.CdcSourceProvider")
  *     .option("table", tbl).option("keys", "doc_id")
  *     .option("feed", feedDir).load()
  * }}}
  *
  * Semantics — offsets ARE table versions:
  *  - Each trigger [[ChangeFeed.sync]]s the feed (materializing any new
  *    versions' diffs under deterministic `v%010d` dirs) and offers the
  *    feed cursor as the offset; a micro-batch covers the versions in
  *    `(start, end]`, stamped per row in the `version` column. At a
  *    steady trigger cadence each table commit arrives as its own
  *    micro-batch; a consumer catching up after downtime gets the lag as
  *    one batch — the same deliberate coalescing as
  *    [[graft.io.ViewMaintenance]]'s catch-up (fixed costs dominate; the
  *    per-row algebra is version-stamped either way).
  *  - Exactly-once across crash replays: offsets live in the streaming
  *    checkpoint; a replayed batch re-reads the same immutable version
  *    dirs (sync's crash-overwrite discipline guarantees a dir is
  *    complete once its cursor advanced). Downstream sinks replaying a
  *    committed batch are the sink's contract, as for every source —
  *    [[graft.io.ViewMaintenance.applyDeltaBatch]] closes that half with
  *    the view table's note ledger.
  *  - Scale: a trigger costs O(files changed by the new versions)
  *    ([[Snapshots.rowDiff]]'s CoW law) plus one cursor read — never
  *    O(table). The table needs a recorded schema (the feed contract).
  *
  * Reference analog: none (north-star extension) — the streaming half of
  * the CDC surface every lakehouse format pairs with its change feed.
  */
class CdcSourceProvider extends StreamSourceProvider {

  private def required(params: Map[String, String], k: String): String =
    params.getOrElse(k, throw new IllegalArgumentException(
      s"graft-cdc source needs option '$k'"))

  /** The `table` option accepts a filesystem path OR a catalog-qualified
    * name (`<catalog>.<ns...>.<table>` — any dotted value without a
    * path separator): names resolve through the session's registered
    * `spark.sql.catalog.<catalog>.root`, so the streaming subscriber
    * names tables THE SAME WAY its batch SQL does. */
  private def resolveTable(spark: org.apache.spark.sql.SparkSession,
                           v: String): String =
    if (v.contains('/') || !v.contains('.')) v
    else {
      val parts = v.split('.')
      spark.conf.getOption(s"spark.sql.catalog.${parts.head}.root") match {
        case Some(root) => (root +: parts.tail).mkString("/")
        case None => v // a dotted directory name, not a catalog reference
      }
    }

  override def sourceSchema(ctx: SQLContext, schema: Option[StructType],
                            providerName: String,
                            params: Map[String, String]): (String, StructType) = {
    val table = resolveTable(ctx.sparkSession, required(params, "table"))
    val keys = required(params, "keys").split(',').toSeq
    val sc = Snapshots.tableSchema(ctx.sparkSession, table).getOrElse(
      throw new IllegalArgumentException(
        s"$table records no schema; a change feed requires recordSchema = true"))
    ("graft-cdc", ChangeFeed.cdcSchema(sc, keys))
  }

  override def createSource(ctx: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            params: Map[String, String]): Source =
    new CdcSource(ctx.sparkSession,
      resolveTable(ctx.sparkSession, required(params, "table")),
      required(params, "keys").split(',').toSeq, required(params, "feed"))
}

/** STREAMING SINK format for transactional snapshot ingest — the write
  * half of the CDC symmetry ([[CdcSourceProvider]] streams a table OUT;
  * this streams one IN):
  *
  * {{{
  *   df.writeStream.format("graft.streaming.SnapshotSinkProvider")
  *     .option("table", tbl).option("checkpointLocation", ckpt).start()
  * }}}
  *
  * Every micro-batch lands as ONE manifest transaction via
  * [[Snapshots.commitBatchOnce]] — the table gains a version per batch,
  * any historical version stays readable while ingest streams on, and
  * exactly-once holds on TWO independent ledgers: the streaming
  * checkpoint (offsets) and the manifest itself (deterministic per-batch
  * data dirs — a replayed batch that already committed is skipped, one
  * that crashed mid-write overwrites its own directory). The same gate
  * [[SnapshotIngest.start]] runs via foreachBatch, exposed as a format
  * so plain `writeStream` pipelines compose without code.
  *
  * With `.option("branch", name)` the stream lands in a WAP BRANCH of
  * the table instead of the table itself — streaming write-audit-publish,
  * the audit-then-publish discipline production ingest wants: the branch
  * forks from the table's CURRENT version at the first non-empty batch
  * of a drain (O(metadata), [[graft.io.Branches.create]]), every batch
  * commits to the branch while the main table serves reads UNTOUCHED,
  * and after the drain is audited, `CALL fast_forward(t, branch)` (or
  * [[graft.io.Branches.merge]]) publishes the whole drain as ONE atomic
  * commit. The branch closes on publish; the NEXT drain re-forks from
  * the just-published state automatically — each drain is one
  * fork→ingest→audit→publish cycle. Crash-restart mid-drain resumes on
  * the live branch exactly like plain ingest (checkpoint offsets + the
  * branch's own batch-dir ledger); a replayed batch that already
  * committed to the branch is skipped. */
class SnapshotSinkProvider extends org.apache.spark.sql.sources.StreamSinkProvider {
  override def createSink(ctx: SQLContext, params: Map[String, String],
                          partitionColumns: Seq[String],
                          outputMode: org.apache.spark.sql.streaming.OutputMode)
      : org.apache.spark.sql.execution.streaming.Sink = {
    // same name resolution as the source: a catalog-qualified name works
    // wherever a path does (CdcSourceProvider.resolveTable semantics)
    val raw = params.getOrElse("table", throw new IllegalArgumentException(
      "graft snapshot sink needs option 'table'"))
    val table =
      if (raw.contains('/') || !raw.contains('.')) raw
      else {
        val parts = raw.split('.')
        ctx.sparkSession.conf.getOption(s"spark.sql.catalog.${parts.head}.root")
          .map(root => (root +: parts.tail).mkString("/")).getOrElse(raw)
      }
    val branch = params.get("branch")
    new org.apache.spark.sql.execution.streaming.Sink {
      override def addBatch(batchId: Long, data: DataFrame): Unit = {
        val s = data.sparkSession
        val target = branch match {
          case Some(b) =>
            // fork lazily at the first batch of a drain; after a publish
            // closed the branch, the next drain re-forks from the
            // just-published state (existence check is O(metadata) and
            // a crash between fork and first commit just re-finds the
            // already-created branch)
            if (!graft.io.Branches.list(s, table).contains(b))
              graft.io.Branches.create(s, table, b)
            graft.io.Branches.path(table, b)
          case None => table
        }
        Snapshots.commitBatchOnce(s, target, batchId,
          org.apache.spark.sql.graft.StreamShim.asBatch(data))
      }
      override def toString: String =
        s"GraftSnapshotSink($table${branch.fold("")("@" + _)})"
    }
  }
}

/** One table-version offset; json = the version number. */
private[streaming] case class CdcOffset(version: Long) extends Offset {
  override def json: String = version.toString
}

private[streaming] class CdcSource(spark: SparkSession, table: String,
                                   keys: Seq[String], feed: String) extends Source {

  override val schema: StructType = ChangeFeed.cdcSchema(
    Snapshots.tableSchema(spark, table).getOrElse(
      throw new IllegalArgumentException(
        s"$table records no schema; a change feed requires recordSchema = true")),
    keys)

  private def parse(o: Offset): Long = o match {
    case CdcOffset(v) => v
    case other        => other.json.trim.toLong // SerializedOffset after restart
  }

  /** Materialize new versions, then offer the cursor. None until the
    * first version lands (empty stream, not an error). */
  override def getOffset: Option[Offset] = {
    ChangeFeed.sync(spark, table, keys, feed)
    val cur = ChangeFeed.cursor(spark, feed)
    if (cur == 0L) None else Some(CdcOffset(cur))
  }

  /** The CDC rows of versions `(start, end]` — immutable, replay-stable
    * dirs; the batch re-resolves identically after a crash. */
  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(parse).getOrElse(0L) + 1
    val to = parse(end)
    val dirs = (from to to).map(v => f"$feed/v$v%010d")
    val df =
      if (dirs.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else spark.read.option("mergeSchema", "true").parquet(dirs: _*)
        .select(schema.fieldNames.map(col).toIndexedSeq: _*)
    org.apache.spark.sql.graft.StreamShim.asStreaming(df)
  }

  override def stop(): Unit = ()
}
