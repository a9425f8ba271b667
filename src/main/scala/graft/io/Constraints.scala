package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CHECK CONSTRAINTS — engine-enforced row invariants (the ANSI /
  * Delta-Lake shape): `ALTER TABLE t ADD CONSTRAINT positive CHECK
  * (amount > 0)` validates the EXISTING rows once, then every write path
  * that introduces new row content (INSERT, streaming ingest, UPDATE,
  * MERGE, INSERT OVERWRITE) validates its change before the manifest
  * commit — a violation aborts with nothing committed (the written files
  * are unreferenced orphans, [[Snapshots.vacuum]] food, exactly like any
  * lost optimistic writer).
  *
  * Placement of the gate is the scale story: validation reads back the
  * freshly WRITTEN change files, never the logical plan that produced
  * them — so the (possibly expensive) producing plan is not computed
  * twice, the scan is column-pruned to the constraint's columns, all
  * constraints check in ONE aggregation pass, and the cost is O(change),
  * never O(table). Layout-only commits (OPTIMIZE, compaction, clone,
  * publish rehomes, restore) skip the gate — they move rows that were
  * already validated.
  *
  * Constraints ride as table properties (`graft.constraint.<name>` =
  * predicate SQL), so they are transactional, time-traveling, carried by
  * clones/branches, and surfaced through the DSv2 `Table.constraints()`
  * API. NULL semantics are SQL's: a row violates only when the predicate
  * is FALSE — UNKNOWN passes. */
object Constraints {

  val Prefix = "graft.constraint."

  /** The table's CHECK constraints at the current version:
    * (name, predicate SQL), name-sorted. */
  def of(spark: SparkSession, table: String): Seq[(String, String)] =
    Snapshots.tableProperties(spark, table).collect {
      case (k, v) if k.startsWith(Prefix) => k.drop(Prefix.length) -> v
    }.toSeq.sortBy(_._1)

  /** Rows of `df` violating the predicate — FALSE only (SQL three-valued
    * CHECK: NULL passes). */
  def violations(df: DataFrame, predicateSql: String): DataFrame =
    df.filter(!coalesce(expr(predicateSql), lit(true)))

  /** Validate `df` (a CHANGE-sized frame) against every constraint of
    * `table` in one aggregation pass; throws naming the first violated
    * constraint. No-op (one metadata lookup) when the table has none. */
  def validate(spark: SparkSession, table: String, df: => DataFrame,
               what: String): Unit = {
    val cs = of(spark, table)
    if (cs.isEmpty) return
    val aggs = cs.map { case (n, sql) =>
      max(when(!coalesce(expr(sql), lit(true)), 1L).otherwise(0L)).as(n)
    }
    val row = df.agg(aggs.head, aggs.tail: _*).first()
    cs.indices.find(i => !row.isNullAt(i) && row.getLong(i) == 1L).foreach { i =>
      throw new IllegalArgumentException(
        s"CHECK constraint '${cs(i)._1}' (${cs(i)._2}) violated by $what " +
          s"rows of $table; nothing was committed")
    }
  }

  /** Ride the table's CHECK constraints ON the write itself: returns the
    * frame to write (instrumented with an [[org.apache.spark.sql
    * .Observation]] when constraints exist — plus any caller-supplied
    * `extraAggs`, e.g. a leak-check or identity watermark) and a check
    * thunk to call AFTER the write and BEFORE the manifest commit.
    *
    * Same contract as [[validate]], one read cheaper: the metrics are
    * computed by the write job as rows flow to the files, so the
    * (possibly TB-sized at 100 TB) change is never re-read. ABORT TIMING
    * IS UNCHANGED — the files are fully written and still unreferenced
    * when the thunk throws; a violation leaves orphans for
    * [[Snapshots.vacuum]], exactly like the read-back gate did. The
    * aggregates are max/min-shaped, so a retried or speculated task
    * re-contributing its rows cannot change the verdict. The thunk
    * returns the observed row (constraint flags first, `extraAggs`
    * after) for callers that fused their own metrics in; it never
    * blocks, because the write action has already completed. */
  def observed(spark: SparkSession, table: String, df: DataFrame,
               what: String, extraAggs: Seq[org.apache.spark.sql.Column] = Nil)
      : (DataFrame, () => Map[String, Any]) = {
    val cs = of(spark, table)
    if (cs.isEmpty && extraAggs.isEmpty) return (df, () => Map.empty)
    val obs = org.apache.spark.sql.Observation(
      s"graft_checks_${java.util.UUID.randomUUID().toString.take(8)}")
    val aggs = cs.map { case (n, sql) =>
      max(when(!coalesce(expr(sql), lit(true)), 1L).otherwise(0L)).as(n)
    } ++ extraAggs
    val instrumented = df.observe(obs, aggs.head, aggs.tail: _*)
    (instrumented, () => {
      val row = obs.get
      cs.find(c => row.get(c._1).exists(v => v != null && v == 1L)).foreach { c =>
        throw new IllegalArgumentException(
          s"CHECK constraint '${c._1}' (${c._2}) violated by $what " +
            s"rows of $table; nothing was committed")
      }
      row
    })
  }

  /** The word-boundary guard column evolution uses: does any constraint's
    * predicate SQL mention `column`? (Renaming or dropping a constrained
    * column would silently break the stored predicate — refuse and point
    * at the constraint instead.) */
  def mentioning(spark: SparkSession, table: String, column: String): Seq[String] = {
    val re = java.util.regex.Pattern.compile(
      "(^|[^A-Za-z0-9_`])" + java.util.regex.Pattern.quote(column) +
        "($|[^A-Za-z0-9_`])")
    of(spark, table).collect {
      case (n, sql) if re.matcher(sql).find() => n
    }
  }
}
