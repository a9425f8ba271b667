package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** MULTI-TABLE TRANSACTIONS over snapshot tables — the index-and-data
  * pair every serving stack runs (x85's BM25 index beside its corpus,
  * st16's vector index beside its documents): two tables must move
  * together, and a reader must never observe the index ahead of (or
  * behind) the data it was derived from.
  *
  * Two separate manifest logs cannot be made atomic by ordering alone —
  * there is always an instant between the two commits. The consistent
  * cut is therefore published through a LEDGER: itself a snapshot table
  * (manifest-only, no data files) whose each commit carries one note per
  * member table, `<table>@<version>`. A ledger commit is ONE atomic
  * create-exclusive publish ([[Snapshots.commit]]), so the PAIR becomes
  * visible in a single step:
  *
  *  1. write + commit each member table independently (their own
  *     optimistic-concurrency rules apply, versions vA, vB, …);
  *  2. [[publish]] the map {A→vA, B→vB} as one ledger commit.
  *
  * Readers that need cross-table consistency [[resolve]] the ledger's
  * newest cut and time-travel each member to its pinned version
  * ([[readConsistent]]) — a crash or race between steps 1 and 2 leaves
  * the previous cut in force (both tables read at their OLD versions:
  * stale-but-consistent, never mixed). Direct readers of one table see
  * that table's ordinary current version; consistency across tables is
  * exactly the ledger's contract, the same split every catalog-level
  * transaction design makes.
  *
  * Cost is metadata-only at any scale: the ledger commit is one small
  * file; members' versions are already durable. History/audit for free:
  * every past cut is a ledger version, so "the corpus+index as of
  * yesterday" is [[resolveAt]] at the ledger's own TIMESTAMP AS OF.
  *
  * Reference analog: none (north-star extension).
  */
object MultiTable {

  private val NotePattern = """(.+)@(\d+)""".r

  /** Publish a consistent cut: one atomic ledger commit noting each
    * member's version. Retries version races (the note payload is
    * derivation-free). Returns the ledger version. */
  def publish(spark: SparkSession, ledger: String,
              cut: Map[String, Long]): Long = {
    require(cut.nonEmpty, "a cut needs at least one member table")
    var attempts = 0
    while (true) {
      try {
        return Snapshots.commit(spark, ledger, adds = Nil,
          notes = cut.toSeq.sortBy(_._1).map { case (t, v) => s"$t@$v" })
      } catch {
        case _: Snapshots.ConcurrentCommitException if attempts < 50 =>
          attempts += 1
      }
    }
    0L // unreachable
  }

  /** The newest published cut (empty before the first publish). */
  def resolve(spark: SparkSession, ledger: String): Map[String, Long] =
    resolveAt(spark, ledger, Snapshots.currentVersion(spark, ledger))

  /** The cut as of a ledger version — cuts are immutable history, so
    * yesterday's corpus+index pair replays forever. */
  def resolveAt(spark: SparkSession, ledger: String,
                version: Long): Map[String, Long] = {
    if (version == 0L) return Map.empty
    Snapshots.history(spark, ledger).find(_.version == version)
      .map(_.notes.collect { case NotePattern(t, v) => t -> v.toLong }.toMap)
      .getOrElse(throw new IllegalArgumentException(
        s"ledger $ledger has no version $version"))
  }

  /** Read one member at the newest cut's pinned version — the
    * cross-table-consistent read. Throws if the table is not part of
    * the cut (reading it "consistently" would be a lie). */
  def readConsistent(spark: SparkSession, ledger: String,
                     table: String): DataFrame = {
    val cut = resolve(spark, ledger)
    val v = cut.getOrElse(table, throw new IllegalArgumentException(
      s"$table is not a member of the newest cut of $ledger " +
        s"(members: ${cut.keys.toSeq.sorted.mkString(", ")})"))
    Snapshots.readAt(spark, table, Some(v))
  }
}
