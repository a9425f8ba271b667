package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** NAMED BRANCHES — the Nessie/Iceberg-branch workflow unified over the
  * existing tag + WAP-clone machinery (zero new commit semantics):
  *
  * {{{
  *   Branches.create(spark, corpus, "exp1")     // O(metadata) fork
  *   ... write to the branch through every surface: the library
  *       mutators on Branches.path(corpus, "exp1"), or SQL
  *       (`INSERT INTO cat.corpus._branches.exp1`, DML, MERGE) ...
  *   SELECT ... FROM cat.corpus VERSION AS OF 'exp1'   -- read the head
  *   Branches.merge(spark, corpus, "exp1")      // fast-forward publish
  * }}}
  *
  *  - A branch IS a [[Wap]] clone at the deterministic path
  *    `<table>/_branches/<name>`: creation is one metadata commit, the
  *    source holds a retractable `wap-` lifecycle pin at the fork base,
  *    so [[Snapshots.expireVersions]] cannot strand shared files while
  *    the branch lives (expiry respects branch pins exactly like tag
  *    pins).
  *  - Reads resolve through `VERSION AS OF '<branch>'` on the SOURCE
  *    table ([[graft.sql.GraftCatalog]]: tag first, then branch, then
  *    version number) or directly against the branch path.
  *  - [[merge]] is [[Wap.publish]]: ONE atomic swap commit in the source
  *    expressed against the fork base, fast-forwarding over append-only
  *    source advances and refusing conflicting ones (re-branch to
  *    rebase); the branch then closes (its rehomed files live on in the
  *    source; pre-merge source versions keep time-traveling).
  *  - [[drop]] abandons: the pin retracts, the branch directory deletes
  *    (its data files were either shared — still referenced by the
  *    source — or branch-local garbage).
  *
  * Reference analog: none (north-star extension) — the multi-writer
  * experiment workflow a single-writer pipeline never needed.
  */
object Branches {

  private def branchRoot(table: String) = s"$table/_branches"

  /** The branch's own table path — every library mutator and the SQL
    * catalog (`cat.<table>._branches.<name>`) address it directly. */
  def path(table: String, name: String): String = {
    require(name.nonEmpty && name.forall(c =>
      c.isLetterOrDigit || c == '.' || c == '_' || c == '-'),
      s"branch name '$name' must be [A-Za-z0-9._-]")
    s"${branchRoot(table)}/$name"
  }

  /** Fork `table`@`version` (default current) as branch `name` — one
    * metadata commit, no data copied. Refuses a name already taken by a
    * live branch (Wap.clone) or by a tag (the `VERSION AS OF` namespace
    * resolves tags first; shadowing would silently read the tag). */
  def create(spark: SparkSession, table: String, name: String,
             version: Option[Long] = None): Long = {
    require(!Snapshots.tags(spark, table).contains(name),
      s"'$name' is already a tag on $table; branch names share the " +
        "VERSION AS OF namespace")
    Wap.clone(spark, table, path(table, name), version)
  }

  /** Live branches of `table`. */
  def list(spark: SparkSession, table: String): Seq[String] = {
    val dir = new Path(branchRoot(table))
    val f = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(dir)) Nil
    else f.listStatus(dir).toSeq.filter(_.isDirectory).map(_.getPath.getName)
      .filter(n => f.exists(new Path(s"${branchRoot(table)}/$n/_manifest")))
      .sorted
  }

  /** The branch head's version (of the BRANCH's own history). */
  def head(spark: SparkSession, table: String, name: String): Long =
    Snapshots.currentVersion(spark, path(table, name))

  /** Fast-forward publish: the branch's state becomes the source's next
    * version as ONE atomic commit ([[Wap.publish]] — append-only source
    * advances fast-forward, conflicting ones refuse with the re-branch
    * rewrite). The branch closes. */
  def merge(spark: SparkSession, table: String, name: String): Wap.PublishResult = {
    val r = Wap.publish(spark, path(table, name))
    deleteTree(spark, path(table, name))
    r
  }

  /** Abandon the branch: retract the source's lifecycle pin, delete the
    * branch directory. Branch-local data files are unreferenced by the
    * source and die with it; shared files stay referenced by the source's
    * own manifests. */
  def drop(spark: SparkSession, table: String, name: String): Unit = {
    Wap.abandon(spark, path(table, name))
    deleteTree(spark, path(table, name))
  }

  private def deleteTree(spark: SparkSession, p: String): Unit = {
    val hp = new Path(p)
    val f = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.delete(hp, true)
  }
}
