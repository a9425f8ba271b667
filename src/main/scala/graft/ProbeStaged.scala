package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** COST-LAW PROBE: staged-subquery DML (tuple NOT IN / OR-nested) join
  * shape and wall time vs data size. Prints the physical join operators
  * Spark picks for the staged predicate and the end-to-end DELETE time —
  * the round-15 sf10 curve caught the multi-column NOT IN planning as a
  * BroadcastNestedLoopJoin (790 s at sf10 vs 15 s at sf1, a 51× cliff
  * for 10× data).
  *
  * Run: sbt "runMain graft.ProbeStaged <sfDir>" */
object ProbeStaged {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("benchdata/sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.sql.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tmp = java.nio.file.Files.createTempDirectory("graft_probestaged").toString
    val cat = s"graft_${tmp.hashCode.toHexString.takeRight(8)}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", tmp)
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("n_chars").cast("long").as("n_chars"))
    docs.createOrReplaceTempView("ps_docs")
    val maxId = docs.agg(max(col("doc_id"))).first().getLong(0)
    val w = maxId / 4 + 1
    val tbl = s"$tmp/t"
    (0 until 4).foreach { i =>
      graft.io.Snapshots.commitAppend(
        docs.filter(col("doc_id") >= i * w && col("doc_id") < (i + 1) * w).coalesce(1),
        tbl, recordSchema = i == 0, statsCols = Seq("doc_id"),
        recordRowCounts = true)
    }
    val half = maxId / 2
    // the join shape Spark plans for the staged predicate
    val shape = spark.sql(
      s"""SELECT count(*) FROM $cat.t
         |WHERE (source, n_chars) NOT IN
         |      (SELECT source, n_chars FROM ps_docs WHERE n_chars % 2 = 0)
         |  AND doc_id <= $half""".stripMargin)
      .queryExecution.executedPlan.toString
    println("join ops: " + Seq("BroadcastNestedLoopJoin", "CartesianProduct",
      "BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin")
      .filter(shape.contains).mkString(","))
    val t0 = System.nanoTime()
    spark.sql(s"""DELETE FROM $cat.t
                 |WHERE (source, n_chars) NOT IN
                 |      (SELECT source, n_chars FROM ps_docs WHERE n_chars % 2 = 0)
                 |  AND doc_id <= $half""".stripMargin)
    println(f"{'probe':'staged','delete_s':${(System.nanoTime() - t0) / 1e9}%.1f}")
    val t1 = System.nanoTime()
    spark.sql(s"""UPDATE $cat.t SET n_chars = n_chars + 50000
                 |WHERE doc_id IN (SELECT doc_id FROM ps_docs WHERE source = 'src3')
                 |   OR doc_id > ${maxId - 5}""".stripMargin)
    println(f"{'probe':'staged','update_s':${(System.nanoTime() - t1) / 1e9}%.1f}")
    spark.stop()
  }
}
