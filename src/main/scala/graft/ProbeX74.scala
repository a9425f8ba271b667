package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway diagnostic (the ProbeSt20 pattern): WORK counts for x74's
  * CCNet perplexity-bucketing at a given sf dir — separates "the
  * workload grows super-linearly" from "the single node hit a
  * memory/spill wall" for the observed sf10→sf100 wall-step before any
  * timing claim is made. Prints the four quantities that bound x74's
  * shuffles: the bigram stream size (rows shuffled by the count
  * aggregations and the score join), distinct (w1,w2) pairs and distinct
  * w1 contexts (reduce-side state), and vocabulary (broadcast scalar).
  * Linear stream growth with SUBLINEAR pair/vocab growth = linear work;
  * any time step beyond that ratio is memory-system, not plan.
  *
  *   sbt "runMain graft.ProbeX74 benchdata/sf10"
  */
object ProbeX74 {
  def main(args: Array[String]): Unit = {
    val d = args.lift(0).getOrElse("benchdata/sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.load(spark, d, "documents")
    val toks = docs.select(col("doc_id"),
      filter(split(lower(col("text")), "\\s+"), x => x =!= "").as("t"))
    // the exact bigram-stream shape LmScore.bigrams produces
    val bg = toks.select(col("doc_id"), explode(zip_with(
        slice(col("t"), lit(1), greatest(size(col("t")) - 1, lit(0))),
        slice(col("t"), lit(2), greatest(size(col("t")) - 1, lit(0))),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val r = bg.agg(
      count(lit(1)).as("n_bigrams"),
      count_distinct(col("w1"), col("w2")).as("n_pairs"),
      count_distinct(col("w1")).as("n_ctx")).first()
    val nDocs = docs.count()
    val vocab = toks.select(explode(col("t")).as("w"))
      .agg(count_distinct(col("w"))).first().getLong(0)
    println(s"[probe-x74] sf=$d docs=$nDocs bigrams=${r.getLong(0)} " +
      s"pairs=${r.getLong(1)} ctx=${r.getLong(2)} vocab=$vocab")
    spark.stop()
  }
}
