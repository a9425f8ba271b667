package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale-up generator: replicates an existing sf dir N× with
  * consistent key shifting, producing the next scale factor for the scaling
  * curve (BENCH at sf0.1 vs sf1 — the measured 10× datapoint behind every
  * "scale-safe" plan claim).
  *
  *   sbt "runMain graft.GenScale /root/testdata/sf0.1 benchdata/sf1 10"
  *
  * Replica r shifts every key/id column by r × 10⁸, so foreign keys keep
  * joining within a replica and the join/agg cardinality structure scales
  * linearly. Two columns get content perturbation so workload SHAPE (not
  * just volume) scales honestly:
  *
  *   - `documents.text`: every token gets a replica suffix (`_rN`) —
  *     replicas are shingle-disjoint, so near-dup pair counts scale ×N
  *     (naive replication would make every doc a 10-way exact duplicate
  *     and blow candidate generation up quadratically — not a workload
  *     that exists at real 10×);
  *   - `embeddings.embedding`: a deterministic per-(replica, vec_id, dim)
  *     offset at component scale pushes cross-replica cosine to ≈0.7, so
  *     neighborhoods are replica-local at every realistic threshold instead
  *     of minting N-way twins.
  *
  * `region`/`nation` stay fixed (TPC-H dimension semantics: nationkey
  * references remain 0-24). Timestamps/dates are kept as-is — per-window
  * and per-month row counts scale ×N, user/session counts scale ×N.
  */
object GenScale {

  val Shift = 100000000L // 1e8 — far above any intra-replica id range

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("benchdata/sf1")
    val replicas = args.lift(2).map(_.toInt).getOrElse(10)
    // optional 4th arg: per-replica key shift. Scaling an ALREADY-SCALED
    // dir needs a shift above ITS id range (e.g. sf10 → sf100 with
    // shift=1e10 and 10 replicas — a 1000-way union from sf0.1 would also
    // work but builds a thousand-child plan; two-level scaling keeps the
    // union width ≤ 10 at every step). The default keeps the historical
    // single-level behavior.
    val shift = args.lift(3).map(_.toLong).getOrElse(Shift)
    // optional 5th arg: the replica TAG in the documents token suffix
    // (`_<tag><r>`). Every scaling LEVEL must use a distinct tag: with a
    // shared tag, level-1-replica-A ∘ level-2-replica-0 and
    // level-1-replica-0 ∘ level-2-replica-A both end at suffix `_rA` —
    // byte-identical text, i.e. tens of thousands of cross-replica EXACT
    // duplicates that silently break the shingle-disjointness the whole
    // curve's near-dup workload claim rests on (caught when x110's sf10
    // output grew 22× for 10× rows).
    val tag = args.lift(4).getOrElse("r")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def load(name: String): DataFrame = Tables.load(spark, src, name)

    /** N replicas of `df`, shifting `keys` by r×Shift; `mutate` applies
      * per-replica content perturbation. */
    def scale(df: DataFrame, keys: Seq[String])
             (mutate: (DataFrame, Int) => DataFrame = (d, _) => d): DataFrame =
      (0 until replicas).map { r =>
        val shifted = keys.foldLeft(df)((d, k) =>
          d.withColumn(k, col(k) + lit(r * shift)))
        mutate(shifted, r)
      }.reduce(_ unionByName _)

    def write(df: DataFrame, name: String): Unit = {
      df.write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"[genscale] $name: ${spark.read.parquet(s"$dst/$name.parquet").count()} rows")
    }

    // fixed dimensions — copied verbatim
    write(load("region"), "region")
    write(load("nation"), "nation")

    // key-derived NAME columns must NOT replicate verbatim (N-way exact
    // duplicates → quadratic phantom pairs in every name-keyed operator;
    // caught when x113's sf1 output was 27M pairs for a 1.5M-row table)
    // — but the round-8 fix (re-formatting the SHIFTED key into the name)
    // was still edit-distance-1 across replicas: two copies of base key k
    // formatted as %09d of r·shift+k differ ONLY in the replica digit, so
    // the ED-1 fuzzy join saw R·(R-1)/2 cross-replica pairs per base key
    // (quadratic in R — x113's 12.4× sf1→sf10 step was exactly this,
    // ~46.7M of sf10's 47.2M output pairs being generator-minted).
    // Instead append a suffix with every character DOUBLED — the level
    // tag too, not just the replica digits: `_r99` (level-1 replica 9)
    // vs `_s99` (level-2 replica 9) differ only in the tag letter, which
    // is ED-1 again (caught at sf10: exactly 15000 base keys × 9 such
    // tag-letter pairs = 135k phantom pairs). With `_rr99` vs `_ss99`
    // any two distinct suffixes (and any suffix vs none, within or
    // across scaling levels) differ by ≥2 edits, so cross-replica names
    // are never ED-1 and fuzzy-join output scales ×N with the data like
    // every other operator's workload.
    def dd(s: String): String = s.flatMap(c => s"$c$c")
    def suffix(r: Int): String = s"_${dd(tag)}${dd(r.toString)}"
    write(scale(load("customer"), Seq("c_custkey")) { (d, r) =>
      if (r == 0) d
      else d.withColumn("c_name", concat(col("c_name"), lit(suffix(r))))
    }, "customer")
    write(scale(load("supplier"), Seq("s_suppkey")) { (d, r) =>
      if (r == 0) d
      else d.withColumn("s_name", concat(col("s_name"), lit(suffix(r))))
    }, "supplier")
    write(scale(load("part"), Seq("p_partkey"))(), "part")
    write(scale(load("orders"), Seq("o_orderkey", "o_custkey"))(), "orders")
    write(scale(load("lineitem"), Seq("l_orderkey", "l_partkey", "l_suppkey"))(), "lineitem")
    write(scale(load("events"), Seq("event_id", "user_id"))(), "events")

    write(scale(load("documents"), Seq("doc_id")) { (d, r) =>
      if (r == 0) d
      else d.withColumn("text",
          regexp_replace(col("text"), "(\\S+)", "$1_" + tag + r))
        .withColumn("n_chars", length(col("text")).cast("long"))
    }, "documents")

    write(scale(load("embeddings"), Seq("vec_id")) { (d, r) =>
      if (r == 0) d
      else d
        // deterministic per-(replica, vec_id, dim) offset, amplitude ±0.22
        // ≈ the component scale (unit-norm 64-dim ⇒ |x| ≈ 0.125), dropping
        // a copy's cross-replica cosine to ≈0.7 — below every dedup/ANN
        // threshold, so neighborhoods are genuinely replica-local for
        // NEAR-dup structure, not just exact duplicates. (A constant
        // per-replica shift only moved cosine by ~1e-4.) Renormalized so
        // the corpus stays unit-norm.
        .withColumn("__p", transform(col("embedding"), (x, i) =>
          x.cast("double") +
            (pmod(xxhash64(col("vec_id"), lit(r), i), lit(2000001L)) - 1000000L)
              .cast("double") / 1000000.0 * 0.22))
        .withColumn("__norm", sqrt(aggregate(col("__p"), lit(0.0), (a, x) => a + x * x)))
        .withColumn("embedding", transform(col("__p"), x => (x / col("__norm")).cast("float")))
        .drop("__p", "__norm")
    }, "embeddings")

    spark.stop()
  }
}
