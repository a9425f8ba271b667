package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Benchmark decontamination: k-gram overlap detection and removal. */
class ContaminationSpec extends SparkSpec {
  import spark.implicits._

  private val bench = Seq(
    (1L, "the capital of france is paris obviously"),
    (2L, "two plus two equals four said the teacher")
  ).toDF("bid", "btext")

  private val docs = Seq(
    (10L, "everyone knows the capital of france is paris obviously right"), // contains bench 5-grams
    (11L, "a completely clean document about gardening and soil quality"),
    (12L, "my exam said two plus two equals four said the teacher loudly"), // contains bench 5-grams
    (13L, "the capital of spain is madrid which is different")              // shares <5-gram overlap only
  ).toDF("doc_id", "text")

  test("contaminatedDocs flags exactly the docs sharing a 5-gram, with exact counts") {
    val out = Contamination.contaminatedDocs(docs, $"doc_id", $"text", bench, $"btext", k = 5)
      .orderBy("id").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(10L, 12L))
    // doc 10: "the capital of france is" / "capital of france is paris" /
    // "of france is paris obviously" → 3 shared 5-grams, each once
    val d10 = out.find(_.getLong(0) == 10L).get
    assert(d10.getAs[Long]("n_hits") === 3L)
    assert(d10.getAs[Long]("n_grams") === 3L)
    // doc 12: "two plus two equals four" ... "four said the teacher" start
    // at 4 positions → 4 shared 5-grams
    val d12 = out.find(_.getLong(0) == 12L).get
    assert(d12.getAs[Long]("n_hits") === 4L)
    assert(d12.getAs[Long]("n_grams") === 4L)
  }

  test("a repeated contaminated k-gram counts every occurrence once per position") {
    val doc = Seq((20L, "the capital of france is paris obviously and again " +
      "the capital of france is paris obviously")).toDF("doc_id", "text")
    val out = Contamination.contaminatedDocs(doc, $"doc_id", $"text", bench, $"btext", k = 5)
      .collect().head
    assert(out.getAs[Long]("n_hits") === 6L)  // 3 grams × 2 occurrences
    assert(out.getAs[Long]("n_grams") === 3L) // distinct grams unchanged
  }

  test("decontaminate removes flagged docs and nothing else") {
    val kept = Contamination.decontaminate(docs, $"doc_id", $"text", bench, $"btext", k = 5)
      .select("doc_id").as[Long].collect().sorted
    assert(kept === Array(11L, 13L))
  }

  test("benchmark grams broadcast; corpus side never shuffles before the join") {
    // parquet-backed frames: ConvertToLocalRelation folds toDF fixtures at
    // planning time and hides the real plan shape
    val dir = java.nio.file.Files.createTempDirectory("graft_contam").toString
    docs.write.mode("overwrite").parquet(s"$dir/docs")
    bench.write.mode("overwrite").parquet(s"$dir/bench")
    val plan = Contamination.contaminatedDocs(
        spark.read.parquet(s"$dir/docs"), $"doc_id", $"text",
        spark.read.parquet(s"$dir/bench"), $"btext", k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    // shuffles: the benchmark-side gram distinct (small side — fine) and
    // the per-doc hit aggregation; the exploded CORPUS stream must not be
    // among them — its only consumer below the agg is the broadcast join
    val shuffleLines = plan.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(shuffleLines.size <= 3, plan)
    assert(!shuffleLines.exists(_.contains("doc_id")),
      s"corpus stream shuffled before the join:\n$plan")
  }

  test("noveltyScores counts distinct doc k-grams and how many the reference holds") {
    val ref = Seq((1L, "alpha beta gamma delta epsilon")).toDF("rid", "rtext")
    val scored = Seq(
      // 3-grams: [alpha beta gamma, beta gamma delta, gamma delta zeta]
      // → first two in ref, third not → (3, 2)
      (10L, "alpha beta gamma delta zeta"),
      // all grams novel → (2, 0)
      (11L, "one two three four"),
      // repeated gram counted ONCE (distinct): "alpha beta gamma" twice
      (12L, "alpha beta gamma alpha beta gamma"),
      // < k tokens → no grams → absent from output
      (13L, "too short")
    ).toDF("doc_id", "text")
    val out = Contamination.noveltyScores(scored, $"doc_id", $"text", ref, $"rtext", k = 3)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // doc 12 distinct grams: [alpha beta gamma, beta gamma alpha,
    // gamma alpha beta] → only the first is in ref
    assert(out.toSeq === Seq((10L, 3L, 2L), (11L, 2L, 0L), (12L, 3L, 1L)))
  }
}
