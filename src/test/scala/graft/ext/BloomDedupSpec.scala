package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bloom-accelerated incremental dedup: exactness of the exact mode,
  * bounded loss of the lossy mode, no-false-negative guarantee. */
class BloomDedupSpec extends SparkSpec {
  import spark.implicits._

  private def mkDocs(ids: Range, tag: String) =
    ids.map(i => (i.toLong, s"document $tag number $i with deterministic content"))
      .toDF("id", "text").withColumn("digest", md5(col("text").cast("binary")))

  test("exact mode is bit-identical to the plain anti-join") {
    val history = mkDocs(0 until 1000, "hist")
    // incoming: 500 true dups of history + 500 genuinely new
    val incoming = mkDocs(500 until 1500, "hist")
    val bloom = BloomDedup.historyBloom(history, "digest", expectedItems = 1000)
    val got = BloomDedup.antiJoinExact(incoming, history, "digest", bloom)
      .select("id").as[Long].collect().sorted
    val want = incoming.join(history.select("digest"), Seq("digest"), "left_anti")
      .select("id").as[Long].collect().sorted
    assert(got === want)
    assert(got === (1000L until 1500L).toArray) // the genuinely-new half
  }

  test("no false negatives: every history key might-contain = true") {
    val history = mkDocs(0 until 2000, "h2")
    val bloom = BloomDedup.historyBloom(history, "digest", expectedItems = 2000)
    val misses = history
      .filter(!graft.functions.SketchExprs.mightContain(col("digest"), bloom))
      .count()
    assert(misses === 0L, "a bloom filter must never report an added key absent")
  }

  test("lossy mode: subset of exact, loss bounded by ~fpp") {
    val history = mkDocs(0 until 1000, "h3")
    val incoming = mkDocs(1000 until 3000, "h3") // all genuinely new
    val bloom = BloomDedup.historyBloom(history, "digest", expectedItems = 1000, fpp = 0.01)
    val lossy = BloomDedup.antiJoinLossy(incoming, "digest", bloom)
      .select("id").as[Long].collect().toSet
    val exact = BloomDedup.antiJoinExact(incoming, history, "digest", bloom)
      .select("id").as[Long].collect().toSet
    assert(lossy.subsetOf(exact), "lossy mode must never resurrect a duplicate")
    val lost = exact.size - lossy.size
    assert(lost <= (exact.size * 0.03).toInt,
      s"lost $lost of ${exact.size} new rows — far above the 1% fpp")
  }

  test("definitely-new rows bypass the join entirely (plan shape)") {
    // parquet-backed frames: ConvertToLocalRelation would evaluate the
    // bloom filter at planning time over a toDF fixture
    val dir = java.nio.file.Files.createTempDirectory("graft_bloom").toString
    mkDocs(0 until 100, "h4").write.mode("overwrite").parquet(s"$dir/hist")
    mkDocs(50 until 150, "h4").write.mode("overwrite").parquet(s"$dir/inc")
    val history = spark.read.parquet(s"$dir/hist")
    val incoming = spark.read.parquet(s"$dir/inc")
    val bloom = BloomDedup.historyBloom(history, "digest", expectedItems = 100)
    val plan = BloomDedup.antiJoinExact(incoming, history, "digest", bloom)
      .queryExecution.executedPlan.toString
    // union of a join-free filtered branch and the verified branch: the
    // bloom filter must appear as a plain Filter on both branches and the
    // join only under the might-contain branch
    assert(plan.contains("bloom_might_contain"), plan)
    assert(plan.contains("Union"), plan)
    val branches = plan.split("Union", 2)(1)
    assert("Join".r.findAllIn(branches).size <= 2, // one join (± AQE naming)
      s"only the candidate branch may join:\n$plan")
  }
}
