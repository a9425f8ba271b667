package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Near-duplicate detection semantics: shingling, exact Jaccard, the
  * MinHash-LSH candidate pipeline (recall vs the exact all-pairs result),
  * and SimHash hamming properties.
  */
class TextDedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank today extra"), // near-dup of 1
    (3L, "completely different text about apples oranges bananas and citrus fruit markets"),
    (4L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup of 1
    (5L, "yet another unrelated document mentioning quantum computing and lattice cryptography research")
  ).toDF("doc_id", "text")

  test("shingles produces distinct k-word shingles; short docs collapse to one") {
    val sh = docs.filter($"doc_id" === 1)
      .select(TextDedup.shingles($"text", 3).as("s")).first().getSeq[String](0)
    assert(sh.contains("the quick brown"))
    assert(sh.contains("quick brown fox"))
    val short = Seq((9L, "two words")).toDF("doc_id", "text")
      .select(TextDedup.shingles($"text", 3).as("s")).first().getSeq[String](0)
    assert(short === Seq("two words"))
  }

  test("jaccard of identical sets is 1.0, of disjoint sets is 0.0") {
    val df = Seq((Seq("a", "b"), Seq("a", "b"), Seq("c", "d"))).toDF("x", "y", "z")
    val r = df.select(TextDedup.jaccard($"x", $"y"), TextDedup.jaccard($"x", $"z")).first()
    assert(r.getDouble(0) === 1.0)
    assert(r.getDouble(1) === 0.0)
  }

  test("dedupExact keeps one row per identical text (min order)") {
    val out = TextDedup.dedupExact(docs, $"text", $"doc_id")
    assert(out.count() === 4) // doc 4 removed
    assert(out.filter($"doc_id" === 4).count() === 0)
    assert(out.filter($"doc_id" === 1).count() === 1)
  }

  test("exactNearDups finds the near pair and the exact pair, not unrelated docs") {
    val pairs = TextDedup.exactNearDups(docs, $"doc_id", $"text", lit(1), k = 3, threshold = 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 4L)))
    assert(pairs.contains((2L, 4L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("minhashNearDups reproduces the exact near-dup pairs (recall ≈ 1 at j≥0.8)") {
    val exact = TextDedup.exactNearDups(docs, $"doc_id", $"text", lit(1), k = 3, threshold = 0.8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = TextDedup.minhashNearDups(docs, $"doc_id", $"text", k = 3,
      numHashes = 64, rowsPerBand = 2, threshold = 0.8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh === exact)
    assert(exact.nonEmpty) // 1-4 are identical → jaccard 1.0 must be found
  }

  test("LSH verification removes banding false positives (no pair below threshold)") {
    val out = TextDedup.minhashNearDups(docs, $"doc_id", $"text", k = 3,
      numHashes = 64, rowsPerBand = 2, threshold = 0.8)
    assert(out.filter($"jacc" < 0.8).count() === 0)
  }

  test("prefixFilterNearDups equals the exact all-pairs result (recall 1 by theorem)") {
    val exact = TextDedup.exactNearDups(docs, $"doc_id", $"text", lit(1), k = 3, threshold = 0.8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pf = TextDedup.prefixFilterNearDups(docs, $"doc_id", $"text", k = 3,
      tauNum = 4, tauDen = 5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pf === exact)
    assert(exact.nonEmpty)
  }

  test("prefixFilterNearDups keeps a pair sitting EXACTLY on the threshold " +
    "(integer prefix-length arithmetic; a double ceil(0.8·s) would drop it)") {
    // 11 tokens → 9 distinct 3-shingles; changing token 1 changes exactly
    // one shingle → |∩|=8, |∪|=10, J = 0.8 exactly. s=9 → prefix length
    // 9 − ⌈36/5⌉ + 1 = 2 (⌈7.2⌉=8); double 0.8·9=7.200000…1 also ceils to
    // 8 here, but at s=10 the double path gives ceil(8.000000…1)=9 ≠ 8 —
    // both sizes are exercised.
    val boundary = Seq(
      (1L, "one two three four five six seven eight nine ten eleven"),
      (2L, "uno two three four five six seven eight nine ten eleven"),
      // 12 tokens → 10 shingles; change token 2 (lives in shingles 1-2)
      // → |∩|=8, |∪|=12, J=2/3 < 0.8 — rejected, but still drives the
      // s=10 prefix-length path
      (3L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"),
      (4L, "alpha other gamma delta epsilon zeta eta theta iota kappa lambda mu")
    ).toDF("doc_id", "text")
    val pf = TextDedup.prefixFilterNearDups(boundary, $"doc_id", $"text", k = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pf.keySet === Set((1L, 2L)))
    assert(pf((1L, 2L)) === 0.8)
  }

  test("simhash of identical texts is identical; near-dups within small hamming") {
    val sh = docs.select($"doc_id", TextDedup.simhash($"text").as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) === sh(4L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sh(1L), sh(2L)) <= 8)   // near-dup: few bits differ
    assert(ham(sh(1L), sh(3L)) > 8)    // unrelated: many bits differ
  }

  test("simhashNearDups surfaces exact+near pairs under maxDist") {
    val pairs = TextDedup.simhashNearDups(docs, $"doc_id", $"text", lit(1), maxDist = 8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 4L)))
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)))
  }

  test("dedupLines strips cross-doc boilerplate, keeps order, handles edge docs") {
    val corpus = Seq(
      (1L, "alpha beta. SUBSCRIBE NOW. gamma delta"),
      (2L, "epsilon. SUBSCRIBE NOW. zeta"),
      (3L, "SUBSCRIBE NOW. eta theta"),
      (4L, "SUBSCRIBE NOW"), // all-boilerplate doc → empty
      (5L, "unique text only")
    ).toDF("doc_id", "text")
    val out = TextDedup.dedupLines(corpus, $"doc_id", $"text", minDocs = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === "alpha beta. gamma delta")
    assert(out(2L) === "epsilon. zeta")
    assert(out(3L) === "eta theta")
    assert(out(4L) === "")
    assert(out(5L) === "unique text only")
  }

  test("dedupLines under minDocs leaves every doc byte-identical (lossless rejoin)") {
    val corpus = Seq(
      (1L, "a. b. . c"), // consecutive separators → empty token survives
      (2L, "a. b"),      // 'a'/'b' shared by only 2 docs < minDocs=3
      (3L, "solo")
    ).toDF("doc_id", "text")
    val out = TextDedup.dedupLines(corpus, $"doc_id", $"text", minDocs = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(1L -> "a. b. . c", 2L -> "a. b", 3L -> "solo"))
  }

  private def components(nodes: Seq[Long], pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val n = nodes.toDF("id")
    val p = pairs.toDF("id_a", "id_b")
    TextDedup.connectedComponents(n, $"id", p)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("connectedComponents labels a chain with its minimum id (propagation across hops)") {
    // path 1-2-3-4-5 needs multiple hash-min rounds: 5's label walks down one hop per round
    val got = components(1L to 5L, Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)))
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("connectedComponents keeps separate components and singletons apart") {
    val got = components(1L to 7L, Seq((1L, 3L), (5L, 6L)))
    assert(got === Map(1L -> 1L, 2L -> 2L, 3L -> 1L, 4L -> 4L, 5L -> 5L, 6L -> 5L, 7L -> 7L))
  }

  test("connectedComponents merges clusters linked through a shared node") {
    // two planted clusters joined by one bridge edge collapse to one group
    val got = components(Seq(10L, 11L, 20L, 21L), Seq((10L, 11L), (20L, 21L), (11L, 20L)))
    assert(got.values.toSet === Set(10L))
  }

  test("connectedComponents fails loudly when maxIters is too small to converge") {
    val n = (1L to 40L).toDF("id")
    val p = (1L until 40L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    intercept[IllegalStateException] {
      TextDedup.connectedComponents(n, $"id", p, maxIters = 2)
    }
  }

  test("connectedComponents of an empty node set returns an empty frame, no NPE") {
    val n = Seq.empty[Long].toDF("id")
    val p = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(TextDedup.connectedComponents(n, $"id", p).isEmpty)
  }

  test("connectedComponents releases superseded round state (no block-manager leak)") {
    val before = spark.sparkContext.getPersistentRDDs.size
    val n = (1L to 40L).toDF("id")
    val p = (1L until 40L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    TextDedup.connectedComponents(n, $"id", p).count()
    // only the final labels' blocks may remain live after the run
    val after = spark.sparkContext.getPersistentRDDs.size
    assert(after - before <= 1, s"persisted RDDs grew $before -> $after")
  }

  test("connectedComponents never sweeps blocks persisted by a concurrent job") {
    // a sibling job persisting mid-run (the Cleaning.imputeMode pattern) must
    // keep its blocks: CC frees only the checkpoint RDDs it created itself
    import java.util.concurrent.atomic.AtomicBoolean
    val sc = spark.sparkContext
    val stop = new AtomicBoolean(false)
    val mine = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.rdd.RDD[Long]]
    val sibling = new Thread(() => {
      while (!stop.get() && mine.size < 64) {
        val r = sc.parallelize(1L to 100L, 2).persist()
        r.count() // materialize blocks while CC rounds are in flight
        mine.synchronized { mine += r }
      }
    })
    sibling.start()
    try {
      val n = (1L to 60L).toDF("id")
      val p = (1L until 60L).map(i => (i, i + 1)).toDF("id_a", "id_b")
      TextDedup.connectedComponents(n, $"id", p).count()
    } finally {
      stop.set(true)
      sibling.join(30000)
    }
    val live = sc.getPersistentRDDs.keySet
    val swept = mine.synchronized(mine.filterNot(r => live.contains(r.id)))
    assert(swept.isEmpty, s"CC unpersisted ${swept.size} concurrent RDDs: ${swept.map(_.id)}")
    mine.foreach(_.unpersist(blocking = false))
  }

  test("pointer jumping converges a 40-node chain in O(log diameter) rounds") {
    // plain hash-min would need 39 rounds; with compression ≤ 8 suffice
    val got = components(1L to 40L, (1L until 40L).map(i => (i, i + 1)))
    assert(got.values.toSet === Set(1L))
    val n = (1L to 40L).toDF("id")
    val p = (1L until 40L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val fast = TextDedup.connectedComponents(n, $"id", p, maxIters = 8)
      .collect().map(_.getLong(1)).toSet
    assert(fast === Set(1L))
  }

  test("minhashNearDupsAgainst finds cross-set near-dups only, never history-internal pairs") {
    val base = "the quick brown fox jumps over the lazy dog and runs far away home tonight"
    val history = Seq(
      (1L, base),
      (2L, base + " again"), // near-dup of 1 INSIDE history — must not be reported
      (3L, "completely different words describing an unrelated subject matter entirely here now")
    ).toDF("id", "text")
    val incoming = Seq(
      (10L, base + " ok"),                                   // near-dup of 1 (and 2)
      (11L, "fresh unseen content with no overlap at all in any shingle of the corpus")
    ).toDF("id", "text")
    val hits = TextDedup.minhashNearDupsAgainst(incoming, $"id", $"text",
        history, $"id", $"text", threshold = 0.6)
      .select($"new_id", $"hist_id").as[(Long, Long)].collect().sorted
    assert(hits.forall { case (n, _) => n >= 10L }) // left side is always the new batch
    assert(hits.map(_._1).distinct === Array(10L))  // 11 is genuinely new
    assert(hits.map(_._2).toSet.subsetOf(Set(1L, 2L)))
    assert(hits.nonEmpty)
  }

  test("dropNearDupsOfHistory keeps exactly the genuinely-new rows") {
    val base = "the quick brown fox jumps over the lazy dog and runs far away home tonight"
    val history = Seq((1L, base)).toDF("id", "text")
    val incoming = Seq(
      (10L, base + " ok"),
      (11L, "fresh unseen content with no overlap at all in any shingle of the corpus")
    ).toDF("id", "text")
    val kept = TextDedup.dropNearDupsOfHistory(incoming, $"id", $"text",
        history, $"id", $"text", threshold = 0.6)
      .select($"id").as[Long].collect()
    assert(kept === Array(11L))
  }
}
