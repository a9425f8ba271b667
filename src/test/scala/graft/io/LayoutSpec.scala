package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Proof-of-layout specs: partition pruning actually prunes, bucketed
  * joins actually avoid the shuffle. Asserted against the physical plan —
  * the thing that matters at 100 TB, checkable at any scale.
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def physicalPlan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("partitioned write + filter → partition pruning (no full scan)") {
    val dir = Files.createTempDirectory("graft_layout").toString + "/events_by_type"
    val df = (1 to 1000).map(i => (i.toLong, s"type_${i % 4}", i * 1.5))
      .toDF("id", "event_type", "value")
    Layout.writePartitioned(df, dir, "event_type")
    // directory layout is hive-style
    assert(new java.io.File(dir).list().count(_.startsWith("event_type=")) === 4)

    val read = spark.read.parquet(dir).filter($"event_type" === "type_1")
    assert(read.count() === 250)
    val scan = read.queryExecution.executedPlan.collectLeaves().head.toString
    // the scan must carry the partition filter and touch 1 of 4 partitions
    assert(scan.contains("PartitionFilters"))
    assert(scan.contains("event_type"))
  }

  test("bucketed tables join without an Exchange; unbucketed join shuffles") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    try {
      val left = (1 to 5000).map(i => (i.toLong, s"l$i")).toDF("k", "lv")
      val right = (1 to 5000).map(i => (i.toLong, s"r$i")).toDF("k", "rv")

      // unbucketed baseline: sort-merge join needs two Exchanges
      val plain = left.join(right, "k")
      assert(physicalPlan(plain).contains("Exchange"))

      Layout.writeBucketed(left, "graft_bleft", "k", 8)
      Layout.writeBucketed(right, "graft_bright", "k", 8)
      val bucketed = Layout.table(spark, "graft_bleft")
        .join(Layout.table(spark, "graft_bright"), "k")
      assert(bucketed.count() === 5000)
      // bucket layout replaces both shuffles
      assert(!physicalPlan(bucketed).contains("Exchange"),
        s"bucketed join should not shuffle:\n${physicalPlan(bucketed)}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS graft_bleft")
      spark.sql("DROP TABLE IF EXISTS graft_bright")
    }
  }

  test("bucketed aggregation on the bucket key needs no Exchange") {
    try {
      Layout.writeBucketed((1 to 1000).map(i => (i.toLong % 50, i * 2.0)).toDF("k", "v"),
        "graft_bagg", "k", 8)
      val agg = Layout.table(spark, "graft_bagg").groupBy("k").agg(sum($"v"))
      assert(agg.count() === 50)
      assert(!physicalPlan(agg).contains("Exchange"),
        s"bucketed agg should not shuffle:\n${physicalPlan(agg)}")
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_bagg")
    }
  }

  test("compactBucketed: appends accrete files, compaction returns to one per bucket") {
    try {
      val base = (1 to 2000).map(i => (i.toLong, s"v$i")).toDF("k", "v")
      Layout.writeBucketed(base.repartition(8, $"k"), "graft_bcomp", "k", 8)
      // three daily appends, each laying new files beside every bucket
      (1 to 3).foreach { day =>
        Layout.appendBucketed(
          ((2000 * day + 1) to (2000 * day + 500)).map(i => (i.toLong, s"v$i"))
            .toDF("k", "v").repartition(8, $"k"),
          "graft_bcomp", "k", 8)
      }
      val accreted = spark.table("graft_bcomp").inputFiles.length
      assert(accreted > 8, s"appends should accrete files, got $accreted")
      val expected = spark.table("graft_bcomp")
        .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq

      val (before, after) = Layout.compactBucketed(spark, "graft_bcomp", "k", 8)
      assert(before === accreted)
      assert(after === 8, s"expected one file per bucket, got $after")
      // content is untouched by the rewrite
      val got = spark.table("graft_bcomp")
        .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
      assert(got === expected)
      // and the layout still carries bucket metadata: keyed agg, no shuffle
      val agg = spark.table("graft_bcomp").groupBy("k").agg(count(lit(1)))
      assert(!physicalPlan(agg).contains("Exchange"),
        s"compacted table lost its bucket layout:\n${physicalPlan(agg)}")
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_bcomp")
      spark.sql("DROP TABLE IF EXISTS graft_bcomp__compact_swap")
    }
  }

  test("persisted IVF index: bucket-pruned scan, zero corpus shuffle, same results") {
    import graft.ext.Similarity
    try {
      val emb = (0 until 200).map { i =>
        (i.toLong, Array.tabulate(8)(d => math.sin(i * 31 + d).toFloat).toSeq)
      }.toDF("vec_id", "embedding")
      val centroids = Similarity.buildIvfIndex(emb, "graft_ivf_test",
        nlist = 4, iters = 2, numBuckets = 4)
      val q = emb.filter($"vec_id" < 3)
      val served = Similarity.ivfTopKIndexed(spark, q, "graft_ivf_test",
        centroids, k = 3, nprobe = 2)
      val plan = physicalPlan(served)
      // the probed-cell IN filter reaches the bucketed scan → bucket pruning
      assert(plan.contains("SelectedBucketsCount"),
        s"expected a bucket-pruned scan:\n$plan")
      // corpus side never shuffles: the only hash-partitioned Exchange is
      // the O(k) top-k aggregation (broadcast exchanges are fine)
      val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(shuffles === 1, s"expected exactly the top-k shuffle, got $shuffles:\n$plan")
      // identical results to the re-quantizing variant
      def rows(df: org.apache.spark.sql.DataFrame) = df
        .select("query_id", "rk", "neighbor_id", "sim")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .sortBy(t => (t._1, t._2)).toSeq
      assert(rows(served) === rows(Similarity.ivfTopK(q, emb, 3, centroids, nprobe = 2)))
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_ivf_test")
    }
  }

  test("zValue interleaves bits exactly (reference interleave)") {
    import spark.implicits._
    def ref(a: Long, b: Long, bits: Int): Long =
      (0 until bits).map(i => (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))).sum
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (255L, 255L), (170L, 85L))
    val got = cases.toDF("a", "b")
      .select($"a", $"b", Layout.zValue($"a", $"b", bits = 8).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (a, b, z) => assert(z === ref(a, b, 8), s"z($a,$b)") }
    // z is monotone-compatible with the quadrant structure: top 2 bits of
    // each input become the top 4 of z
    assert(ref(3, 5, 8) === 39L)
  }

  test("zValueK: 2-dim form equals zValue; 3-dim interleave matches reference") {
    import spark.implicits._
    def ref3(a: Long, b: Long, c: Long, bits: Int): Long =
      (0 until bits).map(i => (((a >> i) & 1L) << (3 * i)) |
        (((b >> i) & 1L) << (3 * i + 1)) | (((c >> i) & 1L) << (3 * i + 2))).sum
    // hand case: a=1 → pos 0, b=2 (bit1) → pos 4, c=4 (bit2) → pos 8
    assert(ref3(1, 2, 4, 8) === (1L + 16L + 256L))
    val cases = Seq((0L, 0L, 0L), (1L, 2L, 4L), (3L, 5L, 7L), (255L, 170L, 85L))
    val got = cases.toDF("a", "b", "c")
      .select($"a", $"b", $"c",
        Layout.zValueK(Seq($"a", $"b", $"c"), bits = 8).as("z3"),
        Layout.zValueK(Seq($"a", $"b"), bits = 8).as("z2"),
        Layout.zValue($"a", $"b", bits = 8).as("z2ref"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(3) === ref3(r.getLong(0), r.getLong(1), r.getLong(2), 8))
      assert(r.getLong(4) === r.getLong(5)) // zValueK(2) ≡ zValue
    }
    // bounds: a 4-dim 16-bit key overflows a long and must be rejected
    intercept[IllegalArgumentException] {
      Layout.zValueK(Seq($"a", $"b", $"c", $"a"), bits = 16)
    }
  }

  test("zorderWrite gives every file a bounded rectangle in BOTH dimensions") {
    import spark.implicits._
    // uniform 64×64 grid; z-cluster into 16 files vs the natural row order
    val grid = for { a <- 0 until 64; b <- 0 until 64 } yield (a.toLong, b.toLong)
    val df = grid.toDF("a", "b")
    val zdir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    val ndir = java.nio.file.Files.createTempDirectory("graft_natural").toString
    Layout.zorderWrite(df, zdir, $"a", $"b", numFiles = 16, bits = 6)
    // natural layout: same file count, no clustering (round-robin split)
    df.repartition(16).write.mode("overwrite").parquet(ndir)
    def areaSum(dir: String): Long =
      spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg((max($"a") - min($"a") + 1) * (max($"b") - min($"b") + 1) as "area")
        .agg(sum($"area")).head().getLong(0)
    val total = 64L * 64L
    val zArea = areaSum(zdir)
    val nArea = areaSum(ndir)
    // ideal z-clustering: 16 disjoint quadrant cells, Σ areas = total;
    // round-robin: every file spans ~the whole plane, Σ ≈ 16 × total.
    assert(zArea <= total * 2, s"z-order area sum $zArea should be ~$total")
    assert(nArea >= total * 8, s"natural layout should span ~16×total, got $nArea")
  }
}
