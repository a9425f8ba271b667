package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LinkGraphSpec extends SparkSpec {
  import spark.implicits._

  private val S = 1000000000000L

  test("symmetric 2-cycle holds uniform rank at every iteration") {
    val edges = Seq(("a", "b"), ("b", "a")).toDF("src", "dst")
    val out = LinkGraph.pageRankPico(edges, "src", "dst", iters = 6)
      .orderBy("node").as[(String, Long)].collect()
    // uniform start S/2 each; every flow is rank*1 div 1 → base + 85% rank
    // keeps them equal (and ≈ S/2 up to div truncation drift)
    assert(out.map(_._1).toSeq == Seq("a", "b"))
    assert(out(0)._2 == out(1)._2)
    assert(math.abs(out(0)._2 - S / 2) < 10)
  }

  test("dangling node recurrence matches the exact integer algebra") {
    // a -> b, b dangling; n = 2. Replay the same integer recurrence here.
    val edges = Seq(("a", "b")).toDF("src", "dst")
    var ra = S / 2
    var rb = S / 2
    val base = (S - 85L * S / 100L) / 2
    for (_ <- 1 to 5) {
      val dm = rb // b is the only dangling node
      val contribB = ra // (ra * 1) div 1
      val ra2 = base + (85L * (0L + dm / 2)) / 100L
      val rb2 = base + (85L * (contribB + dm / 2)) / 100L
      ra = ra2; rb = rb2
    }
    val out = LinkGraph.pageRankPico(edges, "src", "dst", iters = 5)
      .orderBy("node").as[(String, Long)].collect().toMap
    assert(out("a") == ra)
    assert(out("b") == rb)
  }

  test("parallel edges weight the flow; hub outranks spokes") {
    // star: s1..s4 -> hub (s1 twice — weight 2 changes nothing for a
    // single-target source), hub -> s1 back so nothing dangles fully
    val edges = Seq(("s1", "hub"), ("s1", "hub"), ("s2", "hub"), ("s3", "hub"),
      ("s4", "hub"), ("hub", "s1")).toDF("src", "dst")
    // hub↔s1 mass oscillates with period 2 and decays by 0.85² per cycle;
    // 40 iterations damp the slosh to ~1e-3 so the fixpoint ordering
    // (hub ≈ 0.476 > s1 ≈ 0.434) is unambiguous
    val out = LinkGraph.pageRankPico(edges, "src", "dst", iters = 40)
      .as[(String, Long)].collect().toMap
    assert(out("hub") > out("s1"))
    assert(out("s1") > out("s2")) // hub's whole flow lands on s1
    assert(out("s2") == out("s3") && out("s3") == out("s4"))
    // mass is conserved up to div truncation (strictly bounded loss)
    val total = out.values.sum
    assert(total <= S && total > S - 1000L)
  }

  test("weighted split: two-thirds of a source's flow follows weight 2") {
    val edges = Seq(("a", "b"), ("a", "b"), ("a", "c"),
      ("b", "a"), ("c", "a")).toDF("src", "dst")
    val out = LinkGraph.pageRankPico(edges, "src", "dst", iters = 12)
      .as[(String, Long)].collect().toMap
    assert(out("b") > out("c"))
    assert(out("a") > out("b")) // both b and c return everything to a
  }

  test("empty edge list returns an empty frame, not a crash") {
    val edges = Seq.empty[(String, String)].toDF("src", "dst")
    assert(LinkGraph.pageRankPico(edges, "src", "dst", iters = 3).count() == 0L)
  }

  test("warm start from converged ranks lands near the cold fixpoint in few iters") {
    // hub-heavy base (fixpoint FAR from uniform: hub ≈ 0.48 — the regime
    // where a warm start matters; a near-uniform fixpoint would make the
    // cold uniform init the better guess); delta: one new spoke appears
    def star = Seq(("s1", "hub"), ("s2", "hub"), ("s3", "hub"), ("s4", "hub"),
      ("hub", "s1"))
    val delta = Seq(("s5", "hub"))
    val base = LinkGraph.pageRankPico(star.toDF("src", "dst"), "src", "dst", iters = 40)
    val warm = LinkGraph.pageRankPico((star ++ delta).toDF("src", "dst"), "src", "dst",
        iters = 12, init = Some(base))
      .as[(String, Long)].collect().toMap
    val cold = LinkGraph.pageRankPico((star ++ delta).toDF("src", "dst"), "src", "dst",
        iters = 60)
      .as[(String, Long)].collect().toMap
    cold.foreach { case (node, r) =>
      assert(math.abs(warm(node) - r) < r / 10 + 2000000L,
        s"$node warm=${warm(node)} cold=$r")
    }
    // the warm start, not the 12 iterations, buys the accuracy: an
    // equal-length cold run is strictly worse
    val cold12 = LinkGraph.pageRankPico((star ++ delta).toDF("src", "dst"), "src", "dst",
        iters = 12).as[(String, Long)].collect().toMap
    val warmErr = cold.map { case (k, v) => math.abs(warm(k) - v).toDouble / v }.sum
    val coldErr = cold.map { case (k, v) => math.abs(cold12(k) - v).toDouble / v }.sum
    assert(warmErr < coldErr,
      s"warm start should beat an equal-length cold run: $warmErr vs $coldErr")
  }

  test("personalized teleport concentrates rank on seeds and their reach") {
    import org.apache.spark.sql.functions.col
    // two disjoint 3-cycles; seeds only in the first
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"),
      ("x", "y"), ("y", "z"), ("z", "x")).toDF("src", "dst")
    val seeds = Seq("a").toDF("node")
    // unseeded mass decays by 0.85/iter — 50 iters push it to ~3e-4·S
    val out = LinkGraph.pageRankPico(edges, "src", "dst", iters = 50,
        seeds = Some(seeds))
      .as[(String, Long)].collect().toMap
    // the unseeded component gets no teleport mass and decays to ~0
    assert(out("x") < S / 1000 && out("y") < S / 1000 && out("z") < S / 1000)
    // seeded component holds essentially all mass; seed outranks its cycle
    assert(out("a") > out("b") && out("b") > 0)
    assert(out("a") + out("b") + out("c") > S - S / 100)
  }

  test("personalized mode requires a seed present in the graph") {
    import org.apache.spark.sql.functions.col
    val edges = Seq(("a", "b")).toDF("src", "dst")
    intercept[IllegalArgumentException] {
      LinkGraph.pageRankPico(edges, "src", "dst", iters = 2,
        seeds = Some(Seq("nope").toDF("node")))
    }
  }

  test("oracle generator and operator agree on a planted graph (spot)") {
    // not a DuckDB run (that's the driver's job) — just pin that the
    // generated SQL contains the same constants the operator uses
    val sql = LinkGraph.pageRankOracleSql("edges AS (SELECT 'a' AS src, 'b' AS dst)",
      iters = 3)
    assert(sql.contains("1000000000000 // n"))
    assert(sql.contains("(85 * (coalesce(c.c, 0) + d.dm // n)) // 100"))
    assert(sql.contains("r3 AS MATERIALIZED"))
    assert(sql.contains("ORDER BY rank_pico DESC, node"))
  }

  private def census(edges: Seq[(Long, Long)]) =
    LinkGraph.triangleStats(edges.toDF("src", "dst"), "src", "dst")
      .as[(Long, Long, Long, Long, Long)].head()

  test("triangle census: K4 — every wedge closes") {
    // K4: 4 nodes, 6 edges, C(4,3)=4 triangles, Σ C(3,2)=12 wedges, cc=1
    val k4 = for { i <- 0L to 3L; j <- 0L to 3L if i < j } yield (i, j)
    assert(census(k4) === ((4L, 6L, 12L, 4L, 1000000L)))
  }

  test("triangle census: star has wedges but no triangles; cc = 0") {
    val star = (1L to 5L).map(i => (0L, i))
    assert(census(star) === ((6L, 5L, 10L, 0L, 0L)))
  }

  test("triangle census: parallel edges, self-loops, and direction collapse away") {
    // one triangle stated messily: duplicates, both directions, a self-loop
    val messy = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (1L, 1L), (2L, 3L))
    assert(census(messy) === ((3L, 3L, 3L, 1L, 1000000L)))
  }

  test("triangle census: hub skew — triangles through a high-degree center count once each") {
    // hub 0 linked to 1..8; rim chain 1-2, 3-4, 5-6, 7-8 → 4 triangles,
    // each with its apex forced AWAY from the hub by the degree orientation
    val edges = (1L to 8L).map(i => (0L, i)) ++
      Seq((1L, 2L), (3L, 4L), (5L, 6L), (7L, 8L)).map { case (a, b) => (a, b) }
    val (n, m, w, t, _) = census(edges)
    assert((n, m, t) === ((9L, 12L, 4L)))
    assert(w === 28L + 8L) // hub C(8,2)=28, rim nodes deg 2 → C(2,2)=1 each
  }

  test("triangle census: empty and edgeless inputs are a zero row, not an error") {
    assert(census(Seq.empty) === ((0L, 0L, 0L, 0L, 0L)))
  }

  private def lpa(edges: Seq[(Long, Long)], iters: Int = 3): Map[Long, Long] =
    LinkGraph.labelPropagate(edges.toDF("src", "dst"), "src", "dst", iters)
      .as[(Long, Long)].collect().toMap

  test("LPA: two cliques bridged by one edge settle on per-clique labels") {
    val cliqueA = for { i <- 1L to 4L; j <- 1L to 4L if i < j } yield (i, j)
    val cliqueB = for { i <- 10L to 13L; j <- 10L to 13L if i < j } yield (i, j)
    val out = lpa(cliqueA ++ cliqueB ++ Seq((4L, 10L)))
    // within each clique every node converges to one label; the two
    // communities stay distinct despite the bridge
    assert(out.filterKeys(_ <= 4L).values.toSet.size === 1)
    assert(out.filterKeys(_ >= 10L).values.toSet.size === 1)
    assert(out(1L) !== out(13L))
  }

  test("LPA: tie votes resolve to the LOWEST label — deterministic round replay") {
    // path 1-2-3: round 1 votes — node 2 sees {1, 3} (tie → 1), nodes
    // 1 and 3 adopt 2. Round 2: node 2 sees {2, 2} → 2; 1/3 see {1} → 1.
    // Round 3: node 2 sees {1, 1} → 1; 1/3 see {2} → 2. Exact sync replay.
    val out = lpa(Seq((1L, 2L), (2L, 3L)), iters = 3)
    assert(out === Map(1L -> 2L, 2L -> 1L, 3L -> 2L))
  }

  test("LPA: duplicate/reversed edges collapse to one vote per neighbor") {
    val out = lpa(Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L)), iters = 2)
    val outClean = lpa(Seq((1L, 2L), (2L, 3L)), iters = 2)
    assert(out === outClean)
  }

  test("LPA: empty edge list returns an empty frame") {
    assert(lpa(Seq.empty).isEmpty)
  }
}
