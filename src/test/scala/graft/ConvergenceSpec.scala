package graft

import org.apache.spark.sql.functions._

import graft.operators.{BfsHops, PageRank, WeightedSssp}

/** Convergence-driven iteration (round-6 verdict item 3): the iterative
  * graph operators expose fixpoint-probed variants with bounded max
  * rounds, while the fixed-round forms (the q57/q75 oracles) keep their
  * probe-free plans. */
class ConvergenceSpec extends SparkTestBase {

  test("PageRank exits early at the exact fixpoint of a regular graph") {
    import spark.implicits._
    // symmetric ring: 2-regular, so with integer arithmetic every node's
    // rank stays exactly 1e6 (150000 + 85% of two half-contributions) —
    // the probe sees max|Δ| = 0 after the first superstep
    val n = 500
    val ring = (0 until n).flatMap { i =>
      val j = (i + 1) % n
      Seq((i.toLong, j.toLong), (j.toLong, i.toLong))
    }.toDF("src", "dst")
    val (r, rounds) = PageRank.ranksConverged(ring, maxIters = 25)
    assert(rounds < 25, s"expected early exit, ran $rounds/25 rounds")
    assert(r.count() === n.toLong)
    val distinctRanks = r.select("r").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(distinctRanks === Set(1000000L))
  }

  test("converged ranks equal the fixed-iteration form at the exit round") {
    import spark.implicits._
    // an IRREGULAR graph: ranks keep moving past 10 rounds (damping-rate
    // decay), so the run exits at the bound — and the contract under
    // test is that ranksConverged after N rounds is bit-identical to
    // ranks(…, N), whichever way the exit happened
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L),
      (3L, 4L), (4L, 3L), (1L, 3L), (3L, 1L)).toDF("src", "dst")
    val (rc, rounds) = PageRank.ranksConverged(edges,
      maxIters = 10, tolMicros = 0L)
    assert(rounds === 10)
    val got = rc.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val want = PageRank.ranks(edges, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === want)
  }

  test("BFS early exit stops at the fixpoint; distances match the fixed form") {
    import spark.implicits._
    val n = 12
    val path = (0 until n - 1).flatMap { i =>
      Seq((i.toLong, (i + 1).toLong), ((i + 1).toLong, i.toLong))
    }.toDF("src", "dst")
    val dist0 = (0 until n)
      .map(i => (i.toLong, if (i == 0) 0 else BfsHops.Inf))
      .toDF("v", "dist")
    val (dist, rounds) = BfsHops.run(path, dist0,
      maxRounds = 50, earlyExit = true)
    // n-1 improving supersteps (the wave walks the path) + 1 confirming
    assert(rounds === n, s"expected $n rounds, ran $rounds")
    val got = dist.collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(got === (0 until n).map(i => (i.toLong, i)).toMap)
    val (fixed, _) = BfsHops.run(path, dist0, maxRounds = n - 1)
    val wantFixed = fixed.collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(got === wantFixed)
  }

  test("weighted SSSP relaxes to exact shortest costs and exits at the " +
      "fixpoint; negative weights are a named error") {
    import spark.implicits._
    // weighted path 0-1-2-3-4 (w=2 per hop) + a w=9 shortcut 0-4: the
    // path (cost 8) must beat the direct edge (cost 9)
    val half = Seq((0L, 1L, 2L), (1L, 2L, 2L), (2L, 3L, 2L),
      (3L, 4L, 2L), (0L, 4L, 9L))
    val edges = (half ++ half.map { case (a, b, w) => (b, a, w) })
      .toDF("src", "dst", "w")
    val dist0 = (0 until 5)
      .map(i => (i.toLong, if (i == 0) 0L else WeightedSssp.Inf))
      .toDF("v", "dist")
    val (dist, rounds) = WeightedSssp.run(edges, dist0,
      maxRounds = 20, earlyExit = true)
    assert(rounds < 20, s"expected early exit, ran $rounds/20")
    val got = dist.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === Map(0L -> 0L, 1L -> 2L, 2L -> 4L, 3L -> 6L, 4L -> 8L))
    // bounded relaxation: after 1 round only direct neighbors settled,
    // and the shortcut's provisional 9 has not yet been undercut
    val (d1, _) = WeightedSssp.run(edges, dist0, maxRounds = 1)
    val g1 = d1.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(g1(1L) === 2L && g1(4L) === 9L && g1(2L) === WeightedSssp.Inf)
    val neg = Seq((0L, 1L, -1L)).toDF("src", "dst", "w")
    val e = intercept[IllegalArgumentException] {
      WeightedSssp.run(neg, dist0, maxRounds = 1)
    }
    assert(e.getMessage.contains("negative"))
  }

  test("BFS respects maxRounds as a hard bound without early exit") {
    import spark.implicits._
    val path = (0 until 9).flatMap { i =>
      Seq((i.toLong, (i + 1).toLong), ((i + 1).toLong, i.toLong))
    }.toDF("src", "dst")
    val dist0 = (0 until 10)
      .map(i => (i.toLong, if (i == 0) 0 else BfsHops.Inf))
      .toDF("v", "dist")
    val (dist, rounds) = BfsHops.run(path, dist0, maxRounds = 3)
    assert(rounds === 3)
    // only nodes within 3 hops are settled; the rest stay at Inf
    val got = dist.collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    (0 to 3).foreach(i => assert(got(i.toLong) === i))
    (4 to 9).foreach(i => assert(got(i.toLong) === BfsHops.Inf))
  }
}
