package graft

import org.apache.spark.sql.functions._

import graft.operators.Triangles

class TrianglesSpec extends SparkTestBase {

  import spark.implicits._

  /** K4 — every 3-subset closes: C(4,3)=4 triangles, Σ C(3,2)=12 wedges. */
  private def k4 = Seq(
    (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    .toDF("pa", "pb")

  /** The co-purchase graph of the sf0.001 fixture, built the oracle's way
    * (distinct (order, part) self-join, pa < pb). */
  private def coPurchase = {
    val lp = Tables.lineitem(spark, sf0001)
      .select("l_orderkey", "l_partkey").distinct()
    lp.select(col("l_orderkey").as("k"), col("l_partkey").as("pa"))
      .join(lp.select(col("l_orderkey").as("k"), col("l_partkey").as("pb")),
        "k")
      .filter(col("pa") < col("pb"))
      .select("pa", "pb").distinct()
  }

  test("k4: 4 triangles, 12 wedges — in both tiers") {
    for (limit <- Seq(Triangles.BroadcastEdgeLimit, 0L)) {
      val row = Triangles.count(k4, broadcastEdgeLimit = limit)
        .as[(Long, Long)].collect().head
      assert(row === ((4L, 12L)), s"limit=$limit")
    }
  }

  test("both tiers agree on the fixture co-purchase graph") {
    val pairs = coPurchase.localCheckpoint(true)
    val bcast = Triangles.count(pairs).as[(Long, Long)].collect().head
    val shuffled = Triangles.count(pairs, broadcastEdgeLimit = 0L)
      .as[(Long, Long)].collect().head
    assert(bcast._1 > 0L, "fixture graph has no triangles — weak fixture")
    assert(bcast === shuffled)
  }

  test("shuffle tier is broadcast-free: no adjacency, shuffle-hash closure") {
    val df = Triangles.count(coPurchase, broadcastEdgeLimit = 0L)
    df.collect() // execute so AQE finalizes the plan it would really run
    val plan = df.queryExecution.executedPlan.toString
    // no adjacency is ever built (the broadcast tier's signature op)...
    assert(!plan.contains("collect_list"),
      s"adjacency aggregation present in shuffle tier:\n$plan")
    assert(!plan.contains("array_intersect"),
      s"intersection probe present in shuffle tier:\n$plan")
    // ...and the wedge closure runs as hinted shuffle-hash joins
    assert(plan.contains("ShuffledHashJoin"),
      s"expected ShuffledHashJoin closure in:\n$plan")
  }

  test("broadcast tier broadcasts the adjacency (the fast small-graph path)") {
    val df = Triangles.count(coPurchase)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the adjacency build itself runs inside its localCheckpoint job (it
    // prints as Scan ExistingRDD here) — the tier's top-level signature
    // is the broadcast join + per-edge intersection probe
    assert(plan.contains("array_intersect") &&
        plan.contains("BroadcastHashJoin"),
      s"expected broadcast-adjacency intersection in:\n$plan")
  }

  test("both tiers match an in-memory brute force on seeded random graphs") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val n = 20 + trial * 10
      val edges = (for {
        a <- 0 until n; b <- (a + 1) until n
        if rnd.nextDouble() < 0.15
      } yield (a.toLong, b.toLong)).toVector
      val adj = edges.flatMap(e => Seq(e, e.swap))
        .groupBy(_._1).map { case (v, es) => (v, es.map(_._2).toSet) }
      // each triangle is seen once per own edge: Σ_edges |N(a)∩N(b)| = 3T
      val bruteTriangles = edges.map { case (a, b) =>
        (adj(a) & adj(b)).size.toLong }.sum / 3
      val bruteWedges = adj.values
        .map(s => s.size.toLong * (s.size - 1) / 2).sum
      val df = edges.toDF("pa", "pb")
      for (limit <- Seq(Triangles.BroadcastEdgeLimit, 0L)) {
        val row = Triangles.count(df, broadcastEdgeLimit = limit)
          .as[(Long, Long)].collect().head
        assert(row === ((bruteTriangles, bruteWedges)),
          s"trial=$trial limit=$limit")
      }
    }
  }

  test("empty graph yields a 0/0 row in both tiers (no null sums)") {
    val empty = Seq.empty[(Long, Long)].toDF("pa", "pb")
    for (limit <- Seq(Triangles.BroadcastEdgeLimit, 0L)) {
      val row = Triangles.count(empty, broadcastEdgeLimit = limit).collect()
      assert(row.length === 1, s"limit=$limit")
      assert(row.head.getLong(0) === 0L && row.head.getLong(1) === 0L,
        s"limit=$limit: ${row.head}")
    }
  }
}
