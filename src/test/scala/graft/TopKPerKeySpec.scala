package graft

import org.apache.spark.sql.functions._

import graft.plans.TopKPerKey

class TopKPerKeySpec extends SparkTestBase {

  private def custom() = TopKPerKey.topKPerKey(
    Tables.orders(spark, sf0001),
    keys = Seq("o_custkey"),
    order = Seq(TopKPerKey.desc("o_totalprice"), TopKPerKey.asc("o_orderkey")),
    k = 3)

  test("custom operator result equals the window row_number formulation") {
    val viaWindow = SparkEntry.queries("q07_window_rank")(spark, sf0001)
      .collect().map(_.toSeq).toSeq
    val viaCustom = custom()
      .select(col("o_custkey"), col("rank").as("rn"), col("o_orderkey"),
        col("o_totalprice"))
      .orderBy("o_custkey", "rn")
      .collect().map(_.toSeq).toSeq
    assert(viaCustom === viaWindow)
  }

  test("plans as partial + final exec with an exchange between") {
    val p = custom().queryExecution.executedPlan.toString
    assert(p.split("TopKPerKey ").length >= 3,
      s"expected partial+final TopKPerKey nodes, got:\n$p")
    assert(p.contains("Exchange hashpartitioning(o_custkey"),
      "no key-clustered exchange between phases")
  }

  test("partial phase bounds what reaches the shuffle") {
    // Execute the partial exec node itself (AQE off so the plan tree is
    // traversable) and count what it would send into the exchange: it must
    // be strictly less than the input and ≤ k · keys · inputPartitions.
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val plan = custom().queryExecution.executedPlan
      val partials = plan.collect {
        case t: graft.plans.TopKPerKeyExec if t.partial => t
      }
      assert(partials.nonEmpty, s"no partial TopKPerKeyExec in:\n$plan")
      val partialRows = partials.head.execute().count()
      val input = Tables.orders(spark, sf0001).count()
      val keys = Tables.orders(spark, sf0001)
        .select("o_custkey").distinct().count()
      val parts = partials.head.child.execute().getNumPartitions
      assert(partialRows < input, "partial phase forwarded every row")
      assert(partialRows <= 3 * keys * parts)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("tiny partial budget degrades to pass-through but stays exact") {
    // budget=2 forces nearly every row down the pass-through branch: the
    // final phase must still produce exactly the window formulation.
    val viaWindow = SparkEntry.queries("q07_window_rank")(spark, sf0001)
      .collect().map(_.toSeq).toSeq
    val tiny = TopKPerKey.topKPerKey(
      Tables.orders(spark, sf0001),
      keys = Seq("o_custkey"),
      order = Seq(TopKPerKey.desc("o_totalprice"),
        TopKPerKey.asc("o_orderkey")),
      k = 3, partialBudget = 2)
      .select(col("o_custkey"), col("rank").as("rn"), col("o_orderkey"),
        col("o_totalprice"))
      .orderBy("o_custkey", "rn")
      .collect().map(_.toSeq).toSeq
    assert(tiny === viaWindow)
  }

  test("final phase streams over a sorted, reduced input") {
    val p = custom().queryExecution.executedPlan.toString
    // the sort must sit between the exchange and the final phase — it runs
    // over the partial-phase-reduced rows, and SortExec gives spill safety
    // the removed in-memory heap map could not
    assert(p.contains("Sort ["),
      s"no SortExec feeding the final TopKPerKey phase:\n$p")
    assert(p.indexOf("Sort [") < p.indexOf("Exchange"),
      s"sort is not between the exchange and the final phase:\n$p")
  }

  test("rank ties respect the total order (deterministic rerun)") {
    val a = custom().orderBy("o_custkey", "rank").collect().map(_.toSeq)
    val b = custom().orderBy("o_custkey", "rank").collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
  }
}
