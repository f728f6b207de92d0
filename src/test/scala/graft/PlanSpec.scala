package graft

/** Plan-shape regression tests: the physical plans the engine relies on at
  * scale must stay the plans Catalyst actually picks. Each assertion pins a
  * property argued in the operator docs (pushdown, broadcast, top-k without
  * full sort, partial aggregation). */
class PlanSpec extends SparkTestBase {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf0001)
      .queryExecution.executedPlan.toString

  test("q02 filters and projection reach the parquet scan") {
    val p = plan("q02_filter_project")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"),
      "filters not pushed to the scan")
    // pruned read schema: only the 6 referenced columns, not all 11
    assert(!p.contains("l_returnflag") && !p.contains("l_tax"),
      "scan reads unprojected columns")
  }

  test("q03 joins the dim side via broadcast, not shuffle") {
    val p = plan("q03_join_broadcast")
    assert(p.contains("BroadcastHashJoin"))
  }

  test("q04 multiway join broadcasts every dim") {
    val p = plan("q04_join_multiway")
    assert(p.split("BroadcastHashJoin").length >= 4,
      "expected ≥3 broadcast joins for customer/nation/region")
  }

  test("r02 broadcasts the top-k side, never the documents corpus") {
    val p = plan("r02_rag_search")
    val bx = p.indexOf("BroadcastExchange")
    assert(bx >= 0, s"no broadcast join in r02 plan:\n$p")
    // the broadcast subtree is printed below the exchange: it must be the
    // ≤10-row TakeOrderedAndProject limit, and the documents scan must
    // stream (appear only before the exchange in the printed tree)
    val build = p.substring(bx)
    assert(build.contains("TakeOrderedAndProject"),
      s"broadcast build side is not the top-k limit:\n$p")
    assert(!build.contains("documents.parquet"),
      s"documents corpus ended up on the broadcast side:\n$p")
  }

  test("q13 top-k plans as TakeOrderedAndProject (no full sort)") {
    val p = plan("q13_topk")
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("SortExec"), "top-k fell back to a global sort")
  }

  test("q01 aggregation is partial (map-side combine) before the shuffle") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("partial_sum") || p.contains("HashAggregate"),
      "no partial aggregation in plan")
  }

  test("r01 top-k similarity never full-sorts the index") {
    val p = plan("r01_topk_sim")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("fused minhash signature is map-only: no aggregate, no " +
      "doc_id exchange (round 13 — the flat explode+partial-agg " +
      "pipeline was replaced by the per-row MinHashSigExpr)") {
    val p = graft.operators.MinHashLSH
      .signatures(Tables.documents(spark, sf0001), 12)
      .queryExecution.executedPlan.toString
    assert(p.contains("minhash_sig"),
      s"fused signature expression missing from the plan:\n$p")
    assert(!p.contains("HashAggregate"),
      s"signature plan re-grew an aggregate:\n$p")
    assert(!p.contains("Exchange hashpartitioning(doc_id"),
      s"signature plan re-grew the doc_id exchange:\n$p")
    // the fused expression must be evaluated ONCE, not inlined into
    // each of the 12 element_at projections by CollapseProject
    assert("minhash_sig".r.findAllIn(p).size <= 2,
      s"fused signature inlined per column:\n$p")
  }

  test("d07 jaccard counts aggregate partially and never cross-join") {
    val p = plan("d07_ngram_jaccard")
    assert(p.contains("partial_count"),
      s"co-occurrence count has no map-side combine:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"d07 contains an all-pairs join:\n$p")
  }

  test("s04/s05 broadcast the bounded query side, never product the corpus") {
    // the only nested-loop join allowed is the crossJoin against the
    // broadcast ≤5-row query set; a CartesianProduct means the broadcast
    // hint was lost and the corpus would self-join at scale
    Seq("s04_ann_recall", "s05_int8_topk").foreach { name =>
      val p = plan(name)
      assert(!p.contains("CartesianProduct"),
        s"$name plans a cartesian product:\n$p")
      assert(p.contains("BroadcastExchange"),
        s"$name lost the query-side broadcast:\n$p")
    }
  }

  test("q36/q37 temporal joins are equi-joins, never nested-loop/cartesian") {
    // q36 has NO equi-key (pure |Δts| ≤ tol predicate): without the
    // RangeJoin bucketing Catalyst could only plan BroadcastNestedLoopJoin.
    // q37's range condition must ride the user_id equi-join as a filter.
    Seq("q36_range_join", "q37_click_attribution").foreach { name =>
      val p = plan(name)
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"),
        s"$name plans an all-pairs join:\n$p")
    }
  }

  test("s13 rank filter rewrites into TopKPerKey, no Window survives") {
    // the uniform rank <= 3 conjunct must keep triggering
    // RowNumberLimitRule; if the query's filter shape regresses, the
    // plan falls back to a full per-partition window sort
    val p = plan("s13_hard_negatives")
    assert(p.contains("TopKPerKey"), s"rewrite did not fire:\n$p")
    assert(!p.contains("Window"), s"window survived the rewrite:\n$p")
  }

  test("approx_count_distinct lands within 5% of exact") {
    import org.apache.spark.sql.functions._
    // the tight 5% contract at this fixed sf (the driver-hashed verdict
    // in q22 uses a flake-proof 15% bound; the 5% accuracy claim lives
    // here, where the data is pinned)
    val rows = Tables.lineitem(spark, sf0001)
      .groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_partkey"), 0.01).as("approx"),
        countDistinct(col("l_partkey")).as("exact"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getLong(r.fieldIndex("approx"))
      val exact  = r.getLong(r.fieldIndex("exact"))
      assert(math.abs(approx - exact) <= exact * 0.05,
        s"approx for ${r.getString(0)} off by >5%: $approx vs $exact")
    }
    val verdicts = SparkEntry.queries("q22_approx_distinct")(spark, sf0001)
      .collect()
    assert(verdicts.forall(_.getBoolean(verdicts.head.fieldIndex("approx_ok"))))
  }
}
