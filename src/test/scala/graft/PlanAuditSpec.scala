package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.PlanAudit

/** The static scale audit flags the anti-patterns the engine's own
  * queries avoid, and stays quiet on the disciplined forms. */
class PlanAuditSpec extends SparkTestBase {

  test("flags a global window; quiet on a keyed one") {
    val ev = Tables.events(spark, sf0001).select("event_id", "user_id", "ts")
    val bad = ev.withColumn("rn",
      row_number().over(Window.orderBy("ts")))
    assert(PlanAudit.audit(bad).exists(_.kind === "global-window"))
    val good = ev.withColumn("rn",
      row_number().over(Window.partitionBy("user_id").orderBy("ts")))
    assert(!PlanAudit.audit(good).exists(_.kind === "global-window"))
  }

  test("flags a condition-less nested-loop join; quiet on broadcast equi") {
    val a = Tables.customer(spark, sf0001).select("c_custkey")
    val b = Tables.nation(spark, sf0001).select("n_nationkey", "n_name")
    val cross = a.crossJoin(b)
    assert(PlanAudit.audit(cross).exists(f =>
      f.kind === "nested-loop-join" || f.kind === "cartesian-product"))
    val equi = Tables.customer(spark, sf0001)
      .join(broadcast(Tables.nation(spark, sf0001)),
        col("c_nationkey") === col("n_nationkey"))
    assert(PlanAudit.audit(equi).isEmpty)
  }

  test("flags a pushdown-blocking filter; quiet on a pushable one") {
    val li = Tables.lineitem(spark, sf0001)
    // a function of the column blocks parquet pushdown
    val blocked = li.filter(
      length(col("l_returnflag").cast("string")) + lit(0) > 0 &&
        abs(col("l_quantity") * 2.0) > 1.0)
    val pushable = li.filter(col("l_quantity") > 10.0)
    assert(!PlanAudit.audit(pushable).exists(_.kind === "unpushed-filter"))
    // the blocked form either pushes nothing (flagged) or Spark managed
    // to extract something — accept either, but the audit must not crash
    PlanAudit.audit(blocked): Unit
  }

  test("the engine's own flagship queries audit clean") {
    for (name <- Seq("q01_pricing_summary", "q42_shipping_priority",
        "q57_pagerank", "d02_minhash_lsh", "r02_rag_search")) {
      val df = SparkEntry.queries(name)(spark, sf0001)
      val findings = PlanAudit.audit(df)
        // the bounded 1-row/broadcast-tiny cross joins the engine uses
        // deliberately are the documented exception
        .filterNot(_.kind === "nested-loop-join")
      assert(findings.isEmpty,
        s"$name: ${findings.map(f => f.kind + ": " + f.detail)}")
    }
  }
}
