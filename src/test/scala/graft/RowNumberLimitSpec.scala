package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The row_number-limit → TopKPerKey optimizer rewrite
  * (graft.plans.RowNumberLimitRule), active in this suite's session via
  * GraftExtensions. */
class RowNumberLimitSpec extends SparkTestBase {

  private val w = Window.partitionBy("o_custkey")
    .orderBy(col("o_totalprice").desc, col("o_orderkey"))

  private def ranked(): DataFrame =
    Tables.orders(spark, sf0001).withColumn("rn", row_number().over(w))

  test("filter(rn <= k) over row_number plans as TopKPerKey, not Window") {
    val q = ranked().filter(col("rn") <= 3)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), s"rewrite did not fire:\n$plan")
    assert(!plan.contains("Window"), s"Window survived the rewrite:\n$plan")
  }

  test("rewritten result equals the unrewritten window semantics") {
    // reference: full window with NO filter in the plan (pattern can't
    // fire), rank filter applied driver-side
    val reference = ranked()
      .select("o_custkey", "rn", "o_orderkey").collect()
      .filter(_.getInt(1) <= 3)
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .sortBy(x => (x._1, x._2)).toSeq
    val rewritten = ranked().filter(col("rn") <= 3)
      .select("o_custkey", "rn", "o_orderkey").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .sortBy(x => (x._1, x._2)).toSeq
    assert(rewritten === reference)
  }

  test("rank() keeps its Window plan — tie semantics differ") {
    val q = Tables.orders(spark, sf0001)
      .withColumn("rk", rank().over(
        Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc)))
      .filter(col("rk") <= 3)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("Window"))
    assert(!plan.contains("TopKPerKey"))
  }

  test("extra filter conjuncts survive above the rewritten node") {
    val q = ranked()
      .filter(col("rn") <= 3 && col("o_totalprice") > 50000.0)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"))
    val viaRule = q.select("o_custkey", "rn", "o_orderkey").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sortBy(x => x).toSeq
    val reference = ranked()
      .select("o_custkey", "rn", "o_orderkey", "o_totalprice").collect()
      .filter(r => r.getInt(1) <= 3 && r.getDouble(3) > 50000.0)
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sortBy(x => x).toSeq
    assert(viaRule === reference)
  }

  test("rn = 1 (latest-record-per-key) fires with k = 1") {
    val q = ranked().filter(col("rn") === 1)
    assert(q.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    val keys = q.select("o_custkey").as[Long](spark.implicits.newLongEncoder)
      .collect().sorted.toSeq
    assert(keys === keys.distinct, "more than one row for some key")
    assert(q.count() ===
      Tables.orders(spark, sf0001).select("o_custkey").distinct().count())
  }
}
