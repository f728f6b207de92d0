package graft

import org.apache.spark.sql.functions._

import graft.operators.IncrementalAgg

class IncrementalAggSpec extends SparkTestBase {
  import spark.implicits._

  private val keys = Seq("user_id", "event_type")

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("user_id", "event_type").collect().map(_.toSeq).toSeq

  test("merging split states equals the full recompute, any split") {
    val ev = Tables.events(spark, sf0001)
    val full = IncrementalAgg.state(ev, keys, "value")
    // split by an arbitrary predicate — event parity
    val a = IncrementalAgg.state(ev.filter(col("event_id") % 2 === 0), keys, "value")
    val b = IncrementalAgg.state(ev.filter(col("event_id") % 2 === 1), keys, "value")
    assert(canon(IncrementalAgg.merge(Seq(a, b), keys)) === canon(full))
    // three-way split merges the same
    val s3 = (0 to 2).map(i =>
      IncrementalAgg.state(ev.filter(col("event_id") % 3 === i), keys, "value"))
    assert(canon(IncrementalAgg.merge(s3, keys)) === canon(full))
  }

  test("merging an empty delta is the identity") {
    val ev = Tables.events(spark, sf0001)
    val full = IncrementalAgg.state(ev, keys, "value")
    val empty = IncrementalAgg.state(ev.filter(lit(false)), keys, "value")
    assert(canon(IncrementalAgg.merge(Seq(full, empty), keys)) === canon(full))
  }

  test("keys unique to the delta appear in the merged state") {
    val base = Seq((1L, "click", 2L, BigDecimal("3.00")))
      .toDF("user_id", "event_type", "n", "sum_val")
      .select(col("user_id"), col("event_type"), col("n"),
        col("sum_val").cast("decimal(12,2)").as("sum_val"))
    val delta = Seq((2L, "view", 1L, BigDecimal("5.50")))
      .toDF("user_id", "event_type", "n", "sum_val")
      .select(col("user_id"), col("event_type"), col("n"),
        col("sum_val").cast("decimal(12,2)").as("sum_val"))
    val out = IncrementalAgg.merge(Seq(base, delta), keys)
      .select(col("user_id"), col("event_type"), col("n"),
        col("sum_val").cast("double"))
      .collect().map(_.toSeq).toSet
    assert(out === Set(Seq(1L, "click", 2L, 3.0), Seq(2L, "view", 1L, 5.5)))
  }
}
