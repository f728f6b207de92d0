package graft

import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(us: Long) = us

  test("backward as-of picks the latest right row at-or-before each left") {
    val left = Seq((1L, 100L, "e1"), (1L, 250L, "e2"), (2L, 50L, "e3"))
      .toDF("k", "us", "tag")
      .select(col("k"), expr("timestamp_micros(us)").as("t"), col("tag"))
    val right = Seq((1L, 100L, 10.0), (1L, 200L, 20.0), (2L, 60L, 30.0))
      .toDF("k", "us", "v")
      .select(col("k"), expr("timestamp_micros(us)").as("t"), col("v"))

    val out = AsOfJoin.backward(left, right, Seq("k"), "t", "t", Seq("v"))
      .select(col("k"), col("tag"), unix_micros(col("matched_ts")).as("mus"),
        col("matched_v"))
      .collect().map(_.toSeq).toSet

    assert(out === Set(
      Seq(1L, "e1", 100L, 10.0),  // equal timestamps match
      Seq(1L, "e2", 200L, 20.0))) // latest ≤ 250 is 200; e3 has no match ≤ 50
  }

  test("inner semantics: left rows with no prior right row are dropped") {
    val left = Seq((1L, 10L)).toDF("k", "us")
      .select(col("k"), expr("timestamp_micros(us)").as("t"),
        lit("x").as("tag"))
    val right = Seq((1L, 20L, 1.0)).toDF("k", "us", "v")
      .select(col("k"), expr("timestamp_micros(us)").as("t"), col("v"))
    assert(AsOfJoin.backward(left, right, Seq("k"), "t", "t", Seq("v"))
      .count() === 0)
  }
}
