package graft

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def evts(rows: Seq[(Long, Long)], idCol: String, tsCol: String) =
    rows.toDF(idCol, "us")
      .select(col(idCol), expr("timestamp_micros(us)").as(tsCol))

  test("tolerance join matches brute force, including exact-boundary pairs") {
    // right at −tol, inside, 0, inside, +tol, and one past each edge
    val left = evts(Seq((1L, 1000000L)), "l_id", "l_ts")
    val right = evts(
      Seq((10L, 0L), (11L, 999999L), (12L, 1000000L), (13L, 1500000L),
        (14L, 2000000L), (15L, 2000001L), (16L, -1L)),
      "r_id", "r_ts")

    val got = RangeJoin.byTolerance(left, right, "l_ts", "r_ts", 1000000L)
      .select("l_id", "r_id").as[(Long, Long)].collect().sorted.toSeq
    assert(got === Seq((1L, 10L), (1L, 11L), (1L, 12L), (1L, 13L), (1L, 14L)))
  }

  test("each qualifying pair is emitted exactly once (no bucket dedup pass)") {
    // many rows inside one tolerance window, crossing a bucket boundary
    val left = evts((0L until 20L).map(i => (i, i * 100000L)), "l_id", "l_ts")
    val right = evts((0L until 20L).map(i => (100 + i, i * 100000L + 50L)),
      "r_id", "r_ts")
    val out = RangeJoin.byTolerance(left, right, "l_ts", "r_ts", 300000L)
      .select("l_id", "r_id").as[(Long, Long)].collect().toSeq

    val brute = for {
      i <- 0L until 20L; j <- 0L until 20L
      if math.abs(i * 100000L - (j * 100000L + 50L)) <= 300000L
    } yield (i, 100 + j)
    assert(out.sorted === brute.sorted)
    assert(out.size === out.distinct.size)
  }

  test("pairs straddling the epoch (negative timestamps) still match") {
    // floor-division bucketing must stay monotone across 0: truncating
    // division would put −1 µs and +1 µs three buckets apart
    val left = evts(Seq((1L, -400000L)), "l_id", "l_ts")
    val right = evts(Seq((10L, 500000L), (11L, -1400000L), (12L, -1500000L)),
      "r_id", "r_ts")
    val got = RangeJoin.byTolerance(left, right, "l_ts", "r_ts", 1000000L)
      .select("l_id", "r_id").as[(Long, Long)].collect().sorted.toSeq
    assert(got === Seq((1L, 10L), (1L, 11L)))
  }

  test("extra equi predicate composes with the tolerance") {
    val left = Seq((1L, 100L, "a"), (2L, 100L, "b")).toDF("l_id", "us", "lk")
      .select(col("l_id"), expr("timestamp_micros(us)").as("l_ts"), col("lk"))
    val right = Seq((10L, 150L, "a"), (11L, 150L, "b")).toDF("r_id", "us2", "rk")
      .select(col("r_id"), expr("timestamp_micros(us2)").as("r_ts"), col("rk"))
    val out = RangeJoin.byTolerance(left, right, "l_ts", "r_ts", 1000L,
        on = col("lk") === col("rk"))
      .select("l_id", "r_id").as[(Long, Long)].collect().toSet
    assert(out === Set((1L, 10L), (2L, 11L)))
  }

  test("plans as a shuffled equi-join, never a nested-loop/cartesian product") {
    val left = evts(Seq((1L, 0L), (2L, 500L)), "l_id", "l_ts")
    val right = evts(Seq((10L, 100L), (11L, 700L)), "r_id", "r_ts")
    val plan = RangeJoin.byTolerance(left, right, "l_ts", "r_ts", 1000L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("rejects overlapping column names and non-positive tolerance") {
    val df = evts(Seq((1L, 0L)), "id", "ts")
    intercept[IllegalArgumentException] {
      RangeJoin.byTolerance(df, df, "ts", "ts", 10L)
    }
    intercept[IllegalArgumentException] {
      RangeJoin.byTolerance(
        evts(Seq((1L, 0L)), "a", "ta"), evts(Seq((1L, 0L)), "b", "tb"),
        "ta", "tb", 0L)
    }
  }
}
