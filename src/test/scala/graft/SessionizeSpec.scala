package graft

import graft.streaming.Sessionize

class SessionizeSpec extends SparkTestBase {

  test("streaming sessions are a subset of batch sessions, and cover all " +
    "watermark-closed sessions") {
    val batch = Sessionize.batchSessions(spark, sf0001)
      .select("user_id", "start_us", "end_us", "n_events")
      .collect().map(_.toSeq).toSet
    val streamed = Sessionize.runOnce(spark, sf0001, "graft_sessions_spec")
      .select("user_id", "start_us", "end_us", "n_events")
      .collect().map(_.toSeq)
    assert(streamed.nonEmpty, "no sessions flushed")
    assert(streamed.toSet.subsetOf(batch),
      "streaming emitted a session batch does not have")
    // append mode withholds sessions until the key's event-time timeout
    // fires (one timeout per key = the user's newest session): a session
    // may only be missing if its USER still has a session the watermark
    // has not passed
    val maxEnd = batch.map(_(2).asInstanceOf[Long]).max
    val watermarkUs = maxEnd - 30L * 60 * 1000000
    val gapUs = 30L * 60 * 1000000
    val missing = batch -- streamed.toSet
    val usersWithOpen = batch
      .filter(s => s(2).asInstanceOf[Long] + gapUs >= watermarkUs)
      .map(_(0)).toSet
    assert(missing.forall(s => usersWithOpen.contains(s(0))),
      "a session was withheld although its user had fully timed out")
  }

  test("single user with a big gap splits into two sessions") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val t0 = 1700000000000000L
    val evs = Seq(t0, t0 + 60_000_000L, t0 + 10L * 60 * 1000000,
      t0 + 120L * 60 * 1000000)
    val df = evs.map(us => (1L, us)).toDF("user_id", "us")
      .select(col("user_id"), expr("timestamp_micros(us)").as("ts"))
    val sessions = df
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .select("user_id", "n").collect().map(_.getLong(1)).sorted
    assert(sessions.toSeq === Seq(1L, 3L))
  }
}
