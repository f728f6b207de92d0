package graft

import graft.streaming.EventStream

class StreamingSpec extends SparkTestBase {

  test("streaming hourly counts equal the batch q20 result") {
    val streamed = EventStream.runOnce(spark, sf0001, "graft_events_spec")
      .orderBy("hour_start", "event_type")
      .collect().map(_.toSeq).toSeq
    val batch = SparkEntry.queries("q20_hourly_events")(spark, sf0001)
      .collect().map(_.toSeq).toSeq
    // batch emits timestamp_ntz; align representations via string compare
    assert(streamed.map(_.map(String.valueOf(_))) ===
      batch.map(_.map(String.valueOf(_))))
    assert(streamed.nonEmpty)
  }

  test("streaming dedup by event_id keeps exactly the distinct ids") {
    val streamed = EventStream
      .runDedupOnce(spark, sf0001, "graft_dedup_spec")
    val distinctIds = Tables.events(spark, sf0001)
      .select("event_id").distinct().count()
    assert(streamed.count() === distinctIds)
    assert(streamed.select("event_id").distinct().count() === distinctIds)
  }
}
