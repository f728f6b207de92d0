package graft

import graft.streaming.EventStream

class StreamingSpec extends SparkTestBase {

  test("streaming hourly counts equal the batch q20 result") {
    val streamed = EventStream.runOnce(spark, sf0001, "graft_events_spec")
      .orderBy("hour_start", "event_type")
      .collect().map(_.toSeq).toSeq
    val batch = SparkEntry.queries("q20_hourly_events")(spark, sf0001)
      .collect().map(_.toSeq).toSeq
    assert(streamed === batch)
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

  test("stream-stream interval join equals the batch q37 result") {
    val streamed = EventStream.runJoinOnce(spark, sf0001, "graft_ssjoin_spec")
      .orderBy("user_id", "click_id", "purchase_id")
      .collect().map(_.toSeq).toSeq
    val batch = SparkEntry.queries("q37_click_attribution")(spark, sf0001)
      .collect().map(_.toSeq).toSeq
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("streaming dedup actually drops planted duplicates") {
    // the fixture has no duplicate event_ids, so plant some: a MemoryStream
    // with every event delivered twice across two batches
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[(Long, Long)] // (event_id, ts_us)
    val base = (1L to 50L).map(i => (i, 1700000000000000L + i * 1000000L))
    ms.addData(base)
    ms.addData(base) // exact duplicates, well inside the watermark
    val df = ms.toDF()
      .select(col("_1").as("event_id"),
        expr("timestamp_micros(_2)").as("ts"))
    val out = EventStream.drainToMemory(
      EventStream.dedupedEvents(df), "append", "graft_dedup_planted")
    assert(out.count() === 50, "duplicates were not dropped")
    assert(out.select("event_id").distinct().count() === 50)
  }
}
