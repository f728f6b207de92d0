package graft

import org.apache.spark.sql.functions._

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

  test("stream-static enrichment join equals the batch weighted rollup") {
    import spark.implicits._
    val weights = graft.queries.Relational.EventWeights
      .toDF("event_type", "weight")
    val streamed = EventStream.drainToMemory(
        EventStream.enrichedHourly(
          EventStream.readEvents(spark, sf0001), weights),
        "complete", "graft_enrich_spec")
      .orderBy("hour_start", "event_type")
      .collect().map(_.toSeq).toSeq
    // the batch twin is the ORACLE-CHECKED q67 — stream ≡ q67 ≡ DuckDB,
    // the same transitive chain the other streaming twins have
    val batch = SparkEntry.queries("q67_hourly_weighted")(spark, sf0001)
      .collect().map(_.toSeq).toSeq
    assert(streamed.nonEmpty)
    assert(streamed === batch)
  }

  test("streaming sliding windows equal the batch q61 result") {
    val streamed = EventStream
      .runSlidingOnce(spark, sf0001, "graft_sliding_spec")
      .orderBy("w_start", "event_type")
      .collect().map(_.toSeq).toSeq
    val batch = SparkEntry.queries("q61_sliding_window")(spark, sf0001)
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

  test("stream-stream LEFT OUTER join: nulls emit exactly below the eviction horizon") {
    import org.apache.spark.sql.functions._
    val streamed = EventStream.drainToMemory(
      EventStream.clickPurchaseJoinOuter(
        EventStream.readEvents(spark, sf0001)),
      "append", "graft_ssjoin_outer")
    // final global watermark = min(max click_ts, max purchase_ts) − 1 h
    val ev = Tables.events(spark, sf0001)
    val maxes = ev.filter(col("event_type").isin("click", "purchase"))
      .groupBy("event_type").agg(max("ts").as("m"))
      .agg(min("m")).collect()(0).getTimestamp(0)
    val horizonUs = maxes.getTime * 1000L - 3600L * 1000000L
    // batch reference: left join, outer rows kept only when the click's
    // 30-minute window closed strictly below the final watermark
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"),
        col("event_id").as("purchase_id"), col("ts").as("purchase_ts"))
    val batch = clicks.join(purchases,
        col("user_id") === col("p_user")
          && col("purchase_ts") >= col("click_ts")
          && col("purchase_ts") <= col("click_ts") + expr("interval 30 minutes"),
        "leftOuter")
      .filter(col("purchase_id").isNotNull ||
        unix_micros(col("click_ts")) + 30L * 60000000L < lit(horizonUs))
      .select(col("user_id"), col("click_id"), col("click_ts"),
        col("purchase_id"))
    val s = streamed.collect().map(_.toSeq).toSet
    val b = batch.collect().map(_.toSeq).toSet
    assert(streamed.filter(col("purchase_id").isNull).count() > 0,
      "no outer rows emitted — horizon logic untested")
    assert(s === b)
  }

  test("bounded top-k aggregator: streaming complete mode equals batch window") {
    import org.apache.spark.sql.functions._
    import graft.streaming.TopKAgg

    val topk = TopKAgg.topK(3) _
    val streamed = EventStream.drainToMemory(
      EventStream.readEvents(spark, sf0001)
        .groupBy("event_type")
        .agg(topk(col("value"), col("event_id")).as("top")),
      "complete", "graft_topk_agg")
      .select(col("event_type"), posexplode(col("top")).as(Seq("i", "e")))
      .select(col("event_type"), (col("i") + 1).as("rank"),
        col("e._2").as("event_id"), col("e._1").as("value"))
      .orderBy("event_type", "rank")
      .collect().map(_.toSeq).toSeq

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type")
      .orderBy(col("value").desc, col("event_id"))
    val batch = Tables.events(spark, sf0001)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("event_type"), col("rank").cast("long"),
        col("event_id"), col("value"))
      .orderBy("event_type", "rank")
      .collect().map(_.toSeq).toSeq

    assert(streamed.nonEmpty)
    assert(streamed === batch)
  }

  test("top-k aggregator buffer stays bounded and merge order cannot matter") {
    val agg = new graft.streaming.TopKAgg(3)
    val xs = Seq((5.0, 10L), (7.0, 3L), (5.0, 2L), (9.0, 8L), (1.0, 1L),
      (7.0, 4L), (9.0, 9L))
    val whole = xs.foldLeft(agg.zero)(agg.reduce)
    assert(whole.size === 3)
    assert(whole === Seq((9.0, 8L), (9.0, 9L), (7.0, 3L)))
    // split + merge at every cut point must equal the single-pass fold
    for (cut <- 0 to xs.size) {
      val (l, r) = xs.splitAt(cut)
      val m = agg.merge(l.foldLeft(agg.zero)(agg.reduce),
        r.foldLeft(agg.zero)(agg.reduce))
      assert(m === whole, s"cut at $cut diverged")
    }
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
