package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming over the events table.
  *
  * The reference has no streaming at all (its DAG is a manually-triggered
  * batch, schedule_interval=None at parser_pinecone_storage.py:189 —
  * SURVEY.md §2.9 gap). This module provides the idiomatic-Spark streaming
  * analog: file-source → event-time watermark → tumbling-window aggregate,
  * with `Trigger.AvailableNow` so a static directory drains exactly once —
  * the same code shape that tails a 100 TB/day event feed on a cluster.
  *
  * The aggregation is the streaming twin of batch query q20_hourly_events;
  * `GraftSpec` asserts both produce identical rows, which is what makes the
  * DuckDB oracle meaningful for the streaming path too.
  */
object EventStream {

  /** events.parquet schema with ts as raw INT64 nanos (the early-round
    * fixtures' parquet TIMESTAMP(NANOS) read under nanosAsLong). */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Unbounded source over the events directory.
    *
    * A streaming file source needs a DECLARED schema, but the fixture's
    * ts physical type changed across rounds (TIMESTAMP(NANOS) early,
    * TIMESTAMP(MICROS) since the round-5 regeneration), so the declared
    * schema is taken from one batch-read footer probe of the same glob —
    * a driver-side metadata read, not a data scan — and ts then
    * normalizes to the session-tz microsecond TIMESTAMP either way,
    * keeping every downstream watermark/window identical to
    * [[graft.Tables.events]]. */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // declare the FULL probed schema, not rawSchema with ts patched in: a
    // future regeneration that changes any other column's physical type
    // must land here (and then fail the named checks below / downstream
    // specs), never silently mismatch the declared streaming schema
    val probed = spark.read.option("pathGlobFilter", "events.parquet")
      .parquet(dir).schema
    require(probed.fieldNames.sameElements(rawSchema.fieldNames),
      s"events.parquet columns drifted: expected " +
        s"${rawSchema.fieldNames.mkString(",")}, found " +
        s"${probed.fieldNames.mkString(",")} — adapt EventStream deliberately")
    val raw = spark.readStream
      .schema(probed)
      // file source requires a directory: point at the fixture dir and
      // glob-filter to the events file (at scale: the event-log directory)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    probed("ts").dataType match {
      case LongType => // TIMESTAMP(NANOS) read as nanos-since-epoch
        raw.withColumn("ts",
          expr("timestamp_micros(cast(ts div 1000 as bigint))"))
      case TimestampType | TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case other => throw new IllegalStateException(
        s"events.ts has unexpected physical type $other (expected " +
          "TIMESTAMP(NANOS)-as-long, TIMESTAMP, or TIMESTAMP_NTZ) — " +
          "the fixture changed again; adapt EventStream deliberately")
    }
  }

  /** Tumbling 1-hour counts/sums per event type with a 1-hour watermark:
    * late events beyond the watermark are dropped, state is bounded. */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        // exact decimal sum surfaced as double — the q20 output-type
        // policy (no DECIMAL/TIMESTAMP in results, see Relational)
        sum(col("value").cast("decimal(12,2)")).cast("double")
          .as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
          .as("hour_start"),
        col("event_type"), col("n"), col("sum_value"))

  /** Hopping (sliding) 1-hour windows every 30 minutes — q61's streaming
    * twin: each event updates exactly len/slide = 2 window states, so
    * state is 2× the tumbling case and still watermark-bounded (closed
    * windows evict). Output columns match q61_sliding_window. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
          .as("w_start"),
        col("event_type"), col("n"))

  /** Stream-STATIC enrichment join + windowed weighted rollup — the
    * enrich-the-firehose shape: facts stream past a small static
    * dimension. The dim side of a stream-static join holds NO join
    * state (it re-resolves per micro-batch and broadcasts), so it needs
    * no watermark and the dim table can be swapped/refreshed between
    * triggers; only the aggregation state is watermark-bounded. Batch
    * twin: q39's weighted aggregate bucketed hourly (StreamingSpec
    * asserts stream ≡ batch). `weights` needs (event_type, weight). */
  def enrichedHourly(events: DataFrame, weights: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .join(broadcast(weights), Seq("event_type"))
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(12,2)") * col("weight"))
          .cast("double").as("weighted_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
          .as("hour_start"),
        col("event_type"), col("n"), col("weighted_value"))

  /** Streaming exact dedup by event_id: duplicates arriving within the
    * watermark are dropped with bounded state
    * (dropDuplicatesWithinWatermark — the streaming twin of the batch
    * dedup family in graft.operators). */
  def dedupedEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream interval join: purchases attributed to the same user's
    * clicks within the preceding 30 minutes — the streaming twin of batch
    * query q37_click_attribution (identical rows; StreamingSpec asserts it,
    * so the DuckDB oracle covers this path too).
    *
    * Both sides carry event-time watermarks and the join condition bounds
    * `purchase_ts` to [click_ts, click_ts + 30 min], which is what lets
    * Spark compute a state-eviction horizon for BOTH sides: clicks older
    * than watermark − 30 min and purchases older than the watermark are
    * dropped from the join state. Unbounded streams, bounded state — the
    * 100 TB/day requirement for any stream-stream join.
    */
  /** Shared sides + interval condition of the click→purchase join — ONE
    * definition of the watermark delays and the 30-minute window, so the
    * inner (q37-checked) and left-outer variants cannot drift apart. */
  private def clickPurchaseJoined(events: DataFrame,
      joinType: String): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", "1 hour")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"),
        col("event_id").as("purchase_id"), col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "1 hour")
    clicks.join(purchases,
      col("user_id") === col("p_user")
        && col("purchase_ts") >= col("click_ts")
        && col("purchase_ts") <= col("click_ts") + expr("interval 30 minutes"),
      joinType)
  }

  def clickPurchaseJoin(events: DataFrame): DataFrame =
    clickPurchaseJoined(events, "inner")
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        (unix_micros(col("purchase_ts")) - unix_micros(col("click_ts")))
          .as("delay_us"))

  /** LEFT OUTER form of [[clickPurchaseJoin]]: clicks with no purchase in
    * their 30-minute window emit once with a null purchase — but only
    * after the global watermark (min over both sides of max-event-time
    * minus the 1 h delay) passes the click's window end, because until
    * then a matching purchase could still arrive and the click must stay
    * in the join state. That eviction horizon is the semantic difference
    * from a batch left join, and StreamingSpec asserts it exactly: the
    * streamed result equals the batch left join RESTRICTED to clicks
    * whose window closed below the final watermark (unmatched clicks
    * above it are still buffered when a bounded run ends). */
  def clickPurchaseJoinOuter(events: DataFrame): DataFrame =
    clickPurchaseJoined(events, "leftOuter")
      .select(col("user_id"), col("click_id"), col("click_ts"),
        col("purchase_id"))

  /** Drain any streaming DataFrame to completion into an in-memory table
    * (AvailableNow processes the static fixture exactly once) and return
    * it as a DataFrame. */
  def drainToMemory(df: DataFrame, mode: String, queryName: String)
      : DataFrame = {
    val spark = df.sparkSession
    val q: StreamingQuery = df.writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }

  /** Run the streaming aggregation to completion against a static fixture. */
  def runOnce(spark: SparkSession, dir: String,
      queryName: String = "graft_events"): DataFrame =
    drainToMemory(hourlyCounts(readEvents(spark, dir)), "complete", queryName)

  /** Drain the sliding-window aggregation once against the fixture. */
  def runSlidingOnce(spark: SparkSession, dir: String,
      queryName: String = "graft_sliding"): DataFrame =
    drainToMemory(slidingCounts(readEvents(spark, dir)), "complete",
      queryName)

  /** Drain the streaming dedup once against the static fixture. */
  def runDedupOnce(spark: SparkSession, dir: String,
      queryName: String = "graft_dedup"): DataFrame =
    drainToMemory(dedupedEvents(readEvents(spark, dir)), "append", queryName)

  /** Drain the stream-stream attribution join once against the fixture. */
  def runJoinOnce(spark: SparkSession, dir: String,
      queryName: String = "graft_ssjoin"): DataFrame =
    drainToMemory(clickPurchaseJoin(readEvents(spark, dir)), "append",
      queryName)
}
