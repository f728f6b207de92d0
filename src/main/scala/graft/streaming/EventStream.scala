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

  /** events.parquet schema with ts as raw INT64 nanos (the fixture's
    * parquet TIMESTAMP(NANOS) read under nanosAsLong). */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Unbounded source over the events directory. */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream
      .schema(rawSchema)
      // file source requires a directory: point at the fixture dir and
      // glob-filter to the events file (at scale: the event-log directory)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts",
        expr("timestamp_micros(cast(ts div 1000 as bigint))"))
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

  /** Streaming exact dedup by event_id: duplicates arriving within the
    * watermark are dropped with bounded state
    * (dropDuplicatesWithinWatermark — the streaming twin of the batch
    * dedup family in graft.operators). */
  def dedupedEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

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

  /** Drain the streaming dedup once against the static fixture. */
  def runDedupOnce(spark: SparkSession, dir: String,
      queryName: String = "graft_dedup"): DataFrame =
    drainToMemory(dedupedEvents(readEvents(spark, dir)), "append", queryName)
}
