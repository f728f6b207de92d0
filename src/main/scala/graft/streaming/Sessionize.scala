package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Sessionization of the event stream: events from one user belong to the
  * same session while consecutive gaps stay under `gapMinutes`.
  *
  * Batch path: the built-in `session_window` (declarative — Catalyst plans
  * the merge, partial aggregation included). Streaming path: explicit
  * per-key state via `flatMapGroupsWithState` with event-time timeout —
  * the shape for custom state logic the built-in window can't express
  * (e.g. emitting partial sessions, enrichment, caps). The spec pins the
  * streaming output to a subset-equality against the batch result (append
  * mode can only flush sessions the watermark has passed).
  */
object Sessionize {

  val GapMinutes = 30

  /** One row per (user, session): session_seq assigned by start time. */
  def batchSessions(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("start_us")
    graft.Tables.events(spark, dir)
      .groupBy(col("user_id"),
        session_window(col("ts"), s"$GapMinutes minutes"))
      .agg(count(lit(1)).as("n_events"),
        unix_micros(min(col("ts"))).as("start_us"),
        unix_micros(max(col("ts"))).as("end_us"))
      .withColumn("session_seq", row_number().over(w))
      .select("user_id", "session_seq", "n_events", "start_us", "end_us")
  }

  // ts stays in the schema: event-time timeout requires the watermarked
  // column to reach the stateful operator
  case class Ev(user_id: Long, ts: java.sql.Timestamp, ts_us: Long)
  case class Sess(user_id: Long, start_us: Long, end_us: Long,
      n_events: Long)
  case class SessState(start_us: Long, end_us: Long, n: Long)

  /** Streaming sessionization with explicit state: sessions emit when the
    * event-time watermark passes their close. */
  def streamingSessions(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val gapUs = GapMinutes * 60L * 1000000L
    EventStream.readEvents(spark, dir)
      .withWatermark("ts", "30 minutes")
      .select(col("user_id"), col("ts"), unix_micros(col("ts")).as("ts_us"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[SessState], Sess](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, events: Iterator[Ev], state: GroupState[List[SessState]]) =>
          if (state.hasTimedOut) {
            val done = state.getOption.getOrElse(Nil)
            state.remove()
            done.iterator.map(s => Sess(user, s.start_us, s.end_us, s.n))
          } else {
            // merge incoming events into gap-separated sessions. An event
            // may fall into ANY open session (watermark-valid out-of-order
            // arrivals across micro-batches), and may bridge two sessions —
            // partition + fold merges every overlapping session. Strict
            // bounds: an event exactly gap-away opens a new session,
            // matching session_window's [t, t+gap) windows.
            val incoming = events.map(_.ts_us).toArray.sorted
            var sessions = state.getOption.getOrElse(Nil)
            incoming.foreach { t =>
              val (overlapping, rest) = sessions.partition(sess =>
                t > sess.start_us - gapUs && t < sess.end_us + gapUs)
              val merged = overlapping.foldLeft(SessState(t, t, 1)) {
                (acc, sess) =>
                  SessState(math.min(acc.start_us, sess.start_us),
                    math.max(acc.end_us, sess.end_us), acc.n + sess.n)
              }
              sessions = merged :: rest
            }
            val wm = state.getCurrentWatermarkMs() * 1000L
            val (closed, open) = sessions.partition(_.end_us + gapUs < wm)
            if (open.isEmpty) state.remove() else state.update(open)
            if (open.nonEmpty)
              state.setTimeoutTimestamp(math.max(
                state.getCurrentWatermarkMs() + 1,
                (open.map(_.end_us).max / 1000L) + GapMinutes * 60L * 1000L))
            closed.iterator.map(s => Sess(user, s.start_us, s.end_us, s.n))
          }
      }.toDF()
  }

  /** Drain the streaming sessionizer once against the static fixture. */
  def runOnce(spark: SparkSession, dir: String,
      queryName: String = "graft_sessions"): DataFrame =
    EventStream.drainToMemory(streamingSessions(spark, dir), "append",
      queryName)
}
