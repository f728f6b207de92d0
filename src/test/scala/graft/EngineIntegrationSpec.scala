package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{IncrementalAgg, SnapshotStore}
import graft.plans.MaterializedViews

/** End-to-end composition of the engine's maintenance features — the
  * production loop a dashboard-serving pipeline runs:
  *
  *   micro-batches → IncrementalAgg state merged per batch →
  *   SnapshotStore versions (exactly-once txn markers) →
  *   MaterializedViews.register of the fresh state →
  *   the UNCHANGED analytical query silently reads the summary.
  *
  * Each piece is specced alone elsewhere; this pins that they compose —
  * the corpus is never rescanned after ingestion, replays are no-ops,
  * and the served answer tracks the data through refreshes. */
class EngineIntegrationSpec extends SparkTestBase {

  private def cleanup(path: String): Unit = {
    val f = new java.io.File(path)
    if (f.exists()) {
      import scala.reflect.io.Directory
      new Directory(f).deleteRecursively(): Unit
    }
  }

  private def summaryFiles(df: DataFrame): Set[String] =
    df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        r.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.location.inputFiles.toSeq
          case _ => Nil
        }
    }.flatten.toSet

  test("stream → incremental agg snapshots → MV rewrite serves the query") {
    import spark.implicits._
    val store = "target/integration-agg-store"
    cleanup(store)
    try {
      val events = Tables.events(spark, sf0001)
        .select(col("event_type"), col("value"), col("event_id"))
      // the analytical query a dashboard runs (per-type count + exact sum)
      def dashboard(): DataFrame = events
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(12,2)")).as("sum_val"))

      // ingest in 3 micro-batches: per batch, merge the DELTA's partial
      // aggregate into the stored state (corpus never rescanned) and
      // publish exactly-once
      val splits = Seq(
        events.filter(pmod(col("event_id"), lit(3)) === 0),
        events.filter(pmod(col("event_id"), lit(3)) === 1),
        events.filter(pmod(col("event_id"), lit(3)) === 2))
      // re-summing widens the decimal — pin the stored type or the
      // store's retype guard would (rightly) reject the second commit
      def pinned(df: DataFrame): DataFrame = df
        .withColumn("sum_val", col("sum_val").cast("decimal(22,2)"))
        .withColumn("doc_id", xxhash64(col("event_type")))
      splits.zipWithIndex.foreach { case (batch, i) =>
        val delta = pinned(
          IncrementalAgg.state(batch, Seq("event_type"), "value"))
        val merged = SnapshotStore.currentVersion(spark, store) match {
          case None => delta
          case Some(_) =>
            val prev = SnapshotStore.read(spark, store)
              .select("event_type", "n", "sum_val")
            pinned(IncrementalAgg.merge(
              Seq(prev, delta.select("event_type", "n", "sum_val")),
              Seq("event_type")))
        }
        SnapshotStore.commitBatch(merged, store, buckets = 2,
          streamId = "agg_maintenance", batchId = i.toLong)
      }
      // a replayed final batch is a no-op (exactly-once)
      val headV = SnapshotStore.currentVersion(spark, store).get
      SnapshotStore.commitBatch(
        pinned(IncrementalAgg.state(splits.last, Seq("event_type"),
          "value")),
        store, 2, "agg_maintenance", batchId = 2L)
      assert(SnapshotStore.currentVersion(spark, store).get === headV)

      // the maintained state IS the dashboard aggregate (captured from
      // the BASE scan, before any rewrite can exist)
      val want = dashboard().as[(String, Long, BigDecimal)].collect().toSet
      val state = SnapshotStore.read(spark, store)
        .select("event_type", "n", "sum_val")
      assert(state.as[(String, Long, BigDecimal)].collect().toSet === want)

      // register it as the dashboard query's materialized form: the
      // UNCHANGED query now reads the snapshot's files, not events
      MaterializedViews.register("dash_by_type", dashboard(), state)
      val served = dashboard()
      val files = summaryFiles(served)
      assert(files.nonEmpty && files.forall(_.contains("integration-agg-store")),
        s"expected only snapshot files, scanned: $files")
      assert(served.as[(String, Long, BigDecimal)].collect().toSet === want)
    } finally MaterializedViews.clear()
  }
}
