package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass data-quality validation gate (the Deequ-style check suite a
  * pipeline runs before committing a partition of a 100 TB table — the
  * reference has no validation at all; a malformed PDF extraction lands in
  * Pinecone silently).
  *
  * Every row-level constraint compiles to ONE conditional count inside a
  * single aggregate over the frame, and uniqueness constraints ride the
  * same pass as count − count(distinct …) — so an arbitrary number of
  * checks costs exactly one scan + one (1-row) aggregation, and the wide
  * verdict row unpivots into one row per check. No per-check jobs, no
  * driver-side row inspection.
  */
object DataChecks {

  /** Run row-level predicates (`name` → must-hold predicate) and
    * uniqueness checks (`name` → key column) in one pass. Output, one row
    * per check: (check, violations, total, pass) ordered by check name. */
  def run(df: DataFrame, rowChecks: Seq[(String, Column)],
      uniqueChecks: Seq[(String, Column)] = Nil): DataFrame = {
    require(rowChecks.nonEmpty || uniqueChecks.nonEmpty, "no checks given")
    // coalesce: sum over an EMPTY frame is null — an empty partition must
    // gate as "0 violations, pass", not a null verdict
    val rowAggs = rowChecks.map { case (name, pred) =>
      coalesce(sum(when(pred, 0L).otherwise(1L)), lit(0L)).as(name)
    }
    // a duplicated key contributes (occurrences − 1) violations
    val uniqAggs = uniqueChecks.map { case (name, key) =>
      (count(key) - count_distinct(key)).as(name)
    }
    val aggs = rowAggs ++ uniqAggs
    val wide = df.agg(count(lit(1)).as("graft_total"),
      (aggs.head +: aggs.tail): _*)
    wide.unpivot(
        Array(col("graft_total")),
        (rowChecks ++ uniqueChecks).map { case (n, _) => col(n) }.toArray,
        "check_name", "violations")
      .select(col("check_name"), col("violations"),
        col("graft_total").as("total"),
        (col("violations") === 0L).as("pass"))
      .orderBy("check_name")
  }

  /** Inline observability: named metrics computed DURING the next action
    * on the returned frame — accumulator-style, zero additional scans or
    * jobs (`DataChecks.run` is a gate you execute; this is telemetry that
    * rides along). The 100 TB use: every pipeline stage publishes row /
    * null / distribution counters without ever re-reading its input.
    * Read the result from the returned Observation after the action:
    * `obs.get("n_rows")`. */
  def observed(df: DataFrame, name: String, metrics: (String, Column)*)
      : (DataFrame, org.apache.spark.sql.Observation) = {
    require(metrics.nonEmpty, "no metrics given")
    val obs = org.apache.spark.sql.Observation(name)
    val cols = metrics.map { case (n, c) => c.as(n) }
    (df.observe(obs, cols.head, cols.tail: _*), obs)
  }
}
