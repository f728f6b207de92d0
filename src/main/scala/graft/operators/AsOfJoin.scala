package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for every left row, the latest right row whose
  * timestamp is ≤ the left timestamp, per key.
  *
  * Spark has no as-of join operator. Rather than a theta-join
  * (`l.ts >= r.ts` range condition → BroadcastNestedLoopJoin, quadratic),
  * this composes existing operators in the shape that scales:
  *
  *   1. union both sides, tagged (right=0, left=1);
  *   2. one shuffle: Window.partitionBy(keys).orderBy(ts, side, …);
  *   3. running `last(right_payload, ignoreNulls)` carries the most recent
  *      right row forward to each left row (running frames evaluate
  *      incrementally — O(n log n) for the sort, not O(n²));
  *   4. keep left rows, inner-match semantics (unmatched dropped).
  *
  * Right rows at the same (key, ts) as a left row DO match (ties sort
  * side=0 first), exactly DuckDB's `ASOF JOIN … ON l.ts >= r.ts`, which is
  * what the oracle uses. Callers wanting determinism under duplicate right
  * timestamps should pre-aggregate the right side to one row per (key, ts).
  */
object AsOfJoin {

  /** @param keys       equi-join key columns present on both sides
    * @param leftTs     event-time column on the left
    * @param rightTs    event-time column on the right
    * @param rightCols  right-side payload columns to surface (prefixed
    *                   `matched_`, plus `matched_ts` for the right time) */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, rightCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.types.{StructField, StructType}
    val keyCols = keys.map(col)
    val payload = struct(
      (col(rightTs).as("ts") +: rightCols.map(c => col(c).as(c))): _*)
    val payloadType = StructType(
      StructField("ts", right.schema(rightTs).dataType) +:
        rightCols.map(c => StructField(c, right.schema(c).dataType)))

    val leftCols = left.columns.filterNot(keys.contains).filterNot(_ == leftTs)
    val leftType = StructType(
      leftCols.map(c => StructField(c, left.schema(c).dataType)))
    val lTagged = left.select(
      keyCols :+ col(leftTs).as("__ts") :+ lit(1).as("__side") :+
        struct(leftCols.map(col): _*).as("__l") :+
        lit(null).cast(payloadType).as("__r"): _*)
    val rTagged = right.select(
      keyCols :+ col(rightTs).as("__ts") :+ lit(0).as("__side") :+
        lit(null).cast(leftType).as("__l") :+
        payload.as("__r"): _*)

    val w = Window.partitionBy(keyCols: _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = lTagged.union(rTagged)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1 && col("__m").isNotNull)

    val out = keyCols ++ Seq(col("__ts").as(leftTs)) ++
      leftCols.map(c => col(s"__l.$c").as(c)) ++
      Seq(col("__m.ts").as("matched_ts")) ++
      rightCols.map(c => col(s"__m.$c").as(s"matched_$c"))
    matched.select(out: _*)
  }
}
