package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Tolerance (interval) join: all pairs (l, r) with |l.ts − r.ts| ≤ tol.
  *
  * The reference has no temporal join at all (its event handling is
  * per-request Python; SURVEY.md §2.3 gap) — but any large event pipeline
  * needs one, and Spark has no native range join. A naive formulation is a
  * theta join (`abs(lTs − rTs) <= tol`), which Catalyst can only execute
  * as BroadcastNestedLoopJoin / cartesian — O(|L|·|R|) and a non-starter
  * at 100 TB.
  *
  * Spark-first shape used here: **bin-bucketed equi-join**. Time is split
  * into buckets of width `tol`; a qualifying pair is at most `tol` apart,
  * so the right row's bucket is within ±1 of the left row's. The left side
  * keeps its one bucket; the right side fans out to its bucket ± 1 (a 3×
  * explode of the *smaller* projected right columns, not of the pair
  * space); the join becomes a plain shuffled equi-join on the bucket id
  * followed by the exact |Δ| ≤ tol filter. Each qualifying pair meets in
  * exactly one bucket — the left row's — so no dedup pass is needed.
  *
  * Scale properties: one shuffle on the bucket key for each side; the
  * quadratic blow-up is confined to a single tolerance-width bucket
  * (bucket population is data-rate × tol, independent of corpus size);
  * bucket skew is AQE-splittable because the join is a standard
  * SortMergeJoin/ShuffledHashJoin. At rest, the bucket id is the natural
  * partition key for an event-log layout, turning candidate lookup into a
  * partition-pruned scan.
  */
object RangeJoin {

  /** Join `left` and `right` on |`lTs` − `rTs`| ≤ `tolMicros` (timestamps
    * compared at exact microsecond resolution). Column sets must be
    * disjoint; output is left.* ++ right.*.
    *
    * An optional extra `on` predicate (e.g. an equality on a second key)
    * is applied with the tolerance filter, after the bucket equi-join.
    */
  def byTolerance(
      left: DataFrame,
      right: DataFrame,
      lTs: String,
      rTs: String,
      tolMicros: Long,
      on: Column = lit(true)): DataFrame = {
    require(tolMicros > 0, s"tolerance must be positive, got $tolMicros")
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty,
      s"left/right column sets must be disjoint; shared: ${overlap.mkString(",")}")

    // Exact integer floor-division bucketing: (a − pmod(a, tol)) is
    // divisible by tol and the quotient is small, so the division is
    // IEEE-exact — no double-rounding bucket flips at tolerance
    // boundaries, and (unlike `div`'s truncation) correct for negative
    // (pre-epoch) timestamps too.
    def bin(ts: String): Column = {
      val us = unix_micros(col(ts))
      ((us - pmod(us, lit(tolMicros))) / tolMicros).cast("long")
    }
    val lb = left.withColumn("graft_bin", bin(lTs))
    // Right rows fan out to bucket −1, 0, +1: every left row whose bucket
    // is within one of the right row's own bucket sees it exactly once.
    val rb = right.withColumn("graft_bin",
      explode(array((-1 to 1).map(d => bin(rTs) + d): _*)))

    lb.join(rb, Seq("graft_bin"))
      .filter(
        abs(unix_micros(col(lTs)) - unix_micros(col(rTs))) <= tolMicros
          && on)
      .drop("graft_bin")
  }
}
