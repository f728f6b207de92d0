package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Single-source shortest paths over a WEIGHTED directed edge list as
  * bounded Bellman–Ford supersteps — [[BfsHops]]' relaxation generalized
  * from hop counts to additive edge weights (the `min(fd) + 1` rollup
  * becomes `min(fd + w)`).
  *
  * Same scale shape per superstep as BfsHops: one equi-join of the edge
  * list against the current frontier on src + one min-rollup on dst +
  * one left join back onto the one-row-per-node distance table — two
  * exchanges over edge-scale data, no driver collect; the distance table
  * localCheckpoints per round so iterative lineage never replays prior
  * rounds. Negative weights are rejected AT FIRST USE, inside the
  * relaxation expression itself — the guard costs one comparison per
  * relaxed edge instead of a dedicated full-edge-list pre-scan job per
  * call, and it is exactly as strong: an edge no relaxation ever reads
  * cannot influence any distance, while every edge that COULD (including
  * every edge of a reachable negative cycle, which would diverge forever
  * under early exit) fires the guard the round it is first joined.
  *
  * Distances are longs with an additive-overflow-safe [[Inf]] sentinel;
  * `maxRounds` bounds the run (n−1 rounds reach the true fixpoint on
  * any non-negative graph; a fixed small count gives the k-round
  * relaxation an unrolled SQL oracle can replay exactly).
  */
object WeightedSssp {

  /** Unreachable sentinel — far above any real path cost, far below
    * Long overflow for `dist + w` on sane weights. */
  val Inf = 1000000000000L

  /** Run at most `maxRounds` relaxation rounds from `dist0` (one row
    * per node: `(v, dist)`, 0 at sources, [[Inf]] elsewhere) over
    * directed edges `(src, dst, w)` with non-negative long weights.
    * With `earlyExit`, stops after the first round that improves no
    * node. Returns (final distance table, rounds actually run). */
  private val NegMsg =
    "WeightedSssp: negative edge weights are not supported (a " +
      "negative cycle would make the early-exit fixpoint diverge)"

  /** Is `e` (anywhere in its cause chain) the relaxation guard's
    * raise_error? Matched two ways so presentation changes cannot hide
    * the contract violation: by the USER_RAISED_EXCEPTION error
    * condition + its message parameters (survives a truncated or
    * re-templated rendered message) AND by rendered-message substring
    * (survives a wrapper that flattened the SparkThrowable away). The
    * walk covers the FULL cause chain with a cycle guard — a deep
    * executor-side wrap must not let the raw SparkException escape. */
  private def isNegWeightGuard(e: Throwable): Boolean = {
    val seen = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[Throwable, java.lang.Boolean]())
    var t: Throwable = e
    while (t != null && seen.add(t)) {
      val byMessage =
        Option(t.getMessage).exists(_.contains("negative edge weights"))
      val byCondition = t match {
        case st: org.apache.spark.SparkThrowable =>
          Option(st.getCondition).contains("USER_RAISED_EXCEPTION") && {
            import scala.jdk.CollectionConverters._
            Option(st.getMessageParameters).exists(_.asScala.values
              .exists(v => v != null && v.contains("negative edge weights")))
          }
        case _ => false
      }
      if (byMessage || byCondition) return true
      t = t.getCause
    }
    false
  }

  def run(edges: DataFrame, dist0: DataFrame, maxRounds: Int,
      earlyExit: Boolean = false): (DataFrame, Int) = {
    require(maxRounds >= 1, s"maxRounds must be >= 1, got $maxRounds")
    // the weight guard, evaluated per RELAXED edge inside the rollup —
    // no separate full-edge-list validation job (raise_error keeps the
    // superstep's codegen; the catch below re-surfaces it by name)
    val checkedW = when(col("w").cast("long") >= 0, col("w").cast("long"))
      .otherwise(raise_error(lit(NegMsg)))
    // lazy fixed-round chain when nothing acts per round — see
    // [[BfsHops.run]]'s rationale; the probe-driven form keeps the
    // per-round checkpoints
    val lazyChain = !earlyExit && maxRounds <= 8
    val d0 = dist0.select(col("v"), col("dist").cast("long").as("dist"))
    var dist = if (lazyChain) d0 else d0.localCheckpoint(eager = true)
    var rounds = 0
    var done = false
    while (rounds < maxRounds && !done) {
      val frontier = dist.filter(col("dist") < Inf)
        .select(col("v").as("fv"), col("dist").as("fd"))
      val nd = edges.join(frontier, col("src") === col("fv"))
        .groupBy("dst")
        .agg(min(col("fd") + checkedW).as("nd"))
      val next =
        try {
          val step = dist.join(nd, dist("v") === nd("dst"), "left")
            .select(col("v"),
              least(col("dist"), coalesce(col("nd"), lit(Inf)))
                .as("dist"))
          if (lazyChain) step else step.localCheckpoint(eager = true)
        } catch {
          // the raise_error surfaces as a SparkException chain; rethrow
          // as the operator's own named contract violation
          case e: Exception if isNegWeightGuard(e) =>
            throw new IllegalArgumentException(NegMsg, e)
        }
      if (earlyExit) {
        // distances only ever decrease, so "no row improved" is exactly
        // the fixpoint; one bounded count over the node table
        val improved = next
          .join(dist.select(col("v"), col("dist").as("d_prev")), "v")
          .filter(col("dist") < col("d_prev")).count()
        done = improved == 0L
      }
      dist = next
      rounds += 1
    }
    // the lazy chain ran no action inside the loop — ONE guarded
    // materialization here keeps the operator's named-error contract
    // (the weight guard must surface from run(), not from whatever
    // terminal action a caller happens to run later) while still
    // skipping the other maxRounds−1 round materializations
    val out =
      if (!lazyChain) dist
      else
        try dist.localCheckpoint(eager = true)
        catch {
          case e: Exception if isNegWeightGuard(e) =>
            throw new IllegalArgumentException(NegMsg, e)
        }
    (out, rounds)
  }
}
