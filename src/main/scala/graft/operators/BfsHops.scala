package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frontier BFS over a directed edge list as bounded Pregel supersteps —
  * the q75 hop-distance loop promoted to an operator with an optional
  * fixpoint exit (round-6 verdict item 3: production shortest-hops wants
  * convergence-driven termination, not a hardcoded round count).
  *
  * Distances use an integer INFINITY sentinel ([[Inf]]) instead of
  * nulls: `least`/`min` then compose without null-propagation special
  * cases, and a SQL oracle replays the arithmetic exactly.
  *
  * Scale shape per superstep: one equi-join of the edge list against the
  * current frontier (dist < Inf) on src + one min-rollup on dst + one
  * left join back onto the (one row per node) distance table — two
  * exchanges over edge-scale data, no driver collect; the distance table
  * localCheckpoints per round so iterative lineage never replays prior
  * rounds. The early-exit probe costs one additional bounded count over
  * the node-scale table per round and stops after the first superstep
  * that improves no node — ≤ diameter+1 rounds total, capped by
  * `maxRounds` as the runaway bound.
  */
object BfsHops {

  /** Unreachable sentinel — larger than any real hop count, small enough
    * that `dist + 1` can never overflow an int. */
  val Inf = 1000000

  /** Run at most `maxRounds` supersteps from `dist0` (one row per node:
    * `(v, dist)`, 0 at sources, [[Inf]] elsewhere) over directed edges
    * `(src, dst)`. With `earlyExit`, stops after the first round that
    * improves no node — the fixpoint, reached by round diameter+1.
    * Returns (final distance table, rounds actually run). */
  def run(edges: DataFrame, dist0: DataFrame, maxRounds: Int,
      earlyExit: Boolean = false): (DataFrame, Int) = {
    require(maxRounds >= 1, s"maxRounds must be >= 1, got $maxRounds")
    // Per-round checkpoints exist for ITERATIVE-LINEAGE replay — which
    // only happens when something acts per round (the earlyExit probe).
    // A bounded fixed-round run with one terminal action evaluates each
    // round exactly once either way, so the lazy chain skips maxRounds
    // materializations (the PageRank.ranks discipline); past a small
    // bound the checkpoints return as a plan-depth fence.
    val lazyChain = !earlyExit && maxRounds <= 8
    var dist = if (lazyChain) dist0 else dist0.localCheckpoint(eager = true)
    var rounds = 0
    var done = false
    while (rounds < maxRounds && !done) {
      val frontier = dist.filter(col("dist") < Inf)
        .select(col("v").as("fv"), col("dist").as("fd"))
      val nd = edges.join(frontier, col("src") === col("fv"))
        .groupBy("dst").agg((min("fd") + 1).as("nd"))
      val step = dist.join(nd, dist("v") === nd("dst"), "left")
        .select(col("v"),
          least(col("dist"), coalesce(col("nd"), lit(Inf)))
            .as("dist"))
      val next =
        if (lazyChain) step else step.localCheckpoint(eager = true)
      if (earlyExit) {
        // distances only ever DECREASE, so "no row improved" is exactly
        // the fixpoint; one bounded count over the node table
        val improved = next
          .join(dist.select(col("v"), col("dist").as("d_prev")), "v")
          .filter(col("dist") < col("d_prev")).count()
        done = improved == 0L
      }
      dist = next
      rounds += 1
    }
    (dist, rounds)
  }
}
