package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Damped PageRank by power iteration, in EXACT integer arithmetic — the
  * iterative graph-analytics family beyond [[DupClusters]]' label
  * propagation (public algorithm: Page et al. 1999; damping 0.85).
  *
  * Why integer: float PageRank sums per-neighbor contributions in
  * whatever order partial aggregation delivers them — bit-drift across
  * partitionings, AQE re-plans, and engines. Here ranks are 1e6-scaled
  * BIGINTs, a node's per-neighbor contribution is `r div deg` (integer
  * division) and damping is `(85 · Σ) div 100`, so every iteration is a
  * sum of integers: order-independent, partial-agg combinable, and
  * bit-identical in DuckDB's unrolled-CTE replay.
  *
  * Scale shape per iteration: one shuffle join of the rank table to the
  * edge list on src + one partial-agg shuffle on dst — the canonical
  * Pregel superstep as two exchanges, no driver collect, state = one row
  * per node. Edges and degrees localCheckpoint once so iterations don't
  * replay the upstream edge generation. Nodes with no in-edges fall out
  * of the rank table after one iteration (rank floor 0.15 applies to
  * linked nodes); callers over undirected graphs are unaffected since
  * symmetric edges give every node an in-link.
  */
object PageRank {

  /** Degree-folded, src-partitioned edge list + initial uniform ranks —
    * the shared per-run setup of both entry points below.
    *
    * hash-partition the edge list by src ONCE and checkpoint:
    * localCheckpoint preserves the partitioning, so every iteration's
    * rank⋈edges join reuses it and only the (one row per node) rank
    * table shuffles — the edge list, the corpus-scale side, never moves
    * again; the degree aggregation rides the same partitioning for free.
    * Out-degree is folded into the edge list ONCE (a zipped join — both
    * sides already src-partitioned, no exchange) instead of re-joining
    * deg inside every iteration: each iteration is then exactly two
    * exchanges — the one-row-per-node rank table to src-partitioning,
    * and the partial-agg combine on dst. */
  private def prep(edges: DataFrame): (DataFrame, DataFrame) = {
    val e = edges.select("src", "dst").repartition(col("src"))
      .localCheckpoint(eager = false)
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
      .localCheckpoint(eager = false)
    val ew = e.join(deg, "src").localCheckpoint(eager = false)
    (ew, deg.select(col("src").as("node"), lit(1000000L).as("r")))
  }

  /** One damped power-iteration superstep: rank⋈edges on src, integer
    * per-neighbour contribution, partial-agg combine on dst. */
  private def step(ew: DataFrame, r: DataFrame): DataFrame =
    ew.join(r, ew("src") === r("node"))
      .select(col("dst"), expr("r div deg").as("c"))
      .groupBy("dst")
      .agg(sum(col("c")).as("sc"))
      .select(col("dst").as("node"),
        (lit(150000L) + expr("(85 * sc) div 100")).as("r"))

  /** (node, r) with r = 1e6-scaled rank after `iters` damped iterations
    * over the DEDUPLICATED directed edge list (src, dst). */
  def ranks(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val (ew, r0) = prep(edges)
    var r = r0
    for (_ <- 1 to iters) r = step(ew, r)
    r
  }

  /** Convergence-driven variant: iterate until no node's rank moved by
    * more than `tolMicros` (1e6-scaled units) in a round, bounded by
    * `maxIters`. Returns (ranks, roundsRun); roundsRun == maxIters with
    * the tolerance never met means the bound cut the run short — integer
    * PageRank can settle into a small period-2 oscillation instead of an
    * exact fixpoint, which is what a tolerance of a few micros absorbs.
    *
    * The probe is one bounded one-row max-|Δ| aggregate per round over
    * the node table (never the edges), and each iterate materializes via
    * localCheckpoint so the probe and the next round share the work —
    * the [[DupClusters]] monotone-probe pattern. Fixed-`iters` callers
    * ([[ranks]], the q57 oracle) keep the probe-free lazy chain. */
  def ranksConverged(edges: DataFrame, maxIters: Int,
      tolMicros: Long = 0L): (DataFrame, Int) = {
    require(maxIters >= 1, s"maxIters must be >= 1, got $maxIters")
    require(tolMicros >= 0L, s"tolMicros must be >= 0, got $tolMicros")
    val (ew, r0) = prep(edges)
    var r = r0.localCheckpoint(eager = true)
    var rounds = 0
    var done = false
    while (rounds < maxIters && !done) {
      val next = step(ew, r).localCheckpoint(eager = true)
      // max |Δr| over the (one row per node) rank tables; inner join —
      // dangling nodes fall out of the table after round 1 and the node
      // set is stable from then on. Empty graph ⇒ null max ⇒ 0 ⇒ done.
      val moved = next
        .join(r.select(col("node"), col("r").as("r_prev")), "node")
        .agg(coalesce(max(abs(col("r") - col("r_prev"))), lit(0L)))
        .collect()(0).getLong(0)
      r = next
      rounds += 1
      done = moved <= tolMicros
    }
    (r, rounds)
  }
}
