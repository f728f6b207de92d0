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

  /** (node, r) with r = 1e6-scaled rank after `iters` damped iterations
    * over the DEDUPLICATED directed edge list (src, dst). */
  def ranks(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    // hash-partition the edge list by src ONCE and checkpoint:
    // localCheckpoint preserves the partitioning, so every iteration's
    // rank⋈edges join reuses it and only the (one row per node) rank
    // table shuffles — the edge list, the corpus-scale side, never moves
    // again; the degree aggregation rides the same partitioning for free
    val e = edges.select("src", "dst").repartition(col("src"))
      .localCheckpoint(eager = false)
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
      .localCheckpoint(eager = false)
    // fold out-degree into the edge list ONCE (a zipped join — both
    // sides already src-partitioned, no exchange) instead of re-joining
    // deg inside every iteration: each iteration is then exactly two
    // exchanges — the one-row-per-node rank table to src-partitioning,
    // and the partial-agg combine on dst
    val ew = e.join(deg, "src").localCheckpoint(eager = false)
    var r = deg.select(col("src").as("node"), lit(1000000L).as("r"))
    for (_ <- 1 to iters) {
      r = ew.join(r, ew("src") === r("node"))
        .select(col("dst"), expr("r div deg").as("c"))
        .groupBy("dst")
        .agg(sum(col("c")).as("sc"))
        .select(col("dst").as("node"),
          (lit(150000L) + expr("(85 * sc) div 100")).as("r"))
    }
    r
  }
}
