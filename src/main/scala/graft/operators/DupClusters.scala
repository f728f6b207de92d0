package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over near-duplicate candidate PAIRS → duplicate
  * CLUSTERS: cluster_id = the minimum doc id reachable through any chain
  * of pair edges. Pairwise output (d02/d04/d07) says "these two are
  * near-dups"; a training pipeline needs the transitive closure — A≈B
  * and B≈C must land A, B, C in ONE cluster so exactly one survivor is
  * kept — which no single join can express.
  *
  * Algorithm: iterative min-label propagation. Every vertex starts
  * labelled with itself; each round every vertex takes the min of its own
  * and its neighbours' labels; fixpoint = components labelled by their
  * min member. Deterministic (min is order-free), converges in at most
  * `diameter(component)` rounds — dup clusters are short chains in
  * practice, so 3–5 rounds.
  *
  * Scale shape: each round is one equi-join of the edge list against the
  * current labels plus one min-aggregation — O(E) shuffle per round, no
  * driver-side graph, no collect. Labels are localCheckpoint-materialized
  * per round: iterative lineage would otherwise re-execute every prior
  * round at each action (and the convergence count IS an action). The
  * edge list materializes once and is reused by every round. At corpus
  * scale the round count can be halved again with the alternating
  * large-star/small-star formulation (Kiveris et al., "Connected
  * Components in MapReduce"); the per-round plan is identical, so this
  * implementation is the building block either way.
  */
object DupClusters {

  /** (id, cluster_id) for every vertex in `vertices` (one `id` column);
    * `pairs` needs (a_id, b_id). Vertices in no pair become singleton
    * clusters of themselves. */
  def assign(vertices: DataFrame, pairs: DataFrame,
      maxIters: Int = 20): DataFrame = {
    val edges = pairs
      .select(col("a_id").as("s"), col("b_id").as("d"))
      .union(pairs.select(col("b_id").as("s"), col("a_id").as("d")))
      .distinct()
      .localCheckpoint(true)
    var labels = vertices.select(col("id"), col("id").as("lab"))
      .localCheckpoint(true)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      val prop = edges
        .join(labels.select(col("id").as("s"), col("lab")), "s")
        .select(col("d").as("id"), col("lab"))
      val next = labels.unionByName(prop)
        .groupBy("id").agg(min("lab").as("lab"))
        .localCheckpoint(true)
      val changed = next
        .join(labels.select(col("id"), col("lab").as("prev")), "id")
        .filter(col("lab") =!= col("prev")).count()
      labels = next
      converged = changed == 0L
      iter += 1
    }
    require(converged,
      s"DupClusters.assign did not converge within $maxIters rounds — " +
        "component diameter exceeds the bound; raise maxIters")
    labels.select(col("id"), col("lab").as("cluster_id"))
  }
}
