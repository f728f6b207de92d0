package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Semantic deduplication over the embedding space — the SemDeDup recipe
  * (public method: Abbas et al. 2023, "SemDeDup: Data-efficient learning
  * at web-scale through semantic deduplication"): cluster embeddings
  * around centroids, then compare pairs ONLY within a cluster; a vector is
  * a semantic duplicate when its cosine to a lower-id cluster member
  * clears the threshold, and the kept set is each duplicate group's
  * lowest-id representative.
  *
  * Relation to the rest of the dedup family: d05's SRP bands block on
  * oblivious random hyperplanes; SemDeDup blocks on data-adaptive cells
  * (the IVF clustering the ANN tier already maintains — [[IvfIndex]]
  * assignment is reused verbatim, so an existing IVF index doubles as the
  * dedup clustering for free).
  *
  * Scale shape: cell assignment is a map-only scan against centroid
  * literals (no shuffle — [[IvfIndex.cellRanksWith]]); the pairwise stage
  * is an equi-join on cent_id, so the quadratic work is confined to a
  * cell, exactly the bound SemDeDup's clustering exists to provide. Cell
  * populations are balanced by TRAINING the centroids at corpus scale
  * ([[IvfIndex.trainCentroids]] — the same argument as the ANN probe
  * path); the id-inequality keeps each pair once. The flagged-id set is
  * (duplicates only)-sized and joins back to the assignment by vec_id.
  */
object SemanticDedup {

  /** (vec_id, cent_id, is_semantic_dup, keep) for every embedding row,
    * with k seeded centroids. Cosine rounds to 6 dp before the threshold
    * compare so the verdict is reproducible across engines. */
  def dedup(emb: DataFrame, k: Int, tau: Double): DataFrame =
    dedupWith(emb, IvfIndex.centroids(emb, k), tau)

  /** [[dedup]] against an explicit (e.g. trained or persisted) centroid
    * set. */
  def dedupWith(emb: DataFrame, cents: Array[(Long, Array[Long])],
      tau: Double): DataFrame = {
    val assigned = IvfIndex.cellAssign(emb, cents)
      .select("vec_id", "cent_id", "embedding")
    val slim = assigned.select("vec_id", "cent_id", "embedding")
    val dupIds = slim.as("a").join(slim.as("b"), Seq("cent_id"))
      .filter(col("a.vec_id") < col("b.vec_id"))
      .filter(
        round(VectorFunctions.cosine(col("a.embedding"), col("b.embedding")),
          6) >= tau)
      .select(col("b.vec_id").as("vec_id"))
      .distinct()
    assigned.select("vec_id", "cent_id")
      .join(dupIds.withColumn("flag", lit(true)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cent_id"),
        coalesce(col("flag"), lit(false)).as("is_semantic_dup"))
      .withColumn("keep", !col("is_semantic_dup"))
  }
}
