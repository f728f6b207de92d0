package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Product-quantization (PQ) ANN: the compression tier past int8.
  *
  * The embedding is split into `m` subvectors; each subspace gets its own
  * `k`-centroid codebook and every corpus vector is stored as `m` small
  * codes (64 dims × 4 bytes → 8 bytes per vector at m=8/k=16 — 32×). A
  * query never touches corpus embeddings: it precomputes a lookup table of
  * exact integer distances to every (subspace, centroid), and the
  * approximate distance of a coded vector is the sum of `m` table lookups
  * — the asymmetric-distance PQ search of Jégou et al. (2011), expressed
  * relationally.
  *
  * Everything is integer-exact (quantize1e6 components, squared-distance
  * sums), so codes, lookup tables, and rankings are bit-identical across
  * engines and the whole path is oracle-checkable — the same property the
  * IVF and int8 tiers in this repo maintain. Codebooks are the subvectors
  * of the first `k` corpus vectors (the deterministic stand-in for k-means
  * that IvfIndex also uses).
  *
  * Scale shape: the corpus is never self-joined and never shuffled whole —
  * encode is explode → broadcast-codebook join → partial-agg argmin
  * (O(n·d·k) work, the standard PQ encode cost; at rest codes would be
  * written once and reused per query); search joins the tiny broadcast
  * lookup table against codes and partial-aggregates m rows per
  * (query, vector). A fused codegen expression for the per-subspace argmin
  * (the IvfCellDistsExpr pattern) is the next constant-factor step if
  * encode ever dominates.
  */
object PqIndex {

  /** Top-`topK` neighbours per query vector under PQ asymmetric distance.
    * `queryFilter` selects the query vectors (over embeddings columns);
    * output: (q_id, rank, vec_id, approx_dist) with exact integer
    * distances. */
  def search(emb: DataFrame, queryFilter: Column, dim: Int = 64,
      m: Int = 8, k: Int = 16, topK: Int = 3): DataFrame = {
    require(dim % m == 0, s"dim=$dim not divisible by m=$m subvectors")
    val subDim = dim / m

    // (vec_id, j=subspace, i=offset, v=quantized component)
    val sub = emb
      .select(col("vec_id"),
        posexplode(VectorFunctions.quantize1e6(col("embedding")))
          .as(Seq("pos", "v")))
      .select(col("vec_id"),
        (col("pos") / subDim).cast("int").as("j"),
        pmod(col("pos"), lit(subDim)).as("i"), col("v"))

    // codebook: subvectors of the first k corpus vectors, broadcast
    val cent = sub.filter(col("vec_id") < k)
      .select(col("vec_id").as("cent_id"), col("j"), col("i"),
        col("v").as("cv"))

    // exact integer squared distance of every vector's subvector j to
    // every centroid of subspace j (partial-agg'd map-side)
    val dists = sub.join(broadcast(cent), Seq("j", "i"))
      .groupBy(col("vec_id"), col("j"), col("cent_id"))
      .agg(sum((col("v") - col("cv")) * (col("v") - col("cv"))).as("dist"))

    // encode: per (vector, subspace) the nearest centroid id
    val wCode = Window.partitionBy("vec_id", "j")
      .orderBy(col("dist"), col("cent_id"))
    val codes = dists.withColumn("rk", row_number().over(wCode))
      .filter(col("rk") === 1)
      .select(col("vec_id"), col("j"), col("cent_id").as("code"))

    // query lookup table: the same dists, restricted to query vectors
    val qIds = emb.filter(queryFilter).select(col("vec_id").as("q_id"))
    val lut = dists
      .join(broadcast(qIds), col("vec_id") === col("q_id"))
      .select(col("q_id"), col("j"), col("cent_id"), col("dist"))

    // asymmetric distance = sum of m table lookups; top-k per query
    val wRank = Window.partitionBy("q_id")
      .orderBy(col("approx_dist"), col("vec_id"))
    codes.join(broadcast(lut),
        codes("j") === lut("j") && codes("code") === lut("cent_id")
          && codes("vec_id") =!= lut("q_id"))
      .groupBy(col("q_id"), col("vec_id"))
      .agg(sum(col("dist")).as("approx_dist"))
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= topK)
      .select(col("q_id"), col("rank"), col("vec_id"), col("approx_dist"))
  }
}
