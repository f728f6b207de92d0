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

  /** Exact integer squared distance of every vector's subvector `j` to
    * every codebook centroid of subspace `j` (partial-agg'd map-side):
    * (vec_id, j, cent_id, dist). Codes and query lookup tables are both
    * restrictions of this one relation. */
  def subspaceDists(emb: DataFrame, dim: Int, m: Int, k: Int): DataFrame = {
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
    sub.join(broadcast(cent), Seq("j", "i"))
      .groupBy(col("vec_id"), col("j"), col("cent_id"))
      .agg(sum((col("v") - col("cv")) * (col("v") - col("cv"))).as("dist"))
  }

  /** Encode: per (vector, subspace) the nearest centroid id —
    * (vec_id, j, code). The stored representation (m codes per vector). */
  def encode(dists: DataFrame): DataFrame = {
    val wCode = Window.partitionBy("vec_id", "j")
      .orderBy(col("dist"), col("cent_id"))
    dists.withColumn("rk", row_number().over(wCode))
      .filter(col("rk") === 1)
      .select(col("vec_id"), col("j"), col("cent_id").as("code"))
  }

  /** Query lookup table: subspace distances restricted to query vectors —
    * (q_id, j, cent_id, dist); tiny (queries × m × k rows). */
  def queryLut(emb: DataFrame, dists: DataFrame, queryFilter: Column)
      : DataFrame = {
    val qIds = emb.filter(queryFilter).select(col("vec_id").as("q_id"))
    dists.join(broadcast(qIds), col("vec_id") === col("q_id"))
      .select(col("q_id"), col("j"), col("cent_id"), col("dist"))
  }

  /** Asymmetric distance (sum of m LUT lookups) + top-k per query over a
    * coded candidate set. `cands` = (q_id, vec_id) pairs to score (pass
    * the full codes × queries cross for exhaustive PQ, or an IVF-pruned
    * pair set for the cascade). */
  def rankCoded(cands: DataFrame, codes: DataFrame, lut: DataFrame,
      topK: Int): DataFrame = {
    val wRank = Window.partitionBy("q_id")
      .orderBy(col("approx_dist"), col("vec_id"))
    val lutByCode = lut.select(col("q_id"), col("j"),
      col("cent_id").as("code"), col("dist"))
    cands.join(codes, "vec_id")
      .join(broadcast(lutByCode), Seq("q_id", "j", "code"))
      .groupBy(col("q_id"), col("vec_id"))
      .agg(sum(col("dist")).as("approx_dist"))
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= topK)
      .select(col("q_id"), col("rank"), col("vec_id"), col("approx_dist"))
  }

  /** Top-`topK` neighbours per query vector under PQ asymmetric distance,
    * exhaustively over the coded corpus. `queryFilter` selects the query
    * vectors (over embeddings columns); output: (q_id, rank, vec_id,
    * approx_dist) with exact integer distances. */
  def search(emb: DataFrame, queryFilter: Column, dim: Int = 64,
      m: Int = 8, k: Int = 16, topK: Int = 3): DataFrame = {
    val dists = subspaceDists(emb, dim, m, k)
    val codes = encode(dists)
    val lut = queryLut(emb, dists, queryFilter)
    val cands = codes.select(col("vec_id")).distinct()
      .crossJoin(broadcast(lut.select(col("q_id")).distinct()))
      .filter(col("vec_id") =!= col("q_id"))
    rankCoded(cands, codes, lut, topK)
  }

  /** IVF×PQ cascade: IVF cell probing prunes the candidate set (only
    * vectors in the query's `nProbe` nearest cells are considered), then
    * PQ asymmetric distance ranks the survivors — coarse quantizer for
    * pruning, fine quantizer for scoring, the composition a production
    * ANN index runs (IVFADC). Candidate generation is the IVF broadcast
    * probe join; scoring adds m broadcast-LUT lookups per candidate;
    * the corpus is never exhaustively scored. */
  def searchIvf(emb: DataFrame, queryFilter: Column, dim: Int = 64,
      m: Int = 8, k: Int = 16, nCells: Int = 16, nProbe: Int = 2,
      topK: Int = 3): DataFrame = {
    val assigned = IvfIndex.assignments(emb, nCells)
      .select(col("vec_id"), col("cent_id"))
    val probes = IvfIndex.cellRanks(emb, nCells)
      .filter(queryFilter && col("rk") <= nProbe)
      .select(col("vec_id").as("q_id"), col("cent_id"))
    val cands = assigned.join(broadcast(probes), Seq("cent_id"))
      .filter(col("vec_id") =!= col("q_id"))
      .select("q_id", "vec_id")
    val dists = subspaceDists(emb, dim, m, k)
    rankCoded(cands, encode(dists), queryLut(emb, dists, queryFilter), topK)
  }
}
