package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** IVF-style (inverted-file) approximate nearest-neighbour index: vectors
  * partition into cells around centroids; a query probes only its nearest
  * `nProbe` cells, confining the exact scoring to a fraction of the index.
  * Complements the SRP-LSH path ([[graft.functions.VectorFunctions]]):
  * IVF adapts to the data distribution where SRP's planes are oblivious.
  *
  * Determinism: centroids are the `k` lowest-id vectors (a seeded
  * simplification of k-means — production would run Lloyd iterations and
  * persist the centroid table); assignment distance is an exact integer —
  * embeddings quantize to round(x·1e6) BIGINTs and cells are argmin of the
  * integer squared L2 distance with centroid-id tie-break — so cell
  * membership is identical across engines and partitionings, and the
  * whole index layout is DuckDB-reproducible.
  *
  * Scale shape: centroids broadcast (k rows); assignment is a map-only
  * scan + per-row argmin; at rest the cell id becomes the partition key of
  * the stored index, so a probe is a partition-pruned scan.
  */
object IvfIndex {

  private def intDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, d) => acc + d)

  /** (vec_id, embedding, cent_id): each vector assigned to its nearest
    * centroid cell. */
  def assignments(emb: DataFrame, k: Int): DataFrame =
    cellRanks(emb, k)
      .filter(col("rk") === 1)
      .select("vec_id", "embedding", "cent_id")

  /** All (vector, centroid) distances ranked per vector — rank 1 is the
    * home cell; ranks ≤ nProbe are the probe set. */
  def cellRanks(emb: DataFrame, k: Int): DataFrame = {
    val q = emb.select(col("vec_id"), col("embedding"),
      VectorFunctions.quantize1e6(col("embedding")).as("qe"))
    val cents = q.filter(col("vec_id") < k)
      .select(col("vec_id").as("cent_id"), col("qe").as("qc"))
    val w = Window.partitionBy("vec_id").orderBy("dist", "cent_id")
    q.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("embedding"), col("cent_id"),
        intDist(col("qe"), col("qc")).as("dist"))
      .withColumn("rk", row_number().over(w))
  }

  /** Top-`topK` in-probe neighbours (by cosine) for each query vector. */
  def search(emb: DataFrame, queryFilter: Column, k: Int, nProbe: Int,
      topK: Int): DataFrame = {
    val assigned = assignments(emb, k)
    val probes = cellRanks(emb, k)
      .filter(queryFilter && col("rk") <= nProbe)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("cent_id"))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("vec_id"))
    probes.join(assigned, Seq("cent_id"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(VectorFunctions.cosine(col("embedding"), col("q_emb")), 6)
          .as("sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select("q_id", "rank", "vec_id", "sim")
  }
}
