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
  * Determinism: centroids are the `k` lowest-vec_id vectors, selected via
  * orderBy(vec_id).limit(k) so a sparse or offset id space still yields
  * exactly k centroids (a seeded simplification of k-means — production
  * would run Lloyd iterations and persist the centroid table); assignment
  * distance is an exact integer — embeddings quantize to round(x·1e6)
  * BIGINTs and cells are argmin of the integer squared L2 distance with
  * centroid-id tie-break — so cell membership is identical across engines
  * and partitionings, and the whole index layout is DuckDB-reproducible.
  *
  * Scale shape: the k centroids are collected to the driver (k rows — the
  * moral equivalent of broadcasting the centroid table) and inlined as
  * literals, so cell ranking is a map-only scan with a per-row
  * array_sort over k (dist, cent_id) structs: NO shuffle, NO window, no
  * crossJoin row expansion. At rest the cell id becomes the partition key
  * of the stored index, so a probe is a partition-pruned scan.
  */
object IvfIndex {

  private def intDist(a: Column, qc: Array[Long]): Column =
    aggregate(zip_with(a, array(qc.map(lit(_)): _*), (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, d) => acc + d)

  /** The k lowest-vec_id vectors, quantized in-engine (the same
    * quantize1e6 expression the scan uses, so rounding is identical) and
    * collected — centroids are small by construction. */
  def centroids(emb: DataFrame, k: Int): Array[(Long, Array[Long])] =
    emb.orderBy("vec_id").limit(k)
      .select(col("vec_id").cast("long"),
        VectorFunctions.quantize1e6(col("embedding")))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))

  /** (vec_id, embedding, cent_id): each vector assigned to its nearest
    * centroid cell. Map-only (centroid literals, per-row argmin). */
  def assignments(emb: DataFrame, k: Int): DataFrame =
    cellRanks(emb, k)
      .filter(col("rk") === 1)
      .select("vec_id", "embedding", "cent_id")

  /** All (vector, centroid) distances ranked per vector — rank 1 is the
    * home cell; ranks ≤ nProbe are the probe set. Ranking is a per-row
    * array_sort over the k centroid literals + posexplode: no shuffle. */
  def cellRanks(emb: DataFrame, k: Int): DataFrame = {
    val cents = centroids(emb, k)
    require(cents.nonEmpty, s"IVF index needs >= 1 centroid, got 0 (k=$k)")
    val q = emb.select(col("vec_id"), col("embedding"),
      VectorFunctions.quantize1e6(col("embedding")).as("qe"))
    val cellStructs = array(cents.map { case (id, qc) =>
      struct(intDist(col("qe"), qc).as("dist"), lit(id).as("cent_id"))
    }: _*)
    q.withColumn("cells", array_sort(cellStructs))
      .select(col("vec_id"), col("embedding"), posexplode(col("cells")))
      .select(col("vec_id"), col("embedding"),
        col("col.cent_id").as("cent_id"), col("col.dist").as("dist"),
        (col("pos") + 1).cast("int").as("rk"))
  }

  /** Top-`topK` in-probe neighbours (by cosine) for each query vector.
    * The probe set (queries × nProbe cells) is broadcast, so candidate
    * generation is one map-side scan of the assigned index. */
  def search(emb: DataFrame, queryFilter: Column, k: Int, nProbe: Int,
      topK: Int): DataFrame = {
    val ranks = cellRanks(emb, k)
    val assigned = ranks.filter(col("rk") === 1)
      .select("vec_id", "embedding", "cent_id")
    val probes = ranks.filter(queryFilter && col("rk") <= nProbe)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("cent_id"))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("vec_id"))
    assigned.join(broadcast(probes), Seq("cent_id"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(VectorFunctions.cosine(col("embedding"), col("q_emb")), 6)
          .as("sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select("q_id", "rank", "vec_id", "sim")
  }
}
