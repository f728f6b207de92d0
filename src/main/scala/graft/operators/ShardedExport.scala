package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.CrossHash

/** Deterministic sharded training-data export — the output side of a
  * pretraining pipeline: the curated corpus leaves the engine as a FIXED
  * number of shards, globally shuffled, so downstream data loaders can
  * stripe workers across files without coordinating with the producer.
  *
  * Both decisions are pure functions of the document key (no RNG state,
  * no wall-clock): shard = hash(key) mod nShards, within-shard order =
  * (hash, key). Re-running the export over the same corpus reproduces
  * byte-identical shard membership and order — resumable pipelines and
  * engine comparisons depend on exactly this property (it is the batch
  * analog of t28's seeded split assignment, applied to file layout).
  *
  * Scale shape: assignment is map-only; the write is ONE exchange
  * (repartition by shard) + a per-partition sort, then a partitioned
  * parquet write — one directory per shard, each written by exactly one
  * task, so shard count (not corpus size) bounds the file count. The
  * hash prefix in the sort key delivers the global shuffle a training
  * run wants WITHOUT a total-order sort: no range partitioning, no
  * sampling pass, no skew — every shard is a uniform random 1/nShards
  * of the corpus.
  */
object ShardedExport {

  /** Append the deterministic `shard` column: pmod(md5-hash, nShards)
    * of the (salted) string form of `keyCol` — the same hash family and
    * salt discipline as every other keyed decision in the engine, so
    * the DuckDB oracle replays assignment exactly. */
  def assignShards(df: DataFrame, nShards: Int,
      keyCol: String = "doc_id"): DataFrame = {
    require(nShards > 0, s"nShards must be positive: $nShards")
    df.withColumn("shard",
      pmod(CrossHash.hash60(
          concat(lit("shard#"), col(keyCol).cast("string"))),
        lit(nShards.toLong)).cast("int"))
  }

  /** Write `df` as `nShards` deterministic shards under `path`
    * (directory per shard, one task per shard, rows in seeded-shuffle
    * order). Returns the shard column name for composition. */
  def write(df: DataFrame, nShards: Int, path: String,
      keyCol: String = "doc_id"): Unit = {
    val sh = assignShards(df, nShards, keyCol)
      .withColumn("shuffle_key",
        CrossHash.hash60(
          concat(lit("order#"), col(keyCol).cast("string"))))
    // the sort LEADS with shard: FileFormatWriter requires partition
    // columns first in the ordering and would otherwise insert its own
    // (non-stable) sort on shard alone, destroying the shuffle order
    sh.repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("shuffle_key"), col(keyCol))
      .drop("shuffle_key")
      .write.mode("overwrite").partitionBy("shard").parquet(path)
  }
}
