package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for heavy-hitter join keys.
  *
  * First line of defence is AQE's runtime skew-join splitting
  * (spark.sql.adaptive.skewJoin.*, on by default) — prefer it. This manual
  * salted join is for the cases AQE can't fix: a single key so hot that one
  * task would still own it (the classic null-key / power-law fact table at
  * 100 TB).
  *
  * Recipe: the fact side gets a deterministic salt in [0, salts) derived
  * by hashing a caller-chosen (ideally distinct-per-row) column; the dim
  * side is exploded ×salts so every (key, salt) pair exists; the join key
  * becomes (key, salt), spreading one hot key over `salts` tasks. Salting
  * is deterministic (no rand()) so retried tasks produce identical output.
  */
object SkewTools {

  /** Round-robin fan-out for CPU-heavy map stages over NARROW inputs.
    *
    * A scan's parallelism is bounded by its split count: one small file
    * (or one gzip member, or a single parquet row group) scans as ONE
    * partition, so an expensive per-row pipeline above it — shingling,
    * per-token md5, signature generation — runs on one core no matter
    * how many the executor has. Splitting configs can't help
    * (`files.maxPartitionBytes` cannot split below a row group);
    * repartition is the only way to widen.
    *
    * No-op whenever the input already has at least `defaultParallelism`
    * partitions — the 100 TB case, where scans arrive pre-split into
    * thousands of tasks and an extra corpus-wide shuffle would be pure
    * waste. The shuffle is paid only when it buys idle cores. Spark's
    * round-robin repartition locally sorts rows first, so retried tasks
    * repartition identically (deterministic under failure). */
  def fanOut(df: DataFrame): DataFrame = {
    // Streaming plans can't answer getNumPartitions (no RDD until each
    // micro-batch); their parallelism is the source's, so pass through.
    if (df.isStreaming) return df
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      saltSource: String, salts: Int): DataFrame = {
    require(salts > 0)
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(col(saltSource)), lit(salts.toLong)))
    val explodedDim = dim.withColumn("__salt",
      explode(array((0 until salts).map(s => lit(s.toLong)): _*)))
    saltedFact.join(explodedDim, Seq(key, "__salt")).drop("__salt")
  }
}
