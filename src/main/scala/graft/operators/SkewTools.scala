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
    val sess = df.sparkSession
    val target = sess.sparkContext.defaultParallelism
    // A frame sitting above a shuffle boundary (aggregate / window /
    // global sort / distinct) already runs at spark.sql.shuffle.partitions
    // — when that is >= the target the repartition below would be a
    // no-op, so answer structurally instead of paying the df.rdd probe's
    // full physical planning for exactly the plans where it is priciest.
    // (Explicit Repartition nodes are NOT treated as wide: a caller's
    // narrower repartition must keep being widened, as before.)
    import org.apache.spark.sql.catalyst.plans.logical._
    val shufflePartitions = sess.sessionState.conf.numShufflePartitions
    val widePlan = df.queryExecution.analyzed.collectFirst {
      case p @ (_: Aggregate | _: Window | _: Sort | _: Distinct |
          _: Deduplicate) => p
    }.isDefined
    if (widePlan && shufflePartitions >= target) df
    else if (df.rdd.getNumPartitions < target) df.repartition(target)
    else df
  }

  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      saltSource: String, salts: Int): DataFrame = {
    require(salts > 0)
    // __salt is reserved: withColumn would silently REPLACE a caller's
    // column of that name and the trailing drop would lose it from the
    // output (the cellRanksWith clash-guard pattern)
    require(!fact.columns.contains("__salt") &&
        !dim.columns.contains("__salt"),
      "saltedJoin: inputs must not contain a __salt column")
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(col(saltSource)), lit(salts.toLong)))
    val explodedDim = dim.withColumn("__salt",
      explode(array((0 until salts).map(s => lit(s.toLong)): _*)))
    saltedFact.join(explodedDim, Seq(key, "__salt")).drop("__salt")
  }

  /** Tiled within-block SELF-join — the skew case [[saltedJoin]] cannot
    * fix: all-pairs inside a blocking key (the entity-resolution /
    * candidate-generation shape), where both join sides are the same
    * table, so exploding a "dim" side is meaningless and one hot block
    * makes a single task own C(n,2) comparisons.
    *
    * Every row gets a deterministic tile t = hash(`idCol`) mod `tiles`;
    * an unordered pair lands in EXACTLY one tile-pair group (ti ≤ tj) —
    * the left member fans out to groups (t, t..tiles-1), the right to
    * (0..t, t), diagonal groups keep only id_a < id_b — and the join
    * key becomes (block, ti, tj). A hot block's quadratic pair space
    * thus spreads over tiles·(tiles+1)/2 tasks instead of one, for a
    * LINEAR replication cost of ~(tiles+1)× per row — the standard
    * triangle-partitioning of an all-pairs job.
    *
    * Returns one row per unordered within-block pair, every `df` column
    * twice as `<col>_a` / `<col>_b`. Off-diagonal pairs order by tile,
    * not id — normalize with least/greatest where id order matters
    * (symmetric comparators like levenshtein don't care). */
  def tiledSelfJoin(df: DataFrame, blockKey: String, idCol: String,
      tiles: Int): DataFrame = {
    require(tiles > 0)
    val packed = df.select(col(blockKey).as("__blk"),
      pmod(xxhash64(col(idCol)), lit(tiles.toLong)).as("__t"),
      struct(df.columns.map(col): _*).as("__row"))
    val left = packed.select(col("__blk"), col("__t").as("__ti"),
        col("__row").as("__a"))
      .withColumn("__tj",
        explode(sequence(col("__ti"), lit(tiles.toLong - 1))))
    val right = packed.select(col("__blk"), col("__t").as("__tj"),
        col("__row").as("__b"))
      .withColumn("__ti", explode(sequence(lit(0L), col("__tj"))))
    left.join(right, Seq("__blk", "__ti", "__tj"))
      .filter(col("__ti") =!= col("__tj") ||
        col(s"__a.$idCol") < col(s"__b.$idCol"))
      .select(df.columns.map(c => col(s"__a.$c").as(s"${c}_a")) ++
        df.columns.map(c => col(s"__b.$c").as(s"${c}_b")): _*)
  }
}
