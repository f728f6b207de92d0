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
