package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.CrossHash

/** Count-min sketch over a key column — approximate frequencies in FIXED
  * memory (depth × width counters) regardless of key cardinality.
  *
  * Complements [[HeavyHitters]]: Misra–Gries answers "which keys are
  * frequent" exactly in two passes; count-min answers "how frequent is
  * ANY key" in one pass with a one-sided error (estimate ≥ true count,
  * overshoot ≤ εN with width = ⌈e/ε⌉) — the point-frequency oracle a
  * streaming pipeline keeps per window.
  *
  * Why it scales: the sketch IS an aggregation — each counter is a SUM,
  * so partial aggregation combines map-side, sketches of two partitions
  * (or two streams, or two days) merge by cell-wise addition, and the
  * whole table is depth·width longs (4×256 here = 8 KB) — broadcastable
  * to wherever estimates are needed. The hash family is the engine's
  * seeded md5 ([[CrossHash.hash60]]), so DuckDB reproduces every counter
  * and every estimate bit-for-bit: the sketch is oracle-CHECKED, not
  * just bounded.
  */
object CountMin {

  /** Counter table (row, bucket, c): one row per non-empty cell. */
  def sketch(df: DataFrame, key: Column, depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 2, s"bad sketch geometry $depth x $width")
    val rows = explode(array((0 until depth).map(lit): _*)).as("row")
    df.select(key.cast("string").as("k"))
      .select(col("k"), rows)
      .select(col("row"),
        pmod(CrossHash.hash60(concat(lit("cm"), col("row"), lit("#"),
          col("k"))), lit(width.toLong)).as("bucket"))
      .groupBy("row", "bucket")
      .agg(count(lit(1)).as("c"))
  }

  /** Point estimates for `keys` (any frame with a string-castable
    * `keyCol`): min over the depth rows of the addressed counters —
    * the sketch table broadcasts, keys never shuffle. */
  def estimate(keys: DataFrame, keyCol: String, sk: DataFrame,
      depth: Int, width: Int): DataFrame = {
    val reserved = Seq("row", "bucket", "c", "__k")
    require(!keys.columns.exists(reserved.contains),
      s"estimate: key frame must not contain ${reserved.mkString("/")} " +
        s"columns, got ${keys.columns.mkString(", ")}")
    val rows = explode(array((0 until depth).map(lit): _*)).as("row")
    keys
      .withColumn("__k", col(keyCol).cast("string"))
      .select(col("*"), rows)
      .withColumn("bucket",
        pmod(CrossHash.hash60(concat(lit("cm"), col("row"), lit("#"),
          col("__k"))), lit(width.toLong)))
      .join(broadcast(sk), Seq("row", "bucket"), "left")
      .groupBy(keys.columns.map(col): _*)
      .agg(min(coalesce(col("c"), lit(0L))).as("est"))
      .drop("__k")
  }

  /** DuckDB fragment reproducing a cell address for oracle authors:
    * `bucket = duckBucket("<row literal>", "<key expr>", width)`. */
  def duckBucket(rowExpr: String, keyExpr: String, width: Int): String =
    s"${CrossHash.duckHash60(s"'cm' || $rowExpr || '#' || $keyExpr")} % $width"
}
