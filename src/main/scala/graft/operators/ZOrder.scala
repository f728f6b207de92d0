package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout: multi-column data skipping at rest.
  *
  * A sorted layout prunes scans on its leading column only; a 100 TB fact
  * table queried by more than one dimension needs file/row-group min-max
  * ranges that are tight on EVERY clustering column. Interleaving the bits
  * of the clustering keys gives a single sort key whose contiguous ranges
  * are small hyper-rectangles in key space, so each output file's min/max
  * envelope is narrow on all dimensions at once and a predicate on any of
  * them skips most files (the technique behind Delta/Iceberg OPTIMIZE
  * ZORDER; no counterpart in the reference, which has no storage layout
  * control at all).
  *
  * Everything is declarative: normalization stats are a 1-row broadcast
  * join (never collected to the driver), the z-value is a pure
  * codegen-friendly bit expression, and the write is
  * `repartitionByRange(zv) + sortWithinPartitions(zv)` — one range
  * shuffle, the same cost as a plain sorted write.
  */
object ZOrder {

  /** Interleave the low `bits` bits of each (pre-bucketed, non-negative)
    * column: column j contributes its bit i at output position
    * i·ncols + j. With `bits`·ncols ≤ 63 the result fits a BIGINT. */
  def zValue(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty && bits > 0 && bits * cols.size <= 63,
      s"need 0 < bits*ncols <= 63, got bits=$bits ncols=${cols.size}")
    val n = cols.size
    cols.zipWithIndex.map { case (c, j) =>
      (0 until bits).map { i =>
        shiftleft(shiftright(c.cast("long"), i).bitwiseAND(lit(1L)),
          i * n + j)
      }.reduce(_.bitwiseOR(_))
    }.reduce(_.bitwiseOR(_))
  }

  /** Min-max normalize `c` into [0, 2^bits) given its global min/max.
    * (Rank/quantile bucketing would resist skew better; at corpus scale
    * you would feed sampled approx-percentile cut points instead.)
    * Deterministic cross-engine: integer inputs, one double divide and
    * multiply, floor — DuckDB reproduces it bit-for-bit (q40 oracle). */
  def bucket(c: Column, lo: Column, hi: Column, bits: Int): Column = {
    val buckets = 1 << bits
    // lo/hi cast too: for numeric stats the cast is a no-op, for
    // TIMESTAMP stats it is what makes the arithmetic resolve at all
    // (double - timestamp is a type error — optimize(zorderBy=ts)
    // admits timestamps by contract, so bucket must as well)
    val (cd, lod, hid) = (c.cast("double"), lo.cast("double"),
      hi.cast("double"))
    least(lit(buckets - 1), greatest(lit(0),
      floor((cd - lod) / (hid - lod + lit(1e-9)) * buckets)))
  }

  /** Write `df` to `path` z-ordered on `zCols` across `nFiles` range
    * partitions. Normalization stats travel as a 1-row broadcast join. */
  def writeZOrdered(df: DataFrame, zCols: Seq[String], path: String,
      nFiles: Int, bits: Int = 8): Unit = {
    val stats = df.agg(
      zCols.flatMap(c => Seq(min(col(c)).as(s"graft_lo_$c"),
        max(col(c)).as(s"graft_hi_$c"))).head,
      zCols.flatMap(c => Seq(min(col(c)).as(s"graft_lo_$c"),
        max(col(c)).as(s"graft_hi_$c"))).tail: _*)
    val bucketed = zCols.map(c =>
      bucket(col(c), col(s"graft_lo_$c"), col(s"graft_hi_$c"), bits))
    df.crossJoin(broadcast(stats))
      .withColumn("graft_zv", zValue(bucketed, bits))
      .repartitionByRange(nFiles, col("graft_zv"))
      .sortWithinPartitions("graft_zv")
      .drop((zCols.flatMap(c => Seq(s"graft_lo_$c", s"graft_hi_$c"))
        :+ "graft_zv"): _*)
      .write.mode("overwrite").parquet(path)
  }

  /** Per-file [min,max] envelopes of `statCol` for a written layout — the
    * skipping index a scan planner consults. */
  def fileEnvelopes(df: DataFrame, statCol: String): DataFrame =
    df.groupBy(input_file_name().as("file"))
      .agg(min(col(statCol)).as("lo"), max(col(statCol)).as("hi"))

  /** How many files of the layout a [lo, hi] predicate on `statCol` must
    * read (envelope overlap count) vs the total file count. */
  def overlapCount(df: DataFrame, statCol: String, lo: Long, hi: Long)
      : (Long, Long) = {
    val env = fileEnvelopes(df, statCol).cache()
    try {
      val total = env.count()
      val touched = env.filter(col("lo") <= hi && col("hi") >= lo).count()
      (touched, total)
    } finally env.unpersist()
  }
}
