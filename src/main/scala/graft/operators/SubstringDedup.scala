package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Exact-substring (span-level) deduplication at token-block granularity —
  * the "train-data substring dedup" family (public method: Lee et al. 2021,
  * "Deduplicating Training Data Makes Language Models Better", which drops
  * repeated spans rather than whole near-duplicate documents; the
  * reference's own dedup is document-level only, ra/server.py:36-43).
  *
  * A suffix-array over 100 TB is not a Spark-shaped structure, but its
  * decision — "is this span repeated elsewhere in the corpus?" — maps onto
  * fixed token blocks: each document splits into non-overlapping
  * `blockTokens`-token blocks, and a block instance counts as duplicated
  * when its content hash occurs in at least `minDf` distinct documents.
  * Block (not sliding-window) granularity keeps the exploded row count at
  * n_tokens / blockTokens instead of n_tokens, and block boundaries are
  * deterministic so both engines see identical spans.
  *
  * Scale shape: explode blocks (map-only, codegen) → one partial-agg
  * shuffle on the block hash for document frequencies → one shuffle
  * equi-join back on the hash → one per-document rollup. No self-join, no
  * broadcast of anything corpus-sized; the hash shuffle carries
  * (doc_id, 32-byte md5), never text. At 100 TB raise blockTokens to trade
  * resolution for row count.
  */
object SubstringDedup {

  /** Per-document duplicated-span profile: block counts, cross-document
    * duplicated-block counts, duplicated fraction, and a mostly-duplicated
    * verdict (integer compare, so engines agree at the boundary).
    * Intra-document repeats do NOT count as duplication — `minDf` is a
    * distinct-document frequency. */
  def profile(docs: DataFrame, blockTokens: Int = 10,
      minDf: Int = 2): DataFrame = {
    // fused per-row block digests (graft.plans.BlockMd5Expr): same md5
    // per block, shuffled as 16 digest bytes instead of 32-char hex,
    // with no interpreted HOF block construction (spec-pinned parity)
    val flat = SkewTools.fanOut(docs)
      .select(col("doc_id"),
        explode(org.apache.spark.sql.graft.ColumnBridge.column(
          graft.plans.BlockMd5Expr(
            org.apache.spark.sql.graft.ColumnBridge
              .expression(col("text")), blockTokens))).as("h"))
    val freq = flat.groupBy("h")
      .agg(countDistinct(col("doc_id")).as("df"))
    flat.join(freq, "h")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_blocks"),
        sum(when(col("df") >= minDf, 1L).otherwise(0L)).as("dup_blocks"))
      .withColumn("dup_frac",
        round(col("dup_blocks").cast("double") / col("n_blocks"), 6))
      .withColumn("mostly_dup", col("dup_blocks") * 2 >= col("n_blocks"))
  }
}
