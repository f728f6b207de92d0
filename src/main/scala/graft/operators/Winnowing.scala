package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.CrossHash

/** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD
  * 2003 — the MOSS local fingerprinting algorithm), the span-level
  * near-dup sketch between t04's single global min-hash and d09's exact
  * block dedup: hash every character k-gram, slide a w-hash window over
  * the hash stream, keep each window's MINIMUM. The selected value set
  * is a LOCAL sketch — any two documents sharing a substring of length
  * ≥ w + k − 1 are guaranteed to share a fingerprint (the window that
  * fits inside the common substring picks the same minimum on both
  * sides), a guarantee position-oblivious sketches (MinHash over the
  * whole document) cannot make.
  *
  * Flat formulation (the MinHashLSH lesson — no interpreted per-row HOF
  * folds in the hot path): the k-gram hash array explodes to (pos, h)
  * rows — the text column never rides through the explode — and the
  * rolling minimum is a codegen'd window frame [current, w−1 following]
  * partitioned by doc, state bounded by w. Selected fingerprints are
  * rows, not arrays (expected density 2/(w+1) of the k-gram stream), so
  * no single row ever materializes a document's O(n) window slices.
  */
object Winnowing {

  /** (doc_id, fp) — the value-deduped winnowing fingerprint set of each
    * document. Documents shorter than one full window keep their global
    * minimum (one fingerprint), so every document has ≥ 1 row. */
  def fingerprints(docs: DataFrame, k: Int = 8, w: Int = 8): DataFrame = {
    val text = col("text")
    val n = greatest(length(text) - (k - 1), lit(1))
    val hs = transform(
      sequence(lit(1), n),
      i => CrossHash.hash60(text.substr(i, lit(k))))
    val roll = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.currentRow, w - 1)
    docs
      .select(col("doc_id"), hs.as("hs"))
      .select(col("doc_id"), size(col("hs")).as("nh"),
        posexplode(col("hs")).as(Seq("pos", "h")))
      .withColumn("m", min("h").over(roll))
      // full windows start at pos 0..nh−w (0-based); short docs keep
      // pos 0, whose truncated frame is the global minimum
      .filter(col("pos") <= greatest(col("nh") - w, lit(0)))
      .select(col("doc_id"), col("m").as("fp"))
      .distinct()
  }

  /** Candidate pairs (a_id < b_id) sharing ≥ `minShared` fingerprints,
    * with common-fingerprint capping: a fingerprint present in more than
    * `dfCap` documents is boilerplate (the t15 argument) and generates
    * no pairs — the cap bounds every bucket, so the pair fan-out is
    * ≤ C(dfCap, 2) per fingerprint, never corpus-shaped. Pairs stream
    * from the nested-explode bucket walk (the MinHashLSH.candidatePairs
    * shape): one groupBy shuffle, no self-join, no O(m²) row. */
  def sharedFingerprints(docs: DataFrame, k: Int = 8, w: Int = 8,
      minShared: Int = 2, dfCap: Int = 50): DataFrame = {
    fingerprints(docs, k, w)
      .groupBy("fp")
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")).between(2, dfCap))
      .select(col("ids"), posexplode(col("ids")).as(Seq("i", "a_id")))
      .select(col("a_id"),
        explode(slice(col("ids"), col("i") + lit(2), size(col("ids"))))
          .as("b_id"))
      .groupBy("a_id", "b_id")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Oracle-side CTE bodies reproducing [[fingerprints]] in DuckDB SQL
    * (no leading `WITH`). Final CTE: `fp` with columns (doc_id, fp). */
  def duckFingerprintCtes(k: Int = 8, w: Int = 8): String = {
    val h = CrossHash.duckHash60(s"substr(text, cast(i as int), $k)")
    s"""whs AS (SELECT doc_id,
      |    list_transform(range(1, greatest(length(text) - ${k - 1}, 1) + 1),
      |                   i -> $h) AS hs
      |  FROM documents),
      |wpos AS (SELECT doc_id, hs, unnest(range(1, greatest(len(hs) - ${w - 1}, 1) + 1)) AS j
      |  FROM whs),
      |fp AS (SELECT DISTINCT doc_id,
      |    list_min(hs[cast(j as int) : least(cast(j + ${w - 1} as int), len(hs))]) AS fp
      |  FROM wpos)""".stripMargin
  }
}
