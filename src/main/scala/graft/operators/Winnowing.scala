package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{CrossHash, TextFunctions}

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
  * Formulation (measured at sf0.1, 5000 docs / ~2.5M k-grams, warm):
  * selection stays in the ARRAY world — one map-only projection per
  * document computes the k-gram hash array once (let-bound), each
  * window minimum as `least()` over w `element_at` lookups (no
  * per-window slice allocation), and dedupes with array_distinct before
  * the explode. 3.5 s end-to-end vs 6.7 s for the exploded
  * (pos, h)-rows + window-frame-min + distinct form: the flat form
  * pays a 2.5M-row explode plus a full shuffle+sort for the rolling
  * window and a second shuffle to dedupe, while the array form ships
  * only the ~60 selected fingerprints per document into the first
  * shuffle. (The MinHashLSH flattening lesson cuts the other way here:
  * d02's per-row cost was k×|shingles| interpreted AGGREGATE folds,
  * winnowing's is one linear pass of least() lookups.)
  */
object Winnowing {

  /** (doc_id, fp) — the value-deduped winnowing fingerprint set of each
    * document. Documents shorter than one full window keep their global
    * minimum (one fingerprint), so every document has ≥ 1 row. */
  def fingerprints(docs: DataFrame, k: Int = 8, w: Int = 8): DataFrame = {
    // fused per-row selection (graft.plans.WinnowPrintsExpr — one native
    // pass over the document bytes), replacing the array-HOF form whose
    // per-element lambdas (hash per k-gram, least() per window) evaluate
    // INTERPRETED under Spark's CodegenFallback HOFs. Value parity with
    // the HOF pipeline is spec-pinned (WinnowExprSpec); explode of the
    // null array drops null-text docs exactly as before.
    val wins = org.apache.spark.sql.graft.ColumnBridge.column(
      graft.plans.WinnowPrintsExpr(
        org.apache.spark.sql.graft.ColumnBridge
          .expression(col("text")), k, w))
    docs.select(col("doc_id"), explode(wins).as("fp"))
  }

  /** Candidate pairs (a_id < b_id) sharing ≥ `minShared` fingerprints,
    * with common-fingerprint capping: a fingerprint present in more than
    * `dfCap` documents is boilerplate (the t15 argument) and generates
    * no pairs — the cap bounds every bucket, so the pair fan-out is
    * ≤ C(dfCap, 2) per fingerprint, never corpus-shaped. Pairs stream
    * from the nested-explode bucket walk (the MinHashLSH.candidatePairs
    * shape): one groupBy shuffle, no self-join, no O(m²) row. */
  def sharedFingerprints(docs: DataFrame, k: Int = 8, w: Int = 8,
      minShared: Int = 2, dfCap: Int = 50): DataFrame =
    pairsFromPrints(fingerprints(docs, k, w), minShared, dfCap)

  /** The pair derivation of [[sharedFingerprints]] starting from an
    * ALREADY-COMPUTED (doc_id, fp) table — text is never touched, so a
    * consumer holding a persisted fingerprint table ([[writePrints]])
    * pays only the bucket walk, not the corpus k-gram scan that
    * dominates the from-text path. */
  def pairsFromPrints(prints: DataFrame,
      minShared: Int = 2, dfCap: Int = 50): DataFrame = {
    prints
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

  /** Persist the corpus' winnowing fingerprint table through
    * [[SnapshotStore]] — the d22 stored-label discipline applied to the
    * winnowing family: compute the k-gram scan ONCE, publish (doc_id,
    * fp) atomic and time-travelable with min/max statistics on both
    * columns (a plagiarism probe for one document is a stats-pruned
    * point read, not a table scan), and let every pair derivation
    * ([[pairsFromPrints]]) start from the stored table. At 100 TB the
    * fingerprint scan is the expensive leg — hashing every character
    * k-gram of the corpus — and it is also the incrementally
    * maintainable one: prints are a PER-DOCUMENT pure function of the
    * text (no cross-document state, unlike d08's closure), so an
    * arriving batch upserts exactly its own rows ([[upsertPrints]])
    * and the updated table is bit-identical to a from-scratch build. */
  def writePrints(prints: DataFrame, root: String, buckets: Int = 4): Long =
    SnapshotStore.commit(
      prints.select(col("doc_id").cast("long").as("doc_id"),
        col("fp").cast("long").as("fp")),
      root, buckets,
      meta = Seq(SnapshotStore.statsDeclaration(Seq("doc_id", "fp"))),
      // prints have no value-clustered layout to preserve — one file per
      // bucket instead of one per (fan-out task × bucket)
      distributeByBucket = true)

  /** The stored fingerprints of a published version (head by default) —
    * (doc_id, fp). Time travel recovers the exact print table a past
    * pair report was derived from. */
  def readPrints(spark: org.apache.spark.sql.SparkSession, root: String,
      version: Long = -1L): DataFrame =
    SnapshotStore.read(spark, root, version).select("doc_id", "fp")

  /** Incremental print maintenance: an arriving batch's fingerprints
    * REPLACE the batch documents' stored rows through the key-pruned
    * upsert (a re-parsed document sheds its stale prints; an unchanged
    * prior document's files are never rewritten). O(batch + touched
    * files) per increment — the from-scratch alternative re-hashes the
    * whole corpus' k-grams. Exact by construction: prints are
    * per-document, so {stored prior prints} ∪ {batch prints} IS the
    * full-corpus print table. */
  def upsertPrints(newPrints: DataFrame, batchDocIds: DataFrame,
      root: String, buckets: Int = 4): Long =
    SnapshotStore.upsert(newPrints.sparkSession,
      newPrints.select(col("doc_id").cast("long").as("doc_id"),
        col("fp").cast("long").as("fp")),
      batchDocIds.select(col("doc_id").cast("long").as("doc_id")),
      root, buckets)

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
