package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{CrossHash, TextFunctions}

/** EXACT n-gram Jaccard near-duplicate pairs via an inverted shingle
  * index — the sketch-free member of the dedup family (MinHash
  * approximates exactly this measure; here similarity is computed from
  * true intersection counts, no sketch error).
  *
  * Jaccard needs only |A∩B| and |A|,|B|, so NO per-pair array
  * intersection ever runs: |A∩B| falls out of counting each pair's
  * shared postings, |A| out of a per-doc count. (The first cut of this
  * operator verified 1.1M candidate pairs with array_intersect over
  * ~50-element string arrays at sf0.1 — 42 s; counting is ~3 s.)
  *
  * Scale shape (nothing O(n²) on the corpus):
  *   1. distinct (doc_id, hash60(shingle)) postings — shingles shuffle
  *      as 8-byte ints, never strings. A 60-bit collision merges two
  *      shingles corpus-wide (P ≈ n²/2^61 — negligible, and IDENTICAL
  *      in the DuckDB oracle, which hashes the same way);
  *   2. document-frequency cut: df < 2 pairs nothing; df > `maxDf`
  *      shingles are STOP-SHINGLES — boilerplate shared by half the
  *      corpus would otherwise emit O(df²) co-occurrence rows per
  *      shingle. The cut bounds every posting list by a constant (the
  *      standard frequency-filtering move for set-similarity joins).
  *      Effect on scores: stop-shingles are excluded from |A∩B| but not
  *      from |A|, so reported jacc is a LOWER BOUND for stop-heavy
  *      pairs and exact whenever no shared shingle exceeds maxDf (true
  *      of the whole fixture corpus: max df 25);
  *   3. co-occurrence rows stream out of each posting list with the
  *      two-nested-explode pattern ([[MinHashLSH.candidatePairs]]): no
  *      row ever holds more than one list's ids;
  *   4. one groupBy (a_id, b_id) count — map-side partial aggregation —
  *      then a join against the per-doc sizes (tiny; AQE broadcasts it)
  *      computes jacc = c / (|A| + |B| − c) and thresholds.
  */
object NgramJaccard {

  /** Distinct (doc_id, h) postings: h = 60-bit md5 hash of each word
    * n-gram shingle — derived from [[byShingle]] so the shingle/hash
    * construction exists exactly once. */
  def postings(docs: DataFrame, n: Int): DataFrame =
    byShingle(docs, n)
      .select(col("h"), explode(col("ids")).as("doc_id"))
      .select("doc_id", "h")

  /** One row per shingle hash with its sorted posting list. The ONE
    * corpus-width aggregation every downstream product derives from:
    * `collect_set` dedups map-side, so the distinct-postings pass and the
    * by-shingle grouping are a single shuffle, and because both the pair
    * branch and the size branch hang off this same subtree, AQE's exchange
    * reuse materializes it once (the naive formulation re-ran the whole
    * scan+shingle+md5 pipeline per branch — 3 parquet scans at sf0.1). */
  private def byShingle(docs: DataFrame, n: Int): DataFrame =
    SkewTools.fanOut(docs)
      .select(col("doc_id"),
        // fused per-row shingle hashing (graft.plans.ShingleHashesExpr):
        // hash60 per shingle straight off the document bytes, replacing
        // the interpreted HOF shingle construction + per-row concat_ws
        // allocations; value parity spec-pinned (WinnowExprSpec)
        explode(org.apache.spark.sql.graft.ColumnBridge.column(
          graft.plans.ShingleHashesExpr(
            org.apache.spark.sql.graft.ColumnBridge
              .expression(col("text")), n))).as("h"))
      .groupBy("h")
      .agg(sort_array(collect_set(col("doc_id"))).as("ids"))

  /** One row per (a_id, b_id, shared shingle) with df ∈ [2, maxDf] —
    * |A∩B| is the count of these per pair. */
  private def coOccurrences(byH: DataFrame, maxDf: Int): DataFrame =
    byH
      .filter(size(col("ids")).between(2, maxDf))
      .select(col("ids"), posexplode(col("ids")).as(Seq("i", "a_id")))
      .select(col("a_id"),
        explode(slice(col("ids"), col("i") + lit(2), size(col("ids"))))
          .as("b_id"))

  /** Distinct candidate pairs (a_id < b_id) sharing ≥ 1 shingle with
    * document frequency in [2, maxDf]. */
  def candidatePairs(docs: DataFrame, n: Int, maxDf: Int): DataFrame =
    coOccurrences(byShingle(docs, n), maxDf).distinct()

  /** Near-duplicate pairs with their exact n-gram Jaccard similarity
    * (≥ `threshold`), rounded to 6 dp for cross-engine comparison.
    * |A| is recovered from the posting lists themselves (each doc appears
    * once per distinct shingle), so sizes cost one narrow re-explode of
    * the reused by-shingle exchange, not a corpus rescan. */
  def nearDuplicates(docs: DataFrame, n: Int = 3, maxDf: Int = 100,
      threshold: Double = 0.2): DataFrame = {
    val byH = byShingle(docs, n)
    val inter = coOccurrences(byH, maxDf)
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("c"))
    val sizes = byH.select(explode(col("ids")).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
    inter
      .join(sizes.select(col("doc_id").as("a_id"), col("n").as("na")), "a_id")
      .join(sizes.select(col("doc_id").as("b_id"), col("n").as("nb")), "b_id")
      .select(col("a_id"), col("b_id"),
        round(col("c").cast("double") /
          (col("na") + col("nb") - col("c")).cast("double"), 6).as("jacc"))
      .filter(col("jacc") >= threshold)
  }

  /** DuckDB CTE bodies reproducing [[postings]] → co-occurrence counts
    * (no leading WITH; final CTEs `${prefix}co(a_id, b_id, c)` and
    * `${prefix}sz(doc_id, n)`), same shingle + hash construction as
    * [[MinHashLSH.duckSignatureCtes]]. */
  def duckJaccardCtes(n: Int, maxDf: Int, prefix: String = ""): String = {
    val grams = (1 to n).map(k => s"t[i+$k]").mkString(" || ' ' || ")
    s"""${prefix}tok AS (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents),
       |${prefix}shl AS (SELECT doc_id, CASE WHEN len(t) < $n THEN [text]
       |  ELSE list_transform(range(0, len(t) - ${n - 1}), i -> $grams) END AS sh
       |  FROM ${prefix}tok),
       |${prefix}ds AS (SELECT DISTINCT doc_id, ${CrossHash.duckHash60("u.s")} AS h
       |  FROM (SELECT doc_id, unnest(sh) AS s FROM ${prefix}shl) u),
       |${prefix}freq AS (SELECT h FROM ${prefix}ds GROUP BY h
       |  HAVING count(*) BETWEEN 2 AND $maxDf),
       |${prefix}co AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS c
       |  FROM ${prefix}ds a
       |  JOIN ${prefix}freq f ON a.h = f.h
       |  JOIN ${prefix}ds b ON a.h = b.h AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |${prefix}sz AS (SELECT doc_id, count(*) AS n FROM ${prefix}ds GROUP BY 1)""".stripMargin
  }
}
