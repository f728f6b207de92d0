package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** EXACT n-gram Jaccard near-duplicate pairs via an inverted shingle
  * index — the sketch-free member of the dedup family (MinHash
  * approximates exactly this measure; here the candidate step is the
  * inverted index itself, so similarity has no sketch error at all).
  *
  * Scale shape (nothing O(n²) on the corpus):
  *   1. distinct (doc_id, shingle) postings — one explode + distinct,
  *      shuffle on shingle;
  *   2. document-frequency cut: postings lists with df < 2 pair nothing,
  *      lists with df > `maxDf` are STOP-SHINGLES — boilerplate shared by
  *      half the corpus would otherwise emit O(df²) candidate pairs per
  *      shingle. The cut bounds every posting list (and hence every
  *      pair fan-out) by a constant, the standard prefix/frequency
  *      filtering move for set-similarity joins. Recall caveat: a pair
  *      sharing ONLY stop-shingles is missed — at threshold τ that
  *      requires both docs to be ≥τ boilerplate, which is exactly the
  *      content a training pipeline wants flagged by quality scoring
  *      (t02), not near-dup;
  *   3. pairs stream out of each posting list with the two-nested-
  *      explode pattern ([[MinHashLSH.candidatePairs]]): no row ever
  *      holds more than one list's ids, one `distinct` dedups pairs
  *      that co-occur in several postings;
  *   4. exact Jaccard verify over full shingle arrays, re-shingling ONLY
  *      docs that survived candidate generation (broadcast semi-join
  *      prune — candidates are tiny next to the corpus).
  */
object NgramJaccard {

  /** Distinct (doc_id, shingle) postings for word n-grams. */
  def postings(docs: DataFrame, n: Int): DataFrame =
    docs
      .select(col("doc_id"),
        explode(TextFunctions.shingles(col("text"), n)).as("s"))
      .distinct()

  /** Candidate pairs (a_id < b_id) sharing ≥ 1 shingle with document
    * frequency in [2, maxDf]. */
  def candidatePairs(docs: DataFrame, n: Int, maxDf: Int): DataFrame =
    postings(docs, n)
      .groupBy("s")
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")).between(2, maxDf))
      .select(col("ids"), posexplode(col("ids")).as(Seq("i", "a_id")))
      .select(col("a_id"),
        explode(slice(col("ids"), col("i") + lit(2), size(col("ids"))))
          .as("b_id"))
      .distinct()

  /** Near-duplicate pairs with their exact n-gram Jaccard similarity
    * (≥ `threshold`), rounded to 6 dp for cross-engine comparison. */
  def nearDuplicates(docs: DataFrame, n: Int = 3, maxDf: Int = 100,
      threshold: Double = 0.2): DataFrame = {
    val cand = candidatePairs(docs, n, maxDf)
    val sh = docs
      .select(col("doc_id"), TextFunctions.shingles(col("text"), n).as("sh"))
    cand
      .join(sh.select(col("doc_id").as("a_id"), col("sh").as("sh_a")), "a_id")
      .join(sh.select(col("doc_id").as("b_id"), col("sh").as("sh_b")), "b_id")
      .select(col("a_id"), col("b_id"),
        round(TextFunctions.jaccard(col("sh_a"), col("sh_b")), 6).as("jacc"))
      .filter(col("jacc") >= threshold)
  }

  /** DuckDB CTE bodies reproducing [[candidatePairs]] (no leading WITH;
    * final CTE `${prefix}cand(a_id, b_id)`), over the `documents` table
    * with the same shingle construction as [[MinHashLSH.duckSignatureCtes]]. */
  def duckCandCtes(n: Int, maxDf: Int, prefix: String = ""): String = {
    val grams = (1 to n).map(k => s"t[i+$k]").mkString(" || ' ' || ")
    s"""${prefix}tok AS (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents),
       |${prefix}shl AS (SELECT doc_id, CASE WHEN len(t) < $n THEN [text]
       |  ELSE list_transform(range(0, len(t) - ${n - 1}), i -> $grams) END AS sh
       |  FROM ${prefix}tok),
       |${prefix}ds AS (SELECT DISTINCT doc_id, s
       |  FROM (SELECT doc_id, unnest(sh) AS s FROM ${prefix}shl) u),
       |${prefix}freq AS (SELECT s FROM ${prefix}ds GROUP BY s
       |  HAVING count(*) BETWEEN 2 AND $maxDf),
       |${prefix}cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
       |  FROM ${prefix}ds a
       |  JOIN ${prefix}freq f ON a.s = f.s
       |  JOIN ${prefix}ds b ON a.s = b.s AND a.doc_id < b.doc_id)""".stripMargin
  }
}
