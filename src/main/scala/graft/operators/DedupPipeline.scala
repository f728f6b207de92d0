package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Composed corpus-cleaning verdict: every dedup signal the engine computes,
  * joined into one per-document summary — the operator a training-data
  * pipeline actually runs before writing a cleaned corpus.
  *
  * Columns: `is_exact_dup` (a byte-identical earlier copy exists),
  * `near_minhash` / `near_simhash` (the document participates in a
  * near-duplicate pair under the respective sketch), and `keep` (the
  * cleaning decision: not an exact dup — near-dup pairs keep both members
  * here; a production pipeline would pick a canonical member per pair).
  *
  * Scale shape: the sketch pipelines run over CANONICAL REPRESENTATIVES
  * only (first doc per md5 group), never the raw corpus. Sketching all
  * copies is the classic LSH blow-up: a 100k-copy boilerplate cluster
  * lands in one bucket and emits ~5·10⁹ candidate pairs; collapsed first,
  * it contributes ONE representative. The member flags are provably the
  * full-corpus flags: identical text ⇒ identical shingles/signature, so
  * member-near ⟺ (its group has a second member — the pair has Jaccard 1
  * and identical signatures, surviving any banding) ∨ (its canonical is
  * near another canonical). The d06 oracle computes the full-corpus
  * definition and must keep matching this formulation exactly.
  */
object DedupPipeline {

  def summary(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy("h")
    val withCanon = docs
      .select(col("doc_id"), col("text"), md5(col("text")).as("h"))
      .withColumn("canonical_id", min(col("doc_id")).over(w))
      .withColumn("has_copy", (count(lit(1)).over(w) > 1))

    val members = withCanon.select("doc_id", "canonical_id", "has_copy")
    val reps = withCanon
      .filter(col("doc_id") === col("canonical_id"))
      .select("doc_id", "text")

    def pairDocs(pairs: DataFrame): DataFrame =
      pairs.select(col("a_id").as("canonical_id"))
        .union(pairs.select(col("b_id").as("canonical_id")))
        .distinct()

    val mh = pairDocs(MinHashLSH.nearDuplicates(reps))
      .withColumn("rep_minhash", lit(true))
    val sh = pairDocs(SimHash.nearPairs(reps))
      .withColumn("rep_simhash", lit(true))

    members
      .join(mh, Seq("canonical_id"), "left")
      .join(sh, Seq("canonical_id"), "left")
      .select(col("doc_id"),
        (col("doc_id") =!= col("canonical_id")).as("is_exact_dup"),
        (coalesce(col("rep_minhash"), lit(false)) || col("has_copy"))
          .as("near_minhash"),
        (coalesce(col("rep_simhash"), lit(false)) || col("has_copy"))
          .as("near_simhash"))
      .withColumn("keep", !col("is_exact_dup"))
  }
}
