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
  * Scale shape: three independent sketch pipelines (each shuffle-bounded,
  * see [[MinHashLSH]]/[[SimHash]]) feeding broadcast-sized flag sets joined
  * back to the corpus — the corpus itself is scanned, never self-joined.
  */
object DedupPipeline {

  def summary(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy("h")
    val exact = docs
      .select(col("doc_id"), md5(col("text")).as("h"))
      .withColumn("canonical_id", min(col("doc_id")).over(w))
      .select(col("doc_id"),
        (col("doc_id") =!= col("canonical_id")).as("is_exact_dup"))

    def pairDocs(pairs: DataFrame): DataFrame =
      pairs.select(col("a_id").as("doc_id"))
        .union(pairs.select(col("b_id").as("doc_id")))
        .distinct()

    val mh = pairDocs(MinHashLSH.nearDuplicates(docs))
      .withColumn("near_minhash", lit(true))
    val sh = pairDocs(SimHash.nearPairs(docs))
      .withColumn("near_simhash", lit(true))

    exact
      .join(mh, Seq("doc_id"), "left")
      .join(sh, Seq("doc_id"), "left")
      .select(col("doc_id"), col("is_exact_dup"),
        coalesce(col("near_minhash"), lit(false)).as("near_minhash"),
        coalesce(col("near_simhash"), lit(false)).as("near_simhash"),
        (!col("is_exact_dup")).as("keep"))
  }
}
