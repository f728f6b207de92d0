package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{CrossHash, Embedder, TextFunctions}

/** The reference's three-task Airflow ingestion DAG
  * (parser_pinecone_storage.py:41-183: list S3 → extract → chunk → embed →
  * upsert) re-expressed as ONE Spark job: scan → explode(chunks) →
  * columnar embed → parquet index write. The XCom/Postgres stage boundary
  * disappears — lineage is the plan; the per-chunk HTTP embedding loop and
  * per-vector upsert (the reference's two anti-patterns, SURVEY.md §4)
  * become a map stage and a bulk columnar write.
  *
  * At scale: map-only until the write; no shuffle at all unless the sink
  * requests clustering. Embedding dimension is config (reference: 1536;
  * fixtures: 64).
  */
object IngestionPipeline {

  /** Build the vector-index rows for a document corpus: one row per chunk,
    * with the reference's metadata projection (title[:50], content[:200],
    * parser_pinecone_storage.py:149-153) and deterministic ids replacing
    * the wall-clock salt (:147). */
  def buildIndex(spark: SparkSession, dir: String,
      chunkSize: Int = 3000, overlap: Int = 200, dim: Int = 64): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("text"),
        posexplode(TextFunctions.chunks(col("text"), chunkSize, overlap))
          .as(Seq("chunk_idx", "chunk")))
      .select(
        col("doc_id"),
        col("chunk_idx"),
        concat_ws("_", col("source"), lit("text"), col("chunk_idx"))
          .as("vec_key"),
        CrossHash.hash60(concat_ws("_", col("doc_id"), col("chunk_idx"),
          col("chunk"))).as("vec_uid"),
        substring(col("source"), 1, 50).as("title"),
        substring(col("chunk"), 1, 200).as("content"),
        Embedder.embed(col("chunk"), dim).as("embedding"))

  /** Bulk columnar index write — the Pinecone-upsert analog
    * (parser_pinecone_storage.py:154): the "index" is a parquet table. */
  def writeIndex(index: DataFrame, path: String): Unit =
    index.write.mode("overwrite").parquet(path)
}
