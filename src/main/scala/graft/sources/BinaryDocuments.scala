package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.CrossHash

/** File-corpus ingestion edge: the reference's real entry point is an S3
  * object listing with a `.pdf` suffix predicate feeding per-file
  * extraction (parser_pinecone_storage.py:41-46 — `list_objects_v2` +
  * `key.endswith('.pdf')` — then :53-84 per-file Docling parse). Spark's
  * `binaryFile` source is the same operation done right at scale: the
  * extension predicate applies AT LISTING (`pathGlobFilter`, never
  * opening excluded objects), listing is distributed, and each file's
  * bytes arrive as one row on an executor — no driver-side download loop.
  *
  * The Docling parse itself is an opaque parser boundary this container
  * cannot host (no PDF libraries); [[toDocuments]] stands it in with a
  * UTF-8 byte decode so the plumbing — listing predicate, schema, id
  * derivation, downstream chunk/embed compatibility — is real and tested,
  * and [[graft.operators.Multimodal.decodeFeatures]] covers the
  * partition-local opaque-codec shape for non-text payloads.
  */
object BinaryDocuments {

  /** Distributed listing + split file reads, extension predicate pushed
    * into the listing. Schema: (path, modificationTime, length, content). */
  def scan(spark: SparkSession, dir: String,
      glob: String = "*.pdf"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)

  /** Listed files → document rows compatible with the `documents` table
    * contract (doc_id, source, text, n_bytes): doc_id is the content-free
    * path hash (stable across re-listings — the reference keys documents
    * by S3 object name, parser_pinecone_storage.py:57), source is the
    * object basename, and the Docling text extraction is stood in by a
    * UTF-8 decode of the payload. */
  def toDocuments(spark: SparkSession, dir: String,
      glob: String = "*.pdf"): DataFrame =
    scan(spark, dir, glob).select(
      CrossHash.hash60(col("path")).as("doc_id"),
      regexp_extract(col("path"), "([^/]+)$", 1).as("source"),
      decode(col("content"), "UTF-8").as("text"),
      col("length").as("n_bytes"))

  /** Listed files → typed media rows for the opaque-codec path
    * ([[graft.operators.Multimodal.decodeFeatures]]): media_id mirrors
    * [[toDocuments]]'s doc_id so the two views join. */
  def toMedia(spark: SparkSession, dir: String,
      glob: String = "*.pdf", mediaType: String = "application/pdf")
      : DataFrame =
    scan(spark, dir, glob).select(
      CrossHash.hash60(col("path")).as("media_id"),
      lit(mediaType).as("media_type"),
      col("content").as("payload"))
}
