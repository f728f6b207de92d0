package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.IngestionPipeline

/** Keyed vector-index upsert: re-ingesting one document must replace
  * exactly its vectors (the reference's per-id Pinecone upsert semantics)
  * — the index after an incremental upsert must equal a fresh full build
  * over the mutated corpus, in both the per-doc-partition and the
  * bucketed read-merge-write layouts. */
class IngestionUpsertSpec extends SparkTestBase {

  private def cleanup(path: String): Unit = {
    val f = new java.io.File(path)
    if (f.exists()) {
      import scala.reflect.io.Directory
      new Directory(f).deleteRecursively()
    }
  }

  private def mutatedDocs(): (DataFrame, DataFrame) = {
    val docs = Tables.documents(spark, sf0001)
    val mutated = docs.withColumn("text",
      when(col("doc_id") === 3, concat(col("text"), lit(" amended text")))
        .otherwise(col("text")))
    (docs, mutated)
  }

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.select("doc_id", "chunk_idx", "vec_key", "vec_uid", "title", "content")
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)

  test("per-doc partitioned upsert equals a fresh build (mutate one doc)") {
    val path = "target/ingest-upsert-keyed"
    cleanup(path)
    val (docs, mutated) = mutatedDocs()
    IngestionPipeline.writeIndexKeyed(
      IngestionPipeline.buildIndexFrom(docs, 120, 20, 8), path)
    // re-ingest ONLY the mutated document
    IngestionPipeline.upsertIndex(
      IngestionPipeline.buildIndexFrom(
        mutated.filter(col("doc_id") === 3), 120, 20, 8), path)
    val after = rows(IngestionPipeline.readIndex(spark, path))
    val fresh = rows(IngestionPipeline.buildIndexFrom(mutated, 120, 20, 8))
    assert(after.nonEmpty)
    assert(after === fresh)
  }

  test("bucketed read-merge-write upsert equals a fresh build") {
    val path = "target/ingest-upsert-bucketed"
    cleanup(path)
    val (docs, mutated) = mutatedDocs()
    IngestionPipeline.writeIndexBucketed(
      IngestionPipeline.buildIndexFrom(docs, 120, 20, 8), path, buckets = 4)
    IngestionPipeline.upsertIndexBucketed(spark,
      IngestionPipeline.buildIndexFrom(
        mutated.filter(col("doc_id") === 3), 120, 20, 8), path, buckets = 4)
    val after = rows(IngestionPipeline.readIndex(spark, path))
    val fresh = rows(IngestionPipeline.buildIndexFrom(mutated, 120, 20, 8))
    assert(after.nonEmpty)
    assert(after === fresh)
  }

  test("upsert of an unchanged doc is idempotent") {
    val path = "target/ingest-upsert-keyed"
    // state from the first test: upsert doc 5's (unchanged) rows again
    val (_, mutated) = mutatedDocs()
    IngestionPipeline.upsertIndex(
      IngestionPipeline.buildIndexFrom(
        mutated.filter(col("doc_id") === 5), 120, 20, 8), path)
    val after = rows(IngestionPipeline.readIndex(spark, path))
    val fresh = rows(IngestionPipeline.buildIndexFrom(mutated, 120, 20, 8))
    assert(after === fresh)
  }
}
