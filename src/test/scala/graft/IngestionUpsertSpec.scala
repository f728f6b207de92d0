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

  test("a doc in newRows but omitted from reingestedDocs still replaces") {
    import spark.implicits._
    val path = "target/ingest-upsert-omitted"
    cleanup(path)
    val (docs, mutated) = mutatedDocs()
    IngestionPipeline.writeIndexBucketed(
      IngestionPipeline.buildIndexFrom(docs, 120, 20, 8), path, buckets = 4)
    // reingestedDocs lists only doc 7 (a delete); doc 3's replacement rows
    // arrive via newRows alone and must not duplicate its old vectors
    IngestionPipeline.upsertIndexBucketed(spark,
      IngestionPipeline.buildIndexFrom(
        mutated.filter(col("doc_id") === 3), 120, 20, 8),
      Seq(7L).toDF("doc_id"), path, buckets = 4)
    val after = rows(IngestionPipeline.readIndex(spark, path))
    val fresh = rows(IngestionPipeline.buildIndexFrom(
      mutated.filter(col("doc_id") =!= 7), 120, 20, 8))
    assert(after === fresh)
  }

  test("explicit-doc_ids upsert deletes a doc whose re-ingest is empty") {
    import spark.implicits._
    val path = "target/ingest-upsert-delete"
    cleanup(path)
    val (docs, _) = mutatedDocs()
    IngestionPipeline.writeIndexBucketed(
      IngestionPipeline.buildIndexFrom(docs, 120, 20, 8), path, buckets = 4)
    // doc 3 re-ingests to ZERO rows (removed from the corpus): with the
    // explicit id set its stale vectors must still be anti-joined out
    IngestionPipeline.upsertIndexBucketed(spark,
      IngestionPipeline.buildIndexFrom(
        docs.filter(lit(false)), 120, 20, 8),
      Seq(3L).toDF("doc_id"), path, buckets = 4)
    val after = rows(IngestionPipeline.readIndex(spark, path))
    val fresh = rows(IngestionPipeline.buildIndexFrom(
      docs.filter(col("doc_id") =!= 3), 120, 20, 8))
    assert(after.nonEmpty)
    assert(after === fresh)
  }

  test("deleting every doc in a bucket drops the partition, not just its rows") {
    import spark.implicits._
    val path = "target/ingest-upsert-drop-bucket"
    cleanup(path)
    val (docs, _) = mutatedDocs()
    val only3 = docs.filter(col("doc_id") === 3)
    IngestionPipeline.writeIndexBucketed(
      IngestionPipeline.buildIndexFrom(only3, 120, 20, 8), path, buckets = 4)
    IngestionPipeline.upsertIndexBucketed(spark,
      IngestionPipeline.buildIndexFrom(
        docs.filter(lit(false)), 120, 20, 8),
      Seq(3L).toDF("doc_id"), path, buckets = 4)
    val bucketDirs = Option(new java.io.File(path).listFiles())
      .getOrElse(Array.empty).filter(_.getName.startsWith("bucket="))
    assert(bucketDirs.isEmpty,
      s"stale bucket partitions survived a full delete: ${bucketDirs.mkString(", ")}")
  }

  test("bucketed upsert with a mismatched modulus raises a named error") {
    import spark.implicits._
    val path = "target/ingest-upsert-modulus"
    cleanup(path)
    val (docs, _) = mutatedDocs()
    IngestionPipeline.writeIndexBucketed(
      IngestionPipeline.buildIndexFrom(docs, 120, 20, 8), path, buckets = 4)
    assert(IngestionPipeline.storedBuckets(spark, path) === Some(4))
    val ex = intercept[IllegalArgumentException] {
      IngestionPipeline.upsertIndexBucketed(spark,
        IngestionPipeline.buildIndexFrom(
          docs.filter(col("doc_id") === 3), 120, 20, 8),
        Seq(3L).toDF("doc_id"), path, buckets = 8)
    }
    assert(ex.getMessage.contains("bucketed 4") &&
      ex.getMessage.contains("buckets = 8"), ex.getMessage)
    // the matching modulus still works and the sidecar survives
    IngestionPipeline.upsertIndexBucketed(spark,
      IngestionPipeline.buildIndexFrom(
        docs.filter(col("doc_id") === 3), 120, 20, 8),
      Seq(3L).toDF("doc_id"), path, buckets = 4)
    assert(IngestionPipeline.storedBuckets(spark, path) === Some(4))
    assert(rows(spark.read.parquet(path).drop("bucket")) ===
      rows(IngestionPipeline.buildIndexFrom(docs, 120, 20, 8)))
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
