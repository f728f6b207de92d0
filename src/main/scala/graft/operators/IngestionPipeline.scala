package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** [[buildIndex]] over an explicit corpus DataFrame — the form the
    * binaryFile ingestion edge ([[graft.sources.BinaryDocuments]]) and
    * incremental re-ingestion feed. Needs (doc_id, source, text). */
  def buildIndexFrom(docs: DataFrame,
      chunkSize: Int = 3000, overlap: Int = 200, dim: Int = 64): DataFrame =
    docs
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

  /** Build the vector-index rows for a document corpus: one row per chunk,
    * with the reference's metadata projection (title[:50], content[:200],
    * parser_pinecone_storage.py:149-153) and deterministic ids replacing
    * the wall-clock salt (:147). */
  def buildIndex(spark: SparkSession, dir: String,
      chunkSize: Int = 3000, overlap: Int = 200, dim: Int = 64): DataFrame =
    buildIndexFrom(Tables.documents(spark, dir), chunkSize, overlap, dim)

  /** One index row per extracted table and figure — the reference's third
    * DAG task upserts these alongside the text chunks with PLACEHOLDER
    * embeddings ("Table data" / "Figure data",
    * parser_pinecone_storage.py:163-183) and s3_path/content_type
    * metadata, making the objects discoverable by metadata filter rather
    * than by similarity. The quirk is preserved deliberately (SURVEY.md
    * §4): every table row shares one constant vector, as in the reference.
    * Extraction counts are synthesized deterministically from doc_id
    * (tables: doc_id%3+1, matching the r12 extraction-JSON shape;
    * figures: doc_id%2) because the fixture corpus carries no real
    * extraction artifacts. */
  def extractionRefRows(spark: SparkSession, dir: String,
      dim: Int = 64): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("source"))
    def rows(contentType: String, n: Column, placeholder: String,
        ext: String): DataFrame =
      docs.withColumn("n", n).filter(col("n") > 0)
        .select(col("doc_id"), col("source"),
          explode(sequence(lit(0L), col("n") - 1)).as("obj_idx"))
        .select(
          col("doc_id"),
          lit(contentType).as("content_type"),
          col("obj_idx").cast("int").as("obj_idx"),
          concat_ws("_", col("source"), lit(contentType), col("obj_idx"))
            .as("vec_key"),
          format_string("%s/%s_%d" + ext, col("source"), lit(contentType),
            col("obj_idx")).as("s3_path"),
          Embedder.embed(lit(placeholder), dim).as("embedding"))
    rows("table", pmod(col("doc_id"), lit(3)) + 1, "Table data", ".csv")
      .unionByName(rows("figure", pmod(col("doc_id"), lit(2)), "Figure data",
        ".png"))
  }

  /** Bulk columnar index write — the Pinecone-upsert analog
    * (parser_pinecone_storage.py:154): the "index" is a parquet table. */
  def writeIndex(index: DataFrame, path: String): Unit =
    index.write.mode("overwrite").parquet(path)

  /** Index at rest partitioned BY doc_id — the layout [[upsertIndex]]
    * needs for keyed replacement. */
  def writeIndexKeyed(index: DataFrame, path: String): Unit =
    index.write.mode("overwrite").partitionBy("doc_id").parquet(path)

  /** KEYED upsert: re-ingesting a document replaces exactly its vectors —
    * the reference's per-id Pinecone upsert semantics
    * (parser_pinecone_storage.py:154,172,183), where a re-parsed PDF
    * overwrites its own chunk ids and never touches other documents'.
    * Dynamic partition overwrite rewrites only the doc_id partitions
    * present in `newRows`; a whole-table overwrite would clobber the rest
    * of the index, append would duplicate.
    *
    * Scale note: one partition per doc_id is right up to ~1M documents;
    * past that, partition by a doc_id bucket instead —
    * [[upsertIndexBucketed]] implements that read-merge-write form.
    *
    * NO-DELETE semantics: the touched partitions derive from `newRows`, so
    * a document whose re-ingest yields ZERO rows keeps its stale vectors
    * (dynamic overwrite cannot target an absent partition). Use the
    * bucketed form's explicit-doc_ids overload when re-ingestion must also
    * delete. */
  def upsertIndex(newRows: DataFrame, path: String): Unit =
    newRows.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("doc_id").parquet(path)

  /** Read back a keyed/bucketed index with doc_id restored to bigint
    * (partition-column inference narrows it to int). */
  def readIndex(spark: SparkSession, path: String): DataFrame = {
    val df = spark.read.parquet(path)
    df.withColumn("doc_id", col("doc_id").cast("long"))
  }

  // hash the CANONICAL long form: xxhash64(int x) != xxhash64(long x), so
  // bucketing the native type would send an IntegerType doc_id's deletes
  // to different buckets than its stored rows
  private def withBucket(df: DataFrame, buckets: Int): DataFrame =
    df.withColumn("bucket",
      pmod(xxhash64(col("doc_id").cast("long")), lit(buckets.toLong)))

  /** Bucketed index at rest: partition dir = hash(doc_id) % buckets, the
    * layout that keeps partition counts bounded at corpus scale. The
    * bucket modulus is recorded in a `_graft_buckets` sidecar so upserts
    * can validate theirs instead of trusting the caller. */
  def writeIndexBucketed(index: DataFrame, path: String,
      buckets: Int): Unit = {
    withBucket(index, buckets).write.mode("overwrite")
      .partitionBy("bucket").parquet(path)
    val f = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(index.sparkSession.sparkContext.hadoopConfiguration)
    val out = f.create(
      new org.apache.hadoop.fs.Path(path, "_graft_buckets"), true)
    try out.write(s"$buckets\n".getBytes("UTF-8")) finally out.close()
  }

  /** The bucket modulus `path`'s `_graft_buckets` sidecar records (None
    * for layouts written before the sidecar existed). */
  def storedBuckets(spark: SparkSession, path: String): Option[Int] = {
    val p = new org.apache.hadoop.fs.Path(path, "_graft_buckets")
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8")
        .mkString.trim.toInt)
      finally in.close()
    }
  }

  /** Keyed upsert against a BUCKETED index — the 100 TB shape: a bucket
    * holds many documents, so replacement is read-merge-write over ONLY
    * the touched buckets. Re-ingested doc_ids are inferred from `newRows`,
    * so this form CANNOT delete: a doc whose re-ingest yields zero rows
    * never touches its bucket. Pass the re-ingested ids explicitly via the
    * overload below when the contract must include deletion. */
  def upsertIndexBucketed(spark: SparkSession, newRows: DataFrame,
      path: String, buckets: Int): Unit =
    upsertIndexBucketed(spark, newRows,
      newRows.select("doc_id").distinct(), path, buckets)

  /** [[upsertIndexBucketed]] with the re-ingested document set made
    * EXPLICIT (`reingestedDocs` needs a `doc_id` column): every listed
    * doc_id's old vectors are anti-joined out whether or not `newRows`
    * carries replacements, so a re-ingest that now produces zero rows for
    * a document deletes its stale vectors — "upsert equals fresh rebuild"
    * holds in the empty-re-ingest edge too. Touched buckets derive from
    * the UNION of the id set's and the new rows' buckets (partition-pruned
    * read, anti-join, union, dynamic-overwrite); merged rows are
    * localCheckpoint-materialized BEFORE the overwrite commits — Spark
    * must never lazily re-read partitions the same job is deleting. */
  def upsertIndexBucketed(spark: SparkSession, newRows: DataFrame,
      reingestedDocs: DataFrame, path: String, buckets: Int): Unit = {
    // Modulus guard (the SnapshotStore #buckets contract): hashing with a
    // different bucket count than the stored layout would land fresh rows
    // in the wrong partitions AND make the touched-bucket anti-join miss
    // stale rows — named error instead of silent corruption. Layouts
    // predating the sidecar keep the legacy trusted-parameter contract.
    storedBuckets(spark, path).foreach { b =>
      if (b != buckets)
        throw new IllegalArgumentException(
          s"bucketed index at $path is bucketed $b ways but the upsert " +
            s"passed buckets = $buckets — a mismatched modulus would " +
            "corrupt the keyed replace; pass the stored count")
    }
    val fresh = withBucket(newRows, buckets)
    // anti-join out the UNION of the explicit id set and newRows' own
    // doc_ids: a document present in newRows but omitted from
    // reingestedDocs must still REPLACE its old vectors (not duplicate
    // them) — reingestedDocs only ADDS deletes, it cannot exempt
    val upsertedDocs = reingestedDocs.select(col("doc_id").cast("long")
      .as("doc_id"))
      .union(newRows.select(col("doc_id").cast("long").as("doc_id")))
      .distinct()
    val touched = withBucket(upsertedDocs, buckets).select("bucket")
      .union(fresh.select("bucket")).distinct()
      .collect().map(_.getLong(0))
    if (touched.nonEmpty) {
      val kept = spark.read.parquet(path)
        .filter(col("bucket").isin(touched: _*))
        .withColumn("doc_id", col("doc_id").cast("long"))
        // partition-column inference narrows bucket to int; realign with
        // fresh's pmod(xxhash64) long before the union
        .withColumn("bucket", col("bucket").cast("long"))
        .join(upsertedDocs, Seq("doc_id"), "left_anti")
      val merged = kept.unionByName(fresh).localCheckpoint(true)
      merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket").parquet(path)
      // dynamic overwrite cannot rewrite a partition the merged set no
      // longer contains: a bucket whose documents were ALL deleted keeps
      // its old files unless dropped explicitly
      val mergedBuckets = merged.select("bucket").distinct()
        .collect().map(_.getLong(0)).toSet
      val emptied = touched.filterNot(mergedBuckets.contains)
      if (emptied.nonEmpty) {
        val root = new org.apache.hadoop.fs.Path(path)
        val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
        emptied.foreach { b =>
          fs.delete(new org.apache.hadoop.fs.Path(root, s"bucket=$b"), true)
        }
      }
    }
  }
}
