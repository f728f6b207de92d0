package graft.operators

import org.apache.spark.sql.DataFrame

/** Sink surface mirroring the reference's per-document export fan-out
  * (SURVEY.md §2.1): Docling JSON export (parser_pinecone_storage.py:81-82),
  * flat-text export (:83-84), per-table CSV upload (:93-103), and the
  * parquet vector-index upsert (:154). The reference writes one file per
  * document/table through boto3 in a Python loop; here each sink is a bulk
  * columnar write whose parallelism is the DataFrame's partitioning —
  * pointing the same call at `s3a://` URIs covers the upload case on a
  * cluster.
  */
object DocumentSinks {
  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  def writeText(df: DataFrame, textCol: String, path: String): Unit =
    df.select(textCol).write.mode("overwrite").text(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  /** Partitioned export: one directory per value of `byCol` (the analog of
    * the reference's `{doc}/table_{n}.csv` keying, but partition-pruned on
    * read instead of name-mangled). */
  def writePartitioned(df: DataFrame, byCol: String, path: String): Unit =
    df.write.mode("overwrite").partitionBy(byCol).parquet(path)

  /** Bucketed catalog table: co-locates rows by hash(key) at write time so
    * joins/aggregations on the key need no exchange at read time — the
    * storage layout that removes the shuffle for repeated big-to-big joins
    * at scale (both sides bucketed on the join key → zipped bucket scan). */
  def writeBucketed(df: DataFrame, key: String, buckets: Int,
      table: String): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)
}
