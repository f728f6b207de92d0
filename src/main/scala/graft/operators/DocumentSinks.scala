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

  /** Per-object sink: one file per row, path = `dir`/`keyCol` — the
    * executor-parallel form of the reference's boto3 put_object loops
    * (parser_pinecone_storage.py:93-103 `{doc}/table_{n}.csv`, :108-117
    * `{doc}/picture_{n}.png`), which upload one object per extracted
    * table/figure from a driver-side Python loop. Here each partition
    * writes its own rows (no driver collect, no shuffle); nested key
    * prefixes become directories. Production object stores swap the
    * java.nio writes for the Hadoop FileSystem API (s3a://) — the
    * partition-local loop is the part that matters at scale.
    *
    * Keys are object names, not arbitrary paths: a null key, an absolute
    * key, or one containing a `..` segment fails the task with a clear
    * error instead of writing outside `dir`. Each object lands via a
    * same-directory temp file + `Files.move` so a retried/speculative
    * task never leaves a torn object — the last rename wins whole. */
  def writeObjects(df: DataFrame, keyCol: String, payloadCol: String,
      dir: String): Unit = {
    import org.apache.spark.sql.functions.col
    df.select(col(keyCol).cast("string"), col(payloadCol).cast("binary"))
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        import java.nio.file.{Files, Paths, StandardCopyOption}
        rows.foreach { r =>
          val key = if (r.isNullAt(0)) null else r.getString(0)
          require(key != null && key.nonEmpty,
            s"writeObjects: null/empty key in column '$keyCol'")
          require(!key.startsWith("/") &&
              !key.split('/').contains("..") && !key.contains('\u0000'),
            s"writeObjects: key escapes the sink directory: '$key'")
          val f = Paths.get(dir, key)
          val parent = f.getParent
          if (parent != null) Files.createDirectories(parent)
          val tmp = Files.createTempFile(parent, "." + f.getFileName, ".tmp")
          Files.write(tmp,
            if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1))
          Files.move(tmp, f, StandardCopyOption.ATOMIC_MOVE,
            StandardCopyOption.REPLACE_EXISTING)
        }
      }
  }

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
