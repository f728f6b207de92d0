package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction — the unglamorous operator every 100 TB table
  * needs. Streaming ingest, per-partition upserts, and hourly batch appends
  * all leave behind files far below the ideal scan unit; a table of 100k ×
  * 1 MB files costs a scheduler 100k tasks and a scan 100k footer reads
  * where ~800 × 128 MB files would do.
  *
  * `compactTo` sizes the output from the INPUT'S actual bytes (one
  * filesystem listing, no data pass), rewrites in a single job, and can
  * sort by a clustering key while it is at it — compaction is the one
  * moment rewriting the data is free, so it is also the natural moment to
  * restore sort/Z-order locality (see [[ZOrder]]) that incremental appends
  * destroyed.
  *
  * The write goes to a fresh directory + atomic rename, never in place: a
  * failed compaction must leave the source untouched (readers keep working
  * off the old files until the swap).
  */
object Compaction {

  /** Listing-derived stats; `bytes` is pre-compaction parquet bytes. */
  final case class Stats(filesBefore: Int, bytes: Long, filesAfter: Int)

  private def parquetFiles(spark: SparkSession, dir: String) = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).filter { st =>
      val n = st.getPath.getName
      st.isFile && !n.startsWith("_") && !n.startsWith(".")
    }
  }

  /** Rewrite `srcDir` (a FLAT parquet directory) into `destDir` with
    * files of roughly `targetFileBytes`, sorted within files by `sortCols`
    * when given. Returns the before/after stats.
    *
    * Partitioned layouts (`bucket=N/` subdirs) are rejected: silently
    * flattening one into `nOut` files would both destroy the partition
    * pruning the layout exists for and miscount the input as 0 bytes →
    * 1 giant output file. Compact a partitioned table per-partition, or
    * through its catalog ([[SnapshotStore.optimize]] for the versioned
    * store). */
  def compactTo(spark: SparkSession, srcDir: String, destDir: String,
      targetFileBytes: Long, sortCols: Seq[String] = Nil): Stats = {
    val files = parquetFiles(spark, srcDir)
    require(files.nonEmpty, {
      val p = new Path(srcDir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val subdirs = fs.listStatus(p).filter(_.isDirectory)
        .map(_.getPath.getName).filterNot(_.startsWith("_"))
      if (subdirs.nonEmpty)
        s"compactTo: $srcDir is a partitioned layout " +
          s"(${subdirs.take(3).mkString(", ")}…) — compact per-partition " +
          "or via SnapshotStore.optimize; flattening it would lose the " +
          "partition pruning"
      else s"compactTo: no parquet files in $srcDir"
    })
    val bytes = files.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val df = spark.read.parquet(srcDir)
    val shaped =
      if (sortCols.nonEmpty) {
        import org.apache.spark.sql.functions.col
        val keys = sortCols.map(col)
        // range partitioning → globally sorted layout: file i holds keys
        // below file i+1, so min/max footer stats become disjoint and a
        // key predicate prunes to one file
        df.repartitionByRange(nOut, keys: _*)
          .sortWithinPartitions(keys: _*)
      } else df.coalesce(nOut)
    val tmp = destDir + ".inprogress"
    shaped.write.mode("overwrite").parquet(tmp)
    val dest = new Path(destDir)
    val fs = dest.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(dest)) fs.delete(dest, true)
    if (!fs.rename(new Path(tmp), dest))
      throw new java.io.IOException(s"rename $tmp -> $destDir failed")
    Stats(files.length, bytes, parquetFiles(spark, destDir).length)
  }
}
