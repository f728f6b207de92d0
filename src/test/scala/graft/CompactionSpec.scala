package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Compaction

class CompactionSpec extends SparkTestBase {

  private def fragmented(): String = {
    val dir = Files.createTempDirectory("graft_frag").toString
    Tables.documents(spark, sf0001).repartition(40)
      .write.mode("overwrite").parquet(dir)
    dir
  }

  test("compaction collapses a fragmented table without changing its rows") {
    val src = fragmented()
    val dest = src + "_compact"
    val stats = Compaction.compactTo(spark, src, dest,
      targetFileBytes = 512L * 1024 * 1024)
    assert(stats.filesBefore === 40)
    assert(stats.filesAfter === 1, s"expected 1 output file, got $stats")
    val before = spark.read.parquet(src)
    val after = spark.read.parquet(dest)
    assert(after.count() === before.count())
    assert(after.exceptAll(before).isEmpty && before.exceptAll(after).isEmpty)
  }

  test("target size controls the output file count") {
    val src = fragmented()
    val bytes = Compaction.compactTo(spark, src, src + "_c1",
      targetFileBytes = Long.MaxValue).bytes
    // aim for ~4 files of a quarter of the data each
    val stats = Compaction.compactTo(spark, src, src + "_c4",
      targetFileBytes = math.max(1L, bytes / 4))
    assert(stats.filesAfter >= 2 && stats.filesAfter <= 8,
      s"expected ~4 files, got $stats")
  }

  test("sorted compaction leaves files with disjoint key ranges") {
    val src = fragmented()
    val dest = src + "_sorted"
    val bytes = Compaction.compactTo(spark, src, src + "_probe",
      targetFileBytes = Long.MaxValue).bytes
    Compaction.compactTo(spark, src, dest,
      targetFileBytes = math.max(1L, bytes / 4), sortCols = Seq("doc_id"))
    // per-file [min,max] envelopes must not overlap — that is what makes
    // footer-stats pruning select a single file per key predicate
    val ranges = spark.read.parquet(dest)
      .groupBy(input_file_name().as("f"))
      .agg(min("doc_id").as("lo"), max("doc_id").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(ranges.length >= 2)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 < lo2, s"overlapping file ranges: ${ranges.mkString(", ")}")
      case _ =>
    }
    // compaction is a rewrite, not a filter
    assert(spark.read.parquet(dest).count() ===
      spark.read.parquet(src).count())
  }

  test("failed rename leaves no partial destination visible") {
    // the destination only appears via atomic rename of the finished
    // temp dir — assert the temp dir is gone after success
    val src = fragmented()
    val dest = src + "_atomic"
    Compaction.compactTo(spark, src, dest, targetFileBytes = Long.MaxValue)
    assert(!new java.io.File(dest + ".inprogress").exists())
    assert(new java.io.File(dest).exists())
  }
}
