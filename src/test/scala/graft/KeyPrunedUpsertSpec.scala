package graft

import org.apache.spark.sql.functions._

import graft.operators.SnapshotStore

/** Key-pruned upsert/readDocs: with a doc_id stats/bloom declaration the
  * store's read-merge-write touches only the files that CAN contain the
  * incoming keys (the deletePoint candidate trick applied to the key
  * column) — every other file of the touched buckets carries into the
  * new manifest verbatim, so a point upsert against a store with
  * thousands of files per bucket rewrites a handful of files, not whole
  * buckets. Results must stay EXACTLY upsert-equals-fresh-rebuild. */
class KeyPrunedUpsertSpec extends SparkTestBase {

  private def cleanup(path: String): Unit = {
    val f = new java.io.File(path)
    if (f.exists()) {
      import scala.reflect.io.Directory
      new Directory(f).deleteRecursively()
    }
  }

  test("a 1-row upsert carries the touched bucket's clean files " +
      "verbatim; content stays upsert-equals-fresh-rebuild") {
    val root = "target/keypruned-upsert"
    cleanup(root)
    val sp = spark
    import sp.implicits._
    val df = (0L until 2000L).map(i => (i, i * 3)).toDF("doc_id", "n")
    SnapshotStore.commit(df, root, buckets = 2,
      meta = Seq(SnapshotStore.statsDeclaration(Seq("doc_id")),
        SnapshotStore.bloomDeclaration(Seq("doc_id"), bits = 4096)))
    // ~63 files per bucket, doc_id-sorted → tight per-file envelopes
    SnapshotStore.optimize(spark, root, maxRecordsPerFile = 16L)
    val before = SnapshotStore.read(spark, root).inputFiles.toSet
    assert(before.size >= 100, s"expected many files, got ${before.size}")

    // replace one existing doc
    val fresh = Seq((777L, -1L)).toDF("doc_id", "n")
    SnapshotStore.upsert(spark, fresh, fresh.select("doc_id"),
      root, buckets = 2)
    val snap = SnapshotStore.read(spark, root)
    val after = snap.inputFiles.toSet
    // the touched bucket's ~63 files: all but the admitting file(s)
    // must carry verbatim — allow a little bloom false-positive slack
    val carried = before.intersect(after).size
    assert(carried >= before.size - 4,
      s"whole-bucket rewrite: carried only $carried of ${before.size}")
    assert(snap.count() === 2000L)
    assert(snap.filter(col("doc_id") === 777L)
      .select("n").collect().map(_.getLong(0)).toSeq === Seq(-1L))
    assert(snap.agg(sum("n")).collect()(0).getLong(0) ===
      (0L until 2000L).filter(_ != 777L).map(_ * 3).sum - 1L)

    // a brand-new doc admits NO existing file: everything carries
    val before2 = after
    val fresh2 = Seq((999999L, 5L)).toDF("doc_id", "n")
    SnapshotStore.upsert(spark, fresh2, fresh2.select("doc_id"),
      root, buckets = 2)
    val snap2 = SnapshotStore.read(spark, root)
    val after2 = snap2.inputFiles.toSet
    assert(before2.subsetOf(after2),
      "an insert-only upsert rewrote existing clean files")
    assert(snap2.count() === 2001L)

    // deleting via empty re-ingest still finds the row (bloom must
    // admit the file that really holds it — false negatives impossible)
    val none = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      fresh.schema)
    SnapshotStore.upsert(spark, none, Seq(777L).toDF("doc_id"),
      root, buckets = 2)
    assert(SnapshotStore.read(spark, root)
      .filter(col("doc_id") === 777L).count() === 0L)
  }

  test("readDocs opens only admitting files; doc_id probes work through " +
      "readPoint/readWhere/deletePoint") {
    val root = "target/keypruned-readdocs"
    cleanup(root)
    val sp = spark
    import sp.implicits._
    val df = (0L until 2000L).map(i => (i, s"t_$i")).toDF("doc_id", "t")
    SnapshotStore.commit(df, root, buckets = 2,
      meta = Seq(SnapshotStore.statsDeclaration(Seq("doc_id")),
        SnapshotStore.bloomDeclaration(Seq("doc_id"), bits = 4096)))
    SnapshotStore.optimize(spark, root, maxRecordsPerFile = 16L)
    val total = SnapshotStore.read(spark, root).inputFiles.length
    val lookup = SnapshotStore.readDocs(spark, root, Seq(123L, 1500L))
    assert(lookup.inputFiles.length <= 6,
      s"point lookup opened ${lookup.inputFiles.length} of $total files")
    assert(lookup.select("doc_id").collect().map(_.getLong(0)).toSet ===
      Set(123L, 1500L))
    // probe surface: doc_id types as bigint everywhere
    assert(SnapshotStore.readPoint(spark, root, "doc_id", 123L)
      .count() === 1L)
    val (kept, all) = SnapshotStore.bloomReport(spark, root,
      "doc_id", 123L)
    assert(kept < all / 4, s"doc_id bloom did not prune: $kept/$all")
    assert(SnapshotStore.readWhere(spark, root, "doc_id", 100L, 110L)
      .count() === 11L)
    val (keptR, _) = SnapshotStore.skippingReport(spark, root,
      "doc_id", 100L, 110L)
    assert(keptR < all / 4, s"doc_id stats did not prune: $keptR/$all")
    SnapshotStore.deletePoint(spark, root, "doc_id", 1500L)
    assert(SnapshotStore.read(spark, root).count() === 1999L)
    assert(SnapshotStore.readDocs(spark, root, Seq(1500L)).count() === 0L)
  }

  test("past docIdPruneCap the upsert skips key pruning (the sorted-id " +
      "broadcast row would be an OOM risk) and falls back to the " +
      "whole-bucket rewrite — content stays exact") {
    val root = "target/keypruned-cap"
    cleanup(root)
    val sp = spark
    import sp.implicits._
    val df = (0L until 2000L).map(i => (i, i * 3)).toDF("doc_id", "n")
    SnapshotStore.commit(df, root, buckets = 2,
      meta = Seq(SnapshotStore.statsDeclaration(Seq("doc_id")),
        SnapshotStore.bloomDeclaration(Seq("doc_id"), bits = 4096)))
    SnapshotStore.optimize(spark, root, maxRecordsPerFile = 16L)
    val before = SnapshotStore.read(spark, root).inputFiles.toSet
    assert(before.size >= 100, s"expected many files, got ${before.size}")

    // 5 distinct incoming ids, cap forced to 3 → pruning must NOT run
    val fresh = Seq(10L, 20L, 30L, 40L, 50L).map(i => (i, -i))
      .toDF("doc_id", "n")
    val savedCap = SnapshotStore.docIdPruneCap
    SnapshotStore.docIdPruneCap = 3
    try SnapshotStore.upsert(spark, fresh, fresh.select("doc_id"),
      root, buckets = 2)
    finally SnapshotStore.docIdPruneCap = savedCap

    val snap = SnapshotStore.read(spark, root)
    val after = snap.inputFiles.toSet
    // fallback engaged: each touched bucket (≥1 of 2) rewrote wholesale
    // (~half the files) instead of carrying all-but-the-admitting files
    // (pruning would carry ≥ size-4, as the first test pins)
    assert(before.intersect(after).size <= before.size - 20,
      "key pruning ran past the cardinality cap")
    // exactness is untouched by the fallback
    assert(snap.count() === 2000L)
    assert(snap.filter(col("doc_id").isin(10L, 20L, 30L, 40L, 50L))
      .select("n").collect().map(_.getLong(0)).toSet ===
      Set(-10L, -20L, -30L, -40L, -50L))

    // under the default cap the SAME shape carries files again
    val fresh2 = Seq((10L, 100L)).toDF("doc_id", "n")
    val b2 = after
    SnapshotStore.upsert(spark, fresh2, fresh2.select("doc_id"),
      root, buckets = 2)
    val a2 = SnapshotStore.read(spark, root).inputFiles.toSet
    assert(b2.intersect(a2).size >= b2.size - 4,
      "key pruning did not resume under the cap")
  }
}
