package graft

import org.apache.spark.sql.functions._

import graft.operators.{IvfIndex, SnapshotStore, VersionedIvf}

/** The SnapshotStore-routed IVF layout (round-10 verdict item 4): every
  * maintenance verb is ONE atomic manifest publish carrying BOTH the
  * vector rows and the `#ivfcent` centroid geometry, so the bare
  * layout's documented crash window (centroid sidecar and cell
  * partitions written separately) cannot exist, and the whole index
  * time-travels. */
class VersionedIvfSpec extends SparkTestBase {

  private def cleanup(path: String): Unit = {
    val f = new java.io.File(path)
    if (f.exists()) {
      import scala.reflect.io.Directory
      new Directory(f).deleteRecursively(): Unit
    }
  }

  /** Deterministic small corpus: 60 vectors in 4 dims, skewed so
    * rebalance always has a hot cell (ids cluster near the low-id
    * seeds). */
  private def corpus = {
    val sp = spark
    import sp.implicits._
    (0L until 60L).map { i =>
      val base = if (i < 40) 0L else i * 100L // 2/3 of rows hug seed 0
      (i, Array(base + i, base + 2 * i, 1000000L - i, i % 7).map(_.toFloat / 1e3f))
    }.toDF("vec_id", "embedding")
  }

  private def results(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.orderBy("q_id", "rank").collect()
      .map(r => s"${r.get(0)}|${r.get(1)}|${r.get(2)}|${r.get(3)}").toSeq

  test("versioned index ≡ bare searchIndexed; delete + rebalance stay " +
      "exact; history time-travels") {
    val root = "target/vivf-basic"
    val bare = "target/vivf-bare"
    cleanup(root); cleanup(bare)
    val emb = corpus
    val queries = emb.filter(col("vec_id") < 5)

    VersionedIvf.write(emb, k = 4, root)
    IvfIndex.writeIndex(emb, k = 4, bare)
    // full probe: versioned search ≡ bare stored search, both ≡ truth
    val v1 = results(VersionedIvf.search(spark, root, queries,
      nProbe = 4, topK = 3))
    assert(v1 === results(IvfIndex.searchIndexed(spark, bare, queries,
      nProbe = 4, topK = 3)))
    // narrow probe too (exercises the per-cell readWhere path)
    assert(results(VersionedIvf.search(spark, root, queries,
      nProbe = 1, topK = 3)) ===
      results(IvfIndex.searchIndexed(spark, bare, queries,
        nProbe = 1, topK = 3)))

    // delete: rows vanish atomically, geometry carried
    val sp = spark
    import sp.implicits._
    VersionedIvf.delete(spark, root, Seq(50L, 51L).toDF("vec_id"))
    IvfIndex.deleteFromIndex(spark, bare, Seq(50L, 51L).toDF("vec_id"))
    val v2 = results(VersionedIvf.search(spark, root, queries,
      nProbe = 4, topK = 3))
    assert(v2 === results(IvfIndex.searchIndexed(spark, bare, queries,
      nProbe = 4, topK = 3)))

    // rebalance: same deterministic split plan as the bare layout →
    // same geometry, same full-probe results
    val splitV = VersionedIvf.rebalance(spark, root, hotFactor = 1.0)
    val splitB = IvfIndex.rebalance(spark, bare, hotFactor = 1.0)
    assert(splitV === splitB)
    assert(splitV >= 1, "corpus not skewed enough to split — spec inert")
    val centsV = VersionedIvf.storedCentroids(spark, root)
      .map { case (i, q) => (i, q.toSeq) }.toSeq.sortBy(_._1)
    val centsB = spark.read.parquet(s"$bare/centroids").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1))).toSeq.sortBy(_._1)
    assert(centsV === centsB)
    val nCells = centsV.size
    val v3 = results(VersionedIvf.search(spark, root, queries,
      nProbe = nCells, topK = 3))
    assert(v3 === results(IvfIndex.searchIndexed(spark, bare, queries,
      nProbe = nCells, topK = 3)))
    // rebalance moves rows between cells, never in/out: full-probe
    // results unchanged from the post-delete state
    assert(v3 === v2)

    // time travel: the pre-delete version still serves the old results
    // with the OLD geometry (version 1 = initial commit)
    assert(results(VersionedIvf.search(spark, root, queries,
      nProbe = 4, topK = 3, version = 1L)) === v1)
  }

  test("a crash inside delete/rebalance publishes NOTHING: geometry and " +
      "rows stay the old version's, search is unchanged, retry succeeds") {
    val root = "target/vivf-crash"
    cleanup(root)
    val emb = corpus
    val queries = emb.filter(col("vec_id") < 5)
    VersionedIvf.write(emb, k = 4, root)
    val before = results(VersionedIvf.search(spark, root, queries,
      nProbe = 4, topK = 3))
    val v1 = SnapshotStore.currentVersion(spark, root).get
    val sp = spark
    import sp.implicits._

    // kill the writer right before the manifest create-exclusive: data
    // files exist as unreferenced garbage, the version does not
    SnapshotStore.FaultInjection.arm { p =>
      if (p == "manifest-tmp-written")
        throw new RuntimeException("injected crash: " + p)
    }
    try {
      intercept[RuntimeException] {
        VersionedIvf.delete(spark, root, Seq(10L).toDF("vec_id"))
      }
      intercept[RuntimeException] {
        VersionedIvf.rebalance(spark, root, hotFactor = 1.0)
      }
    } finally SnapshotStore.FaultInjection.disarm()
    // nothing published: same head version, same geometry, same results
    assert(SnapshotStore.currentVersion(spark, root).get === v1)
    assert(results(VersionedIvf.search(spark, root, queries,
      nProbe = 4, topK = 3)) === before)
    assert(VersionedIvf.storedCentroids(spark, root).length === 4)

    // retry heals: the replayed verbs land atomically
    VersionedIvf.delete(spark, root, Seq(10L).toDF("vec_id"))
    assert(VersionedIvf.rebalance(spark, root, hotFactor = 1.0) >= 1)
    val after = VersionedIvf.search(spark, root, queries,
      nProbe = VersionedIvf.storedCentroids(spark, root).length, topK = 3)
    assert(after.filter(col("vec_id") === 10L).count() === 0L)
    assert(after.count() === queries.count() * 3)
  }
}
