package graft

import org.apache.spark.sql.functions._

import graft.operators.{IvfIndex, PqIndex, SnapshotStore, VersionedIvfAdc}

/** The SnapshotStore-routed IVFADC (round-11 verdict item 7): the
  * compressed cascade's FOUR bare artifacts (IVF cells, IVF centroid
  * sidecar, PQ codes, PQ codebook) collapse into one manifest — rows =
  * (doc_id, cent_id, codes[m]), both quantizers as manifest lines — so
  * maintenance is atomic, OCC-serialized, and time-travelable. */
class VersionedIvfAdcSpec extends SparkTestBase {

  private val Dim = 4
  private val M = 2
  private val K = 4
  private val Cells = 4

  private def cleanup(path: String): Unit = {
    val f = new java.io.File(path)
    if (f.exists()) {
      import scala.reflect.io.Directory
      new Directory(f).deleteRecursively(): Unit
    }
  }

  /** Deterministic 60-vector corpus in 4 dims (the VersionedIvfSpec
    * shape): skewed cells, first-K ids present so quantizer seeds are
    * stable across subset builds. */
  private def corpus = {
    val sp = spark
    import sp.implicits._
    (0L until 60L).map { i =>
      val base = if (i < 40) 0L else i * 100L
      (i, Array(base + i, base + 2 * i, 1000000L - i, i % 7)
        .map(_.toFloat / 1e3f))
    }.toDF("vec_id", "embedding")
  }

  private def results(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.orderBy("q_id", "rank").collect()
      .map(r => s"${r.get(0)}|${r.get(1)}|${r.get(2)}|${r.get(3)}").toSeq

  test("versioned cascade ≡ bare searchIvfIndexed; delete tracks the " +
      "bare layout; upsert of new ids ≡ a fresh full build; history " +
      "time-travels") {
    val root = "target/vadc-basic"
    val bare = "target/vadc-bare"
    cleanup(root); cleanup(bare)
    val emb = corpus
    val queries = emb.filter(col("vec_id") < 5)
    val base = emb.filter(col("vec_id") < 50)

    VersionedIvfAdc.write(base, root, dim = Dim, m = M, k = K,
      nCells = Cells)
    IvfIndex.writeIndex(base, k = Cells, s"$bare/ivf")
    PqIndex.writeIndex(base, s"$bare/pq", dim = Dim, m = M, k = K)
    val v1 = SnapshotStore.currentVersion(spark, root).get
    val r1 = results(VersionedIvfAdc.search(spark, root, queries,
      nProbe = 2, topK = 3))
    assert(r1 === results(PqIndex.searchIvfIndexed(spark, s"$bare/ivf",
      s"$bare/pq", queries, dim = Dim, m = M, nProbe = 2, topK = 3)))
    // full probe too (the one-snapshot-read path)
    assert(results(VersionedIvfAdc.search(spark, root, queries,
      nProbe = Cells, topK = 3)) ===
      results(PqIndex.searchIvfIndexed(spark, s"$bare/ivf", s"$bare/pq",
        queries, dim = Dim, m = M, nProbe = Cells, topK = 3)))

    // delete: candidates vanish atomically (the bare analog deletes
    // from the IVF candidate tier)
    val sp = spark
    import sp.implicits._
    VersionedIvfAdc.delete(spark, root, Seq(40L, 41L).toDF("vec_id"))
    IvfIndex.deleteFromIndex(spark, s"$bare/ivf",
      Seq(40L, 41L).toDF("vec_id"))
    val r2 = results(VersionedIvfAdc.search(spark, root, queries,
      nProbe = Cells, topK = 3))
    assert(r2 === results(PqIndex.searchIvfIndexed(spark, s"$bare/ivf",
      s"$bare/pq", queries, dim = Dim, m = M, nProbe = Cells, topK = 3)))

    // upsert restores the deleted ids and appends 50..59; because the
    // quantizer seeds (first K ids) are in `base`, the maintained index
    // must equal a FRESH full-corpus build exactly
    VersionedIvfAdc.upsert(spark, root,
      emb.filter(col("vec_id") >= 40))
    val fresh = "target/vadc-fresh"
    cleanup(fresh)
    VersionedIvfAdc.write(emb, fresh, dim = Dim, m = M, k = K,
      nCells = Cells)
    val r3 = results(VersionedIvfAdc.search(spark, root, queries,
      nProbe = Cells, topK = 3))
    assert(r3 === results(VersionedIvfAdc.search(spark, fresh, queries,
      nProbe = Cells, topK = 3)))
    assert(SnapshotStore.read(spark, root).groupBy("doc_id").count()
      .filter(col("count") > 1).count() === 0L)

    // time travel: the original version still serves the original index
    assert(results(VersionedIvfAdc.search(spark, root, queries,
      nProbe = 2, topK = 3, version = v1)) === r1)
    // geometry never moved across three verbs
    val (d, m, k) = VersionedIvfAdc.storedGeometry(spark, root)
    assert((d, m, k) === ((Dim, M, K)))
    assert(VersionedIvfAdc.storedCoarse(spark, root).map(_._1).toSeq ===
      VersionedIvfAdc.storedCoarse(spark, root, v1).map(_._1).toSeq)
  }

  test("a crash inside a verb publishes NOTHING — quantizers and codes " +
      "can never tear; retry heals") {
    val root = "target/vadc-crash"
    cleanup(root)
    val emb = corpus
    val queries = emb.filter(col("vec_id") < 5)
    VersionedIvfAdc.write(emb, root, dim = Dim, m = M, k = K,
      nCells = Cells)
    val v1 = SnapshotStore.currentVersion(spark, root).get
    val before = results(VersionedIvfAdc.search(spark, root, queries,
      nProbe = 2, topK = 3))
    val sp = spark
    import sp.implicits._
    SnapshotStore.FaultInjection.arm { p =>
      if (p == "manifest-tmp-written")
        throw new RuntimeException("injected crash: " + p)
    }
    try {
      intercept[RuntimeException] {
        VersionedIvfAdc.delete(spark, root, Seq(7L).toDF("vec_id"))
      }
      intercept[RuntimeException] {
        VersionedIvfAdc.upsert(spark, root,
          emb.filter(col("vec_id") === 7L))
      }
    } finally SnapshotStore.FaultInjection.disarm()
    assert(SnapshotStore.currentVersion(spark, root).get === v1)
    assert(results(VersionedIvfAdc.search(spark, root, queries,
      nProbe = 2, topK = 3)) === before)
    // retry heals atomically
    VersionedIvfAdc.delete(spark, root, Seq(7L).toDF("vec_id"))
    val after = VersionedIvfAdc.search(spark, root, queries,
      nProbe = Cells, topK = 3)
    assert(after.filter(col("vec_id") === 7L).count() === 0L)
    assert(after.count() === queries.count() * 3)
  }
}
