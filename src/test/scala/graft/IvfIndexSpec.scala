package graft

import org.apache.spark.sql.functions._

import graft.operators.IvfIndex

/** The stored-index IVF path: writeIndex partitions the index at rest BY
  * cent_id; searchIndexed must (a) return exactly what the in-memory
  * search() returns for the same parameters, and (b) read the index with
  * a `cent_id IN (...)` PARTITION filter — the partition-pruned probe is
  * the whole point of the at-rest layout (only probed cells' files open,
  * never the full index). */
class IvfIndexSpec extends SparkTestBase {

  private val indexPath = "target/ivf-index-spec"

  private def cleanup(): Unit = {
    val f = new java.io.File(indexPath)
    if (f.exists()) {
      import scala.reflect.io.Directory
      new Directory(f).deleteRecursively()
    }
  }

  test("searchIndexed over a written index equals in-memory search") {
    cleanup()
    val emb = Tables.embeddings(spark, sf0001)
    IvfIndex.writeIndex(emb, k = 16, indexPath)

    val live = IvfIndex
      .search(emb, col("vec_id") < 5, k = 16, nProbe = 2, topK = 3)
      .orderBy("q_id", "rank")
      .collect().map(_.toSeq).toSeq
    val stored = IvfIndex
      .searchIndexed(spark, indexPath,
        emb.filter(col("vec_id") < 5).select("vec_id", "embedding"),
        nProbe = 2, topK = 3)
      .orderBy("q_id", "rank")
      .collect().map(_.toSeq).toSeq

    assert(stored.nonEmpty, "stored-index search returned no rows")
    assert(stored === live)
  }

  test("stored SQ8 index: full-probe search ≡ symmetric-int8 brute force") {
    import graft.functions.VectorFunctions
    val dir = "target/ivf-sq-spec"
    val f = new java.io.File(dir)
    if (f.exists()) { import scala.reflect.io.Directory
      new Directory(f).deleteRecursively(): Unit }
    val emb = Tables.embeddings(spark, sf0001)
    IvfIndex.writeIndexSq(emb, k = 16, dir)
    // nProbe = k probes every cell ⇒ the stored compressed tier must
    // reproduce the exhaustive symmetric-int8 ranking exactly
    val got = IvfIndex.searchIndexedSq(spark, dir,
      emb.filter(col("vec_id") < 3).select("vec_id", "embedding"),
      nProbe = 16, topK = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).toSet
    val e8 = emb.select(col("vec_id"),
      VectorFunctions.quantizeInt8(col("embedding"))
        .cast("array<double>").as("q8"))
    val q = e8.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("q8").as("q_q8"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("q_id")
      .orderBy(col("sim").desc, col("vec_id"))
    val brute = e8.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(VectorFunctions.cosine(col("q8"), col("q_q8")), 6).as("sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .collect().map(r => (r.getLong(0), r.getInt(3), r.getLong(1),
        r.getDouble(2))).toSet
    assert(got.nonEmpty && got === brute)
    // the stored rows carry int8-range codes, not floats
    val stored = spark.read.parquet(s"$dir/index")
    val mx = stored
      .select(max(array_max(transform(col("q8"), x => abs(x)))))
      .collect()(0)
    assert(mx.getLong(0) <= 127L)
  }

  test("deleteFromIndex preserves the SQ8 tier's own payload columns") {
    val dir = "target/ivf-sq-del-spec"
    val f = new java.io.File(dir)
    if (f.exists()) { import scala.reflect.io.Directory
      new Directory(f).deleteRecursively(): Unit }
    val emb = Tables.embeddings(spark, sf0001)
    IvfIndex.writeIndexSq(emb, k = 16, dir)
    val before = spark.read.parquet(s"$dir/index")
    val cols = before.columns.sorted.toSeq
    val n = before.count()
    IvfIndex.deleteFromIndex(spark, dir,
      emb.filter(col("vec_id") % 10 === 3).select("vec_id"))
    val after = spark.read.parquet(s"$dir/index")
    // schema survives (q8 codes, not the flat tier's embedding column)
    assert(after.columns.sorted.toSeq === cols)
    assert(cols.contains("q8"))
    val nDel = emb.filter(col("vec_id") % 10 === 3).count()
    assert(after.count() === n - nDel)
    // the compressed tier still searches after the delete
    assert(IvfIndex.searchIndexedSq(spark, dir,
      emb.filter(col("vec_id") < 3).select("vec_id", "embedding"),
      nProbe = 16, topK = 5).count() === 15L)
  }

  test("appendToIndex equals a fresh rebuild with the same centroids") {
    cleanup()
    val emb = Tables.embeddings(spark, sf0001)
    val cents = IvfIndex.centroids(emb, 16)
    // build from the even half, append the odd half incrementally
    IvfIndex.writeIndexWith(emb.filter(col("vec_id") % 2 === 0), cents,
      indexPath)
    IvfIndex.appendToIndex(spark, indexPath,
      emb.filter(col("vec_id") % 2 === 1))

    val queries = emb.filter(col("vec_id") < 5)
      .select("vec_id", "embedding")
    val incremental = IvfIndex
      .searchIndexed(spark, indexPath, queries, nProbe = 2, topK = 3)
      .orderBy("q_id", "rank").collect().map(_.toSeq).toSeq

    val rebuiltPath = indexPath + "-rebuilt"
    val f = new java.io.File(rebuiltPath)
    if (f.exists()) { import scala.reflect.io.Directory
      new Directory(f).deleteRecursively() }
    IvfIndex.writeIndexWith(emb, cents, rebuiltPath)
    val rebuilt = IvfIndex
      .searchIndexed(spark, rebuiltPath, queries, nProbe = 2, topK = 3)
      .orderBy("q_id", "rank").collect().map(_.toSeq).toSeq

    assert(incremental.nonEmpty)
    assert(incremental === rebuilt)
  }

  test("upsertIndexed replaces re-embedded vectors, even across cells") {
    cleanup()
    val emb = Tables.embeddings(spark, sf0001)
    val cents = IvfIndex.centroids(emb, 16)
    IvfIndex.writeIndexWith(emb, cents, indexPath)

    // re-embed vectors 40-44 with vector 7's embedding: same ids, new
    // values — their home cells can change, old rows must vanish
    val donor = emb.filter(col("vec_id") === 7)
      .select(col("embedding").as("donor")).limit(1)
    val mutated = emb.filter(col("vec_id").between(40, 44))
      .crossJoin(broadcast(donor))
      .select(col("vec_id"), col("donor").as("embedding"))
    IvfIndex.upsertIndexed(spark, indexPath, mutated)

    val stored = spark.read.parquet(s"$indexPath/index")
    // no duplicate ids, corpus size unchanged
    assert(stored.count() === emb.count())
    assert(stored.select("vec_id").distinct().count() === emb.count())

    // equals a fresh rebuild of the mutated corpus with the same cents
    val current = emb.filter(!col("vec_id").between(40, 44))
      .select("vec_id", "embedding")
      .unionByName(mutated)
    val rebuiltPath = indexPath + "-rebuilt2"
    val f = new java.io.File(rebuiltPath)
    if (f.exists()) { import scala.reflect.io.Directory
      new Directory(f).deleteRecursively() }
    IvfIndex.writeIndexWith(current, cents, rebuiltPath)
    val got = stored.select("vec_id", "cent_id")
      .withColumn("cent_id", col("cent_id").cast("long"))
      .orderBy("vec_id").collect().map(_.toSeq).toSeq
    val want = spark.read.parquet(s"$rebuiltPath/index")
      .select("vec_id", "cent_id")
      .withColumn("cent_id", col("cent_id").cast("long"))
      .orderBy("vec_id").collect().map(_.toSeq).toSeq
    assert(got === want)
  }

  test("deleteFromIndex removes exactly the given ids; an emptied cell " +
      "leaves no stale partition; absent ids are a no-op") {
    cleanup()
    val emb = Tables.embeddings(spark, sf0001)
    val cents = IvfIndex.centroids(emb, 16)
    IvfIndex.writeIndexWith(emb, cents, indexPath)
    val before = spark.read.parquet(s"$indexPath/index").count()

    // pick one whole cell to empty out, plus a scattered handful
    val assign = IvfIndex.cellRanksWith(emb, cents)
      .filter(col("rk") === 1).select("vec_id", "cent_id")
    val victimCell = assign.groupBy("cent_id")
      .agg(count(lit(1)).as("n")).orderBy("n", "cent_id")
      .limit(1).collect().head.getLong(0)
    val doomed = assign.filter(col("cent_id") === victimCell)
      .select("vec_id")
      .union(emb.filter(col("vec_id").between(100, 104))
        .select("vec_id"))
      .distinct()
    val nDoomed = doomed.count()
    IvfIndex.deleteFromIndex(spark, indexPath, doomed)

    val after = spark.read.parquet(s"$indexPath/index")
    assert(after.count() === before - nDoomed)
    assert(after.join(doomed, Seq("vec_id"), "left_semi").count() === 0L)
    // the emptied cell's partition dir is gone, not a stale leftover
    assert(!new java.io.File(
      s"$indexPath/index/cent_id=$victimCell").exists())
    // surviving cells still answer searches (full probe = brute force
    // over survivors)
    val q = emb.filter(col("vec_id") < 3).select("vec_id", "embedding")
    assert(IvfIndex.searchIndexed(spark, indexPath, q,
      nProbe = 16, topK = 3).count() === 9L)
    // deleting ids that are not in the index changes nothing
    import spark.implicits._
    IvfIndex.deleteFromIndex(spark, indexPath,
      Seq(999999L, 999998L).toDF("vec_id"))
    assert(spark.read.parquet(s"$indexPath/index").count() ===
      before - nDoomed)
  }

  test("rebalance splits hot cells, bounds the max cell, and leaves " +
      "full-probe search ≡ the pre-rebalance brute-force results") {
    cleanup()
    val emb = Tables.embeddings(spark, sf0001)
    // k = 4 seeded centroids over the fixture corpus are naturally
    // skewed (seeds are the 4 lowest vec_ids, not spread)
    IvfIndex.writeIndex(emb, k = 4, indexPath)
    def cellCounts() = spark.read.parquet(s"$indexPath/index")
      .groupBy(col("cent_id").cast("long").as("cent_id"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val before = cellCounts()
    val maxBefore = before.values.max
    val total = before.values.sum
    // full-probe truth BEFORE the rebalance: layout-independent
    val want = IvfIndex.searchIndexed(spark, indexPath,
        emb.filter(col("vec_id") < 5).select("vec_id", "embedding"),
        nProbe = 4, topK = 3)
      .orderBy("q_id", "rank").collect().map(_.toSeq).toSeq

    val split = IvfIndex.rebalance(spark, indexPath, hotFactor = 1.0)
    assert(split >= 1, s"no cell exceeded mean population? $before")
    val after = cellCounts()
    assert(after.size === before.size + split)
    assert(after.values.sum === total, "rebalance lost or duplicated rows")
    assert(after.values.max < maxBefore,
      s"hottest cell did not shrink: ${after.values.max} vs $maxBefore")
    // the centroid sidecar and the partition layout agree
    val centIds = spark.read.parquet(s"$indexPath/centroids")
      .select("cent_id").collect().map(_.getLong(0)).toSet
    assert(after.keySet.subsetOf(centIds),
      "partition holds a cell the centroid table cannot rank")
    // full-probe search is STILL exactly brute force — no row lost to a
    // mis-assigned sub-cell, none double-counted
    val got = IvfIndex.searchIndexed(spark, indexPath,
        emb.filter(col("vec_id") < 5).select("vec_id", "embedding"),
        nProbe = 64, topK = 3)
      .orderBy("q_id", "rank").collect().map(_.toSeq).toSeq
    assert(got === want)
    // idempotence-ish: a second pass either splits further or no-ops,
    // but never corrupts (row count conserved)
    IvfIndex.rebalance(spark, indexPath, hotFactor = 2.0)
    assert(cellCounts().values.sum === total)
    // SQ8 layouts are refused by name (codes carry no geometry)
    val sqPath = s"$indexPath-sq"
    val f2 = new java.io.File(sqPath)
    if (f2.exists()) { import scala.reflect.io.Directory
      new Directory(f2).deleteRecursively() }
    IvfIndex.writeIndexSq(emb, k = 4, sqPath)
    val e = intercept[IllegalArgumentException] {
      IvfIndex.rebalance(spark, sqPath)
    }
    assert(e.getMessage.contains("flat"))
  }

  test("rebalanceUntil levels a 10x-hot cell one binary split per round " +
      "cannot, conserving rows and full-probe results") {
    val dir = "target/ivf-rebalance-until-spec"
    val f = new java.io.File(dir)
    if (f.exists()) { import scala.reflect.io.Directory
      new Directory(f).deleteRecursively(): Unit }
    import spark.implicits._
    // 10 well-separated clusters: cluster 0 holds 640 vectors (≈8× the
    // mean), clusters 1-9 hold 20 each — a skew one binary split cannot
    // level (640 → ~320+320, both still >2× the new mean). Jitter is
    // deterministic so the layout reproduces bit-for-bit.
    val rows = (0 until 10).flatMap { j =>
      val n = if (j == 0) 640 else 20
      (0 until n).map { i =>
        val em = Array.tabulate(4)(d =>
          (j * 10 + (((i * 31 + d * 17) % 101) - 50) / 100.0).toFloat)
        (j * 1000L + i, em.toSeq)
      }
    }
    val emb = rows.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>")
        .as("embedding"))
    val cents = (0 until 10).map(j =>
      (j.toLong, Array.tabulate(4)(_ => j * 10000000L))).toArray
    IvfIndex.writeIndexWith(emb, cents, dir)
    def cellCounts() = spark.read.parquet(s"$dir/index")
      .groupBy(col("cent_id").cast("long").as("cent_id"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val total = cellCounts().values.sum
    val want = IvfIndex.searchIndexed(spark, dir,
        emb.filter(col("vec_id") < 3).select("vec_id", "embedding"),
        nProbe = 10, topK = 3)
      .orderBy("q_id", "rank").collect().map(_.toSeq).toSeq
    def isLeveled(c: Map[Long, Long]) = {
      val mean = c.values.sum.toDouble / c.size
      c.values.max <= 2.0 * mean
    }
    val totalSplits = IvfIndex.rebalanceUntil(spark, dir,
      hotFactor = 2.0, maxRounds = 8)
    // one split of the 640-cell cannot reach ≤2× mean, so convergence
    // genuinely needed >1 round
    assert(totalSplits >= 2, s"expected a multi-round split cascade, " +
      s"got $totalSplits total splits")
    val after = cellCounts()
    assert(after.values.sum === total, "rebalanceUntil lost/duped rows")
    assert(isLeveled(after),
      s"still a >2x-mean cell after rebalanceUntil: $after")
    // every published centroid backs a partition and vice versa — the
    // survivors-before-centroid-write rule means no empty ranking slots
    val centIds = spark.read.parquet(s"$dir/centroids")
      .select("cent_id").collect().map(_.getLong(0)).toSet
    assert(after.keySet === centIds,
      "centroid sidecar and partition layout diverged")
    val got = IvfIndex.searchIndexed(spark, dir,
        emb.filter(col("vec_id") < 3).select("vec_id", "embedding"),
        nProbe = 64, topK = 3)
      .orderBy("q_id", "rank").collect().map(_.toSeq).toSeq
    assert(got === want)
  }

  test("search rejects a queryFilter over rank-side columns with a named error") {
    val emb = Tables.embeddings(spark, sf0001)
    val err = intercept[IllegalArgumentException] {
      IvfIndex.search(emb, col("rk") === 1, k = 16, nProbe = 2, topK = 3)
    }
    assert(err.getMessage.contains("rk"))
    assert(err.getMessage.contains("embeddings columns"))
    // embeddings-column filters still pass through unchanged
    assert(IvfIndex.search(emb, col("vec_id") < 2, 16, 2, 3).count() > 0)
  }

  test("metadata columns are valid queryFilters, not just vec_id/embedding") {
    // the guard's contract says ANY embeddings column selects queries —
    // label must work end to end (it rides through the cell ranking)
    val emb = Tables.embeddings(spark, sf0001)
    val byLabel = IvfIndex.search(emb,
      col("label") === 2 && col("vec_id") < 30, k = 16, nProbe = 2, topK = 3)
    val expectedQueries = emb
      .filter(col("label") === 2 && col("vec_id") < 30)
      .count()
    assert(byLabel.select("q_id").distinct().count() === expectedQueries)
  }

  test("Lloyd training lowers distortion, stays deterministic, and searches") {
    val emb = Tables.embeddings(spark, sf0001)
    val seeded = IvfIndex.centroids(emb, 16)
    val trained = IvfIndex.trainCentroids(emb, 16, iters = 3)
    val d0 = IvfIndex.distortion(emb, seeded)
    val d1 = IvfIndex.distortion(emb, trained)
    assert(d1 < d0, s"training did not lower distortion: $d0 -> $d1")
    // deterministic: re-training yields byte-identical centroids
    val again = IvfIndex.trainCentroids(emb, 16, iters = 3)
    assert(trained.map(_._2.toSeq).toSeq === again.map(_._2.toSeq).toSeq)
    // the trained layout serves queries through the same ranking path
    val ranks = IvfIndex.cellRanksWith(emb, trained)
    assert(ranks.filter(col("rk") === 1).count() === emb.count())
  }

  test("bounded-sample Lloyd training: deterministic, full-sample " +
      "equivalence, and a usable trained layout") {
    val emb = Tables.embeddings(spark, sf0001)
    val n = emb.count()
    // sample >= corpus: the band filter must be the identity
    val full = IvfIndex.trainCentroids(emb, 16, iters = 2)
    val capped = IvfIndex.trainCentroids(emb, 16, iters = 2,
      trainSample = n)
    assert(full.map(_._2.toSeq).toSeq === capped.map(_._2.toSeq).toSeq)
    // a genuine sub-sample: deterministic across calls, k cells, right
    // dim, and the trained geometry still serves every vector through
    // the assignment path
    val sampled = IvfIndex.trainCentroids(emb, 16, iters = 2,
      trainSample = n / 3)
    val again = IvfIndex.trainCentroids(emb, 16, iters = 2,
      trainSample = n / 3)
    assert(sampled.map(_._2.toSeq).toSeq === again.map(_._2.toSeq).toSeq)
    assert(sampled.length === 16)
    assert(sampled.forall(_._2.length === full.head._2.length))
    assert(IvfIndex.cellAssign(emb, sampled).count() === n)
    // sampled training still beats raw seeds on the FULL corpus for
    // this fixture (not a theorem - pinned as a quality regression
    // guard on the deterministic fixture)
    val d0 = IvfIndex.distortion(emb, IvfIndex.centroids(emb, 16))
    val dS = IvfIndex.distortion(emb, sampled)
    assert(dS < d0, s"sampled training did not help: $d0 -> $dS")
  }

  test("searchIndexed prunes the index scan to the probed cells") {
    // (depends on the index written by the previous test; rewrite if absent)
    if (!new java.io.File(s"$indexPath/index").exists()) {
      IvfIndex.writeIndex(Tables.embeddings(spark, sf0001), 16, indexPath)
    }
    val stored = IvfIndex.searchIndexed(spark, indexPath,
      Tables.embeddings(spark, sf0001)
        .filter(col("vec_id") < 5).select("vec_id", "embedding"),
      nProbe = 2, topK = 3)
    val plan = stored.queryExecution.executedPlan.toString
    // the index scan must carry a non-empty PartitionFilters on cent_id —
    // partition pruning, not a post-scan filter over the whole index
    val scanLine = plan.linesIterator
      .find(l => l.contains("ivf-index-spec/index") ||
        (l.contains("PartitionFilters") && l.contains("cent_id")))
    assert(scanLine.isDefined, s"no pruned scan of the stored index:\n$plan")
    assert(plan.contains("PartitionFilters: [cent_id#") ||
      plan.matches("(?s).*PartitionFilters: \\[.*cent_id.*"),
      s"cent_id IN (...) did not become a partition filter:\n$plan")
  }

  test("filtered search returns only matching corpus rows, at full topK") {
    val emb = Tables.embeddings(spark, sf0001)
    val res = IvfIndex.searchFiltered(emb,
      queryFilter = col("vec_id") < 5,
      corpusFilter = col("label").isin(1, 2, 3),
      k = 16, nProbe = 2, topK = 3)
    // every neighbour satisfies the metadata predicate
    val offLabel = res.join(emb.select(col("vec_id"), col("label")), "vec_id")
      .filter(!col("label").isin(1, 2, 3)).count()
    assert(offLabel === 0)
    // PRE-filtering keeps the top-k full: each query still gets 3
    // neighbours (post-filtering the unfiltered top-3 would starve —
    // only ~30% of its survivors carry these labels)
    val perQuery = res.groupBy("q_id").count().collect()
    assert(perQuery.length === 5 && perQuery.forall(_.getLong(1) === 3L),
      perQuery.mkString(", "))
    // and post-filtering WOULD have starved at least one query, so the
    // test distinguishes the two semantics rather than passing for both
    val postFiltered = IvfIndex.search(emb, col("vec_id") < 5,
        k = 16, nProbe = 2, topK = 3)
      .join(emb.select(col("vec_id"), col("label")), "vec_id")
      .filter(col("label").isin(1, 2, 3))
    assert(postFiltered.count() < 15, "fixture no longer discriminates " +
      "pre- from post-filtering; pick a rarer label set")
  }

  test("searchFiltered rejects a corpusFilter over non-embedding columns") {
    val e = intercept[IllegalArgumentException] {
      IvfIndex.searchFiltered(Tables.embeddings(spark, sf0001),
        queryFilter = col("vec_id") < 5,
        corpusFilter = col("cent_id") === 1,
        k = 16, nProbe = 2, topK = 3)
    }
    assert(e.getMessage.contains("corpusFilter"))
  }

  test("wrong-dim vectors against a stored index raise a named error") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf0001)
    val path = java.nio.file.Files.createTempDirectory("graft_ivf_dim")
      .toString
    IvfIndex.writeIndex(emb, k = 16, path)
    val short = Seq((900001L, Seq.fill(8)(0.5))).toDF("vec_id", "embedding")
    for (op <- Seq(
        () => IvfIndex.appendToIndex(spark, path, short),
        () => IvfIndex.upsertIndexed(spark, path, short),
        () => IvfIndex.searchIndexed(spark, path, short, nProbe = 2,
          topK = 3).collect(): Unit)) {
      val e = intercept[IllegalArgumentException](op())
      assert(e.getMessage.contains("dim 8..8") &&
        e.getMessage.contains("centroid dim 64"), e.getMessage)
    }
  }
}
