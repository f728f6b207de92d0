package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.SnapshotStore

/** File-level column statistics + data skipping (`declareStats` /
  * `readWhere` / `skippingReport`): envelope maintenance across every
  * publish, conservative pruning, exactness of the residual filter, and
  * the optimize(maxRecordsPerFile) clustering that makes pruning bite. */
class SnapshotStatsSpec extends SparkTestBase {

  private def cleanup(path: String): Unit = {
    val f = new java.io.File(path)
    if (f.exists()) {
      import scala.reflect.io.Directory
      new Directory(f).deleteRecursively()
    }
  }

  /** 1000 docs; `n` walks 0..999 (uncorrelated with doc_id's hash
    * buckets), `score` is n/10.0, every 7th `score` NULL. */
  private def frame(): DataFrame = {
    val sp = spark
    import sp.implicits._
    (0L until 1000L).map { i =>
      (i, i, if (i % 7 == 0) None else Some(i / 10.0))
    }.toDF("doc_id", "n", "score")
  }

  private def sortedRows(df: DataFrame): Seq[Seq[Any]] =
    df.select("doc_id", "n", "score").collect().map(_.toSeq).toSeq
      .sortBy(_.head.asInstanceOf[Long])

  test("declare + optimize(maxRecordsPerFile) → pruned range read is " +
      "exact and actually skips files") {
    val root = "target/snapstats-basic"
    cleanup(root)
    SnapshotStore.commit(frame(), root, buckets = 4)
    SnapshotStore.declareStats(spark, root, Seq("n", "score"))
    assert(SnapshotStore.storedStatCols(spark, root,
      SnapshotStore.currentVersion(spark, root).get) === Seq("n", "score"))
    // cluster by n and split each bucket's sorted run into small files
    SnapshotStore.optimize(spark, root, sortByDocId = false,
      zorderBy = Seq("n"), maxRecordsPerFile = 64L)
    val (kept, total) = SnapshotStore.skippingReport(spark, root,
      "n", 100L, 150L)
    assert(total >= 12, s"expected many small files, got $total")
    // 51 of 1000 values in range; clustered files cover ~64 values each
    assert(kept < total / 2,
      s"pruning did not bite: kept $kept of $total files")
    val pruned = SnapshotStore.readWhere(spark, root, "n", 100L, 150L)
    // the physical scan surface IS the kept set — not just the report
    assert(pruned.inputFiles.length === kept)
    assert(SnapshotStore.read(spark, root).inputFiles.length === total)
    val got = sortedRows(pruned)
    val want = sortedRows(SnapshotStore.read(spark, root)
      .filter(col("n") >= 100 && col("n") <= 150))
    assert(got === want)
    assert(got.size === 51)
  }

  test("readWhereIn: point-set read prunes to the admitting files in ONE " +
      "metadata pass, exact vs an isin filter over the full read") {
    val root = "target/snapstats-wherein"
    cleanup(root)
    SnapshotStore.commit(frame(), root, buckets = 4)
    SnapshotStore.declareStats(spark, root, Seq("n"))
    SnapshotStore.optimize(spark, root, sortByDocId = false,
      zorderBy = Seq("n"), maxRecordsPerFile = 64L)
    val probes: Seq[Any] = Seq(3L, 500L, 997L)
    val got = SnapshotStore.readWhereIn(spark, root, "n", probes)
    val total = SnapshotStore.read(spark, root).inputFiles.length
    // n interleaves across the 4 hash buckets, so each bucket's sorted
    // files span ~256 n-values: each probe admits ≤ 1 file per bucket
    // (boundary slack aside) — ≤ 3 × 4 kept, never the whole store
    assert(got.inputFiles.length <= 12 && got.inputFiles.length < total,
      s"point-set pruning did not bite: ${got.inputFiles.length} of $total")
    val want = sortedRows(SnapshotStore.read(spark, root)
      .filter(col("n").isin(probes: _*)))
    assert(sortedRows(got) === want)
    assert(got.count() === 3)
    // a probe set admitting nothing reads empty, schema intact
    assert(SnapshotStore.readWhereIn(spark, root, "n",
      Seq(5000L, 6000L)).count() === 0L)
    // undeclared column: conservative — nothing pruned, still exact
    val byScore = SnapshotStore.readWhereIn(spark, root, "score",
      Seq(1.2, 99.9))
    assert(byScore.inputFiles.length === total)
    assert(byScore.count() ===
      SnapshotStore.read(spark, root)
        .filter(col("score").isin(1.2, 99.9)).count())
  }

  test("bounds are inclusive at file-boundary values; one-sided bounds " +
      "leave the other side open") {
    val root = "target/snapstats-bounds"
    cleanup(root)
    SnapshotStore.commit(frame(), root, buckets = 2)
    SnapshotStore.declareStats(spark, root, Seq("n"))
    SnapshotStore.optimize(spark, root, sortByDocId = false,
      zorderBy = Seq("n"), maxRecordsPerFile = 64L)
    // point read at an arbitrary value (inclusive on both ends)
    assert(SnapshotStore.readWhere(spark, root, "n", 512L, 512L)
      .count() === 1L)
    // one-sided: everything at or above 900
    val hiOnly = SnapshotStore.readWhere(spark, root, "n", 900L, null)
    assert(hiOnly.count() === 100L)
    val (k, t) = SnapshotStore.skippingReport(spark, root, "n", 900L, null)
    assert(k < t, s"one-sided bound pruned nothing: $k of $t")
  }

  test("stats are maintained across upsert (carried + computed) and " +
      "survive rollback") {
    val root = "target/snapstats-upsert"
    cleanup(root)
    val sp = spark
    import sp.implicits._
    SnapshotStore.commit(frame(), root, buckets = 4)
    SnapshotStore.declareStats(spark, root, Seq("n"))
    // replace docs 10..19 with shifted n values
    val fresh = (10L until 20L).map(i => (i, i + 5000L,
      Option(i / 10.0))).toDF("doc_id", "n", "score")
    SnapshotStore.upsert(spark, fresh,
      fresh.select("doc_id"), root, buckets = 4)
    // the fresh rows' envelope is queryable immediately
    val shifted = SnapshotStore.readWhere(spark, root, "n", 5000L, 6000L)
    assert(shifted.count() === 10L)
    val full = SnapshotStore.read(spark, root)
    assert(SnapshotStore.readWhere(spark, root, "n", 0L, 999L).count() ===
      full.filter(col("n").between(0, 999)).count())
    // every file of the new head carries a stat line (kept + new)
    val head = SnapshotStore.currentVersion(spark, root).get
    val (_, totalFiles) = SnapshotStore.skippingReport(spark, root,
      "n", 0L, 0L)
    val (keptAll, t2) = SnapshotStore.skippingReport(spark, root,
      "n", Long.MinValue, Long.MaxValue)
    assert(t2 === totalFiles && keptAll === t2) // full range keeps all
    // rollback restores the pre-upsert state WITH its stats
    SnapshotStore.rollback(spark, root, head - 1)
    assert(SnapshotStore.storedStatCols(spark, root,
      SnapshotStore.currentVersion(spark, root).get).nonEmpty)
    assert(SnapshotStore.readWhere(spark, root, "n", 5000L, 6000L)
      .count() === 0L)
  }

  test("all-null files prune; null rows never match a range; NaN-free " +
      "double bounds work") {
    val root = "target/snapstats-nulls"
    cleanup(root)
    val sp = spark
    import sp.implicits._
    SnapshotStore.commit(frame(), root, buckets = 2)
    // add a column only NEW rows carry, then declare stats on it: the
    // old files' envelope is all-null → provably prunable
    val fresh = (2000L until 2100L).map(i =>
      (i, i, Option(i / 10.0), i * 2L)).toDF("doc_id", "n", "score", "w")
    SnapshotStore.upsert(spark, fresh, fresh.select("doc_id"),
      root, buckets = 2)
    SnapshotStore.declareStats(spark, root, Seq("w", "score"))
    val (kept, total) = SnapshotStore.skippingReport(spark, root,
      "w", 4000L, 4050L)
    assert(kept < total,
      s"all-null carried files were not pruned: $kept of $total")
    val got = SnapshotStore.readWhere(spark, root, "w", 4000L, 4050L)
    assert(got.count() ===
      SnapshotStore.read(spark, root)
        .filter(col("w").between(4000L, 4050L)).count())
    // double bounds on a column with scattered nulls: exact vs filter
    val sGot = sortedRows(SnapshotStore.readWhere(spark, root,
      "score", 10.0, 20.0))
    val sWant = sortedRows(SnapshotStore.read(spark, root)
      .filter(col("score") >= 10.0 && col("score") <= 20.0))
    assert(sGot === sWant)
  }

  test("conjunctive multi-column pruning: 2-column z-order lets both " +
      "bounds contribute; result exact") {
    val root = "target/snapstats-multi"
    cleanup(root)
    val sp = spark
    import sp.implicits._
    // n and m are independent permutations of 0..999, so neither
    // single-column order clusters the other
    val df = (0L until 1000L).map { i =>
      (i, i, (i * 37L) % 1000L)
    }.toDF("doc_id", "n", "m")
    SnapshotStore.commit(df, root, buckets = 4)
    SnapshotStore.declareStats(spark, root, Seq("n", "m"))
    SnapshotStore.optimize(spark, root, sortByDocId = false,
      zorderBy = Seq("n", "m"), maxRecordsPerFile = 64L)
    val bounds = Map("n" -> ((100L: Any, 400L: Any)),
      "m" -> ((100L: Any, 400L: Any)))
    val (kBoth, total) = SnapshotStore.skippingReportAll(spark, root, bounds)
    val (kN, _) = SnapshotStore.skippingReport(spark, root, "n", 100L, 400L)
    val (kM, _) = SnapshotStore.skippingReport(spark, root, "m", 100L, 400L)
    // the z-order keeps BOTH envelopes tight, so the conjunction prunes
    // strictly beyond the better single column
    assert(kBoth < math.min(kN, kM),
      s"conjunction did not add pruning: both=$kBoth n=$kN m=$kM/$total")
    val got = SnapshotStore.readWhereAll(spark, root, bounds)
      .select("doc_id", "n", "m").collect().map(_.toSeq).toSeq
      .sortBy(_.head.asInstanceOf[Long])
    val want = SnapshotStore.read(spark, root)
      .filter(col("n").between(100L, 400L) && col("m").between(100L, 400L))
      .select("doc_id", "n", "m").collect().map(_.toSeq).toSeq
      .sortBy(_.head.asInstanceOf[Long])
    assert(got === want && got.nonEmpty)
  }

  test("undeclared store: readWhere still exact, nothing pruned") {
    val root = "target/snapstats-undeclared"
    cleanup(root)
    SnapshotStore.commit(frame(), root, buckets = 2)
    val (kept, total) = SnapshotStore.skippingReport(spark, root,
      "n", 100L, 150L)
    assert(kept === total)
    assert(SnapshotStore.readWhere(spark, root, "n", 100L, 150L)
      .count() === 51L)
  }

  test("dropStats is the undo: pruning stops, reads stay exact, " +
      "re-declare backfills") {
    val root = "target/snapstats-drop"
    cleanup(root)
    SnapshotStore.commit(frame(), root, buckets = 2)
    SnapshotStore.declareStats(spark, root, Seq("n"))
    SnapshotStore.optimize(spark, root, sortByDocId = false,
      zorderBy = Seq("n"), maxRecordsPerFile = 64L)
    val (k1, t1) = SnapshotStore.skippingReport(spark, root, "n", 0L, 10L)
    assert(k1 < t1)
    SnapshotStore.dropStats(spark, root)
    val head = SnapshotStore.currentVersion(spark, root).get
    assert(SnapshotStore.storedStatCols(spark, root, head).isEmpty)
    val (k2, t2) = SnapshotStore.skippingReport(spark, root, "n", 0L, 10L)
    assert(k2 === t2) // nothing prunes without stats
    assert(SnapshotStore.readWhere(spark, root, "n", 0L, 10L)
      .count() === 11L)
    // a second drop is a named error; re-declaring backfills
    val e = intercept[IllegalArgumentException] {
      SnapshotStore.dropStats(spark, root)
    }
    assert(e.getMessage.contains("no file statistics"))
    SnapshotStore.declareStats(spark, root, Seq("n"))
    val (k3, t3) = SnapshotStore.skippingReport(spark, root, "n", 0L, 10L)
    assert(k3 < t3)
  }

  test("bloom point skipping: string-key lookups prune files on an " +
      "UNCLUSTERED layout; maintained across upsert; absent value " +
      "prunes everything") {
    val root = "target/snapstats-bloom"
    cleanup(root)
    val sp = spark
    import sp.implicits._
    // high-cardinality string key, hash-scattered across buckets — the
    // layout range stats can never prune
    val df = (0L until 2000L).map(i => (i, s"key_$i", i))
      .toDF("doc_id", "k", "n")
    SnapshotStore.commit(df, root, buckets = 8)
    SnapshotStore.declareBloom(spark, root, Seq("k"), bits = 4096)
    // split buckets into several files so pruning has grain
    SnapshotStore.optimize(spark, root, maxRecordsPerFile = 64L)
    val (kept, total) = SnapshotStore.bloomReport(spark, root,
      "k", "key_777")
    assert(total >= 16, s"expected many files, got $total")
    assert(kept * 2 < total,
      s"bloom pruning did not bite: kept $kept of $total")
    val hit = SnapshotStore.readPoint(spark, root, "k", "key_777")
    assert(hit.inputFiles.length === kept)
    assert(hit.select("doc_id").collect().map(_.getLong(0)).toSeq
      === Seq(777L))
    // a value that exists nowhere prunes every file (no false-negative
    // risk in reverse: bitsets admit supersets, never subsets)
    val (keptMiss, _) = SnapshotStore.bloomReport(spark, root,
      "k", "key_nope_xyz")
    assert(keptMiss < total)
    assert(SnapshotStore.readPoint(spark, root, "k", "key_nope_xyz")
      .count() === 0L)
    // upsert: fresh files get bitsets automatically; lookups stay exact
    val fresh = Seq((5000L, "key_brand_new", 5000L))
      .toDF("doc_id", "k", "n")
    SnapshotStore.upsert(spark, fresh, fresh.select("doc_id"),
      root, buckets = 8)
    assert(SnapshotStore.readPoint(spark, root, "k", "key_brand_new")
      .count() === 1L)
    assert(SnapshotStore.readPoint(spark, root, "k", "key_777")
      .count() === 1L)
    // dropBloom: tombstone stops pruning, reads stay exact
    SnapshotStore.dropBloom(spark, root)
    val (kAfter, tAfter) = SnapshotStore.bloomReport(spark, root,
      "k", "key_777")
    assert(kAfter === tAfter)
    assert(SnapshotStore.readPoint(spark, root, "k", "key_777")
      .count() === 1L)
  }

  test("deleteWhere rewrites only candidate files, carries provably " +
      "untouched ones verbatim, keeps nulls, and no-ops off-range") {
    val root = "target/snapstats-delete"
    cleanup(root)
    SnapshotStore.commit(frame(), root, buckets = 4)
    SnapshotStore.declareStats(spark, root, Seq("n", "score"))
    SnapshotStore.optimize(spark, root, sortByDocId = false,
      zorderBy = Seq("n"), maxRecordsPerFile = 64L)
    val vOpt = SnapshotStore.currentVersion(spark, root).get
    val entriesBefore = SnapshotStore.read(spark, root).inputFiles.toSet

    val v = SnapshotStore.deleteWhere(spark, root, "n", 200L, 299L)
    assert(v === vOpt + 1)
    val after = SnapshotStore.read(spark, root)
    assert(after.count() === 900L)
    assert(after.filter(col("n").between(200L, 299L)).count() === 0L)
    // untouched files carried VERBATIM (same physical paths reused)
    val entriesAfter = after.inputFiles.toSet
    val shared = entriesBefore.intersect(entriesAfter)
    assert(shared.nonEmpty,
      "delete rewrote every file — stats pruning did not carry any")
    assert(entriesAfter.size < entriesBefore.size + 8)
    // time travel still serves the pre-delete snapshot
    assert(SnapshotStore.read(spark, root, vOpt).count() === 1000L)

    // NULL rows survive a delete on their column (SQL DELETE: a null
    // predicate deletes nothing) — score is null at every n % 7 == 0
    val nullsBefore = after.filter(col("score").isNull).count()
    SnapshotStore.deleteWhere(spark, root, "score", 0.0, 1000.0)
    val afterScore = SnapshotStore.read(spark, root)
    assert(afterScore.filter(col("score").isNotNull).count() === 0L)
    assert(afterScore.count() === nullsBefore)

    // provably-empty delete is a version-free no-op
    val vNow = SnapshotStore.currentVersion(spark, root).get
    assert(SnapshotStore.deleteWhere(spark, root, "n", 900000L,
      990000L) === vNow)
    assert(SnapshotStore.currentVersion(spark, root).get === vNow)
    // stats stay maintained: the rewritten files answer range reads
    assert(SnapshotStore.readWhere(spark, root, "n", 0L, 100L).count()
      === afterScore.filter(col("n") <= 100L).count())
  }

  test("stats + bloom declared together: one publish maintains both; " +
      "range and point skipping coexist") {
    val root = "target/snapstats-both"
    cleanup(root)
    val sp = spark
    import sp.implicits._
    val df = (0L until 1000L).map(i => (i, i, s"key_$i"))
      .toDF("doc_id", "n", "k")
    SnapshotStore.commit(df, root, buckets = 4)
    SnapshotStore.declareStats(spark, root, Seq("n"))
    SnapshotStore.declareBloom(spark, root, Seq("k"), bits = 4096)
    SnapshotStore.optimize(spark, root, sortByDocId = false,
      zorderBy = Seq("n"), maxRecordsPerFile = 64L)
    // the upsert's ONE publish must maintain both metadata kinds
    val fresh = Seq((3000L, 3000L, "key_fresh")).toDF("doc_id", "n", "k")
    SnapshotStore.upsert(spark, fresh, fresh.select("doc_id"),
      root, buckets = 4)
    val (ks, ts) = SnapshotStore.skippingReport(spark, root, "n", 10L, 40L)
    assert(ks < ts)
    val (kb, tb) = SnapshotStore.bloomReport(spark, root, "k", "key_500")
    assert(kb < tb)
    assert(SnapshotStore.readWhere(spark, root, "n", 10L, 40L)
      .count() === 31L)
    assert(SnapshotStore.readPoint(spark, root, "k", "key_fresh")
      .count() === 1L)
    assert(SnapshotStore.readPoint(spark, root, "k", "key_500")
      .count() === 1L)
  }

  test("deletePoint: bloom-pruned delete-by-key rewrites only admitting " +
      "files; absent key is a version-free no-op") {
    val root = "target/snapstats-delpoint"
    cleanup(root)
    val sp = spark
    import sp.implicits._
    val df = (0L until 2000L).map(i => (i, s"user_${i % 500}", i))
      .toDF("doc_id", "owner", "n")
    SnapshotStore.commit(df, root, buckets = 8)
    SnapshotStore.declareBloom(spark, root, Seq("owner"), bits = 8192)
    SnapshotStore.optimize(spark, root, maxRecordsPerFile = 64L)
    val before = SnapshotStore.read(spark, root)
    val filesBefore = before.inputFiles.toSet
    val nOwner = before.filter(col("owner") === "user_42").count()
    assert(nOwner === 4L)

    val v0 = SnapshotStore.currentVersion(spark, root).get
    val v = SnapshotStore.deletePoint(spark, root, "owner", "user_42")
    assert(v === v0 + 1)
    val after = SnapshotStore.read(spark, root)
    assert(after.count() === 2000L - nOwner)
    assert(after.filter(col("owner") === "user_42").count() === 0L)
    // most files carried verbatim — the bloom chose few candidates
    val shared = filesBefore.intersect(after.inputFiles.toSet)
    assert(shared.size * 2 > filesBefore.size,
      s"delete-by-key rewrote ${filesBefore.size - shared.size} of " +
        s"${filesBefore.size} files — bloom pruning did not carry")
    // a key that never existed: no version published
    val vNow = SnapshotStore.currentVersion(spark, root).get
    assert(SnapshotStore.deletePoint(spark, root, "owner",
      "user_never_existed") === vNow)
    assert(SnapshotStore.currentVersion(spark, root).get === vNow)
  }

  test("bloom guards: unknown / managed / float columns and null probes " +
      "are named errors") {
    val root = "target/snapstats-bloom-guards"
    cleanup(root)
    val sp = spark
    import sp.implicits._
    val df = Seq((1L, "a", 1.5)).toDF("doc_id", "k", "x")
    SnapshotStore.commit(df, root, buckets = 2)
    val e1 = intercept[IllegalArgumentException] {
      SnapshotStore.declareBloom(spark, root, Seq("nope"))
    }
    assert(e1.getMessage.contains("does not exist"))
    val e2 = intercept[IllegalArgumentException] {
      SnapshotStore.declareBloom(spark, root, Seq("bucket"))
    }
    assert(e2.getMessage.contains("partition column"))
    // doc_id IS declarable since round 9: its per-file bitsets power the
    // key-pruned upsert/readDocs paths (KeyPrunedUpsertSpec)
    SnapshotStore.declareBloom(spark, root, Seq("doc_id"), bits = 256)
    assert(SnapshotStore.readPoint(spark, root, "doc_id", 1L)
      .count() === 1L)
    val e3 = intercept[IllegalArgumentException] {
      SnapshotStore.declareBloom(spark, root, Seq("x"))
    }
    assert(e3.getMessage.contains("stable canonical form"))
    val e4 = intercept[IllegalArgumentException] {
      SnapshotStore.readPoint(spark, root, "k", null)
    }
    assert(e4.getMessage.contains("non-null"))
  }

  test("bounds normalize through the column's DECLARED type: a Date " +
      "bound on a timestamp column prunes in epoch-micros space, not " +
      "epoch-days") {
    val root = "target/snapstats-typed-bounds"
    cleanup(root)
    val sp = spark
    import sp.implicits._
    // timestamps spread over 1000 days; stats canonicalize to MICROS
    val df = (0L until 1000L).map { i =>
      (i, new java.sql.Timestamp(86400000L * i))
    }.toDF("doc_id", "ts")
    SnapshotStore.commit(df, root, buckets = 2)
    SnapshotStore.declareStats(spark, root, Seq("ts"))
    SnapshotStore.optimize(spark, root, sortByDocId = false,
      zorderBy = Seq("ts"), maxRecordsPerFile = 64L)
    // a java.sql.Date bound canonicalizes to epoch-DAYS raw — compared
    // against micros envelopes it pruned EVERY file (mn_micros > hi_days)
    // and readWhere silently returned zero rows; normalized through the
    // declared TimestampType both sides compare in micros
    val lo = java.sql.Date.valueOf("1970-04-11") // day 100
    val hi = java.sql.Date.valueOf("1970-07-20") // day 200
    val got = SnapshotStore.readWhere(spark, root, "ts", lo, hi)
    assert(got.count() === 101L,
      "date bounds on a timestamp column dropped rows — bound " +
        "canonicalized in the wrong unit space")
    val (kept, total) = SnapshotStore.skippingReport(spark, root,
      "ts", lo, hi)
    assert(kept < total, s"pruning did not engage: $kept of $total")
    // deleteWhere through the same normalization: files that match must
    // NOT be carried as provably disjoint (the incomplete-GDPR trap)
    SnapshotStore.deleteWhere(spark, root, "ts", lo, hi)
    assert(SnapshotStore.read(spark, root).count() === 899L)
    // a bound that cannot cast to the declared type is a NAMED error,
    // never a silent mis-prune
    val e = intercept[IllegalArgumentException] {
      SnapshotStore.readWhere(spark, root, "ts", "not a time", null)
        .count()
    }
    assert(e.getMessage.contains("ts"))
  }

  test("bloom probes hash the column's declared type: an equal-but-" +
      "differently-typed probe is not a false negative") {
    val root = "target/snapstats-bloom-typed"
    cleanup(root)
    val sp = spark
    import sp.implicits._
    val df = (0L until 500L).map(i => (i, i * 3L)).toDF("doc_id", "n3")
    SnapshotStore.commit(df, root, buckets = 4)
    SnapshotStore.declareBloom(spark, root, Seq("n3"), bits = 4096)
    SnapshotStore.optimize(spark, root, maxRecordsPerFile = 64L)
    // the write side hashed cast(n3 as string) = "42"; a Double probe
    // hashed "42.0" → all K positions missed → bloom false negative:
    // readPoint returned ZERO rows and deletePoint no-opped even though
    // the residual equality matches
    assert(SnapshotStore.readPoint(spark, root, "n3", 42.0)
      .count() === 1L,
      "Double probe on a bigint bloom was a false negative")
    assert(SnapshotStore.readPoint(spark, root, "n3", 42)
      .count() === 1L) // Int probe on a bigint column
    val v0 = SnapshotStore.currentVersion(spark, root).get
    val v = SnapshotStore.deletePoint(spark, root, "n3", 42.0)
    assert(v === v0 + 1,
      "deletePoint with a Double probe version-free no-opped on a " +
        "matching bigint key")
    assert(SnapshotStore.read(spark, root)
      .filter(col("n3") === 42L).count() === 0L)
  }

  test("legacy manifest without #col declarations: readPoint/readWhere " +
      "fall back to the physical schema like read() does") {
    val root = "target/snapstats-legacy"
    cleanup(root)
    val sp = spark
    import sp.implicits._
    val df = (0L until 100L).map(i => (i, i, s"k_$i"))
      .toDF("doc_id", "n", "k")
    SnapshotStore.commit(df, root, buckets = 2)
    // simulate a pre-declaration manifest: same entries, #col lines
    // stripped (manifests are plain text by design)
    val m1 = new java.io.File(root, "_versions/v00001.manifest")
    val legacy = scala.io.Source.fromFile(m1, "UTF-8").getLines()
      .filterNot(_.startsWith("#col\t")).mkString("", "\n", "\n")
    val m2 = new java.io.File(root, "_versions/v00002.manifest")
    java.nio.file.Files.write(m2.toPath, legacy.getBytes("UTF-8"))
    assert(SnapshotStore.read(spark, root).count() === 100L)
    assert(SnapshotStore.readWhere(spark, root, "n", 10L, 20L)
      .count() === 11L)
    assert(SnapshotStore.readPoint(spark, root, "k", "k_7")
      .count() === 1L)
  }

  test("clone carries stat + bloom lines with rewritten relpaths — " +
      "pruning engages on the clone without a re-scan") {
    val srcRoot = "target/snapstats-clone-src"
    val dstRoot = "target/snapstats-clone-dst"
    cleanup(srcRoot); cleanup(dstRoot)
    val sp = spark
    import sp.implicits._
    val df = (0L until 1000L).map(i => (i, i, s"key_$i"))
      .toDF("doc_id", "n", "k")
    SnapshotStore.commit(df, srcRoot, buckets = 4)
    SnapshotStore.declareStats(spark, srcRoot, Seq("n"))
    SnapshotStore.declareBloom(spark, srcRoot, Seq("k"), bits = 4096)
    SnapshotStore.optimize(spark, srcRoot, sortByDocId = false,
      zorderBy = Seq("n"), maxRecordsPerFile = 64L)
    SnapshotStore.cloneTo(spark, srcRoot, dstRoot)
    // the clone's manifest must hold as many stat/bloom lines as the
    // source's — all keyed to the REWRITTEN paths, so skipping works
    val (kept, total) = SnapshotStore.skippingReport(spark, dstRoot,
      "n", 100L, 150L)
    assert(kept < total, s"clone lost stats pruning: $kept of $total")
    val (kb, tb) = SnapshotStore.bloomReport(spark, dstRoot, "k", "key_7")
    assert(kb < tb, s"clone lost bloom pruning: $kb of $tb")
    assert(SnapshotStore.readWhere(spark, dstRoot, "n", 100L, 150L)
      .count() === 51L)
    assert(SnapshotStore.readPoint(spark, dstRoot, "k", "key_7")
      .count() === 1L)
  }

  test("bloomDeclaration on a non-hashable column is rejected at first " +
      "maintenance, not recorded silently") {
    val root = "target/snapstats-bloomdecl-guard"
    cleanup(root)
    val sp = spark
    import sp.implicits._
    val df = Seq((1L, 1.5, "a")).toDF("doc_id", "x", "k")
    val e = intercept[IllegalArgumentException] {
      SnapshotStore.commit(df, root, buckets = 2,
        meta = Seq(SnapshotStore.bloomDeclaration(Seq("x"))))
    }
    assert(e.getMessage.contains("stable canonical form"))
    // the good declaration path still works at first commit
    cleanup(root)
    SnapshotStore.commit(df, root, buckets = 2,
      meta = Seq(SnapshotStore.bloomDeclaration(Seq("k"))))
    assert(SnapshotStore.readPoint(spark, root, "k", "a").count() === 1L)
  }

  test("executor-side bitset aggregate is bit-identical to a driver-side " +
      "position fold; a many-file OPTIMIZE maintains blooms exactly") {
    val sp = spark
    import sp.implicits._
    // bit-identity: same positions folded two ways must yield the same
    // toByteArray bytes (the #bloom manifest encoding)
    val bits = 512
    val posDf = (0L until 200L)
      .map(i => Seq(((i * 7) % bits).toInt, ((i * 13 + 5) % bits).toInt))
      .toDF("ps")
    val aggBytes = posDf
      .agg(graft.plans.BloomBitsetAgg.bloom_bitset(col("ps"), bits))
      .collect().head.getAs[Array[Byte]](0)
    val positions = posDf.select(explode(col("ps"))).distinct()
      .collect().map(_.getInt(0))
    val bs = new java.util.BitSet(bits)
    positions.foreach(bs.set)
    assert(java.util.Arrays.equals(aggBytes, bs.toByteArray),
      "executor-folded bitset differs from the driver fold it replaced")
    // many files in one maintenance pass: 2000 rows, 8 buckets, 8-row
    // files → ~250 (file, column) bitsets through one publish
    val root = "target/snapstats-manyfiles"
    cleanup(root)
    val df = (0L until 2000L).map(i => (i, s"key_$i")).toDF("doc_id", "k")
    SnapshotStore.commit(df, root, buckets = 8,
      meta = Seq(SnapshotStore.bloomDeclaration(Seq("k"), bits = 2048)))
    SnapshotStore.optimize(spark, root, maxRecordsPerFile = 8L)
    val (_, total) = SnapshotStore.bloomReport(spark, root, "k", "key_3")
    assert(total >= 200, s"expected ~250 files, got $total")
    // every key findable (no false negative anywhere), misses prune hard
    Seq(3L, 777L, 1999L).foreach { i =>
      val hit = SnapshotStore.readPoint(spark, root, "k", s"key_$i")
      assert(hit.select("doc_id").collect().map(_.getLong(0)).toSeq
        === Seq(i))
    }
    val (keptMiss, _) = SnapshotStore.bloomReport(spark, root, "k", "nope")
    assert(keptMiss * 10 < total,
      s"miss probe kept $keptMiss of $total files")
  }

  test("string range stats: truncated binary-collation envelopes prune " +
      "prefix scans and survive the truncation-boundary trap") {
    val root = "target/snapstats-string"
    cleanup(root)
    val sp = spark
    import sp.implicits._
    val df = (0L until 1000L).map(i => (i, f"key_$i%04d", i))
      .toDF("doc_id", "k", "n")
    SnapshotStore.commit(df, root, buckets = 4)
    SnapshotStore.declareStats(spark, root, Seq("k"))
    SnapshotStore.optimize(spark, root, sortByDocId = false,
      sortBy = Seq("k"), maxRecordsPerFile = 64L)
    // a contiguous key band: sorted layout → most files provably miss
    val (kept, total) = SnapshotStore.skippingReport(spark, root,
      "k", "key_0100", "key_0150")
    assert(total >= 12, s"expected many small files, got $total")
    assert(kept < total / 2,
      s"string pruning did not bite: kept $kept of $total files")
    val got = SnapshotStore.readWhere(spark, root,
      "k", "key_0100", "key_0150")
    assert(got.count() === 51L)
    assert(got.inputFiles.length === kept)
    // exactness vs the plain filter on both bounds incl. one-sided
    assert(SnapshotStore.readWhere(spark, root, "k", "key_0990", null)
      .count() === 10L)
    // deleteWhere over strings: prune + carry + exact residual
    val before = SnapshotStore.read(spark, root).inputFiles.toSet
    SnapshotStore.deleteWhere(spark, root, "k", "key_0200", "key_0299")
    val after = SnapshotStore.read(spark, root)
    assert(after.count() === 900L)
    assert(before.intersect(after.inputFiles.toSet).nonEmpty,
      "string delete rewrote every file — pruning did not carry")

    // TRUNCATION-BOUNDARY TRAP: values longer than 32 code points that
    // share a 32-cp prefix — a recorded envelope that truncated the max
    // WITHOUT incrementing would claim the file ends at the prefix and
    // wrongly prune probes landing between prefix and true max
    val root2 = "target/snapstats-string-trunc"
    cleanup(root2)
    val prefix = "p" * 32
    val longDf = (0L until 100L).map { i =>
      (i, prefix + f"_tail_$i%03d")
    }.toDF("doc_id", "k")
    SnapshotStore.commit(longDf, root2, buckets = 2,
      meta = Seq(SnapshotStore.statsDeclaration(Seq("k"))))
    // probe strictly above the truncated prefix but inside the true
    // range: must NOT be pruned away
    assert(SnapshotStore.readWhere(spark, root2, "k",
      prefix + "_tail_050", prefix + "_tail_060").count() === 11L)
    // probe above every possible extension of the prefix: prunes all
    val (k2, t2) = SnapshotStore.skippingReport(spark, root2, "k",
      "q", null) // 'q' > 'p'... prefix+anything
    assert(k2 === 0, s"above-envelope probe kept $k2 of $t2 files")
    assert(SnapshotStore.readWhere(spark, root2, "k", "q", null)
      .count() === 0L)
    // below-envelope probe prunes too (lower bounds are exact prefixes)
    val (k3, _) = SnapshotStore.skippingReport(spark, root2, "k",
      null, "o")
    assert(k3 === 0)
  }

  test("guards: unknown / managed / text columns and missing bounds are " +
      "named errors") {
    val root = "target/snapstats-guards"
    cleanup(root)
    val sp = spark
    import sp.implicits._
    val df = Seq((1L, "abc", 5L, Seq(1.0, 2.0)))
      .toDF("doc_id", "label", "n", "emb")
    SnapshotStore.commit(df, root, buckets = 2)
    val e1 = intercept[IllegalArgumentException] {
      SnapshotStore.declareStats(spark, root, Seq("nope"))
    }
    assert(e1.getMessage.contains("does not exist"))
    val e2 = intercept[IllegalArgumentException] {
      SnapshotStore.declareStats(spark, root, Seq("bucket"))
    }
    assert(e2.getMessage.contains("partition column"))
    // doc_id IS declarable since round 9 (key-pruned upsert/readDocs)
    SnapshotStore.declareStats(spark, root, Seq("doc_id"))
    assert(SnapshotStore.readWhere(spark, root, "doc_id", 1L, 1L)
      .count() === 1L)
    val e3 = intercept[IllegalArgumentException] {
      SnapshotStore.declareStats(spark, root, Seq("emb"))
    }
    assert(e3.getMessage.contains("non-clusterable"))
    val e4 = intercept[IllegalArgumentException] {
      SnapshotStore.readWhere(spark, root, "n", null, null)
    }
    assert(e4.getMessage.contains("at least one bound"))
  }

  test("footer fast-path stat lines equal the scan path's, per " +
      "(bucket, column) — longs at 60-bit hash precision, nulls, " +
      "short and truncated strings") {
    val rootA = "target/snapstats-footer"
    val rootB = "target/snapstats-scan"
    cleanup(rootA); cleanup(rootB)
    val sp = spark
    import sp.implicits._
    // hash-precision longs (doubles would collide them), nullable
    // doubles, and strings where every >32-cp value sorts ABOVE every
    // short one (so per-file maxima are unambiguous across both paths)
    val df = (0L until 600L).map { i =>
      (i,
        graft.functions.CrossHash.md5Hash60(s"k$i"),
        if (i % 5 == 0) None else Some(i / 3.0),
        if (i % 4 == 0) "z-long-" + ("x" * 40) + i.toString
        else s"a-short-$i")
    }.toDF("doc_id", "h", "score", "label")
    // A: stats only → footer path computes the lines
    SnapshotStore.commit(df, rootA, buckets = 4,
      meta = Seq(SnapshotStore.statsDeclaration(
        Seq("doc_id", "h", "score", "label"))))
    // B: same stats + a bloom on the same files → the combined DATA SCAN
    // computes the lines (the pre-round-13 path)
    SnapshotStore.commit(df, rootB, buckets = 4,
      meta = Seq(SnapshotStore.statsDeclaration(
          Seq("doc_id", "h", "score", "label")),
        SnapshotStore.bloomDeclaration(Seq("doc_id"))))
    def statKey(root: String): Seq[(String, String, String)] =
      SnapshotStore.storedMetaLines(spark, root, "#stat\t",
          SnapshotStore.currentVersion(spark, root).get)
        .map { l =>
          val a = l.split("\t", 7)
          // normalize the attempt-unique relpath to its bucket dir
          val bucket = a(1).split("/").find(_.startsWith("bucket="))
            .getOrElse(a(1))
          (bucket, a(2), s"${a(3)}|${a(4)}|${a(5)}|${a(6)}")
        }.sorted
    assert(statKey(rootA).nonEmpty)
    assert(statKey(rootA) === statKey(rootB))
    // and the pruned read built on footer lines stays exact
    val got = SnapshotStore.readWhere(spark, rootA, "label",
        "a-short-2", "a-short-3")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val want = df.filter(col("label") >= "a-short-2" &&
        col("label") <= "a-short-3")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got === want && got.nonEmpty)
  }
}
