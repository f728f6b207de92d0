package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, concat, expr, lit}

import graft.operators.IngestionPipeline
import graft.streaming.IngestStream

/** Streaming ingestion ≡ batch ingestion, and re-triggering is
  * INCREMENTAL: the checkpoint must make a second AvailableNow run embed
  * only the files that appeared since the first. */
class IngestStreamSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(name: String): String = {
    val p = Files.createTempDirectory(s"graft_$name")
    p.toString
  }

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.select("doc_id", "chunk_idx", "vec_key", "vec_uid", "title", "content")
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)

  test("streaming drain of the corpus equals the batch index build") {
    val src = tmp("ingest_src"); val out = tmp("ingest_out")
    val cp = tmp("ingest_cp")
    Files.copy(Paths.get(sf0001, "documents.parquet"),
      Paths.get(src, "documents.parquet"), StandardCopyOption.REPLACE_EXISTING)

    IngestStream.ingestAvailable(spark, src, out, cp,
      chunkSize = 120, overlap = 20, dim = 8)

    val streamed = rows(spark.read.parquet(out))
    val batch = rows(IngestionPipeline.buildIndexFrom(
      Tables.documents(spark, sf0001), 120, 20, 8))
    assert(streamed.nonEmpty)
    assert(streamed === batch)

    // --- incremental re-trigger: one new document file lands ---
    val newDoc = Seq((90001L, "incremental document text that chunks", "en",
      "inc_doc.pdf", 38L)).toDF("doc_id", "text", "lang", "source", "n_chars")
    val stage = tmp("ingest_stage")
    newDoc.coalesce(1).write.mode("overwrite").parquet(stage)
    val part = Files.list(Paths.get(stage)).filter(_.toString.endsWith(".parquet"))
      .findFirst().get()
    Files.copy(part, Paths.get(src, "new_doc.parquet"))

    IngestStream.ingestAvailable(spark, src, out, cp,
      chunkSize = 120, overlap = 20, dim = 8)

    val after = rows(spark.read.parquet(out))
    val expected = rows(IngestionPipeline.buildIndexFrom(
      Tables.documents(spark, sf0001).unionByName(newDoc), 120, 20, 8))
    assert(after === expected)
    // the delta is exactly the new document's chunks — nothing re-embedded
    assert(after.size - streamed.size ===
      rows(IngestionPipeline.buildIndexFrom(newDoc, 120, 20, 8)).size)
  }

  test("streaming keyed upsert replaces a re-parsed document's vectors") {
    val src = tmp("upsert_src"); val idx = tmp("upsert_idx")
    val cp = tmp("upsert_cp")

    def writeDocFile(doc: DataFrame, name: String): Unit = {
      val stage = tmp("upsert_stage")
      doc.coalesce(1).write.mode("overwrite").parquet(stage)
      val part = Files.list(Paths.get(stage))
        .filter(_.toString.endsWith(".parquet")).findFirst().get()
      Files.copy(part, Paths.get(src, name), StandardCopyOption.REPLACE_EXISTING)
    }

    val v1 = Seq(
      (1L, "first document original text body", "en", "a.pdf", 33L),
      (2L, "second document stays untouched here", "en", "b.pdf", 37L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    writeDocFile(v1, "docs_v1.parquet")
    IngestStream.upsertAvailable(spark, src, idx, cp,
      chunkSize = 20, overlap = 5, dim = 8)

    // a REVISED version of doc 1 lands as a new file
    val v2doc1 = Seq((1L, "first document revised and rather longer text body",
      "en", "a.pdf", 50L)).toDF("doc_id", "text", "lang", "source", "n_chars")
    writeDocFile(v2doc1, "docs_v2.parquet")
    IngestStream.upsertAvailable(spark, src, idx, cp,
      chunkSize = 20, overlap = 5, dim = 8)

    val got = rows(IngestionPipeline.readIndex(spark, idx))
    val current = v2doc1.unionByName(v1.filter($"doc_id" === 2L))
    val want = rows(IngestionPipeline.buildIndexFrom(current, 20, 5, 8))
    // upsert ≡ fresh rebuild of the current corpus state: doc 1's old
    // vectors are gone (the append sink would have kept both versions)
    assert(got === want)
  }

  test("count-min sketches merged across streamed micro-batches ≡ one batch pass") {
    import org.apache.spark.sql.functions.{col, sum}
    import graft.operators.CountMin

    val src = tmp("cm_src"); val out = tmp("cm_out"); val cp = tmp("cm_cp")
    val docs = Tables.documents(spark, sf0001)
    // two separate file drops + maxFilesPerTrigger=1 → at least two
    // micro-batches, each sketched independently
    def drop(df: DataFrame, name: String): Unit = {
      val stage = tmp(s"cm_stage_$name")
      df.coalesce(1).write.mode("overwrite").parquet(stage)
      val part = Files.list(Paths.get(stage))
        .filter(_.toString.endsWith(".parquet")).findFirst().get()
      Files.copy(part, Paths.get(src, s"$name.parquet"))
    }
    drop(docs.filter(col("doc_id") % 2 === 0), "even")
    drop(docs.filter(col("doc_id") % 2 === 1), "odd")

    val stream = spark.readStream
      .schema(docs.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(src)
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        CountMin.sketch(batch, col("source"), depth = 4, width = 256)
          .write.mode("append").parquet(out)
      }
      .option("checkpointLocation", cp)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    // merge = cell-wise SUM of per-batch counters — the mergeability the
    // sketch's sum-form counters exist to provide
    val merged = spark.read.parquet(out)
      .groupBy("row", "bucket").agg(sum("c").as("c"))
      .orderBy("row", "bucket")
      .as[(Int, Long, Long)].collect().toSeq
    val oneShot = CountMin.sketch(docs, col("source"), 4, 256)
      .orderBy("row", "bucket")
      .as[(Int, Long, Long)].collect().toSeq
    assert(merged.nonEmpty)
    assert(merged === oneShot)
    // and more than one per-batch sketch actually contributed
    assert(spark.read.parquet(out).count() > oneShot.size)
  }

  test("transactional streaming sink: atomic versions, replayed batch skipped") {
    import graft.operators.SnapshotStore
    val src = tmp("txn_src"); val store = tmp("txn_store")
    val cp = tmp("txn_cp")
    Files.copy(Paths.get(sf0001, "documents.parquet"),
      Paths.get(src, "documents.parquet"), StandardCopyOption.REPLACE_EXISTING)

    IngestStream.transactionalAvailable(spark, src, store, cp,
      streamId = "spec_stream", buckets = 4,
      chunkSize = 120, overlap = 20, dim = 8)

    val v1 = SnapshotStore.currentVersion(spark, store).get
    val got = rows(SnapshotStore.read(spark, store).drop("bucket"))
    val batch = rows(IngestionPipeline.buildIndexFrom(
      Tables.documents(spark, sf0001), 120, 20, 8))
    assert(got === batch)
    assert(SnapshotStore.lastCommittedBatch(spark, store, "spec_stream")
      === Some(0L))

    // crash-replay: foreachBatch re-delivers batch 0 (checkpoint had not
    // advanced) — the txn marker must make the re-commit a no-op
    val replayRows = IngestionPipeline.buildIndexFrom(
      Tables.documents(spark, sf0001), 120, 20, 8)
    val vReplay = SnapshotStore.commitBatch(
      replayRows, store, 4, "spec_stream", batchId = 0L)
    assert(vReplay === v1)
    assert(SnapshotStore.currentVersion(spark, store).get === v1)
    assert(rows(SnapshotStore.read(spark, store).drop("bucket")) === batch)

    // a genuinely new batch (re-parsed doc 0) applies as a keyed upsert…
    val reparsed = Tables.documents(spark, sf0001)
      .filter(col("doc_id") === 0L)
      .withColumn("text", concat(col("text"), lit(" reparsed extra")))
    val newRows = IngestionPipeline.buildIndexFrom(reparsed, 120, 20, 8)
    val v2 = SnapshotStore.commitBatch(
      newRows, store, 4, "spec_stream", batchId = 1L)
    assert(v2 === v1 + 1)
    val after = rows(SnapshotStore.read(spark, store).drop("bucket"))
    val expected = rows(IngestionPipeline.buildIndexFrom(
      Tables.documents(spark, sf0001).filter(col("doc_id") =!= 0L)
        .unionByName(reparsed), 120, 20, 8))
    assert(after === expected)
    // …while time travel still serves the pre-upsert snapshot
    assert(rows(SnapshotStore.read(spark, store, v1).drop("bucket"))
      === batch)
    assert(SnapshotStore.lastCommittedBatch(spark, store, "spec_stream")
      === Some(1L))

    // maintenance must not destroy the replay state: optimize publishes
    // a marker-carrying manifest and vacuum drops the old ones — the
    // replayed batch 1 must STILL be detected and skipped
    val vOpt = SnapshotStore.optimize(spark, store)
    SnapshotStore.vacuum(spark, store, keepVersions = 1)
    assert(SnapshotStore.lastCommittedBatch(spark, store, "spec_stream")
      === Some(1L))
    val vReplay2 = SnapshotStore.commitBatch(
      newRows, store, 4, "spec_stream", batchId = 1L)
    assert(vReplay2 === vOpt)
    assert(rows(SnapshotStore.read(spark, store).drop("bucket"))
      === expected)
  }

  test("file statistics survive the streaming txn + maintenance loop") {
    import graft.operators.SnapshotStore
    val src = tmp("stat_src"); val store = tmp("stat_store")
    val cp = tmp("stat_cp")
    Files.copy(Paths.get(sf0001, "documents.parquet"),
      Paths.get(src, "documents.parquet"), StandardCopyOption.REPLACE_EXISTING)
    IngestStream.transactionalAvailable(spark, src, store, cp,
      streamId = "stat_stream", buckets = 4,
      chunkSize = 120, overlap = 20, dim = 8)
    SnapshotStore.declareStats(spark, store, Seq("chunk_idx"))

    // a later micro-batch (re-parsed doc 0, doubled text → more chunks)
    // must get its new files' stats computed by the publish itself
    val reparsed = Tables.documents(spark, sf0001)
      .filter(col("doc_id") === 0L)
      .withColumn("text", concat(col("text"), col("text")))
    SnapshotStore.commitBatch(
      IngestionPipeline.buildIndexFrom(reparsed, 120, 20, 8),
      store, 4, "stat_stream", batchId = 1L): Unit

    def wantAt(lo: Long, hi: Long) =
      rows(SnapshotStore.read(spark, store)
        .filter(col("chunk_idx").between(lo, hi)).drop("bucket"))
    assert(rows(SnapshotStore.readWhere(spark, store, "chunk_idx", 2L, 5L)
      .drop("bucket")) === wantAt(2L, 5L))
    // every file of the head version carries an envelope: the full
    // range keeps all files, and a beyond-range read prunes to zero
    val head = SnapshotStore.currentVersion(spark, store).get
    val (kAll, total) = SnapshotStore.skippingReport(spark, store,
      "chunk_idx", 0L, 1000000L)
    assert(kAll === total && total > 0)
    val (kNone, _) = SnapshotStore.skippingReport(spark, store,
      "chunk_idx", 900000L, 1000000L)
    assert(kNone === 0, s"beyond-range read kept $kNone files")

    // maintenance: optimize + vacuum keep both the txn watermark and
    // the stats declaration alive
    SnapshotStore.optimize(spark, store)
    SnapshotStore.vacuum(spark, store, keepVersions = 1)
    assert(SnapshotStore.lastCommittedBatch(spark, store, "stat_stream")
      === Some(1L))
    assert(SnapshotStore.storedStatCols(spark, store,
      SnapshotStore.currentVersion(spark, store).get)
      === Seq("chunk_idx"))
    assert(rows(SnapshotStore.readWhere(spark, store, "chunk_idx", 2L, 5L)
      .drop("bucket")) === wantAt(2L, 5L))
    assert(head > 0)
  }

  test("streaming dedup drops near-dups of earlier batches and siblings") {
    val base = "the quick brown fox jumps over the lazy dog and then " +
      "runs far away into the deep dark forest tonight"
    val nearDup = base.replace("tonight", "today")
    val other = "completely different words about spark shuffle " +
      "partitions and broadcast joins at massive scale"
    val third = "yet another entirely unrelated document discussing " +
      "parquet footers column pruning and predicate pushdown"
    def docsDf(rows: Seq[(Long, String)]) =
      rows.map { case (id, t) => (id, t, "en", s"d$id.pdf", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
    def land(df: DataFrame, src: String, name: String): Unit = {
      val stage = tmp("dedup_stage")
      df.coalesce(1).write.mode("overwrite").parquet(stage)
      val part = Files.list(Paths.get(stage))
        .filter(_.toString.endsWith(".parquet")).findFirst().get()
      Files.copy(part, Paths.get(src, name))
    }
    val src = tmp("dedup_src"); val state = tmp("dedup_state")
    val out = tmp("dedup_out"); val cp = tmp("dedup_cp")
    // state dir must not pre-exist as an empty parquet read target
    Files.delete(Paths.get(state))

    // batch 1: two distinct docs — both admitted
    land(docsDf(Seq(1L -> base, 2L -> other)), src, "b1.parquet")
    IngestStream.dedupAvailable(spark, src, state, out, cp)
    assert(spark.read.parquet(out).select("doc_id").as[Long]
      .collect().sorted.toSeq === Seq(1L, 2L))

    // batch 2: doc 5 near-dups doc 1 (cross-batch), doc 7 duplicates
    // doc 6 (within-batch, larger id loses), doc 6 is novel
    land(docsDf(Seq(5L -> nearDup, 6L -> third, 7L -> third)),
      src, "b2.parquet")
    IngestStream.dedupAvailable(spark, src, state, out, cp)
    assert(spark.read.parquet(out).select("doc_id").as[Long]
      .collect().sorted.toSeq === Seq(1L, 2L, 6L))

    // the fingerprint store holds exactly the admitted documents
    assert(spark.read.parquet(state).select("doc_id").distinct()
      .as[Long].collect().sorted.toSeq === Seq(1L, 2L, 6L))

    // batch 3: replaying nothing new is a no-op (checkpoint drains empty)
    IngestStream.dedupAvailable(spark, src, state, out, cp)
    assert(spark.read.parquet(out).count() === 3L)
  }

  test("transactional dedup: exactly-once admitted docs + state, replay no-ops") {
    import graft.operators.SnapshotStore
    val base = "the quick brown fox jumps over the lazy dog and then " +
      "runs far away into the deep dark forest tonight"
    val nearDup = base.replace("tonight", "today")
    val other = "completely different words about spark shuffle " +
      "partitions and broadcast joins at massive scale"
    val third = "yet another entirely unrelated document discussing " +
      "parquet footers column pruning and predicate pushdown"
    def docsDf(rows: Seq[(Long, String)]) =
      rows.map { case (id, t) => (id, t, "en", s"d$id.pdf", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
    def land(df: DataFrame, src: String, name: String): Unit = {
      val stage = tmp("txdedup_stage")
      df.coalesce(1).write.mode("overwrite").parquet(stage)
      val part = Files.list(Paths.get(stage))
        .filter(_.toString.endsWith(".parquet")).findFirst().get()
      Files.copy(part, Paths.get(src, name))
    }
    val src = tmp("txdedup_src"); val state = tmp("txdedup_state")
    val store = tmp("txdedup_store"); val cp = tmp("txdedup_cp")
    Files.delete(Paths.get(state)); Files.delete(Paths.get(store))

    // batch 0: two distinct docs — both admitted, one version per store
    land(docsDf(Seq(1L -> base, 2L -> other)), src, "b1.parquet")
    IngestStream.dedupTransactionalAvailable(spark, src, state, store, cp,
      streamId = "txdedup")
    def admittedIds = SnapshotStore.read(spark, store)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(admittedIds === Seq(1L, 2L))
    assert(SnapshotStore.currentVersion(spark, store) === Some(1L))
    assert(SnapshotStore.currentVersion(spark, state) === Some(1L))

    // batch 1: 5 near-dups 1 (cross-batch vs the state STORE), 7
    // duplicates 6 within-batch, 6 is novel
    land(docsDf(Seq(5L -> nearDup, 6L -> third, 7L -> third)),
      src, "b2.parquet")
    IngestStream.dedupTransactionalAvailable(spark, src, state, store, cp,
      streamId = "txdedup")
    assert(admittedIds === Seq(1L, 2L, 6L))
    assert(SnapshotStore.read(spark, state).select("doc_id").distinct()
      .as[Long].collect().sorted.toSeq === Seq(1L, 2L, 6L))
    val v2 = SnapshotStore.currentVersion(spark, store).get

    // crash-replay of batch 1 straight at the sinks: both stores carry
    // its txn marker, so the re-commit is a no-op on each
    val replayDocs = docsDf(Seq(6L -> third))
    assert(SnapshotStore.commitBatch(replayDocs, store, 4, "txdedup", 1L)
      === v2)
    assert(SnapshotStore.currentVersion(spark, store).get === v2)
    assert(admittedIds === Seq(1L, 2L, 6L))

    // re-triggering with no new files is a no-op (checkpoint drains empty)
    IngestStream.dedupTransactionalAvailable(spark, src, state, store, cp,
      streamId = "txdedup")
    assert(SnapshotStore.currentVersion(spark, store).get === v2)
    assert(admittedIds === Seq(1L, 2L, 6L))
  }

  test("paced drain: maxFilesPerTrigger=1 → bounded batches, one version each") {
    import graft.operators.SnapshotStore
    val src = tmp("paced_src"); val store = tmp("paced_store")
    val cp = tmp("paced_cp")
    def land(df: DataFrame, name: String): Unit = {
      val stage = tmp("paced_stage")
      df.coalesce(1).write.mode("overwrite").parquet(stage)
      val part = Files.list(Paths.get(stage))
        .filter(_.toString.endsWith(".parquet")).findFirst().get()
      Files.copy(part, Paths.get(src, name))
    }
    val fileDocs = (1L to 3L).map { i =>
      Seq((i, s"paced ingestion document number $i with enough text to " +
        s"produce several chunks of output ${"x" * (i.toInt * 10)}", "en",
        s"p$i.pdf", 90L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
    }
    fileDocs.zipWithIndex.foreach { case (df, i) => land(df, s"f$i.parquet") }

    // a 3-file backlog drained in ONE AvailableNow call, paced to 1 file
    // per micro-batch — each batch must commit exactly one store version
    IngestStream.transactionalAvailable(spark, src, store, cp,
      streamId = "paced", buckets = 4, chunkSize = 20, overlap = 5,
      dim = 8, maxFilesPerTrigger = Some(1))

    assert(SnapshotStore.currentVersion(spark, store) === Some(3L),
      "expected one published version per paced micro-batch")
    assert(SnapshotStore.lastCommittedBatch(spark, store, "paced")
      === Some(2L), "expected batch ids 0..2, one per file")

    // final state equals the batch build over the whole backlog
    val all = fileDocs.reduce(_ unionByName _)
    assert(rows(SnapshotStore.read(spark, store).drop("bucket"))
      === rows(IngestionPipeline.buildIndexFrom(all, 20, 5, 8)))

    // per-batch row bound: each version's delta is exactly ONE file's
    // chunk rows (multiset compare — file order is the source's choice)
    val counts = (1L to 3L)
      .map(v => SnapshotStore.read(spark, store, v).count())
    val deltas = counts.zip(0L +: counts.dropRight(1)).map(t => t._1 - t._2)
    val perFile = fileDocs
      .map(df => IngestionPipeline.buildIndexFrom(df, 20, 5, 8).count())
    assert(deltas.sorted === perFile.sorted,
      s"per-batch deltas $deltas != per-file chunk counts $perFile")
    assert(deltas.forall(d => d > 0 && d <= perFile.max),
      s"a paced batch exceeded the single-file bound: $deltas")
  }

  test("kill-window matrix: a writer dying at each commit crash point recovers exactly-once") {
    import graft.operators.SnapshotStore
    val docs = Seq(
      (1L, "kill window document one with some text to chunk", "en", "k1.pdf", 48L),
      (2L, "kill window document two carrying different words", "en", "k2.pdf", 49L),
      (3L, "kill window document three rounding out the batch", "en", "k3.pdf", 49L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    def land(df: DataFrame, src: String, name: String): Unit = {
      val stage = tmp("kill_stage")
      df.coalesce(1).write.mode("overwrite").parquet(stage)
      val part = Files.list(Paths.get(stage))
        .filter(_.toString.endsWith(".parquet")).findFirst().get()
      Files.copy(part, Paths.get(src, name))
    }
    def chain(e: Throwable): Iterator[Throwable] =
      Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
    val want = rows(IngestionPipeline.buildIndexFrom(docs, 20, 5, 8))

    // batch-0 (full-snapshot commit) dying at each of the three windows:
    // after the attempt-dir data write, after the manifest tmp write
    // (before its create-exclusive), and after the manifest lands
    // (published, checkpoint not yet advanced) — recovery must land the
    // store in the identical exactly-once state in all three
    for (point <- Seq("data-dir-written", "manifest-tmp-written",
        "manifest-renamed")) {
      val src = tmp(s"kill_src"); val store = tmp(s"kill_store")
      val cp = tmp(s"kill_cp")
      Files.delete(Paths.get(store))
      land(docs, src, "docs.parquet")
      val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
      SnapshotStore.FaultInjection.arm { p =>
        if (p == point && fired.compareAndSet(false, true))
          throw new RuntimeException(s"injected crash at $p")
      }
      val sid = s"kill_$point"
      try {
        val e = intercept[Exception] {
          IngestStream.transactionalAvailable(spark, src, store, cp,
            streamId = sid, buckets = 4, chunkSize = 20, overlap = 5,
            dim = 8)
        }
        assert(chain(e).exists(t =>
          Option(t.getMessage).exists(_.contains("injected crash"))),
          s"$point: stream failed for an unexpected reason: $e")
      } finally SnapshotStore.FaultInjection.disarm()

      // the torn store is never half-visible: either nothing published
      // (pre-rename windows) or the full atomic version (post-rename)
      val visible = SnapshotStore.currentVersion(spark, store)
      if (point == "manifest-renamed") assert(visible === Some(1L))
      else assert(visible === None, s"$point published a torn version")
      visible.foreach { _ =>
        assert(rows(SnapshotStore.read(spark, store).drop("bucket"))
          === want)
      }

      // recovery: the checkpoint never advanced, so the re-run replays
      // batch 0 — orphan data dirs are replaced, tmp manifests ignored,
      // and an already-published version is detected by its txn marker
      IngestStream.transactionalAvailable(spark, src, store, cp,
        streamId = sid, buckets = 4, chunkSize = 20, overlap = 5, dim = 8)
      assert(SnapshotStore.currentVersion(spark, store) === Some(1L),
        s"$point: recovery must yield exactly one linear version")
      assert(SnapshotStore.lastCommittedBatch(spark, store, sid)
        === Some(0L))
      assert(rows(SnapshotStore.read(spark, store).drop("bucket")) === want,
        s"$point: recovered store must equal the no-crash build")
      // maintenance over the recovered store keeps it intact
      SnapshotStore.vacuum(spark, store, keepVersions = 1)
      assert(rows(SnapshotStore.read(spark, store).drop("bucket")) === want)
    }

    // the UPSERT path's sharpest window: batch 1 publishes its manifest
    // and dies before the checkpoint commit — the replay must detect the
    // txn marker and no-op instead of double-applying the upsert
    locally {
      val src = tmp("kill2_src"); val store = tmp("kill2_store")
      val cp = tmp("kill2_cp")
      Files.delete(Paths.get(store))
      land(docs, src, "b0.parquet")
      IngestStream.transactionalAvailable(spark, src, store, cp,
        streamId = "kill_upsert", buckets = 4, chunkSize = 20, overlap = 5,
        dim = 8)
      val reparsed = docs.filter($"doc_id" === 1L)
        .withColumn("text", concat(col("text"), lit(" revised")))
      land(reparsed, src, "b1.parquet")
      val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
      SnapshotStore.FaultInjection.arm { p =>
        if (p == "manifest-renamed" && fired.compareAndSet(false, true))
          throw new RuntimeException("injected crash at manifest-renamed")
      }
      try intercept[Exception] {
        IngestStream.transactionalAvailable(spark, src, store, cp,
          streamId = "kill_upsert", buckets = 4, chunkSize = 20,
          overlap = 5, dim = 8)
      } finally SnapshotStore.FaultInjection.disarm()
      assert(SnapshotStore.currentVersion(spark, store) === Some(2L))

      IngestStream.transactionalAvailable(spark, src, store, cp,
        streamId = "kill_upsert", buckets = 4, chunkSize = 20, overlap = 5,
        dim = 8)
      assert(SnapshotStore.currentVersion(spark, store) === Some(2L),
        "replayed published upsert must no-op, not re-publish")
      val expected = rows(IngestionPipeline.buildIndexFrom(
        docs.filter($"doc_id" =!= 1L).unionByName(reparsed), 20, 5, 8))
      assert(rows(SnapshotStore.read(spark, store).drop("bucket"))
        === expected)
      assert(SnapshotStore.lastCommittedBatch(spark, store, "kill_upsert")
        === Some(1L))
    }
  }

  test("exactly-once streaming vector upsert into VersionedIvf: " +
      "bootstrap + drain ≡ batch verbs, re-parse replaces, replay " +
      "no-ops, crash window recovers, geometry rides every version") {
    import graft.operators.{SnapshotStore, VersionedIvf}
    val docsA = Seq(
      (1L, "stream vector document one with some text to chunk", "en", "v1.pdf", 50L),
      (2L, "stream vector document two carrying different words", "en", "v2.pdf", 51L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val docsB = Seq(
      (3L, "stream vector document three rounding out the corpus", "en", "v3.pdf", 52L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    def land(df: DataFrame, src: String, name: String): Unit = {
      val stage = tmp("vup_stage")
      df.coalesce(1).write.mode("overwrite").parquet(stage)
      val part = Files.list(Paths.get(stage))
        .filter(_.toString.endsWith(".parquet")).findFirst().get()
      Files.copy(part, Paths.get(src, name))
    }
    def vecRows(docs: DataFrame): DataFrame =
      IngestStream.indexRows(docs, 20, 5, 8)
        .select(graft.functions.CrossHash.hash60(
          org.apache.spark.sql.functions.concat_ws("_",
            col("doc_id"), col("chunk_idx"))).as("vec_id"),
          col("embedding"))
    def content(root: String): Seq[String] =
      SnapshotStore.read(spark, root)
        .select(col("doc_id"), col("embedding"))
        .collect().map(r => r.getLong(0) + "|" +
          r.getSeq[Float](1).mkString(",")).toSeq.sorted

    val src = tmp("vup_src"); val cp = tmp("vup_cp")
    val root = tmp("vup_root"); Files.delete(Paths.get(root))

    // batch 0 bootstraps: trains seeds from the first batch, publishes
    // version 1 with geometry + txn marker in one manifest
    land(docsA, src, "a.parquet")
    IngestStream.vectorUpsertAvailable(spark, src, root, cp,
      streamId = "vup", bootstrapCells = 4, buckets = 4,
      chunkSize = 20, overlap = 5, dim = 8)
    assert(SnapshotStore.currentVersion(spark, root) === Some(1L))
    assert(SnapshotStore.lastCommittedBatch(spark, root, "vup")
      === Some(0L))
    val g1 = VersionedIvf.storedCentroids(spark, root)
      .map { case (i, q) => (i, q.toSeq) }.toSeq
    val wantA = vecRows(docsA).collect()
      .map(r => r.getLong(0) + "|" + r.getSeq[Float](1).mkString(","))
      .toSeq.sorted
    assert(content(root) === wantA)

    // batch 1: new doc + RE-PARSE of doc 1 — positional vector ids must
    // REPLACE doc 1's old vectors, not append beside them
    val reparsed = docsA.filter($"doc_id" === 1L)
      .withColumn("text", concat(col("text"), lit(" revised")))
    land(docsB.unionByName(reparsed), src, "b.parquet")
    IngestStream.vectorUpsertAvailable(spark, src, root, cp,
      streamId = "vup", bootstrapCells = 4, buckets = 4,
      chunkSize = 20, overlap = 5, dim = 8)
    assert(SnapshotStore.currentVersion(spark, root) === Some(2L))
    // appending never moves geometry
    assert(VersionedIvf.storedCentroids(spark, root)
      .map { case (i, q) => (i, q.toSeq) }.toSeq === g1)
    val wantAB = vecRows(
      docsA.filter($"doc_id" =!= 1L).unionByName(reparsed)
        .unionByName(docsB)).collect()
      .map(r => r.getLong(0) + "|" + r.getSeq[Float](1).mkString(","))
      .toSeq.sorted
    assert(content(root) === wantAB,
      "re-parsed chunks must replace their positional predecessors")
    assert(SnapshotStore.read(spark, root).groupBy("doc_id").count()
      .filter(col("count") > 1).count() === 0L)

    // nothing new → drain publishes nothing
    IngestStream.vectorUpsertAvailable(spark, src, root, cp,
      streamId = "vup", bootstrapCells = 4, buckets = 4,
      chunkSize = 20, overlap = 5, dim = 8)
    assert(SnapshotStore.currentVersion(spark, root) === Some(2L))

    // crash window: batch 2 publishes its manifest, writer dies before
    // the checkpoint advances — the replay must detect the txn marker
    // and no-op instead of double-applying
    val docsC = Seq(
      (4L, "stream vector document four arriving after the crash", "en", "v4.pdf", 53L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    land(docsC, src, "c.parquet")
    val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
    SnapshotStore.FaultInjection.arm { p =>
      if (p == "manifest-renamed" && fired.compareAndSet(false, true))
        throw new RuntimeException("injected crash at manifest-renamed")
    }
    try intercept[Exception] {
      IngestStream.vectorUpsertAvailable(spark, src, root, cp,
        streamId = "vup", bootstrapCells = 4, buckets = 4,
        chunkSize = 20, overlap = 5, dim = 8)
    } finally SnapshotStore.FaultInjection.disarm()
    assert(SnapshotStore.currentVersion(spark, root) === Some(3L))
    IngestStream.vectorUpsertAvailable(spark, src, root, cp,
      streamId = "vup", bootstrapCells = 4, buckets = 4,
      chunkSize = 20, overlap = 5, dim = 8)
    assert(SnapshotStore.currentVersion(spark, root) === Some(3L),
      "replayed published batch must no-op, not re-publish")
    assert(SnapshotStore.lastCommittedBatch(spark, root, "vup")
      === Some(2L))
    val wantABC = vecRows(
      docsA.filter($"doc_id" =!= 1L).unionByName(reparsed)
        .unionByName(docsB).unionByName(docsC)).collect()
      .map(r => r.getLong(0) + "|" + r.getSeq[Float](1).mkString(","))
      .toSeq.sorted
    assert(content(root) === wantABC)

    // the streamed store IS a live VersionedIvf index: search serves,
    // and a maintenance verb composes (OCC + carried geometry)
    val queries = vecRows(docsA).limit(2)
    val n = VersionedIvf.storedCentroids(spark, root).length
    assert(VersionedIvf.search(spark, root, queries, nProbe = n,
      topK = 2).count() === 4L)
    SnapshotStore.vacuum(spark, root, keepVersions = 1)
    assert(content(root) === wantABC)
    assert(SnapshotStore.lastCommittedBatch(spark, root, "vup")
      === Some(2L),
      "vacuum must not destroy the stream's replay state")
  }

  test("exactly-once streamed upsert into the COMPRESSED index " +
      "(VersionedIvfAdc): bootstrap trains both quantizers from batch 0, " +
      "later batches encode against the STORED book, re-parse replaces, " +
      "replay no-ops, crash window recovers, geometry rides every " +
      "version") {
    import graft.operators.{IvfIndex, PqIndex, SnapshotStore,
      VersionedIvfAdc}
    val Dim = 8; val M = 2; val K = 4; val Cells = 2
    val docsA = Seq(
      (1L, "stream vector document one with some text to chunk", "en", "v1.pdf", 50L),
      (2L, "stream vector document two carrying different words", "en", "v2.pdf", 51L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val docsB = Seq(
      (3L, "stream vector document three rounding out the corpus", "en", "v3.pdf", 52L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    def land(df: DataFrame, src: String, name: String): Unit = {
      val stage = tmp("adcup_stage")
      df.coalesce(1).write.mode("overwrite").parquet(stage)
      val part = Files.list(Paths.get(stage))
        .filter(_.toString.endsWith(".parquet")).findFirst().get()
      Files.copy(part, Paths.get(src, name))
    }
    def vecRows(docs: DataFrame): DataFrame =
      IngestStream.indexRows(docs, 20, 5, Dim)
        .select(graft.functions.CrossHash.hash60(
          org.apache.spark.sql.functions.concat_ws("_",
            col("doc_id"), col("chunk_idx"))).as("vec_id"),
          col("embedding"))
    // expected store content = the expected vector set assigned AND
    // PQ-encoded against the quantizers STORED at the head: checks
    // replace semantics and that every batch encoded against the
    // bootstrap book (not a per-batch retrain)
    def expected(vecs: DataFrame, root: String): Seq[String] = {
      val coarse = VersionedIvfAdc.storedCoarse(spark, root)
      val book = VersionedIvfAdc.storedBook(spark, root)
      val codes = PqIndex.encodeFused(vecs, book, dim = Dim, m = M)
        .groupBy("vec_id")
        .agg(expr("transform(array_sort(collect_list(struct(j, code)))," +
          " x -> x.code)").as("codes"))
      IvfIndex.cellAssign(vecs, coarse).select("vec_id", "cent_id")
        .join(codes, "vec_id")
        .collect().map(r => r.getLong(0) + "|" + r.getLong(1) + "|" +
          r.getSeq[Long](2).mkString(",")).toSeq.sorted
    }
    def content(root: String): Seq[String] =
      SnapshotStore.read(spark, root)
        .select(col("doc_id"), col("cent_id"), col("codes"))
        .collect().map(r => r.getLong(0) + "|" + r.getLong(1) + "|" +
          r.getSeq[Long](2).mkString(",")).toSeq.sorted
    def drain(src: String, root: String, cp: String): Unit =
      IngestStream.vectorUpsertAdcAvailable(spark, src, root, cp,
        streamId = "adcup", bootstrapCells = Cells, buckets = 4,
        chunkSize = 20, overlap = 5, dim = Dim, m = M, k = K)

    val src = tmp("adcup_src"); val cp = tmp("adcup_cp")
    val root = tmp("adcup_root"); Files.delete(Paths.get(root))

    // batch 0 bootstraps: coarse cells + PQ book trained from the first
    // batch (lowest-k hashed ids, renumbered 0..k-1), rows + geometry +
    // txn marker in ONE manifest
    land(docsA, src, "a.parquet")
    drain(src, root, cp)
    assert(SnapshotStore.currentVersion(spark, root) === Some(1L))
    assert(SnapshotStore.lastCommittedBatch(spark, root, "adcup")
      === Some(0L))
    assert(VersionedIvfAdc.storedGeometry(spark, root) === ((Dim, M, K)))
    val book1 = VersionedIvfAdc.storedBook(spark, root)
      .map { case (i, q) => (i, q.toSeq) }.toSeq
    assert(book1.map(_._1) === (0L until K.toLong),
      "bootstrap book must be renumbered 0..k-1 (positional decode)")
    assert(content(root) === expected(vecRows(docsA), root))

    // batch 1: new doc + RE-PARSE of doc 1 — positional ids REPLACE;
    // encoding must use the STORED book, geometry must not move
    val reparsed = docsA.filter($"doc_id" === 1L)
      .withColumn("text", concat(col("text"), lit(" revised")))
    land(docsB.unionByName(reparsed), src, "b.parquet")
    drain(src, root, cp)
    assert(SnapshotStore.currentVersion(spark, root) === Some(2L))
    assert(VersionedIvfAdc.storedBook(spark, root)
      .map { case (i, q) => (i, q.toSeq) }.toSeq === book1,
      "streamed appends must never move the stored codebook")
    val contentAB = vecRows(
      docsA.filter($"doc_id" =!= 1L).unionByName(reparsed)
        .unionByName(docsB))
    assert(content(root) === expected(contentAB, root),
      "re-parsed chunks must replace their positional predecessors, " +
        "encoded against the stored quantizers")
    assert(SnapshotStore.read(spark, root).groupBy("doc_id").count()
      .filter(col("count") > 1).count() === 0L)

    // nothing new → drain publishes nothing
    drain(src, root, cp)
    assert(SnapshotStore.currentVersion(spark, root) === Some(2L))

    // crash window: manifest renamed, writer dies before the checkpoint
    // advances — replay must detect the marker and no-op
    val docsC = Seq(
      (4L, "stream vector document four arriving after the crash", "en", "v4.pdf", 53L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    land(docsC, src, "c.parquet")
    val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
    SnapshotStore.FaultInjection.arm { p =>
      if (p == "manifest-renamed" && fired.compareAndSet(false, true))
        throw new RuntimeException("injected crash at manifest-renamed")
    }
    try intercept[Exception] { drain(src, root, cp) }
    finally SnapshotStore.FaultInjection.disarm()
    assert(SnapshotStore.currentVersion(spark, root) === Some(3L))
    drain(src, root, cp)
    assert(SnapshotStore.currentVersion(spark, root) === Some(3L),
      "replayed published batch must no-op, not re-publish")
    assert(SnapshotStore.lastCommittedBatch(spark, root, "adcup")
      === Some(2L))
    val contentABC = contentAB.unionByName(vecRows(docsC))
    assert(content(root) === expected(contentABC, root))

    // the streamed store IS a live VersionedIvfAdc index: search serves
    // from codes alone, retrain composes (the maintenance verb the
    // drift monitor schedules), and vacuum keeps the replay state
    val queries = vecRows(docsA).limit(2)
    val nCells = VersionedIvfAdc.storedCoarse(spark, root).length
    assert(VersionedIvfAdc.search(spark, root, queries, nProbe = nCells,
      topK = 2).count() === 4L)
    VersionedIvfAdc.retrain(spark, root, contentABC, iters = 1)
    assert(SnapshotStore.currentVersion(spark, root) === Some(4L))
    SnapshotStore.vacuum(spark, root, keepVersions = 1)
    assert(SnapshotStore.lastCommittedBatch(spark, root, "adcup")
      === Some(2L),
      "vacuum must not destroy the stream's replay state")
    assert(content(root) === expected(contentABC, root),
      "retrain + vacuum must re-encode every vector against the new " +
        "book and keep the corpus complete")
  }

  test("streaming incremental cluster maintenance: every drained batch " +
      "leaves the label store equal to a FROM-SCRATCH re-cluster of " +
      "everything seen, a crash between the label and print commits " +
      "heals exactly-once, and the stores version per batch") {
    import graft.operators.{DupClusters, SnapshotStore}
    def doc(id: Long, text: String) = (id, text, "en", s"d$id.pdf",
      text.length.toLong)
    // three batches with planted exact duplicates WITHIN and ACROSS
    // batches: 2≡1 (within b0), 11≡3 (cross-batch — must hash-hit the
    // stored rep), 12≡13 (within b1), 21≡15 (cross), 22≡11≡3 (a copy
    // of a copy — must join the original's cluster transitively)
    val t = (i: Long) => s"document number $i carrying its own words " +
      s"and content body token$i extra filler material"
    val b0 = Seq(doc(1, t(1)), doc(2, t(1)), doc(3, t(3)), doc(4, t(4)),
      doc(5, t(5)))
    val b1 = Seq(doc(11, t(3)), doc(12, t(12)), doc(13, t(12)),
      doc(14, t(14)), doc(15, t(15)))
    val b2 = Seq(doc(21, t(15)), doc(22, t(3)), doc(23, t(23)))
    def toDf(xs: Seq[(Long, String, String, String, Long)]) =
      xs.toDF("doc_id", "text", "lang", "source", "n_chars")
    def land(xs: Seq[(Long, String, String, String, Long)], src: String,
        name: String): Unit = {
      val stage = tmp("lm_stage")
      toDf(xs).coalesce(1).write.mode("overwrite").parquet(stage)
      val part = Files.list(Paths.get(stage))
        .filter(_.toString.endsWith(".parquet")).findFirst().get()
      Files.copy(part, Paths.get(src, name))
    }
    val src = tmp("lm_src"); val cp = tmp("lm_cp")
    val lroot = tmp("lm_labels"); Files.delete(Paths.get(lroot))
    val proot = tmp("lm_prints"); Files.delete(Paths.get(proot))
    def drain(): Unit = IngestStream.labelMaintainAvailable(spark, src,
      lroot, proot, cp, streamId = "lm", buckets = 4)
    def stored: Seq[(Long, Long)] =
      DupClusters.readLabels(spark, lroot)
        .as[(Long, Long)].collect().sorted.toSeq
    def scratch(xs: Seq[(Long, String, String, String, Long)])
        : Seq[(Long, Long)] =
      DupClusters.clusterDocs(toDf(xs).select("doc_id", "text"))
        .as[(Long, Long)].collect().sorted.toSeq

    land(b0, src, "b0.parquet"); drain()
    assert(stored === scratch(b0))
    assert(SnapshotStore.lastCommittedBatch(spark, lroot, "lm")
      === Some(0L))
    land(b1, src, "b1.parquet"); drain()
    assert(stored === scratch(b0 ++ b1),
      "incremental labels diverged from the from-scratch closure " +
        "after a cross-batch exact duplicate")
    // crash window: the LABEL commit publishes, the writer dies before
    // the PRINT commit — the replay must complete the prints half
    // against the pre-batch print state and not double-apply labels
    land(b2, src, "b2.parquet")
    val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
    SnapshotStore.FaultInjection.arm { p =>
      if (p == "manifest-renamed" && fired.compareAndSet(false, true))
        throw new RuntimeException("injected crash between commits")
    }
    try intercept[Exception] { drain() }
    finally SnapshotStore.FaultInjection.disarm()
    assert(fired.get, "crash arm never fired — spec inert")
    drain() // heal
    val all = b0 ++ b1 ++ b2
    assert(stored === scratch(all),
      "post-crash replay diverged from the from-scratch closure")
    assert(SnapshotStore.lastCommittedBatch(spark, lroot, "lm")
      === Some(2L))
    assert(SnapshotStore.lastCommittedBatch(spark, proot, "lm")
      === Some(2L))
    // no duplicate label rows survived the replay
    assert(DupClusters.readLabels(spark, lroot).groupBy("doc_id").count()
      .filter(col("count") > 1).count() === 0L)
    // the print store holds exactly one fingerprint per distinct text
    assert(SnapshotStore.read(spark, proot).select("h").distinct()
      .count() === all.map(_._2).distinct.size.toLong)
    assert(SnapshotStore.read(spark, proot).count()
      === all.map(_._2).distinct.size.toLong)
    // idle drain publishes nothing
    drain()
    assert(SnapshotStore.lastCommittedBatch(spark, lroot, "lm")
      === Some(2L))
    // the stored state keeps serving the d22-style derivations: every
    // version time-travels (the pre-b2 labels are version 2's)
    assert(DupClusters.readLabels(spark, lroot, version = 2L)
      .as[(Long, Long)].collect().sorted.toSeq === scratch(b0 ++ b1))
  }

  test("CHECK constraint rejects a violating streaming batch before write") {
    import graft.operators.SnapshotStore
    import spark.implicits._
    val store = tmp("check_stream_store")
    def batch(xs: (Long, Long)*) = xs.toDF("doc_id", "n_tokens")
    // batch 0 seeds the store through the streaming sink path, then the
    // constraint registers
    val v1 = SnapshotStore.commitBatch(batch(1L -> 10L, 2L -> 20L),
      store, 4, "checked", batchId = 0L)
    SnapshotStore.addCheck(spark, store, "positive_tokens", "n_tokens > 0")
    val vChecked = SnapshotStore.currentVersion(spark, store).get

    // a violating micro-batch fails BEFORE write: version unmoved, txn
    // watermark unmoved (the batch is NOT marked committed — a fixed
    // re-delivery must be able to land under the same batch id)
    intercept[graft.operators.SnapshotCheckException] {
      SnapshotStore.commitBatch(batch(3L -> -5L), store, 4, "checked",
        batchId = 1L)
    }
    assert(SnapshotStore.currentVersion(spark, store).get === vChecked)
    assert(SnapshotStore.lastCommittedBatch(spark, store, "checked")
      === Some(0L))

    // the corrected re-delivery of batch 1 lands normally
    val v3 = SnapshotStore.commitBatch(batch(3L -> 5L), store, 4,
      "checked", batchId = 1L)
    assert(v3 > vChecked)
    assert(SnapshotStore.lastCommittedBatch(spark, store, "checked")
      === Some(1L))
    assert(SnapshotStore.read(spark, store).count() === 3L)
    assert(v1 === 1L)
  }

  test("streaming winnow-print maintenance: per-batch increments land " +
      "on the from-scratch print table, re-parse replaces, replay " +
      "no-ops, stats declare, compaction stays invisible") {
    import graft.operators.{SnapshotStore, Winnowing}
    val src = tmp("wprint_src"); val cp = tmp("wprint_cp")
    val store = tmp("wprint_store")
    Files.delete(Paths.get(store))
    def land(df: DataFrame, name: String): Unit = {
      val stage = tmp("wprint_stage")
      df.coalesce(1).write.mode("overwrite").parquet(stage)
      val part = Files.list(Paths.get(stage))
        .filter(_.toString.endsWith(".parquet")).findFirst().get()
      Files.copy(part, Paths.get(src, name))
    }
    val common = "zq xv jk wm pt rb common stolen span of text nd lf yg hs"
    def docsDf(rows: Seq[(Long, String)]): DataFrame =
      rows.map { case (id, t) => (id, t, "en", s"w$id.pdf", 60L) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
    val first = docsDf(Seq(
      1L -> ("alpha beta gamma " + common + " delta epsilon"),
      3L -> "no overlap with anything else whatsoever in this doc"))
    val second = docsDf(Seq(
      2L -> ("totally other prefix here " + common + " and a suffix")))
    land(first, "f0.parquet"); land(second, "f1.parquet")

    def drain(): Unit = IngestStream.printMaintainAvailable(spark, src,
      store, cp, streamId = "wprint", buckets = 2,
      maxFilesPerTrigger = Some(1), compactOver = Some(2))
    def stored: Seq[(Long, Long)] = Winnowing.readPrints(spark, store)
      .as[(Long, Long)].collect().sorted.toSeq
    def scratch(docs: DataFrame): Seq[(Long, Long)] =
      Winnowing.fingerprints(docs.select("doc_id", "text"))
        .as[(Long, Long)].collect().sorted.toSeq

    drain()
    val all = first.unionByName(second)
    assert(stored === scratch(all),
      "streamed increments diverged from the from-scratch print table")
    assert(SnapshotStore.lastCommittedBatch(spark, store, "wprint")
      === Some(1L))
    // the derived pair report serves from the store (the d27 read path)
    assert(Winnowing.pairsFromPrints(Winnowing.readPrints(spark, store),
        minShared = 2, dfCap = 50)
      .as[(Long, Long, Long)].collect().sorted.toSeq
      === Winnowing.sharedFingerprints(all, minShared = 2, dfCap = 50)
        .as[(Long, Long, Long)].collect().sorted.toSeq)
    // the sink declared the writePrints stats on bootstrap
    assert(SnapshotStore.storedStatCols(spark, store,
      SnapshotStore.currentVersion(spark, store).get)
      .toSet === Set("doc_id", "fp"))

    // replay with nothing new → no publish at all
    val vBefore = SnapshotStore.currentVersion(spark, store)
    drain()
    assert(SnapshotStore.currentVersion(spark, store) === vBefore)

    // re-parse: doc 2's text changes; its stale prints must vanish
    val reparsed = docsDf(Seq(2L ->
      "completely fresh text after a re-parse sharing nothing"))
    land(reparsed, "f2.parquet")
    drain()
    assert(stored === scratch(first.unionByName(reparsed)),
      "re-parsed document did not shed its stale prints")
    assert(SnapshotStore.lastCommittedBatch(spark, store, "wprint")
      === Some(2L))
  }

  test("streamed auto-compaction: per-bucket file count stays bounded " +
      "while markers, reads, and incremental re-triggers are untouched") {
    import graft.operators.SnapshotStore
    val src = tmp("frag_src"); val store = tmp("frag_store")
    val cp = tmp("frag_cp")
    def land(df: DataFrame, name: String): Unit = {
      val stage = tmp("frag_stage")
      df.coalesce(1).write.mode("overwrite").parquet(stage)
      val part = Files.list(Paths.get(stage))
        .filter(_.toString.endsWith(".parquet")).findFirst().get()
      Files.copy(part, Paths.get(src, name))
    }
    def doc(i: Long): DataFrame =
      Seq((i, s"fragmentation stream document number $i with enough " +
        s"text to chunk ${"x" * (i.toInt * 7 % 40)}", "en", s"f$i.pdf",
        80L)).toDF("doc_id", "text", "lang", "source", "n_chars")
    val docs = (1L to 6L).map(doc)
    docs.zipWithIndex.foreach { case (d, i) => land(d, s"f$i.parquet") }

    // six paced single-doc batches, compaction armed at 2 files/bucket:
    // every batch is a pure-delta upsert (fresh doc_ids), so WITHOUT the
    // policy the hot bucket's file count grows one per batch forever —
    // the policy's probe runs after each commit and compacts any bucket
    // the moment it crosses the cap, so steady state is ≤ cap files
    IngestStream.transactionalAvailable(spark, src, store, cp,
      streamId = "frag", buckets = 2, chunkSize = 20, overlap = 5,
      dim = 8, maxFilesPerTrigger = Some(1), compactOver = Some(2))

    def perBucket: Map[Long, Int] = SnapshotStore.manifestEntries(spark,
        store, SnapshotStore.currentVersion(spark, store).get)
      .groupMapReduce(_._1)(_ => 1)(_ + _)
    assert(perBucket.values.forall(_ <= 2),
      s"auto-compaction left a bucket over budget: $perBucket")
    // the policy actually fired (6 batches over 2 buckets must cross a
    // 2-file cap at least once) and its rewrites are the SCOPED form
    val ops = SnapshotStore.history(spark, store)
      .select("op").as[String].collect().toSeq
    assert(ops.contains("optimize_scoped"),
      s"no scoped compaction in history: $ops")
    // compaction carried the replay watermark: the last batch id, not
    // the id at the last pre-compaction publish
    assert(SnapshotStore.lastCommittedBatch(spark, store, "frag")
      === Some(5L))
    // row state ≡ the batch build over the whole backlog
    val all = docs.reduce(_ unionByName _)
    assert(rows(SnapshotStore.read(spark, store).drop("bucket"))
      === rows(IngestionPipeline.buildIndexFrom(all, 20, 5, 8)))

    // incremental re-trigger ACROSS a compaction: one new file lands;
    // the checkpoint + carried marker must make the re-run embed only
    // it (batch id 6), and the result equals the 7-doc batch build
    land(doc(7L), "f6.parquet")
    IngestStream.transactionalAvailable(spark, src, store, cp,
      streamId = "frag", buckets = 2, chunkSize = 20, overlap = 5,
      dim = 8, maxFilesPerTrigger = Some(1), compactOver = Some(2))
    assert(SnapshotStore.lastCommittedBatch(spark, store, "frag")
      === Some(6L))
    assert(perBucket.values.forall(_ <= 2),
      s"re-trigger broke the file budget: $perBucket")
    assert(rows(SnapshotStore.read(spark, store).drop("bucket"))
      === rows(IngestionPipeline.buildIndexFrom(
        all.unionByName(doc(7L)), 20, 5, 8)))
  }
}
