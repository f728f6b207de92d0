package graft

import java.util.concurrent.TimeUnit

import scala.jdk.CollectionConverters._

import graft.operators.SnapshotStore

/** Cross-process store concurrency (round-6 verdict item 2): two
  * SEPARATE JVMs race `withConflictRetry` mutations on one SnapshotStore
  * root — the production multi-writer shape. Intra-JVM races share
  * memory and a single Hadoop FileSystem cache entry; only distinct
  * processes prove the on-disk protocol (attempt-unique data dirs +
  * create-exclusive manifest CAS) itself. */
class StoreRaceSpec extends SparkTestBase {

  private val Rounds = 5

  private def jvmOpens: List[String] = {
    val in = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala.toList
    val paired = in.sliding(2).collect {
      case List(a, b) if a == "--add-opens" || a == "--add-exports" =>
        List(a, b)
    }.flatten.toList
    val inline = in.filter(a =>
      a.startsWith("--add-opens=") || a.startsWith("--add-exports="))
    paired ++ inline
  }

  test("two JVMs racing withConflictRetry: both deltas land, history linear, vacuum clean") {
    val root = java.nio.file.Files.createTempDirectory("graft_race").toString
    java.nio.file.Files.delete(java.nio.file.Paths.get(root))
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val cp = System.getProperty("java.class.path")
    def launch(id: String, base: Long): Process = {
      val cmd = (List(javaBin) ++ jvmOpens ++ List("-Xmx3g", "-cp", cp,
        "graft.StoreRace", root, id, base.toString, Rounds.toString, "4"))
      new ProcessBuilder(cmd.asJava)
        .redirectErrorStream(true)
        .redirectOutput(new java.io.File(s"target/store-race-$id.log"))
        .start()
    }
    val p1 = launch("alpha", 1000L)
    val p2 = launch("beta", 2000L)
    assert(p1.waitFor(600, TimeUnit.SECONDS), "writer alpha timed out")
    assert(p2.waitFor(600, TimeUnit.SECONDS), "writer beta timed out")
    def log(id: String): String = scala.util.Try(
      scala.io.Source.fromFile(s"target/store-race-$id.log").mkString)
      .getOrElse("<no log>")
    assert(p1.exitValue() === 0, s"alpha failed:\n${log("alpha")}")
    assert(p2.exitValue() === 0, s"beta failed:\n${log("beta")}")
    assert(log("alpha").contains("RACE_DONE alpha"))
    assert(log("beta").contains("RACE_DONE beta"))

    // every successful mutation published exactly one version → the
    // history is the contiguous range 1..2·Rounds, no gaps, no extras
    val total = 2L * Rounds
    assert(SnapshotStore.currentVersion(spark, root) === Some(total))
    (1L to total).foreach { v =>
      assert(new java.io.File(f"$root/_versions/v$v%05d.manifest").exists,
        s"version $v missing — non-linear history")
    }

    // both writers' full deltas landed with the payloads they wrote —
    // a lost update (the silently-overwritten-manifest failure mode the
    // create-exclusive CAS closes) would drop a row here
    def contents = SnapshotStore.read(spark, root)
      .select("doc_id", "payload").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val want = (for {
      (id, base) <- Seq(("alpha", 1000L), ("beta", 2000L))
      i <- 1 to Rounds
    } yield (base + i, s"$id-$i")).toMap
    assert(contents === want)

    // losers' unreferenced attempt dirs are garbage vacuum reaps without
    // touching anything a retained manifest references
    SnapshotStore.vacuum(spark, root, keepVersions = 1)
    assert(contents === want)
    assert(SnapshotStore.currentVersion(spark, root) === Some(total))

    // the first-commit stats declaration survived the whole race, and
    // EVERY file — both writers', winners and retry survivors — has a
    // recorded envelope: a far-off-range read prunes to zero files (an
    // unrecorded file would be unprunable and keep > 0), while the real
    // ranges read back exactly
    assert(SnapshotStore.storedStatCols(spark, root, total) === Seq("n"))
    val (kNone, tAll) = SnapshotStore.skippingReport(spark, root,
      "n", 9000000L, 9100000L)
    assert(tAll > 0 && kNone === 0,
      s"$kNone of $tAll files lack a stats envelope after the race")
    assert(SnapshotStore.readWhere(spark, root, "n",
      1001L, 1000L + Rounds).count() === Rounds.toLong)
    assert(SnapshotStore.readWhere(spark, root, "n",
      2001L, 2000L + Rounds).count() === Rounds.toLong)
  }
}
