package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.Scd2

class Scd2Spec extends SparkTestBase {
  import spark.implicits._

  private val t0 = to_timestamp(lit("2024-01-01"))
  private val t1 = to_timestamp(lit("2024-02-01"))
  private val t2 = to_timestamp(lit("2024-03-01"))

  private def dim(rows: (Long, String, String, String, Boolean)*) =
    rows.toDF("k", "attr", "from_s", "to_s", "is_current")
      .select(col("k"), col("attr"),
        to_timestamp(col("from_s")).as("valid_from"),
        to_timestamp(col("to_s")).as("valid_to"),
        col("is_current"))

  test("evolve closes changed, keeps unchanged, inserts new, preserves history") {
    val base = dim(
      (1L, "a1", "2024-01-01", null, true),
      (1L, "a0", "2023-01-01", "2024-01-01", false), // history row
      (2L, "b1", "2024-01-01", null, true),
      (3L, "c1", "2024-01-01", null, true))
    val upd = Seq((1L, "a2"), (2L, "b1"), (4L, "d1")).toDF("k", "attr")

    val out = Scd2.evolve(base, upd, "k", Seq("attr"), t1)
      .select(col("k"), col("attr"),
        date_format(col("valid_from"), "yyyy-MM-dd").as("f"),
        date_format(col("valid_to"), "yyyy-MM-dd").as("t"),
        col("is_current"))
      .orderBy("k", "f")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        Option(r.getString(3)).orNull, r.getBoolean(4))).toSeq

    assert(out === Seq(
      (1L, "a0", "2023-01-01", "2024-01-01", false), // untouched history
      (1L, "a1", "2024-01-01", "2024-02-01", false), // closed out
      (1L, "a2", "2024-02-01", null, true),          // new version
      (2L, "b1", "2024-01-01", null, true),          // unchanged no-op
      (3L, "c1", "2024-01-01", null, true),          // not in batch: open
      (4L, "d1", "2024-02-01", null, true)))         // brand-new key
  }

  test("evolve is null-safe on tracked attributes") {
    val base = dim((1L, null, "2024-01-01", null, true))
    val upd = Seq((1L, Option.empty[String])).toDF("k", "attr")
    val out = Scd2.evolve(base, upd, "k", Seq("attr"), t1)
    assert(out.count() === 1)                      // null <=> null: no-op
    assert(out.filter(col("is_current")).count() === 1)

    val upd2 = Seq((1L, Some("x"))).toDF("k", "attr")
    val out2 = Scd2.evolve(base, upd2, "k", Seq("attr"), t1)
    assert(out2.count() === 2)                     // null -> x: versioned
  }

  test("asOf reads the version valid at a point in time") {
    val base = dim((1L, "a1", "2024-01-01", null, true))
    val v2 = Scd2.evolve(base, Seq((1L, "a2")).toDF("k", "attr"), "k",
      Seq("attr"), t1)
    val v3 = Scd2.evolve(v2, Seq((1L, "a3")).toDF("k", "attr"), "k",
      Seq("attr"), t2)

    def at(ts: String): String =
      Scd2.asOf(v3, to_timestamp(lit(ts))).select("attr")
        .collect().map(_.getString(0)).toSeq match { case Seq(x) => x }

    assert(at("2024-01-15") === "a1")
    assert(at("2024-02-15") === "a2")
    assert(at("2024-03-15") === "a3")
    // boundary: a version becomes visible AT its valid_from
    assert(at("2024-02-01") === "a2")
  }

  test("latestPerKey compacts a CDC log to its newest record per key") {
    val log = Seq(
      (1L, "v1", 10L), (1L, "v2", 20L), (1L, "v3", 15L),
      (2L, "w1", 5L)).toDF("k", "attr", "seq")
    val out = Scd2.latestPerKey(log, "k", col("seq"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(out === Seq((1L, "v2"), (2L, "w1")))
  }

  test("random update sequences preserve the SCD2 invariants") {
    // seeded-random batches; after every evolve: exactly one current row
    // per live key, per-key intervals disjoint and contiguous, and the
    // current attr equals the last-applied update
    val rnd = new scala.util.Random(7)
    val times = Seq("2024-02-01", "2024-03-01", "2024-04-01", "2024-05-01")
    var dim = Scd2.evolve(
      dimNone(), Seq((1L, "v0"), (2L, "v0"), (3L, "v0")).toDF("k", "attr"),
      "k", Seq("attr"), t0)
    val lastVal = scala.collection.mutable.Map(
      1L -> "v0", 2L -> "v0", 3L -> "v0")
    for (ts <- times) {
      val batch = (1L to 4L).flatMap { k =>
        if (rnd.nextBoolean()) {
          val v = s"v${rnd.nextInt(3)}"
          lastVal(k) = v
          Some((k, v))
        } else None
      }
      if (batch.nonEmpty) {
        dim = Scd2.evolve(dim, batch.toDF("k", "attr"), "k", Seq("attr"),
          to_timestamp(lit(ts)))
        dim = dim.localCheckpoint() // keep the plan from growing per round
      }
      val rows = dim.select("k", "attr", "valid_from", "valid_to",
          "is_current")
        .collect().map(r => (r.getLong(0), r.getString(1),
          r.getTimestamp(2), Option(r.getTimestamp(3)), r.getBoolean(4)))
      rows.groupBy(_._1).foreach { case (k, versions) =>
        val current = versions.filter(_._5)
        assert(current.length === 1, s"key $k: ${current.length} current rows")
        assert(current.head._4.isEmpty, s"key $k: current row has valid_to")
        assert(current.head._2 === lastVal(k),
          s"key $k: current attr lost an update")
        // closed intervals chain exactly: each valid_to is the next
        // version's valid_from
        val sorted = versions.sortBy(_._3.getTime)
        sorted.sliding(2).foreach {
          case Array(prev, next) =>
            assert(prev._4.contains(next._3),
              s"key $k: gap/overlap between versions")
          case _ =>
        }
      }
    }
  }

  private def dimNone() =
    dim((1L, "x", "2020-01-01", null, true)).limit(0)

  test("history rows do not shuffle: only current rows join the batch") {
    val base = dim(
      (1L, "a1", "2024-01-01", null, true),
      (1L, "a0", "2023-01-01", "2024-01-01", false))
    val out = Scd2.evolve(base, Seq((1L, "a2")).toDF("k", "attr"), "k",
      Seq("attr"), t1)
    // the history branch reaches the union through a plain Filter+Project —
    // no join node sits above it
    val plan = out.queryExecution.optimizedPlan.toString
    assert(plan.contains("Union"))
    val unionArms = out.queryExecution.optimizedPlan.children
    val historyArm = unionArms.head
    assert(!historyArm.toString.toLowerCase.contains("join"),
      s"history arm must not join:\n$historyArm")
  }
}
