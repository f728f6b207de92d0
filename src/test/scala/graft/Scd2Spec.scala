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
