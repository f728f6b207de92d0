package graft

import org.apache.spark.sql.functions._

import graft.operators.{IncrementalJoin, TableDiff}

class IncrementalJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def bag(df: org.apache.spark.sql.DataFrame): Map[Seq[Any], Long] =
    df.collect().map(_.toSeq).groupBy(identity).map { case (k, v) =>
      k -> v.length.toLong
    }

  test("delta-join ≡ full recompute on many-to-many splits (fuzzed)") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 4) {
      // duplicate keys on BOTH sides → many-to-many; the identity is a
      // bag equality so multiplicities must match exactly
      val aRows = Seq.fill(40)((rnd.nextInt(8).toLong, rnd.nextInt(100)))
      val bRows = Seq.fill(40)((rnd.nextInt(8).toLong, rnd.nextInt(100)))
      val a = aRows.toDF("k", "av")
      val b = bRows.toDF("k", "bv")
      val aSplit = rnd.nextInt(41)
      val bSplit = rnd.nextInt(41)
      val (a0, dA) = (aRows.take(aSplit).toDF("k", "av"),
        aRows.drop(aSplit).toDF("k", "av"))
      val (b0, dB) = (bRows.take(bSplit).toDF("k", "bv"),
        bRows.drop(bSplit).toDF("k", "bv"))
      val full = a.join(b, Seq("k"))
      val maintained = IncrementalJoin.refreshed(
        a0.join(b0, Seq("k")), a0, dA, b0, dB, Seq("k"))
      assert(bag(maintained) === bag(full), s"trial $trial " +
        s"(splits $aSplit/$bSplit)")
    }
  }

  test("empty deltas contribute nothing; empty bases still join deltas") {
    val a = Seq((1L, "x"), (1L, "y")).toDF("k", "av")
    val b = Seq((1L, "p")).toDF("k", "bv")
    val none = a.limit(0)
    val noneB = b.limit(0)
    assert(IncrementalJoin.deltaJoin(a, none, b, noneB, Seq("k"))
      .count() === 0L)
    // all-delta (cold start): A0 and B0 empty → only the ΔA⋈ΔB term
    val cold = IncrementalJoin.refreshed(
      none.join(noneB, Seq("k")), none, a, noneB, b, Seq("k"))
    assert(bag(cold) === bag(a.join(b, Seq("k"))))
  }

  test("applyChanges merges upserts, deletes, and leaves the rest") {
    val base = Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30))
      .toDF("k", "name", "v")
    val changes = Seq(("upsert", 2L, "B", 25), ("delete", 3L, "", 0),
      ("upsert", 4L, "d", 40))
      .toDF("op", "k", "name", "v")
    val after = TableDiff.applyChanges(base, changes, "k")
    assert(bag(after) === bag(Seq((1L, "a", 10), (2L, "B", 25),
      (4L, "d", 40)).toDF("k", "name", "v")))
    // diff(before, after) agrees with the change batch (inverse check)
    val d = TableDiff.diff(base, after, "k")
      .as[(Long, String)].collect().toMap
    assert(d === Map(2L -> "changed", 3L -> "removed", 4L -> "added"))
  }

  test("applyChanges names bad ops and conflicting duplicate keys") {
    val base = Seq((1L, 1)).toDF("k", "v")
    val badOp = Seq(("replace", 1L, 2)).toDF("op", "k", "v")
    val e1 = intercept[IllegalArgumentException] {
      TableDiff.applyChanges(base, badOp, "k")
    }
    assert(e1.getMessage.contains("replace"))
    val dup = Seq(("upsert", 1L, 2), ("delete", 1L, 0))
      .toDF("op", "k", "v")
    val e2 = intercept[IllegalArgumentException] {
      TableDiff.applyChanges(base, dup, "k")
    }
    assert(e2.getMessage.contains("order-dependent"))
    val drift = Seq(("upsert", 1L, 2)).toDF("op", "k", "other")
    intercept[IllegalArgumentException] {
      TableDiff.applyChanges(base, drift, "k")
    }
  }
}
