package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.PrefixSum

class PrefixSumSpec extends SparkTestBase {

  private def docs = Tables.documents(spark, sf0001)
    .select(col("doc_id"), col("n_chars").cast("long").as("v"))

  test("distributed running total equals the single-partition window form") {
    val order = Seq(col("v").desc, col("doc_id"))
    val got = PrefixSum
      .withRunningTotal(docs, col("v"), order, "cum", numPartitions = 4)
      .select("doc_id", "cum").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val w = Window.orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = docs.withColumn("cum", sum("v").over(w))
      .select("doc_id", "cum").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === want)
    // the data genuinely spans multiple range slices (the point of the
    // two-phase form: no slice saw the whole input)
    val slices = docs.repartitionByRange(4, order: _*)
      .select(spark_partition_id().as("p")).distinct().count()
    assert(slices >= 2)
  }

  test("decimal running totals are exact; float values are a named error") {
    val dec = docs.withColumn("dv",
      (col("v") + lit(0.25)).cast("decimal(12,2)"))
    val order = Seq(col("dv").desc, col("doc_id"))
    val got = PrefixSum
      .withRunningTotal(dec, col("dv"), order, "cum", numPartitions = 4)
      .select("doc_id", "cum").collect()
      .map(r => (r.getLong(0), r.getDecimal(1))).toMap
    val w = Window.orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = dec.withColumn("cum", sum("dv").over(w))
      .select("doc_id", "cum").collect()
      .map(r => (r.getLong(0), r.getDecimal(1))).toMap
    assert(got === want)
    // fractional slice offsets would silently truncate under a long
    // accumulator — floats are refused with a pointer at the fix
    val e = intercept[IllegalArgumentException] {
      PrefixSum.withRunningTotal(
        docs.withColumn("d", col("v").cast("double")),
        col("d"), Seq(col("doc_id")), "cum")
    }
    assert(e.getMessage.contains("cast to decimal"))
  }

  test("running total on an empty input is empty, not an error") {
    val empty = docs.filter(lit(false))
    assert(PrefixSum.withRunningTotal(empty, col("v"),
      Seq(col("doc_id")), "cum").count() === 0)
  }

  test("d15 split is constant within every cluster and covers every doc") {
    val out = SparkEntry.queries("d15_cluster_split")(spark, sf0001)
      .localCheckpoint(eager = true)
    assert(out.count() === Tables.documents(spark, sf0001).count())
    val straddling = out.groupBy("cluster_id")
      .agg(countDistinct(col("split")).as("n"))
      .filter(col("n") > 1).count()
    assert(straddling === 0)
    val labels = out.select("split").distinct()
      .collect().map(_.getString(0)).toSet
    assert(labels.subsetOf(Set("train", "val", "test")))
  }

  test("s15 greedy MMR: anchor is the qsim argmax, scores non-increasing") {
    val out = SparkEntry.queries("s15_mmr_rerank")(spark, sf0001)
      .orderBy("rank").collect()
    assert(out.length === graft.queries.Similarity.MmrK)
    assert(out.map(_.getLong(1)).distinct.length === out.length)
    // rank 1 is the plain top-1 by query similarity (empty penalty set)
    assert(out(0).getDouble(2) === out.map(_.getDouble(2)).max)
    // From rank 2 on, each winner was available one step earlier and
    // penalties (max pair-sim to the growing set) only grow — so the
    // greedy score sequence is non-increasing. Rank 1 is excluded: its
    // empty-set penalty is 0 by the standard MMR convention, while a
    // NEGATIVE max pair-sim at rank 2 can legally score higher.
    val scores = out.map(_.getDouble(3)).drop(1)
    scores.sliding(2).foreach {
      case Array(a, b) => assert(a >= b)
      case _ => ()
    }
  }

  test("t31 keeps exactly the budget-fitting prefix of the quality order") {
    val out = SparkEntry.queries("t31_token_budget")(spark, sf0001)
      .localCheckpoint(eager = true)
    val rows = out.orderBy(col("quality").desc, col("doc_id"))
      .select("tokens", "cum_tokens").collect()
    var acc = 0L
    rows.foreach { r =>
      acc += r.getLong(0)
      assert(r.getLong(1) === acc)
    }
    assert(acc <= graft.queries.TextAnalysis.TokenBudget)
    // the budget genuinely cuts this corpus: a non-trivial selection
    val total = Tables.documents(spark, sf0001).count()
    assert(out.count() > 0 && out.count() < total)
  }

  test("d16 selects only cluster canonicals, within budget") {
    val out = SparkEntry.queries("d16_dedup_budget")(spark, sf0001)
      .localCheckpoint(eager = true)
    val canon = SparkEntry.queries("d08_dup_clusters")(spark, sf0001)
      .filter(col("is_canonical")).select("doc_id")
    assert(out.join(canon, Seq("doc_id"), "left_anti").count() === 0)
    val maxCum = out.agg(max("cum_tokens")).collect()(0).getLong(0)
    assert(maxCum <= graft.queries.TextAnalysis.TokenBudget)
    assert(out.count() > 0)
  }
}
