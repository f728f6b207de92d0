package graft

import org.apache.spark.sql.functions._

import graft.operators.{BloomPrune, HeavyHitters}
import graft.queries.Warehouse

class WarehouseSpec extends SparkTestBase {

  // --- BloomPrune -----------------------------------------------------

  test("bloom-pruned join equals the plain join (FPs die in the join)") {
    val dim = Tables.customer(spark, sf0001)
      .filter(col("c_acctbal") > 9000.0)
      .select("c_custkey", "c_mktsegment")
    val fact = Tables.orders(spark, sf0001)
    val pruned = BloomPrune
      .prunedJoin(fact, dim, "o_custkey", "c_custkey", expectedKeys = 1000L)
      .select("o_orderkey", "c_custkey", "c_mktsegment")
    val plain = fact
      .join(dim, col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "c_custkey", "c_mktsegment")
    assert(pruned.exceptAll(plain).isEmpty && plain.exceptAll(pruned).isEmpty)
  }

  test("bloom prunes the fact map-side, below a sort-merge join") {
    val dim = Tables.customer(spark, sf0001)
      .filter(col("c_acctbal") > 9000.0)
      .select("c_custkey")
    val fact = Tables.orders(spark, sf0001)
    val joined = BloomPrune
      .prunedJoin(fact, dim, "o_custkey", "c_custkey", expectedKeys = 1000L)
    val plan = joined.queryExecution.executedPlan.toString
    // the join stays a real shuffle join (the scenario under test) and the
    // UDF bloom probe is a Filter, not a post-join residual
    assert(plan.contains("SortMergeJoin"),
      s"expected SortMergeJoin in plan:\n$plan")
    // the probe sits in a Filter ABOVE the fact FileScan and BELOW the
    // fact-side Exchange (parent-first printout: Exchange line precedes it)
    val probeAt = plan.indexOf("UDF(knownnotnull(o_custkey")
    val exchangeAt = plan.indexOf("Exchange hashpartitioning(o_custkey")
    assert(probeAt >= 0,
      s"expected bloom-probe filter on the fact key in plan:\n$plan")
    assert(exchangeAt >= 0 && exchangeAt < probeAt,
      s"bloom probe is not below the fact-side exchange:\n$plan")
    // and it actually prunes: far fewer fact rows enter the join than exist
    val bf = dim.stat.bloomFilter("c_custkey", 1000L, 0.01)
    val probe = udf((k: Long) => bf.mightContainLong(k))
    val survivors = fact.filter(probe(col("o_custkey"))).count()
    assert(survivors < fact.count() / 2,
      s"bloom kept $survivors of ${fact.count()} fact rows — not selective")
    assert(survivors >= joined.count())
  }

  // --- HeavyHitters ---------------------------------------------------

  test("misra-gries keeps at most k-1 candidates and never loses a heavy item") {
    val heavy = Seq.fill(40)("hot")
    val noise = (0 until 60).map(i => s"t$i")
    val stream = new scala.util.Random(7).shuffle(heavy ++ noise)
    val cands = HeavyHitters.misraGries(stream.iterator, k = 5).toSet
    assert(cands.size <= 4)
    // freq(hot)=40 > 100/5=20 → MG must retain it
    assert(cands.contains("hot"))
  }

  test("exact heavy hitters equal the brute-force groupBy over all terms") {
    val terms = Tables.documents(spark, sf0001)
      .select(explode(graft.functions.TextFunctions.tokens(col("text")))
        .as("term"))
    val k = 200
    val fast = HeavyHitters.exact(terms, "term", k)
    val n = terms.count()
    val brute = terms.groupBy("term").agg(count(lit(1)).as("freq"))
      .filter(col("freq") * k > n)
      .withColumn("n_total", lit(n))
      .orderBy(col("freq").desc, col("term"))
    assert(fast.count() > 0, "heavy-hitter fixture returned nothing")
    assert(fast.exceptAll(brute).isEmpty && brute.exceptAll(fast).isEmpty)
  }

  test("candidate set is small (bounded by (k-1) per partition)") {
    val terms = Tables.documents(spark, sf0001).repartition(4)
      .select(explode(graft.functions.TextFunctions.tokens(col("text")))
        .as("term"))
    val cands = HeavyHitters.candidates(terms, "term", k = 200)
    assert(cands.count() <= 199L * 4)
  }

  // --- TPC-H classics: plan shapes ------------------------------------

  test("q42/q43/q44 broadcast every dim — exactly one fact-width shuffle") {
    for (name <- Seq("q42_shipping_priority", "q43_local_supplier_volume",
        "q44_returned_items")) {
      val df = Warehouse.defs(name)(spark, sf0001)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"$name: expected broadcast dim joins in\n$plan")
      val smj = "SortMergeJoin".r.findAllIn(plan).size +
        "ShuffledHashJoin".r.findAllIn(plan).size
      assert(smj <= 1, s"$name: ${smj} shuffle joins — dims not broadcast?")
    }
  }

  test("q42 top-10 is TakeOrderedAndProject, not a global sort") {
    val plan = Warehouse.defs("q42_shipping_priority")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("pagerank matches hand-computed integer iterations on a path graph") {
    import spark.implicits._
    // undirected path 1—2—3: deg(1)=deg(3)=1, deg(2)=2. Two iterations by
    // hand (1e6-scaled, contribution = r div deg, damping (85·Σ) div 100):
    //   iter1: r1=r3=150000+425000=575000, r2=150000+1700000=1850000
    //   iter2: r1=r3=150000+(85·925000)div 100=936250, r2=150000+977500=1127500
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L))
      .toDF("src", "dst")
    val got = graft.operators.PageRank.ranks(edges, iters = 2)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 936250L), (2L, 1127500L), (3L, 936250L)))
  }
}
