package graft

import org.apache.spark.sql.functions._

import graft.operators.{DocumentSinks, SkewTools}

class ScaleToolsSpec extends SparkTestBase {

  test("salted join equals the plain join and spreads the hot key") {
    val fact = Tables.orders(spark, sf0001)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val dim = Tables.customer(spark, sf0001)
      .select("c_custkey", "c_name")
      .withColumnRenamed("c_custkey", "o_custkey")

    val plain = fact.join(dim, Seq("o_custkey"))
      .select("o_orderkey", "c_name")
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    val salted = SkewTools
      .saltedJoin(fact, dim, "o_custkey", "o_orderkey", salts = 8)
      .select("o_orderkey", "c_name")
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    assert(salted === plain)

    // the join key is genuinely (key, salt): hot-key rows land in ≥2 salts
    val saltSpread = fact
      .withColumn("__salt", pmod(xxhash64(col("o_orderkey")), lit(8L)))
      .groupBy("o_custkey")
      .agg(countDistinct(col("__salt")).as("n_salts"))
      .agg(max(col("n_salts"))).collect()(0).getLong(0)
    assert(saltSpread >= 2)
  }

  test("bucketed tables join without an exchange") {
    // the catalog is per-JVM but the warehouse dir persists: clear both
    Seq("graft_orders_b", "graft_lineitem_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        import scala.reflect.io.Directory
        new Directory(loc).deleteRecursively()
      }
    }
    DocumentSinks.writeBucketed(
      Tables.orders(spark, sf0001).select("o_orderkey", "o_totalprice"),
      "o_orderkey", 4, "graft_orders_b")
    DocumentSinks.writeBucketed(
      Tables.lineitem(spark, sf0001).select("l_orderkey", "l_quantity")
        .withColumnRenamed("l_orderkey", "o_orderkey"),
      "o_orderkey", 4, "graft_lineitem_b")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    try {
      // force the shuffle-join path so bucketing (not broadcast) is what
      // removes the exchange
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("graft_orders_b")
        .join(spark.table("graft_lineitem_b"), Seq("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("Bucketed: true"),
        s"scan did not use the bucketed layout:\n$plan")
      assert(joined.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("AQE splits a skewed join partition at runtime (skew=true)") {
    // salting (above) is the deterministic pre-planned fix; AQE skew-join
    // is the runtime fix for skew nobody predicted. Pin that it actually
    // engages: one key carries ~80% of the rows, thresholds lowered to
    // test scale, broadcast disabled so the join is sort-merge.
    val s = spark
    import s.implicits._
    val prev = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      spark.conf.set(
        "spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val left = (0 until 40000)
        .map(i => (if (i < 32000) 0L else (i % 1999L) + 1L, i.toString * 8))
        .toDF("k", "pad")
      val right = (0L until 2000L).map(k => (k, s"r$k")).toDF("k", "name")
      val joined = left.join(right, "k")
      // materialize THIS plan (count() would execute a different query
      // execution and leave joined's adaptive plan unfinalized)
      assert(joined.collect().length === 40000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"))
      assert(plan.contains("skew=true"),
        s"AQE did not mark the skewed join:\n$plan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
