package graft

import org.apache.spark.sql.functions._

import graft.queries.Relational

/** q65: SkewTools salting on a GENUINELY skewed input — output parity
  * with the plain join, the salted exchange in the executed plan, and a
  * measured per-partition shuffle spread. */
class SkewSaltSpec extends SparkTestBase {

  private def skewedFact = Tables.events(spark, sf0001)
    .withColumn("skew_user",
      when(pmod(col("user_id"), lit(10)) < 9, lit(0L))
        .otherwise(col("user_id")))
    .select("skew_user", "event_id", "value")

  test("the planted key is genuinely hot (~90% of fact rows)") {
    val total = skewedFact.count().toDouble
    val hot = skewedFact.filter(col("skew_user") === 0L).count().toDouble
    assert(hot / total > 0.85 && hot / total < 0.95,
      s"fixture skew drifted: hot share ${hot / total}")
  }

  test("salted join output equals the plain unsalted join") {
    val fact = skewedFact
    val dim = fact.select("skew_user").distinct()
      .withColumn("weight", pmod(col("skew_user"), lit(7)) + lit(1))
    def rollup(joined: org.apache.spark.sql.DataFrame) = joined
      .groupBy("skew_user")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(12,2)") * col("weight"))
          .cast("double").as("weighted_value"))
      .orderBy("skew_user").collect().toSeq
    val salted = rollup(graft.operators.SkewTools
      .saltedJoin(fact, dim, "skew_user", "event_id", salts = 8))
    val plain = rollup(fact.join(dim, Seq("skew_user")))
    assert(salted.nonEmpty && salted === plain)
  }

  test("q65's executed plan joins on the salted key (salted exchange present)") {
    // at fixture scale the exploded dim broadcasts — the join must still
    // key on (skew_user, __salt)
    val df = Relational.defs("q65_skew_salted")(spark, sf0001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val saltedJoin = "HashJoin \\[[^\\]]*__salt".r
    assert(saltedJoin.findFirstIn(plan).isDefined,
      s"q65's join does not key on the salt:\n$plan")
    // the 100 TB shape — dim too big to broadcast — must produce a real
    // SALTED EXCHANGE: the fact shuffles on (skew_user, __salt), never
    // on the raw hot key
    val restore = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df2 = Relational.defs("q65_skew_salted")(spark, sf0001)
      df2.collect()
      val plan2 = df2.queryExecution.executedPlan.toString
      val saltedExchange = "hashpartitioning\\([^)]*__salt".r
      assert(saltedExchange.findFirstIn(plan2).isDefined,
        s"no salted exchange in the shuffle-join form:\n$plan2")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", restore)
  }

  test("tiled self-join yields exactly the naive blocked pair set, once each") {
    val e = Tables.part(spark, sf0001)
      .select(col("p_partkey").as("id"), col("p_name").as("name"),
        substring_index(col("p_name"), " ", 1).as("blk"))
    val tiled = graft.operators.SkewTools.tiledSelfJoin(e, "blk", "id", 4)
      .select(col("blk_a").as("blk"),
        least(col("id_a"), col("id_b")).as("lo"),
        greatest(col("id_a"), col("id_b")).as("hi"))
    val naive = e.select(col("blk"), col("id").as("lo"))
      .join(e.select(col("blk"), col("id").as("hi")), "blk")
      .filter(col("lo") < col("hi"))
    assert(tiled.count() === naive.count())
    assert(tiled.exceptAll(naive).isEmpty && naive.exceptAll(tiled).isEmpty)
  }

  test("tiling spreads a hot block's quadratic pair space across tile groups") {
    import spark.implicits._
    // one block owns 90% of the entities — the q63 nightmare block
    val n = 400
    val rows = (1 to n).map { i =>
      (i.toLong, s"entity name $i", if (i % 10 != 0) "hot" else s"b$i")
    }
    val e = rows.toDF("id", "name", "blk")
    val tiles = 4
    // count pairs per (ti, tj) tile group — the join's task granularity
    val t = pmod(xxhash64(col("id")), lit(tiles.toLong))
    val tagged = e.filter(col("blk") === "hot").withColumn("__t", t)
    val groupSizes = tagged.select(col("__t").as("ti"), col("id").as("a"))
      .join(tagged.select(col("__t").as("tj"), col("id").as("b")),
        col("ti") <= col("tj"))
      .filter(col("ti") =!= col("tj") || col("a") < col("b"))
      .groupBy("ti", "tj").count().collect().map(_.getLong(2).toDouble)
    val share = groupSizes.max / groupSizes.sum
    // naive: ONE task owns 100% of the hot block's C(360,2) pairs;
    // tiled: 10 groups, the largest holds a modest fraction
    assert(groupSizes.length === tiles * (tiles + 1) / 2)
    assert(share < 0.25, s"hot block not spread: max group share $share")
    // and the operator's own output over the same input is complete
    val got = graft.operators.SkewTools.tiledSelfJoin(e, "blk", "id", tiles)
      .count()
    val hot = 360L; val singles = 40L
    assert(got === hot * (hot - 1) / 2, s"expected C($hot,2), got $got " +
      s"(+$singles singleton blocks contribute 0)")
  }

  test("salting spreads the hot key: max partition share drops below half") {
    val n = 8
    def shares(df: org.apache.spark.sql.DataFrame): Seq[Double] = {
      val sizes = df.select(spark_partition_id().as("p"))
        .groupBy("p").count().collect().map(_.getLong(1).toDouble)
      val total = sizes.sum
      sizes.map(_ / total).toSeq
    }
    // the unsalted join exchange: one partition owns the ~90% key
    val unsalted = shares(skewedFact.repartition(n, col("skew_user")))
    assert(unsalted.max > 0.85,
      s"expected a ~90% straggler partition, got max ${unsalted.max}")
    // the salted exchange: the hot key spreads over 8 salts
    val salted = shares(skewedFact
      .withColumn("__salt", pmod(xxhash64(col("event_id")), lit(8L)))
      .repartition(n, col("skew_user"), col("__salt")))
    assert(salted.max < 0.5 && salted.max < unsalted.max / 2,
      s"salting did not spread the hot key: max share ${salted.max} " +
        s"(unsalted ${unsalted.max})")
  }
}
