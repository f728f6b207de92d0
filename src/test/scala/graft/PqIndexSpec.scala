package graft

import org.apache.spark.sql.functions._

import graft.operators.PqIndex

class PqIndexSpec extends SparkTestBase {
  import spark.implicits._

  test("PQ codes, lookup distances, and ranking on a hand-computed fixture") {
    // dim=4, m=2 subspaces of 2 dims, k=2 codebooks = subvectors of v0/v1
    val emb = Seq(
      (0L, Seq(0.0, 0.0, 10.0, 10.0)),   // centroid 0
      (1L, Seq(5.0, 5.0, 0.0, 0.0)),     // centroid 1
      (2L, Seq(0.0, 0.0, 0.0, 0.0)),     // codes (0, 1)
      (3L, Seq(1.0, 1.0, 9.0, 9.0)))     // the query
      .toDF("vec_id", "embedding")

    val out = PqIndex.search(emb, col("vec_id") === 3, dim = 4, m = 2,
        k = 2, topK = 3)
      .orderBy("rank")
      .as[(Long, Int, Long, Long)].collect().toSeq

    // quantized scale 1e6: lut(j0)=[2e12, 3.2e13], lut(j1)=[2e12, 1.62e14]
    val e12 = 1000000000000L
    assert(out === Seq(
      (3L, 1, 0L, 4L * e12),            // codes (0,0): 2e12 + 2e12
      (3L, 2, 2L, 2L * e12 + 162L * e12), // codes (0,1)
      (3L, 3, 1L, 32L * e12 + 162L * e12))) // codes (1,1)
  }

  test("an exact duplicate of a query ranks first at distance 0") {
    val base = (0L to 15L).map(i =>
      (i, (0 until 64).map(c => (i * 64 + c).toDouble / 100.0)))
    val dup = Seq((100L, base(2)._2)) // same embedding as vec 2
    val emb = (base ++ dup).toDF("vec_id", "embedding")
    val top = PqIndex.search(emb, col("vec_id") === 2, topK = 1)
      .as[(Long, Int, Long, Long)].head()
    assert(top === ((2L, 1, 100L, 0L)))
  }

  test("IVF×PQ cascade scores only vectors from the query's probed cells") {
    val emb = Tables.embeddings(spark, sf0001)
    val out = PqIndex.searchIvf(emb, col("vec_id") < 3, topK = 3)
    val probes = graft.operators.IvfIndex.cellRanks(emb, 16)
      .filter(col("vec_id") < 3 && col("rk") <= 2)
      .select(col("vec_id").as("q_id"), col("cent_id"))
    val assign = graft.operators.IvfIndex.assignments(emb, 16)
      .select(col("vec_id"), col("cent_id"))
    // every returned (q, vec) pair must be probe-reachable
    val escaped = out.join(assign, "vec_id")
      .join(probes, Seq("q_id", "cent_id"), "left_anti")
    assert(escaped.count() === 0, "cascade scored an unprobed vector")
    assert(out.count() > 0)
  }

  test("stored index search equals in-memory search and never reads the corpus") {
    val emb = Tables.embeddings(spark, sf0001)
    val path = java.nio.file.Files.createTempDirectory("graft_pq").toString
    PqIndex.writeIndex(emb, path)

    // literal query rows: the plan must then touch ONLY the stored index
    val qRows = emb.filter(col("vec_id") < 5)
      .select("vec_id", "embedding").collect().toSeq
    val queries = spark.createDataFrame(
      spark.sparkContext.parallelize(qRows),
      emb.select("vec_id", "embedding").schema)

    val stored = PqIndex.searchIndexed(spark, path, queries)
    val live = PqIndex.search(emb, col("vec_id") < 5)
    assert(stored.collect().map(_.toSeq).sortBy(_.toString).toSeq
      === live.collect().map(_.toSeq).sortBy(_.toString).toSeq)
    val plan = stored.queryExecution.executedPlan.toString
    assert(!plan.contains("embeddings.parquet"),
      s"stored-index search scanned the corpus:\n$plan")
  }

  test("stored IVFADC equals the in-memory cascade, partition-pruned, corpus unread") {
    val emb = Tables.embeddings(spark, sf0001)
    val root = java.nio.file.Files.createTempDirectory("graft_ivfadc").toString
    graft.operators.IvfIndex.writeIndex(emb, k = 16, s"$root/ivf")
    PqIndex.writeIndex(emb, s"$root/pq")

    // literal query rows: the plan must then touch ONLY the two stores
    val qRows = emb.filter(col("vec_id") < 5)
      .select("vec_id", "embedding").collect().toSeq
    val queries = spark.createDataFrame(
      spark.sparkContext.parallelize(qRows),
      emb.select("vec_id", "embedding").schema)

    val stored = PqIndex.searchIvfIndexed(spark, s"$root/ivf", s"$root/pq",
      queries)
    val live = PqIndex.searchIvf(emb, col("vec_id") < 5)
    assert(stored.collect().map(_.toSeq).sortBy(_.toString).toSeq
      === live.collect().map(_.toSeq).sortBy(_.toString).toSeq)
    stored.collect() // AQE-finalize before reading the plan
    val plan = stored.queryExecution.executedPlan.toString
    assert(!plan.contains("embeddings.parquet"),
      s"stored IVFADC scanned the corpus:\n$plan")
    // the IVF store is read under partition pruning on the probed cells
    val pruned = "PartitionFilters: \\[[^\\]]*cent_id".r
    assert(pruned.findFirstIn(plan).isDefined,
      s"IVF index scan is not partition-pruned on cent_id:\n$plan")
  }

  test("mismatched PQ geometry against a stored index raises a named error") {
    val emb = Tables.embeddings(spark, sf0001)
    val path = java.nio.file.Files.createTempDirectory("graft_pq_geo")
      .toString
    PqIndex.writeIndex(emb, path) // dim=64, m=8
    assert(PqIndex.storedGeometry(spark, path) === Some((64, 8, 16)))
    val queries = emb.filter(col("vec_id") < 3)
      .select("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      PqIndex.searchIndexed(spark, path, queries, dim = 64, m = 16)
    }
    assert(e.getMessage.contains("m=8") && e.getMessage.contains("m=16"),
      e.getMessage)
    // the matching geometry still searches
    assert(PqIndex.searchIndexed(spark, path, queries).count() > 0)
  }

  test("withDecoded: broadcast-join decode reconstructs exactly what the " +
      "literal-table decode does (the large-codebook path)") {
    val emb = Tables.embeddings(spark, sf0001)
    val book = PqIndex.collectCodebook(emb, 16)
    // codes via the public encode path
    val codes = PqIndex.encodeFused(emb, book, dim = 64, m = 8)
      .groupBy("vec_id")
      .agg(expr("transform(array_sort(collect_list(struct(j, code)))," +
        " x -> x.code)").as("codes"))
    val literal = PqIndex.withDecoded(codes, "vec_id", book, 64, 8)
      .select(col("vec_id"), col("embedding"))
    // force the join path with a budget below k*dim = 1024
    val joined = PqIndex.withDecoded(codes, "vec_id", book, 64, 8,
      literalBudget = 8)
      .select(col("vec_id"), col("embedding"))
    val l = literal.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val j = joined.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(l.keySet === j.keySet)
    assert(l.forall { case (id, v) => j(id) === v },
      "join-path decode diverged from literal-path decode")
    assert(l.values.head.size === 64)
  }

  test("search never plans a cartesian product and broadcasts the LUT") {
    val emb = Tables.embeddings(spark, sf0001)
    val plan = PqIndex.search(emb, col("vec_id") < 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("BroadcastExchange"), plan)
  }
}
