package graft

class QueriesSpec extends SparkTestBase {

  test("flagship entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("every query runs and is non-empty on sf0.001 (except pair finders)") {
    // near-dup pair queries may legitimately be empty on tiny corpora
    val mayBeEmpty = Set("d02_minhash_lsh", "d04_simhash_pairs", "q06_anti_join")
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf0001).count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }

  test("ingestion pipeline writes and reads back an index") {
    val dir = java.nio.file.Files.createTempDirectory("graft_idx").toString
    val idx = graft.operators.IngestionPipeline
      .buildIndex(spark, sf0001, chunkSize = 120, overlap = 20, dim = 8)
    graft.operators.IngestionPipeline.writeIndex(idx, dir)
    val back = spark.read.parquet(dir)
    assert(back.count() === idx.count())
    assert(back.columns.toSet.contains("embedding"))
  }
}
