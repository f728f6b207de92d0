package graft

class ApiSpec extends SparkTestBase {

  test("listDocuments catalogs every source once") {
    val cat = Api.listDocuments(spark, sf0001)
    assert(cat.count() === cat.select("source").distinct().count())
    assert(cat.count() > 0)
  }

  test("ragSearch by text query returns k ranked joined rows") {
    val r = Api.ragSearch(spark, sf0001, "spark window join", k = 10)
      .collect()
    assert(r.length === 10)
    val sims = r.map(_.getDouble(r.head.fieldIndex("sim")))
    assert(sims.sameElements(sims.sorted.reverse), "not ranked desc")
    assert(r.forall(_.getString(2).length <= 50), "title not truncated")
    assert(r.forall(_.getString(3).length <= 200), "content not truncated")
  }

  test("ragSearch routes target_index: arxiv results are a doc-index subset") {
    import org.apache.spark.sql.functions._
    val arxivIds = Api.indexFor(spark, sf0001, Api.ArxivIndex)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val docIds = Api.indexFor(spark, sf0001, Api.DocIndex)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(arxivIds.subsetOf(docIds))
    assert(arxivIds.size < docIds.size,
      "arxiv index did not restrict the corpus")
    val hits = Api.ragSearch(spark, sf0001, "spark window join", k = 5,
      targetIndex = Api.ArxivIndex).collect()
    assert(hits.nonEmpty)
    assert(hits.forall(r => arxivIds.contains(r.getLong(0))),
      "arxiv-index search returned a non-arxiv vector")
    val err = intercept[IllegalArgumentException] {
      Api.ragSearch(spark, sf0001, "q", targetIndex = "nope")
    }
    assert(err.getMessage.contains("target_index"))
  }

  test("searchByTopic scores and limits") {
    val r = Api.searchByTopic(spark, sf0001, Seq("spark", "join"), n = 5)
      .collect()
    assert(r.length === 5)
    assert(r.forall(_.getInt(2) > 0))
  }

  test("extractField filters non-matches") {
    val r = Api.extractField(spark, sf0001, "spark ([a-z]+)").collect()
    assert(r.nonEmpty)
    assert(r.forall(_.getString(1).nonEmpty))
  }

  test("fetchVectors returns exactly the present requested ids, id-pruned") {
    val ids = Seq(2L, 5L, 999999L) // the last one does not exist
    val df = Api.fetchVectors(spark, sf0001, ids)
    val got = df.collect()
    assert(got.map(_.getLong(0)).toSeq === Seq(2L, 5L))
    assert(got.forall(r => r.getString(1).nonEmpty && !r.isNullAt(3)))
    // the id predicate reaches the embeddings scan — no full corpus read
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [In(vec_id"),
      s"vec_id IN-filter not pushed to the scan:\n$plan")
    assert(Api.fetchVectors(spark, sf0001, Seq(888888L)).count() === 0)
  }

  test("assembleReport has all three sections") {
    val sections = Api.assembleReport(spark, sf0001, "spark join")
      .select("section").distinct().collect().map(_.getString(0)).toSet
    assert(sections === Set("introduction", "keyword_search",
      "similarity_search"))
  }
}
