package graft

import org.apache.spark.sql.functions._

import graft.operators.TableDiff

class TableDiffSpec extends SparkTestBase {
  import spark.implicits._

  test("identical tables diff to empty") {
    val docs = Tables.documents(spark, sf0001)
    assert(TableDiff.diff(docs, docs, "doc_id").count() === 0L)
  }

  test("null and empty-string attribute values do not collide") {
    val a = Seq((1L, Option.empty[String]), (2L, Some("")))
      .toDF("k", "v")
    val b = Seq((1L, Some("")), (2L, Option.empty[String]))
      .toDF("k", "v")
    val d = TableDiff.diff(a, b, "k").orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(d === Seq((1L, "changed"), (2L, "changed")))
  }

  test("column order does not affect the digest") {
    val a = Seq((1L, "x", 5)).toDF("k", "v", "n")
    val b = Seq((1L, "x", 5)).toDF("k", "v", "n").select("n", "k", "v")
    assert(TableDiff.diff(a, b, "k").count() === 0L)
  }

  test("mismatched schemas are rejected with a named error") {
    val a = Seq((1L, "x")).toDF("k", "v")
    val b = Seq((1L, "x", 5)).toDF("k", "v", "n")
    val err = intercept[IllegalArgumentException] {
      TableDiff.diff(a, b, "k")
    }
    assert(err.getMessage.contains("identical schemas"))
  }

  test("the shuffle carries digests, not row payloads") {
    val docs = Tables.documents(spark, sf0001)
    val plan = TableDiff
      .diff(docs, docs.withColumn("text", concat(col("text"), lit("x"))),
        "doc_id")
      .queryExecution.executedPlan.toString
    // the md5 projection sits BELOW the join's exchanges: no 'text'
    // attribute crosses the shuffle boundary
    val joinIdx = plan.indexOf("SortMergeJoin")
    assert(joinIdx >= 0 || plan.contains("ShuffledHashJoin")
      || plan.contains("BroadcastHashJoin"))
    val joinLine = plan.linesIterator
      .find(l => l.contains("Join") && l.contains("FullOuter")).getOrElse("")
    assert(!joinLine.contains("text#"),
      s"row payload crossed the join: $joinLine")
  }
}
