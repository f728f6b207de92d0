package graft

import java.nio.file.Files

import graft.operators.DocumentSinks

class SinksSpec extends SparkTestBase {

  private def tmp(): String =
    Files.createTempDirectory("graft_sink").toString

  test("json/text/csv/parquet sinks round-trip the documents table") {
    val docs = Tables.documents(spark, sf0001).limit(50)
    val n = docs.count()

    val pj = tmp(); DocumentSinks.writeJson(docs, pj)
    assert(spark.read.json(pj).count() === n)

    val pt = tmp(); DocumentSinks.writeText(docs, "text", pt)
    assert(spark.read.text(pt).count() === n)

    val pc = tmp()
    DocumentSinks.writeCsv(docs.select("doc_id", "lang", "source"), pc)
    assert(spark.read.option("header", "true").csv(pc).count() === n)

    val pp = tmp(); DocumentSinks.writeParquet(docs, pp)
    assert(spark.read.parquet(pp).count() === n)
  }

  test("partitioned export prunes on read") {
    val docs = Tables.documents(spark, sf0001)
    val p = tmp()
    DocumentSinks.writePartitioned(docs, "lang", p)
    val one = spark.read.parquet(p)
      .filter(org.apache.spark.sql.functions.col("lang") === "en")
    val scan = one.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(lang"),
      "partition filter not applied at scan")
  }
}
