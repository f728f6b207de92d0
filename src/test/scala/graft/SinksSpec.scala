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

  test("per-object sink writes one named file per row from executors") {
    import org.apache.spark.sql.functions._
    val p = tmp()
    // the reference's {doc}/table_{n}.csv keying over extraction rows
    val objs = graft.operators.IngestionPipeline
      .extractionRefRows(spark, sf0001, dim = 8)
      .limit(20)
      .select(col("s3_path").as("key"),
        encode(col("vec_key"), "UTF-8").as("payload"))
    val expected = objs.collect().map(r =>
      r.getString(0) -> new String(r.getAs[Array[Byte]](1), "UTF-8")).toMap
    DocumentSinks.writeObjects(objs, "key", "payload", p)
    expected.foreach { case (key, body) =>
      val f = new java.io.File(p, key)
      assert(f.exists(), s"object $key not written")
      assert(new String(Files.readAllBytes(f.toPath), "UTF-8") === body)
    }
  }

  test("per-object sink rejects traversal and null keys, leaves no temp files") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val p = tmp()
    def write(rows: Seq[(String, String)]): Unit =
      DocumentSinks.writeObjects(
        rows.toDF("key", "payload")
          .select(col("key"), encode(col("payload"), "UTF-8").as("payload")),
        "key", "payload", p)

    val esc = intercept[org.apache.spark.SparkException] {
      write(Seq(("a/../../evil.txt", "x")))
    }
    assert(esc.getCause.getMessage.contains("escapes"))
    val abs = intercept[org.apache.spark.SparkException] {
      write(Seq(("/etc/evil.txt", "x")))
    }
    assert(abs.getCause.getMessage.contains("escapes"))
    val nul = intercept[org.apache.spark.SparkException] {
      DocumentSinks.writeObjects(
        Seq((Option.empty[String], "x")).toDF("key", "payload")
          .select(col("key"), encode(col("payload"), "UTF-8").as("payload")),
        "key", "payload", p)
    }
    assert(nul.getCause.getMessage.contains("null/empty key"))
    assert(!new java.io.File(p).toPath.getParent.resolve("evil.txt").toFile.exists())

    // successful write is atomic-per-object: file exists, no .tmp remnants
    write(Seq(("d/ok.txt", "body")))
    assert(new String(Files.readAllBytes(
      new java.io.File(p, "d/ok.txt").toPath), "UTF-8") === "body")
    val leftovers = Files.walk(new java.io.File(p).toPath)
      .filter(_.toString.endsWith(".tmp")).count()
    assert(leftovers === 0L)
  }

  test("sharded export is deterministic, balanced, and one file per shard") {
    import org.apache.spark.sql.functions._
    import graft.operators.ShardedExport
    val docs = Tables.documents(spark, sf0001)
    val n = docs.count()

    // assignment is a pure function of doc_id: two runs agree exactly
    val a1 = ShardedExport.assignShards(docs, 8)
      .select("doc_id", "shard").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val a2 = ShardedExport.assignShards(docs, 8)
      .select("doc_id", "shard").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a1 === a2)
    assert(a1.values.toSet.subsetOf((0 until 8).toSet))

    val p = tmp()
    ShardedExport.write(docs, 8, p)
    val back = spark.read.parquet(p)
    assert(back.count() === n)
    // membership on read-back matches the pure-function assignment
    val onDisk = back.select(col("doc_id"),
        col("shard").cast("int").as("shard"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(onDisk === a1)
    // one data file per shard directory: shard count bounds file count
    val shardDirs = new java.io.File(p).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard="))
    assert(shardDirs.nonEmpty)
    shardDirs.foreach { dir =>
      val files = dir.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length === 1,
        s"${dir.getName} has ${files.length} files, expected 1")
    }
    // within a shard, rows are in the seeded-shuffle order: re-reading
    // a shard file yields the hash-then-key order the writer sorted by
    val s0 = shardDirs.head
    val rows = spark.read.parquet(s0.toString).select("doc_id")
      .collect().map(_.getLong(0)).toSeq
    val expected = rows.sortBy(id =>
      (graft.functions.CrossHash.md5Hash60("order#" + id), id))
    assert(rows === expected, "shard rows not in deterministic shuffle order")
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
