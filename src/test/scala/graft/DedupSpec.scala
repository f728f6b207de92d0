package graft

import org.apache.spark.sql.functions._

class DedupSpec extends SparkTestBase {
  import spark.implicits._

  test("exact dedup marks later copies as dups, first id canonical") {
    // Build a corpus with a known duplicate via the query on a temp view…
    // d01 runs on the documents fixture; here we check the semantics
    // directly on a controlled frame using the same construction.
    val df = Seq((1L, "aaa"), (2L, "bbb"), (3L, "aaa")).toDF("doc_id", "text")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("h")
    val out = df.select(col("doc_id"), md5(col("text")).as("h"))
      .withColumn("canonical_id", min(col("doc_id")).over(w))
      .select(col("doc_id"), col("canonical_id"),
        (col("doc_id") =!= col("canonical_id")).as("is_dup"))
      .orderBy("doc_id")
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(out === Seq((1L, 1L, false), (2L, 2L, false), (3L, 1L, true)))
  }

  test("minhash LSH finds a planted near-duplicate pair") {
    val base = "the quick brown fox jumps over the lazy dog and then " +
      "runs far away into the deep dark forest tonight"
    val nearDup = base.replace("tonight", "today")
    val other = "completely different words about spark shuffle " +
      "partitions and broadcast joins at massive scale"
    val docs = Seq((1L, base), (2L, nearDup), (3L, other))
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("dedup_spec_docs")
    import graft.functions.TextFunctions
    val sh = docs.select(col("doc_id"),
      TextFunctions.shingles(col("text"), 3).as("sh"))
    val sig = sh.select(col("doc_id"),
      TextFunctions.minhashSignature(col("sh"), 12).as("sig"))
    val bands = sig.select(col("doc_id"),
      posexplode(array((0 until 4).map(b =>
        TextFunctions.bandKey(col("sig"), b, 3)): _*)).as(Seq("band", "key")))
    val cand = bands.as("a").join(bands.as("b"), Seq("band", "key"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .distinct().as[(Long, Long)].collect().toSet
    assert(cand.contains((1L, 2L)))
    assert(!cand.contains((1L, 3L)))
  }

  test("d05 near-dup pairs are symmetric-free (a < b) and thresholded") {
    val rows = SparkEntry.queries("d05_embedding_near_dup")(spark, sf0001)
      .as[(Long, Long, Double)].collect()
    assert(rows.forall { case (a, b, s) => a < b && s >= 0.35 })
  }
}
