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
    val cand = graft.operators.MinHashLSH.candidatePairs(docs, 4, 3)
      .as[(Long, Long)].collect().toSet
    assert(cand.contains((1L, 2L)))
    assert(!cand.contains((1L, 3L)))
    val dups = graft.operators.MinHashLSH.nearDuplicates(docs)
      .as[(Long, Long, Double)].collect()
    assert(dups.exists { case (a, b, j) => a == 1L && b == 2L && j > 0.5 })
  }

  test("d05 near-dup pairs are symmetric-free (a < b) and thresholded") {
    val rows = SparkEntry.queries("d05_embedding_near_dup")(spark, sf0001)
      .as[(Long, Long, Double)].collect()
    assert(rows.forall { case (a, b, s) => a < b && s >= 0.35 })
  }
}
