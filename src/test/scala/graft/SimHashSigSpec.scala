package graft

import org.apache.spark.sql.functions._

/** Pins the fused [[graft.plans.SimHashSigExpr]] to the exploded
  * token → hash60 → 32-vote-sum pipeline it replaced — the signature
  * every SimHash-banded dedup query (d03/d04, the d08 cluster family,
  * the incremental maintainers) derives candidates from. */
class SimHashSigSpec extends SparkTestBase {

  /** The pre-fusion pipeline, verbatim. */
  private def oldSignatures(docs: org.apache.spark.sql.DataFrame) = {
    val flat = docs
      .select(col("doc_id"),
        explode(split(col("text"), " ")).as("tok"))
      .select(col("doc_id"),
        graft.functions.CrossHash.hash60(col("tok")).as("h"))
    val votes = (0 until 32).map(b =>
      sum(when(shiftright(col("h"), b) % 2 === 1, 1).otherwise(-1))
        .as(s"v$b"))
    flat.groupBy("doc_id")
      .agg(votes.head, votes.tail: _*)
      .select(col("doc_id"),
        (0 until 32).map(b =>
          when(col(s"v$b") > 0, lit(1L << b)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
  }

  test("fused signature equals the exploded pipeline on adversarial " +
      "token shapes (empties, unicode, separators) and fixture docs") {
    import spark.implicits._
    val weird = Seq(
      (1L, ""), (2L, " "), (3L, "  "), (4L, "a"), (5L, " a"),
      (6L, "a "), (7L, "a  b"), (8L, "many words repeated many words"),
      (9L, "Ünïcødé 多字节 tokens ✓ mixed"), (10L, "tab\tinside token"),
      (11L, ("w" * 500) + " " + ("x" * 500)))
      .toDF("doc_id", "text")
    val fixture = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text")
    Seq(weird, fixture).foreach { docs =>
      val got = graft.operators.SimHash.signatures(docs)
        .as[(Long, Long)].collect().sorted.toSeq
      val want = oldSignatures(docs)
        .as[(Long, Long)].collect().sorted.toSeq
      assert(got === want && got.nonEmpty)
    }
  }

  test("null text drops the document, like the exploded form") {
    import spark.implicits._
    val docs = Seq((1L, Some("x y")), (2L, None))
      .toDF("doc_id", "text")
    val got = graft.operators.SimHash.signatures(docs)
      .select("doc_id").as[Long].collect().toSeq
    assert(got === Seq(1L))
  }
}
