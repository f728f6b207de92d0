package graft

import org.apache.spark.sql.functions._

import graft.functions.{CrossHash, TextFunctions}
import graft.operators.MinHashLSH

/** Pins the fused [[graft.plans.MinHashSigExpr]] to the exploded
  * shingle → hash60 % P → k affine-min pipeline it replaced. */
class MinHashSigSpec extends SparkTestBase {

  /** The pre-fusion pipeline, verbatim. */
  private def oldSignatures(docs: org.apache.spark.sql.DataFrame,
      k: Int) = {
    val flat = docs
      .select(col("doc_id"),
        explode(TextFunctions.shingles(col("text"), 3)).as("s"))
      .select(col("doc_id"),
        (CrossHash.hash60(col("s")) % MinHashLSH.P).as("h"))
    val mins = (0 until k).map(j =>
      min((col("h") * MinHashLSH.aCoef(j) + MinHashLSH.bCoef(j))
        % MinHashLSH.P).as(s"m$j"))
    flat.groupBy("doc_id").agg(mins.head, mins.tail: _*)
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq).toSeq.sortBy(_.head.asInstanceOf[Long])

  test("fused signature equals the exploded pipeline on adversarial " +
      "token shapes and fixture docs (k = 12)") {
    import spark.implicits._
    val weird = Seq(
      (1L, ""), (2L, " "), (3L, "one"), (4L, "one two"),
      (5L, "one two three"), (6L, "one two three four five"),
      (7L, "a  b c"), (8L, " lead and trail "),
      (9L, "Ünïcødé 多字节 tokens ✓ mixed in here"),
      (10L, ("w " * 200).trim))
      .toDF("doc_id", "text")
    val fixture = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text")
    Seq(weird, fixture).foreach { docs =>
      val got = rows(MinHashLSH.signatures(docs, 12))
      val want = rows(oldSignatures(docs, 12))
      assert(got === want && got.nonEmpty)
    }
  }

  test("null text drops the document; signature schema keeps m0..mk-1") {
    import spark.implicits._
    val docs = Seq((1L, Some("x y z w")), (2L, None))
      .toDF("doc_id", "text")
    val got = MinHashLSH.signatures(docs, 4)
    assert(got.columns.toSeq === Seq("doc_id", "m0", "m1", "m2", "m3"))
    assert(got.select("doc_id").as[Long].collect().toSeq === Seq(1L))
  }
}
