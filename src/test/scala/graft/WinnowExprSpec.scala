package graft

import org.apache.spark.sql.functions._

import graft.functions.{CrossHash, TextFunctions}

/** Pins the fused [[graft.plans.WinnowPrintsExpr]] /
  * [[graft.plans.ShingleHashesExpr]] to the HOF pipelines they
  * replaced (winnowing fingerprints; n-gram shingle hashes). */
class WinnowExprSpec extends SparkTestBase {

  private def weird = {
    val sp = spark
    import sp.implicits._
    Seq(
      (1L, ""), (2L, "x"), (3L, "exactly8"), (4L, "ninechars"),
      (5L, "a bc def ghij klmno"), (6L, "  double  spaces  "),
      (7L, "Ünïcødé 多字节 characters — astral 𝄞 clef inside"),
      (8L, ("repeat me " * 50).trim), (9L, "shrt"),
      (10L, "a b"), (11L, "one two three four"))
      .toDF("doc_id", "text")
  }

  private def fixture = spark.read
    .parquet(s"$sf0001/documents.parquet").select("doc_id", "text")

  test("fused winnowing prints equal the HOF pipeline as SETS per doc") {
    val sp = spark
    import sp.implicits._
    def hofPrints(docs: org.apache.spark.sql.DataFrame, k: Int, w: Int) = {
      val text = col("text")
      val n = greatest(length(text) - (k - 1), lit(1))
      val hs = transform(sequence(lit(1), n),
        i => CrossHash.hash60(text.substr(i, lit(k))))
      val wins = TextFunctions.bound(hs) { h =>
        array_distinct(transform(
          sequence(lit(1), greatest(size(h) - (w - 1), lit(1))),
          j => least((0 until w).map(o =>
            element_at(h, least(j + o, size(h)))): _*)))
      }
      docs.select(col("doc_id"), explode(wins).as("fp"))
    }
    Seq(weird, fixture).foreach { docs =>
      val got = graft.operators.Winnowing.fingerprints(docs, 8, 8)
        .as[(Long, Long)].collect().sorted.toSeq
      val want = hofPrints(docs, 8, 8)
        .as[(Long, Long)].collect().sorted.toSeq
      assert(got === want && got.nonEmpty)
    }
  }

  test("fused shingle hashes equal hash60 over the HOF shingles") {
    val sp = spark
    import sp.implicits._
    def hofHashes(docs: org.apache.spark.sql.DataFrame, n: Int) =
      docs.select(col("doc_id"),
        explode(TextFunctions.shingles(col("text"), n)).as("s"))
        .select(col("doc_id"), CrossHash.hash60(col("s")).as("h"))
    def fused(docs: org.apache.spark.sql.DataFrame, n: Int) =
      docs.select(col("doc_id"),
        explode(org.apache.spark.sql.graft.ColumnBridge.column(
          graft.plans.ShingleHashesExpr(
            org.apache.spark.sql.graft.ColumnBridge
              .expression(col("text")), n))).as("h"))
    Seq(weird, fixture).foreach { docs =>
      val got = fused(docs, 3).as[(Long, Long)].collect().sorted.toSeq
      val want = hofHashes(docs, 3).as[(Long, Long)].collect().sorted.toSeq
      assert(got === want && got.nonEmpty)
    }
  }

  test("fused block digests hex-encode to md5 over the HOF blocks") {
    val sp = spark
    import sp.implicits._
    def hofBlocks(docs: org.apache.spark.sql.DataFrame, n: Int) =
      docs.select(col("doc_id"),
        explode(TextFunctions.blocks(col("text"), n)).as("blk"))
        .select(col("doc_id"), md5(col("blk")).as("h"))
    def fused(docs: org.apache.spark.sql.DataFrame, n: Int) =
      docs.select(col("doc_id"),
        explode(org.apache.spark.sql.graft.ColumnBridge.column(
          graft.plans.BlockMd5Expr(
            org.apache.spark.sql.graft.ColumnBridge
              .expression(col("text")), n))).as("d"))
        .select(col("doc_id"), lower(hex(col("d"))).as("h"))
    Seq(weird, fixture).foreach { docs =>
      val got = fused(docs, 10).as[(Long, String)].collect().sorted.toSeq
      val want = hofBlocks(docs, 10).as[(Long, String)].collect().sorted.toSeq
      assert(got === want && got.nonEmpty)
    }
  }
}
