package graft

import org.apache.spark.sql.functions._

import graft.functions.Embedder

class EmbedderSpec extends SparkTestBase {
  import spark.implicits._

  test("embedding is deterministic, right dimension, in [-1, 1]") {
    val vs = Seq("hello world", "hello world", "other text").toDF("t")
      .select(Embedder.embed(col("t"), 16).as("v")).as[Seq[Double]].collect()
    assert(vs(0) === vs(1))
    assert(vs(0) !== vs(2))
    assert(vs.forall(_.length === 16))
    assert(vs.flatten.forall(x => x >= -1.0 && x <= 1.0))
  }

  test("driver-side embedQuery equals the columnar embed of the same text") {
    val colv = Seq("spark window join").toDF("t")
      .select(Embedder.embed(col("t"), 8).as("v")).as[Seq[Double]].head()
    val drv = Embedder.embedQuery("spark window join", 8)
    assert(colv === drv.toSeq)
  }
}
