package graft

import graft.operators.Multimodal

class MultimodalSpec extends SparkTestBase {

  test("media pipeline decodes features partition-locally") {
    val media = Multimodal.mediaFromDocuments(spark, sf0001)
    val feats = Multimodal.decodeFeatures(media)
    assert(feats.schema === Multimodal.featureSchema)
    val rows = feats.limit(10).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Int]("width") >= 1 && r.getAs[Int]("width") <= 1920)
      assert(r.getAs[Int]("height") >= 1 && r.getAs[Int]("height") <= 1080)
      val f = r.getSeq[Double](r.fieldIndex("feature"))
      assert(f.length === 8)
      assert(math.abs(f.sum - 1.0) < 1e-9) // normalised histogram
    }
  }

  test("decode is deterministic") {
    val a = Multimodal.FakeCodec.decode("text/plain", "hello".getBytes)
    val b = Multimodal.FakeCodec.decode("text/plain", "hello".getBytes)
    assert(a._1 === b._1 && a._2 === b._2 && a._3.toSeq === b._3.toSeq)
  }
}
