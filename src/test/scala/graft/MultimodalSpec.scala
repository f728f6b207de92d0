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

  test("resize bounds geometry and shrinks the payload") {
    val media = Multimodal.mediaFromDocuments(spark, sf0001).limit(20)
    val sizes = media.collect()
      .map(r => r.getAs[Array[Byte]]("payload").length).toSeq
    val out = Multimodal.resize(media, 64, 64).collect()
    assert(out.length === 20)
    out.foreach { r =>
      assert(r.getAs[Int]("width") <= 64 && r.getAs[Int]("height") <= 64)
    }
    val outSizes = out.map(_.getAs[Array[Byte]]("payload").length).toSeq
    assert(outSizes.sum <= sizes.sum)
  }

  test("frame sampling explodes each payload into strided segments") {
    val media = Multimodal.mediaFromDocuments(spark, sf0001).limit(5)
    val frames = Multimodal.sampleFrames(media, nFrames = 8, stride = 2)
      .collect()
    val byId = frames.groupBy(_.getLong(0))
    assert(byId.size === 5)
    byId.values.foreach { fs =>
      val idxs = fs.map(_.getAs[Int]("frame_idx")).sorted.toSeq
      assert(idxs.forall(_ % 2 === 0), "stride not respected")
      assert(fs.forall(_.getAs[Array[Byte]]("frame").nonEmpty))
    }
  }

  test("frame byte counts are exact integer histograms of each frame") {
    val media = Multimodal.mediaFromDocuments(spark, sf0001).limit(10)
    val frames = Multimodal.sampleFrames(media, nFrames = 6, stride = 2)
    val counted = Multimodal.frameByteCounts(frames).collect()
    assert(counted.nonEmpty)
    counted.foreach { r =>
      val n = r.getAs[Int]("n_bytes")
      val counts = r.getSeq[Long](3)
      assert(counts.length === 8)
      assert(counts.sum === n.toLong, "bucket counts must sum to bytes")
    }
    // cross-check one frame against a driver-side histogram
    val f0 = frames.collect().head
    val payload = f0.getAs[Array[Byte]]("frame")
    val expected = new Array[Long](8)
    payload.foreach { b => expected((b & 0xff) >> 5) += 1L }
    val got = counted.find(r =>
      r.getLong(0) == f0.getLong(0) &&
        r.getAs[Int]("frame_idx") == f0.getAs[Int]("frame_idx")).get
    assert(got.getSeq[Long](3).toSeq === expected.toSeq)
  }
}
