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

  test("PngCodec round-trips REAL pixels through javax.imageio: decoded " +
      "geometry and channel sums match the encoded closed form, and the " +
      "payload is a genuine PNG container") {
    val bytes = Multimodal.PngCodec.encode(5, 3, (x, y) =>
      ((10 * x + y) << 16) | ((200 - x) << 8) | (x * y))
    // PNG magic: \x89PNG\r\n\x1a\n — the stub never produced this
    assert(bytes.take(8).toSeq ===
      Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
        .map(_.toByte))
    val (w, h, sr, sg, sb) = Multimodal.PngCodec.decodeSums(bytes)
    assert((w, h) === ((5, 3)))
    val px = for (x <- 0 until 5; y <- 0 until 3) yield (x, y)
    assert(sr === px.map { case (x, y) => 10L * x + y }.sum)
    assert(sg === px.map { case (x, _) => 200L - x }.sum)
    assert(sb === px.map { case (x, y) => x.toLong * y }.sum)

    // the distributed path: synthetic corpus → executor-side decode;
    // spot-check one media's sums against the closed form
    val pngs = Multimodal.syntheticPngs(spark, sf0001)
    val sums = Multimodal.decodePngSums(pngs).collect()
    assert(sums.nonEmpty)
    sums.take(5).foreach { r =>
      val id = r.getLong(0)
      val (wd, ht) = ((4 + id % 5).toInt, (3 + id % 4).toInt)
      assert(r.getInt(1) === wd && r.getInt(2) === ht)
      val pxs = for (x <- 0 until wd; y <- 0 until ht) yield (x, y)
      assert(r.getLong(3) === pxs.map { case (x, y) =>
        (id * 31 + x * 7 + y * 13) % 256 }.sum)
      assert(r.getLong(4) === pxs.map { case (x, y) =>
        (id * 17 + x * 11 + y * 5) % 256 }.sum)
      assert(r.getLong(5) === pxs.map { case (x, y) =>
        (id * 13 + x * 3 + y * 19) % 256 }.sum)
    }
  }
}
