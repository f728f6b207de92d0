package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns with typed metadata (the reference's figure-extraction path,
  * parser_pinecone_storage.py:106-117, generalised per the north star).
  *
  * The Spark-side plumbing — schema, batch shape, partition-local decode —
  * is real. IMAGE decode is real too (round 10): [[PngCodec]] encodes and
  * decodes genuine PNGs through JDK `javax.imageio` inside the
  * mapPartitions boundary. Audio/video stay STUBBED (the JDK ships no
  * such codecs) behind [[FakeCodec]], a deterministic stand-in with the
  * same signature a real decoder (ffmpeg via mapPartitions, or a Pandas
  * UDF in PySpark) would have.
  *
  * Scale shape: decode runs inside `mapPartitions`, one codec
  * initialisation per partition (not per row), map-only, no shuffle; the
  * output is narrow typed metadata so downstream scans prune the heavy
  * binary column away.
  */
object Multimodal {

  /** Canonical media-table schema. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true)))

  /** Decoded-feature schema produced by [[decodeFeatures]]. */
  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("feature", ArrayType(DoubleType), nullable = false)))

  /** Deterministic stand-in for a real media codec: "dimensions" derive
    * from the payload hash, the "feature vector" from byte statistics.
    * Replace with a real decoder per media_type in production. */
  object FakeCodec {
    def decode(mediaType: String, payload: Array[Byte])
        : (Int, Int, Array[Double]) = {
      val n = if (payload == null) 0 else payload.length
      val h = java.util.Arrays.hashCode(payload)
      val width  = math.abs(h % 1920) + 1
      val height = math.abs((h / 1920) % 1080) + 1
      // 8-bucket byte histogram, normalised — a feature a real extractor
      // would replace with model embeddings.
      val hist = new Array[Double](8)
      if (payload != null) payload.foreach { b =>
        hist(((b & 0xff) >> 5)) += 1.0
      }
      val total = math.max(1.0, n.toDouble)
      (width, height, hist.map(_ / total))
    }
  }

  /** Build a media DataFrame from the documents fixture (text bytes as the
    * opaque payload — schema-faithful stand-in for image/audio blobs). */
  def mediaFromDocuments(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.documents(spark, dir)
      .select(col("doc_id").as("media_id"),
        lit("text/plain").as("media_type"),
        encode(col("text"), "UTF-8").as("payload"))

  /** Partition-local decode → typed features. One codec init per
    * partition; rows stream through without materialising the partition. */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val enc = ExpressionEncoder(featureSchema)
    media.select("media_id", "media_type", "payload")
      .mapPartitions { rows =>
        // (real codecs would be initialised here, once per partition)
        rows.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          val (w, h, feat) = FakeCodec.decode(r.getString(1), payload)
          Row(r.getLong(0), r.getString(1),
            if (payload == null) 0 else payload.length, w, h, feat)
        }
      }(enc)
  }

  /** Output schema of [[resize]]: original + target geometry + payload. */
  val resizedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("payload", BinaryType, nullable = true)))

  /** Resize stub: same mapPartitions shape a real image scaler has — reads
    * the decoded geometry, emits the target geometry plus a payload whose
    * size scales with the target area (deterministic byte subsample; a real
    * codec would re-encode pixels). */
  def resize(media: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val enc = ExpressionEncoder(resizedSchema)
    media.select("media_id", "media_type", "payload")
      .mapPartitions { rows =>
        rows.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          val (w, h, _) = FakeCodec.decode(r.getString(1), payload)
          val scale = math.min(1.0,
            math.min(maxW.toDouble / w, maxH.toDouble / h))
          val nw = math.max(1, (w * scale).toInt)
          val nh = math.max(1, (h * scale).toInt)
          val outLen =
            math.max(1, ((if (payload == null) 1 else payload.length)
              * scale * scale).toInt)
          Row(r.getLong(0), nw, nh,
            if (payload == null) Array.empty[Byte]
            else payload.take(outLen))
        }
      }(enc)
  }

  /** Output schema of [[sampleFrames]]: one row per sampled frame. */
  val frameSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("frame", BinaryType, nullable = false)))

  /** Output schema of [[frameByteCounts]]: per-frame RAW bucket counts. */
  val frameCountSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("counts", ArrayType(LongType), nullable = false)))

  /** Per-frame feature extraction emitting RAW integer bucket counts
    * (the un-normalised form of [[FakeCodec]]'s histogram): counts sum
    * exactly across frames — the representation temporal pooling wants,
    * where pooling per-frame RATIOS would stack order-dependent float
    * additions. Same mapPartitions decode shape as [[decodeFeatures]]. */
  def frameByteCounts(frames: DataFrame): DataFrame = {
    val enc = ExpressionEncoder(frameCountSchema)
    frames.select("media_id", "frame_idx", "frame")
      .mapPartitions { rows =>
        rows.map { r =>
          // positional get: rows produced by an upstream mapPartitions
          // encoder carry no field-name schema
          val payload = r.getAs[Array[Byte]](2)
          val hist = new Array[Long](8)
          payload.foreach { b => hist((b & 0xff) >> 5) += 1L }
          Row(r.getLong(0), r.getInt(1), payload.length, hist)
        }
      }(enc)
  }

  /** REAL image codec (round 10 — the image half of the m-family is no
    * longer a stub): JDK `javax.imageio` PNG encode/decode, run inside
    * the same mapPartitions boundary the stub documented for a real
    * codec. Headless-safe (BufferedImage + ImageIO never touch a
    * display). Audio/video decode stays stubbed — the JDK ships no
    * codecs for those — with [[FakeCodec]] documenting the boundary. */
  object PngCodec {
    def encode(w: Int, h: Int, rgb: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { img.setRGB(x, y, rgb(x, y)); x += 1 }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** (width, height, sum_r, sum_g, sum_b) from REAL decoded pixels —
      * integer channel sums, so the derived feature is exact and
      * oracle-checkable. */
    def decodeSums(bytes: Array[Byte]): (Int, Int, Long, Long, Long) = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      require(img != null, "PngCodec.decodeSums: not a decodable image")
      val (w, h) = (img.getWidth, img.getHeight)
      var (sr, sg, sb) = (0L, 0L, 0L)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val v = img.getRGB(x, y)
          sr += (v >> 16) & 0xff; sg += (v >> 8) & 0xff; sb += v & 0xff
          x += 1
        }
        y += 1
      }
      (w, h, sr, sg, sb)
    }
  }

  /** Deterministic synthetic PNG corpus from the documents fixture: one
    * REAL (ImageIO-encoded) tiny image per doc, each pixel's channels a
    * closed-form function of (doc_id, x, y) — so decoded features are
    * DuckDB-reproducible without the oracle decoding anything. Encoding
    * runs on the executors, one row per doc, partition-local. */
  val pngSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = false)))

  def syntheticPngs(spark: SparkSession, dir: String): DataFrame = {
    val enc = ExpressionEncoder(pngSchema)
    graft.Tables.documents(spark, dir).select("doc_id")
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val w = (4 + id % 5).toInt
          val h = (3 + id % 4).toInt
          Row(id, PngCodec.encode(w, h, (x, y) => {
            val red = ((id * 31 + x * 7 + y * 13) % 256).toInt
            val green = ((id * 17 + x * 11 + y * 5) % 256).toInt
            val blue = ((id * 13 + x * 3 + y * 19) % 256).toInt
            (red << 16) | (green << 8) | blue
          }))
        }
      }(enc)
  }

  /** Output schema of [[decodePngSums]]. */
  val pngSumSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("sum_r", LongType, nullable = false),
    StructField("sum_g", LongType, nullable = false),
    StructField("sum_b", LongType, nullable = false)))

  /** REAL partition-local PNG decode → exact per-channel pixel sums.
    * Same mapPartitions shape as [[decodeFeatures]], but the bytes
    * genuinely round-trip through the PNG container. */
  def decodePngSums(media: DataFrame): DataFrame = {
    val enc = ExpressionEncoder(pngSumSchema)
    media.select("media_id", "payload")
      .mapPartitions { rows =>
        rows.map { r =>
          val (w, h, sr, sg, sb) =
            PngCodec.decodeSums(r.getAs[Array[Byte]](1))
          Row(r.getLong(0), w, h, sr, sg, sb)
        }
      }(enc)
  }

  /** Output schema of [[decodePngHistogram]]. */
  val pngHistSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_px", LongType, nullable = false),
    StructField("counts", ArrayType(LongType), nullable = false)))

  /** REAL-pixel feature extraction (round 11 — m02/m04 moved off the
    * byte-histogram stub): decode the PNG through [[PngCodec]] and
    * bucket the RED channel of every decoded pixel (bucket = r >> 5,
    * 8 buckets) — raw integer counts, so the derived ratio features
    * are exact IEEE divisions both engines replay identically, and on
    * the [[syntheticPngs]] corpus the closed-form pixels make the
    * whole REAL decode oracle-checkable without the oracle touching an
    * image. Same partition-local mapPartitions shape as every decode
    * here: one codec scope per partition, no shuffle. */
  def decodePngHistogram(media: DataFrame): DataFrame = {
    val enc = ExpressionEncoder(pngHistSchema)
    media.select("media_id", "payload")
      .mapPartitions { rows =>
        rows.map { r =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
          require(img != null,
            "decodePngHistogram: not a decodable image")
          val (w, h) = (img.getWidth, img.getHeight)
          val hist = new Array[Long](8)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              hist(((img.getRGB(x, y) >> 16) & 0xff) >> 5) += 1L
              x += 1
            }
            y += 1
          }
          Row(r.getLong(0), w, h, w.toLong * h, hist)
        }
      }(enc)
  }

  /** Frame-sampling stub: treats the payload as `nFrames` equal segments
    * and emits every `stride`-th — the flatMap row-explosion shape of a
    * real video frame sampler (one row in, many typed rows out, still
    * partition-local, no shuffle). */
  def sampleFrames(media: DataFrame, nFrames: Int, stride: Int): DataFrame = {
    val enc = ExpressionEncoder(frameSchema)
    media.select("media_id", "media_type", "payload")
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          if (payload == null || payload.isEmpty) Iterator.empty
          else {
            val segLen = math.max(1, payload.length / nFrames)
            (0 until nFrames by stride).iterator
              .filter(i => i * segLen < payload.length)
              .map { i =>
                Row(r.getLong(0), i,
                  payload.slice(i * segLen,
                    math.min(payload.length, (i + 1) * segLen)))
              }
          }
        }
      }(enc)
  }
}
