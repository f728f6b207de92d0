package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.sources.BinaryDocuments

/** The binaryFile ingestion edge (reference entry point: S3 listing with a
  * .pdf suffix predicate feeding per-file extraction). Fixture files are
  * written under target/ so the suite is self-contained. */
class BinaryDocumentsSpec extends SparkTestBase {

  private val fixtureDir = "target/binary-docs-spec"

  private def writeFixtures(): Unit = {
    val dir = Paths.get(fixtureDir)
    if (Files.exists(dir)) {
      import scala.reflect.io.Directory
      new Directory(dir.toFile).deleteRecursively()
    }
    Files.createDirectories(dir)
    Files.write(dir.resolve("alpha.pdf"),
      "alpha document text".getBytes(StandardCharsets.UTF_8))
    Files.write(dir.resolve("beta.pdf"),
      "beta document text with more words".getBytes(StandardCharsets.UTF_8))
    Files.write(dir.resolve("ignored.txt"),
      "must never be listed".getBytes(StandardCharsets.UTF_8))
  }

  test("pathGlobFilter excludes non-matching objects at listing") {
    writeFixtures()
    val paths = BinaryDocuments.scan(spark, fixtureDir)
      .select("path").collect().map(_.getString(0)).toSeq
    assert(paths.size === 2, s"expected only the 2 PDFs, got $paths")
    assert(paths.forall(_.endsWith(".pdf")))
    assert(!paths.exists(_.contains("ignored")))
  }

  test("toDocuments produces chunk/embed-compatible document rows") {
    writeFixtures()
    val docs = BinaryDocuments.toDocuments(spark, fixtureDir)
      .orderBy("source").collect()
    assert(docs.length === 2)
    val alpha = docs.head
    assert(alpha.getAs[String]("source") === "alpha.pdf")
    assert(alpha.getAs[String]("text") === "alpha document text")
    assert(alpha.getAs[Long]("n_bytes") === 19L)
    // doc_id is the path hash: stable across listings
    val again = BinaryDocuments.toDocuments(spark, fixtureDir)
      .orderBy("source").collect()
    assert(docs.map(_.getAs[Long]("doc_id")).toSeq ===
      again.map(_.getAs[Long]("doc_id")).toSeq)
    // the rows feed the ingestion pipeline unchanged: chunk + embed
    val chunks = BinaryDocuments.toDocuments(spark, fixtureDir)
      .select(col("doc_id"),
        posexplode(graft.functions.TextFunctions
          .chunks(col("text"), 10, 2)).as(Seq("idx", "chunk")))
    assert(chunks.count() > 2)
  }

  test("toMedia feeds the opaque-codec decode path") {
    writeFixtures()
    val feats = Multimodal
      .decodeFeatures(BinaryDocuments.toMedia(spark, fixtureDir))
      .collect()
    assert(feats.length === 2)
    assert(feats.forall(_.getAs[String]("media_type") === "application/pdf"))
    assert(feats.forall(_.getAs[Int]("n_bytes") > 0))
    assert(feats.forall(_.getAs[Seq[Double]]("feature").length === 8))
  }
}
