package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Corpus-curation family (t07–t09) on planted fixtures: repetition
  * flagging, benchmark decontamination, mixture resampling. */
class CurationSpec extends SparkTestBase {
  import spark.implicits._

  private def writeDocs(rows: Seq[(Long, String, String, String)]): String = {
    val dir = Files.createTempDirectory("graft_curation").toString
    rows.map { case (id, text, lang, source) =>
      (id, text, lang, source, text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("t07 flags a repetition-bombed doc, passes a diverse one") {
    val diverse = (1 to 25).map(i => s"w$i").mkString(" ")
    val bombed = ("spam ham " * 30).trim
    val dir = writeDocs(Seq(
      (0L, diverse, "en", "src0"), (1L, bombed, "en", "src1")))
    val out = SparkEntry.queries("t07_repetition")(spark, dir)
      .select("doc_id", "dup_frac", "top_frac", "flagged")
      .as[(Long, Double, Double, Boolean)].collect().sortBy(_._1)

    val Array(ok, bad) = out
    assert(!ok._4 && ok._2 === 0.0, s"diverse doc flagged: $ok")
    // 59 grams, 2 distinct: dup 57/59, top 30/59
    assert(bad._4 && bad._2 > 0.9 && bad._3 > 0.5, s"bomb not flagged: $bad")
  }

  test("t08 reports planted verbatim contamination and nothing else") {
    val benchText = (1 to 20).map(i => s"b$i").mkString(" ")
    val clean = (1 to 20).map(i => s"c$i").mkString(" ")
    val dir = writeDocs(Seq(
      (0L, benchText, "en", "src0"),      // benchmark doc
      (11L, benchText, "en", "src1"),     // verbatim copy → contaminated
      (12L, clean, "en", "src2")))        // disjoint vocabulary → clean
    val out = SparkEntry.queries("t08_decontaminate")(spark, dir)
      .as[(Long, Long, Long)].collect().toSeq
    // 20 tokens → 13 8-gram shingles, all shared
    assert(out === Seq((11L, 0L, 13L)))
  }

  test("data checks count planted violations exactly, one pass") {
    import org.apache.spark.sql.functions._
    val df = Seq(
      (Some(1L), "ok row"), (Some(1L), "dup id"),   // duplicate id
      (None, "null id"), (Some(3L), ""))            // null id, empty text
      .toDF("id", "text")
    val out = graft.operators.DataChecks.run(df,
        rowChecks = Seq(
          "id_not_null" -> col("id").isNotNull,
          "text_nonempty" -> (length(col("text")) > 0)),
        uniqueChecks = Seq("id_unique" -> col("id")))
      .as[(String, Long, Long, Boolean)].collect().toSeq
    assert(out === Seq(
      ("id_not_null", 1L, 4L, false),
      ("id_unique", 1L, 4L, false),   // count(id)=3, distinct=2
      ("text_nonempty", 1L, 4L, false)))

    val clean = graft.operators.DataChecks.run(df.filter(col("id") === 1L),
      rowChecks = Seq("text_nonempty" -> (length(col("text")) > 0)))
      .as[(String, Long, Long, Boolean)].collect().toSeq
    assert(clean === Seq(("text_nonempty", 0L, 2L, true)))
  }

  test("t09 keeps full-weight sources entirely, downsamples the rest") {
    val docs = Tables.documents(spark, sf0001)
    val kept = SparkEntry.queries("t09_mixture_sample")(spark, sf0001)
    val full = docs.filter(col("source").rlike("^src[0-9]$"))
    assert(kept.filter(col("source").rlike("^src[0-9]$")).count()
      === full.count(), "a permille=1000 source lost rows")
    val downTotal = docs.filter(col("source").rlike("^src1[0-9]$")).count()
    val downKept = kept.filter(col("source").rlike("^src1[0-9]$")).count()
    assert(downKept > 0 && downKept < downTotal,
      s"40% sources kept $downKept of $downTotal")
    // deterministic: a rerun selects the identical rows
    val again = SparkEntry.queries("t09_mixture_sample")(spark, sf0001)
    assert(kept.collect().map(_.toSeq).toSeq
      === again.collect().map(_.toSeq).toSeq)
  }
}
