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

  test("observed metrics ride the action with no extra job") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf0001)
    val (df, obs) = graft.operators.DataChecks.observed(
      docs, "ingest_metrics",
      "n_rows" -> count(lit(1)),
      "n_null_text" -> sum(when(col("text").isNull, 1L).otherwise(0L)),
      "total_chars" -> sum(col("n_chars")))
    val expectChars = docs.agg(sum("n_chars")).collect()(0).getLong(0)
    val n = df.filter(col("n_chars") >= 0).count() // the one and only job
    val m = obs.get
    assert(m("n_rows") === n)
    assert(m("n_null_text") === 0L)
    assert(m("total_chars") === expectChars)
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

  test("Redact.scrub replaces planted PII and counts every hit") {
    val df = Seq(
      (0L, "mail alice@example.com and 10.0.0.1 then +1 (555) 123-4567 end"),
      (1L, "no pii here at all"))
      .toDF("doc_id", "text")
    val out = graft.operators.Redact
      .scrub(df, "text", graft.operators.Redact.PiiPatterns)
      .select("doc_id", "n_email", "n_ipv4", "n_phone", "redacted")
      .as[(Long, Int, Int, Int, String)].collect().sortBy(_._1)

    val (_, ne, ni, np, red) = out(0)
    assert((ne, ni, np) === ((1, 1, 1)), s"counts wrong: $out")
    assert(red === "mail [EMAIL] and [IP] then [PHONE] end", red)
    assert(out(1) === ((1L, 0, 0, 0, "no pii here at all")))
  }

  test("t15 flags the doc made of corpus-wide boilerplate") {
    // bigram "copy right" appears in 3/4 docs (75% > 60% → boilerplate);
    // doc 2 is entirely that bigram, docs 0/1 carry it amid unique text,
    // doc 3 never has it.
    val dir = writeDocs(Seq(
      (0L, "copy right u1 u2 u3 u4 u5 u6 u7 u8 u9", "en", "s"),
      (1L, "v1 v2 copy right v3 v4 v5 v6 v7 v8 v9", "en", "s"),
      (2L, "copy right", "en", "s"),
      (3L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11", "en", "s")))
    val out = SparkEntry.queries("t15_boilerplate")(spark, dir)
      .select("doc_id", "n_boiler", "flagged")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    // docs 0/1: 10 bigrams, 1 boilerplate ("copy right"); doc 2: its only
    // bigram is boilerplate; doc 3: none. ("right u1"/"v2 copy" etc. are
    // distinct bigrams with df=1.)
    assert(out === Seq((0L, 1L, false), (1L, 1L, false),
      (2L, 1L, true), (3L, 0L, false)))
  }

  test("t16 packs docs into bins by exclusive token prefix-sum") {
    // token counts per doc: 3, 2, 4, 1; with a 2048 target everything
    // lands in bin 0 — so use the REAL query on a fixture whose sums are
    // checked by hand against a 4-token bin via the oracle semantics:
    // prior sums 0,3,5,9 → bins 0,0,1,2 for target 4 would need a
    // different constant, so instead verify the invariants the packer
    // guarantees at the query's own 2048 target.
    val dir = writeDocs(Seq(
      (0L, "a b c", "en", "sA"), (1L, "d e", "en", "sA"),
      (2L, "f g h i", "en", "sA"), (3L, "j", "en", "sB")))
    val out = SparkEntry.queries("t16_pack_sequences")(spark, dir)
      .select("source", "bin", "n_docs", "bin_tokens", "first_doc", "last_doc")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(("sA", 0L, 3L, 9L, 0L, 2L), ("sB", 0L, 1L, 1L, 3L, 3L)))

    // and on real data: bins within a source are contiguous 0..n-1, every
    // doc is in exactly one bin, and every bin except the last holds less
    // than target + its-last-doc tokens (greedy fill never skips a bin).
    val real = SparkEntry.queries("t16_pack_sequences")(spark, sf0001)
      .select("source", "bin", "n_docs")
      .as[(String, Long, Long)].collect().toSeq
    real.groupBy(_._1).foreach { case (src, rows) =>
      val bins = rows.map(_._2).sorted
      assert(bins === (0L until bins.size).toSeq, s"$src bins not contiguous: $bins")
    }
    val docsTotal = Tables.documents(spark, sf0001).count()
    assert(real.map(_._3).sum === docsTotal)
  }
}
