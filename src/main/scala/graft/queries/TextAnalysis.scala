package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions
import graft.operators.{Redact, SkewTools}

/** Text-analysis operator family (LLM-pipeline north star): language ID,
  * quality scoring, token counting, fingerprinting. All map-only —
  * embarrassingly parallel scans with codegen'd expressions, no shuffle
  * except the final presentation sort.
  */
object TextAnalysis extends QueryPack {

  private def markerScore(t: Column, words: Seq[String]): Column =
    size(filter(t, x => x.isin(words.map(w => w: Any): _*)))

  private val enWords = Seq("the", "and", "of", "is")
  private val deWords = Seq("der", "die", "das", "und")
  private val esWords = Seq("el", "la", "los", "de")

  override val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // n-gram/marker-word language ID heuristic; deterministic argmax with
    // fixed precedence en > de > es on ties.
    "t01_langid" -> ((s, d) => {
      val t  = TextFunctions.tokens(col("text"))
      val en = markerScore(t, enWords)
      val de = markerScore(t, deWords)
      val es = markerScore(t, esWords)
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang").as("declared_lang"),
          en.as("en_score"), de.as("de_score"), es.as("es_score"))
        .withColumn("predicted",
          when(col("en_score") >= col("de_score") &&
            col("en_score") >= col("es_score"), "en")
            .when(col("de_score") >= col("es_score"), "de")
            .otherwise("es"))
        .orderBy("doc_id")
    }),

    // Quality scoring: length/stopword/punctuation signals combined into
    // one score. All arithmetic is exact-parity double (int ratios).
    "t02_quality" -> ((s, d) => {
      val nTok = size(TextFunctions.tokens(col("text")))
      val stop = TextFunctions.stopwordRatio(col("text"))
      val punct = TextFunctions.punctRatio(col("text"))
      val lenTerm = least(nTok.cast("double") / 100.0, lit(1.0))
      Tables.documents(s, d)
        .select(col("doc_id"),
          nTok.as("n_tokens"),
          round(stop, 6).as("stopword_ratio"),
          round(punct, 6).as("punct_ratio"),
          round(stop * 0.5 + (lit(1.0) - punct) * 0.3 + lenTerm * 0.2, 6)
            .as("quality"))
        .orderBy("doc_id")
    }),

    // Token counting: whitespace tokens vs a BPE-ish regex tokenizer, plus
    // mean token length.
    "t03_token_stats" -> ((s, d) => {
      val nTok = size(TextFunctions.tokens(col("text")))
      val chars = length(regexp_replace(col("text"), " ", ""))
      Tables.documents(s, d)
        .select(col("doc_id"),
          nTok.as("ws_tokens"),
          TextFunctions.bpeTokenCount(col("text")).cast("int")
            .as("bpe_tokens"),
          round(chars.cast("double") /
            greatest(nTok, lit(1)).cast("double"), 6).as("avg_token_len"))
        .orderBy("doc_id")
    }),

    // Rolling-hash document fingerprint (min 60-bit hash over char
    // 8-grams): one value per doc, robust to small edits.
    "t04_fingerprint" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"),
          TextFunctions.fingerprint(col("text")).as("fp"))
        .orderBy("doc_id")
    }),

    // Corpus vocabulary: top-20 terms by global frequency (flat explode →
    // codegen'd count aggregation, the canonical word-count at scale).
    "t05_term_freq" -> ((s, d) => {
      Tables.documents(s, d)
        .select(explode(TextFunctions.tokens(col("text"))).as("term"))
        .groupBy("term")
        .agg(count(lit(1)).as("freq"))
        .orderBy(col("freq").desc, col("term"))
        .limit(20)
    }),

    // TF-IDF: top term per document. tf = in-doc count, idf = ln(N/df)
    // over distinct-term document frequency; the score is rounded (ln is
    // the one libm-dependent step) and ties break on the term.
    "t06_tfidf" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val terms = docs
        .select(col("doc_id"), explode(TextFunctions.tokens(col("text")))
          .as("term"))
      val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val df = terms.distinct().groupBy("term")
        .agg(count(lit(1)).as("df"))
      val n = docs.select(countDistinct(col("doc_id")).as("n_docs"))
      val w = Window.partitionBy("doc_id")
        .orderBy(col("score").desc, col("term"))
      tf.join(df, "term").crossJoin(broadcast(n))
        .select(col("doc_id"), col("term"),
          round(col("tf") * log(col("n_docs").cast("double") /
            col("df").cast("double")), 6).as("score"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select("doc_id", "term", "score")
        .orderBy("doc_id")
    }),

    // Repetition signals (the Gopher/C4 quality-filter family): per-doc
    // duplicate-2-gram fraction and top-2-gram fraction. Explode → count
    // (partial agg) → per-doc rollup: one shuffle on (doc_id, gram), never
    // a per-row nested loop. The flag thresholds compare the ROUNDED
    // fractions so both engines make the identical boundary decision.
    "t07_repetition" -> ((s, d) => {
      val grams = Tables.documents(s, d)
        .select(col("doc_id"),
          explode(TextFunctions.shingles(col("text"), 2)).as("gram"))
      grams.groupBy("doc_id", "gram").agg(count(lit(1)).as("c"))
        .groupBy("doc_id")
        .agg(sum("c").as("n_grams"), count(lit(1)).as("n_distinct"),
          max("c").as("top_c"))
        .select(col("doc_id"), col("n_grams"), col("n_distinct"),
          round((col("n_grams") - col("n_distinct")).cast("double")
            / col("n_grams"), 6).as("dup_frac"),
          round(col("top_c").cast("double") / col("n_grams"), 6)
            .as("top_frac"))
        .withColumn("flagged",
          col("dup_frac") > 0.2 || col("top_frac") > 0.05)
        .orderBy("doc_id")
    }),

    // Benchmark decontamination: corpus documents sharing ≥2 distinct
    // 8-token shingles with an evaluation set (docs 0–9 stand in for the
    // benchmark). The benchmark side is tiny by construction and
    // broadcast; the corpus side streams map-only into one count-distinct
    // shuffle — the shape that decontaminates a 100 TB corpus against a
    // fixed eval suite.
    "t08_decontaminate" -> ((s, d) => {
      val grams = SkewTools.fanOut(Tables.documents(s, d))
        .select(col("doc_id"),
          explode(TextFunctions.shingles(col("text"), 8)).as("g"))
        .select(col("doc_id"), graft.functions.CrossHash.hash60(col("g"))
          .as("h"))
      val bench = grams.filter(col("doc_id") < 10)
        .select(col("doc_id").as("bench_id"), col("h")).distinct()
      grams.filter(col("doc_id") >= 10)
        .join(broadcast(bench), "h")
        .groupBy("doc_id", "bench_id")
        .agg(countDistinct(col("h")).as("n_overlap"))
        .filter(col("n_overlap") >= 2)
        .orderBy("doc_id", "bench_id")
    }),

    // Mixture resampling: config-driven per-source acceptance (sources
    // 0–9 keep 100%, 10–19 keep 40%) via a broadcast weights dim and an
    // integer hash gate — deterministic across engines, partitionings,
    // and reruns; map-only over the corpus (the Dolma-style domain-mixing
    // step).
    "t09_mixture_sample" -> ((s, d) => {
      import s.implicits._
      val weights = MixtureWeights.toDF("source", "permille")
      Tables.documents(s, d)
        .join(broadcast(weights), "source")
        .filter(pmod(graft.functions.CrossHash.hash60(
            concat(lit("mix#"), col("doc_id").cast("string"))),
          lit(1000L)) < col("permille"))
        .select("doc_id", "source", "lang")
        .orderBy("doc_id")
    }),

    // Data-quality gate (graft.operators.DataChecks): five constraints —
    // four row predicates + one uniqueness — validated in ONE scan + one
    // 1-row aggregate, then unpivoted to a verdict row per check. The
    // text_min_length constraint intentionally fails on the fixture
    // (shortest doc is 48 chars), exercising violation reporting.
    "t10_data_checks" -> ((s, d) => {
      graft.operators.DataChecks.run(
        Tables.documents(s, d),
        rowChecks = Seq(
          "doc_id_not_null" -> col("doc_id").isNotNull,
          "lang_known" -> col("lang").isin("en", "de", "es", "fr", "zh"),
          "n_chars_consistent" -> (col("n_chars") === length(col("text"))),
          "text_min_length" -> (length(col("text")) >= 100)),
        uniqueChecks = Seq("doc_id_unique" -> col("doc_id")))
    }),

    // Two-pass EXACT heavy hitters (operators/HeavyHitters): Misra–Gries
    // candidates per partition (map-only, no false negatives for
    // freq > N/k), then an exact recount of only the candidate terms —
    // the only full-distinct-key shuffle a naive groupBy-count would pay
    // is avoided, yet the output is bit-exact, so DuckDB checks it.
    "t11_heavy_hitters" -> ((s, d) => {
      val terms = Tables.documents(s, d)
        .select(explode(graft.functions.TextFunctions.tokens(col("text")))
          .as("term"))
      graft.operators.HeavyHitters.exact(terms, "term", k = 200)
    }),

    // BM25 keyword relevance (t06's tf-idf upgraded to the real ranking
    // function): Lucene-form idf, k1=1.2, b=0.75 length normalisation.
    // Each per-term score is rounded to 6 dp FIRST and summed as an exact
    // decimal — the ≤|query| addends then combine order-independently, so
    // the fused score never depends on partial-agg merge order. Two
    // shuffles total (doc-length agg, per-(doc,term) tf); df and corpus
    // stats ride in as 1-row/|query|-row broadcasts.
    "t12_bm25" -> ((s, d) => {
      val qTerms = Seq("spark", "join", "stream")
      val terms = Tables.documents(s, d)
        .select(col("doc_id"), explode(TextFunctions.tokens(col("text")))
          .as("term"))
      val dl = terms.groupBy("doc_id").agg(count(lit(1)).as("dl"))
      val stats = dl.agg(
        (sum("dl").cast("double") / count(lit(1))).as("avgdl"),
        count(lit(1)).cast("double").as("n_docs"))
      val tf = terms.filter(col("term").isin(qTerms: _*))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val k1 = lit(1.2)
      val b = lit(0.75)
      tf.join(broadcast(df), "term")
        .join(dl, "doc_id")
        .crossJoin(broadcast(stats))
        .select(col("doc_id"),
          round(
            log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0)
              * (col("tf") * (k1 + 1.0))
              / (col("tf") + k1 * (lit(1.0) - b
                  + b * col("dl") / col("avgdl"))), 6)
            .as("s"))
        .groupBy("doc_id")
        .agg(sum(col("s").cast("decimal(18,6)")).cast("double").as("bm25"))
        .orderBy(col("bm25").desc, col("doc_id"))
        .limit(10)
    }),

    // Winsorization (outlier clipping) with EXACT percentiles: per key,
    // p05/p95 defined by the explicit rank formula (value at row
    // ceil(p·n) — the q38 pattern, so both engines pick the same raw
    // datum), then one more pass counts/clips against the broadcast
    // thresholds. The curation step that tames heavy-tailed numeric
    // features before training; two passes total, no full sort at scale
    // beyond the per-key window (at 100 TB the rank formula would ride on
    // the stored sort order or a sketch + exact re-rank of one bucket).
    "t13_outlier_clip" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("event_type"), col("value"))
      val wRank = Window.partitionBy("event_type").orderBy("value")
      val wAll = Window.partitionBy("event_type")
      val ranked = ev
        .withColumn("rn", row_number().over(wRank))
        .withColumn("n", count(lit(1)).over(wAll))
      val pct = ranked.groupBy("event_type").agg(
        max(when(col("rn") === ceil(col("n") * 0.05), col("value")))
          .as("p05"),
        max(when(col("rn") === ceil(col("n") * 0.95), col("value")))
          .as("p95"),
        max("n").as("n"))
      ev.join(broadcast(pct), "event_type")
        .groupBy("event_type")
        .agg(max("n").as("n"), max("p05").as("p05"), max("p95").as("p95"),
          sum(when(col("value") < col("p05"), 1L).otherwise(0L)).as("n_low"),
          sum(when(col("value") > col("p95"), 1L).otherwise(0L)).as("n_high"),
          sum(least(greatest(col("value"), col("p05")), col("p95"))
            .cast("decimal(12,2)")).cast("double").as("clipped_sum"))
        .orderBy("event_type")
    }),

    // PII / denylist scrubbing (operators/Redact): map-only codegen'd
    // projection — per-pattern hit counts on the original text plus the
    // sequentially redacted text, digested with md5 so the oracle checks
    // the full redacted payload without hauling it. The corpus has no
    // planted PII (counts 0 for email/ipv4/phone — the mechanism is
    // exercised on planted fixtures in CurationSpec); the denylist rule
    // hits real tokens so the digest is non-trivial.
    "t14_redact" -> ((s, d) => {
      Redact.scrub(Tables.documents(s, d), "text", ScrubPatterns)
        .select(col("doc_id"), col("n_email"), col("n_ipv4"),
          col("n_phone"), col("n_denylist"),
          length(col("redacted")).as("red_len"),
          md5(col("redacted")).as("digest"))
        .orderBy("doc_id")
    }),

    // Corpus-boilerplate detection (the CCNet "drop too-common lines"
    // step at n-gram granularity): bigrams present in > 60% of documents
    // are boilerplate; each doc reports its boilerplate fraction. Shape:
    // one shuffle for document frequencies (partial-agg count-distinct on
    // the gram key), the boilerplate set is vocabulary-bounded and tiny
    // by its own > 60%-of-docs definition → broadcast back; one shuffle
    // for the per-doc rollup. The df threshold compares integers
    // (df·10 > n_docs·6) so both engines make the same boundary call.
    "t15_boilerplate" -> ((s, d) => {
      val grams = Tables.documents(s, d)
        .select(col("doc_id"),
          explode(TextFunctions.shingles(col("text"), 2)).as("gram"))
      val nDocs = Tables.documents(s, d).agg(count(lit(1)).as("n_docs"))
      val boiler = grams.groupBy("gram")
        .agg(countDistinct("doc_id").as("df"))
        .crossJoin(broadcast(nDocs))
        .filter(col("df") * 10 > col("n_docs") * 6)
        .select("gram")
      grams.join(broadcast(boiler.withColumn("is_boiler", lit(1L))),
          Seq("gram"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_grams"),
          sum(coalesce(col("is_boiler"), lit(0L))).as("n_boiler"))
        .select(col("doc_id"), col("n_grams"), col("n_boiler"),
          round(col("n_boiler").cast("double") / col("n_grams"), 6)
            .as("boiler_frac"))
        .withColumn("flagged", col("boiler_frac") > 0.5)
        .orderBy("doc_id")
    }),

    // Greedy contiguous sequence packing: documents fill fixed 2048-token
    // training sequences in doc_id order within each source (a doc whose
    // EXCLUSIVE token prefix-sum lands in bin k starts there — the
    // deterministic streaming-concat semantics a tokenized-dataset writer
    // uses). One window (partitioned by source — bounded state) + one
    // rollup shuffle; bin assignment is integer division, exact in both
    // engines.
    "t16_pack_sequences" -> ((s, d) => {
      val w = Window.partitionBy("source").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          size(TextFunctions.tokens(col("text"))).cast("long")
            .as("n_tokens"))
        .withColumn("prior", coalesce(sum("n_tokens").over(w), lit(0L)))
        .withColumn("bin", expr(s"prior div $PackTargetTokens"))
        .groupBy("source", "bin")
        .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("bin_tokens"),
          min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
        .orderBy("source", "bin")
    }),

    // ANALYZE-style table profile: per-column null count, exact NDV, and
    // min/max in ONE scan — the statistics pass a catalog runs before
    // planning 100 TB joins (NDV drives join-strategy choice; min/max
    // drive partition pruning). The four count-distincts share one scan
    // via Expand (Spark's multi-distinct rewrite); min/max are computed
    // on the NATIVE type and stringified after (lexicographic min of a
    // stringified number would be wrong). Unpivoted to one verdict row
    // per column with a literal stack — no second pass.
    "t17_table_stats" -> ((s, d) => {
      val cols = Seq("doc_id", "lang", "source", "n_chars")
      val aggs = cols.flatMap { c => Seq(
        (count(lit(1)) - count(col(c))).as(s"${c}__nulls"),
        countDistinct(col(c)).as(s"${c}__ndv"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
      }
      val stacked = cols.map(c =>
        s"'$c', ${c}__nulls, ${c}__ndv, ${c}__min, ${c}__max").mkString(", ")
      Tables.documents(s, d)
        .agg(count(lit(1)).as("n_rows"), aggs: _*)
        .select(col("n_rows"), expr(
          s"stack(${cols.size}, $stacked) AS " +
            "(col_name, n_nulls, n_distinct, min_s, max_s)"))
        .select("col_name", "n_rows", "n_nulls", "n_distinct", "min_s",
          "max_s")
        .orderBy("col_name")
    }),

    // Count-min sketch point frequencies (operators/CountMin): the top-20
    // vocabulary's estimated counts from a 4×256-cell sketch built in ONE
    // partial-aggregating pass, with the one-sided bound (est ≥ true)
    // emitted as a checked column. The sketch's hash family is the
    // engine's seeded md5, so the oracle rebuilds every counter and every
    // estimate exactly — sketch accuracy is value-verified, not assumed.
    // Token-typicality scoring — the LM-free stand-in for a perplexity
    // quality filter: a document's score is the MEAN CORPUS FREQUENCY of
    // its tokens, so rare-vocabulary documents (the ones a unigram LM
    // would call high-perplexity) score low. Deliberately log-free:
    // Math.log/std::log differ in final ulps across engines, while
    // Σ tf(token) is an exact BIGINT — integer until the one closing
    // division, flag by integer cross-multiplication. One tf shuffle +
    // one hash join back + one per-doc rollup; tf table is
    // vocabulary-sized, never corpus-sized.
    "t22_typicality" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(col("doc_id"),
          explode(TextFunctions.tokens(col("text"))).as("tok"))
      val tf = toks.groupBy("tok").agg(count(lit(1)).as("tf"))
      toks.join(tf, "tok")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"), sum("tf").as("sum_tf"))
        .select(col("doc_id"), col("n_tokens"), col("sum_tf"),
          round(col("sum_tf").cast("double") / col("n_tokens"), 6)
            .as("typicality"),
          (col("sum_tf") < col("n_tokens") * 1000L).as("is_rare"))
        .orderBy("doc_id")
    }),

    // Weighted sampling without replacement — priority sampling
    // (public method: Duffield, Lund & Thorup 2007): item priority =
    // uniform(hash) / weight, keep the k smallest, so inclusion odds
    // scale with the weight (here n_chars: longer documents sampled
    // preferentially) while the whole pass is map-only + a k-row
    // TakeOrderedAndProject — the one-pass weighted reservoir a 100 TB
    // corpus sample needs (t18 is the UNweighted k-per-stratum analog).
    // Priority is one IEEE division of exact integers — correctly
    // rounded, so both engines compute the identical double.
    "t24_weighted_sample" -> ((s, d) => {
      val pri = graft.functions.CrossHash.hash60(
          concat(lit("ws#"), col("doc_id").cast("string")))
        .cast("double") / col("n_chars").cast("double")
      Tables.documents(s, d)
        .select(col("doc_id"), col("n_chars"), pri.as("priority"))
        .orderBy(col("priority"), col("doc_id"))
        .limit(50)
    }),

    // Equi-depth (quantile) histogram — q48's "window over VALUES, not
    // rows" trick: the corpus collapses to value-level counts first (one
    // map-side-combining shuffle, output bounded by the n_chars domain),
    // the cumulative rank runs over that small table, and bucket =
    // 1 + (cum−1)·4 div N is integer-exact at every boundary (a tied
    // value lands wholly in one bucket — equi-depth cannot split a
    // value). No global row-ordered window ever touches the corpus,
    // which is what makes this shape survive 100 TB where the textbook
    // ntile-over-everything formulation is a single-partition sort.
    "t25_equidepth" -> ((s, d) => {
      val byVal = Tables.documents(s, d)
        .groupBy(col("n_chars")).agg(count(lit(1)).as("cnt"))
      val w = Window.orderBy("n_chars")
      byVal
        .withColumn("cum", sum("cnt").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("n", sum("cnt").over(
          Window.partitionBy().rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing)))
        .withColumn("bucket", expr("cast(1 + ((cum - 1) * 4) div n as int)"))
        .groupBy("bucket")
        .agg(sum("cnt").as("n_docs"),
          min("n_chars").as("lo"), max("n_chars").as("hi"))
        .orderBy("bucket")
    }),

    // Bigram language-model statistics — conditional next-token counts,
    // the perplexity-filter building block t22 approximates at the
    // unigram level. ONE corpus-width shuffle (bigram counts from the
    // 2-shingle explode); the w1 marginal derives from the bigram table
    // itself (vocabulary-bounded second aggregate, broadcast back), so
    // the corpus is scanned once. Conditional probability is emitted as
    // integer permille (n·1000 div marginal) — order-independent and
    // engine-exact where a float ratio would drift.
    "t26_bigram_lm" -> ((s, d) => {
      val big = Tables.documents(s, d)
        .select(explode(TextFunctions.shingles(col("text"), 2)).as("g"))
        .filter(size(split(col("g"), " ")) === 2)
        .groupBy("g").agg(count(lit(1)).as("n"))
      val pairs = big
        .withColumn("w1", substring_index(col("g"), " ", 1))
        .withColumn("w2", substring_index(col("g"), " ", -1))
        .drop("g")
      val marg = pairs.groupBy("w1").agg(sum("n").as("nw1"))
      pairs.join(broadcast(marg), "w1")
        .select(col("w1"), col("w2"), col("n"),
          expr("cast((n * 1000) div nw1 as bigint)").as("permille"))
        .orderBy(col("n").desc, col("w1"), col("w2"))
        .limit(20)
    }),

    // Deterministic train/val/test split — the canonical ML data-prep
    // op: split assignment is a pure function of a seeded doc-id hash
    // (stable under re-partitioning, re-runs, and corpus growth — no RNG
    // state, no sampleBy), 80/10/10 by hash permille. Map-only
    // assignment; the output is the per-(source, split) accounting whose
    // sums reconcile to the corpus (partition completeness — every doc
    // lands in exactly one split).
    "t28_train_split" -> ((s, d) => {
      val h = pmod(graft.functions.CrossHash.hash60(
        concat(lit("split#"), col("doc_id").cast("string"))), lit(1000L))
      Tables.documents(s, d)
        .withColumn("split",
          when(h < 800, "train").when(h < 900, "val").otherwise("test"))
        .groupBy("source", "split")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("n_chars_total"))
        .orderBy("source", "split")
    }),

    // Term-association mining (collocation lift) — log-free PMI analog:
    // lift = P(a,b) / (P(a)·P(b)) scaled to integer permille via cross-
    // multiplication, so engines agree at every boundary with no ln/pow.
    // The pair space is bounded BEFORE the quadratic step: postings are
    // semi-joined to the top-20 document-frequency vocabulary (broadcast,
    // deterministic df-desc/term tie-break), so each document contributes
    // ≤ C(20,2) pairs regardless of its length, and the pair self-join is
    // co-partitioned on doc_id (no corpus-shaped fan-out — the q51
    // co-purchase bound, applied to text).
    "t27_term_assoc" -> ((s, d) => {
      val posts = Tables.documents(s, d)
        .select(col("doc_id"),
          explode(array_distinct(TextFunctions.tokens(col("text"))))
            .as("term"))
      val top = posts.groupBy("term")
        .agg(count(lit(1)).as("df"))
        .orderBy(col("df").desc, col("term"))
        .limit(20)
      val matched = posts.join(broadcast(top), "term")
      val nDocs = Tables.documents(s, d)
        .agg(count(lit(1)).as("n_docs"))
      val a = matched.select(col("doc_id"), col("term").as("term_a"),
        col("df").as("df_a"))
      val b = matched.select(col("doc_id"), col("term").as("term_b"),
        col("df").as("df_b"))
      a.join(b, Seq("doc_id"))
        .filter(col("term_a") < col("term_b"))
        .groupBy("term_a", "term_b", "df_a", "df_b")
        .agg(count(lit(1)).as("co"))
        .crossJoin(broadcast(nDocs))
        .select(col("term_a"), col("term_b"), col("co"),
          expr("cast((co * n_docs * 1000) div (df_a * df_b) as bigint)")
            .as("lift_permille"))
        .orderBy(col("co").desc, col("term_a"), col("term_b"))
        .limit(15)
    }),

    // End-to-end curation verdict — the whole training-data admission
    // pipeline as ONE declarative plan: exact-dup gate (d01's
    // hash-window), quality gate (t02's score, compared on the ROUNDED
    // value so engines agree at the threshold), and mixture downsampling
    // (t09's deterministic hash gate) compose into a per-document keep
    // decision. One corpus scan feeds one md5-window shuffle + a
    // broadcast weights join — composing the stages does NOT multiply
    // scans, which is the point of declaring the pipeline as a plan
    // instead of materialising between stages.
    "t23_curation_pipeline" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy(md5(col("text")))
      val nTok = size(TextFunctions.tokens(col("text")))
      val stop = TextFunctions.stopwordRatio(col("text"))
      val punct = TextFunctions.punctRatio(col("text"))
      val lenTerm = least(nTok.cast("double") / 100.0, lit(1.0))
      val quality =
        round(stop * 0.5 + (lit(1.0) - punct) * 0.3 + lenTerm * 0.2, 6)
      val weights = MixtureWeights.toDF("source", "permille")
      Tables.documents(s, d)
        .join(broadcast(weights), "source")
        .withColumn("is_exact_dup",
          min(col("doc_id")).over(w) =!= col("doc_id"))
        .withColumn("quality_ok", quality >= 0.3)
        .withColumn("sampled",
          pmod(graft.functions.CrossHash.hash60(
              concat(lit("mix#"), col("doc_id").cast("string"))),
            lit(1000L)) < col("permille"))
        .select(col("doc_id"), col("is_exact_dup"), col("quality_ok"),
          col("sampled"),
          (!col("is_exact_dup") && col("quality_ok") && col("sampled"))
            .as("keep"))
        .orderBy("doc_id")
    }),

    // Per-document LM-fit scoring — the CCNet/KenLM perplexity filter's
    // integer-exact analog: score each document by how typical its
    // bigram transitions are under the CORPUS bigram LM (t26's model,
    // applied back per document). A transition's fit is its conditional
    // permille P(w2|w1)·1000 in integer division; a document's score is
    // the count-weighted mean (cross-multiplied, still integer) and its
    // weakest transition the min — low mean/min flags machine-garbled or
    // out-of-domain text exactly where a perplexity filter would, with
    // no ln/pow parity risk. Plan shape: the (doc_id, bigram) counts —
    // the corpus-heavy explode + partial agg — compute ONCE and eagerly
    // checkpoint (three consumers: the LM, the w1 marginal, and the
    // per-doc join; exchange reuse does not unify them, verified on the
    // executed plan), the w1 marginal broadcasts.
    "t29_lm_fit" -> ((s, d) => {
      val dg = Tables.documents(s, d)
        .select(col("doc_id"),
          explode(TextFunctions.shingles(col("text"), 2)).as("g"))
        .filter(size(split(col("g"), " ")) === 2)
        .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
        .localCheckpoint(eager = true)
      val big = dg.groupBy("g").agg(sum("c").as("n"))
      val marg = dg
        .withColumn("w1", substring_index(col("g"), " ", 1))
        .groupBy("w1").agg(sum("c").as("nw1"))
      val perm = big
        .withColumn("w1", substring_index(col("g"), " ", 1))
        .join(broadcast(marg), "w1")
        .select(col("g"), expr("cast((n * 1000) div nw1 as bigint)")
          .as("permille"))
      dg.join(perm, "g")
        .groupBy("doc_id")
        .agg(
          sum("c").as("n_bigrams"),
          count(lit(1)).as("n_unique"),
          expr("cast(sum(c * permille) div sum(c) as bigint)")
            .as("mean_permille"),
          min("permille").as("min_permille"))
        .orderBy("doc_id")
    }),

    // Sharded training-data export plan — the corpus-to-data-loader
    // handoff: every document lands in exactly one of 16 deterministic
    // hash shards (operators.ShardedExport — same md5 family as every
    // keyed decision, so the oracle replays assignment bit-exactly).
    // The per-shard accounting is the export's manifest: balanced
    // n_docs/n_chars across shards is what lets a training job stripe
    // workers across files evenly. Map-only assignment + one
    // partial-agg shuffle; ≤ nShards output rows from any corpus size.
    "t30_shard_stats" -> ((s, d) => {
      graft.operators.ShardedExport
        .assignShards(Tables.documents(s, d), 16)
        .groupBy("shard")
        .agg(
          count(lit(1)).as("n_docs"),
          sum("n_chars").as("n_chars_total"),
          min("doc_id").as("min_doc"),
          max("doc_id").as("max_doc"))
        .orderBy("shard")
    }),

    // Token-budget corpus selection — "take the best documents until the
    // token budget is spent", the final cut a pretraining-data pipeline
    // makes after scoring ("select top-quality docs up to 10B tokens").
    // Docs rank by t02's quality score (total order: quality desc, then
    // doc_id), a GLOBAL running token count accumulates in rank order,
    // and the selection keeps every doc whose cumulative total fits.
    // The running sum is the scale trap here: a bare
    // Window.orderBy(quality) funnels the corpus through ONE task.
    // operators.PrefixSum is the two-phase distributed form instead —
    // range-repartition on the ordering, per-slice running sums, slice
    // offsets broadcast back from a ≤ numPartitions-row aggregate — so
    // the cumsum scales like any shuffle. Output is bounded by
    // budget / min_doc_tokens regardless of corpus size.
    "t31_token_budget" -> ((s, d) => {
      graft.operators.PrefixSum
        .withRunningTotal(scoredDocs(s, d), col("tokens"),
          Seq(col("quality").desc, col("doc_id")), "cum_tokens")
        .filter(col("cum_tokens") <= TokenBudget)
        .orderBy(col("quality").desc, col("doc_id"))
    }),

    // Curriculum staging — order the corpus by quality and cut it into
    // [[CurriculumStages]] stages of EQUAL TOKEN MASS (not equal doc
    // count: long docs fill a stage faster), the schedule a
    // curriculum-learning trainer consumes stage by stage. Same
    // distributed prefix sum as t31; the stage is t25's equi-depth
    // formula over the token cumsum — exact integer div, so boundaries
    // are engine-exact. One broadcast 1-row total; no extra corpus pass.
    "t32_curriculum" -> ((s, d) => {
      val cum = graft.operators.PrefixSum
        .withRunningTotal(scoredDocs(s, d), col("tokens"),
          Seq(col("quality").desc, col("doc_id")), "cum_tokens")
      val total = cum.agg(sum(col("tokens")).as("__total"))
      cum.crossJoin(broadcast(total))
        .withColumn("stage",
          expr(s"cast(((cum_tokens - 1) * $CurriculumStages) div __total as int)"))
        .select("doc_id", "quality", "cum_tokens", "stage")
        .orderBy("doc_id")
    }),

    "t21_countmin" -> ((s, d) => {
      val (depth, width) = (4, 256)
      val terms = Tables.documents(s, d)
        .select(explode(TextFunctions.tokens(col("text"))).as("term"))
      val sk = graft.operators.CountMin.sketch(terms, col("term"),
        depth, width)
      val top = terms.groupBy("term").agg(count(lit(1)).as("freq"))
        .orderBy(col("freq").desc, col("term")).limit(20)
      graft.operators.CountMin.estimate(top, "term", sk, depth, width)
        .select(col("term"), col("freq"), col("est"),
          (col("est") >= col("freq")).as("lower_bounded"))
        .orderBy(col("freq").desc, col("term"))
    }),

    // Fuzzy vocabulary matching: near-identical term pairs (edit distance
    // ≤ 2) among the top-50 terms — the typo/variant detection pass an
    // entity-cleaning or vocabulary-normalisation step runs. Candidate
    // space is the (broadcastable) vocabulary, never the corpus, and the
    // length-difference prune drops pairs BEFORE the quadratic
    // levenshtein — the blocking idea that makes fuzzy matching feasible
    // when the vocabulary itself is large (block by length/prefix, compare
    // within blocks).
    "t20_fuzzy_terms" -> ((s, d) => {
      val tf = Tables.documents(s, d)
        .select(explode(TextFunctions.tokens(col("text"))).as("term"))
        .groupBy("term").agg(count(lit(1)).as("freq"))
        .orderBy(col("freq").desc, col("term")).limit(50)
      val a = tf.select(col("term").as("a"), col("freq").as("freq_a"))
      val b = tf.select(col("term").as("b"), col("freq").as("freq_b"))
      a.crossJoin(b)
        .filter(col("a") < col("b") &&
          abs(length(col("a")) - length(col("b"))) <= 2)
        .withColumn("dist", levenshtein(col("a"), col("b")))
        .filter(col("dist") <= 2)
        .select("a", "b", "freq_a", "freq_b", "dist")
        .orderBy("a", "b")
    }),

    // Equi-width histogram of document length — the distribution statistic
    // that complements t17's min/max/NDV in a catalog's ANALYZE pass
    // (histograms drive selectivity estimates for range predicates).
    // Bucketing is integer division (exact in both engines), the top
    // bucket is open-ended, and the whole thing is one map-side-combining
    // aggregate: at 100 TB this is a single scan emitting ≤10 rows.
    "t19_histogram" -> ((s, d) => {
      Tables.documents(s, d)
        .select(expr("cast(least(n_chars div 50, 9) as int)").as("bucket"),
          col("n_chars"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"),
          min("n_chars").as("min_chars"), max("n_chars").as("max_chars"))
        .orderBy("bucket")
    }),

    // Stratified k-per-key sampling: exactly 3 documents per source,
    // chosen by content-hash order — the deterministic, oracle-checkable
    // form of per-stratum reservoir sampling a mixture-balanced training
    // set needs (t09 gates by rate; this guarantees a COUNT per stratum).
    // One window per source (state = rank counter); at scale the
    // partition-local top-k could swap in plans.TopKPerKey, but the
    // window form is already a single shuffle on the stratum key.
    "t18_stratified_sample" -> ((s, d) => {
      val hk = graft.functions.CrossHash.hash60(
        concat(lit("samp#"), col("doc_id").cast("string")))
      val w = Window.partitionBy("source").orderBy(hk, col("doc_id"))
      Tables.documents(s, d)
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("source"), col("rk"), col("doc_id"), col("n_chars"))
        .orderBy("source", "rk")
    }),

    // Learnability / label-leakage probe: train a cheap linear text
    // classifier on 80% of the corpus and measure per-class accuracy on
    // the held-out 20% — the dataset-audit diagnostic that answers "do
    // these labels carry any text signal?" (accuracy ≈ chance here: the
    // synthetic corpus draws every language's text from one shared
    // vocabulary, and the probe PROVES that; on a real corpus, accuracy
    // far above the majority-class share flags either genuine signal or
    // leakage worth investigating). Mechanism, all integer-exact: one
    // doc-distinct token pass over train; a df-floored vocabulary (the
    // t20 bounded-broadcast discipline); one-vs-rest presence-lift
    // weights in permille (rate in class minus rate in rest — the
    // centered naive-Bayes analog without ln); scoring = one broadcast
    // join of held-out doc-tokens against the vocab×class weight table +
    // one (doc, class) rollup; argmax via the partial-aggregable
    // min(struct(-score, class)) with the deterministic smallest-class
    // tie-break. Docs with no in-vocab token default to the smallest
    // class label. Output is per-class test accuracy in permille —
    // |classes| rows from any corpus size.
    "t33_learnability_probe" -> ((s, d) => {
      val docs = Tables.documents(s, d).select("doc_id", "lang", "text")
      val train = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
      val test = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
      def docToks(df: DataFrame) = df.select(col("doc_id"), col("lang"),
        explode(array_distinct(TextFunctions.tokens(col("text"))))
          .as("tok"))
      val ttok = docToks(train)
      // (doc, tok) pairs are distinct by construction → count(1) = df
      val vocab = ttok.groupBy("tok")
        .agg(count(lit(1)).cast("long").as("df"))
        .filter(col("df") >= 5)
      val nl = train.groupBy("lang").agg(count(lit(1)).as("n"))
      val ntr = train.agg(count(lit(1)).as("n_all"))
      val cnt = ttok.join(vocab.select("tok"), Seq("tok"), "left_semi")
        .groupBy("lang", "tok").agg(count(lit(1)).cast("long").as("dfl"))
      val w = vocab.crossJoin(broadcast(nl)).crossJoin(broadcast(ntr))
        .join(cnt, Seq("tok", "lang"), "left")
        .select(col("tok"), col("lang"),
          expr("coalesce(dfl, 0L) * 1000 div n" +
            " - (df - coalesce(dfl, 0L)) * 1000 div (n_all - n)").as("wt"))
      val sc = docToks(test).drop("lang")
        .join(broadcast(w), Seq("tok"))
        .groupBy("doc_id", "lang")
        .agg(sum("wt").as("score"))
      val pred = sc.groupBy("doc_id")
        .agg(min(struct((-col("score")).as("ns"), col("lang"))).as("b"))
        .select(col("doc_id"), col("b.lang").as("predicted"))
      test.join(pred, Seq("doc_id"), "left")
        .select(col("lang"),
          when(coalesce(col("predicted"), lit("de")) === col("lang"), 1L)
            .otherwise(0L).as("correct"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_test"),
          sum("correct").cast("bigint").as("n_correct"))
        .withColumn("acc_permille",
          expr("cast(n_correct * 1000 div n_test as bigint)"))
        .orderBy("lang")
    }),

    // BPE tokenizer training (operators/BpeMerges): 3 merge iterations
    // learned from the word-frequency table — the corpus is scanned ONCE
    // into (word, freq); every iteration after that is vocabulary-sized
    // (pair rollup + 1-row argmax broadcast + literal merge), so 100 TB
    // of text trains at the cost of one scan plus iters × |vocab|. The
    // oracle replays all three iterations (pair counting with
    // overlapping adjacency, greedy left-to-right merge via literal
    // replace, (count desc, pair asc) argmax) in chained CTEs.
    "t34_bpe_merges" -> ((s, d) => {
      val wf = Tables.documents(s, d)
        .select(explode(TextFunctions.tokens(col("text"))).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy("w")
        .agg(count(lit(1)).as("freq"))
      graft.operators.BpeMerges.learn(wf, iters = 3).orderBy("iter")
    }),

    // Memorization-risk profile: per document, the permille of its
    // distinct 3-token shingles that also appear in ANOTHER document —
    // verbatim-duplicated content is what a model memorizes first, and
    // this is the corpus-level histogram a curation report quotes before
    // deciding dedup aggressiveness (d07/d09 then FIX what this
    // MEASURES). One shingle-posting pass (NgramJaccard.postings — the
    // same hashed, doc-distinct machinery as d07), one df rollup, one
    // posting-to-df join, and a ≤10-row decile histogram out — no pair
    // enumeration anywhere, so unlike the dedup queries the cost stays
    // linear in postings even on a 100%-duplicated corpus.
    "t36_memorization_risk" -> ((s, d) => {
      val p = graft.operators.NgramJaccard
        .postings(Tables.documents(s, d), 3)
      val dfh = p.groupBy("h").agg(count(lit(1)).as("df"))
      p.join(dfh, "h")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_shingles"),
          sum(when(col("df") >= 2, 1L).otherwise(0L)).as("n_shared"))
        .select(expr("n_shared * 1000 div n_shingles").as("risk_permille"))
        .select(least(expr("risk_permille div 100"), lit(9L)).cast("int")
          .as("decile"), col("risk_permille"))
        .groupBy("decile")
        .agg(count(lit(1)).as("n_docs"),
          min("risk_permille").cast("bigint").as("min_permille"),
          max("risk_permille").cast("bigint").as("max_permille"))
        .orderBy("decile")
    }),

    // Scrub-impact report: the per-SOURCE rollup a corpus release quotes
    // before and after redaction — how many documents each provenance
    // contributes, what share of them carry scrub-pattern hits, per-
    // pattern totals, and hit density per million characters (integer
    // div — no float ratio). Composes t14's Redact.scrub (map-only hit
    // accounting on the original text, the SAME ScrubPatterns so report
    // and redaction cannot drift apart) into one source-bounded rollup:
    // at 100 TB this is a single scan emitting |sources| rows.
    "t37_scrub_report" -> ((s, d) => {
      val hits = ScrubPatterns.map(p => col(s"n_${p.name}"))
      val total = hits.reduce(_ + _)
      Redact.scrub(Tables.documents(s, d), "text", ScrubPatterns)
        .select(col("source") +: length(col("text")).as("n_chars") +:
          total.as("n_hits") +: hits: _*)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          (sum(when(col("n_hits") > 0, 1L).otherwise(0L))
            .as("docs_with_hits") +:
            ScrubPatterns.map(p =>
              sum(col(s"n_${p.name}")).cast("bigint").as(s"n_${p.name}")) :+
            expr("sum(n_hits) * 1000000 div sum(n_chars)").cast("bigint")
              .as("hits_per_mchar")): _*)
        .orderBy("source")
    }),

    // Vocabulary-growth (Heaps-law) curve over 3-gram shingles — how
    // fast the n-gram inventory grows as the corpus prefix extends: the
    // planning measurement behind tokenizer vocab sizing and "is more
    // data still adding novelty?" (the saturation read; unigrams here
    // saturate by doc 100, trigrams keep growing — exactly what the
    // curve exists to expose). The scale trick: growth at EVERY cutoff
    // from ONE pass — each gram reduces to its FIRST-occurrence doc
    // (one rollup), and a cutoff's vocabulary is a conditional count
    // over that table, so k cutoffs cost k conditional sums, not k
    // corpus rescans.
    "t38_vocab_growth" -> ((s, d) => {
      import s.implicits._
      val grams = Tables.documents(s, d)
        .select(col("doc_id"),
          explode(TextFunctions.shingles(col("text"), 3)).as("g"))
      val firsts = grams.groupBy("g").agg(min("doc_id").as("first_doc"))
      val dtok = grams.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val cuts = Seq(100L, 200L, 300L, 400L, 500L).toDF("cut")
      val vocab = firsts.crossJoin(broadcast(cuts))
        .groupBy("cut")
        .agg(sum(when(col("first_doc") < col("cut"), 1L).otherwise(0L))
          .as("vocab"))
      val toks = dtok.crossJoin(broadcast(cuts))
        .groupBy("cut")
        .agg(sum(when(col("doc_id") < col("cut"), col("n"))
          .otherwise(0L)).as("n_grams"))
      toks.join(vocab, Seq("cut"))
        .select(col("cut"), col("n_grams").cast("bigint").as("n_grams"),
          col("vocab").cast("bigint").as("vocab"))
        .orderBy("cut")
    })
  )

  /** Mixture config for t09: a stand-in for the domain-weights table a
    * curation pipeline feeds in (sources 0–9 at 100%, the rest at 40%). */
  val MixtureWeights: Seq[(String, Long)] =
    (0 until 20).map(i => (s"src$i", if (i < 10) 1000L else 400L))

  /** t14 scrub rules: the PII defaults plus a corpus-hitting denylist
    * (stand-in for a known-bad-terms list) so the digest check is
    * non-trivial on the synthetic word corpus. */
  val ScrubPatterns: Seq[Redact.Pattern] = Redact.PiiPatterns :+
    Redact.Pattern("denylist", "\\b(?:customer|value|table)\\b", "[X]")

  /** t16 training-sequence length (tokens per packed bin). */
  val PackTargetTokens: Long = 2048L

  /** t31 selection budget (BPE tokens). Absolute by design: the output is
    * bounded by budget / min_doc_tokens at ANY corpus size — at sf0.01
    * (~27k corpus tokens) it cuts mid-corpus, at sf0.1 it selects the
    * same-order top slice of a 10× corpus. */
  val TokenBudget: Long = 15000L

  /** t32 curriculum stage count (equal token mass per stage). */
  val CurriculumStages: Int = 4

  /** DuckDB replay of [[scoredDocs]] — CTE chain ending in
    * `sq(doc_id, tokens, quality)`; shared by the t31/t32/d16 oracles. */
  private[queries] val DuckScoredCtes: String =
    """tok AS (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents),
      |m AS (SELECT doc_id,
      |  cast(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) as bigint) AS tokens,
      |  cast(len(list_filter(t, x -> x in ('the','a','an','of','and','or','to','in','is','it'))) as double)
      |    / cast(greatest(len(t), 1) as double) AS stop,
      |  cast(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) as double)
      |    / cast(greatest(length(text), 1) as double) AS punct,
      |  least(cast(len(t) as double) / 100.0, 1.0) AS len_term
      |  FROM tok),
      |sq AS (SELECT doc_id, tokens,
      |  round(stop * 0.5 + (1.0 - punct) * 0.3 + len_term * 0.2, 6) AS quality
      |  FROM m)""".stripMargin

  /** Per-document (tokens, quality) scoring shared by t31/t32 (and
    * d16's dedup-aware budget cut) — t03's BPE token count and t02's
    * quality expression verbatim. */
  private[queries] def scoredDocs(s: SparkSession, d: String): DataFrame = {
    val nTok = size(TextFunctions.tokens(col("text")))
    val stop = TextFunctions.stopwordRatio(col("text"))
    val punct = TextFunctions.punctRatio(col("text"))
    val lenTerm = least(nTok.cast("double") / 100.0, lit(1.0))
    Tables.documents(s, d)
      .select(col("doc_id"),
        TextFunctions.bpeTokenCount(col("text")).cast("long").as("tokens"),
        round(stop * 0.5 + (lit(1.0) - punct) * 0.3 + lenTerm * 0.2, 6)
          .as("quality"))
  }

  private def duckMarker(words: Seq[String]): String =
    s"cast(len(list_filter(t, x -> x in (${words.map(w => s"'$w'").mkString(", ")}))) as int)"

  private def statsRow(c: String): String =
    s"""SELECT '$c' AS col_name, count(*) AS n_rows,
       |  count(*) - count($c) AS n_nulls,
       |  count(DISTINCT $c) AS n_distinct,
       |  cast(min($c) as varchar) AS min_s,
       |  cast(max($c) as varchar) AS max_s FROM documents""".stripMargin

  override val oracles: Map[String, String] = Map(
    // same shingle CASE as TextFunctions.shingles (<3-token docs yield
    // the whole text as one gram)
    "t38_vocab_growth" ->
      """WITH tok AS (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents),
        |shl AS (SELECT doc_id, CASE WHEN len(t) < 3 THEN [text]
        |  ELSE list_transform(range(0, len(t) - 2), i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]) END AS sh
        |  FROM tok),
        |g AS (SELECT doc_id, unnest(sh) AS g FROM shl),
        |firsts AS (SELECT g, min(doc_id) AS first_doc FROM g GROUP BY 1),
        |dtok AS (SELECT doc_id, cast(count(*) as bigint) AS n FROM g GROUP BY 1),
        |cuts AS (SELECT unnest([100, 200, 300, 400, 500]) AS cut)
        |SELECT cast(cut as bigint) AS cut,
        |  (SELECT cast(coalesce(sum(n), 0) as bigint) FROM dtok WHERE doc_id < cut) AS n_grams,
        |  (SELECT cast(count(*) as bigint) FROM firsts WHERE first_doc < cut) AS vocab
        |FROM cuts ORDER BY cut""".stripMargin,

    "t37_scrub_report" -> {
      val counts = ScrubPatterns.map { p =>
        s"len(regexp_extract_all(text, '${p.regex}')) AS n_${p.name}"
      }.mkString(",\n  ")
      val sumHits = ScrubPatterns.map(p => s"n_${p.name}").mkString(" + ")
      val sums = ScrubPatterns.map { p =>
        s"cast(sum(n_${p.name}) as bigint) AS n_${p.name}"
      }.mkString(",\n  ")
      s"""WITH h AS (SELECT source, length(text) AS n_chars,
         |  $counts
         |  FROM documents)
         |SELECT source, cast(count(*) as bigint) AS n_docs,
         |  cast(sum(CASE WHEN $sumHits > 0 THEN 1 ELSE 0 END) as bigint) AS docs_with_hits,
         |  $sums,
         |  cast(sum($sumHits) * 1000000 // sum(n_chars) as bigint) AS hits_per_mchar
         |FROM h GROUP BY source ORDER BY source""".stripMargin
    },

    // reuses d07's shingle/hash CTE builder; only the ds posting CTE is
    // referenced (DuckDB prunes the unused pair CTEs)
    "t36_memorization_risk" ->
      ("WITH " + graft.operators.NgramJaccard.duckJaccardCtes(3, 100, "t36") +
        """,
        |t36df AS (SELECT h, cast(count(*) as bigint) AS df FROM t36ds GROUP BY 1),
        |t36per AS (SELECT s.doc_id, cast(count(*) as bigint) AS n_shingles,
        |    cast(sum(CASE WHEN t36df.df >= 2 THEN 1 ELSE 0 END) as bigint) AS n_shared
        |  FROM t36ds s JOIN t36df ON t36df.h = s.h GROUP BY 1),
        |t36risk AS (SELECT doc_id, n_shared * 1000 // n_shingles AS risk_permille
        |  FROM t36per)
        |SELECT cast(least(risk_permille // 100, 9) as int) AS decile,
        |  cast(count(*) as bigint) AS n_docs,
        |  cast(min(risk_permille) as bigint) AS min_permille,
        |  cast(max(risk_permille) as bigint) AS max_permille
        |FROM t36risk GROUP BY 1 ORDER BY decile""".stripMargin),

    "t34_bpe_merges" ->
      """WITH wf AS (
        |  SELECT w, cast(count(*) as bigint) AS freq FROM (
        |    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |  WHERE len(w) > 0 GROUP BY 1),
        |w0 AS (SELECT trim(regexp_replace(w, '(.)', '\1 ', 'g')) AS sym, freq FROM wf),
        |p1 AS (SELECT pair, cast(sum(freq) as bigint) AS cnt FROM (
        |    SELECT freq, unnest(list_transform(range(1, len(string_split(sym,' '))),
        |      i -> string_split(sym,' ')[i] || ' ' || string_split(sym,' ')[i+1])) AS pair
        |    FROM w0) GROUP BY 1),
        |b1 AS (SELECT pair, cnt FROM p1 ORDER BY cnt DESC, pair LIMIT 1),
        |w1 AS (SELECT trim(replace(' '||sym||' ', ' '||(SELECT pair FROM b1)||' ',
        |         ' '||replace((SELECT pair FROM b1),' ','')||' ')) AS sym, freq FROM w0),
        |p2 AS (SELECT pair, cast(sum(freq) as bigint) AS cnt FROM (
        |    SELECT freq, unnest(list_transform(range(1, len(string_split(sym,' '))),
        |      i -> string_split(sym,' ')[i] || ' ' || string_split(sym,' ')[i+1])) AS pair
        |    FROM w1) GROUP BY 1),
        |b2 AS (SELECT pair, cnt FROM p2 ORDER BY cnt DESC, pair LIMIT 1),
        |w2 AS (SELECT trim(replace(' '||sym||' ', ' '||(SELECT pair FROM b2)||' ',
        |         ' '||replace((SELECT pair FROM b2),' ','')||' ')) AS sym, freq FROM w1),
        |p3 AS (SELECT pair, cast(sum(freq) as bigint) AS cnt FROM (
        |    SELECT freq, unnest(list_transform(range(1, len(string_split(sym,' '))),
        |      i -> string_split(sym,' ')[i] || ' ' || string_split(sym,' ')[i+1])) AS pair
        |    FROM w2) GROUP BY 1),
        |b3 AS (SELECT pair, cnt FROM p3 ORDER BY cnt DESC, pair LIMIT 1)
        |SELECT * FROM (
        |  SELECT 1 AS iter, pair, replace(pair, ' ', '') AS merged, cnt AS pair_freq FROM b1
        |  UNION ALL SELECT 2, pair, replace(pair, ' ', ''), cnt FROM b2
        |  UNION ALL SELECT 3, pair, replace(pair, ' ', ''), cnt FROM b3)
        |ORDER BY iter""".stripMargin,

    "t33_learnability_probe" ->
      """WITH train AS (SELECT doc_id, lang, text FROM documents WHERE doc_id % 5 <> 0),
        |test  AS (SELECT doc_id, lang, text FROM documents WHERE doc_id % 5 = 0),
        |ttok AS (SELECT DISTINCT doc_id, lang, unnest(string_split(text, ' ')) AS tok FROM train),
        |gdf AS (SELECT tok, cast(count(*) as bigint) AS df FROM ttok GROUP BY 1),
        |vocab AS (SELECT tok, df FROM gdf WHERE df >= 5),
        |ntr AS (SELECT cast(count(*) as bigint) AS n_all FROM train),
        |nl AS (SELECT lang, cast(count(*) as bigint) AS n FROM train GROUP BY 1),
        |cnt AS (SELECT lang, tok, cast(count(*) as bigint) AS dfl FROM ttok
        |        WHERE tok IN (SELECT tok FROM vocab) GROUP BY 1, 2),
        |w AS (SELECT v.tok, l.lang,
        |        coalesce(c.dfl, 0) * 1000 // l.n
        |          - (v.df - coalesce(c.dfl, 0)) * 1000 // (t.n_all - l.n) AS wt
        |      FROM vocab v CROSS JOIN nl l CROSS JOIN ntr t
        |      LEFT JOIN cnt c ON c.tok = v.tok AND c.lang = l.lang),
        |dtok AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok FROM test),
        |sc AS (SELECT d.doc_id, w.lang, cast(sum(w.wt) as bigint) AS score
        |       FROM dtok d JOIN w ON w.tok = d.tok GROUP BY 1, 2),
        |pred AS (SELECT doc_id, lang AS predicted FROM (
        |  SELECT doc_id, lang, score,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang) AS rn
        |  FROM sc) WHERE rn = 1),
        |perdoc AS (SELECT t.lang,
        |    CASE WHEN coalesce(p.predicted, 'de') = t.lang THEN 1 ELSE 0 END AS correct
        |  FROM test t LEFT JOIN pred p ON p.doc_id = t.doc_id)
        |SELECT lang, cast(count(*) as bigint) AS n_test,
        |  cast(sum(correct) as bigint) AS n_correct,
        |  cast(sum(correct) * 1000 // count(*) as bigint) AS acc_permille
        |FROM perdoc GROUP BY 1 ORDER BY lang""".stripMargin,

    "t24_weighted_sample" ->
      s"""SELECT doc_id, n_chars,
        |  cast(${graft.functions.CrossHash.duckHash60("'ws#' || cast(doc_id as varchar)")} as double)
        |    / cast(n_chars as double) AS priority
        |FROM documents
        |ORDER BY priority, doc_id LIMIT 50""".stripMargin,

    "t25_equidepth" ->
      """WITH v AS (SELECT n_chars, count(*) AS cnt
        |           FROM documents GROUP BY n_chars),
        |c AS (SELECT n_chars, cnt,
        |  sum(cnt) OVER (ORDER BY n_chars
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |  sum(cnt) OVER () AS n
        |  FROM v)
        |SELECT cast(1 + ((cum - 1) * 4) // n as int) AS bucket,
        |  cast(sum(cnt) as bigint) AS n_docs,
        |  min(n_chars) AS lo, max(n_chars) AS hi
        |FROM c GROUP BY bucket ORDER BY bucket""".stripMargin,

    "t29_lm_fit" ->
      """WITH tok AS (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents),
        |shl AS (SELECT doc_id, CASE WHEN len(t) < 2 THEN [text]
        |  ELSE list_transform(range(0, len(t) - 1), i -> t[i+1] || ' ' || t[i+2]) END AS sh
        |  FROM tok),
        |dg AS (SELECT doc_id, g, count(*) AS c FROM (
        |    SELECT doc_id, unnest(sh) AS g FROM shl)
        |  WHERE len(string_split(g, ' ')) = 2 GROUP BY doc_id, g),
        |big AS (SELECT g, cast(sum(c) as bigint) AS n FROM dg GROUP BY g),
        |m AS (SELECT split_part(g, ' ', 1) AS w1, sum(n) AS nw1
        |  FROM big GROUP BY 1),
        |perm AS (SELECT big.g,
        |    cast((big.n * 1000) // m.nw1 as bigint) AS permille
        |  FROM big JOIN m ON split_part(big.g, ' ', 1) = m.w1)
        |SELECT dg.doc_id,
        |  cast(sum(dg.c) as bigint) AS n_bigrams,
        |  cast(count(*) as bigint) AS n_unique,
        |  cast(sum(dg.c * perm.permille) // sum(dg.c) as bigint) AS mean_permille,
        |  cast(min(perm.permille) as bigint) AS min_permille
        |FROM dg JOIN perm ON dg.g = perm.g
        |GROUP BY dg.doc_id ORDER BY dg.doc_id""".stripMargin,

    // shared scoring CTEs (t02's quality verbatim); ROWS frame over the
    // total (quality desc, doc_id) ordering, cum cast back to bigint
    // (DuckDB sums BIGINT into HUGEINT)
    "t31_token_budget" ->
      (s"WITH $DuckScoredCtes" + s""",
         |c AS (SELECT doc_id, tokens, quality,
         |  cast(sum(tokens) OVER (ORDER BY quality DESC, doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as bigint) AS cum_tokens
         |  FROM sq)
         |SELECT doc_id, tokens, quality, cum_tokens FROM c
         |WHERE cum_tokens <= ${TokenBudget}
         |ORDER BY quality DESC, doc_id""".stripMargin),

    // same scoring + cumsum CTEs as t31; stage = t25's equi-depth
    // formula (exact integer division) over the token cumsum
    "t32_curriculum" ->
      (s"WITH $DuckScoredCtes" + s""",
         |c AS (SELECT doc_id, tokens, quality,
         |  cast(sum(tokens) OVER (ORDER BY quality DESC, doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as bigint) AS cum_tokens
         |  FROM sq),
         |tot AS (SELECT cast(sum(tokens) as bigint) AS total FROM sq)
         |SELECT doc_id, quality, cum_tokens,
         |  cast(((cum_tokens - 1) * $CurriculumStages) // total as int) AS stage
         |FROM c, tot ORDER BY doc_id""".stripMargin),

    "t30_shard_stats" ->
      s"""WITH h AS (SELECT doc_id, n_chars,
        |    cast(${graft.functions.CrossHash.duckHash60("'shard#' || cast(doc_id as varchar)")} % 16 as int) AS shard
        |  FROM documents)
        |SELECT shard, count(*) AS n_docs,
        |  cast(sum(n_chars) as bigint) AS n_chars_total,
        |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM h GROUP BY shard ORDER BY shard""".stripMargin,

    "t26_bigram_lm" ->
      """WITH tok AS (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents),
        |shl AS (SELECT CASE WHEN len(t) < 2 THEN [text]
        |  ELSE list_transform(range(0, len(t) - 1), i -> t[i+1] || ' ' || t[i+2]) END AS sh
        |  FROM tok),
        |big AS (SELECT g, count(*) AS n FROM (
        |    SELECT unnest(sh) AS g FROM shl)
        |  WHERE len(string_split(g, ' ')) = 2 GROUP BY g),
        |p AS (SELECT split_part(g, ' ', 1) AS w1, split_part(g, ' ', 2) AS w2, n
        |  FROM big),
        |m AS (SELECT w1, sum(n) AS nw1 FROM p GROUP BY w1)
        |SELECT p.w1 AS w1, p.w2 AS w2, p.n AS n,
        |  cast((p.n * 1000) // m.nw1 as bigint) AS permille
        |FROM p JOIN m ON p.w1 = m.w1
        |ORDER BY p.n DESC, p.w1, p.w2 LIMIT 20""".stripMargin,

    "t28_train_split" ->
      s"""WITH h AS (SELECT source, n_chars,
        |    ${graft.functions.CrossHash.duckHash60("'split#' || cast(doc_id as varchar)")} % 1000 AS hm
        |  FROM documents)
        |SELECT source,
        |  CASE WHEN hm < 800 THEN 'train' WHEN hm < 900 THEN 'val'
        |       ELSE 'test' END AS split,
        |  count(*) AS n_docs,
        |  cast(sum(n_chars) as bigint) AS n_chars_total
        |FROM h GROUP BY 1, 2 ORDER BY source, split""".stripMargin,

    "t27_term_assoc" ->
      """WITH posts AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS term
        |  FROM documents),
        |top AS (SELECT term, count(*) AS df FROM posts GROUP BY term
        |  ORDER BY df DESC, term LIMIT 20),
        |m AS (SELECT p.doc_id, p.term, t.df FROM posts p JOIN top t USING (term)),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |pr AS (SELECT a.term AS term_a, b.term AS term_b,
        |    a.df AS df_a, b.df AS df_b, count(*) AS co
        |  FROM m a JOIN m b ON a.doc_id = b.doc_id AND a.term < b.term
        |  GROUP BY 1, 2, 3, 4)
        |SELECT term_a, term_b, co,
        |  cast((co * n_docs * 1000) // (df_a * df_b) as bigint) AS lift_permille
        |FROM pr, n
        |ORDER BY co DESC, term_a, term_b LIMIT 15""".stripMargin,

    "t23_curation_pipeline" ->
      s"""WITH w(source, permille) AS (VALUES ${
          MixtureWeights.map { case (s0, p) => s"('$s0', $p)" }.mkString(", ")}),
        |tok AS (SELECT doc_id, source, text, string_split(text, ' ') AS t FROM documents),
        |q AS (SELECT doc_id, source, text,
        |  round(
        |    (cast(len(list_filter(t, x -> x in ('the','a','an','of','and','or','to','in','is','it'))) as double)
        |      / cast(greatest(len(t), 1) as double)) * 0.5
        |    + (1.0 - cast(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) as double)
        |      / cast(greatest(length(text), 1) as double)) * 0.3
        |    + least(cast(len(t) as double) / 100.0, 1.0) * 0.2, 6) AS quality
        |  FROM tok),
        |v AS (SELECT doc_id,
        |    min(doc_id) OVER (PARTITION BY md5(text)) <> doc_id AS is_exact_dup,
        |    quality >= 0.3 AS quality_ok,
        |    ${graft.functions.CrossHash.duckHash60("'mix#' || cast(doc_id as varchar)")} % 1000 < permille AS sampled
        |  FROM q JOIN w USING (source))
        |SELECT doc_id, is_exact_dup, quality_ok, sampled,
        |  (NOT is_exact_dup AND quality_ok AND sampled) AS keep
        |FROM v ORDER BY doc_id""".stripMargin,

    "t22_typicality" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |tf AS (SELECT tok, cast(count(*) as bigint) AS tf FROM tok GROUP BY tok),
        |p AS (SELECT t.doc_id, count(*) AS n_tokens,
        |    cast(sum(f.tf) as bigint) AS sum_tf
        |  FROM tok t JOIN tf f USING (tok) GROUP BY t.doc_id)
        |SELECT doc_id, n_tokens, sum_tf,
        |  round(cast(sum_tf as double) / n_tokens, 6) AS typicality,
        |  sum_tf < n_tokens * 1000 AS is_rare
        |FROM p ORDER BY doc_id""".stripMargin,

    "t21_countmin" ->
      s"""WITH tok AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents),
         |cells AS (SELECT r.range AS row,
         |    ${graft.operators.CountMin.duckBucket("r.range", "term", 256)} AS bucket,
         |    count(*) AS c
         |  FROM tok, range(0, 4) r GROUP BY 1, 2),
         |top AS (SELECT term, count(*) AS freq FROM tok
         |  GROUP BY term ORDER BY freq DESC, term LIMIT 20)
         |SELECT t.term, t.freq, min(coalesce(c.c, 0)) AS est,
         |  min(coalesce(c.c, 0)) >= t.freq AS lower_bounded
         |FROM top t CROSS JOIN range(0, 4) r
         |LEFT JOIN cells c ON c.row = r.range
         |  AND c.bucket = ${graft.operators.CountMin.duckBucket("r.range", "t.term", 256)}
         |GROUP BY t.term, t.freq
         |ORDER BY freq DESC, term""".stripMargin,

    "t20_fuzzy_terms" ->
      """WITH tf AS (SELECT term, count(*) AS freq FROM (
        |    SELECT unnest(string_split(text, ' ')) AS term FROM documents)
        |  GROUP BY term ORDER BY freq DESC, term LIMIT 50)
        |SELECT a.term AS a, b.term AS b, a.freq AS freq_a, b.freq AS freq_b,
        |  cast(levenshtein(a.term, b.term) as int) AS dist
        |FROM tf a JOIN tf b ON a.term < b.term
        |WHERE abs(length(a.term) - length(b.term)) <= 2
        |  AND levenshtein(a.term, b.term) <= 2
        |ORDER BY a, b""".stripMargin,

    "t19_histogram" ->
      """SELECT cast(least(n_chars // 50, 9) as int) AS bucket,
        |  count(*) AS n, min(n_chars) AS min_chars, max(n_chars) AS max_chars
        |FROM documents GROUP BY 1 ORDER BY bucket""".stripMargin,

    "t17_table_stats" ->
      (Seq("doc_id", "lang", "source", "n_chars").map(statsRow)
        .mkString("", "\nUNION ALL\n", "\nORDER BY col_name")),

    "t18_stratified_sample" ->
      s"""SELECT source, rk, doc_id, n_chars FROM (
         |  SELECT source, doc_id, n_chars,
         |    cast(row_number() OVER (PARTITION BY source
         |      ORDER BY ${graft.functions.CrossHash.duckHash60(
                  "'samp#' || cast(doc_id as varchar)")}, doc_id) as int) AS rk
         |  FROM documents)
         |WHERE rk <= 3 ORDER BY source, rk""".stripMargin,

    "t01_langid" ->
      s"""WITH tok AS (SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents),
         |scored AS (SELECT doc_id, lang AS declared_lang,
         |  ${duckMarker(enWords)} AS en_score,
         |  ${duckMarker(deWords)} AS de_score,
         |  ${duckMarker(esWords)} AS es_score
         |  FROM tok)
         |SELECT doc_id, declared_lang, en_score, de_score, es_score,
         |  CASE WHEN en_score >= de_score AND en_score >= es_score THEN 'en'
         |       WHEN de_score >= es_score THEN 'de' ELSE 'es' END AS predicted
         |FROM scored ORDER BY doc_id""".stripMargin,

    "t02_quality" ->
      s"""WITH tok AS (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents),
         |m AS (SELECT doc_id,
         |  cast(len(t) as int) AS n_tokens,
         |  cast(len(list_filter(t, x -> x in ('the','a','an','of','and','or','to','in','is','it'))) as double)
         |    / cast(greatest(len(t), 1) as double) AS stop,
         |  cast(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) as double)
         |    / cast(greatest(length(text), 1) as double) AS punct,
         |  least(cast(len(t) as double) / 100.0, 1.0) AS len_term
         |  FROM tok)
         |SELECT doc_id, n_tokens, round(stop, 6) AS stopword_ratio,
         |  round(punct, 6) AS punct_ratio,
         |  round(stop * 0.5 + (1.0 - punct) * 0.3 + len_term * 0.2, 6) AS quality
         |FROM m ORDER BY doc_id""".stripMargin,

    "t03_token_stats" ->
      s"""WITH tok AS (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents)
         |SELECT doc_id, cast(len(t) as int) AS ws_tokens,
         |  cast(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) as int) AS bpe_tokens,
         |  round(cast(length(replace(text, ' ', '')) as double)
         |      / cast(greatest(len(t), 1) as double), 6) AS avg_token_len
         |FROM tok ORDER BY doc_id""".stripMargin,

    "t04_fingerprint" ->
      s"""SELECT doc_id,
         |  list_min(list_transform(range(1, greatest(length(text) - 7, 1) + 1),
         |    i -> ${graft.functions.CrossHash.duckHash60("substring(text, cast(i as int), 8)")})) AS fp
         |FROM documents ORDER BY doc_id""".stripMargin,

    "t05_term_freq" ->
      """SELECT term, count(*) AS freq FROM (
        |  SELECT unnest(string_split(text, ' ')) AS term FROM documents)
        |GROUP BY term ORDER BY freq DESC, term LIMIT 20""".stripMargin,

    "t07_repetition" ->
      """WITH tok AS (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents),
        |shl AS (SELECT doc_id, CASE WHEN len(t) < 2 THEN [text]
        |  ELSE list_transform(range(0, len(t) - 1), i -> t[i+1] || ' ' || t[i+2]) END AS sh
        |  FROM tok),
        |c AS (SELECT doc_id, gram, count(*) AS c FROM (
        |  SELECT doc_id, unnest(sh) AS gram FROM shl) GROUP BY 1, 2),
        |m AS (SELECT doc_id, cast(sum(c) as bigint) AS n_grams,
        |    count(*) AS n_distinct, max(c) AS top_c
        |  FROM c GROUP BY 1),
        |r AS (SELECT doc_id, n_grams, n_distinct,
        |    round(cast(n_grams - n_distinct as double) / n_grams, 6) AS dup_frac,
        |    round(cast(top_c as double) / n_grams, 6) AS top_frac
        |  FROM m)
        |SELECT doc_id, n_grams, n_distinct, dup_frac, top_frac,
        |  (dup_frac > 0.2 OR top_frac > 0.05) AS flagged
        |FROM r ORDER BY doc_id""".stripMargin,

    "t08_decontaminate" ->
      s"""WITH tok AS (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents),
        |shl AS (SELECT doc_id, CASE WHEN len(t) < 8 THEN [text]
        |  ELSE list_transform(range(0, len(t) - 7),
        |    i -> ${(1 to 8).map(k => s"t[i+$k]").mkString(" || ' ' || ")}) END AS sh
        |  FROM tok),
        |g AS (SELECT doc_id, ${graft.functions.CrossHash.duckHash60("u.s")} AS h
        |  FROM (SELECT doc_id, unnest(sh) AS s FROM shl) u),
        |bench AS (SELECT DISTINCT doc_id AS bench_id, h FROM g WHERE doc_id < 10)
        |SELECT c.doc_id, b.bench_id, count(DISTINCT c.h) AS n_overlap
        |FROM g c JOIN bench b ON c.h = b.h
        |WHERE c.doc_id >= 10
        |GROUP BY 1, 2 HAVING count(DISTINCT c.h) >= 2
        |ORDER BY doc_id, bench_id""".stripMargin,

    "t09_mixture_sample" ->
      s"""WITH w(source, permille) AS (VALUES ${
          MixtureWeights.map { case (s0, p) => s"('$s0', $p)" }.mkString(", ")}),
        |kept AS (SELECT d.doc_id, d.source, d.lang FROM documents d JOIN w USING (source)
        |  WHERE ${graft.functions.CrossHash.duckHash60("'mix#' || cast(d.doc_id as varchar)")} % 1000 < permille)
        |SELECT doc_id, source, lang FROM kept ORDER BY doc_id""".stripMargin,

    "t10_data_checks" ->
      """WITH m AS (SELECT count(*) AS total,
        |  cast(sum(CASE WHEN doc_id IS NOT NULL THEN 0 ELSE 1 END) as bigint) AS v_notnull,
        |  cast(sum(CASE WHEN lang IN ('en','de','es','fr','zh') THEN 0 ELSE 1 END) as bigint) AS v_lang,
        |  cast(sum(CASE WHEN n_chars = length(text) THEN 0 ELSE 1 END) as bigint) AS v_nchars,
        |  cast(sum(CASE WHEN length(text) >= 100 THEN 0 ELSE 1 END) as bigint) AS v_minlen,
        |  cast(count(doc_id) - count(DISTINCT doc_id) as bigint) AS v_unique
        |  FROM documents)
        |SELECT check_name, violations, total, violations = 0 AS pass FROM (
        |  SELECT 'doc_id_not_null' AS check_name, v_notnull AS violations, total FROM m
        |  UNION ALL SELECT 'lang_known', v_lang, total FROM m
        |  UNION ALL SELECT 'n_chars_consistent', v_nchars, total FROM m
        |  UNION ALL SELECT 'text_min_length', v_minlen, total FROM m
        |  UNION ALL SELECT 'doc_id_unique', v_unique, total FROM m)
        |ORDER BY check_name""".stripMargin,

    "t06_tfidf" ->
      """WITH terms AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY 1, 2),
        |df AS (SELECT term, count(*) AS df FROM (SELECT DISTINCT doc_id, term FROM terms) GROUP BY 1),
        |n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
        |scored AS (SELECT doc_id, tf.term,
        |    round(tf * ln(cast(n_docs as double) / cast(df as double)), 6) AS score
        |  FROM tf JOIN df ON tf.term = df.term CROSS JOIN n),
        |ranked AS (SELECT doc_id, term, score,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rk
        |  FROM scored)
        |SELECT doc_id, term, score FROM ranked WHERE rk = 1 ORDER BY doc_id""".stripMargin,

    "t11_heavy_hitters" ->
      """WITH t AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents),
        |n AS (SELECT count(*) AS n_total FROM t),
        |f AS (SELECT term, count(*) AS freq FROM t GROUP BY term)
        |SELECT term, freq, n_total FROM f, n
        |WHERE freq * 200 > n_total
        |ORDER BY freq DESC, term""".stripMargin,

    "t12_bm25" ->
      """WITH terms AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |dl AS (SELECT doc_id, count(*) AS dl FROM terms GROUP BY 1),
        |stats AS (SELECT cast(sum(dl) as double) / count(*) AS avgdl,
        |    cast(count(*) as double) AS n_docs FROM dl),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM terms
        |  WHERE term IN ('spark', 'join', 'stream') GROUP BY 1, 2),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |scored AS (SELECT tf.doc_id,
        |    round(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
        |        * (tf * (1.2 + 1.0))
        |        / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / avgdl)), 6) AS s
        |  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats)
        |SELECT doc_id, cast(sum(cast(s as decimal(18,6))) as double) AS bm25
        |FROM scored GROUP BY doc_id
        |ORDER BY bm25 DESC, doc_id LIMIT 10""".stripMargin,

    "t13_outlier_clip" ->
      """WITH r AS (SELECT event_type, value,
        |    row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM events),
        |p AS (SELECT event_type,
        |    max(CASE WHEN rn = ceil(n * 0.05) THEN value END) AS p05,
        |    max(CASE WHEN rn = ceil(n * 0.95) THEN value END) AS p95,
        |    max(n) AS n
        |  FROM r GROUP BY 1)
        |SELECT e.event_type, p.n, p.p05, p.p95,
        |  cast(sum(CASE WHEN value < p05 THEN 1 ELSE 0 END) as bigint) AS n_low,
        |  cast(sum(CASE WHEN value > p95 THEN 1 ELSE 0 END) as bigint) AS n_high,
        |  cast(sum(cast(least(greatest(value, p05), p95) as decimal(12,2))) as double) AS clipped_sum
        |FROM events e JOIN p USING (event_type)
        |GROUP BY 1, 2, 3, 4 ORDER BY event_type""".stripMargin,

    // Oracle built from the same ScrubPatterns the Spark side uses, so the
    // regexes and replacement order cannot drift apart.
    "t14_redact" -> {
      val redacted = ScrubPatterns.foldLeft("text") { (acc, p) =>
        s"regexp_replace($acc, '${p.regex}', '${p.replacement}', 'g')"
      }
      val counts = ScrubPatterns.map { p =>
        s"cast(len(regexp_extract_all(text, '${p.regex}')) as int) AS n_${p.name}"
      }.mkString(",\n  ")
      s"""SELECT doc_id,
         |  $counts,
         |  cast(length($redacted) as int) AS red_len,
         |  md5($redacted) AS digest
         |FROM documents ORDER BY doc_id""".stripMargin
    },

    "t15_boilerplate" ->
      """WITH tok AS (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents),
        |shl AS (SELECT doc_id, CASE WHEN len(t) < 2 THEN [text]
        |  ELSE list_transform(range(0, len(t) - 1), i -> t[i+1] || ' ' || t[i+2]) END AS sh
        |  FROM tok),
        |g AS (SELECT doc_id, unnest(sh) AS gram FROM shl),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |df AS (SELECT gram, count(DISTINCT doc_id) AS df FROM g GROUP BY 1),
        |boiler AS (SELECT gram FROM df, n WHERE df * 10 > n_docs * 6),
        |m AS (SELECT g.doc_id, count(*) AS n_grams,
        |    cast(sum(CASE WHEN b.gram IS NOT NULL THEN 1 ELSE 0 END) as bigint) AS n_boiler
        |  FROM g LEFT JOIN boiler b ON g.gram = b.gram GROUP BY 1),
        |r AS (SELECT doc_id, n_grams, n_boiler,
        |    round(cast(n_boiler as double) / n_grams, 6) AS boiler_frac FROM m)
        |SELECT doc_id, n_grams, n_boiler, boiler_frac, boiler_frac > 0.5 AS flagged
        |FROM r ORDER BY doc_id""".stripMargin,

    "t16_pack_sequences" ->
      s"""WITH tok AS (SELECT doc_id, source,
         |    cast(len(string_split(text, ' ')) as bigint) AS n_tokens FROM documents),
         |c AS (SELECT doc_id, source, n_tokens,
         |    cast(coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) as bigint) AS prior
         |  FROM tok)
         |SELECT source, cast(prior // $PackTargetTokens as bigint) AS bin,
         |  count(*) AS n_docs, cast(sum(n_tokens) as bigint) AS bin_tokens,
         |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
         |FROM c GROUP BY 1, 2 ORDER BY source, bin""".stripMargin
  )
}
