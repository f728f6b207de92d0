package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{CrossHash, TextFunctions}

/** MinHash + LSH near-duplicate detection, in the flat formulation that
  * survives scale.
  *
  * Why flat: Spark's higher-order functions (`transform`/`aggregate`) are
  * CodegenFallback — every lambda element evaluates interpreted. A
  * signature built as k array-level HOF passes costs k interpreted md5
  * walks per document (measured: 17 s for 5000 docs at k=12). Instead:
  *
  *   1. explode shingles to rows — `md5` runs once per shingle inside
  *      whole-stage codegen;
  *   2. derive the k hash family from ONE base hash with affine
  *      permutations h_j = (a_j·h + b_j) mod p  (p = 2^31−1, the classic
  *      MinHash construction) — k multiply-adds, not k digests;
  *   3. `groupBy(doc).agg(min(h_0)…min(h_{k-1}))` — partial aggregation
  *      map-side, one shuffle of (doc_id, k longs).
  *
  * At 100 TB this is scan → map → partial-agg → exchange on doc_id →
  * final agg; the band self-join is then an equi-join on (band, key).
  * Constants a_j, b_j derive from md5 (CrossHash) so DuckDB reproduces the
  * identical signatures.
  */
object MinHashLSH {

  val P: Long = 2147483647L // 2^31 − 1 (Mersenne prime)

  def aCoef(j: Int): Long = CrossHash.md5Hash60(s"mh_a#$j") % (P - 1) + 1
  def bCoef(j: Int): Long = CrossHash.md5Hash60(s"mh_b#$j") % P

  /** (doc_id, m0…m{k−1}) MinHash signature columns — computed by the
    * fused per-row expression [[graft.plans.MinHashSigExpr]]
    * (value-identical to the exploded shingle → hash → k-min-aggregate
    * pipeline this replaces, spec-pinned): map-only, no explode rows,
    * no aggregation, no exchange. The two-step projection keeps the
    * fused signature evaluated ONCE per row (CollapseProject does not
    * inline a non-trivial alias referenced k times); `isNotNull`
    * reproduces the exploded form's dropped-document behavior. */
  def signatures(docs: DataFrame, k: Int): DataFrame = {
    val sig = org.apache.spark.sql.graft.ColumnBridge.column(
      graft.plans.MinHashSigExpr(
        org.apache.spark.sql.graft.ColumnBridge
          .expression(col("text")), k))
    SkewTools.fanOut(docs)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), sig.as("__mh"))
      .select(col("doc_id") +:
        (0 until k).map(j => element_at(col("__mh"), j + 1).as(s"m$j")): _*)
  }

  /** (doc_id, band, key) LSH bucket assignments: k = bands·rowsPerBand. */
  def bandAssignments(docs: DataFrame, bands: Int, rowsPerBand: Int)
      : DataFrame = {
    val sig = signatures(docs, bands * rowsPerBand)
    sig.select(col("doc_id"),
      posexplode(array((0 until bands).map { b =>
        concat_ws(",",
          (0 until rowsPerBand).map(i => col(s"m${b * rowsPerBand + i}")): _*)
      }: _*)).as(Seq("band", "key")))
  }

  /** Candidate pairs (a_id < b_id) sharing at least one band. Instead of
    * a band self-join (which would run the whole signature pipeline once
    * per join side — Catalyst does not reuse the exchange across join
    * aliases), buckets aggregate their member ids and pairs stream out of
    * two nested explodes: the first emits one row per member (carrying the
    * bucket's id array), the second emits that member's greater partners.
    * ONE signature pipeline, one groupBy shuffle, and — critically — no
    * row ever holds more than one bucket's id LIST (O(m) per row, never
    * the O(m²) pair array a single flatten would materialize; a 100k-dup
    * boilerplate cluster stays ~1 MB/row instead of hundreds of GB). */
  def candidatePairs(docs: DataFrame, bands: Int, rowsPerBand: Int)
      : DataFrame = {
    bandAssignments(docs, bands, rowsPerBand)
      .groupBy("band", "key")
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(col("ids"),
        posexplode(col("ids")).as(Seq("i", "a_id")))
      .select(col("a_id"),
        explode(slice(col("ids"), col("i") + lit(2), size(col("ids"))))
          .as("b_id"))
      .distinct()
  }

  /** Near-duplicate pairs: LSH candidates verified by exact 3-gram
    * Jaccard ≥ threshold. The expensive part of verification is shingling,
    * so it runs only for documents that appear in a candidate pair: the
    * candidate MEMBER id set (near-dup-participant-sized, tiny after
    * banding) semi-joins the corpus BEFORE shingles are computed — at
    * scale this is the difference between re-shingling the corpus and
    * shingling the near-dup participants only. The candidate pair set is
    * checkpointed so deriving the member ids does not re-run the whole
    * signature pipeline a second time. */
  def nearDuplicates(docs: DataFrame, bands: Int = 4, rowsPerBand: Int = 3,
      threshold: Double = 0.2): DataFrame = {
    val cand = candidatePairs(docs, bands, rowsPerBand)
      .localCheckpoint(eager = false)
    val members = cand.select(col("a_id").as("doc_id"))
      .union(cand.select(col("b_id").as("doc_id")))
      .distinct()
    val sh = docs
      .join(members, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), TextFunctions.shingles(col("text"), 3).as("sh"))
    cand
      .join(sh.select(col("doc_id").as("a_id"), col("sh").as("sh_a")), "a_id")
      .join(sh.select(col("doc_id").as("b_id"), col("sh").as("sh_b")), "b_id")
      .select(col("a_id"), col("b_id"),
        round(TextFunctions.jaccard(col("sh_a"), col("sh_b")), 6).as("jacc"))
      .filter(col("jacc") >= threshold)
  }

  /** Per-document ADMISSION verdict of a new batch against the band store
    * of previously admitted documents — the decision kernel of
    * incremental corpus dedup, shared verbatim by the streaming path
    * ([[graft.streaming.IngestStream.dedupAvailable]]) and its
    * oracle-checked batch twin (d14): a new document is dropped when any
    * of its LSH band keys collides with the store (`hit_prior`) or with a
    * SMALLER-id batch sibling (`hit_batch` — deterministic one-pass
    * within-batch rule: the conservative one-shot form of the sequential
    * admit-scan, exact when collisions don't chain).
    *
    * Scale shape: the history is touched only through one equi semi-join
    * on (band, key) — fingerprints, never texts — and the within-batch
    * check is a band self-join over the BATCH only; nothing is
    * corpus-shaped. Output: one row per batch doc_id present in
    * `batchBands`, columns (doc_id, hit_prior, hit_batch, admitted).
    *
    * `batchBands` feeds three consumers here — checkpoint it upstream
    * (as both callers do) so the signature pipeline runs once. */
  def admissionVerdict(batchBands: DataFrame,
      priorBands: DataFrame): DataFrame = {
    val a = batchBands.select("band", "key", "doc_id")
    val priorHit = a
      .join(priorBands.select("band", "key"), Seq("band", "key"), "left_semi")
      .select("doc_id").distinct()
      .withColumn("__hp", lit(true))
    val earlier = batchBands.select(col("band").as("band"),
      col("key").as("key"), col("doc_id").as("smaller_id"))
    val batchHit = a.join(earlier,
        a("band") === earlier("band") && a("key") === earlier("key") &&
          a("doc_id") > earlier("smaller_id"), "left_semi")
      .select("doc_id").distinct()
      .withColumn("__hb", lit(true))
    batchBands.select("doc_id").distinct()
      .join(priorHit, Seq("doc_id"), "left")
      .join(batchHit, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("__hp"), lit(false)).as("hit_prior"),
        coalesce(col("__hb"), lit(false)).as("hit_batch"))
      .withColumn("admitted", !col("hit_prior") && !col("hit_batch"))
  }

  /** Oracle-side CTE bodies reproducing [[signatures]] in DuckDB SQL
    * (no leading WITH; `prefix` namespaces the CTEs so several sketch
    * pipelines compose in one statement). Final CTE: `${prefix}sig`. */
  def duckSignatureCtes(k: Int, prefix: String = ""): String = {
    val mins = (0 until k)
      .map(j => s"min((h * ${aCoef(j)} + ${bCoef(j)}) % $P) AS m$j")
      .mkString(",\n  ")
    s"""${prefix}tok AS (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents),
       |${prefix}shl AS (SELECT doc_id, CASE WHEN len(t) < 3 THEN [text]
       |  ELSE list_transform(range(0, len(t) - 2), i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]) END AS sh
       |  FROM ${prefix}tok),
       |${prefix}flat AS (SELECT doc_id, ${CrossHash.duckHash60("s.s")} % $P AS h
       |  FROM (SELECT doc_id, unnest(sh) AS s FROM ${prefix}shl) s),
       |${prefix}sig AS (SELECT doc_id,
       |  $mins
       |  FROM ${prefix}flat GROUP BY doc_id)""".stripMargin
  }
}
