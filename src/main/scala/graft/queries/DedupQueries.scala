package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{CrossHash, TextFunctions, VectorFunctions}

/** Deduplication operator family over the document corpus — the
  * LLM-training-data-pipeline extension (BASELINE.json north star; the
  * reference's only dedup is first-id-per-title at ra/server.py:36-43,
  * covered by r03).
  *
  * Scale design: nothing here is O(n²) on the corpus. Exact dedup is a
  * hash-partitioned window; MinHash near-dup turns the pairwise similarity
  * join into an equi-join on LSH band keys (shuffle on band key, pairwise
  * work only inside a bucket); SimHash near-dup equi-joins on 8-bit bands
  * (pigeonhole: any pair within Hamming distance 3 of a 32-bit signature
  * shares at least one of 4 bands, so recall at the threshold is exact).
  * At 1000 executors each of these is shuffle → per-bucket local work, no
  * broadcast of the corpus, no driver collect.
  */
object DedupQueries extends QueryPack {

  /** doc_id + 3-gram shingle array, the shared input of the MinHash path. */
  private def shingled(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        TextFunctions.shingles(col("text"), 3).as("sh"))

  /** (doc_id, band, key) — LSH bucket assignments, 4 bands × 3 rows. */
  private def bandAssignments(s: SparkSession, d: String): DataFrame =
    shingled(s, d)
      .select(col("doc_id"),
        TextFunctions.minhashSignature(col("sh"), 12).as("sig"))
      .select(col("doc_id"),
        posexplode(array((0 until 4).map(b =>
          TextFunctions.bandKey(col("sig"), b, 3)): _*))
          .as(Seq("band", "key")))

  override val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact dedup: canonical = min doc_id per content hash. Hash-partitioned
    // window, no join; at scale this is one shuffle on md5(text).
    "d01_exact_dedup" -> ((s, d) => {
      val w = Window.partitionBy("h")
      Tables.documents(s, d)
        .select(col("doc_id"), md5(col("text")).as("h"))
        .withColumn("canonical_id", min(col("doc_id")).over(w))
        .select(col("doc_id"), col("canonical_id"),
          (col("doc_id") =!= col("canonical_id")).as("is_dup"))
        .orderBy("doc_id")
    }),

    // MinHash + LSH near-dup: signature k=12, 4 bands × 3 rows; candidate
    // pairs = equi-join on (band, key); exact 3-gram Jaccard filter ≥ 0.2.
    "d02_minhash_lsh" -> ((s, d) => {
      val bands = bandAssignments(s, d)
      val cand = bands.as("a")
        .join(bands.as("b"), Seq("band", "key"))
        .filter(col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
        .distinct()
      val sh = shingled(s, d)
      cand
        .join(sh.select(col("doc_id").as("a_id"), col("sh").as("sh_a")), "a_id")
        .join(sh.select(col("doc_id").as("b_id"), col("sh").as("sh_b")), "b_id")
        .select(col("a_id"), col("b_id"),
          round(TextFunctions.jaccard(col("sh_a"), col("sh_b")), 6)
            .as("jacc"))
        .filter(col("jacc") >= 0.2)
        .orderBy("a_id", "b_id")
    }),

    // SimHash signatures (32-bit majority-vote over token hashes).
    "d03_simhash" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"),
          transform(TextFunctions.tokens(col("text")),
            t => CrossHash.hash60(t)).as("th"))
        .select(col("doc_id"),
          TextFunctions.simhash32(col("th")).as("simhash"))
        .orderBy("doc_id")
    }),

    // SimHash near-dup pairs: equi-join on any of 4 8-bit bands, then exact
    // Hamming ≤ 3 — band recall is exact at that radius by pigeonhole.
    "d04_simhash_pairs" -> ((s, d) => {
      val sigs = Tables.documents(s, d)
        .select(col("doc_id"),
          transform(TextFunctions.tokens(col("text")),
            t => CrossHash.hash60(t)).as("th"))
        .select(col("doc_id"),
          TextFunctions.simhash32(col("th")).as("simhash"))
      val bands = sigs.select(col("doc_id"), col("simhash"),
        posexplode(array((0 until 4).map(b =>
          shiftright(col("simhash"), 8 * b).bitwiseAND(lit(255L))): _*))
          .as(Seq("band", "key")))
      bands.as("a").join(bands.as("b"), Seq("band", "key"))
        .filter(col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
          TextFunctions.hamming(col("a.simhash"), col("b.simhash"))
            .cast("int").as("hamming"))
        .distinct()
        .filter(col("hamming") <= 3)
        .orderBy("a_id", "b_id")
    }),

    // Embedding-cosine near-dup: label-blocked self-join (same label ⇒
    // candidate), cosine ≥ 0.35. Blocking keeps the join an equi-join.
    "d05_embedding_near_dup" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), col("label"), col("embedding"))
      e.as("a").join(e.as("b"), Seq("label"))
        .filter(col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"),
          round(VectorFunctions.cosine(col("a.embedding"), col("b.embedding")), 6)
            .as("sim"))
        .filter(col("sim") >= 0.35)
        .orderBy("a_id", "b_id")
    })
  )

  /** Shared oracle CTEs: tokens → shingles → minhash sigs → band keys. */
  private val h = (e: String) => CrossHash.duckHash60(e)

  private val shingleCtes =
    """WITH tok AS (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents),
      |sh AS (SELECT doc_id, CASE WHEN len(t) < 3 THEN [text]
      |  ELSE list_transform(range(0, len(t) - 2), i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]) END AS sh
      |  FROM tok)""".stripMargin

  private val minhashCtes = {
    val sigElems = (0 until 12)
      .map(j => s"list_min(list_transform(sh, s -> ${h(s"s || '#$j'")}))")
      .mkString("[", ", ", "]")
    val bandKeys = (0 until 4)
      .map(b => s"SELECT doc_id, $b AS band, concat_ws(',', sig[${b * 3 + 1}], sig[${b * 3 + 2}], sig[${b * 3 + 3}]) AS key FROM sig")
      .mkString("\n  UNION ALL ")
    shingleCtes + s""",
      |sig AS (SELECT doc_id, sh, $sigElems AS sig FROM sh),
      |bands AS (\n  $bandKeys)""".stripMargin
  }

  private val simhashCtes = {
    val bits = (0 until 32)
      .map(b =>
        s"(CASE WHEN list_sum(list_transform(th, h -> CASE WHEN (h >> $b) % 2 = 1 THEN 1 ELSE -1 END)) > 0 THEN ${1L << b} ELSE 0 END)")
      .mkString(" + ")
    s"""WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       |th AS (SELECT doc_id, list_transform(t, x -> ${h("x")}) AS th FROM tok),
       |sigs AS (SELECT doc_id, cast($bits as bigint) AS simhash FROM th)""".stripMargin
  }

  override val oracles: Map[String, String] = Map(
    "d01_exact_dedup" ->
      """SELECT doc_id, canonical_id, doc_id <> canonical_id AS is_dup FROM (
        |  SELECT doc_id, min(doc_id) OVER (PARTITION BY md5(text)) AS canonical_id
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin,

    "d02_minhash_lsh" ->
      (minhashCtes + """,
        |cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
        |  FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
        |j AS (SELECT a_id, b_id,
        |  round(cast(len(list_intersect(sa.sh, sb.sh)) as double)
        |      / cast(len(list_distinct(list_concat(sa.sh, sb.sh))) as double), 6) AS jacc
        |  FROM cand JOIN sh sa ON sa.doc_id = a_id JOIN sh sb ON sb.doc_id = b_id)
        |SELECT a_id, b_id, jacc FROM j WHERE jacc >= 0.2 ORDER BY a_id, b_id""".stripMargin),

    "d03_simhash" ->
      (simhashCtes + "\nSELECT doc_id, simhash FROM sigs ORDER BY doc_id"),

    "d04_simhash_pairs" ->
      (simhashCtes + """,
        |bands AS (SELECT doc_id, simhash, b.range AS band, (simhash >> (8 * b.range)) & 255 AS key
        |  FROM sigs, range(0, 4) b),
        |cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
        |    cast(bit_count(xor(a.simhash, b.simhash)) as int) AS hamming
        |  FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)
        |SELECT a_id, b_id, hamming FROM cand WHERE hamming <= 3 ORDER BY a_id, b_id""".stripMargin),

    "d05_embedding_near_dup" ->
      """SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        |  round(list_cosine_similarity(cast(a.embedding as double[]), cast(b.embedding as double[])), 6) AS sim
        |FROM embeddings a JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
        |WHERE round(list_cosine_similarity(cast(a.embedding as double[]), cast(b.embedding as double[])), 6) >= 0.35
        |ORDER BY a_id, b_id""".stripMargin
  )
}
