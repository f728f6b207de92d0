package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Embedder, TextFunctions, VectorFunctions}

/** The engine's public contract (SURVEY.md §2.11): one Scala method per
  * semantic operation of the reference's API surface, each returning a
  * DataFrame. These are the composable entry points a user of the
  * reference would call; the driver-checked queries in [[graft.queries]]
  * are built from the same primitives with fixed parameters.
  *
  * Reference endpoints mapped: GET /documents/ (ra/server.py:30-50) →
  * [[listDocuments]]; POST /rag_search/ (ra/server.py:61-69 →
  * ra/agent.py:108-133) → [[ragSearch]]; web_search tool
  * (ra/agent.py:97-106) → [[searchByTopic]]; fetch_arxiv regex extraction
  * (ra/agent.py:79-95) → [[extractField]]; report assembly
  * (ra/agent.py:135-191) → [[assembleReport]] (rows; PDF rendering is
  * presentation, out of engine scope).
  */
object Api {

  /** Document catalog with first-id-per-source dedup (the deterministic
    * form of ra/server.py:36-43's first-seen-wins). */
  def listDocuments(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy("source")
      .agg(min(col("doc_id")).as("first_doc"), count(lit(1)).as("n_docs"))

  /** Index names the reference routes between (ra/agent.py:112,
    * ra/server.py:63): the full document index vs the ArXiv subset. */
  val DocIndex = "doc_index"
  val ArxivIndex = "arxiv_index"

  /** Resolve a target_index name to its vector table. The reference keeps
    * two physical Pinecone indexes populated by different ingestion DAGs;
    * here both are views of the embeddings table, and the ArXiv index is
    * a metadata-routed document subset via a broadcast semi-join. The
    * membership rule (lang = 'en') is a fixture-compatible stand-in — the
    * synthetic corpus carries no ingestion-provenance marker — but the
    * routing mechanics (name → restricted index, searched identically)
    * are the reference contract. */
  def indexFor(spark: SparkSession, dir: String, targetIndex: String)
      : DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    targetIndex match {
      case DocIndex => emb
      case ArxivIndex =>
        val arxivDocs = Tables.documents(spark, dir)
          .filter(col("lang") === "en")
          .select(col("doc_id").as("vec_id"))
        emb.join(broadcast(arxivDocs), Seq("vec_id"), "left_semi")
      case other => throw new IllegalArgumentException(
        s"unknown target_index '$other' (expected $DocIndex or $ArxivIndex)")
    }
  }

  /** Text-query RAG search: embed the query with the deterministic local
    * embedder (dim must match the index), score the vector index by
    * cosine, top-k, join documents for title/content metadata with the
    * reference's truncations (parser_pinecone_storage.py:149-153).
    * `targetIndex` routes between the document and ArXiv indexes — the
    * reference's rag_search(query, target_index) contract
    * (ra/agent.py:108-112). */
  def ragSearch(spark: SparkSession, dir: String, query: String,
      k: Int = 100, dim: Int = 64,
      targetIndex: String = DocIndex): DataFrame = {
    val qv = array(Embedder.embedQuery(query, dim).map(lit): _*)
    // The top-k side is ≤ k rows by construction — it is the broadcast
    // build side; the documents corpus streams (never broadcast it).
    val topk = indexFor(spark, dir, targetIndex)
      .select(col("vec_id"),
        round(VectorFunctions.cosine(col("embedding"), qv), 6).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(k)
    Tables.documents(spark, dir)
      .join(broadcast(topk), col("vec_id") === col("doc_id"), "inner")
      .select(col("vec_id"), col("sim"),
        substring(coalesce(concat_ws("#", col("source"), col("doc_id")),
          lit("No title")), 1, 50).as("title"),
        substring(col("text"), 1, 200).as("content"))
      .orderBy(col("sim").desc, col("vec_id"))
  }

  /** Fetch by id — the Pinecone `Index.fetch(ids)` analog
    * (the reference reads back upserted vectors by their known ids):
    * the requested vectors with their document metadata in the
    * [[ragSearch]] result shape plus the stored embedding. The id
    * predicate pushes into the parquet scan (`PushedFilters: In(vec_id)`)
    * so the corpus is never fully read; a SnapshotStore-backed index
    * additionally bucket-prunes via
    * [[graft.operators.SnapshotStore.readDocs]]. Absent ids are simply
    * absent from the result, as in the reference. */
  def fetchVectors(spark: SparkSession, dir: String, ids: Seq[Long],
      targetIndex: String = DocIndex): DataFrame = {
    val hits = indexFor(spark, dir, targetIndex)
      .filter(col("vec_id").isin(ids: _*))
    Tables.documents(spark, dir)
      .join(broadcast(hits), col("vec_id") === col("doc_id"), "inner")
      .select(col("vec_id"),
        substring(coalesce(concat_ws("#", col("source"), col("doc_id")),
          lit("No title")), 1, 50).as("title"),
        substring(col("text"), 1, 200).as("content"),
        col("embedding"))
      .orderBy("vec_id")
  }

  /** Keyword search over the corpus: term-occurrence scoring, top-n —
    * the engine analog of the SerpAPI tool (num=5 at ra/agent.py:103). */
  def searchByTopic(spark: SparkSession, dir: String, terms: Seq[String],
      n: Int = 5): DataFrame = {
    // let-bound so split(text) evaluates once per row, not once per term
    val score = TextFunctions.bound(TextFunctions.tokens(col("text"))) { t =>
      terms.map(term => size(filter(t, x => x === term))).reduce(_ + _)
    }
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), score.as("score"))
      .filter(col("score") > 0)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(n)
  }

  /** Regex field extraction over document text — the abstract-regex shape
    * (ra/agent.py:84-89) generalised to any pattern/group. */
  def extractField(spark: SparkSession, dir: String, pattern: String,
      group: Int = 1): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        regexp_extract(col("text"), pattern, group).as("extracted"))
      .filter(col("extracted") =!= "")

  /** Report-row assembly: a (section, content) frame combining keyword
    * search and similarity search for a query — the
    * oracle_sequential_search union (ra/agent.py:151-191). */
  def assembleReport(spark: SparkSession, dir: String, query: String,
      perSection: Int = 3, dim: Int = 64): DataFrame = {
    val intro = spark.range(1).select(
      lit("introduction").as("section"),
      concat(lit("Research report for query: "), lit(query)).as("content"))
    val kw = searchByTopic(spark, dir, query.split(" ").toSeq, perSection)
      .select(lit("keyword_search").as("section"),
        format_string("doc %d score %d", col("doc_id"), col("score"))
          .as("content"))
    val sim = ragSearch(spark, dir, query, perSection, dim)
      .select(lit("similarity_search").as("section"),
        format_string("vec %d sim_bp %d", col("vec_id"),
          round(col("sim") * 10000).cast("bigint")).as("content"))
    intro.union(kw).union(sim)
  }
}
