package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every query pack; each pack pairs Spark DataFrame queries with
  * DuckDB oracle SQL over the same parquet tables.
  */
object SparkEntry {

  private val packs: Seq[QueryPack] = Seq(
    Relational,
    Warehouse,
    RagQueries,
    DedupQueries,
    TextAnalysis,
    Similarity,
    Pipeline
  )

  /** Flagship query (SURVEY.md §7.2): RAG search — cosine top-k joined back
    * to documents. Driver smoke-checks rows > 0 on sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    queries("r02_rag_search")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    val all = packs.flatMap(_.defs)
    val dups = all.groupBy(_._1).filter(_._2.size > 1).keys
    // toMap would silently shadow a colliding name with whichever pack
    // comes last — fail loudly instead
    require(dups.isEmpty, s"duplicate query names across packs: ${dups.mkString(", ")}")
    all.toMap
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracles).toMap
}
