package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.CrossHash

/** 32-bit SimHash in the flat (codegen-friendly) formulation.
  *
  * Same reasoning as [[MinHashLSH]]: the array-HOF form folds the token
  * array 32 times interpreted; here tokens explode to rows, bit votes are
  * 32 codegen'd SUM aggregates with map-side partial aggregation, and the
  * signature reassembles from the vote signs. One shuffle of
  * (doc_id, 32 longs); scan → map → partial agg → final agg at any scale.
  */
object SimHash {

  val Bits = 32

  /** (doc_id, simhash): majority-vote signature over token hashes —
    * computed by the fused per-row expression
    * [[graft.plans.SimHashSigExpr]] (value-identical to the exploded
    * token → hash → 32-vote-sum pipeline this replaces, spec-pinned):
    * map-only, no explode rows, no aggregation, no exchange. The
    * `isNotNull` filter reproduces the exploded form's behavior exactly
    * (explode of a null token array dropped the document). */
  def signatures(docs: DataFrame): DataFrame =
    SkewTools.fanOut(docs)
      .filter(col("text").isNotNull)
      .select(col("doc_id"),
        org.apache.spark.sql.graft.ColumnBridge.column(
          graft.plans.SimHashSigExpr(
            org.apache.spark.sql.graft.ColumnBridge
              .expression(col("text")))).as("simhash"))

  /** Near-dup candidate pairs via 8-bit band bucketing + exact Hamming
    * filter; recall is exact for radius ≤ bands−1 by pigeonhole. Buckets
    * aggregate (doc_id, simhash) members and pairs stream out of two
    * nested explodes — one signature pipeline, one groupBy shuffle, and no
    * row ever materializes a bucket's quadratic pair array (see
    * [[MinHashLSH.candidatePairs]] for the memory argument). */
  def nearPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val sigs = signatures(docs)
    sigs
      .select(col("doc_id"), col("simhash"),
        posexplode(array((0 until 4).map(b =>
          shiftright(col("simhash"), 8 * b).bitwiseAND(lit(255L))): _*))
          .as(Seq("band", "key")))
      .groupBy("band", "key")
      .agg(sort_array(collect_list(struct(col("doc_id"), col("simhash"))))
        .as("ids"))
      .filter(size(col("ids")) > 1)
      .select(col("ids"), posexplode(col("ids")).as(Seq("i", "a")))
      .select(col("a"),
        explode(slice(col("ids"), col("i") + lit(2), size(col("ids"))))
          .as("b"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash")))
          .cast("int").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Near-dup pairs BETWEEN two signature frames `(doc_id, simhash)` —
    * the INCREMENTAL probe: an arriving batch's signatures against a
    * stored fingerprint state, band equi-join + exact Hamming. Neither
    * side is ever self-joined, and recall is exact for Hamming ≤
    * bands−1 by the same pigeonhole as [[nearPairs]] (any pair within
    * radius 3 of a 32-bit signature shares one of the 4 bands), so the
    * pair SET equals the full self-join's restricted to (a × b) —
    * which is what lets an incremental clustering reproduce the
    * from-scratch closure exactly. Passing the same frame twice with an
    * `a_id < b_id` filter downstream gives the within-batch pairs from
    * one signature pipeline. */
  def crossPairs(a: DataFrame, b: DataFrame,
      maxHamming: Int = 3): DataFrame = {
    // band keys derive from the ORIGINAL column, not the alias —
    // referencing a same-select alias inside Generate is a lateral
    // column alias, which Spark's analyzer rejects under posexplode
    def banded(df: DataFrame, idc: String, sigc: String) =
      df.select(col("doc_id").as(idc), col("simhash").as(sigc),
        posexplode(array((0 until 4).map(x =>
          shiftright(col("simhash"), 8 * x).bitwiseAND(lit(255L))): _*))
          .as(Seq("band", "key")))
    banded(a, "a_id", "a_sig")
      .join(banded(b, "b_id", "b_sig"), Seq("band", "key"))
      .select(col("a_id"), col("b_id"),
        bit_count(col("a_sig").bitwiseXOR(col("b_sig")))
          .cast("int").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Oracle-side CTE bodies reproducing [[signatures]] in DuckDB SQL
    * (no leading WITH; `prefix` namespaces the CTEs so several sketch
    * pipelines compose; `where` restricts the document scan — e.g. a
    * prior-corpus slice for incremental-dedup oracles). Final CTE:
    * `${prefix}sigs`. */
  def duckSignatureCtes(prefix: String = "", where: String = ""): String = {
    val votes = (0 until Bits)
      .map(b => s"sum(CASE WHEN (h >> $b) % 2 = 1 THEN 1 ELSE -1 END) AS v$b")
      .mkString(",\n  ")
    val bits = (0 until Bits)
      .map(b => s"(CASE WHEN v$b > 0 THEN ${1L << b} ELSE 0 END)")
      .mkString(" + ")
    s"""${prefix}flat AS (SELECT doc_id, ${CrossHash.duckHash60("u.tok")} AS h
       |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents $where) u),
       |${prefix}votes AS (SELECT doc_id,
       |  $votes
       |  FROM ${prefix}flat GROUP BY doc_id),
       |${prefix}sigs AS (SELECT doc_id, cast($bits as bigint) AS simhash FROM ${prefix}votes)""".stripMargin
  }
}
