package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine deterministic hashing.
  *
  * Every hash the engine exposes to a DuckDB-checkable query is derived from
  * `md5(string)`, which produces the identical lowercase hex digest in Spark
  * and DuckDB. We take 15 hex digits (60 bits, always non-negative in a
  * BIGINT) so both engines parse it exactly:
  *
  *   Spark :  cast(conv(substring(md5(s), 2, 15), 16, 10) as bigint)
  *   DuckDB:  cast('0x' || substring(md5(s), 2, 15) as bigint)
  *
  * The reference derives vector ids from wall-clock timestamps
  * (parser_pinecone_storage.py:147) — a non-determinism we deliberately
  * replace with content hashing so results are reproducible and
  * oracle-checkable (SURVEY.md §1, §7.1).
  */
object CrossHash {

  /** 60-bit non-negative hash of a string column; identical in DuckDB via
    * `cast('0x' || substring(md5(x),2,15) as bigint)`. Computed by the
    * fused codegen expression [[graft.plans.Md5Hash60Expr]] — value-equal
    * to `conv(substring(md5(c),2,15),16,10)::bigint` (the hex digits ARE
    * digest bytes; CrossHashSpec pins the equality), minus the per-value
    * hex-string materialisation and double number-parse the compositional
    * form pays on every hashed shingle/k-gram/token. */
  def hash60(c: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.plans.Md5Hash60Expr(
        org.apache.spark.sql.graft.ColumnBridge
          .expression(c.cast("binary"))))

  /** Seeded variant: independent hash family member `seed` (MinHash perms). */
  def hash60(c: Column, seed: Int): Column =
    hash60(concat(c, lit("#" + seed.toString)))

  /** The DuckDB SQL fragment equivalent to [[hash60]], for oracle authors. */
  def duckHash60(expr: String): String =
    s"cast('0x' || substring(md5($expr), 2, 15) as bigint)"

  def duckHash60(expr: String, seed: Int): String =
    duckHash60(s"$expr || '#$seed'")

  /** Driver-side Scala evaluation of [[hash60]] (same md5 → same value);
    * used to precompute literals (e.g. SRP plane weights) at plan-build time. */
  def md5Hash60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    val hex = d.map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(1, 16), 16)
  }
}
