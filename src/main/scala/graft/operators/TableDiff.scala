package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyed table diff / reconciliation: which rows were added, removed, or
  * changed between two versions of a table — the integrity check run
  * after a migration, a backfill, a snapshot restore, or an
  * upsert-vs-rebuild audit (the check [[SnapshotStore]]'s oracle does by
  * hand, packaged as an operator).
  *
  * Rows compare by a per-row digest of the stringified non-key columns
  * (sorted by column name; null marked by a sentinel so `null` and
  * `"null"`-like strings cannot collide via concat_ws's null-skipping).
  * md5 yields the identical hex in DuckDB, so the whole diff is
  * oracle-checkable — see [[duckDigest]]. CROSS-ENGINE caveat: the
  * diff itself is engine-consistent for every type (both sides digest
  * through the same Spark casts), but [[duckDigest]] parity holds for
  * columns whose string rendering matches across engines — ints,
  * strings, booleans, dates; double columns can render differently
  * (e.g. 1.0E7 vs 10000000.0), so oracle authors cast floats to a
  * fixed-scale decimal string first.
  *
  * Scale shape: each side reduces to (key, 16-byte digest) map-side —
  * the shuffle carries digests, never row payloads — then ONE full-outer
  * join on the key classifies every row. O(n) shuffle bytes independent
  * of row width; at rest, bucketed sides join with no exchange at all.
  */
object TableDiff {

  private val FieldSep = "\u0001"
  private val NullMark = "\u0002"

  private def digestCols(df: DataFrame, key: String): Seq[Column] =
    df.columns.filterNot(_ == key).sorted.toSeq
      .map(c => coalesce(col(c).cast("string"), lit(NullMark)))

  /** One row per differing key: status ∈ added | removed | changed.
    * Identical rows produce nothing — a clean migration diffs to empty. */
  def diff(before: DataFrame, after: DataFrame, key: String): DataFrame = {
    require(before.columns.sorted.sameElements(after.columns.sorted),
      s"diff requires identical schemas: ${before.columns.mkString(",")} " +
        s"vs ${after.columns.mkString(",")}")
    val a = before.select(col(key),
      md5(concat_ws(FieldSep, digestCols(before, key): _*)).as("h_before"))
    val b = after.select(col(key),
      md5(concat_ws(FieldSep, digestCols(after, key): _*)).as("h_after"))
    a.join(b, Seq(key), "full_outer")
      .withColumn("status",
        when(col("h_after").isNull, "removed")
          .when(col("h_before").isNull, "added")
          .when(col("h_before") =!= col("h_after"), "changed"))
      .filter(col("status").isNotNull)
      .select(col(key), col("status"))
  }

  /** DuckDB fragment computing the same row digest, for oracle authors:
    * pass the non-key column names (any order; they are sorted here). */
  def duckDigest(nonKeyCols: Seq[String]): String =
    "md5(concat_ws(chr(1), " +
      nonKeyCols.sorted.map(c =>
        s"coalesce(cast($c as varchar), chr(2))").mkString(", ") + "))"

  /** Apply a CDC change batch to a base table — the MERGE INTO analog
    * (diff's inverse: `applyChanges(before, changes) = after`). `changes`
    * carries an `op` column (`upsert` | `delete`) plus the full payload
    * row (payload ignored for deletes); every changed key's base row is
    * dropped via ONE left-anti join on the key, then upsert payloads
    * union in. Exactly the delete-then-insert decomposition a log-
    * structured store executes, expressed over frames: base-sized side
    * shuffles once on the key (co-located/bucketed at rest → no
    * exchange), changes are delta-sized. Duplicate keys WITHIN one
    * change batch are a named error (MERGE's "multiple source rows
    * matched" condition — applying them would be order-dependent). */
  def applyChanges(base: DataFrame, changes: DataFrame,
      key: String): DataFrame = {
    // limit(3): only 2 ops are legal, so 3 distinct values already prove
    // an illegal one — and the cap keeps a malformed changes frame whose
    // `op` column is high-cardinality (e.g. a mis-wired payload column)
    // from pulling every distinct value to the driver just to fail
    val ops = changes.select(col("op")).distinct().limit(3)
      .collect().map(_.getString(0)).toSet
    val bad = ops.diff(Set("upsert", "delete"))
    require(bad.isEmpty,
      s"applyChanges: unknown op(s) ${bad.mkString(", ")} — " +
        "only 'upsert' and 'delete' are defined")
    val dupKeys = changes.groupBy(col(key)).count()
      .filter(col("count") > 1).limit(5)
      .collect().map(_.get(0))
    require(dupKeys.isEmpty,
      s"applyChanges: change batch has multiple rows for key(s) " +
        s"${dupKeys.mkString(", ")} — resolution would be order-dependent " +
        "(MERGE's multiple-source-rows-matched error); pre-aggregate the " +
        "batch to one change per key")
    require(base.columns.sorted.sameElements(
      changes.drop("op").columns.sorted),
      s"applyChanges: payload schema must match base: " +
        s"${base.columns.mkString(",")} vs " +
        s"${changes.drop("op").columns.mkString(",")}")
    base.join(changes.select(col(key)), Seq(key), "left_anti")
      .unionByName(changes.filter(col("op") === "upsert").drop("op")
        .select(base.columns.map(col): _*))
  }
}
