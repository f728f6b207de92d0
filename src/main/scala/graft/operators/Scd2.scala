package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension Type 2 maintenance — the versioned-history
  * form of the reference's re-parse flow (a re-ingested document REPLACES
  * its vectors, parser_pinecone_storage.py:154; SCD2 instead CLOSES the old
  * version and appends the new one, preserving history for time travel).
  * Together with [[SnapshotStore]] (physical versioning) this covers the
  * logical-versioning half of a training-corpus catalog: "what did this
  * dimension row say when the snapshot was taken?".
  *
  * Scale shape (the part that matters at 100 TB):
  *  - history rows (`is_current = false`) are UNTOUCHED — they stream
  *    through a union with no shuffle, no comparison, no rewrite. Commit
  *    cost is proportional to |current| + |updates|, never |history|.
  *  - current × updates is ONE full-outer shuffle join on the business key
  *    (or a broadcast join when the update batch is small — Catalyst picks,
  *    we don't pin, because update batches range from "one document" to
  *    "full re-snapshot").
  *  - change detection is a row-local null-safe comparison of the tracked
  *    attributes (`<=>` conjunction) — no hashing pass, no second scan.
  *
  * Contract: `updates` has at most one row per key (a CDC compaction —
  * latest-record-per-key, [[Scd2.latestPerKey]] — runs first if not);
  * `dim`'s current rows are unique per key (an SCD2 invariant).
  */
object Scd2 {

  /** Reduce a CDC change stream to its latest record per key: the
    * compaction that makes any append-log consumable by [[evolve]].
    * Deterministic total order: (orderCol desc, then remaining tie-break
    * columns) — one window over the key, state bounded per key. */
  def latestPerKey(log: DataFrame, key: String, orderCols: Column*): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(key)).orderBy(orderCols.map(_.desc): _*)
    log.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Apply one update batch to an SCD2 dimension.
    *
    * @param dim     columns: key, attrs..., valid_from, valid_to (null for
    *                open), is_current
    * @param updates columns: key, attrs... (one row per key — the state of
    *                each key as of `asOf`)
    * @param attrs   tracked attributes: a version is "changed" iff any of
    *                these differs (null-safe) from the current version
    * @param asOf    the batch's effective timestamp
    * @return the evolved dimension (same schema as `dim`)
    *
    * Keys present in `dim` but absent from `updates` are left open —
    * an update batch is a delta, not a full snapshot. (Delete semantics,
    * when needed, are an explicit tombstone attribute, so a delete is
    * just another tracked-attribute change.)
    */
  def evolve(dim: DataFrame, updates: DataFrame, key: String,
      attrs: Seq[String], asOf: Column): DataFrame = {
    val history = dim.filter(!col("is_current"))
    val current = dim.filter(col("is_current"))

    val c = current.as("c")
    val u = updates.as("u")
    val joined = c.join(u, col(s"c.$key") === col(s"u.$key"), "full_outer")

    val unchanged: Column = attrs
      .map(a => col(s"c.$a") <=> col(s"u.$a"))
      .reduce(_ && _)
    val hasCur = col(s"c.$key").isNotNull
    val hasUpd = col(s"u.$key").isNotNull
    val changed = hasCur && hasUpd && !unchanged

    // Surviving old versions: kept open when unchanged or not updated,
    // closed out at asOf when the update differs.
    val oldRows = joined.filter(hasCur).select(
      col(s"c.$key").as(key) +:
        attrs.map(a => col(s"c.$a").as(a)) :+
        col("c.valid_from").as("valid_from") :+
        when(changed, asOf).otherwise(col("c.valid_to")).as("valid_to") :+
        when(changed, lit(false)).otherwise(col("c.is_current"))
          .as("is_current"): _*)

    // New versions: changed keys and brand-new keys open at asOf.
    val newRows = joined.filter(changed || (hasUpd && !hasCur)).select(
      col(s"u.$key").as(key) +:
        attrs.map(a => col(s"u.$a").as(a)) :+
        asOf.as("valid_from") :+
        lit(null).cast("timestamp").as("valid_to") :+
        lit(true).as("is_current"): _*)

    history.select(oldRows.columns.map(col): _*)
      .unionByName(oldRows).unionByName(newRows)
  }

  /** Point-in-time read: the version of each key valid at `at` —
    * a row-local interval filter, no shuffle. */
  def asOf(dim: DataFrame, at: Column): DataFrame =
    dim.filter(col("valid_from") <= at &&
      (col("valid_to").isNull || col("valid_to") > at))
}
