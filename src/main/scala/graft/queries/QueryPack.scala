package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named set of queries plus their DuckDB oracle SQL.
  *
  * Contract (driver harness): for every key in [[defs]] there is either a
  * key in [[oracles]] whose SQL, run by DuckDB over the same parquet tables,
  * yields an identical result (same column names, same types, same rows in
  * the same order), or no oracle (driver falls back to a rows-only check).
  *
  * Determinism rules (SURVEY.md §5, §7.4): every query ends in an ORDER BY
  * on a total ordering; float aggregates go through exact decimal
  * arithmetic; similarities are rounded before being emitted; no wall-clock.
  */
trait QueryPack {
  def defs: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]
}
