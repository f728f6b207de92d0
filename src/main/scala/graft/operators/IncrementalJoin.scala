package graft.operators

import org.apache.spark.sql.DataFrame

/** Incremental JOIN maintenance — the delta-join rule that keeps a
  * materialized join up to date without ever re-joining the bases:
  *
  *   (A₀ ∪ ΔA) ⋈ (B₀ ∪ ΔB)  =  A₀⋈B₀  ∪  ΔA⋈B₀  ∪  A₀⋈ΔB  ∪  ΔA⋈ΔB
  *
  * so the NEW rows of the maintained join are exactly
  * [[deltaJoin]](A₀, ΔA, B₀, ΔB) — three joins in which a DELTA is
  * always one side. At 100 TB that is the difference between a
  * base-sized shuffle per refresh and a delta-sized one: the stored
  * bases are bucketed at rest (co-located joins, no exchange on the big
  * side), the deltas are whatever the trigger brought in, and
  * A₀ ⋈ B₀ — the only corpus × corpus term — is the already-materialized
  * state, never recomputed. The identity is a bag equality, so it holds
  * with duplicate join keys (many-to-many) and composes per refresh:
  * fold each micro-batch's delta in and the invariant
  * `stored ≡ full recompute` is maintained inductively (the i13 oracle
  * checks exactly this equality; IncrementalJoinSpec fuzzes it on
  * many-to-many splits including empty deltas).
  *
  * Inner equi-join only: outer variants need retraction handling (a base
  * row's NULL-extension must be withdrawn when a delta brings its first
  * match) — state-changing, not append-only, and out of scope here.
  */
object IncrementalJoin {

  /** The new join rows contributed by appending `dA` to `baseA` and `dB`
    * to `baseB` (deltas must be disjoint from their bases — append-only
    * CDC). Output columns: the `usingKeys` once, then A's remaining
    * columns, then B's. */
  def deltaJoin(baseA: DataFrame, dA: DataFrame,
      baseB: DataFrame, dB: DataFrame,
      usingKeys: Seq[String]): DataFrame = {
    require(usingKeys.nonEmpty, "deltaJoin needs at least one join key")
    Seq(baseA -> dA, baseB -> dB).foreach { case (b, d) =>
      require(b.columns.sameElements(d.columns),
        s"delta schema must match its base: ${b.columns.mkString(",")} " +
          s"vs ${d.columns.mkString(",")}")
    }
    dA.join(baseB, usingKeys)
      .unionByName(baseA.join(dB, usingKeys))
      .unionByName(dA.join(dB, usingKeys))
  }

  /** The maintained join after one refresh: stored state ∪ delta rows.
    * `stored` must be the previous maintained join (A₀ ⋈ B₀). */
  def refreshed(stored: DataFrame, baseA: DataFrame, dA: DataFrame,
      baseB: DataFrame, dB: DataFrame,
      usingKeys: Seq[String]): DataFrame =
    stored.unionByName(deltaJoin(baseA, dA, baseB, dB, usingKeys))
}
