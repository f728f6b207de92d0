package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BPE (byte-pair-encoding) vocabulary induction — the tokenizer-training
  * step of an LLM data pipeline (Sennrich et al. 2016, "Neural Machine
  * Translation of Rare Words with Subword Units").
  *
  * The scale insight that makes BPE training distributable: merges are
  * learned from the WORD-FREQUENCY TABLE, not the corpus. The corpus
  * (100 TB) is scanned exactly once to produce (word, freq); every merge
  * iteration after that touches only the vocabulary — bounded by distinct
  * word count, not corpus size — so the per-iteration cost is a
  * vocab-sized scan plus a 1-row argmax broadcast.
  *
  * Representation: a word's current segmentation is a space-separated
  * symbol string ("h e l l o"). Merging the winning pair is one literal
  * `replace(' '||sym||' ', ' a b ', ' ab ')` — left-to-right,
  * non-overlapping, exactly BPE's greedy merge order, and replayed
  * bit-identically by DuckDB's replace (t34 oracle). Pair counting uses
  * overlapping adjacent pairs ("a a a" contributes "a a" twice), the
  * classic formulation. The winner is the partial-aggregable
  * min(struct(-count, pair)): highest count, lexicographically smallest
  * pair on ties — deterministic across partitionings.
  */
object BpeMerges {

  /** Overlapping adjacent symbol pairs of a space-separated symbol
    * string, each as "left right". Single-symbol words yield none. */
  private def pairsOf(sym: Column): Column = {
    val a = split(sym, " ")
    zip_with(slice(a, lit(1), size(a) - 1), slice(a, lit(2), size(a) - 1),
      (x, y) => concat(x, lit(" "), y))
  }

  /** Learn `iters` merges from a `(w, freq)` word-frequency table.
    * Returns one row per merge: (iter, pair, merged, pair_freq). Each
    * iteration's segmentation table is eagerly checkpointed — the
    * PageRank discipline: iterations must not replay prior merges, and
    * the 1-row argmax must evaluate once regardless of how many
    * consumers the plan gives it. */
  def learn(words: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, s"need iters >= 1, got $iters")
    var cur = words
      .select(trim(regexp_replace(col("w"), "(.)", "$1 ")).as("sym"),
        col("freq"))
      .localCheckpoint(eager = true)
    var out: Option[DataFrame] = None
    for (i <- 1 to iters) {
      val best = cur
        .select(col("freq"), explode(pairsOf(col("sym"))).as("pair"))
        .groupBy("pair")
        .agg(sum("freq").as("cnt"))
        .agg(min(struct((-col("cnt")).as("nc"), col("pair"))).as("b"))
        .select(col("b.pair").as("pair"), (-col("b.nc")).as("cnt"))
        .localCheckpoint(eager = true)
      val row = best.select(lit(i).as("iter"), col("pair"),
        expr("replace(pair, ' ', '')").as("merged"),
        col("cnt").as("pair_freq"))
      out = Some(out.fold(row)(_.unionByName(row)))
      if (i < iters)
        cur = cur.crossJoin(broadcast(best))
          .select(trim(expr(
            "replace(concat(' ', sym, ' '), concat(' ', pair, ' '), " +
              "concat(' ', replace(pair, ' ', ''), ' '))")).as("sym"),
            col("freq"))
          .localCheckpoint(eager = true)
    }
    out.get
  }

  /** Apply learned merges (in iteration order) to a column of plain
    * words: the tokenize-with-trained-vocab step. `merges` is the
    * driver-side (pair, merged) list — vocabulary-bounded, so carrying
    * it in the closure is the broadcast-small case. */
  def segment(word: Column, merges: Seq[(String, String)]): Column = {
    val init = trim(regexp_replace(word, "(.)", "$1 "))
    merges.foldLeft(init) { case (sym, (pair, merged)) =>
      trim(regexp_replace(concat(lit(" "), sym, lit(" ")),
        java.util.regex.Pattern.quote(" " + pair + " "),
        java.util.regex.Matcher.quoteReplacement(" " + merged + " ")))
    }
  }
}
