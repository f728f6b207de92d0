package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom-filter semi-join reduction: prune a fact table against the KEYS of
  * a (filtered) dimension before the join's shuffle.
  *
  * The 100 TB story: when the dim side is too big to broadcast-join (wide
  * rows, millions of survivors) the join becomes a sort-merge join that
  * shuffles the ENTIRE fact table — including every row whose key the dim
  * side will never match. A bloom filter of just the dim keys is orders of
  * magnitude smaller than the dim itself (~1.2 MB per million keys at 1%
  * fpp), broadcasts cheaply, and drops non-matching fact rows map-side,
  * before the exchange. False positives are harmless: the join itself is
  * still exact, the bloom only shrinks its input. This is the manual form
  * of Spark's AQE runtime bloom filter
  * (spark.sql.optimizer.runtime.bloomFilter.*), whose size thresholds are
  * tuned for real clusters and never fire at test scale.
  *
  * Cost model: one extra column-pruned pass over dim to build the sketch
  * (driver-side merge of per-partition blooms), repaid whenever the fact:
  * matched ratio is large — exactly the selective-dim shape (TPC-H Q3/Q5
  * family) where it matters.
  */
object BloomPrune {

  /** Inner-join `fact` to `dim`, pruning `fact` map-side with a bloom of
    * `dim`'s join keys first. Keys must be integral (long-compatible).
    * The join itself is hinted sort-merge — the scenario where pruning
    * pays; Catalyst would broadcast a tiny test-scale dim otherwise and
    * hide the plan under test. */
  def prunedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, expectedKeys: Long = 1000000L,
      fpp: Double = 0.01): DataFrame = {
    val bf = dim.stat.bloomFilter(dimKey, expectedKeys, fpp)
    val bc = fact.sparkSession.sparkContext.broadcast(bf)
    val might = udf((k: Long) => bc.value.mightContainLong(k))
    fact
      .filter(col(factKey).isNotNull && might(col(factKey)))
      .join(dim.hint("merge"), col(factKey) === col(dimKey))
  }
}
