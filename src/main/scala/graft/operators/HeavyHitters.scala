package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Two-pass EXACT heavy hitters: Misra–Gries candidate sketch, then an
  * exact recount of only the candidates.
  *
  * Pass 1 runs Misra–Gries(k) inside each partition (map-only, O(k) state
  * per task). MG guarantees any item with partition frequency > n_p/k
  * survives that partition's summary; by pigeonhole an item with GLOBAL
  * frequency > N/k must exceed n_p/k in at least one partition, so the
  * union of per-partition candidates contains every global heavy hitter —
  * no false negatives. Pass 2 semi-joins the corpus against the broadcast
  * candidate set (at most (k−1)·numPartitions terms) and counts exactly.
  *
  * Why it matters at 100 TB: a plain groupBy-count shuffles one record per
  * DISTINCT term (billions for web text). Here the only full-width shuffle
  * is over rows that survive the candidate semi-join — the heavy tail is
  * dropped map-side — and the final aggregate is over ≤ k·partitions keys.
  * The result is bit-exact (not approximate), so it is DuckDB-checkable.
  */
object HeavyHitters {

  /** Per-partition Misra–Gries: returns the ≤ k−1 surviving candidates. */
  private[graft] def misraGries(it: Iterator[String], k: Int)
      : Iterator[String] = {
    val counts = scala.collection.mutable.HashMap.empty[String, Long]
    it.foreach { t =>
      if (counts.contains(t)) counts(t) += 1L
      else if (counts.size < k - 1) counts(t) = 1L
      else {
        counts.mapValuesInPlace((_, v) => v - 1L)
        counts.filterInPlace((_, v) => v > 0L)
      }
    }
    counts.keysIterator
  }

  /** Candidate terms (superset of all items with freq > N/k). */
  def candidates(terms: DataFrame, termCol: String, k: Int): DataFrame = {
    val s = terms.sparkSession
    import s.implicits._
    terms.select(col(termCol).cast("string"))
      .na.drop(Seq(termCol))
      .as[String]
      .mapPartitions(it => misraGries(it, k))
      .toDF(termCol)
      .distinct()
  }

  /** Exact counts of every term with freq·k > N (strictly above N/k).
    * Output: (termCol, freq, n_total) ordered by freq desc, term. */
  def exact(terms: DataFrame, termCol: String, k: Int): DataFrame = {
    val cand = candidates(terms, termCol, k)
    val total = terms.agg(count(lit(1)).as("n_total"))
    terms
      .join(broadcast(cand), Seq(termCol), "left_semi")
      .groupBy(termCol)
      .agg(count(lit(1)).as("freq"))
      .crossJoin(broadcast(total))
      .filter(col("freq") * k > col("n_total"))
      .orderBy(col("freq").desc, col(termCol))
  }
}
