package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: keep a per-key aggregate table up to
  * date by merging the DELTA's partial aggregates into the stored state —
  * never rescanning the corpus.
  *
  * The reference recomputes everything per run (its DAG re-reads every S3
  * object each trigger); at 100 TB the only viable shape is the algebraic
  * one: every maintained measure is a commutative monoid (count, exact
  * decimal sum — avg derives as sum/count at read time), so
  * merge(state(A), state(B)) = state(A ∪ B) holds by associativity and the
  * update cost is O(|state| + |delta|), independent of corpus size. The
  * same property is what makes Spark's own partial aggregation correct —
  * this operator just persists the partial.
  */
object IncrementalAgg {

  /** Aggregate state of `events` per `keys`: row count and exact decimal
    * sum of `valueCol` (decimal addition is associative and
    * order-independent, so states merge deterministically). */
  def state(events: DataFrame, keys: Seq[String], valueCol: String)
      : DataFrame =
    events.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast("decimal(12,2)")).as("sum_val"))

  /** Merge any number of aggregate states (base ∪ deltas) into one:
    * union + re-sum. Keys present in only one state pass through; counts
    * and sums add. */
  def merge(states: Seq[DataFrame], keys: Seq[String]): DataFrame = {
    require(states.nonEmpty, "need at least one state to merge")
    states.reduce(_.unionByName(_))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n")).as("n"), sum(col("sum_val")).as("sum_val"))
  }
}
