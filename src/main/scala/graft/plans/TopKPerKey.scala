package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.graft.PlanBridge
import org.apache.spark.sql.types.IntegerType

/** Top-k rows per key — a whole-operator Catalyst extension.
  *
  * The built-in formulation (`row_number().over(partitionBy(key).orderBy(…))
  * .filter(rank <= k)`) must shuffle EVERY row to the key's reducer and
  * fully sort each partition before it can discard anything: at 100 TB the
  * shuffle is the dataset. This operator plans as two phases:
  *
  *   partial TopKPerKeyExec   (bounded heap per key, map-side: each task
  *                             forwards at most k rows per key it saw)
  *        → Exchange on key   (shuffles ≤ k·keys·tasks rows, not n)
  *        → Sort (key, order) (over the REDUCED set; SortExec spills)
  *   final  TopKPerKeyExec    (streaming group scan: emit ranks 1..k per
  *                             key, O(1) rows of state)
  *
  * — the `partial_min`-style combine that windows cannot express. Wired in
  * via [[GraftExtensions]] (injectPlannerStrategy) or
  * `spark.experimental.extraStrategies`; the Column-level entry point is
  * [[TopKPerKey.topKPerKey]].
  *
  * Memory is bounded at BOTH phases: the map-side heap map degrades to
  * pass-through once `partialBudget` rows are buffered (forwarding extra
  * rows is always safe — the final phase re-filters), and the final phase
  * holds one key and a counter, delegating ordering to Spark's SortExec,
  * which spills to disk. No phase can OOM on key cardinality. Rank ties
  * are resolved by the caller's total ordering, exactly like row_number.
  */
case class TopKPerKeyNode(keys: Seq[Expression], order: Seq[SortOrder],
    k: Int, child: LogicalPlan,
    partialBudget: Int = TopKPerKey.PartialBufferBudget,
    // constructor field (not a body val): plan transforms go through
    // copy(), which must preserve the exprId or downstream references to
    // `rank` dangle
    rankAttr: AttributeReference =
      AttributeReference("rank", IntegerType, nullable = false)())
    extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  override lazy val resolved: Boolean =
    childrenResolved && keys.forall(_.resolved) && order.forall(_.resolved)
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerKeyNode =
    copy(child = c)
}

case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder],
    k: Int, child: SparkPlan, partial: Boolean, partialBudget: Int,
    rankAttr: Option[AttributeReference]) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output ++ rankAttr.toSeq
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr.toSeq)

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(keys))

  // The final phase streams over key groups, so it asks the planner for a
  // (key, order) sort of the already-reduced post-shuffle rows: Spark's
  // SortExec spills to disk, which a private heap map cannot — this is
  // what bounds final-phase memory at O(1) rows regardless of key
  // cardinality. The partial phase accepts any order.
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    if (partial) Seq(Nil)
    else Seq(keys.map(SortOrder(_, Ascending)) ++ order)

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val ks = keys
    val os = order
    val kk = k
    val emitRank = rankAttr
    val budget = partialBudget
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(ks, childOutput)
      emitRank match {
        case None =>
          val ord: Ordering[InternalRow] =
            new InterpretedOrdering(os, childOutput)
          val heaps = mutable.LinkedHashMap
            .empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
          // Partial (map-side) phase: bounded-memory degrade. The heap map
          // holds ≤ k rows per distinct key seen by this task; once the
          // total buffered-row budget is hit, rows for NEW keys pass
          // through unbuffered — forwarding extra rows is safe because the
          // final phase re-filters to the true per-key top-k, whereas
          // buffering without bound could OOM on extreme key cardinality.
          var buffered = 0
          val passThrough = iter.flatMap { row =>
            val key = keyProj(row)
            heaps.get(key) match {
              case Some(pq) =>
                if (pq.size < kk) { pq.enqueue(row.copy()); buffered += 1 }
                else if (ord.compare(row, pq.head) < 0) {
                  pq.dequeue(); pq.enqueue(row.copy())
                }
                Iterator.empty
              case None if buffered < budget =>
                val pq = new mutable.PriorityQueue[InternalRow]()(ord)
                pq.enqueue(row.copy())
                heaps.put(key.copy(), pq)
                buffered += 1
                Iterator.empty
              case None =>
                Iterator.single[InternalRow](row)
            }
          }
          // ++ evaluates its right operand lazily: heaps drain only after
          // the input (and its pass-through rows) is exhausted.
          passThrough ++ heaps.valuesIterator.flatMap(_.iterator)
        case Some(rank) =>
          // Final (post-shuffle) phase: input arrives key-clustered AND
          // sorted by (key, order) — requiredChildOrdering — so rank
          // assignment is a streaming scan holding only the current key
          // and a counter. Rows past rank k are skipped until the key
          // changes. O(1) rows of state; the sort that makes this
          // possible ran in SortExec, which spills.
          val proj = UnsafeProjection.create(childOutput :+ rank,
            childOutput :+ rank)
          val joined = new JoinedRow
          var currentKey: UnsafeRow = null
          var emitted = 0
          iter.flatMap { row =>
            val key = keyProj(row)
            if (currentKey == null || key != currentKey) {
              currentKey = key.copy()
              emitted = 0
            }
            if (emitted < kk) {
              emitted += 1
              Iterator.single[InternalRow](
                proj(joined(row, InternalRow(emitted))))
            } else Iterator.empty
          }
      }
    }
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyExec =
    copy(child = c)
}

object TopKPerKeyStrategy
    extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n @ TopKPerKeyNode(keys, order, k, child, budget, rank) =>
      val partialExec = TopKPerKeyExec(keys, order, k,
        planLater(child), partial = true, partialBudget = budget,
        rankAttr = None)
      TopKPerKeyExec(keys, order, k, partialExec, partial = false,
        partialBudget = budget, rankAttr = Some(rank)) :: Nil
    case _ => Nil
  }
}

object TopKPerKey {

  /** Default max rows the PARTIAL phase buffers per task before degrading
    * to pass-through for unseen keys (~4M rows ≈ hundreds of MB of
    * UnsafeRow for typical fact rows — spill-free at executor defaults).
    * Injectable per call via [[topKPerKey]]'s `partialBudget`. */
  val PartialBufferBudget: Int = 1 << 22

  /** Sort key: column name + direction. */
  case class Key(name: String, desc: Boolean = false)
  def asc(name: String): Key = Key(name)
  def desc(name: String): Key = Key(name, desc = true)

  /** Entry point: top-`k` rows per `keys`, ordered by `order` (include
    * tie-breakers for a total order); appends a `rank` column. Keys and
    * order resolve by name against the input's analyzed plan — Spark 4's
    * lazy Column nodes only resolve inside built-in operators.
    *
    * Memory: bounded at both phases regardless of key cardinality — the
    * map-side partial phase degrades to pass-through past `partialBudget`
    * buffered rows, and the final phase is a streaming scan over
    * SortExec-sorted (and spilled, if needed) input. */
  def topKPerKey(df: DataFrame, keys: Seq[String], order: Seq[Key],
      k: Int, partialBudget: Int = PartialBufferBudget): DataFrame = {
    val spark = SparkSession.active
    if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerKeyStrategy
    }
    val child = PlanBridge.analyzed(df)
    def attr(n: String): Attribute = child.output
      .find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(
        s"column $n not in ${child.output.map(_.name).mkString(", ")}"))
    val orderExprs = order.map { o =>
      if (o.desc) SortOrder(attr(o.name), Descending)
      else SortOrder(attr(o.name), Ascending)
    }
    PlanBridge.ofRows(spark,
      TopKPerKeyNode(keys.map(attr), orderExprs, k, child, partialBudget))
  }
}
