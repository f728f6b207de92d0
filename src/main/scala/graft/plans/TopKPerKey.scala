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
  *   final  TopKPerKeyExec    (same heap, then rank assignment)
  *
  * — the `partial_min`-style combine that windows cannot express. Wired in
  * via [[GraftExtensions]] (injectPlannerStrategy) or
  * `spark.experimental.extraStrategies`; the Column-level entry point is
  * [[TopKPerKey.topKPerKey]].
  *
  * Memory: each task holds ≤ k rows per distinct key in its input — the
  * operator targets high-cardinality fact data with small k (retrieval
  * top-k, per-entity leaderboards). Rank ties are resolved by the caller's
  * total ordering, exactly like row_number.
  */
case class TopKPerKeyNode(keys: Seq[Expression], order: Seq[SortOrder],
    k: Int, child: LogicalPlan,
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
    k: Int, child: SparkPlan, partial: Boolean,
    rankAttr: Option[AttributeReference]) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output ++ rankAttr.toSeq
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr.toSeq)

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(keys))

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val ks = keys
    val os = order
    val kk = k
    val emitRank = rankAttr
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(ks, childOutput)
      val ord: Ordering[InternalRow] =
        new InterpretedOrdering(os, childOutput)
      val heaps =
        mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      iter.foreach { row =>
        val key = keyProj(row)
        heaps.get(key) match {
          case Some(pq) =>
            if (pq.size < kk) pq.enqueue(row.copy())
            else if (ord.compare(row, pq.head) < 0) {
              pq.dequeue(); pq.enqueue(row.copy())
            }
          case None =>
            val pq = new mutable.PriorityQueue[InternalRow]()(ord)
            pq.enqueue(row.copy())
            heaps.put(key.copy(), pq)
        }
      }
      emitRank match {
        case None =>
          heaps.valuesIterator.flatMap(_.iterator)
        case Some(rank) =>
          val proj = UnsafeProjection.create(childOutput :+ rank,
            childOutput :+ rank)
          val joined = new JoinedRow
          heaps.valuesIterator.flatMap { pq =>
            // dequeueAll yields priority order (heap max = sort-last first)
            val sorted: Seq[InternalRow] = pq.dequeueAll[InternalRow]
            sorted.reverseIterator.zipWithIndex.map {
              case (row: InternalRow, i: Int) =>
                proj(joined(row, InternalRow(i + 1)))
            }
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
    case n @ TopKPerKeyNode(keys, order, k, child, rank) =>
      val partialExec = TopKPerKeyExec(keys, order, k,
        planLater(child), partial = true, rankAttr = None)
      TopKPerKeyExec(keys, order, k, partialExec, partial = false,
        rankAttr = Some(rank)) :: Nil
    case _ => Nil
  }
}

object TopKPerKey {

  /** Sort key: column name + direction. */
  case class Key(name: String, desc: Boolean = false)
  def asc(name: String): Key = Key(name)
  def desc(name: String): Key = Key(name, desc = true)

  /** Entry point: top-`k` rows per `keys`, ordered by `order` (include
    * tie-breakers for a total order); appends a `rank` column. Keys and
    * order resolve by name against the input's analyzed plan — Spark 4's
    * lazy Column nodes only resolve inside built-in operators. */
  def topKPerKey(df: DataFrame, keys: Seq[String], order: Seq[Key],
      k: Int): DataFrame = {
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
      TopKPerKeyNode(keys.map(attr), orderExprs, k, child))
  }
}
