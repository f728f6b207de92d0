package graft.plans

import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Materialized-view rewrite: queries that contain a registered
  * aggregate's plan are silently re-routed to its precomputed summary —
  * the warehouse feature that turns a 100 TB fact-table rollup into a
  * kilobyte summary scan for every dashboard query that matches it,
  * WITHOUT the query author knowing the summary exists (the
  * RowNumberLimitRule philosophy: optimizations belong to the DECLARED
  * plan, not to callers of a special API).
  *
  * Matching is Catalyst's own [[LogicalPlan.sameResult]] over canonical
  * forms — robust to expression-id renumbering and cosmetic differences,
  * and exact where it must be: a query that groups by different columns,
  * filters differently, or aggregates a different measure does not match
  * and keeps its base-table scan. The substituted subtree is wrapped in
  * a Project that re-aliases the summary's output to the REPLACED
  * subtree's attribute ids, so everything above the rewrite resolves
  * unchanged.
  *
  * Freshness is the operator contract, not magic: [[register]] validates
  * summary ≡ base by default (two exceptAll counts over the
  * summary-sized frames — cheap, because a summary is by definition
  * small), and a pipeline re-registers after each refresh
  * ([[graft.operators.IncrementalAgg]] maintains exactly such summaries
  * incrementally). Limitation: a query referencing the SAME view twice
  * (self-join of the summary) keeps duplicate attribute ids across
  * branches — register two names for that.
  */
object MaterializedViews {

  private final case class Mv(base: LogicalPlan, summary: LogicalPlan)
  private val registry = new ConcurrentHashMap[String, Mv]()

  // register() must observe the TRUE plans. With RewriteRule active, both
  // the validation counts and the optimizedPlan captures below would have
  // any LIVE registration rewrite the base subtree to its (old) summary:
  // validation then spuriously reports "refresh the summary", and with
  // validate = false the stored Mv.base would BE the rewritten plan — the
  // refreshed view silently stops matching any query. The rule passes
  // plans through untouched while this thread is inside a capture
  // (optimization of a forced plan runs on the forcing thread, so a
  // thread-local is exactly the right scope — concurrent queries on
  // OTHER threads keep their rewrites).
  private val capturing = new ThreadLocal[java.lang.Boolean] {
    override def initialValue(): java.lang.Boolean = java.lang.Boolean.FALSE
  }

  /** Register `summary` as the materialized form of `base`. Schemas must
    * agree on column names and types in order (the summary MAY be
    * nullable where the base is not — parquet round-trips lose
    * non-null); with `validate` (default) the CONTENT is checked
    * equivalent via two summary-sized anti-diffs, so a stale or wrong
    * summary is a named error at registration, not silent wrong answers
    * at query time. */
  def register(name: String, base: DataFrame, summary: DataFrame,
      validate: Boolean = true): Unit = {
    val bs = base.schema.fields.map(f => (f.name, f.dataType))
    val ss = summary.schema.fields.map(f => (f.name, f.dataType))
    require(bs.sameElements(ss),
      s"materialized view '$name': summary schema ${ss.mkString(", ")} " +
        s"must match the base aggregate's ${bs.mkString(", ")}")
    // re-registration after a refresh: retire the stale entry FIRST so
    // its summary cannot shadow the capture below under the same name
    registry.remove(name)
    val prev = capturing.get()
    capturing.set(true)
    try {
      // fresh Datasets (identity select) so the captures cannot reuse a
      // QueryExecution whose optimizedPlan was already forced — and
      // rewritten — while an earlier registration was live; the identity
      // Project collapses away in optimization, so matching is unchanged
      val b = base.select(col("*"))
      val s = summary.select(col("*"))
      if (validate) {
        val missing = b.exceptAll(s).count()
        val extra = s.exceptAll(b).count()
        if (missing != 0 || extra != 0)
          throw new IllegalArgumentException(
            s"materialized view '$name' does not match its base query: " +
              s"$missing base row(s) missing from the summary, $extra " +
              "summary row(s) unaccounted for — refresh the summary " +
              "before registering")
      }
      registry.put(name,
        Mv(b.queryExecution.optimizedPlan,
          s.queryExecution.optimizedPlan))
    } finally capturing.set(prev)
  }

  def deregister(name: String): Unit = registry.remove(name)

  def clear(): Unit = registry.clear()

  def registered: Set[String] = registry.keySet().asScala.toSet

  /** The optimizer rule (injected by [[GraftExtensions]]). Skips cheaply
    * when nothing is registered. */
  object RewriteRule extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = {
      if (registry.isEmpty || capturing.get()) return plan
      val mvs = registry.values().asScala.toSeq
      plan.transformDown {
        case p if mvs.exists(_.base.sameResult(p)) =>
          val mv = mvs.find(_.base.sameResult(p)).get
          // re-alias the summary's columns to the replaced subtree's
          // attribute ids — references above the rewrite stay valid
          Project(
            p.output.zip(mv.summary.output).map { case (o, s) =>
              Alias(s, o.name)(exprId = o.exprId, qualifier = o.qualifier)
            },
            mv.summary)
      }
    }
  }
}
