package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeSet, Expression, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, LogicalPlan}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Column-level lineage extraction — which SOURCE columns feed each
  * output column of a query (the data-governance primitive behind impact
  * analysis, PII propagation tracking, and selective backfills: "which
  * outputs must be recomputed if `l_quantity` is corrected?").
  *
  * Works on the ANALYZED plan by walking attribute references: each
  * output attribute expands through the plan's named expressions
  * (aliases in projections/aggregates/windows) down to leaf-relation
  * attributes, then leaves are labeled with their source (parquet path
  * root for file relations, the leaf class otherwise). Join keys,
  * filters, and sort orders do not contribute lineage — this is
  * DIRECT (value-flow) lineage, the standard column-lineage definition;
  * control-flow dependencies (a filter's columns) are a different
  * relation and deliberately excluded.
  *
  * Pure plan traversal: nothing executes, no data is read — usable on a
  * 100 TB table's query for free.
  */
object Lineage {

  /** (output column → source columns as "source.column", sorted).
    * Output columns with no leaf ancestry (pure literals) map to the
    * empty set. */
  def columnLineage(df: DataFrame): Map[String, Seq[String]] = {
    val plan = df.queryExecution.analyzed
    plan.output.map { attr =>
      attr.name -> trace(AttributeSet(Seq(attr)), plan).toSeq.sorted
    }.toMap
  }

  /** Expand `wanted` attributes through `plan` down to leaf labels. */
  private def trace(wanted: AttributeSet, plan: LogicalPlan): Set[String] =
    plan match {
      case leaf: LeafNode =>
        leaf.output.filter(wanted.contains)
          .map(a => s"${label(leaf)}.${a.name}").toSet
      case u: org.apache.spark.sql.catalyst.plans.logical.Union =>
        // a Union's output reuses the FIRST child's attribute ids; the
        // other branches correspond POSITIONALLY — map by index, or the
        // non-first branches' lineage is silently lost
        u.children.flatMap { c =>
          val posWanted = u.output.zipWithIndex.collect {
            case (a, i) if wanted.contains(a) => c.output(i)
          }
          trace(AttributeSet(posWanted), c)
        }.toSet
      case node =>
        // rewrite wanted through this node's named expressions: an alias
        // output attribute expands to the references of its child
        // expression; pass-through attributes survive unchanged. A
        // Generate's synthesized columns (explode/posexplode output) all
        // flow from the generator's input expression.
        val generated: Map[Attribute, Expression] = node match {
          case g: org.apache.spark.sql.catalyst.plans.logical.Generate =>
            g.generatorOutput.map(a => (a: Attribute) ->
              (g.generator: Expression)).toMap
          case _ => Map.empty
        }
        val aliasMap: Map[Attribute, Expression] = generated ++
          node.expressions.collect {
            case ne: NamedExpression if !ne.isInstanceOf[Attribute] =>
              ne.toAttribute -> (ne: Expression)
          }.toMap
        val expanded = wanted.flatMap {
          case a if aliasMap.contains(a) => aliasMap(a).references
          case a => AttributeSet(Seq(a))
        }
        val want = AttributeSet(expanded.toSeq)
        node.children
          .map(c => trace(want.intersect(c.outputSet), c))
          .foldLeft(Set.empty[String])(_ ++ _)
    }

  private def label(leaf: LeafNode): String = leaf match {
    case lr: LogicalRelation =>
      lr.relation match {
        case h: HadoopFsRelation =>
          h.location.rootPaths.headOption.map(_.getName)
            .getOrElse("files").stripSuffix(".parquet")
        case other => other.getClass.getSimpleName
      }
    case other => other.nodeName
  }
}
