package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** SparkSessionExtensions entry point: registers the engine's native
  * Catalyst expressions for SQL use. Activate with
  * `spark.sql.extensions=graft.plans.GraftExtensions` or
  * `SparkSession.builder().withExtensions(new GraftExtensions)`; then
  * `SELECT cosine_sim(a.embedding, b.embedding)` and
  * `SELECT srp_sign(embedding, 64, 16)` work in plain SQL and
  * participate in whole-stage codegen.
  *
  * (ivf_cell_dists stays Column-API-only: its centroid table is a
  * driver-computed Seq baked into the expression, not a SQL-expressible
  * argument.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"srp_sign: $what must be an integer literal, got $other")
  }

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimExpr].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => {
        if (exprs.length != 2) {
          throw new IllegalArgumentException(
            "cosine_sim(array<float>, array<float>) expects exactly 2 " +
              s"arguments, got ${exprs.length}")
        }
        CosineSimExpr(exprs.head, exprs(1))
      }))
    e.injectFunction((
      FunctionIdentifier("srp_sign"),
      new ExpressionInfo(classOf[SrpSignExpr].getName, "srp_sign"),
      (exprs: Seq[Expression]) => {
        if (exprs.length != 3) {
          throw new IllegalArgumentException(
            "srp_sign(array<float|double>, dim, planes) expects exactly " +
              s"3 arguments, got ${exprs.length}")
        }
        SrpSignExpr(exprs.head, intLit(exprs(1), "dim"),
          intLit(exprs(2), "planes"))
      }))
    e.injectPlannerStrategy(_ => TopKPerKeyStrategy)
    e.injectOptimizerRule(_ => RowNumberLimitRule)
    e.injectOptimizerRule(_ => MaterializedViews.RewriteRule)
  }
}
