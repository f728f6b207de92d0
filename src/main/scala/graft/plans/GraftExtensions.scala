package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers the engine's native
  * Catalyst expressions for SQL use. Activate with
  * `spark.sql.extensions=graft.plans.GraftExtensions` or
  * `SparkSession.builder().withExtensions(new GraftExtensions)`; then
  * `SELECT cosine_sim(a.embedding, b.embedding)` works in plain SQL and
  * participates in whole-stage codegen.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
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
    e.injectPlannerStrategy(_ => TopKPerKeyStrategy)
  }
}
