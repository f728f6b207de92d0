package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Single-pass, whole-stage-codegen cosine similarity over two numeric
  * array columns.
  *
  * The reference's similarity metric is Pinecone's cosine
  * (parser_pinecone_storage.py:31, ra/agent.py:115-119). The compositional
  * Spark form (`aggregate(zip_with(...))` ×3) walks both arrays three times
  * and materialises a product array per row; this expression does one fused
  * loop with primitive accumulators and participates in whole-stage codegen
  * — the difference matters when scoring 10⁸+ vectors per executor.
  *
  * Semantics: double-precision, strictly sequential accumulation (index
  * 0..n-1), so DuckDB's `list_cosine_similarity` reproduces the value
  * bit-for-bit on the same input. Returns null if either input is null or
  * either norm is zero (the reference never indexes zero vectors; Pinecone
  * would reject them). Array elements are assumed non-null (enforced by the
  * embeddings schema).
  */
case class CosineSimExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _                                    => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cosine_sim expects array<float|double>, got " +
          s"${left.dataType.sql}, ${right.dataType.sql}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x  = a.asInstanceOf[ArrayData]
    val y  = b.asInstanceOf[ArrayData]
    val lf = elemType(left) == FloatType
    val rf = elemType(right) == FloatType
    // dimension mismatch → null (cosineHof's zip_with padding yields null
    // too; DuckDB's list_cosine_similarity errors — a silent prefix match
    // would hide a mis-sized query vector)
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val xi = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xi * yi; na += xi * xi; nb += yi * yi; i += 1
    }
    if (na == 0.0 || nb == 0.0) null
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i   = ctx.freshName("i")
      val n   = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na  = ctx.freshName("na")
      val nb  = ctx.freshName("nb")
      val xi  = ctx.freshName("xi")
      val yi  = ctx.freshName("yi")
      val getX = CodeGenerator.getValue(a, elemType(left), i)
      val getY = CodeGenerator.getValue(b, elemType(right), i)
      s"""
        |if ($a.numElements() != $b.numElements()) {
        |  ${ev.isNull} = true;
        |} else {
        |  int $n = $a.numElements();
        |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
        |  for (int $i = 0; $i < $n; $i++) {
        |    double $xi = (double) $getX;
        |    double $yi = (double) $getY;
        |    $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
        |  }
        |  if ($na == 0.0 || $nb == 0.0) {
        |    ${ev.isNull} = true;
        |  } else {
        |    ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
        |  }
        |}
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimExpr =
    copy(left = newLeft, right = newRight)
}

object CosineSimExpr {
  /** Column-API entry point: `cosine_sim(a, b)`. */
  def cosine_sim(a: Column, b: Column): Column =
    ColumnBridge.column(
      CosineSimExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
