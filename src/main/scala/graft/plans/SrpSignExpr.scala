package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Packed signed-random-projection signature as ONE fused codegen loop.
  *
  * Bit p of the result is 1 iff dot(quantize1e6(v), plane_p) > 0, where
  * plane weights are the md5-derived integers of
  * [[graft.functions.VectorFunctions.srpWeights]] — the same integer-exact
  * construction the DuckDB oracle regenerates
  * ([[graft.functions.VectorFunctions.duckSrpSigCtes]]).
  *
  * Why an Expression and not column composition: the HOF form
  * (`aggregate(zip_with(...))` per plane) evaluates planes·dim interpreted
  * lambda steps per row (CodegenFallback — the round-3 bench regression),
  * and the flat `element_at × literal` expansion, while whole-stage
  * codegen, emits planes·dim source terms whose Janino compile costs
  * seconds per stage — dominant in a run-once query. This expression
  * generates a ~15-line nested loop: microsecond compile, tight primitive
  * execution, and it participates in whole-stage codegen.
  *
  * Quantization is [[Quantize1e6.roundLong]] — bit-identical to Spark's
  * `round()` (BigDecimal HALF_UP on the decimal rendering, i.e. exactly
  * `VectorFunctions.quantize1e6`); DuckDB's `round()` agrees except for
  * components within half-ulp of a .5·1e-6 boundary, unreachable for
  * hash-derived embeddings (see Quantize1e6's scaladoc for the analysis).
  * Returns null for a null or wrong-dimension input.
  */
case class SrpSignExpr(child: Expression, dim: Int, planes: Int,
    planeOffset: Int = 0)
    extends UnaryExpression {

  require(planes > 0 && planes <= 63, s"planes must be in [1, 63]: $planes")
  require(planeOffset >= 0, s"planeOffset must be >= 0: $planeOffset")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "srp_sign"

  // Derived, not a constructor field: keeps case-class equality (plan
  // canonicalization, subexpression elimination) on (child, dim, planes).
  @transient private lazy val weights: Array[Array[Long]] =
    graft.functions.VectorFunctions.srpWeightsAt(dim, planes, planeOffset)

  private def elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"srp_sign expects array<float|double>, got ${other.sql}")
  }

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    if (arr.numElements() != dim) return null
    val isFloat = elemType == FloatType
    val q = new Array[Long](dim)
    var i = 0
    while (i < dim) {
      val x = (if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)) * 1e6
      q(i) = Quantize1e6.roundLong(x)
      i += 1
    }
    var sig = 0L
    var p = 0
    while (p < planes) {
      val wp = weights(p)
      var dot = 0L
      i = 0
      while (i < dim) { dot += q(i) * wp(i); i += 1 }
      if (dot > 0L) sig |= (1L << p)
      p += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val w   = ctx.addReferenceObj("srpWeights", weights, "long[][]")
      val q   = ctx.freshName("q")
      val x   = ctx.freshName("x")
      val sig = ctx.freshName("sig")
      val dot = ctx.freshName("dot")
      val wp  = ctx.freshName("wp")
      val i   = ctx.freshName("i")
      val p   = ctx.freshName("p")
      val getX = CodeGenerator.getValue(a, elemType, i)
      s"""
        |if ($a.numElements() != $dim) {
        |  ${ev.isNull} = true;
        |} else {
        |  long[] $q = new long[$dim];
        |  for (int $i = 0; $i < $dim; $i++) {
        |    double $x = ((double) $getX) * 1.0E6;
        |    $q[$i] = graft.plans.Quantize1e6.roundLong($x);
        |  }
        |  long $sig = 0L;
        |  for (int $p = 0; $p < $planes; $p++) {
        |    long $dot = 0L;
        |    long[] $wp = $w[$p];
        |    for (int $i = 0; $i < $dim; $i++) $dot += $q[$i] * $wp[$i];
        |    if ($dot > 0L) $sig |= (1L << $p);
        |  }
        |  ${ev.value} = $sig;
        |}
      """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): SrpSignExpr =
    copy(child = c)
}

object SrpSignExpr {
  /** Column-API entry point: packed SRP signature of an embedding. Bit j
    * of the result is GLOBAL plane planeOffset+j — non-zero offsets let a
    * logical signature wider than 63 planes span several Longs. */
  def srp_sign(v: Column, dim: Int, planes: Int,
      planeOffset: Int = 0): Column =
    ColumnBridge.column(
      SrpSignExpr(ColumnBridge.expression(v), dim, planes, planeOffset))
}
