package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Integer squared-L2 distances from one embedding to EVERY IVF centroid,
  * as one fused codegen loop returning `array<long>` (index j = distance
  * to centroid j, in the caller's centroid order).
  *
  * The embedding quantizes once to round(x·1e6) longs
  * ([[Quantize1e6.roundLong]] — Spark `round()` semantics, matching
  * `VectorFunctions.quantize1e6` exactly; see Quantize1e6's scaladoc for
  * the DuckDB-parity envelope), then k centroid distances accumulate in a
  * tight nested loop — replacing the per-centroid
  * `aggregate(zip_with(...))` HOF folds (k·dim interpreted lambda steps
  * per row, CodegenFallback) that made [[graft.operators.IvfIndex]] cell
  * ranking the slow part of the round-3 bench. Null for a null input or a
  * dimension mismatch with the centroids.
  *
  * Centroids are a `Seq[Seq[Long]]` constructor field (not arrays) so
  * case-class equality — and with it plan canonicalization and
  * subexpression elimination — keeps working.
  */
case class IvfCellDistsExpr(child: Expression, cents: Seq[Seq[Long]])
    extends UnaryExpression {

  require(cents.nonEmpty, "IvfCellDistsExpr needs >= 1 centroid")
  require(cents.forall(_.length == cents.head.length),
    "all centroids must share one dimension")

  private val dim = cents.head.length

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "ivf_cell_dists"

  @transient private lazy val centArr: Array[Array[Long]] =
    cents.map(_.toArray).toArray

  private def elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ivf_cell_dists expects array<float|double>, got ${other.sql}")
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
    val out = new Array[Long](centArr.length)
    var j = 0
    while (j < centArr.length) {
      val c = centArr(j)
      var acc = 0L
      i = 0
      while (i < dim) { val d = q(i) - c(i); acc += d * d; i += 1 }
      out(j) = acc
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cs  = ctx.addReferenceObj("ivfCents", centArr, "long[][]")
      val q   = ctx.freshName("q")
      val x   = ctx.freshName("x")
      val out = ctx.freshName("out")
      val c   = ctx.freshName("c")
      val acc = ctx.freshName("acc")
      val d   = ctx.freshName("d")
      val i   = ctx.freshName("i")
      val j   = ctx.freshName("j")
      val k   = centArr.length
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
        |  long[] $out = new long[$k];
        |  for (int $j = 0; $j < $k; $j++) {
        |    long[] $c = $cs[$j];
        |    long $acc = 0L;
        |    for (int $i = 0; $i < $dim; $i++) {
        |      long $d = $q[$i] - $c[$i];
        |      $acc += $d * $d;
        |    }
        |    $out[$j] = $acc;
        |  }
        |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
        |}
      """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): IvfCellDistsExpr =
    copy(child = c)
}

object IvfCellDistsExpr {
  /** Column-API entry point: distances to every centroid, caller's order. */
  def ivf_cell_dists(v: Column, cents: Seq[Seq[Long]]): Column =
    ColumnBridge.column(IvfCellDistsExpr(ColumnBridge.expression(v), cents))
}

/** The argmin cell in ONE fused pass: `struct(dist, cent_id)` of the
  * nearest centroid (integer squared-L2, ties to the lower cent_id —
  * exactly the (dist, cent_id) struct ordering the ranking path sorts
  * by). Exists because composing it from [[IvfCellDistsExpr]] +
  * `element_at` + `array_min` is a performance trap: `element_at(dists,
  * j)` is an ExtractValue, which CollapseProject treats as cheap and
  * INLINES — the k extraction sites each receive a full copy of the
  * fused-distance tree, so every row computes the k×dim loop k times.
  * Measured at 10⁶ vectors × 64 cells × 64 dims: the composed form
  * burned ~23k CPU-seconds; this expression is one k×dim loop + a
  * running min per row. */
case class IvfCellArgminExpr(child: Expression, cents: Seq[Seq[Long]],
    ids: Seq[Long]) extends UnaryExpression {

  require(cents.nonEmpty, "IvfCellArgminExpr needs >= 1 centroid")
  require(cents.forall(_.length == cents.head.length),
    "all centroids must share one dimension")
  require(ids.length == cents.length,
    s"ids/cents length mismatch: ${ids.length} vs ${cents.length}")

  private val dim = cents.head.length

  override def dataType: DataType = StructType(Seq(
    StructField("dist", LongType, nullable = false),
    StructField("cent_id", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "ivf_cell_argmin"

  @transient private lazy val centArr: Array[Array[Long]] =
    cents.map(_.toArray).toArray
  @transient private lazy val idArr: Array[Long] = ids.toArray

  private def elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ivf_cell_argmin expects array<float|double>, got ${other.sql}")
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
    var bestD = Long.MaxValue
    var bestId = Long.MaxValue
    var j = 0
    while (j < centArr.length) {
      val c = centArr(j)
      var acc = 0L
      i = 0
      while (i < dim) { val d = q(i) - c(i); acc += d * d; i += 1 }
      val id = idArr(j)
      if (acc < bestD || (acc == bestD && id < bestId)) {
        bestD = acc; bestId = id
      }
      j += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bestD, bestId))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cs    = ctx.addReferenceObj("ivfCents", centArr, "long[][]")
      val cids  = ctx.addReferenceObj("ivfCentIds", idArr, "long[]")
      val q     = ctx.freshName("q")
      val x     = ctx.freshName("x")
      val c     = ctx.freshName("c")
      val acc   = ctx.freshName("acc")
      val d     = ctx.freshName("d")
      val i     = ctx.freshName("i")
      val j     = ctx.freshName("j")
      val bestD = ctx.freshName("bestD")
      val bestI = ctx.freshName("bestI")
      val id    = ctx.freshName("id")
      val k     = centArr.length
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
        |  long $bestD = Long.MAX_VALUE;
        |  long $bestI = Long.MAX_VALUE;
        |  for (int $j = 0; $j < $k; $j++) {
        |    long[] $c = $cs[$j];
        |    long $acc = 0L;
        |    for (int $i = 0; $i < $dim; $i++) {
        |      long $d = $q[$i] - $c[$i];
        |      $acc += $d * $d;
        |    }
        |    long $id = $cids[$j];
        |    if ($acc < $bestD || ($acc == $bestD && $id < $bestI)) {
        |      $bestD = $acc; $bestI = $id;
        |    }
        |  }
        |  ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(new Object[]{(Object) java.lang.Long.valueOf($bestD), (Object) java.lang.Long.valueOf($bestI)});
        |}
      """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): IvfCellArgminExpr =
    copy(child = c)
}

object IvfCellArgminExpr {
  /** Column-API entry point: the argmin (dist, cent_id) struct. */
  def ivf_cell_argmin(v: Column, cents: Seq[Seq[Long]],
      ids: Seq[Long]): Column =
    ColumnBridge.column(
      IvfCellArgminExpr(ColumnBridge.expression(v), cents, ids))
}
