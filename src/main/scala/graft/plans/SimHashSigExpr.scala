package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The whole 32-bit SimHash signature of a document as ONE fused codegen
  * expression — value-identical to the flat pipeline it replaces
  * ([[graft.operators.SimHash.signatures]]'s
  * `explode(split(text,' ')) → hash60 → 32 vote sums → bit assembly`,
  * pinned by SimHashSigSpec), computed per row with zero explode rows,
  * zero aggregation buffers, and zero exchange:
  *
  *  - tokens are byte-split on 0x20 over the UTF-8 bytes directly — a
  *    space byte can never occur inside a multibyte sequence, so the
  *    byte split equals `split(text, " ", -1)` including empty tokens
  *    (leading/trailing/consecutive separators), which the exploded
  *    form also hashed;
  *  - each token hashes through [[Md5Hash60Expr.hashRange]] (no
  *    per-token substring allocation);
  *  - 32 vote counters accumulate in a local int array; tie → bit 0,
  *    exactly the `when(v > 0, …)` rule.
  *
  * The flat form's per-superstep cost at corpus scale was one exchange
  * of partially-aggregated (doc_id, 32 sums) — small — but the explode
  * materialised one row per TOKEN through the hash aggregate (opt guide
  * §1.2 step 2: per-task work). Here the signature never leaves the row
  * it belongs to. Null text → null (the exploded form dropped those
  * docs; callers filter identically). */
case class SimHashSigExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_sig"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string child, got " +
        child.dataType.catalogString)

  override protected def nullSafeEval(input: Any): Any =
    SimHashSigExpr.signature(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.SimHashSigExpr.signature($c)")

  override protected def withNewChildInternal(
      newChild: Expression): SimHashSigExpr = copy(child = newChild)
}

object SimHashSigExpr {
  def signature(s: UTF8String): Long = {
    val bytes = s.getBytes
    val votes = new Array[Int](32)
    var start = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' '.toByte) {
        val h = Md5Hash60Expr.hashRange(bytes, start, i - start)
        var b = 0
        while (b < 32) {
          if (((h >> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
        start = i + 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 32) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}
