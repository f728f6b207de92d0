package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** A document's whole k-element MinHash signature as ONE fused codegen
  * expression — value-identical to the flat pipeline it replaces
  * ([[graft.operators.MinHashLSH.signatures]]'s `explode(shingles) →
  * hash60 % P → k affine min-aggregates`, pinned by MinHashSigSpec),
  * computed per row with no explode rows, no k-buffer hash aggregate,
  * and no exchange:
  *
  *  - word 3-gram shingles come straight off the UTF-8 bytes (byte
  *    split on 0x20 equals `split(text, " ", -1)` — a space byte never
  *    occurs inside a multibyte sequence; fewer than 3 tokens → the
  *    whole text, exactly [[graft.functions.TextFunctions.shingles]]);
  *  - each shingle's digest streams through the MessageDigest as
  *    token-bytes + 0x20 + token-bytes + … — byte-identical to hashing
  *    the concatenated shingle string, with no per-shingle String or
  *    substring allocation;
  *  - the classic affine family h_j = (h·a_j + b_j) mod p folds into k
  *    running minima in a local long array (h < 2³¹, a_j < 2³¹ — the
  *    product stays far from Long overflow, same as the column form).
  *
  * Null text → null; callers filter, matching the exploded form's
  * dropped-document behavior. */
case class MinHashSigExpr(child: Expression, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && k > 0) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string child and k > 0, got " +
        s"${child.dataType.catalogString} / k=$k")

  override protected def nullSafeEval(input: Any): Any =
    MinHashSigExpr.signature(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.MinHashSigExpr.signature($c, $k)")

  override protected def withNewChildInternal(
      newChild: Expression): MinHashSigExpr = copy(child = newChild)
}

object MinHashSigExpr {
  private val P = 2147483647L // 2^31 − 1, MinHashLSH.P
  private val N = 3 // word n-gram width (TextFunctions.shingles(_, 3))

  // the affine hash family's coefficients, precomputed once per k
  private val coefCache =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]
  private def coefs(k: Int): (Array[Long], Array[Long]) =
    coefCache.computeIfAbsent(k, { kk =>
      (Array.tabulate(kk)(graft.operators.MinHashLSH.aCoef),
        Array.tabulate(kk)(graft.operators.MinHashLSH.bCoef))
    })

  def signature(s: UTF8String, k: Int): ArrayData = {
    val (as, bs) = coefs(k)
    val mins = Array.fill(k)(Long.MaxValue)
    val bytes = s.getBytes
    // token boundaries: starts(i) .. ends(i) over the byte array
    var nTok = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == ' '.toByte) nTok += 1; i += 1 }
    val starts = new Array[Int](nTok)
    val ends = new Array[Int](nTok)
    var t = 0
    var start = 0
    i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' '.toByte) {
        starts(t) = start; ends(t) = i; t += 1; start = i + 1
      }
      i += 1
    }
    def fold(h60: Long): Unit = {
      val h = h60 % P
      var j = 0
      while (j < k) {
        val v = (h * as(j) + bs(j)) % P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
    }
    if (nTok < N) {
      // fewer than N tokens: the whole text is the single shingle
      fold(Md5Hash60Expr.hashRange(bytes, 0, bytes.length))
    } else {
      var g = 0
      while (g <= nTok - N) {
        // shingle g spans tokens g..g+N-1 joined by single spaces —
        // which is exactly the contiguous byte range between the first
        // token's start and the last token's end (the separators ARE
        // single spaces in the original bytes)
        fold(Md5Hash60Expr.hashRange(bytes, starts(g),
          ends(g + N - 1) - starts(g)))
        g += 1
      }
    }
    new GenericArrayData(mins)
  }
}
