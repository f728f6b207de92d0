package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused per-row text-sketch hash arrays — the [[SimHashSigExpr]] /
  * [[MinHashSigExpr]] treatment applied to the remaining two
  * HOF-lambda pipelines, whose per-element lambdas evaluate INTERPRETED
  * (Spark's higher-order functions are CodegenFallback) over millions
  * of grams per corpus pass:
  *
  *  - [[ShingleHashesExpr]]: hash60 of every word n-gram shingle
  *    (`explode(shingles(text, n)) → hash60` with fewer-than-n tokens →
  *    the whole text), one array per document. A shingle's bytes are
  *    the CONTIGUOUS byte range from its first token's start to its
  *    last token's end — the single-space separators are the original
  *    bytes — so each hash streams straight off the document's UTF-8
  *    bytes with no per-shingle string allocation.
  *  - [[WinnowPrintsExpr]]: the value-deduped winnowing fingerprint set
  *    (Schleimer et al.) — hash every character k-gram (code-point
  *    offsets resolved in one byte scan), slide the w-hash window with
  *    the same end-clamping as the array form, keep window minima,
  *    dedupe. Replaces `transform(sequence…, hash60(substr)) →
  *    least(element_at…) → array_distinct`.
  *
  * Null text → null (explode of a null array drops the document, the
  * exact behavior of the HOF forms). Value parity is spec-pinned
  * against the replaced pipelines over adversarial inputs. */
case class ShingleHashesExpr(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && n > 0) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string child and n > 0")

  override protected def nullSafeEval(input: Any): Any =
    ShingleHashesExpr.hashes(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.ShingleHashesExpr.hashes($c, $n)")

  override protected def withNewChildInternal(
      newChild: Expression): ShingleHashesExpr = copy(child = newChild)
}

object ShingleHashesExpr {
  def hashes(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    var nTok = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == ' '.toByte) nTok += 1; i += 1 }
    if (nTok < n)
      return new GenericArrayData(
        Array(Md5Hash60Expr.hashRange(bytes, 0, bytes.length)))
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
    val out = new Array[Long](nTok - n + 1)
    var g = 0
    while (g <= nTok - n) {
      out(g) = Md5Hash60Expr.hashRange(bytes, starts(g),
        ends(g + n - 1) - starts(g))
      g += 1
    }
    new GenericArrayData(out)
  }
}

/** MD5 digests of every non-overlapping `n`-token block (the
  * [[graft.functions.TextFunctions.blocks]] span unit, trailing partial
  * block kept) as one fused array per document — digest BYTES, not the
  * 32-char hex strings the `md5(blk)` column form shuffled: same md5,
  * same grouping, half the shuffle payload, and no interpreted HOF
  * block construction. See [[ShingleHashesExpr]]'s scaladoc. */
case class BlockMd5Expr(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.BinaryType, containsNull = false)
  override def prettyName: String = "block_md5"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && n > 0) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string child and n > 0")

  override protected def nullSafeEval(input: Any): Any =
    BlockMd5Expr.digests(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.BlockMd5Expr.digests($c, $n)")

  override protected def withNewChildInternal(
      newChild: Expression): BlockMd5Expr = copy(child = newChild)
}

object BlockMd5Expr {
  private val mds =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  def digests(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
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
    val nBlocks = (nTok - 1) / n + 1
    val out = new Array[AnyRef](nBlocks)
    val md = mds.get()
    var b = 0
    while (b < nBlocks) {
      // block b = tokens [b·n, min(b·n + n, nTok)) joined by single
      // spaces — the contiguous original byte range between them
      val from = starts(b * n)
      val to = ends(math.min(b * n + n, nTok) - 1)
      md.reset()
      md.update(bytes, from, to - from)
      out(b) = md.digest()
      b += 1
    }
    new GenericArrayData(out)
  }
}

/** See [[ShingleHashesExpr]]'s scaladoc. */
case class WinnowPrintsExpr(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_prints"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && k > 0 && w > 0)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string child and k, w > 0")

  override protected def nullSafeEval(input: Any): Any =
    WinnowPrintsExpr.prints(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.WinnowPrintsExpr.prints($c, $k, $w)")

  override protected def withNewChildInternal(
      newChild: Expression): WinnowPrintsExpr = copy(child = newChild)
}

object WinnowPrintsExpr {
  def prints(s: UTF8String, k: Int, w: Int): ArrayData = {
    val bytes = s.getBytes
    // code-point byte offsets in one scan (UTF-8 continuation bytes are
    // 10xxxxxx) — substr counts code points, so gram i spans code
    // points [i, i+k), clamped to the end like `substr(i, k)`
    var cps = 0
    var i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0xc0) != 0x80) cps += 1
      i += 1
    }
    val offs = new Array[Int](cps + 1)
    var c = 0
    i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0xc0) != 0x80) { offs(c) = i; c += 1 }
      i += 1
    }
    offs(cps) = bytes.length
    val nh = math.max(cps - (k - 1), 1)
    val hs = new Array[Long](nh)
    var g = 0
    while (g < nh) {
      val from = offs(math.min(g, cps))
      val to = offs(math.min(g + k, cps))
      hs(g) = Md5Hash60Expr.hashRange(bytes, from, to - from)
      g += 1
    }
    val nw = math.max(nh - (w - 1), 1)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var j = 0
    while (j < nw) {
      var m = java.lang.Long.MAX_VALUE
      var o = 0
      while (o < w) {
        // clamped window read — a truncated window re-reads its last
        // element, min unaffected (the array form's least(element_at
        // (h, least(j+o, size)))) semantics)
        val idx = math.min(j + o, nh - 1)
        if (hs(idx) < m) m = hs(idx)
        o += 1
      }
      seen.add(m)
      j += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var x = 0
    while (it.hasNext) { out(x) = it.next(); x += 1 }
    new GenericArrayData(out)
  }
}
