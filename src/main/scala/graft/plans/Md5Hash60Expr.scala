package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** The engine's cross-engine 60-bit hash
  * (`conv(substring(md5(x), 2, 15), 16, 10) :: bigint`,
  * [[graft.functions.CrossHash]]) as ONE fused codegen expression.
  *
  * Value-identical by construction: hex digits 2..16 of the MD5 digest
  * are the low nibble of byte 0 followed by bytes 1..7, so the parsed
  * 15-hex-digit integer is exactly
  * `(b0 & 0xf) << 56 | b1 << 48 | … | b7` — computed here straight from
  * the digest bytes. The compositional form materialises a 32-char hex
  * string per row, substrings it, has `conv` parse it into a DECIMAL
  * STRING and `cast` parse that back to a long: four allocations and two
  * number-parses per hashed value. The sketch family hashes millions of
  * shingles/k-grams/tokens per document batch (12 seeded MinHash
  * permutations per shingle, one hash per winnowing k-gram), so the
  * per-value constant is a first-order operator cost (opt guide §1.2
  * step 2: per-task work, after the job shape is right).
  *
  * Digest objects are thread-local (one `MessageDigest` per task thread,
  * reset by `digest()` itself) — never per row. */
case class Md5Hash60Expr(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "md5_hash60"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a binary child (callers cast strings), got " +
        child.dataType.catalogString)

  override protected def nullSafeEval(input: Any): Any =
    Md5Hash60Expr.hash(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.Md5Hash60Expr.hash($c)")

  override protected def withNewChildInternal(
      newChild: Expression): Md5Hash60Expr = copy(child = newChild)
}

object Md5Hash60Expr {
  private val mds =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  /** 60-bit value of MD5-hex digits 2..16 (1-based), from digest bytes. */
  def hash(bytes: Array[Byte]): Long = hashRange(bytes, 0, bytes.length)

  /** [[hash]] over a byte range — the per-token form the fused sketch
    * expressions loop with (no per-token array slicing). */
  def hashRange(bytes: Array[Byte], off: Int, len: Int): Long = {
    val md = mds.get()
    md.reset()
    md.update(bytes, off, len)
    val d = md.digest()
    ((d(0) & 0x0fL) << 56) |
      ((d(1) & 0xffL) << 48) | ((d(2) & 0xffL) << 40) |
      ((d(3) & 0xffL) << 32) | ((d(4) & 0xffL) << 24) |
      ((d(5) & 0xffL) << 16) | ((d(6) & 0xffL) << 8) |
      (d(7) & 0xffL)
  }
}
