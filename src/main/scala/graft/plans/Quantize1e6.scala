package graft.plans

/** The ONE quantization semantic shared by every integer-exact vector path
  * ([[SrpSignExpr]], [[IvfCellDistsExpr]],
  * [[graft.functions.VectorFunctions.quantize1e6]]): round(x·1e6) with
  * Spark `round()` semantics — java.math.BigDecimal HALF_UP applied to the
  * double's SHORTEST DECIMAL RENDERING (`BigDecimal.valueOf`), which is
  * what Spark's `Round` does for DoubleType.
  *
  * Plain half-away-from-zero on the binary double
  * (`floor(x+0.5)`/`ceil(x-0.5)`) disagrees with that for inputs within
  * ~half-ulp of a .5 boundary (the `0.49999999999999994` class: binary
  * value < .5 but `x+0.5` rounds to 1.0), which would silently flip an SRP
  * bit or IVF cell for such an embedding component. DuckDB's `round()`
  * (C++ `std::round`, half-away-from-zero on the binary value) can STILL
  * differ from both in the rarer case where the shortest rendering sits on
  * the other side of the boundary than the binary value — cross-engine
  * exactness therefore holds for inputs whose components are not within
  * half-ulp of a .5·1e-6 boundary (all hash-derived fixture embeddings:
  * components are k/1e6 by construction).
  *
  * The fast path is the two-flops form; the BigDecimal rendering runs only
  * when |x| lands within 1e-6 of a boundary (ulp at the 1e6 scale is
  * ~1e-10, so the guard over-covers by four orders of magnitude). NaN →
  * 0 and ±Inf → ±Long.MaxValue fall out of the fast path exactly as
  * Spark's `cast(round(x) as long)` would produce.
  */
object Quantize1e6 {
  def roundLong(x: Double): Long = {
    val f = (if (x < 0) math.ceil(x - 0.5) else math.floor(x + 0.5)).toLong
    if (math.abs(math.abs(x - f.toDouble) - 0.5) < 1e-6)
      java.math.BigDecimal.valueOf(x)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
    else f
  }
}
