package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns.
  *
  * The reference delegates cosine similarity to Pinecone
  * (parser_pinecone_storage.py:31 `metric="cosine"`; ra/agent.py:115-119
  * `index.query(vector, top_k=100)`). Here it is a native column expression:
  * the hot path uses the codegen'd Catalyst expression
  * [[graft.plans.CosineSimExpr]]; the compositional fallback uses Spark's
  * higher-order functions (also codegen'd, but allocates intermediates).
  *
  * All arithmetic is double-precision with strictly sequential
  * accumulation so DuckDB (`list_cosine_similarity`, or an explicit
  * list_sum form) reproduces the value bit-for-bit; queries additionally
  * round similarities before emitting them (SURVEY.md §7.4).
  */
object VectorFunctions {

  /** Dot product via higher-order functions: sequential left-to-right fold. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  /** Squared L2 norm, sequential fold. */
  def norm2Hof(a: Column): Column = dotHof(a, a)

  /** Cosine similarity via HOFs; null when either norm is zero. */
  def cosineHof(a: Column, b: Column): Column = {
    val dot = dotHof(a, b)
    val na  = sqrt(norm2Hof(a))
    val nb  = sqrt(norm2Hof(b))
    when(na === 0.0 || nb === 0.0, lit(null).cast("double"))
      .otherwise(dot / (na * nb))
  }

  /** Cosine similarity — codegen'd single-pass Catalyst expression
    * (one loop, no intermediate arrays). Preferred in query plans. */
  def cosine(a: Column, b: Column): Column =
    graft.plans.CosineSimExpr.cosine_sim(a, b)

  /** Pseudo-random hyperplane weights for signed random projection,
    * derived from md5 so DuckDB can regenerate the identical planes.
    * INTEGER weights: w(p, i) = hash60("srp#p#i") % 2000001 − 1000000
    * ∈ [−1e6, 1e6] — the plane is the same direction as the real-valued
    * w/1e6 form, but integer arithmetic makes the projection sign exact. */
  def srpWeights(dim: Int, planes: Int): Array[Array[Long]] =
    srpWeightsAt(dim, planes, 0)

  /** [[srpWeights]] for GLOBAL plane indices [offset, offset+planes) —
    * lets one logical signature wider than 63 bits span several Longs
    * (d20's 8-band layout packs planes 0-59 and 60-119 into two), each
    * Long's bit j holding plane offset+j. */
  def srpWeightsAt(dim: Int, planes: Int,
      offset: Int): Array[Array[Long]] =
    Array.tabulate(planes) { p =>
      Array.tabulate(dim) { i =>
        CrossHash.md5Hash60(s"srp#${offset + p}#$i") % 2000001L - 1000000L
      }
    }

  /** round(x·1e6) integer quantization — the shared cross-engine step that
    * makes SRP projections and IVF cell distances exact integer sums
    * (DuckDB: `cast(round(cast(x as double) * 1000000.0) as bigint)`). */
  def quantize1e6(v: Column): Column =
    transform(v, x => round(x.cast("double") * 1e6).cast("long"))

  /** Symmetric INT8 quantization of an embedding — the 4× storage
    * compression an index at 100 TB wants (float32 dim → one byte).
    * q8_i = round(q_i · 127 / s), half-away-from-zero, where q =
    * [[quantize1e6]](v) and s = max|q_i| (zero vector → all zeros).
    *
    * Computed ENTIRELY in integer arithmetic over the parity-proven 1e6
    * quantization: the rounded division is floor((254·|q_i| + s) / 2s)
    * with both operands exact in double (≤ ~2^35, far under 2^53), so
    * the floor(quotient) is bit-identical in Spark and DuckDB — no
    * float-rounding divergence can flip a quantized value. Cosine over
    * the int8 values (cast to double) is a sum of integer products
    * (≤ 127²·dim — exact, order-independent), making quantized
    * similarity fully oracle-checkable. */
  def quantizeInt8(v: Column): Column =
    TextFunctions.bound(quantize1e6(v)) { q =>
      TextFunctions.bound(
        greatest(array_max(transform(q, x => abs(x))), lit(1L))) { s =>
        transform(q, x =>
          (when(x < 0, lit(-1L)).otherwise(lit(1L))) *
            floor((abs(x) * lit(254L) + s).cast("double") /
              (s * lit(2L)).cast("double")).cast("long"))
      }
    }

  /** DuckDB expression fragment reproducing [[quantizeInt8]] bit-for-bit
    * over an embedding list column reference. */
  def duckQuantizeInt8(emb: String): String = {
    val q = s"list_transform($emb, x -> cast(round(cast(x as double) * 1000000.0) as bigint))"
    s"""list_transform($q,
       |  x -> (CASE WHEN x < 0 THEN -1 ELSE 1 END)
       |    * cast(floor((abs(x) * 254 + greatest(list_max(list_transform($q, y -> abs(y))), 1))
       |        / (greatest(list_max(list_transform($q, y -> abs(y))), 1) * 2)) as bigint))""".stripMargin
  }

  /** Signed-random-projection signature: bit p of the result is 1 iff
    * dot(quantize(v), plane_p) > 0, packed into a BIGINT. Vectors that
    * collide on the signature are near-neighbour candidates: this buckets
    * an O(n²) similarity self-join into per-bucket joins, the scale path
    * for approximate nearest-neighbour search.
    *
    * The embedding is quantized to round(x·1e6) BIGINTs first, so every
    * dot product is an exact integer sum — associative, hence identical
    * across partitionings AND across engines regardless of summation
    * order (a float fold could flip a near-zero projection's sign between
    * Spark's sequential fold and DuckDB's aggregate). |terms| ≤ 64·1e12,
    * well inside BIGINT.
    *
    * Implemented as the fused-loop Catalyst expression
    * [[graft.plans.SrpSignExpr]]: the HOF form (`aggregate(zip_with)` per
    * plane) is CodegenFallback — planes·dim interpreted lambda steps per
    * row, the round-3 bench regression — and a flat `element_at ×
    * literal` expansion, while codegen'd, costs seconds of Janino compile
    * per stage at planes·dim source terms. The expression generates a
    * ~15-line loop instead: microsecond compile, whole-stage codegen,
    * identical integer results. */
  def srpSignature(v: Column, dim: Int, planes: Int): Column =
    graft.plans.SrpSignExpr.srp_sign(v, dim, planes)

  /** [[srpSignature]] over GLOBAL planes [offset, offset+planes) — bit j
    * of the result is plane offset+j (see [[srpWeightsAt]]). */
  def srpSignatureAt(v: Column, dim: Int, planes: Int,
      offset: Int): Column =
    graft.plans.SrpSignExpr.srp_sign(v, dim, planes, offset)

  /** Reference HOF formulation of [[srpSignature]] (interpreted lambdas;
    * kept for the equivalence spec that pins the flat rewrite). */
  def srpSignatureHof(v: Column, dim: Int, planes: Int): Column = {
    val w = srpWeights(dim, planes)
    TextFunctions.bound(quantize1e6(v)) { q =>
      (0 until planes).map { p =>
        val plane = array(w(p).map(x => lit(x)): _*)
        val dot = aggregate(
          zip_with(q, plane, (a, b) => a * b), lit(0L), (acc, x) => acc + x)
        when(dot > 0L, lit(1L << p)).otherwise(lit(0L))
      }.reduce(_ + _)
    }
  }

  /** DuckDB CTE fragment regenerating [[srpSignature]] bit-for-bit:
    * yields tables `{prefix}w`, `{prefix}pd`, `{prefix}sigs(vec_id, sig)`
    * over the `embeddings` table. Integer-exact (quantized embeddings ×
    * hash-derived integer weights), so the bucketing is oracle-checkable. */
  def duckSrpSigCtes(dim: Int, planes: Int, prefix: String = "",
      offset: Int = 0): String = {
    val h = CrossHash.duckHash60(
      "'srp#' || cast(p.range as varchar) || '#' || cast(i.range as varchar)")
    s"""${prefix}w AS (SELECT p.range AS p, i.range AS i,
       |  ($h % 2000001) - 1000000 AS wt
       |  FROM range($offset, ${offset + planes}) p, range(0, $dim) i),
       |${prefix}pd AS (SELECT e.vec_id, w.p,
       |    sum(cast(round(cast(e.embedding[w.i + 1] as double) * 1000000.0) as bigint) * w.wt) AS dot
       |  FROM embeddings e, ${prefix}w w GROUP BY 1, 2),
       |${prefix}sigs AS (SELECT vec_id, cast(sum(CASE WHEN dot > 0 THEN 1 << (p - $offset) ELSE 0 END) as bigint) AS sig
       |  FROM ${prefix}pd GROUP BY 1)""".stripMargin
  }
}
