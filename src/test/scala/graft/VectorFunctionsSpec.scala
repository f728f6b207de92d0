package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.plans.CosineSimExpr

class VectorFunctionsSpec extends SparkTestBase {
  import spark.implicits._

  private def cos(a: Seq[Double], b: Seq[Double]): Option[Double] =
    Seq((a, b)).toDF("a", "b")
      .select(VectorFunctions.cosine(col("a"), col("b")).as("c"))
      .as[Option[Double]].head()

  test("cosine of a vector with itself is 1") {
    assert(math.abs(cos(Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0, 3.0)).get - 1.0) < 1e-12)
  }

  test("cosine of orthogonal vectors is 0") {
    assert(cos(Seq(1.0, 0.0), Seq(0.0, 1.0)).get === 0.0)
  }

  test("cosine of opposite vectors is -1") {
    assert(math.abs(cos(Seq(1.0, 2.0), Seq(-1.0, -2.0)).get + 1.0) < 1e-12)
  }

  test("zero-norm input gives null, not NaN") {
    assert(cos(Seq(0.0, 0.0), Seq(1.0, 2.0)).isEmpty)
  }

  test("cosine is symmetric") {
    val a = Seq(0.3, -1.2, 4.5, 0.01)
    val b = Seq(-2.0, 0.7, 1.1, 3.3)
    assert(cos(a, b) === cos(b, a))
  }

  test("codegen expression agrees with the HOF formulation on real data") {
    val e = Tables.embeddings(spark, sf0001).limit(200)
    val q = Tables.embeddings(spark, sf0001)
      .filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val both = e.crossJoin(broadcast(q)).select(
      VectorFunctions.cosine(col("embedding"), col("qv")).as("expr"),
      VectorFunctions.cosineHof(col("embedding"), col("qv")).as("hof"))
    val mismatches = both
      .filter(abs(col("expr") - col("hof")) > 1e-12).count()
    assert(mismatches === 0L)
  }

  test("cosine_sim is registered for SQL via GraftExtensions") {
    val r = spark.sql(
      "SELECT cosine_sim(array(1.0D, 2.0D), array(2.0D, 4.0D)) AS c")
      .as[Double].head()
    assert(math.abs(r - 1.0) < 1e-12)
  }

  test("srp_sign is registered for SQL and equals the Column API") {
    Tables.embeddings(spark, sf0001).limit(20)
      .createOrReplaceTempView("vfs_emb")
    val viaSql = spark.sql(
      "SELECT vec_id, srp_sign(embedding, 64, 16) AS sig FROM vfs_emb")
      .orderBy("vec_id").select("sig").as[Long].collect()
    val viaCol = Tables.embeddings(spark, sf0001).limit(20)
      .select(col("vec_id"),
        graft.plans.SrpSignExpr.srp_sign(col("embedding"), 64, 16).as("sig"))
      .orderBy("vec_id").select("sig").as[Long].collect()
    assert(viaSql.toSeq === viaCol.toSeq)
    val err = intercept[Exception] {
      spark.sql("SELECT srp_sign(embedding, 64, vec_id) FROM vfs_emb")
        .collect()
    }
    assert(err.getMessage.contains("planes"))
  }

  test("srpSignatureAt composes wide signatures from plane slices") {
    val e = Tables.embeddings(spark, sf0001).limit(100)
    // zero offset IS srpSignature
    val z = e.select(
      (VectorFunctions.srpSignature(col("embedding"), 64, 16) ===
        VectorFunctions.srpSignatureAt(col("embedding"), 64, 16, 0))
        .as("eq")).filter(!col("eq")).count()
    assert(z === 0L)
    // bit j at offset k is GLOBAL plane k+j: the offset-10 5-plane slice
    // must equal bits [10, 15) of the flat 16-plane signature
    val m = e.select(
      (VectorFunctions.srpSignatureAt(col("embedding"), 64, 5, 10) ===
        shiftright(VectorFunctions.srpSignature(col("embedding"), 64, 16),
          10).bitwiseAND(lit(31L))).as("eq"))
      .filter(!col("eq")).count()
    assert(m === 0L)
  }

  test("mismatched array types are rejected at analysis time") {
    val err = intercept[Exception] {
      Seq(("x", Seq(1.0))).toDF("s", "v")
        .select(CosineSimExpr.cosine_sim(col("s"), col("v"))).collect()
    }
    assert(err.getMessage.toLowerCase.contains("cosine_sim"))
  }

  test("srp signature lands in [0, 2^planes) and is deterministic") {
    val sigs = Tables.embeddings(spark, sf0001).limit(50)
      .select(VectorFunctions.srpSignature(col("embedding"), 64, 4).as("s"))
      .as[Long].collect()
    assert(sigs.forall(s => s >= 0 && s < 16))
    val again = Tables.embeddings(spark, sf0001).limit(50)
      .select(VectorFunctions.srpSignature(col("embedding"), 64, 4).as("s"))
      .as[Long].collect()
    assert(sigs.toSeq === again.toSeq)
  }

  test("flat srp signature equals the HOF reference formulation") {
    val e = Tables.embeddings(spark, sf0001)
    val mismatches = e.select(
      VectorFunctions.srpSignature(col("embedding"), 64, 8).as("flat"),
      VectorFunctions.srpSignatureHof(col("embedding"), 64, 8).as("hof"))
      .filter(col("flat") =!= col("hof")).count()
    assert(mismatches === 0L)
  }

  test("Quantize1e6.roundLong is bit-identical to Spark round() on boundary doubles") {
    // the half-away-from-zero-on-binary trap cases: shortest decimal
    // rendering and binary value straddle a .5 boundary
    val xs = Seq(0.49999999999999994, -0.49999999999999994,
      1.4999999999999998, -1.4999999999999998, 2.5, -2.5, 0.5, -0.5,
      1e6 + 0.5, -(1e6 + 0.5), 3.4999999999999996, 0.0, 7.25, -123456.5)
    val sparkRound = xs.toDF("x")
      .select(round(col("x")).cast("long").as("r")).as[Long].collect().toSeq
    val ours = xs.map(graft.plans.Quantize1e6.roundLong)
    assert(ours === sparkRound)
  }

  test("srp signature matches HOF on embeddings crafted near .5 quantization boundaries") {
    // components put v*1e6 within half-ulp of a .5 boundary, where the
    // old binary-value rounding disagreed with quantize1e6 (Spark round)
    val tricky = Seq(
      Array.tabulate(64)(i => (i - 32 + 0.49999999999999994) / 1e6),
      Array.tabulate(64)(i => (i + 0.5) / 1e6),
      Array.tabulate(64)(i => -(i + 1.4999999999999998) / 1e6))
      .map(_.toSeq)
    val df = tricky.toDF("embedding")
    val mismatches = df.select(
      VectorFunctions.srpSignature(col("embedding"), 64, 8).as("flat"),
      VectorFunctions.srpSignatureHof(col("embedding"), 64, 8).as("hof"))
      .filter(col("flat") =!= col("hof")).count()
    assert(mismatches === 0L)
  }

  test("srp weights are reproducible from the seeded hash") {
    val w = VectorFunctions.srpWeights(4, 2)
    assert(w.length === 2 && w(0).length === 4)
    assert(w.flatten.forall(x => x >= -1000000L && x <= 1000000L))
    assert(w(0)(0) ===
      graft.functions.CrossHash.md5Hash60("srp#0#0") % 2000001L - 1000000L)
  }

  test("int8 quantization: known values, bounds, zero vector") {
    def q8(v: Seq[Double]): Seq[Long] =
      Seq(Tuple1(v)).toDF("v")
        .select(VectorFunctions.quantizeInt8(col("v")).as("q"))
        .as[Seq[Long]].head()
    // s = 1e6; 127·0.5 = 63.5 rounds half-away to 64; 127·0.25 = 31.75 → 32
    assert(q8(Seq(1.0, -0.5, 0.25)) === Seq(127L, -64L, 32L))
    assert(q8(Seq(0.0, 0.0)) === Seq(0L, 0L))
    val real = Tables.embeddings(spark, sf0001)
      .select(explode(VectorFunctions.quantizeInt8(col("embedding"))).as("x"))
      .agg(min("x"), max("x")).as[(Long, Long)].head()
    assert(real._1 >= -127L && real._2 <= 127L)
  }

  test("int8 cosine tracks float cosine on real data") {
    val e = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding"),
        VectorFunctions.quantizeInt8(col("embedding"))
          .cast("array<double>").as("q8"))
    val q = e.filter(col("vec_id") === 0)
      .select(col("embedding").as("qv"), col("q8").as("qq8"))
    val maxErr = e.crossJoin(broadcast(q))
      .select(abs(
        VectorFunctions.cosine(col("embedding"), col("qv")) -
          VectorFunctions.cosine(col("q8"), col("qq8"))).as("err"))
      .agg(max("err")).as[Double].head()
    assert(maxErr < 0.02, s"int8 cosine error too large: $maxErr")
  }

  test("all similarities on real data lie in [-1, 1]") {
    val e = Tables.embeddings(spark, sf0001)
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val out = e.crossJoin(broadcast(q))
      .select(VectorFunctions.cosine(col("embedding"), col("qv")).as("c"))
      .filter(col("c") < -1.0000001 || col("c") > 1.0000001)
    assert(out.count() === 0)
  }

  test("top-k is a prefix of top-(k+1)") {
    def ids(k: Int): Seq[Long] =
      Api.ragSearch(spark, sf0001, "spark window join", k = k)
        .select("vec_id").as[Long].collect().toSeq
    assert(ids(6).take(5) === ids(5))
  }

  test("mismatched-dimension inputs give null, not a prefix cosine") {
    val r = Seq((Seq(1.0), Seq(1.0, 9.9))).toDF("a", "b")
      .select(VectorFunctions.cosine(col("a"), col("b")).as("c"))
      .as[Option[Double]].head()
    assert(r.isEmpty)
  }
}
