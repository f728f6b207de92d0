package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.TextFunctions

class TextFunctionsSpec extends SparkTestBase {

  /** Seeded property loop (the scalatestplus bridge is not on the offline
    * classpath, so we drive ScalaCheck's Gen directly). */
  private def forAllSeeded[A](gen: Gen[A], n: Int = 40)(body: A => Unit): Unit =
    (1 to n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(body)
    }
  import spark.implicits._

  private def chunksOf(text: String, size: Int, overlap: Int): Seq[String] =
    Seq(text).toDF("text")
      .select(TextFunctions.chunks(col("text"), size, overlap).as("c"))
      .as[Seq[String]].head()

  test("text shorter than one chunk yields exactly that text") {
    assert(chunksOf("hello", 120, 20) === Seq("hello"))
  }

  test("text of exactly chunk size yields one chunk") {
    val t = "x" * 120
    assert(chunksOf(t, 120, 20) === Seq(t))
  }

  test("one char over chunk size yields two chunks with the overlap") {
    val t = ("a" * 120) + "b"
    val cs = chunksOf(t, 120, 20)
    assert(cs.length === 2)
    assert(cs(0) === "a" * 120)
    // second chunk starts at step=100: 20 overlap chars + the extra 'b'
    assert(cs(1) === ("a" * 20) + "b")
  }

  test("chunk properties: size bound, coverage, exact interior overlap") {
    val texts = for {
      n <- Gen.choose(1, 700)
      s <- Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString)
    } yield s
    forAllSeeded(texts) { t =>
      val size = 120; val overlap = 20; val step = size - overlap
      val cs = chunksOf(t, size, overlap)
      assert(cs.forall(_.length <= size))
      // chunk i starts at i*step: concatenating chunk heads rebuilds text
      val rebuilt = cs.zipWithIndex.map { case (c, i) =>
        if (i == cs.length - 1) c else c.take(step)
      }.mkString
      assert(rebuilt === t)
      cs.sliding(2).foreach {
        case Seq(a, b) if a.length == size =>
          assert(a.takeRight(overlap) === b.take(overlap))
        case _ =>
      }
    }
  }

  test("jaccard: identical arrays = 1, disjoint = 0") {
    val df = Seq(("a b c", "a b c", "x y z")).toDF("t1", "t2", "t3")
    val r = df.select(
      TextFunctions.jaccard(split(col("t1"), " "), split(col("t2"), " ")),
      TextFunctions.jaccard(split(col("t1"), " "), split(col("t3"), " ")))
      .as[(Double, Double)].head()
    assert(r._1 === 1.0)
    assert(r._2 === 0.0)
  }

  test("minhash: identical text gives identical signature; length k") {
    val df = Seq("the quick brown fox jumps", "the quick brown fox jumps")
      .toDF("text")
      .select(TextFunctions.minhashSignature(
        TextFunctions.shingles(col("text"), 3), 12).as("sig"))
    val sigs = df.as[Seq[Long]].collect()
    assert(sigs(0) === sigs(1))
    assert(sigs(0).length === 12)
  }

  test("simhash of identical token hashes is equal; hamming(self)=0") {
    val df = Seq("spark scan join", "spark scan join").toDF("text")
      .select(TextFunctions.simhash32(
        transform(TextFunctions.tokens(col("text")),
          t => graft.functions.CrossHash.hash60(t))).as("s"))
    val ss = df.as[Long].collect()
    assert(ss(0) === ss(1))
    val h = Seq((ss(0), ss(1))).toDF("a", "b")
      .select(TextFunctions.hamming(col("a"), col("b"))).as[Long].head()
    assert(h === 0L)
  }

  test("bpe token count: alpha runs, digit runs, single punct") {
    val n = Seq("abc 123 a.b!").toDF("t")
      .select(TextFunctions.bpeTokenCount(col("t"))).as[Long].head()
    // abc | 123 | a | . | b | !
    assert(n === 6L)
  }

  test("stopword ratio and punct ratio on a known string") {
    val df = Seq("the cat is on. the mat!").toDF("text")
    val (s, p) = df.select(
      TextFunctions.stopwordRatio(col("text")),
      TextFunctions.punctRatio(col("text"))).as[(Double, Double)].head()
    // tokens: the cat is on. the mat!  → 6 tokens, stop = {the, is, the} = 3
    assert(s === 0.5)
    assert(math.abs(p - 2.0 / 23.0) < 1e-12)
  }
}
