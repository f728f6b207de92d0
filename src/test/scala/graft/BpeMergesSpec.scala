package graft

import org.apache.spark.sql.functions._

import graft.operators.BpeMerges

class BpeMergesSpec extends SparkTestBase {
  import spark.implicits._

  test("learn picks the most frequent pair, greedy-merges, and recounts") {
    // corpus: "aaab" ×3, "ab" ×2  →  symbols "a a a b", "a b"
    // iter1 pairs: (a,a)×2·3=6, (a,b)×3+2=5 → merge "a a"→"aa"
    //   greedy left-to-right on "a a a b": first "a a" merges, third 'a'
    //   survives → "aa a b" (NOT "aa aa"-style double-merge)
    // iter2 pairs on {"aa a b"×3, "a b"×2}: (aa,a)=3, (a,b)=5 → "ab"
    val words = Seq(("aaab", 3L), ("ab", 2L)).toDF("w", "freq")
    val m = BpeMerges.learn(words, iters = 2)
      .orderBy("iter").as[(Int, String, String, Long)].collect()
    assert(m(0) === ((1, "a a", "aa", 6L)))
    assert(m(1) === ((2, "a b", "ab", 5L)))
  }

  test("argmax tie-break is lexicographic on the pair") {
    // "xy" and "xz" both once: pairs (x,y)=1, (x,z)=1 → "x y" wins
    val words = Seq(("xy", 1L), ("xz", 1L)).toDF("w", "freq")
    val m = BpeMerges.learn(words, iters = 1)
      .as[(Int, String, String, Long)].collect()
    assert(m.head === ((1, "x y", "xy", 1L)))
  }

  test("single-character words contribute no pairs") {
    val words = Seq(("a", 100L), ("bc", 1L)).toDF("w", "freq")
    val m = BpeMerges.learn(words, iters = 1)
      .as[(Int, String, String, Long)].collect()
    assert(m.head === ((1, "b c", "bc", 1L)))
  }

  test("segment applies learned merges in order") {
    val seg = Seq("aaab", "ab", "ba", "a").toDF("w")
      .select(col("w"),
        BpeMerges.segment(col("w"), Seq("a a" -> "aa", "a b" -> "ab"))
          .as("sym"))
      .as[(String, String)].collect().toMap
    assert(seg("aaab") === "aa ab")   // "a a a b" → "aa a b" → "aa ab"
    assert(seg("ab") === "ab")
    assert(seg("ba") === "b a")      // no merge matches
    assert(seg("a") === "a")
  }

  test("learned merges reproduce the fixture corpus head") {
    val wf = Tables.documents(spark, sf0001)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))
    val m = BpeMerges.learn(wf, iters = 1)
      .as[(Int, String, String, Long)].collect()
    assert(m.length === 1 && m.head._4 > 0)
  }
}
