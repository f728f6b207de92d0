package graft

import org.apache.spark.sql.functions._

class DedupSpec extends SparkTestBase {
  import spark.implicits._

  test("exact dedup marks later copies as dups, first id canonical") {
    // Build a corpus with a known duplicate via the query on a temp view…
    // d01 runs on the documents fixture; here we check the semantics
    // directly on a controlled frame using the same construction.
    val df = Seq((1L, "aaa"), (2L, "bbb"), (3L, "aaa")).toDF("doc_id", "text")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("h")
    val out = df.select(col("doc_id"), md5(col("text")).as("h"))
      .withColumn("canonical_id", min(col("doc_id")).over(w))
      .select(col("doc_id"), col("canonical_id"),
        (col("doc_id") =!= col("canonical_id")).as("is_dup"))
      .orderBy("doc_id")
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(out === Seq((1L, 1L, false), (2L, 2L, false), (3L, 1L, true)))
  }

  test("minhash LSH finds a planted near-duplicate pair") {
    val base = "the quick brown fox jumps over the lazy dog and then " +
      "runs far away into the deep dark forest tonight"
    val nearDup = base.replace("tonight", "today")
    val other = "completely different words about spark shuffle " +
      "partitions and broadcast joins at massive scale"
    val docs = Seq((1L, base), (2L, nearDup), (3L, other))
      .toDF("doc_id", "text")
    val cand = graft.operators.MinHashLSH.candidatePairs(docs, 4, 3)
      .as[(Long, Long)].collect().toSet
    assert(cand.contains((1L, 2L)))
    assert(!cand.contains((1L, 3L)))
    val dups = graft.operators.MinHashLSH.nearDuplicates(docs)
      .as[(Long, Long, Double)].collect()
    assert(dups.exists { case (a, b, j) => a == 1L && b == 2L && j > 0.5 })
  }

  test("ngram jaccard finds planted near-dups exactly, caps stop-shingles") {
    val base = "the quick brown fox jumps over the lazy dog and then " +
      "runs far away into the deep dark forest tonight"
    val nearDup = base.replace("tonight", "today")
    val other = "completely different words about spark shuffle " +
      "partitions and broadcast joins at massive scale"
    val docs = Seq((1L, base), (2L, nearDup), (3L, other), (4L, base))
      .toDF("doc_id", "text")
    val dups = graft.operators.NgramJaccard.nearDuplicates(docs)
      .as[(Long, Long, Double)].collect().toSeq
    // identical docs 1 and 4 score exactly 1.0; the near-dup pair scores
    // the true Jaccard (17-shingle docs differing in the last 3 shingles)
    assert(dups.exists { case (a, b, j) => a == 1L && b == 4L && j == 1.0 })
    assert(dups.exists { case (a, b, j) => a == 1L && b == 2L && j > 0.6 })
    assert(!dups.exists { case (a, b, _) => a == 3L || b == 3L })

    // a shingle shared by EVERY doc is a stop-shingle under maxDf and
    // pairs nothing by itself
    val boiler = (1L to 6L).map(i => (i, s"standard header line distinct$i"))
      .toDF("doc_id", "text")
    val cand = graft.operators.NgramJaccard
      .candidatePairs(boiler, n = 3, maxDf = 5)
      .as[(Long, Long)].collect()
    assert(cand.isEmpty, s"stop-shingle produced candidates: ${cand.toSeq}")
  }

  test("dup clusters: min-label propagation crosses chains, keeps singletons") {
    // path 1-2-3-4-5 (diameter 4, needs >1 round), pair {8,9}, singleton 7;
    // edge direction deliberately mixed — propagation must be symmetric
    val pairs = Seq((2L, 1L), (2L, 3L), (4L, 3L), (4L, 5L), (9L, 8L))
      .toDF("a_id", "b_id")
    val verts = (1L to 9L).toDF("id")
    val out = graft.operators.DupClusters.assign(verts, pairs)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(out === Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      6L -> 6L, 7L -> 7L, 8L -> 8L, 9L -> 8L))
  }

  test("dup clusters fail loudly when the iteration bound is too low") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
      .toDF("a_id", "b_id")
    val verts = (1L to 6L).toDF("id")
    val err = intercept[IllegalArgumentException] {
      graft.operators.DupClusters.assign(verts, pairs, maxIters = 1,
        driverEdgeLimit = 0L) // force the distributed tier
    }
    assert(err.getMessage.contains("converge"))
  }

  test("dup clusters: driver union-find tier ≡ distributed iteration tier") {
    // path (diameter 4) + triangle + pair + singletons, mixed direction
    val pairs = Seq((2L, 1L), (2L, 3L), (4L, 3L), (4L, 5L),
      (11L, 12L), (12L, 13L), (13L, 11L), (9L, 8L))
      .toDF("a_id", "b_id")
    val verts = (1L to 13L).toDF("id")
    val small = graft.operators.DupClusters.assign(verts, pairs)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    val dist = graft.operators.DupClusters
      .assign(verts, pairs, driverEdgeLimit = 0L)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(small === dist)
    assert(small.toMap.apply(5L) === 1L) // chain end reaches the min label
    assert(small.toMap.apply(13L) === 11L)
  }

  test("summary collapses exact-duplicate clusters before sketching") {
    import org.apache.spark.sql.functions._
    // a 300-copy boilerplate cluster: sketched raw it would emit ~45k
    // LSH candidate pairs; collapsed it contributes ONE representative
    val copies = spark.range(300).select(col("id").as("doc_id"),
      lit("spark table scan join filter agg window batch stream").as("text"))
    val distinctDocs = spark.range(2).select((col("id") + 1000).as("doc_id"),
      when(col("id") === 0,
        lit("alpha beta gamma delta epsilon zeta eta theta iota kappa"))
        .otherwise(
          lit("one two three four five six seven eight nine ten eleven"))
        .as("text"))
    val out = graft.operators.DedupPipeline
      .summary(copies.unionByName(distinctDocs))
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2),
        r.getBoolean(3), r.getBoolean(4))).toSeq
    val (big, rest) = out.partition(_._1 < 1000)
    assert(big.length === 300)
    // every copy is a near-dup (its group has other members); only the
    // first is kept
    assert(big.forall(r => r._3 && r._4))
    assert(big.count(!_._2) === 1 && big.count(_._5) === 1)
    assert(big.find(!_._2).map(_._1).contains(0L))
    // the two genuinely distinct docs: no flags, kept
    assert(rest.length === 2 && rest.forall(r => !r._2 && !r._3 && !r._4 && r._5))
  }

  test("dup clusters agree with a union-find reference on random graphs") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val n = 40 + trial * 20
      val pairs = Seq.fill(n) {
        val a = rnd.nextInt(n).toLong; val b = rnd.nextInt(n).toLong
        if (a < b) (a, b) else (b, a + 1) // avoid self-loops, keep ids < n+1
      }.filter(p => p._1 != p._2)
      // reference: driver-side union-find with min-id representatives
      val parent = Array.tabulate(n + 1)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) { val lo = math.min(ra, rb); parent(math.max(ra, rb)) = lo }
      }
      val expected = (0L to n.toLong).map(v => v -> find(v.toInt).toLong)
      // odd trials force the distributed tier so BOTH code paths meet the
      // union-find reference
      val limit = if (trial % 2 == 1) 0L
        else graft.operators.DupClusters.DriverEdgeLimit
      val got = graft.operators.DupClusters.assign(
        (0L to n.toLong).toDF("id"), pairs.toDF("a_id", "b_id"),
        driverEdgeLimit = limit)
        .orderBy("id").as[(Long, Long)].collect().toSeq
      assert(got === expected, s"trial $trial mismatch")
    }
  }

  test("d05 near-dup pairs are symmetric-free (a < b) and thresholded") {
    val rows = SparkEntry.queries("d05_embedding_near_dup")(spark, sf0001)
      .as[(Long, Long, Double)].collect()
    assert(rows.forall { case (a, b, s) => a < b && s >= 0.35 })
  }

  test("substring dedup: planted copied block counts, unique doc scores 0") {
    // doc 2 copies doc 1's first 10-token block verbatim; doc 3 shares
    // nothing. 12 tokens → blocks of 10 + trailing 2.
    val blockA = "a b c d e f g h i j"
    val docs = Seq(
      (1L, blockA + " k l"),
      (2L, blockA + " z z"),
      (3L, "p q r s t u v w x y only here")
    ).toDF("doc_id", "text")
    val out = graft.operators.SubstringDedup.profile(docs)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double, Boolean)].collect().toSeq
    assert(out === Seq(
      (1L, 2L, 1L, 0.5, true),  // shared block of 2 → mostly_dup at 50%
      (2L, 2L, 1L, 0.5, true),
      (3L, 2L, 0L, 0.0, false)))
  }

  test("substring dedup: intra-document repetition is not duplication") {
    val blk = "a b c d e f g h i j"
    val docs = Seq((1L, blk + " " + blk), (2L, "totally different tokens"))
      .toDF("doc_id", "text")
    val out = graft.operators.SubstringDedup.profile(docs)
      .filter(col("doc_id") === 1L)
      .as[(Long, Long, Long, Double, Boolean)].collect().head
    assert(out._2 === 2L && out._3 === 0L) // two copies, one doc → df = 1
  }

  test("semantic dedup flags the higher-id twin, keeps the lowest") {
    // 17 vectors: 16 seed centroids + vec 16 ≈ vec 3 (same direction).
    // Vector 16 must land in vec 3's cell and be flagged; every seed
    // stays kept (cells with one member have no pairs).
    val dim = 64
    def unit(axis: Int): Array[Float] =
      Array.tabulate(dim)(i => if (i == axis) 1.0f else 0.0f)
    val rows = (0 until 16).map(v => (v.toLong, unit(v))) :+
      (16L, unit(3).map(x => x * 0.9f))
    val emb = rows.toDF("vec_id", "embedding")
    val out = graft.operators.SemanticDedup.dedup(emb, k = 16, tau = 0.35)
      .orderBy("vec_id")
      .as[(Long, Long, Boolean, Boolean)].collect().toSeq
    assert(out.size === 17)
    val (dups, kept) = out.partition(_._3)
    assert(dups.map(_._1) === Seq(16L))
    assert(dups.head._2 === 3L) // assigned to vec 3's cell
    assert(kept.forall(_._4))
  }

  test("winnowing guarantees a shared fingerprint for shared substrings") {
    // The MOSS guarantee: substrings of length >= w + k - 1 = 15 shared
    // between two documents MUST yield a shared fingerprint (the window
    // inside the common span selects the same minimum on both sides).
    val common = "zq xv jk wm pt rb common stolen span of text nd lf yg hs"
    val docs = Seq(
      (1L, "alpha beta gamma " + common + " delta epsilon"),
      (2L, "totally other prefix here " + common + " and a suffix"),
      (3L, "no overlap with anything else whatsoever in this doc"))
      .toDF("doc_id", "text")
    val fps = graft.operators.Winnowing.fingerprints(docs)
    val f1 = fps.filter($"doc_id" === 1L).select("fp").as[Long].collect().toSet
    val f2 = fps.filter($"doc_id" === 2L).select("fp").as[Long].collect().toSet
    val f3 = fps.filter($"doc_id" === 3L).select("fp").as[Long].collect().toSet
    assert((f1 & f2).nonEmpty)
    assert((f1 & f3).isEmpty && (f2 & f3).isEmpty)

    val pairs = graft.operators.Winnowing
      .sharedFingerprints(docs, minShared = 2, dfCap = 50)
      .as[(Long, Long, Long)].collect().toSeq
    assert(pairs.map(p => (p._1, p._2)) === Seq((1L, 2L)))

    // A document shorter than one full window still fingerprints (its
    // global minimum) instead of vanishing from the sketch.
    val tiny = Seq((9L, "abc")).toDF("doc_id", "text")
    assert(graft.operators.Winnowing.fingerprints(tiny).count() === 1L)
  }

  test("admission verdict: prior hits, sibling hits, and chain conservatism") {
    import graft.operators.MinHashLSH
    // Synthetic band frames (the verdict's contract is over band keys, so
    // the signature pipeline is out of the picture here).
    val prior = Seq((0, "x", 1L)).toDF("band", "key", "doc_id")
    val batch = Seq(
      (0, "x", 10L),             // collides with the store
      (1, "y", 11L),             // clean, but 12 collides WITH IT
      (1, "y", 12L),             // smaller-sibling hit (11 < 12)
      (2, "q", 12L),             // 13 chains through 12 only
      (2, "q", 13L),             // conservative one-shot: dropped anyway
      (3, "z", 14L))             // clean
      .toDF("band", "key", "doc_id")
    val v = MinHashLSH.admissionVerdict(batch, prior)
      .orderBy("doc_id")
      .as[(Long, Boolean, Boolean, Boolean)].collect().toSeq
    assert(v === Seq(
      (10L, true, false, false),
      (11L, false, false, true),
      (12L, false, true, false),
      // 13 is dropped because 12 is its smaller sibling — even though 12
      // itself was dropped: the documented conservative one-shot rule
      (13L, false, true, false),
      (14L, false, false, true)))

    // Empty store: only within-batch collisions fire.
    val emptyPrior = prior.filter($"doc_id" < 0L)
    val v2 = MinHashLSH.admissionVerdict(batch, emptyPrior)
      .filter($"doc_id" === 10L)
      .as[(Long, Boolean, Boolean, Boolean)].collect().toSeq
    assert(v2 === Seq((10L, false, false, true)))
  }

  test("mergeLabels: new vertices fold into an existing label table — " +
      "bridge merges two prior clusters to the global min, edges to " +
      "non-representative members resolve, singletons self-label, " +
      "untouched clusters keep their labels") {
    import spark.implicits._
    // prior state: clusters {1,2,3} (label 1), {5,6} (label 5), {9}
    val prior = Seq((1L, 1L), (2L, 1L), (3L, 1L), (5L, 5L), (6L, 5L),
      (9L, 9L)).toDF("doc_id", "cluster_id")
    // batch: 10 bridges the two clusters via NON-representative members
    // (3 and 6 — endpoint mapping must go through the label table, not
    // assume rep endpoints); 11–12 pair up; 13 arrives alone
    val batch = Seq(10L, 11L, 12L, 13L).toDF("id")
    val edges = Seq((3L, 10L), (10L, 6L), (11L, 12L))
      .toDF("a_id", "b_id")
    val got = graft.operators.DupClusters
      .mergeLabels(prior, batch, edges)
      .as[(Long, Long)].collect().sorted.toSeq
    assert(got === Seq(
      1L -> 1L, 2L -> 1L, 3L -> 1L,   // untouched membership, label kept
      5L -> 1L, 6L -> 1L,             // merged INTO the global min via 10
      9L -> 9L,                       // untouched singleton cluster
      10L -> 1L,                      // the bridge joins the merged min
      11L -> 11L, 12L -> 11L,         // batch-internal pair
      13L -> 13L))                    // batch singleton self-labels
    // idempotence-shaped sanity: merging an empty batch changes nothing
    val again = graft.operators.DupClusters.mergeLabels(
      graft.operators.DupClusters
        .mergeLabels(prior, batch, edges),
      spark.emptyDataFrame.select(lit(0L).as("id")).limit(0),
      Seq.empty[(Long, Long)].toDF("a_id", "b_id"))
      .as[(Long, Long)].collect().sorted.toSeq
    assert(again === got)
  }

  test("writeLabels/readLabels: persisted cluster labels round-trip " +
      "bit-exactly, re-clusterings version (time travel), and the " +
      "stored stats prune point lookups") {
    import spark.implicits._
    val root = "target/dup-labels"
    val f = new java.io.File(root)
    if (f.exists()) { import scala.reflect.io.Directory
      new Directory(f).deleteRecursively(): Unit }
    val verts = (0L to 9L).toDF("id")
    val pairs1 = Seq((0L, 1L), (1L, 2L), (5L, 6L)).toDF("a_id", "b_id")
    val labels1 = graft.operators.DupClusters.assign(verts, pairs1)
      .select(col("id").as("doc_id"), col("cluster_id"))
    val v1 = graft.operators.DupClusters.writeLabels(labels1, root)
    assert(v1 === 1L)
    val got1 = graft.operators.DupClusters.readLabels(spark, root)
      .as[(Long, Long)].collect().sorted.toSeq
    assert(got1 === labels1.as[(Long, Long)].collect().sorted.toSeq)
    // a later re-clustering (new evidence merges 2-5) publishes v2;
    // v1 stays readable — an audit can recover the exact labels a past
    // release was cut with
    val pairs2 = pairs1.union(Seq((2L, 5L)).toDF("a_id", "b_id"))
    val labels2 = graft.operators.DupClusters.assign(verts, pairs2)
      .select(col("id").as("doc_id"), col("cluster_id"))
    assert(graft.operators.DupClusters.writeLabels(labels2, root) === 2L)
    assert(graft.operators.DupClusters.readLabels(spark, root)
      .filter(col("doc_id") === 6L).as[(Long, Long)].head() === ((6L, 0L)))
    assert(graft.operators.DupClusters.readLabels(spark, root, version = 1L)
      .filter(col("doc_id") === 6L).as[(Long, Long)].head() === ((6L, 5L)))
    // point lookups go through the store's declared doc_id statistics
    assert(graft.operators.SnapshotStore
      .readWhere(spark, root, "doc_id", 6L, 6L)
      .select("doc_id", "cluster_id")
      .as[(Long, Long)].collect().toSeq === Seq((6L, 0L)))
  }

  test("writePrints/upsertPrints: stored winnowing fingerprints " +
      "round-trip, a batch upsert ≡ the from-scratch table, and a " +
      "re-parsed document sheds its stale prints") {
    import graft.operators.Winnowing
    val root = "target/winnow-prints"
    val f = new java.io.File(root)
    if (f.exists()) { import scala.reflect.io.Directory
      new Directory(f).deleteRecursively(): Unit }
    val common = "zq xv jk wm pt rb common stolen span of text nd lf yg hs"
    def doc(id: Long, text: String) = (id, text)
    val prior = Seq(
      doc(1L, "alpha beta gamma " + common + " delta epsilon"),
      doc(3L, "no overlap with anything else whatsoever in this doc"))
      .toDF("doc_id", "text")
    val batch = Seq(
      doc(2L, "totally other prefix here " + common + " and a suffix"))
      .toDF("doc_id", "text")

    // v1: prior corpus' prints; round-trip is bit-exact
    assert(Winnowing.writePrints(Winnowing.fingerprints(prior), root)
      === 1L)
    val got = Winnowing.readPrints(spark, root)
      .as[(Long, Long)].collect().sorted.toSeq
    assert(got === Winnowing.fingerprints(prior)
      .as[(Long, Long)].collect().sorted.toSeq)

    // v2: the batch hashes ITS OWN k-grams only and upserts; the
    // updated table equals a from-scratch build over the full corpus
    // (prints are per-document, so union IS the full table)
    assert(Winnowing.upsertPrints(Winnowing.fingerprints(batch),
      batch.select("doc_id"), root) === 2L)
    val full = prior.unionByName(batch)
    assert(Winnowing.readPrints(spark, root)
      .as[(Long, Long)].collect().sorted.toSeq
      === Winnowing.fingerprints(full)
        .as[(Long, Long)].collect().sorted.toSeq)
    // the derived pair report from the STORE equals the from-text one
    assert(Winnowing.pairsFromPrints(Winnowing.readPrints(spark, root),
        minShared = 2, dfCap = 50)
      .as[(Long, Long, Long)].collect().sorted.toSeq
      === Winnowing.sharedFingerprints(full, minShared = 2, dfCap = 50)
        .as[(Long, Long, Long)].collect().sorted.toSeq)
    // v1 time-travels: the pre-batch table is exactly the prior prints
    assert(Winnowing.readPrints(spark, root, version = 1L)
      .as[(Long, Long)].collect().sorted.toSeq === got)

    // re-parse: doc 2's text changes → its stale prints must vanish,
    // not accumulate (the keyed-upsert contract)
    val reparsed = Seq(doc(2L, "completely fresh text after a re-parse "
      + "that shares nothing with the first version")).toDF("doc_id", "text")
    assert(Winnowing.upsertPrints(Winnowing.fingerprints(reparsed),
      reparsed.select("doc_id"), root) === 3L)
    assert(Winnowing.readPrints(spark, root)
      .as[(Long, Long)].collect().sorted.toSeq
      === Winnowing.fingerprints(prior.unionByName(reparsed))
        .as[(Long, Long)].collect().sorted.toSeq)
  }

  test("clusterDocsFromPrints reproduces clusterDocs bit-exactly " +
      "(the shared-signature bootstrap path)") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text")
    val prints = graft.operators.DupClusters.repPrints(docs)
    val viaPrints = graft.operators.DupClusters
      .clusterDocsFromPrints(docs, prints)
      .as[(Long, Long)].collect().sorted.toSeq
    val direct = graft.operators.DupClusters.clusterDocs(docs)
      .as[(Long, Long)].collect().sorted.toSeq
    assert(viaPrints === direct)
    assert(viaPrints.nonEmpty)
  }
}
