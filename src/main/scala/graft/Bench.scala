package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Steady-state warmup: JIT/codegen paths and parquet footers, so the
    // first timed query does not absorb one-time JVM cost.
    spark.range(1000000L).selectExpr("sum(id)").collect()
    Seq("lineitem", "orders", "customer", "documents", "embeddings", "events")
      .foreach { t =>
        try spark.read.parquet(s"$sfDir/$t.parquet").count()
        catch { case _: Throwable => () }
      }
    // The sketch/vector families concentrate their one-time cost (md5 +
    // shingle codegen, hash-agg spill paths, fused-loop expression JIT) in
    // whichever query runs them first — measured ~2.5 s billed to
    // d02_minhash_lsh alone. Run each family once over a tiny slice so the
    // timed windows measure steady-state operator cost, not first-use JIT.
    try {
      val docs20 = spark.read.parquet(s"$sfDir/documents.parquet").limit(20)
      val emb50 = spark.read.parquet(s"$sfDir/embeddings.parquet").limit(50)
      operators.MinHashLSH.nearDuplicates(docs20).count()
      operators.NgramJaccard.nearDuplicates(docs20, 3, 100, 0.2).count()
      operators.SimHash.nearPairs(docs20).count()
      operators.IvfIndex.search(emb50,
        org.apache.spark.sql.functions.col("vec_id") < 3,
        k = 4, nProbe = 2, topK = 3).count()
    } catch { case _: Throwable => () }
    // SPARK_GRAFT_ONLY=d05,s03 restricts the run for local iteration; the
    // driver never sets it, so round artifacts always cover every query.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(f => f.exists(n.startsWith)) }
    val results = selected.map { case (name, fn) =>
      // Isolation between queries: a System.gc() OUTSIDE the timed window
      // lets Spark's ContextCleaner drop the previous query's lingering
      // blocks (localCheckpoint RDDs, broadcast pieces) so query N+1's
      // time measures query N+1, not its predecessor's garbage. Measured
      // effect: the q-family ran up to 5x slower right after the
      // allocation-heavy d-family without this.
      System.gc()
      val t0 = System.nanoTime()
      // A failed query reports -1, not a normal-looking elapsed time —
      // broken and fast must be distinguishable in the bench artifact.
      val elapsed =
        try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            -1.0
        }
      name -> elapsed
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // A run with failures must not look FASTER than a clean one: failures
    // are counted explicitly and the total is only comparable when
    // failed == 0 (the driver's gate treats a failed run as failed, not
    // as a better time).
    val failed = results.count(_._2 < 0.0)
    val total = results.filter(_._2 >= 0.0).map(_._2).sum
    // n_queries: totals are only comparable across rounds at the same
    // query count (the suite grew 62 -> 104 during round 5).
    println(s"""{"metric":"total","value":$total,"unit":"sec","failed":$failed,"n_queries":${results.size},"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
