package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plans.MaterializedViews

/** The MV rewrite: a registered summary silently replaces matching
  * aggregate subtrees; non-matching queries keep their base scans. */
class MaterializedViewSpec extends SparkTestBase {

  private def baseAgg(): DataFrame =
    Tables.lineitem(spark, sf0001)
      .groupBy("l_returnflag")
      .agg(sum(col("l_quantity").cast("decimal(12,2)")).as("sum_qty"),
        count(lit(1)).as("n"))

  // files the OPTIMIZED plan reads (inputFiles reflects the logical
  // relations BEFORE the optimizer, so it cannot see the rewrite)
  private def scannedFiles(df: DataFrame): Set[String] =
    df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        r.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.location.inputFiles.toSeq
          case _ => Nil
        }
    }.flatten.toSet

  test("matching query reads the summary, not the fact table") {
    val path = "target/mv-summary"
    baseAgg().write.mode("overwrite").parquet(path)
    val summary = spark.read.parquet(path)
    // capture the expected answer BEFORE registering — afterwards both
    // sides of the comparison would be rewritten to the summary and a
    // wrong rewrite could never be detected
    val want = baseAgg().orderBy("l_returnflag").collect().map(_.toSeq)
    try {
      MaterializedViews.register("qty_by_flag", baseAgg(), summary)
      // a FRESHLY constructed identical query — new expression ids
      val q = baseAgg().orderBy("l_returnflag")
      val files = scannedFiles(q)
      assert(files.nonEmpty && files.forall(_.contains("mv-summary")),
        s"expected only summary files, scanned: $files")
      // and the result is still right (vs the pre-registration answer)
      val got = q.collect().map(_.toSeq)
      assert(got.toSeq === want.toSeq)

      // a DIFFERENT aggregate (other grouping) is untouched
      val other = Tables.lineitem(spark, sf0001)
        .groupBy("l_linestatus").agg(count(lit(1)).as("n"))
      assert(scannedFiles(other).exists(_.contains("lineitem")),
        "non-matching query must keep its base scan")

      // references ABOVE the rewrite resolve: filter + projection on top
      val above = baseAgg().filter(col("n") > 0)
        .select(col("l_returnflag"), col("sum_qty"))
      assert(scannedFiles(above).forall(_.contains("mv-summary")))
      assert(above.count() === 3L)
    } finally MaterializedViews.clear()
  }

  test("deregister restores the fact-table scan") {
    val path = "target/mv-summary2"
    baseAgg().write.mode("overwrite").parquet(path)
    try {
      MaterializedViews.register("tmp_mv", baseAgg(),
        spark.read.parquet(path))
      assert(scannedFiles(baseAgg()).forall(_.contains("mv-summary2")))
      MaterializedViews.deregister("tmp_mv")
      assert(scannedFiles(baseAgg()).exists(_.contains("lineitem")))
    } finally MaterializedViews.clear()
  }

  test("re-registering a refreshed summary while the old one is live keeps matching") {
    // the refresh workflow: a pipeline re-registers the SAME view name
    // after each summary refresh, with the previous registration still
    // active. The capture must not observe its own (old) rewrite — or
    // the stored base becomes the old summary's scan and the view
    // silently stops matching every future query.
    val pathA = "target/mv-refresh-a"
    val pathB = "target/mv-refresh-b"
    baseAgg().write.mode("overwrite").parquet(pathA)
    baseAgg().write.mode("overwrite").parquet(pathB)
    try {
      MaterializedViews.register("refresh_mv", baseAgg(),
        spark.read.parquet(pathA))
      // live old registration; now re-register the refreshed summary —
      // validation must pass (no spurious "refresh the summary") …
      MaterializedViews.register("refresh_mv", baseAgg(),
        spark.read.parquet(pathB))
      // … and a fresh query must rewrite to the NEW summary
      val files = scannedFiles(baseAgg())
      assert(files.nonEmpty && files.forall(_.contains("mv-refresh-b")),
        s"expected the refreshed summary's files, scanned: $files")
    } finally MaterializedViews.clear()
  }

  test("register validates content and schema; wrong summaries are named errors") {
    val path = "target/mv-summary3"
    // a STALE summary (one group dropped) must be rejected
    baseAgg().filter(col("l_returnflag") =!= "A")
      .write.mode("overwrite").parquet(path)
    val e = intercept[IllegalArgumentException] {
      MaterializedViews.register("stale", baseAgg(),
        spark.read.parquet(path))
    }
    assert(e.getMessage.contains("refresh the summary"))
    // schema drift is rejected before any content check
    intercept[IllegalArgumentException] {
      MaterializedViews.register("drift", baseAgg(),
        spark.read.parquet(path).drop("n"))
    }
    assert(MaterializedViews.registered.isEmpty)
  }
}
