package graft

import org.apache.spark.sql.SparkSession

/** One-shot static scale sweep: [[graft.plans.PlanAudit]] over every
  * registered query, one `AUDIT|query|kind` line per finding (or
  * `|clean`) — the data source for PlanAuditSpec's allowlist gate and
  * the CI-shaped form of the round-6 plan-audit triage. Pure planning:
  * queries are constructed and planned, not executed (beyond the bounded
  * driver work some constructions do by design).
  *
  * Usage: `runMain graft.PlanSweep [sfDir]` */
object PlanSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (n, fn) =>
      try {
        val fs = graft.plans.PlanAudit.audit(fn(spark, sfDir))
        if (fs.isEmpty) println(s"AUDIT|$n|clean")
        else fs.foreach(f => println(s"AUDIT|$n|${f.kind}"))
      } catch {
        case e: Throwable => println(s"AUDIT|$n|ERROR|${e.getMessage}")
      }
    }
    spark.stop()
  }
}
