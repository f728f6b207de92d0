package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Per-query formatted-plan dump for the optimization-round evidence
  * trail: writes `<outDir>/<query>_<tag>.txt` with
  * `explain("formatted")` output for each named query. NOTE the s/i/d
  * store pipelines execute their build verbs EAGERLY while the query
  * function constructs the frame; the dumped plan is the returned
  * (final read/search/report) stage — the part a plan dump can show.
  *
  * Usage: sbt "runMain graft.PlanDump <outDir> <tag> <q1,q2,...>"
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(outDir, tag, names) = args.take(3)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    names.split(",").map(_.trim).filter(_.nonEmpty).foreach { n =>
      SparkEntry.queries.get(n) match {
        case None => System.err.println(s"[plandump] unknown query: $n")
        case Some(fn) =>
          try {
            val df = fn(spark, sfDir)
            val txt = df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            Files.writeString(Paths.get(outDir, s"${n}_$tag.txt"), txt)
            println(s"[plandump] wrote ${n}_$tag.txt")
          } catch { case e: Throwable =>
            System.err.println(s"[plandump] $n failed: ${e.getMessage}")
          }
      }
    }
    spark.stop()
  }
}
