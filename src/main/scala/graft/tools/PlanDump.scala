package graft.tools

import graft.{GraftSession, SparkEntry}
import java.nio.file.{Files, Paths}

/** Dump `.explain("formatted")` output per query to files — the plan
  * artifacts the optimization rounds commit under `plans/rNN/` so plan-shape
  * claims (Exchange counts, join strategies, PushedFilters) are checkable
  * without running Spark.
  * `runMain graft.tools.PlanDump <outDir> <suffix> [q...]` writes
  * `<outDir>/<query>_<suffix>.txt` for each named query (default: all). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outDir = args(0)
    val suffix = args(1)
    val names = if (args.length > 2) args.drop(2).toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    Files.createDirectories(Paths.get(outDir))
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt, "plan-dump")
    for (q <- names) {
      val df = SparkEntry.queries(q)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      Files.writeString(Paths.get(outDir, s"${q}_$suffix.txt"), plan)
      println(s"PLAN $q -> $outDir/${q}_$suffix.txt")
    }
    spark.stop()
  }
}
