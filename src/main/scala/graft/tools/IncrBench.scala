package graft.tools

import graft.{Bench, GraftSession}
import org.apache.spark.sql.functions._

/** Standalone runner for the daily-incremental-step bench (the
  * `pipeline_incremental` figure), so the step can be re-measured after an
  * optimization without paying for the whole headline suite. Same fixture
  * and timing discipline as Bench.main's incremental section.
  * `SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=16 SPARK_GRAFT_REP=200
  *  runMain graft.tools.IncrBench [alsoFull] [lake] [all]` — `all` turns
  * every optional class on (substring spans, semantic, host cap): the
  * FULL-WIDTH daily step, priced standalone so the per-round JSON's
  * incremental figure stays comparable across rounds. */
object IncrBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val repFactor = sys.env.getOrElse("SPARK_GRAFT_REP", "200").toInt
    val alsoFull = args.contains("alsoFull")
    val spark = GraftSession.local(cpus, "graft-incr-bench")
    spark.sparkContext.setLogLevel("ERROR")
    val pagesDir = java.nio.file.Files.createTempDirectory("graft_incrbench").toString
    graft.pipeline.SyntheticPages.fromDocuments(spark, sfDir).repartition(64)
      .write.mode("overwrite").parquet(pagesDir)
    val nDocs = spark.read.parquet(pagesDir).count() * repFactor
    if (args.contains("lake")) {
      val (initSec, stepSec, stages, histDocs, batchDocs) =
        Bench.incrementalLakeBench(spark, pagesDir, repFactor, nDocs,
          allClasses = args.contains("all"))
      println(f"LAKE init=$initSec%.1f s (untimed state bootstrap incl. sidecars)")
      stages.foreach { case (n, s) => println(f"LAKE stage $n%-24s $s%.2f s") }
      println(f"LAKE step=$stepSec%.1f s  batch=$batchDocs docs  history=$histDocs" +
        f"  => ${batchDocs / stepSec}%.0f docs/sec")
    } else {
      val (initSec, stepSec, stages, histDocs, batchDocs, fullSec) =
        Bench.incrementalBench(spark, pagesDir, repFactor, nDocs, alsoFull,
          allClasses = args.contains("all"))
      println(f"INCR init=$initSec%.1f s (untimed state bootstrap)")
      stages.foreach { case (n, s) => println(f"INCR stage $n%-24s $s%.2f s") }
      println(f"INCR step=$stepSec%.1f s  batch=$batchDocs docs  history=$histDocs" +
        f"  => ${batchDocs / stepSec}%.0f docs/sec")
      if (alsoFull) println(f"INCR full_recuration=$fullSec%.1f s (${fullSec / stepSec}%.1fx the step)")
    }
    Bench.rmDir(pagesDir)
    spark.stop()
  }
}
