package graft.tools

import graft.{Bench, GraftSession}
import graft.pipeline.SyntheticPages

/** Standalone daily-incremental-step profile — the SAME harness the full
  * Bench runs (`Bench.incrementalBench`), isolated so the step's stage
  * profile can be iterated on without paying the whole headline bench:
  * `SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=16 SPARK_GRAFT_REP=200
  *  runMain graft.tools.IncrBench`. */
object IncrBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val repFactor = sys.env.getOrElse("SPARK_GRAFT_REP", "200").toInt
    val spark = GraftSession.local(cpus, "graft-incr-bench")
    spark.sparkContext.setLogLevel("WARN")
    val pagesDir = java.nio.file.Files.createTempDirectory("graft_incr_pages").toString
    SyntheticPages.fromDocuments(spark, sfDir).repartition(64)
      .write.mode("overwrite").parquet(pagesDir)
    val nDocs = spark.read.parquet(pagesDir).count() * repFactor
    val (initSec, stepSec, stages, nHist, nBatch, fullSec) =
      Bench.incrementalBench(spark, pagesDir, repFactor, nDocs,
        alsoFull = args.contains("full"))
    def f(d: Double) = f"$d%.3f"
    val stagesJson = stages.map { case (k, v) => s""""$k":${f(v)}""" }.mkString("{", ",", "}")
    val fullJson = if (fullSec < 0) "" else
      s""","full_run_sec":${f(fullSec)},"full_vs_step":${f(fullSec / stepSec)}"""
    println(s"""INCR {"history_docs":$nHist,"batch_docs":$nBatch,"cores":$cpus,""" +
      s""""init_sec":${f(initSec)},"sec":${f(stepSec)},""" +
      s""""docs_sec":${f(nBatch / stepSec)},"stages":$stagesJson$fullJson}""")
    def rm(p: java.io.File): Unit = {
      if (p.isDirectory) p.listFiles.foreach(rm)
      p.delete(): Unit
    }
    rm(new java.io.File(pagesDir))
    spark.stop()
  }
}
