package graft.tools

import graft.{Bench, GraftSession}

/** Standalone runner for the composed-curation-run bench (the
  * `pipeline_curation` figure) — same fixture and timing discipline as
  * Bench.main's curation section, re-measurable after an optimization
  * without paying for the whole headline suite.
  * `SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=16 SPARK_GRAFT_REP=200
  *  runMain graft.tools.CurBench`. */
object CurBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val repFactor = sys.env.getOrElse("SPARK_GRAFT_REP", "200").toInt
    val spark = GraftSession.local(cpus, "graft-cur-bench")
    spark.sparkContext.setLogLevel("ERROR")
    val pagesDir = java.nio.file.Files.createTempDirectory("graft_curbench").toString
    graft.pipeline.SyntheticPages.fromDocuments(spark, sfDir).repartition(64)
      .write.mode("overwrite").parquet(pagesDir)
    val nDocs = spark.read.parquet(pagesDir).count() * repFactor
    val (sec, stages) =
      Seq(Bench.curationRep(spark, pagesDir, repFactor),
        Bench.curationRep(spark, pagesDir, repFactor)).minBy(_._1)
    stages.foreach { case (n, s) => println(f"CUR stage $n%-24s $s%.2f s") }
    println(f"CUR total=$sec%.1f s  docs=$nDocs  => ${nDocs / sec}%.0f docs/sec")
    Bench.rmDir(pagesDir)
    spark.stop()
  }
}
