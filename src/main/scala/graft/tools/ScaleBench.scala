package graft.tools

import graft.{Bench, GraftSession}
import graft.pipeline.{QualityPipeline, SyntheticPages}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Standalone N-vs-4N scaling measurement (the `pipeline` figure) in a
  * FRESH JVM — the same fixture, warm-up and interleaved-pair estimators
  * as Bench.main's scaling section, without the 31-query headline suite
  * that precedes it there. Exists because the in-suite reading runs last
  * in a JVM that has already executed ~130 query plans (grown heap, GC
  * pressure, codegen-cache population), and the reading drifted as the
  * headline set grew; this isolates the measurement so a low in-suite
  * figure can be attributed to JVM aging vs host state vs the engine.
  * `SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 SPARK_GRAFT_REP=200
  *  runMain graft.tools.ScaleBench [pairs]`. */
object ScaleBench {
  private def force(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  private def time[A](f: => A): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val repFactor = sys.env.getOrElse("SPARK_GRAFT_REP", "200").toInt
    val nPairs = args.headOption.map(_.toInt).getOrElse(7)
    val nprocs = Runtime.getRuntime.availableProcessors()
    val bigCpus = math.max(math.min(cpus / 2, nprocs / 2), 4)
    val smallCpus = math.max(bigCpus / 4, 1)

    var spark: SparkSession = GraftSession.local(bigCpus, "graft-scale-bench")
    spark.sparkContext.setLogLevel("ERROR")
    val pagesDir = java.nio.file.Files.createTempDirectory("graft_scalebench").toString
    SyntheticPages.fromDocuments(spark, sfDir).repartition(64)
      .write.mode("overwrite").parquet(pagesDir)
    // repartition(256) before the explode: many task waves at both levels
    // (the 64-file dir otherwise bin-packs to one wave per level; see the
    // task-granularity comment in Bench.main and tools.ScaleExperiment).
    def pipelineDf(s: SparkSession) = {
      val pages = s.read.parquet(pagesDir)
        .repartition(256)
        .withColumn("rep", explode(sequence(lit(0), lit(repFactor - 1))))
        .withColumn("url", concat(col("url"), lit("?rep="), col("rep")))
        .drop("rep")
      QualityPipeline.run(pages).select("url", "keep", "n_pii", "text_scrubbed")
    }
    val nDocs = spark.read.parquet(pagesDir).count() * repFactor
    force(pipelineDf(spark)) // JIT/codegen warm-up, untimed
    spark.stop()

    // the Bench.main estimator verbatim: interleaved back-to-back pairs,
    // equal interval lengths per level, median-of-ratios + best-times
    val pairs = (1 to nPairs).map { i =>
      spark = GraftSession.local(smallCpus, "graft-scale-bench")
      spark.sparkContext.setLogLevel("ERROR")
      val a = time { force(pipelineDf(spark)); force(pipelineDf(spark)) } / 2
      spark.stop()
      spark = GraftSession.local(bigCpus, "graft-scale-bench")
      spark.sparkContext.setLogLevel("ERROR")
      val b = time { (1 to 4).foreach(_ => force(pipelineDf(spark))) } / 4
      spark.stop()
      println(f"SCALE pair $i: t$smallCpus=$a%.2f s  t$bigCpus=$b%.2f s  " +
        f"ratio=${(a / b) / (bigCpus.toDouble / smallCpus)}%.3f")
      (a, b)
    }
    val tn = pairs.map(_._1).min
    val t4n = pairs.map(_._2).min
    val ratios = pairs.map { case (a, b) =>
      (a / b) / (bigCpus.toDouble / smallCpus) }.sorted
    println(f"SCALE docs=$nDocs  $smallCpus cores: ${nDocs / tn}%.0f docs/sec  " +
      f"$bigCpus cores: ${nDocs / t4n}%.0f docs/sec")
    println(f"SCALE efficiency median=${ratios(ratios.length / 2)}%.3f  " +
      f"best=${(tn / t4n) / (bigCpus.toDouble / smallCpus)}%.3f")
    Bench.rmDir(pagesDir)
  }
}
