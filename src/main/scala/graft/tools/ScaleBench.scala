package graft.tools

import graft.{Bench, GraftSession}
import org.apache.spark.sql.SparkSession

/** Standalone N-vs-4N scaling measurement (the `pipeline` figure) in a
  * FRESH JVM — the fixture, job, warm-up and interleaved-pair estimator are
  * the SAME CODE as Bench.main's scaling section (Bench.scalingFixture /
  * scalingPipelineDf / scalingPair), without the headline suite that
  * precedes it there. Exists because the in-suite reading once ran last in
  * a JVM that had already executed ~130 query plans (grown heap, GC
  * pressure, codegen-cache population) and drifted as the headline set
  * grew; this isolates the measurement so a low in-suite figure can be
  * attributed to JVM aging vs host state vs the engine.
  * `SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 SPARK_GRAFT_REP=200
  *  runMain graft.tools.ScaleBench [pairs]`. */
object ScaleBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val repFactor = sys.env.getOrElse("SPARK_GRAFT_REP", "200").toInt
    val nPairs = args.headOption.map(_.toInt).getOrElse(7)
    val nprocs = Runtime.getRuntime.availableProcessors()
    val bigCpus = math.max(math.min(cpus / 2, nprocs / 2), 4)
    val smallCpus = math.max(bigCpus / 4, 1)

    def mkSession(c: Int): SparkSession = {
      val s = GraftSession.local(c, "graft-scale-bench")
      s.sparkContext.setLogLevel("ERROR")
      s
    }
    var spark = mkSession(bigCpus)
    val pagesDir = Bench.scalingFixture(spark, sfDir, "graft_scalebench")
    def pipelineDf(s: SparkSession) = Bench.scalingPipelineDf(s, pagesDir, repFactor)
    val nDocs = spark.read.parquet(pagesDir).count() * repFactor
    // JIT/codegen warm-up, untimed
    pipelineDf(spark).write.format("noop").mode("overwrite").save()
    spark.stop()

    val pairs = (1 to nPairs).map { i =>
      val (a, b) = Bench.scalingPair(mkSession, smallCpus, bigCpus, pipelineDf)
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
