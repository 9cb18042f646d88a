package graft.tools

import graft.{Bench, GraftSession}
import org.apache.spark.sql.SparkSession

/** One-off A/B experiment for the scaling-pair fixture's task geometry.
  *
  * Hypothesis: the 64-file pages dir is bin-packed by Spark's file-split
  * planner into ~defaultParallelism splits (openCost-dominated sizing), so
  * each parallelism level runs ONE wave of tasks — the 16-core level's
  * makespan is its slowest-of-16 task (each covering only 4 files of
  * variable-length text), while a 4-core task averages 16 files. The
  * ragged-tail asymmetry depresses measured scaling efficiency below the
  * engine's true value. Variant B forces 256 partitions (a tiny 5k-row
  * round-robin shuffle BEFORE the ×200 explode), giving both levels many
  * waves — the task-granularity discipline a real cluster job has anyway.
  *
  * Fixture and job are Bench.scalingFixture / scalingPipelineDf (the
  * repartitionTo knob selects the variant), so the experiment measures
  * exactly the shipped job. Interleaved within each round (baseA4, repB4,
  * baseA16, repB16) so host drift hits both variants equally.
  * `runMain graft.tools.ScaleExperiment [rounds]` with
  * SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as in ScaleBench. */
object ScaleExperiment {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val repFactor = 200
    val rounds = args.headOption.map(_.toInt).getOrElse(3)
    val nprocs = Runtime.getRuntime.availableProcessors()
    val bigCpus = math.max(math.min(cpus / 2, nprocs / 2), 4)
    val smallCpus = math.max(bigCpus / 4, 1)

    def mkSession(c: Int): SparkSession = {
      val s = GraftSession.local(c, "graft-scale-exp")
      s.sparkContext.setLogLevel("ERROR")
      s
    }
    var spark = mkSession(bigCpus)
    val pagesDir = Bench.scalingFixture(spark, sfDir, "graft_scaleexp")
    def job(s: SparkSession, parts: Int) =
      Bench.scalingPipelineDf(s, pagesDir, repFactor, repartitionTo = parts)

    println(s"scan partitions @$bigCpus cores: " +
      spark.read.parquet(pagesDir).rdd.getNumPartitions)
    Bench.force(job(spark, 0)); Bench.force(job(spark, 256)) // JIT warm-up, untimed
    spark.stop()
    spark = mkSession(smallCpus)
    println(s"scan partitions @$smallCpus cores: " +
      spark.read.parquet(pagesDir).rdd.getNumPartitions)
    spark.stop()

    val results = (1 to rounds).map { i =>
      spark = mkSession(smallCpus)
      val a4 = Bench.time(Bench.force(job(spark, 0)))
      val b4 = Bench.time(Bench.force(job(spark, 256)))
      spark.stop()
      spark = mkSession(bigCpus)
      val a16 = Bench.time { Bench.force(job(spark, 0)); Bench.force(job(spark, 0)) } / 2
      val b16 = Bench.time { Bench.force(job(spark, 256)); Bench.force(job(spark, 256)) } / 2
      spark.stop()
      val k = bigCpus.toDouble / smallCpus
      println(f"round $i: base t$smallCpus=$a4%.2f t$bigCpus=$a16%.2f eff=${a4 / a16 / k}%.3f" +
        f"  | rep256 t$smallCpus=$b4%.2f t$bigCpus=$b16%.2f eff=${b4 / b16 / k}%.3f")
      (a4, a16, b4, b16)
    }
    val k = bigCpus.toDouble / smallCpus
    def best(xs: Seq[Double]) = xs.min
    println(f"BEST base eff=${best(results.map(_._1)) / best(results.map(_._2)) / k}%.3f" +
      f"  rep256 eff=${best(results.map(_._3)) / best(results.map(_._4)) / k}%.3f")
    Bench.rmDir(pagesDir)
  }
}
