package graft.tools

import graft.{Bench, GraftSession}
import graft.operators.{Dedup, IncrementalDedup}
import graft.pipeline.{Curation, IncrementalCuration, SyntheticPages}
import org.apache.spark.sql.functions._

/** Scratch profiler for the incremental step's dominant stage
  * (`IncrementalDedup.nearNewOnly` against the persisted band table):
  * rebuilds the bench fixture, advances the step to the stage's input
  * (post exact + line + within-batch near-dup), then times each internal
  * materialization of `nearCrossPairs` SEPARATELY — band recompute, the
  * history-band probe, candidates, both shingle sides, verify+anti —
  * so optimization work aims at the measured bottleneck, not a guess.
  * `SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=16 SPARK_GRAFT_REP=200
  *  runMain graft.tools.NearProf`. */
object NearProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val repFactor = sys.env.getOrElse("SPARK_GRAFT_REP", "200").toInt
    val spark = GraftSession.local(cpus, "graft-near-prof")
    spark.sparkContext.setLogLevel("ERROR")
    val pagesDir = java.nio.file.Files.createTempDirectory("graft_nearprof").toString
    SyntheticPages.fromDocuments(spark, sfDir).repartition(64)
      .write.mode("overwrite").parquet(pagesDir)
    val nDocs = spark.read.parquet(pagesDir).count() * repFactor
    val (histDocs, batch, histDir) = Bench.incrementalFixture(spark, pagesDir, repFactor)

    val state = IncrementalCuration.init(histDocs, None, withLineDedup = true)
    // advance to the stage input exactly as IncrementalCuration.step does
    val b0 = Curation.exactStage(
        batch.select(col("doc_id").cast("long").as("doc_id"), col("text")))
      .withColumn("digest", md5(col("text")))
    val pf = IncrementalDedup.newOnlyManaged(b0, state.docs.select("digest"),
      "digest", nDocs)
    val b1 = pf.df.localCheckpoint(); pf.release()
    val within = graft.operators.ExactSubstring.ccnetDedupLines(b1, "doc_id", "text")
      .select(col("id").as("doc_id"), col("text_dedup").as("text"))
    val pfL = IncrementalDedup.newLinesOnlyManaged(within, state.lines.get,
      "doc_id", "text", 2L * nDocs)
    val b1b = pfL.df.select(col("id").as("doc_id"), col("text_dedup").as("text"))
      .localCheckpoint(); pfL.release()
    val bWithin = Curation.neardupStage(b1b, 0.5).localCheckpoint()
    println(s"PROF input rows=${bWithin.count()}")

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROF $name%-16s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    for (round <- 1 to 2) {
      println(s"PROF --- round $round ---")
      // mirror of nearCrossPairs, each stage materialized
      val idCol = "doc_id"; val textCol = "text"; val maxBucket = 4096
      import graft.functions.{TextFunctions => TF}
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("band", "band_digest").orderBy("id")
      val bB = t("batch_bands") {
        IncrementalDedup.bandTable(bWithin, idCol, textCol).localCheckpoint()
      }
      val hB = t("hist_probe") {
        state.bands
          .join(bB.select("band", "band_digest").distinct(),
            Seq("band", "band_digest"), "left_semi")
          .withColumn("_rn", row_number().over(w))
          .filter(col("_rn") <= maxBucket).drop("_rn")
          .localCheckpoint()
      }
      val cand = t("candidates") {
        bB.select(col("band"), col("band_digest"), col("id").as("batch_id"))
          .join(hB.select(col("band"), col("band_digest"), col("id").as("hist_id")),
            Seq("band", "band_digest"))
          .select("batch_id", "hist_id").distinct().localCheckpoint()
      }
      println(s"PROF cand rows=${cand.count()} hB rows=${hB.count()}")
      val shB = t("shingles_batch") {
        bWithin.select(col(idCol).cast("long").as("batch_id"), col(textCol))
          .join(cand.select("batch_id").distinct(), Seq("batch_id"), "left_semi")
          .select(col("batch_id"), TF.shingleHashes(col(textCol), 3).as("sh_a"))
          .localCheckpoint()
      }
      val shH = t("shingles_hist") {
        state.docs.select(col(idCol).cast("long").as("hist_id"), col(textCol))
          .join(cand.select("hist_id").distinct(), Seq("hist_id"), "left_semi")
          .select(col("hist_id"), TF.shingleHashes(col(textCol), 3).as("sh_b"))
          .localCheckpoint()
      }
      val out = t("verify_anti") {
        val pairs = cand.join(shB, "batch_id").join(shH, "hist_id")
          .withColumn("_i", size(array_intersect(col("sh_a"), col("sh_b"))))
          .withColumn("jaccard", col("_i").cast("double") /
            (size(col("sh_a")) + size(col("sh_b")) - col("_i")))
          .filter(col("jaccard") >= 0.5)
          .select(col("batch_id").as(idCol)).distinct()
        bWithin.join(pairs, Seq(idCol), "left_anti").localCheckpoint()
      }
      println(s"PROF survivors=${out.count()}")
    }
    Bench.rmDir(pagesDir); Bench.rmDir(histDir)
    spark.stop()
  }
}
