package graft.tools

import graft.GraftSession
import graft.pipeline.{QualityPipeline, SyntheticPages}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stage-attribution profile of the quality pipeline on the bench workload
  * (sf0.1 pages ×rep): forces each cumulative stage prefix to a noop sink so
  * the per-stage marginal cost is visible. */
object ProfilePipeline {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val rep = sys.env.getOrElse("SPARK_GRAFT_REP", "200").toInt
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt, "profile-pipeline")

    val pages = SyntheticPages.fromDocuments(spark, sfDir)
      .withColumn("r", explode(sequence(lit(0), lit(rep - 1))))
      .withColumn("url", concat(col("url"), lit("?r="), col("r")))
      .drop("r")

    def force(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(label: String)(df: => DataFrame): Double = {
      force(df) // warm
      val t0 = System.nanoTime(); force(df)
      val s = (System.nanoTime() - t0) / 1e9
      println(f"PROF $label%-22s $s%8.2f s")
      s
    }

    time("scan_only")(pages)
    time("extract")(QualityPipeline.extract(pages))
    time("extract+langid")(QualityPipeline.langIdStage(QualityPipeline.extract(pages)))
    time("extract+quality")(QualityPipeline.qualityStage(
      QualityPipeline.langIdStage(QualityPipeline.extract(pages))
        .withColumn("lang_pred", lit("en")).withColumn("lang_conf", lit(1.0))))
    time("full_run")(QualityPipeline.run(pages))
    spark.stop()
  }
}
