package graft.pipeline

import graft.GraftSession
import graft.sources.PageLake
import org.apache.spark.sql.functions._

/** The spark-submit entry for the full quality-filter + PII-scrub pipeline:
  *
  *   pages → extract → langid → quality → scrub
  *         → checkpointed result stage (exact resume after failure)
  *         → kept-pages lake (date-partitioned parquet)
  *         → lineage + per-host metrics tables
  *
  * Usage: PipelineMain [sfDir] [outDir]. At cluster scale the same main runs
  * under spark-submit with the input path pointing at the crawl lake; here
  * pages are synthesized deterministically from the driver fixtures.
  */
object PipelineMain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.001")
    val outDir = args.lift(1).getOrElse("/tmp/graft_pipeline_out")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt, "graft-pipeline")

    val result = QualityPipeline.checkpointStage(spark,
      QualityPipeline.run(SyntheticPages.fromDocuments(spark, sfDir)),
      outDir, "scored", QualityPipeline.inputFingerprint(sfDir))

    // kept pages → partitioned lake (the pipeline's product)
    PageLake.write(
      result.filter(col("keep"))
        .select(col("url"), col("warc_ts"),
          encode(concat(lit("<html><body>"), col("text_scrubbed"), lit("</body></html>")), "UTF-8").as("html"),
          col("text_scrubbed").as("text"), col("lang_pred").as("lang")),
      s"$outDir/kept_pages")

    // lineage + metrics side-outputs
    QualityPipeline.lineage(result, "scored")
      .write.mode("overwrite").parquet(s"$outDir/lineage")
    QualityPipeline.hostRollup(result)
      .write.mode("overwrite").parquet(s"$outDir/host_metrics")

    val s = result.agg(
      count(lit(1)), sum(when(col("keep"), 1L).otherwise(0L)),
      sum(when(col("n_pii") > 0, 1L).otherwise(0L)), sum(col("n_pii"))).head()
    println(s"pages=${s.getLong(0)} kept=${s.getLong(1)} " +
      s"pii_pages=${s.getLong(2)} pii_items=${s.getLong(3)} out=$outDir")
    spark.stop()
  }
}
