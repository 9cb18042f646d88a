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
  *
  * Optional model stages (both fit their models from the input corpus
  * upstream of the scoring pass, broadcast-scored, no shuffle):
  *   SPARK_GRAFT_MAX_PPL=<double>     insert the KN-perplexity filter
  *   SPARK_GRAFT_MIN_QUALITY=<double> insert the trained classifier filter
  */
object PipelineMain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.001")
    val outDir = args.lift(1).getOrElse("/tmp/graft_pipeline_out")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt, "graft-pipeline")
    import spark.implicits._

    val pages = SyntheticPages.fromDocuments(spark, sfDir)
    var scored = QualityPipeline.qualityStage(
      QualityPipeline.langIdStage(QualityPipeline.extract(pages)))
    for (maxPpl <- sys.env.get("SPARK_GRAFT_MAX_PPL").map(_.toDouble)) {
      val lm = spark.sparkContext.broadcast(
        graft.filter.BigramLM.fit(pages.select("text").as[String]))
      scored = QualityPipeline.perplexityStage(scored, lm, maxPpl)
    }
    for (minQ <- sys.env.get("SPARK_GRAFT_MIN_QUALITY").map(_.toDouble)) {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      val model = spark.sparkContext.broadcast(graft.filter.QualityClassifier.fit(
        graft.filter.QualityClassifier.weakLabels(docs, col("doc_id"), col("text"))
          .select(col("text").as("_1"), col("y").as("_2")).as[(String, Double)]))
      scored = QualityPipeline.classifierStage(scored, model, minQ)
    }
    val result = QualityPipeline.checkpointStage(spark,
      QualityPipeline.piiStage(scored),
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
