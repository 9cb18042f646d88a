package graft.streaming

import graft.pipeline.QualityPipeline
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

/** Structured-Streaming front end for the quality-filter + PII-scrub
  * pipeline: the SAME stage chain the batch runner uses
  * ([[QualityPipeline.run]] — every stage is a narrow projection, so it is
  * streaming-compatible with NO state store), applied continuously as page
  * files land in the crawl directory.
  *
  * Exactly-once contract: the file source tracks consumed input files in
  * the checkpoint and the file sink commits output files through its
  * transaction log, so a crash between micro-batches neither drops nor
  * duplicates pages — restarting with the same `checkpointDir` resumes
  * cleanly (spec-pinned: a second run over the same input appends
  * nothing). `Trigger.AvailableNow` drains everything currently present
  * and stops — the batch-shaped deployment (cron per crawl drop); a
  * continuous deployment passes a processing-time trigger instead.
  */
object PageStream {

  /** Streaming page scan: same schema as the lake
    * (url, warc_ts, html, text, lang). `maxFilesPerTrigger` bounds
    * micro-batch size so one giant crawl drop cannot blow a single batch. */
  def readPages(spark: SparkSession, path: String,
                maxFilesPerTrigger: Int = 64): DataFrame =
    spark.readStream
      .schema("url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(path)

  /** The scored stream: extract → langid → quality gates → PII scrub —
    * identical column contract to the batch pipeline. */
  def scored(pages: DataFrame,
             cfg: QualityPipeline.Config = QualityPipeline.Config()): DataFrame =
    QualityPipeline.run(pages, cfg)
      .select("url", "lang_pred", "keep", "drop_reasons", "n_pii", "text_scrubbed")

  /** Drain everything currently in `inDir` into `outDir` exactly once and
    * stop. Rerunning with the same `checkpointDir` processes only files
    * that arrived since the last run. */
  def runAvailable(spark: SparkSession, inDir: String, outDir: String,
                   checkpointDir: String,
                   cfg: QualityPipeline.Config = QualityPipeline.Config()): Unit = {
    val q = scored(readPages(spark, inDir), cfg)
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
