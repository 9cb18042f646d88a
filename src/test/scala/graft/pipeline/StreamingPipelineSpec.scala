package graft.pipeline

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The pipeline stages are pure narrow transforms, so the SAME code serves
  * batch and Structured Streaming: a file stream of page parquet through
  * QualityPipeline.run must produce exactly the batch result, and a second
  * run over the same checkpoint must not reprocess (exactly-once ingest). */
class StreamingPipelineSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val pagesDir: String = {
    val d = java.nio.file.Files.createTempDirectory("pages-stream").toString
    SyntheticPages.fromDocuments(spark, sfDir).write.mode("overwrite").parquet(d)
    d
  }

  test("streaming pipeline output equals the batch pipeline output") {
    val schema = spark.read.parquet(pagesDir).schema
    val streamIn = spark.readStream.schema(schema).parquet(pagesDir)
    val out = java.nio.file.Files.createTempDirectory("pipe-stream-out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("pipe-stream-ckpt").toString

    def runOnce(): Unit = {
      val finished = QualityPipeline.run(streamIn)
        .select("url", "lang_pred", "keep", "n_pii", "text_scrubbed")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start().awaitTermination(120000)
      assert(finished, "streaming run did not finish within 120s")
    }

    runOnce()
    val streamed = spark.read.parquet(out)
    val batch = QualityPipeline.run(spark.read.parquet(pagesDir))
      .select("url", "lang_pred", "keep", "n_pii", "text_scrubbed")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    assert(canon(streamed) == canon(batch))

    // same checkpoint, no new files ⇒ nothing reprocessed (exactly-once)
    runOnce()
    assert(spark.read.parquet(out).count() == batch.count())
  }
}
