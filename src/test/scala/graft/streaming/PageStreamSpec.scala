package graft.streaming

import graft.SparkSpecBase
import graft.pipeline.{QualityPipeline, SyntheticPages}
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Streaming quality pipeline: result equality with the batch chain,
  * incremental pickup of newly-arrived files, and exactly-once resume. */
class PageStreamSpec extends SparkSpecBase {

  test("streamed pipeline equals the batch pipeline; new files picked up; no re-processing") {
    val inDir = Files.createTempDirectory("pagestream_in").toString
    val outDir = Files.createTempDirectory("pagestream_out").toString
    val ckDir = Files.createTempDirectory("pagestream_ck").toString
    val pages = SyntheticPages.fromDocuments(spark, sfDir)
    val half1 = pages.filter(abs(hash(col("url"))) % 2 === 0)
    val half2 = pages.filter(abs(hash(col("url"))) % 2 === 1)
    half1.write.mode("append").parquet(inDir)

    def key(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.select(concat_ws("|", col("url"), col("keep").cast("string"),
          col("n_pii").cast("string"), md5(col("text_scrubbed"))))
        .collect().map(_.getString(0)).sorted.toSeq

    // drain 1: first half
    PageStream.runAvailable(spark, inDir, outDir, ckDir)
    assert(key(spark.read.parquet(outDir)) == key(QualityPipeline.run(half1)
      .select("url", "keep", "n_pii", "text_scrubbed")))

    // drain 2 after more files land: ONLY the new files are processed,
    // output accumulates to the full batch answer
    half2.write.mode("append").parquet(inDir)
    PageStream.runAvailable(spark, inDir, outDir, ckDir)
    val want = key(QualityPipeline.run(pages)
      .select("url", "keep", "n_pii", "text_scrubbed"))
    assert(key(spark.read.parquet(outDir)) == want)

    // drain 3 with nothing new: exactly-once — no duplicates appended
    PageStream.runAvailable(spark, inDir, outDir, ckDir)
    assert(key(spark.read.parquet(outDir)) == want)
  }
}
