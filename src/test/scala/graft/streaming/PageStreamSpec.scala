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

  test("streamed lake ingestion: appends accumulate, manifest stays fresh, reruns add nothing") {
    import graft.sources.PageLake
    val inDir = Files.createTempDirectory("lakestream_in").toString
    val lakeDir = Files.createTempDirectory("lakestream_lake").toString
    val ckDir = Files.createTempDirectory("lakestream_ck").toString
    val pages = SyntheticPages.fromDocuments(spark, sfDir)
    val half1 = pages.filter(abs(hash(col("url"))) % 2 === 0)
    val half2 = pages.filter(abs(hash(col("url"))) % 2 === 1)
    def keptUrls(src: org.apache.spark.sql.DataFrame): Set[String] =
      QualityPipeline.run(src).filter(col("keep"))
        .select("url").collect().map(_.getString(0)).toSet

    half1.write.mode("append").parquet(inDir)
    PageStream.runIntoLake(spark, inDir, lakeDir, ckDir)
    assert(PageLake.read(spark, lakeDir).select("url")
      .collect().map(_.getString(0)).toSet == keptUrls(half1))
    // manifest is fresh after the streamed append (path set == listing)
    val m1 = PageLake.readManifest(spark, lakeDir).get.map(_.path).toSet
    assert(m1 == PageLake.liveFiles(spark, lakeDir))

    half2.write.mode("append").parquet(inDir)
    PageStream.runIntoLake(spark, inDir, lakeDir, ckDir)
    val wantAll = keptUrls(pages)
    assert(PageLake.read(spark, lakeDir).select("url")
      .collect().map(_.getString(0)).toSet == wantAll)
    val rowsAfter2 = PageLake.read(spark, lakeDir).count()

    // rerun with nothing new: no duplicate appends
    PageStream.runIntoLake(spark, inDir, lakeDir, ckDir)
    assert(PageLake.read(spark, lakeDir).count() == rowsAfter2)
    // bucket-pruned reads stay exact over the streamed-in lake
    val b = PageLake.read(spark, lakeDir).select("url_bucket").head().getInt(0)
    val direct = PageLake.read(spark, lakeDir).filter(col("url_bucket") === b).count()
    assert(PageLake.readBuckets(spark, lakeDir, Seq(b)).count() == direct && direct > 0)
  }

  test("ingest protocol: a crashed partial append is rolled back, replay lands exactly once") {
    import graft.sources.PageLake
    val lakeDir = Files.createTempDirectory("lakestream_crash").toString
    // deterministic subset (an unordered limit() picks different rows per
    // evaluation — every action on `pages` must see the same set)
    val pages = SyntheticPages.fromDocuments(spark, sfDir)
      .filter(abs(hash(col("url"))) % 5 < 2)
      .select("url", "warc_ts", "html", "text", "lang")
    // batch 0 committed normally
    PageStream.ingestBatch(pages.filter(abs(hash(col("url"))) % 3 === 0), 0L, lakeDir)
    val committedRows = PageLake.read(spark, lakeDir).count()
    val batch1 = pages.filter(abs(hash(col("url"))) % 3 === 1)
    // simulate batch 1 CRASHING mid-append: intent written, partial data
    // landed, no commit marker
    val fs = new org.apache.hadoop.fs.Path(lakeDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val intent = new org.apache.hadoop.fs.Path(lakeDir, "_stream_commits/default/1.intent")
    fs.mkdirs(intent.getParent)
    val out = fs.create(intent, true)
    out.write(PageLake.liveFiles(spark, lakeDir).toSeq.sorted
      .mkString("\n").getBytes("UTF-8"))
    out.close()
    batch1.limit(37).write.mode("append") // the partial output of the crash
      .parquet(s"$lakeDir/crawl_date=2024-01-01")
    // compaction must refuse to run while the crashed ingest awaits replay
    // (it would invalidate the intent's listing and doom the rollback)
    intercept[IllegalStateException] { PageLake.compact(spark, lakeDir) }
    // replay: partial files rolled back, the batch lands exactly once
    PageStream.ingestBatch(batch1, 1L, lakeDir)
    // committed state again: compaction is allowed now
    PageLake.compact(spark, lakeDir)
    val urls = PageLake.read(spark, lakeDir).select("url")
      .collect().map(_.getString(0)).toSeq
    assert(urls.length == urls.distinct.length, "no duplicate rows after replay")
    assert(PageLake.read(spark, lakeDir).count() ==
      committedRows + batch1.count(), "batch 1 must land exactly once")
    // replaying the committed batch is a no-op
    PageStream.ingestBatch(batch1, 1L, lakeDir)
    assert(PageLake.read(spark, lakeDir).count() == committedRows + batch1.count())
  }
}
