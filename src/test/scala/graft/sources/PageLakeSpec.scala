package graft.sources

import graft.SparkSpecBase
import graft.pipeline.SyntheticPages
import org.apache.spark.sql.functions._

class PageLakeSpec extends SparkSpecBase {

  private lazy val lakeDir: String = {
    val d = java.nio.file.Files.createTempDirectory("pagelake").toString
    // spread warc_ts over several days so multiple partitions exist
    val pages = SyntheticPages.fromDocuments(spark, sfDir)
      .withColumn("warc_ts", timestamp_seconds(
        unix_timestamp(col("warc_ts")) + (abs(hash(col("url"))) % 5) * 86400L))
    PageLake.write(pages, d)
    d
  }

  test("round-trip preserves rows and text byte-identically") {
    val orig = SyntheticPages.fromDocuments(spark, sfDir)
      .select("url", "text").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val back = PageLake.read(spark, lakeDir)
      .select("url", "text").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(back == orig)
  }

  test("hive-style date partitions exist on disk") {
    val dirs = new java.io.File(lakeDir).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("crawl_date="))
    assert(dirs.length >= 2, s"expected multiple date partitions, got ${dirs.toSeq}")
  }

  test("date filter prunes partitions at the scan") {
    val day = PageLake.read(spark, lakeDir)
      .select(col("crawl_date").cast("string")).distinct().orderBy("crawl_date")
      .head().getString(0)
    val df = PageLake.readDay(spark, lakeDir, day)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(crawl_date"), s"no partition filter:\n$plan")
    val scanned = df.count()
    val total = PageLake.read(spark, lakeDir).count()
    assert(scanned < total && scanned > 0)
  }
}
