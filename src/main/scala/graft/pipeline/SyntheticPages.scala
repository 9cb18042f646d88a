package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic Common-Crawl-style page table (url, warc_ts, html, text,
  * lang) per BASELINE.json's input_hint, synthesized from the driver-provided
  * `documents` parquet — no external data, same rows at every run.
  *
  * The html column is a UTF-8 wrapper of the text so that extracted text per
  * url is byte-identical to the source document (the per-row invariant).
  */
object SyntheticPages {
  private val epoch = 1704067200L // 2024-01-01T00:00:00Z

  /** Every 5th page carries deterministic synthetic PII (email + phone) so
    * the scrub stage has real work on synthetic data. */
  def fromDocuments(spark: SparkSession, sfDir: String, hosts: Int = 50): DataFrame = {
    spark.read.parquet(s"$sfDir/documents.parquet")
      .repartition(spark.sparkContext.defaultParallelism * 2)
      .withColumn("page_text",
        when(pmod(col("doc_id"), lit(5)) === 0, piiText(col("text"), col("doc_id")))
          .otherwise(col("text")))
      .select(
        concat(lit("https://host-"), pmod(col("doc_id"), lit(hosts)),
          lit(".example.org/doc/"), col("doc_id")).as("url"),
        timestamp_seconds(lit(epoch) + col("doc_id")).as("warc_ts"),
        encode(concat(lit("<html><body>"), col("page_text"), lit("</body></html>")), "UTF-8").as("html"),
        col("page_text").as("text"),
        col("lang"))
  }

  /** Skewed variant: ~half of all pages land on one host — exercises the
    * salting path in host-level aggregations. */
  def skewed(spark: SparkSession, sfDir: String, hosts: Int = 50): DataFrame = {
    spark.read.parquet(s"$sfDir/documents.parquet")
      .repartition(spark.sparkContext.defaultParallelism * 2)
      .select(
      concat(lit("https://host-"),
        when(pmod(col("doc_id"), lit(2)) === 0, lit(0)).otherwise(pmod(col("doc_id"), lit(hosts))),
        lit(".example.org/doc/"), col("doc_id")).as("url"),
      timestamp_seconds(lit(epoch) + col("doc_id")).as("warc_ts"),
      encode(concat(lit("<html><body>"), col("text"), lit("</body></html>")), "UTF-8").as("html"),
      col("text"),
      col("lang"))
  }

  /** Deterministically append synthetic PII (an email + a mobile number
    * derived from doc_id) so the scrub stage has real work on synthetic data. */
  def piiText(text: org.apache.spark.sql.Column, docId: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    concat(text,
      lit(" 문의: user"), docId, lit("@corp.co.kr"),
      lit(" 전화 010-"), lpad(pmod(docId, lit(10000)).cast("string"), 4, "0"),
      lit("-"), lpad(pmod(docId * 7, lit(10000)).cast("string"), 4, "0"))
}
