package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The spark.sql.extensions packaging: a session created with
  * `spark.sql.extensions=graft.GraftExtensions` exposes the engine's
  * functions to pure SQL (the spark-submit / thrift-server path). */
class GraftExtensionsSpec extends AnyFunSuite {

  test("extensions register detect/scrub/quality functions for SQL sessions") {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("ext-spec")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val scrubbed = spark.sql(
        "SELECT scrub_pii('문의: kim.cs@corp.co.kr 주민등록번호 850315-1234567 끝') AS s")
        .head().getString(0)
      assert(scrubbed == "문의: [이메일] 주민등록번호 [주민등록번호] 끝")
      val detected = spark.sql(
        "SELECT detect_pii('연락처 010-1234-5678').`전화번호` AS p").head().getSeq[String](0)
      assert(detected == Seq("010-1234-5678"))
      val rep = spark.sql("SELECT repetition_ratio('a b a b a b') AS r").head().getDouble(0)
      assert(rep > 0.3)
      val lang = spark.sql("SELECT langid('the quick brown fox and the lazy dog of the north').lang AS l")
        .head().getString(0)
      assert(lang == "en")
      val ccnet = spark.sql("SELECT ccnet_normalize('Share on FACEBOOK - 1,234 Likes!!!') AS n")
        .head().getString(0)
      assert(ccnet == "share on facebook 0000 likes")
      assert(spark.sql("SELECT luhn_valid('4111-1111-1111-1111') AS v").head().getBoolean(0))
      assert(!spark.sql("SELECT luhn_valid('4111-1111-1111-1112') AS v").head().getBoolean(0))
      assert(spark.sql("SELECT rrn_valid('900101-1234568') AS v").head().getBoolean(0))
      assert(!spark.sql("SELECT rrn_valid('900101-1234567') AS v").head().getBoolean(0))
      assert(spark.sql("SELECT winnow_fingerprint('some reasonably long text for fingerprinting') AS f")
        .head().getSeq[Long](0).nonEmpty)
      assert(spark.sql("SELECT extract_links('<a href=/a>x</a><a href=\"/b\">y</a>') AS l")
        .head().getSeq[String](0) == Seq("/a", "/b"))
      val anchor = spark.sql(
        "SELECT extract_link_anchors('<a href=/a>one <b>two</b></a>')[0] AS p").head()
        .getStruct(0)
      assert(anchor.getString(0) == "/a" && anchor.getString(1) == "one two")
      // redundancy detector: looped boilerplate compresses far below prose
      val Seq(spam, prose) = Seq(
        "SELECT deflate_ratio(repeat('click here to win big prizes now ', 40)) AS r",
        "SELECT deflate_ratio('A quiet morning fog rolled over the harbor while fishermen argued about tides, gulls, rope prices, and the stubborn engine nobody could fix.') AS r")
        .map(q => spark.sql(q).head().getDouble(0))
      assert(spam < 0.15, s"boilerplate should compress hard: $spam")
      assert(prose > 0.5, s"prose should not: $prose")
      assert(spam < prose)
    } finally {
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
