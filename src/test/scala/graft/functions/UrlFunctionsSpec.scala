package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.functions.col

class UrlFunctionsSpec extends SparkSpecBase {
  import spark.implicits._

  private def canon(urls: String*): Seq[(String, String, String)] =
    urls.toDF("url").select(
        UrlFunctions.canonicalizeUrl(col("url")),
        UrlFunctions.hostOf(col("url")),
        UrlFunctions.domainOf(col("url")))
      .collect().toSeq.map(r => (r.getString(0), r.getString(1), r.getString(2)))

  test("strips fragment, tracking params, default port, www; lowercases scheme+host") {
    val Seq((c, h, d)) = canon(
      "HTTPS://WWW.News.Example.COM:443/A/B?utm_source=x&id=7&ref=tw#top")
    assert(c == "https://news.example.com/A/B?id=7")
    assert(h == "news.example.com")
    assert(d == "example.com")
  }

  test("path and query case are preserved; non-default port kept in path form") {
    val Seq((c, _, _)) = canon("http://a.org/Path/To?Q=Vv")
    assert(c == "http://a.org/Path/To?Q=Vv")
  }

  test("all-tracking query collapses away entirely") {
    val Seq((c, _, _)) = canon("http://www.a.org:80/x?utm_a=1&utm_b=2#f")
    assert(c == "http://a.org/x")
  }

  test("tracking-only tail and interior params normalize separators") {
    val Seq((c, _, _)) = canon("https://b.io/p?id=1&utm_c=z&k=2")
    assert(c == "https://b.io/p?id=1&k=2")
  }

  test("hosts with one label yield empty registered domain, not a crash") {
    val Seq((_, h, d)) = canon("https://localhost/x")
    assert(h == "localhost")
    assert(d == "")
  }
}
