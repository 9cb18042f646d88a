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

  test("params merely containing 'ref'/'utm' and path segments are NOT stripped") {
    val Seq((c1, _, _)) = canon("https://a.com/p?pref=1&id=2")
    assert(c1 == "https://a.com/p?pref=1&id=2")
    val Seq((c2, _, _)) = canon("https://a.com/ref=sr_1/dp/B01?id=3")
    assert(c2 == "https://a.com/ref=sr_1/dp/B01?id=3")
  }

  test("only the scheme's own default port is dropped; cross-scheme ports are real") {
    val Seq((c1, h1, _)) = canon("http://a.com:443/x")
    assert(c1 == "http://a.com:443/x" && h1 == "a.com:443")
    val Seq((c2, h2, _)) = canon("https://a.com:80/x")
    assert(c2 == "https://a.com:80/x" && h2 == "a.com:80")
  }

  test("non-default port stays in the host but never in the registered domain") {
    val Seq((_, h, d)) = canon("https://www.example.com:8443/x")
    assert(h == "example.com:8443")
    assert(d == "example.com") // blocklists/rollups must not split by port
  }

  test("userinfo is not part of the host or the registered domain") {
    val Seq((c, h, d)) = canon("https://alice@a.com/x")
    assert(h == "a.com" && d == "a.com" && c == "https://a.com/x")
  }

  test("hosts with one label yield empty registered domain, not a crash") {
    val Seq((_, h, d)) = canon("https://localhost/x")
    assert(h == "localhost")
    assert(d == "")
  }

  test("hostSuffixes: label-boundary suffixes, shallowest first, depth-capped") {
    def sfx(host: String, maxLabels: Int = 8): Seq[String] =
      Seq(host).toDF("h")
        .select(UrlFunctions.hostSuffixes(col("h"), maxLabels))
        .head().getSeq[String](0)
    assert(sfx("a.b.example.com") ==
      Seq("com", "example.com", "b.example.com", "a.b.example.com"))
    assert(sfx("a.b.example.com", maxLabels = 2) == Seq("com", "example.com"))
    assert(sfx("localhost") == Seq("localhost"))
    // the label boundary: a blocklist entry "tracker.net" matches by
    // EQUALITY against these suffixes, so "nottracker.net" can never hit it
    assert(!sfx("nottracker.net").contains("tracker.net"))
    assert(sfx("ads.tracker.net").contains("tracker.net"))
  }

  test("urlShapeSignals: depth, params, host digit/hyphen shape") {
    def sig(u: String): (Int, Int, Int, Int) = {
      val r = Seq(u).toDF("u")
        .select(UrlFunctions.urlShapeSignals(col("u")).as("s"))
        .select("s.path_depth", "s.n_params", "s.host_digit_permille", "s.host_hyphens")
        .head()
      (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3))
    }
    assert(sig("https://example.org") == ((0, 0, 0, 0)))
    assert(sig("https://example.org/a/b/c?x=1&y=2") == ((3, 2, 0, 0)))
    // fragment never counts as path or params
    assert(sig("https://example.org/a#frag?fake=1") == ((1, 0, 0, 0)))
    // digit/hyphen-stuffed host: 5 digits of 13 chars → 384 permille
    assert(sig("https://dl-0000-3.biz/x") == ((1, 0, 384, 2)))
  }
}
