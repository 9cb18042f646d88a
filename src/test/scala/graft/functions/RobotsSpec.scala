package graft.functions

import graft.SparkSpecBase
import graft.functions.RobotsAllowed.{allowed, parse, pathOf}
import org.apache.spark.sql.functions._

/** RFC 9309 robots.txt semantics: group selection, wildcard/$ patterns,
  * longest-match with Allow tie-break, empty Disallow, URL→path reduction. */
class RobotsSpec extends SparkSpecBase {
  import spark.implicits._

  private val robots =
    """# corpus crawl policy
      |User-agent: *
      |Disallow: /private/
      |Allow: /private/public/
      |Disallow: /tmp/*.pdf$
      |Disallow: /search
      |Allow: /search/about
      |
      |USER-AGENT: graftbot
      |disallow: /graft-only/
      |""".stripMargin

  private def ok(path: String, agent: String = "*"): Boolean =
    allowed(parse(robots, agent), path)

  test("longest-match with Allow override and $-anchored wildcards") {
    assert(ok("/index.html"))
    assert(!ok("/private/a"))
    assert(ok("/private/public/x")) // longer Allow beats shorter Disallow
    assert(!ok("/tmp/file.pdf")) // * then $ anchor
    assert(!ok("/tmp/a/b/file.pdf"))
    assert(ok("/tmp/file.pdfx")) // $ rejects a longer path
    assert(ok("/tmp/file.pdf?x")) // query breaks the $ anchor
    assert(!ok("/search"))
    assert(!ok("/searchy")) // prefix pattern
    assert(ok("/search/about"))
  }

  test("exact agent group replaces the * group entirely") {
    assert(ok("/private/a", "graftbot")) // * rules don't apply
    assert(!ok("/graft-only/x", "graftbot"))
    assert(ok("/graft-only/x")) // and vice versa
    assert(ok("/anything", "unknown-bot") == ok("/anything")) // falls back to *
  }

  test("equal-length Allow and Disallow: Allow wins; empty Disallow allows all") {
    val tie = "User-agent: *\nDisallow: /p\nAllow: /p\n"
    assert(allowed(parse(tie, "*"), "/page"))
    val empty = "User-agent: *\nDisallow:\n"
    assert(allowed(parse(empty, "*"), "/anything"))
    assert(allowed(Array.empty[RobotsAllowed.Rule], "/x")) // no robots at all
  }

  test("URL reduces to path+query; fragment dropped; bare host is /") {
    assert(pathOf("https://h.example.com/a/b?q=1#frag") == "/a/b?q=1")
    assert(pathOf("https://h.example.com") == "/")
    assert(pathOf("/already/a/path") == "/already/a/path")
  }

  test("expression evaluates per row over full URLs") {
    val df = Seq(
      ("https://h.example.com/private/x", false),
      ("https://h.example.com/private/public/x", true),
      ("https://h.example.com/ok.html", true))
      .toDF("url", "want")
    val got = df.select(col("want"),
        RobotsAllowed.robots_allowed(lit(robots), col("url")).as("got"))
      .collect()
    got.foreach(r => assert(r.getBoolean(0) == r.getBoolean(1), r.toString))
  }
}
