package graft.operators

import graft.SparkSpecBase
import graft.functions.ExtractLinks
import org.apache.spark.sql.functions._

/** Link extraction edge cases + fixed-point PageRank invariants (symmetry,
  * hub dominance, bit-determinism under partition layout). */
class LinkGraphSpec extends SparkSpecBase {
  import spark.implicits._

  test("extract_links: quoting styles, red herrings, order and duplicates") {
    val html = """<div class="x>y"><a hreflang="en" href='/a'>a</a>""" +
      """<a data-href="no" href="/b">b</a><a target=_blank href=/c>c</a>""" +
      """<a title='it''s'>no href</a><a href="/a">dup</a></div>"""
    assert(ExtractLinks.links(html).toSeq == Seq("/a", "/b", "/c", "/a"))
    assert(ExtractLinks.links("<p>no links here</p>").isEmpty)
    assert(ExtractLinks.links("<a href=\"unterminated").isEmpty)
  }

  test("linkAnchors: hrefs pair with tag-stripped, whitespace-collapsed anchors") {
    val html = "<p><a href='/a'>alpha  <b>bold</b>\n tail</a> mid " +
      "<a data-href=\"no\" href=\"/b\">beta <i class=\"x>y\">it</i></a>" +
      "<a title='t'>no href text</a><a href=/c>last" // unterminated anchor
    assert(ExtractLinks.linkAnchors(html).toSeq == Seq(
      ("/a", "alpha bold tail"), ("/b", "beta it"), ("/c", "last")))
    // hrefs agree with extract_links on the same markup, always
    assert(ExtractLinks.linkAnchors(html).map(_._1).toSeq ==
      ExtractLinks.links(html).toSeq)
    // empty anchor bodies and </ABBR>-style lookalikes
    assert(ExtractLinks.linkAnchors("<a href=/x></a>").toSeq == Seq(("/x", "")))
    assert(ExtractLinks.linkAnchors("<a href=/x>see </abbr>more</a>").toSeq ==
      Seq(("/x", "see more")))
    // a bare '<' in body text (not followed by a letter, '/', '!' or '?' —
    // the HTML5 tag-open rule) is content, not a tag — it must not swallow
    // the real </a> terminator
    assert(ExtractLinks.linkAnchors("<a href=/x>5 < 6, x <= y</a> outside").toSeq ==
      Seq(("/x", "5 < 6, x <= y")))
  }

  test("extract_link_anchors column fn explodes to (href, anchor) rows") {
    val df = Seq("<a href='/p1'>one</a><a href='/p2'> two  words </a>")
      .toDF("html")
      .select(explode(graft.functions.ExtractLinks.extract_link_anchors(col("html"))).as("l"))
      .select("l.href", "l.anchor")
    assert(df.collect().map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("/p1", "one"), ("/p2", "two words")))
  }

  test("hostRank: symmetric cycle gets equal ranks; hub outranks leaves") {
    val cycle = Seq(("a", "b"), ("b", "a")).toDF("src", "dst")
    val cr = LinkGraph.hostRank(cycle, 10).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(cr("a") == cr("b"))
    assert(cr("a") > LinkGraph.Scale / 2) // cycle conserves most mass

    val star = (1 to 9).map(i => (s"leaf$i", "hub")).toDF("src", "dst")
    val sr = LinkGraph.hostRank(star, 10).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sr("hub") > 5 * sr("leaf1"), sr.toString)
    assert((1 to 9).map(i => sr(s"leaf$i")).distinct.size == 1)
  }

  test("hostRank is bit-deterministic under input layout") {
    val edges = (0L until 400L).flatMap { i =>
      Seq((s"h${i % 40}", s"h${(i * 7 + 1) % 40}"), (s"h${i % 40}", s"h${(i * 13 + 2) % 40}"))
    }.toDF("src", "dst").distinct()
    val r1 = LinkGraph.hostRank(edges, 10).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val r2 = LinkGraph.hostRank(edges.repartition(13), 10).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(r1 == r2)
    // total mass never exceeds the initial mass (truncation + dangling
    // drop only ever lose micro-units)
    assert(r1.values.sum <= 40L * LinkGraph.Scale)
  }
}
