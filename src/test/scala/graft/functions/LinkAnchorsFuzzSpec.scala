package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Seeded fuzz for the shared `<a>` scanner: on ANY input — torn tags,
  * nested quotes, bare '<' in text, unterminated anchors — the anchor
  * extractor must (1) never throw, (2) emit hrefs that pair EXACTLY 1:1,
  * in order, with `extract_links` (both ride one scanner; this is the
  * invariant that makes the pairing trustworthy), and (3) return anchors
  * that are whitespace-collapsed (no run of blanks, no leading/trailing
  * blank, no raw newline/tab survives the collapse). */
class LinkAnchorsFuzzSpec extends AnyFunSuite {

  // markup-shaped fragments: tag opens/closes, quote styles, href-bearing
  // and href-less anchors, red herrings, bare '<'/'>' as content
  private val alphabet: Array[String] = Array(
    "<a href='/x'>", "<a href=\"/y\">", "<a href=/z>", "<a>", "</a>", "</a >",
    "<a hreflang='en' ", "<a data-href=\"no\" ", "href='/q'", "href=\"/r\"",
    "href=/s", ">", "<", "<b>", "</b>", "<i class=\"x>y\">", "</i>",
    "<abbr>", "</abbr>", "<A HREF='/UP'>", "</A>",
    "text", "5 < 6", "x <= y", "a > b", " ", "\n", "\t", "  ", "'", "\"",
    "&amp;", "<!-- c -->", "<a href='un", "terminated", "=", "/p1",
    // a commented-out close tag inside an anchor body: the inner-tag skip
    // is NOT comment-aware (documented in linkAnchors) — this fragment
    // pins that the chosen behavior at least keeps the 1:1 href pairing
    "<!-- </a> -->")

  test("commented-out </a> inside an anchor body: documented termination, hrefs unaffected") {
    val html = "<a href=x>t <!-- </a> --> u</a><a href=y>v</a>"
    val pairs = ExtractLinks.linkAnchors(html)
    // hrefs always pair 1:1 with extract_links, comment or not
    assert(pairs.map(_._1).toSeq == ExtractLinks.links(html).toSeq)
    assert(pairs.map(_._1).toSeq == Seq("x", "y"))
    // the documented (non-comment-aware) behavior: the inner-tag skip eats
    // '<!-- </a' up to the comment's first '>', the comment tail '-- >'
    // leaks into the body, and the real '</a>' terminates normally
    assert(pairs.map(_._2).toSeq == Seq("t --> u", "v"))
  }

  test("20k seeded random markups: no throw, hrefs pair 1:1 with extract_links, anchors collapsed") {
    val rnd = new scala.util.Random(20260819L)
    for (i <- 0 until 20000) {
      val n = rnd.nextInt(24)
      val html = Seq.fill(n)(alphabet(rnd.nextInt(alphabet.length))).mkString
      val pairs = ExtractLinks.linkAnchors(html) // (1) must not throw
      val hrefs = ExtractLinks.links(html)
      assert(pairs.map(_._1).toSeq == hrefs.toSeq,
        s"case $i: href streams diverge on ${html.replace("\n", "\\n")}")
      for ((_, anchor) <- pairs) {
        assert(!anchor.exists(c => c == '\n' || c == '\t'),
          s"case $i: uncollapsed whitespace in '$anchor'")
        assert(!anchor.contains("  "), s"case $i: blank run in '$anchor'")
        assert(anchor == anchor.trim, s"case $i: untrimmed '$anchor'")
      }
    }
  }
}
