package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** jusText-style HTML extraction: block segmentation, link/length/stopword
  * classification, context revision, and the corpus-wide recovery property
  * the q68 oracle pins (body text survives a boilerplate sandwich exactly).
  */
class HtmlExtractSpec extends SparkSpecBase {
  import spark.implicits._

  private def extract(html: String): String =
    Seq(html).toDF("html")
      .select(HtmlFunctions.justext_extract(col("html")).as("t"))
      .collect().head.getString(0)

  private val prose1 = "The committee published its annual findings on river water " +
    "quality this week, noting a steady improvement across all monitored basins " +
    "since the new treatment plants came online in the spring of last year."
  private val prose2 = "Local officials credited the change to sustained investment " +
    "in wastewater infrastructure and to stricter enforcement of discharge permits, " +
    "while cautioning that two downstream stations still show elevated nitrate levels."

  test("nav bars, copyright footers and link-heavy blocks die; prose survives") {
    val html =
      s"""<html><head><title>T</title><style>p{color:red}</style></head><body>
         |<nav><a href="/">Home</a> <a href="/a">About</a> <a href="/c">Contact</a></nav>
         |<p>$prose1</p>
         |<p>$prose2</p>
         |<div class="footer">© 2026 Example Corp. All rights reserved.</div>
         |</body></html>""".stripMargin
    assert(extract(html) == s"$prose1\n$prose2")
  }

  test("short block sandwiched between good blocks survives; between bad and good dies") {
    val kept = s"<p>$prose1</p><p>A short middle note.</p><p>$prose2</p>"
    assert(extract(kept) == s"$prose1\nA short middle note.\n$prose2")
    val dropped =
      s"""<div><a href="/x">Login</a> <a href="/y">Register</a></div>
         |<p>Read more</p><p>$prose1</p>""".stripMargin
    assert(extract(dropped) == prose1)
  }

  test("single lone paragraph needs lengthHigh to stand without context") {
    assert(extract(s"<p>$prose1</p>") == prose1) // > 200 chars → good outright
    assert(extract("<p>A lone medium-length paragraph that clears seventy " +
      "characters but not the two hundred bar.</p>") == "") // near-good, bad edges
  }

  test("script/style/comment content is dropped; entities decode; attrs with '>' are safe") {
    val html = s"""<p>$prose1</p><script>if (1 > 0) alert("x");</script>
      |<!-- hidden -->
      |<p data-x="a>b">Tom &amp; Jerry &lt;3 &quot;quoted&quot; &#8212; d&#x2019;accord,
      | and the rest of this sentence pads the block comfortably past the length
      | gate so the classifier keeps it on its own merits.</p>""".stripMargin
    val got = extract(html)
    assert(got.contains("Tom & Jerry <3 \"quoted\" — d’accord"), got)
    assert(!got.contains("alert") && !got.contains("hidden"), got)
  }

  test("control-character numeric references are rejected, not injected into clean text") {
    // &#0;/&#8; would put raw NUL/backspace bytes into the text that dedup
    // and scrubbing consume downstream; they pass through like unknown
    // entities. Printable refs (and tab/newline) still decode.
    val html = s"<p>$prose1 null&#0;byte back&#x8;space dash&#8212;here.</p>"
    val got = extract(html)
    assert(!got.exists(c => c < ' ' && c != '\n'),
      s"control char leaked: ${got.map(_.toInt).filter(_ < 32)}")
    assert(got.contains("null&#0;byte") && got.contains("back&#x8;space"), got)
    assert(got.contains("dash—here"), got)
    // DEL and the C1 range (0x7F–0x9F) are control injections too — per the
    // HTML spec &#128;–&#159; are cp1252 mojibake, never intentional C1
    val c1 = extract(s"<p>$prose1 del&#127;here c-one&#x85;ref win&#146;quote.</p>")
    assert(!c1.exists(c => c >= 0x7f && c <= 0x9f),
      s"C1/DEL leaked: ${c1.map(_.toInt).filter(c => c >= 0x7f && c <= 0x9f)}")
    assert(c1.contains("del&#127;here") && c1.contains("c-one&#x85;ref") &&
      c1.contains("win&#146;quote"), c1)
  }

  test("whitespace collapses to single spaces across inline tags") {
    val padded = s"<p>  ${prose1.replace(" ", "\n  ")}  <b>  </b></p>"
    assert(extract(padded) == prose1)
  }

  test("self-closing skip tags do not swallow the rest of the document") {
    val html = s"<p>$prose1</p><iframe src='ad'/><p>$prose2</p>"
    assert(extract(html) == s"$prose1\n$prose2")
  }

  test("single <br> is inline whitespace; <br><br> breaks the block") {
    // hard-wrapped prose: each fragment < lengthLow, but single <br>s keep
    // it ONE block that clears lengthHigh on its own
    val words = prose1.split(" ")
    val wrapped = words.grouped(8).map(_.mkString(" ")).mkString("<br>")
    assert(extract(s"<p>$wrapped</p>") == prose1)
    // a double <br> is a paragraph boundary: the short tail is its own
    // block, kept via good-good context
    val doubled = s"<p>$prose1<br><br>A short middle note.<br/><br/>$prose2</p>"
    assert(extract(doubled) == s"$prose1\nA short middle note.\n$prose2")
  }

  test("stopword mode: wordy low-stopword spam dies, prose survives") {
    val sw = Set("the", "a", "of", "to", "and", "in", "is", "that", "its", "on",
      "this", "all", "since", "new", "came", "while", "two", "still", "show")
    val spam = "buy cheap pills casino poker viagra discount luxury watches " * 6
    val html = s"<p>$prose1</p><p>${spam.trim}</p>"
    val got = Seq(html).toDF("html")
      .select(HtmlFunctions.justext_extract(col("html"), sw).as("t"))
      .collect().head.getString(0)
    assert(got == prose1, got)
  }

  test("per-language second pass: en stopword mode kills keyword spam the language-independent pass keeps") {
    import graft.pipeline.QualityPipeline
    val spam = ("buy cheap pills casino poker luxury watches discount deals " * 6).trim
    // stopword-saturated English prose, > 200 chars, no links, no ©
    val proseEn = "It is the case that all of the people who were there at the " +
      "time had been told about the change, and most of them said that they " +
      "would have done the same if they had known what we know now about how " +
      "it was going to turn out in the end."
    val koSent = ("오늘 회의에서는 새로운 정책과 예산 계획에 대한 자세한 내용을 " +
      "위원들과 함께 오랫동안 논의하였습니다. ") * 5
    val htmlEn = "<html><body><nav><a href='/'>Home</a> <a href='/a'>About</a>" +
      s"</nav><p>$proseEn</p><p>$spam</p></body></html>"
    val htmlKo = s"<html><body><p>${koSent.trim}</p><p>$spam</p></body></html>"
    val pages = Seq(
      ("https://en.example.org/x", htmlEn, ""),
      ("https://ko.example.org/x", htmlKo, ""),
      ("https://pre.example.org/x", htmlEn, "already extracted"))
      .toDF("url", "html_s", "text")
      .withColumn("html", encode(col("html_s"), "UTF-8"))
      .withColumn("warc_ts", timestamp_seconds(lit(1700000000L)))
      .withColumn("lang", lit(""))
      .drop("html_s")
    def texts(df: org.apache.spark.sql.DataFrame): Map[String, String] =
      df.select("url", "text").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
    val indep = texts(QualityPipeline.htmlExtractStage(pages))
    val byLang = texts(QualityPipeline.htmlExtractByLangStage(pages))
    // the improvement: language-independent extraction keeps the long,
    // link-free spam block; the en stopword pass classifies it bad
    assert(indep("https://en.example.org/x").contains("casino"))
    assert(!byLang("https://en.example.org/x").contains("casino"))
    assert(byLang("https://en.example.org/x").contains("It is the case"))
    // unlisted language (ko): falls back to the language-independent draft
    assert(byLang("https://ko.example.org/x").contains("casino"))
    assert(byLang("https://ko.example.org/x").contains("오늘"))
    // pages arriving WITH text keep it verbatim in both modes
    assert(byLang("https://pre.example.org/x") == "already extracted")
    assert(indep("https://pre.example.org/x") == "already extracted")
    // config-gated full chain from raw html (no text column at all)
    val kept = QualityPipeline.runFromHtml(pages.drop("text"),
      QualityPipeline.Config(justextByLang = true))
    assert(kept.columns.contains("keep") && kept.count() == 3)
  }

  test("corpus recovery: body text survives a boilerplate sandwich byte-exactly") {
    // the q68 construction: nav + good prose + body + good prose + footer;
    // expected output is p1\nbody\np2 for EVERY doc (short bodies inherit
    // good context, long ones stand alone)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
    val html = concat(
      lit("<html><body><nav><a href='/'>Home</a> <a href='/s'>Shop</a> " +
        "<a href='/c'>Cart</a></nav>"),
      lit(s"<p>$prose1</p><p>"), col("text"), lit(s"</p><p>$prose2</p>"),
      lit("<footer>© 2026 Example Corp</footer></body></html>"))
    val bad = docs.select(col("doc_id"), col("text"),
        HtmlFunctions.justext_extract(html).as("got"))
      .filter(col("got") =!= concat(lit(s"$prose1\n"), col("text"), lit(s"\n$prose2")))
      .count()
    assert(bad == 0)
  }
}
