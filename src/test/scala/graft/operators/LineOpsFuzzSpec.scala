package graft.operators

import graft.SparkSpecBase
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** Differential fuzz for the line-based operators (c4LineFilter,
  * lineShapeSignals) against a plain-JVM reference of the same rules, over
  * hostile random text (CR/LF/CRLF mixes, tabs, bullets, ellipses, quotes,
  * empty lines). Pins the subtle parts: Spark split keeps trailing empties
  * (Java's default drops them), Spark trim strips U+0020 only (Java trim
  * strips all ≤ 0x20), and the \z anchor vs Java's \r-tolerant $. */
class LineOpsFuzzSpec extends SparkSpecBase {
  import spark.implicits._

  // reference primitives mirroring Spark semantics exactly
  private def sparkTrim(s: String): String = {
    var b = 0; var e = s.length
    while (b < e && s.charAt(b) == ' ') b += 1
    while (e > b && s.charAt(e - 1) == ' ') e -= 1
    s.substring(b, e)
  }
  private def lines(text: String): Array[String] = text.split("\r?\n", -1)
  private val term = java.util.regex.Pattern.compile("[.!?\"]\\z")
  private val bullet = java.util.regex.Pattern.compile("^[•*-]")
  private val ellip = java.util.regex.Pattern.compile("(\\.\\.\\.|…)\\z")
  private def words(t: String): Int = t.split("\\s+", -1).length

  private def randDoc(rnd: scala.util.Random): String = {
    val pieces = Seq("word", "line.", "•", "-", "*", "...", "…", "\"", "ok!",
      "a b", "?", " ", "\t", "", "end.")
    val seps = Seq("\n", "\r\n", "\r", " ", "")
    (1 to (1 + rnd.nextInt(12))).map { _ =>
      pieces(rnd.nextInt(pieces.size)) + seps(rnd.nextInt(seps.size))
    }.mkString
  }

  test("c4LineFilter matches the JVM reference on hostile random text") {
    val rnd = new scala.util.Random(20260817L)
    val docs = (1L to 120L).map(i => (i, randDoc(rnd)))
    val got = ExactSubstring.c4LineFilter(docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Int]("n_lines"), r.getAs[Int]("n_lines_kept"),
          r.getAs[String]("text_filtered"))).toMap
    for ((id, text) <- docs) {
      val ls = lines(text)
      val kept = ls.filter { l =>
        val t = sparkTrim(l)
        term.matcher(t).find() && words(t) >= 3
      }
      assert(got(id) == ((ls.length, kept.length, kept.mkString("\n"))),
        s"doc $id drifted on ${text.replace("\r", "\\r").replace("\n", "\\n")}")
    }
  }

  test("lineShapeSignals matches the JVM reference on hostile random text") {
    val rnd = new scala.util.Random(99260817L)
    val docs = (1L to 120L).map(i => (i, randDoc(rnd)))
    val got = docs.toDF("doc_id", "text")
      .select(col("doc_id"), TextFunctions.lineShapeSignals(col("text")).as("s"))
      .select(col("doc_id"), col("s.n_lines"), col("s.frac_bullet"), col("s.frac_ellipsis"))
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2), r.getDouble(3)))).toMap
    for ((id, text) <- docs) {
      val ts = lines(text).map(sparkTrim)
      val n = ts.length
      val fb = ts.count(t => bullet.matcher(t).find()).toDouble / n
      val fe = ts.count(t => ellip.matcher(t).find()).toDouble / n
      assert(got(id) == ((n, fb, fe)),
        s"doc $id drifted on ${text.replace("\r", "\\r").replace("\n", "\\n")}")
    }
  }
}
