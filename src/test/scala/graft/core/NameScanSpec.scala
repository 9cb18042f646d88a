package graft.core

import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Differential fuzz: NameScan must emit exactly the matches of
  * NAME_PATTERN.finditer (start, group-1 start, group-1 end) on adversarial
  * generated text — suffix-pair labels, composite 환자\s*성명, odd
  * whitespace (NBSP/ideographic), fullwidth colons, truncated names. */
class NameScanSpec extends AnyFunSuite {

  private def regexMatches(text: String): Vector[(Int, Int, Int)] = {
    val m = PiiPatterns.namePattern.matcher(text)
    val b = Vector.newBuilder[(Int, Int, Int)]
    while (m.find()) b += ((m.start, m.start(1), m.end(1)))
    b.result()
  }

  private def scanMatches(text: String): Vector[(Int, Int, Int)] = {
    val b = Vector.newBuilder[(Int, Int, Int)]
    NameScan.scan(text)((s, n0, n1) => b += ((s, n0, n1)))
    b.result()
  }

  private val pieces = Array(
    "성명", "이름", "담당자", "감사담당자", "보증인", "연대보증인", "환자", "환자 성명",
    "환자성명", "수신", "원고", "김철수", "이영희박사님", "박", "가나", "가나다라마바사",
    ":", "：", " ", "  ", "\t", " ", "　", "\n", "x1", "abc", "담당",
    "명", "자", "12:30", "::", ": :", "피고", "채권자",
    // CPython counts U+001C-U+001F as \s; scanner + compiled pattern must agree
    "\u001c", "\u001d", "\u001e", "\u001f", "\u001c\u001c")

  test("differential fuzz: 20k random texts") {
    val rnd = new Random(42)
    for (i <- 1 to 20000) {
      val n = 1 + rnd.nextInt(12)
      val text = Seq.fill(n)(pieces(rnd.nextInt(pieces.length))).mkString
      val (r, s) = (regexMatches(text), scanMatches(text))
      assert(r == s, s"mismatch on <$text>: regex=$r scan=$s")
    }
  }

  test("corpus docs: scan equals regex on all 500 documents") {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    import scala.jdk.CollectionConverters._
    for (corpus <- Seq("combined_test_cases", "easy_200_test_cases")) {
      val node = mapper.readTree(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"/root/reference/$corpus.json")))
      for (tc <- node.elements().asScala) {
        val t = tc.get("document_text").asText()
        assert(regexMatches(t) == scanMatches(t), s"mismatch on ${tc.get("id").asText()}")
      }
    }
  }
}
