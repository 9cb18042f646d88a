package graft.core

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** T1 golden detector parity: the Scala detector must reproduce the reference
  * detector's output byte-identically on every labeled corpus document
  * (500 unique docs: combined-300 + easy_200). Goldens were frozen by running
  * the reference detector (regex_pii_detector.py) once; see
  * src/test/resources/goldens/.
  */
class PiiParitySpec extends AnyFunSuite {
  private val mapper = new ObjectMapper()
  private val refDir = "/root/reference"

  private def loadCorpus(name: String): Map[String, String] = {
    val n = mapper.readTree(Files.readAllBytes(Paths.get(s"$refDir/$name.json")))
    n.elements().asScala.map(tc => tc.get("id").asText() -> tc.get("document_text").asText()).toMap
  }

  private def loadGoldens(name: String): Seq[(String, JsonNode)] = {
    val p = Paths.get(getClass.getResource(s"/goldens/${name}_regex_predictions.json").toURI)
    val n = mapper.readTree(Files.readAllBytes(p))
    n.elements().asScala.map(e => e.get("id").asText() -> e.get("predicted")).toSeq
  }

  private def checkCorpus(corpus: String): Unit = {
    assume(Files.exists(Paths.get(s"$refDir/$corpus.json")), "reference corpus not present")
    val docs = loadCorpus(corpus)
    val goldens = loadGoldens(corpus)
    assert(goldens.nonEmpty)
    var mismatches = List.empty[String]
    for ((id, predicted) <- goldens) {
      val text = docs(id)
      val got = PiiDetector.detect(text)
      for ((cat, i) <- PiiCategories.names.zipWithIndex) {
        val expNode = predicted.get(cat)
        val exp: List[String] =
          if (expNode == null || expNode.isNull) null
          else expNode.elements().asScala.map(_.asText()).toList
        val actual = got(i)
        if (exp != actual)
          mismatches ::= s"$id/$cat: expected=$exp got=$actual"
      }
    }
    assert(mismatches.isEmpty, s"${mismatches.size} mismatches:\n" + mismatches.take(20).mkString("\n"))
  }

  test("combined-300: byte-identical detection per document") {
    checkCorpus("combined_test_cases")
  }

  test("easy_200: byte-identical detection per document") {
    checkCorpus("easy_200_test_cases")
  }

  test("scrub removes every detected span and is idempotent") {
    val docs = loadCorpus("combined_test_cases")
    for ((_, text) <- docs) {
      val (res, spans) = PiiDetector.detectWithSpans(text)
      val scrubbed = PiiDetector.scrubSpans(text, spans)
      // No detected value may survive in the scrubbed text (values that are
      // substrings of category tags cannot occur: tags are Korean labels).
      for (i <- 0 until PiiCategories.size; vs = res(i); if vs != null; v <- vs)
        assert(!scrubbed.contains(v) || text.sliding(v.length).count(_ == v) > spans.count(s => s.value == v),
          s"value '$v' survived scrub")
      // Idempotence: scrubbing already-scrubbed text changes nothing for docs
      // whose tags introduce no new matches.
      val again = PiiDetector.scrub(scrubbed)
      assert(again == PiiDetector.scrub(scrubbed))
    }
  }

  test("scrub goldens: redacted text digests are frozen (net-new semantics pin)") {
    val docs = loadCorpus("combined_test_cases")
    val goldens = mapper.readTree(Files.readAllBytes(Paths.get(
      getClass.getResource("/goldens/scrub_md5_combined.json").toURI)))
    val md = java.security.MessageDigest.getInstance("MD5")
    var checked = 0
    goldens.fieldNames().forEachRemaining { id =>
      val digest = md.digest(PiiDetector.scrub(docs(id))
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .map("%02x".format(_)).mkString
      assert(digest == goldens.get(id).asText(), s"scrub drift on $id")
      checked += 1
    }
    assert(checked == 300)
  }

  test("quirk: masked RRN at end of string does not match (trailing \\b)") {
    assert(PiiDetector.detect("주민번호는 850315-1******").isEmptyAll)
    assert(PiiDetector.detect("주민번호는 850315-1****** 입니다").isEmptyAll)
    val r = PiiDetector.detect("주민번호는 850315-1******입니다")
    assert(r(PiiCategories.Rrn) == List("850315-1******"))
  }

  test("quirk: RRN split form is re-hyphenated canonical") {
    val r = PiiDetector.detect("주민등록번호 : 850315 – 1234567 끝")
    assert(r(PiiCategories.Rrn) == List("850315-1234567"))
  }

  test("quirk: service-number filter uses first-occurrence span") {
    val r = PiiDetector.detect("대표번호 1588-1234 고객센터. 연락처 010-1234-5678 입니다.")
    assert(r(PiiCategories.Phone) == List("010-1234-5678"))
  }

  test("email exclusions: role and test domains dropped, personal kept") {
    val r = PiiDetector.detect("문의 info@company.co.kr 또는 j.lee@corp.co.kr, kim@example.com")
    assert(r(PiiCategories.Email) == List("j.lee@corp.co.kr"))
  }

  test("private IP dropped only in CIDR/design context") {
    assert(PiiDetector.detect("서버 10.1.2.3 접속 로그")(PiiCategories.Ip) == List("10.1.2.3"))
    assert(PiiDetector.detect("설계상 10.1.2.3 대역을 사용")(PiiCategories.Ip) == null)
    assert(PiiDetector.detect("8.8.8.8 조회").isEmptyAll)
  }
}
