package graft.tools

import graft.core.PiiDetector

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Regenerates the scrub goldens (md5 of scrubbed text per corpus doc).
  * Scrub is net-new semantics defined by this engine (the reference only
  * detects); the goldens pin it against accidental drift. Run only when the
  * scrub format changes INTENTIONALLY. */
object FreezeScrubGoldens {
  def main(args: Array[String]): Unit = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val corpus = mapper.readTree(Files.readAllBytes(
      Paths.get("/root/reference/combined_test_cases.json")))
    val md = java.security.MessageDigest.getInstance("MD5")
    val sb = new StringBuilder("{\n")
    val entries = corpus.elements().asScala.map { tc =>
      val id = tc.get("id").asText()
      val scrubbed = PiiDetector.scrub(tc.get("document_text").asText())
      val digest = md.digest(scrubbed.getBytes(StandardCharsets.UTF_8))
        .map("%02x".format(_)).mkString
      s"""  "$id": "$digest""""
    }
    sb.append(entries.mkString(",\n")).append("\n}\n")
    val out = Paths.get("src/test/resources/goldens/scrub_md5_combined.json")
    Files.write(out, sb.toString.getBytes(StandardCharsets.UTF_8))
    println(s"wrote $out")
  }
}
