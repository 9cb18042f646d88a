package graft.tools

import graft.core.PiiPatterns

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Micro-profiler: per-pattern scan cost over the corpus (single thread). */
object ProfileDetector {
  def main(args: Array[String]): Unit = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(Files.readAllBytes(Paths.get("/root/reference/combined_test_cases.json")))
    val docs = node.elements().asScala.map(_.get("document_text").asText()).toArray
    import PiiPatterns._
    val patterns = Seq(
      "name" -> namePattern, "road" -> roadAddr, "lot" -> lotAddr,
      "rrn" -> rrnPattern, "rrnCont" -> rrnContinuous, "passport" -> passportKr,
      "license" -> driverLicense, "email" -> emailPattern, "emailObf" -> emailObfuscated,
      "emailMask" -> emailMasked, "ipv4" -> ipv4Pattern, "ipv6" -> ipv6Pattern,
      "phMobile" -> phoneMobile, "phLand" -> phoneLandline, "phIntl" -> phoneIntl,
      "phCont" -> phoneContinuous, "phMask" -> phoneMasked, "svc" -> serviceNumber,
      "toll" -> tollFree, "acctLbl" -> accountLabels, "acctBank" -> accountWithBank,
      "card" -> cardPattern, "cardMask" -> cardMasked, "btc" -> btcAddr, "eth" -> ethAddr,
      "dob" -> dobPattern, "student" -> studentId, "plate" -> vehiclePlate,
      "military" -> militaryId, "employee" -> employeeId, "doorlock" -> doorlock)
    // warm
    for (_ <- 1 to 3; (_, p) <- patterns; d <- docs) { val m = p.matcher(d); while (m.find()) () }
    val times = patterns.map { case (n, p) =>
      val t0 = System.nanoTime()
      for (_ <- 1 to 20; d <- docs) { val m = p.matcher(d); while (m.find()) () }
      n -> (System.nanoTime() - t0) / 1e6
    }.sortBy(-_._2)
    val total = times.map(_._2).sum
    println(f"total pattern time: $total%.0f ms (${docs.length * 20} doc-scans)")
    times.foreach { case (n, t) => println(f"  $n%-10s $t%8.1f ms  ${t / total * 100}%5.1f%%") }
  }
}
