package graft.tools

import graft.core.PiiDetector
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Single-thread detector throughput on the labeled corpus (reference
  * comparison; the reference's CPython run does ~3000 docs/sec). */
object DetectorBench {
  def main(args: Array[String]): Unit = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(Files.readAllBytes(Paths.get("/root/reference/combined_test_cases.json")))
    val docs = node.elements().asScala.map(_.get("document_text").asText()).toArray
    var sink = 0
    for (_ <- 1 to 5; d <- docs) sink += PiiDetector.detect(d).cats.length
    val passes = 30
    val t0 = System.nanoTime()
    for (_ <- 1 to passes; d <- docs) sink += PiiDetector.detect(d).cats.length
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"graft detector: ${docs.length.toLong * passes / sec}%.1f docs/sec single-thread (sink=$sink)")
  }
}
