package graft.eval

import com.fasterxml.jackson.databind.ObjectMapper
import graft.SparkSpecBase

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** A8 parity: recompute the statistics block of every stored latency_*.json
  * from its own measurements; values must match exactly (incl. the reference's
  * interpolated-percentile formula and sample stdev). */
class LatencyParitySpec extends SparkSpecBase {
  private val mapper = new ObjectMapper()

  private def latencyFiles: Seq[java.nio.file.Path] = {
    val dirs = Seq("/root/reference", "/root/reference/benchmark_results")
    dirs.flatMap { d =>
      val p = Paths.get(d)
      if (!Files.isDirectory(p)) Nil
      else Files.list(p).iterator().asScala
        .filter(_.getFileName.toString.matches("latency_.*\\.json")).toSeq
    }
  }

  test("latency statistics parity for every stored latency file") {
    val files = latencyFiles
    assume(files.nonEmpty)
    for (f <- files) {
      val stored = mapper.readTree(Files.readAllBytes(f)).get("statistics")
      val got = LatencyStats.compute(LatencyStats.loadMeasurements(spark, f.toString))
      assert(got.meanSec == stored.get("mean_sec").asDouble, s"$f mean")
      assert(got.medianSec == stored.get("median_sec").asDouble, s"$f median")
      assert(got.stdevSec == stored.get("stdev_sec").asDouble, s"$f stdev")
      assert(got.minSec == stored.get("min_sec").asDouble, s"$f min")
      assert(got.maxSec == stored.get("max_sec").asDouble, s"$f max")
      assert(got.p90Sec == stored.get("p90_sec").asDouble, s"$f p90")
      assert(got.p95Sec == stored.get("p95_sec").asDouble, s"$f p95")
      assert(got.p99Sec == stored.get("p99_sec").asDouble, s"$f p99")
      assert(got.avgPromptTokens == stored.get("avg_prompt_tokens").asDouble, s"$f avg_prompt")
      assert(got.avgCompletionTokens == stored.get("avg_completion_tokens").asDouble, s"$f avg_completion")
    }
  }
}
