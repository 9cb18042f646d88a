package graft.eval

import com.fasterxml.jackson.databind.ObjectMapper
import graft.SparkSpecBase

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Parity for the strategy analytics (A9/A10/U3/O5) against goldens extracted
  * from executing the reference hybrid_analysis{,_deep}.py on the same stored
  * inputs. */
class HybridAnalysisSpec extends SparkSpecBase {
  private val mapper = new ObjectMapper()
  private lazy val golden = mapper.readTree(Files.readAllBytes(Paths.get(
    getClass.getResource("/goldens/hybrid_analysis.json").toURI)))

  private lazy val ds = {
    val corpus = RegexBenchmark.loadCorpus(spark, "/root/reference/combined_test_cases.json")
    val llm = EvalHarness.loadStoredResults(spark,
      "/root/reference/benchmark_results/results_qwen3_30b_v2_300.json")
    val regex = EvalHarness.loadStoredResults(spark,
      "/root/reference/benchmark_results/regex_results.json")
    HybridAnalysis.caseSets(corpus, llm, regex).cache()
  }

  test("per-category method stats match cat_stats") {
    val stats = HybridAnalysis.perCategoryStats(ds)
    for (s <- stats) {
      val g = golden.get("cat_stats").get(s.cat).get(s.method)
      assert(s.tp == g.get("tp").asLong, s"${s.cat}/${s.method} tp ${s.tp}")
      assert(s.fp == g.get("fp").asLong, s"${s.cat}/${s.method} fp ${s.fp}")
      assert(s.fn == g.get("fn").asLong, s"${s.cat}/${s.method} fn ${s.fn}")
    }
  }

  test("regex precision ranking (O5) and high-precision set match") {
    val stats = HybridAnalysis.perCategoryStats(ds)
    val ranking = HybridAnalysis.regexPrecisionRanking(stats)
    for ((cat, p) <- ranking)
      assert(math.abs(p - golden.get("regex_precision").get(cat).asDouble) < 1e-9, cat)
    val highPrec = ranking.filter(_._2 > 0.80).map(_._1).sorted
    val expected = golden.get("high_prec_cats").elements().asScala.map(_.asText()).toSeq
    assert(highPrec == expected)
  }

  test("rescue analysis (A9) matches the reference list exactly") {
    val got = HybridAnalysis.rescues(ds).collect().toSet
    val exp = golden.get("rescues").elements().asScala
      .map(n => (n.get("id").asText(), n.get("category").asText(), n.get("value").asText())).toSet
    assert(got == exp)
  }

  test("regex-only FP attribution matches") {
    val got = HybridAnalysis.regexOnlyFps(ds).collect().toSet
    val exp = golden.get("regex_only_fps").elements().asScala
      .map(n => (n.get("id").asText(), n.get("category").asText(), n.get("value").asText())).toSet
    assert(got == exp)
  }

  test("per-category union gain (A10) and beneficial set match") {
    val gains = HybridAnalysis.unionGain(HybridAnalysis.perCategoryStats(ds))
    val gmap = golden.get("per_cat_gains").elements().asScala
      .map(n => n.get(0).asText() -> (n.get(1).asDouble, n.get(2).asLong, n.get(3).asLong)).toMap
    for (g <- gains) {
      val (diff, atp, afp) = gmap(g.cat)
      assert(math.abs(g.diff - diff) < 1e-9, s"${g.cat} diff")
      assert(g.addedTp == atp && g.addedFp == afp, g.cat)
    }
    val beneficial = gains.filter(_.diff > 0).map(_.cat).sorted
    assert(beneficial == golden.get("beneficial_cats").elements().asScala.map(_.asText()).toSeq)
  }

  test("merge strategies A-G (U3) reproduce reference totals") {
    val got = HybridAnalysis.compareStrategies(ds)
    // baselines: hybrid_analysis.py's computed `totals` (the deep script's
    // baseline tuple is a hardcoded stale literal in the reference source)
    for (m <- Seq("llm", "regex")) {
      val g = golden.get("totals").get(m)
      assert(got(m) == ((g.get("tp").asLong, g.get("fp").asLong, g.get("fn").asLong)), m)
    }
    val gh = golden.get("totals").get("hybrid")
    assert(got("union") == ((gh.get("tp").asLong, gh.get("fp").asLong, gh.get("fn").asLong)))
    // strategies A-E: computed by hybrid_analysis.py
    for (s <- Seq("A", "B", "C", "D", "E")) {
      val g = golden.get(s"strategy_${s.toLowerCase}")
      assert(got(s) == ((g.get("tp").asLong, g.get("fp").asLong, g.get("fn").asLong)),
        s"strategy $s: got ${got(s)}")
    }
    // strategies F/G: computed by hybrid_analysis_deep.py
    def deep(name: String) = {
      val g = golden.get("all_strategies").get(name)
      (g.get(0).asLong, g.get(1).asLong, g.get(2).asLong)
    }
    assert(got("F") == deep("전략F: F1향상 카테고리만"), s"F: got ${got("F")}")
    assert(got("G") == deep("전략G: 정밀 보완"), s"G: got ${got("G")}")
  }
}
