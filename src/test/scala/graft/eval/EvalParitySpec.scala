package graft.eval

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.SparkSpecBase
import graft.core.PiiCategories

import java.nio.file.{Files, Paths}

/** T2 metric-engine parity: the Spark report/eval engine must reproduce the
  * reference harness's summary blocks value-for-value.
  *
  * Oracles: (a) the summary stored inside results_qwen3_8b.json (verified
  * reproducible from its own per-case rows), (b) goldens recomputed with the
  * reference's own compute_metrics/print_report for the regex path and the
  * hybrid comparison (labels were revised after the stored artifacts were
  * written, so fresh recomputation with reference code is the true oracle —
  * see BASELINE.md notes).
  */
class EvalParitySpec extends SparkSpecBase {
  private val mapper = new ObjectMapper()
  private def golden(name: String): JsonNode =
    mapper.readTree(Files.readAllBytes(Paths.get(
      getClass.getResource(s"/goldens/$name").toURI)))

  private def assertSummaryMatches(s: EvalSummary, j: JsonNode): Unit = {
    assert(s.totalCases == j.get("total_cases").asLong)
    assert(s.perfectCases == j.get("perfect_cases").asLong)
    assert(s.overallAccuracy == j.get("overall_accuracy").asDouble)
    assert(s.overallPrecision == j.get("overall_precision").asDouble)
    assert(s.overallRecall == j.get("overall_recall").asDouble)
    assert(s.overallF1 == j.get("overall_f1").asDouble)
    for (c <- PiiCategories.names) {
      val cm = j.get("category_metrics").get(c)
      assert(s.categoryMetrics(c).precision == cm.get("precision").asDouble, s"cat $c precision")
      assert(s.categoryMetrics(c).recall == cm.get("recall").asDouble, s"cat $c recall")
      val cc = j.get("classification_confusion_matrix").get("per_category").get(c)
      val mine = s.clsPerCategory(c)
      assert(mine.precision == cc.get("precision").asDouble, s"cls $c p")
      assert(mine.recall == cc.get("recall").asDouble, s"cls $c r")
      assert(mine.f1 == cc.get("f1").asDouble, s"cls $c f1")
      assert(mine.accuracy == cc.get("accuracy").asDouble, s"cls $c acc")
    }
    val jd = j.get("classification_confusion_matrix").get("per_difficulty")
    jd.fieldNames().forEachRemaining { d =>
      val cell = s.clsPerDifficulty(d)
      assert(cell.precision == jd.get(d).get("precision").asDouble, s"diff $d p")
      assert(cell.f1 == jd.get(d).get("f1").asDouble, s"diff $d f1")
      assert(cell.accuracy == jd.get(d).get("accuracy").asDouble, s"diff $d acc")
    }
    val jt = j.get("classification_confusion_matrix").get("total")
    assert(s.clsTotal.tp == jt.get("tp").asLong)
    assert(s.clsTotal.tn == jt.get("tn").asLong)
    assert(s.clsTotal.fp == jt.get("fp").asLong)
    assert(s.clsTotal.fn == jt.get("fn").asLong)
    assert(s.clsTotal.f1 == jt.get("f1").asDouble)
    assert(s.clsTotal.accuracy == jt.get("accuracy").asDouble)
  }

  test("report parity: recomputed summary equals the one stored in results_qwen3_8b.json") {
    val path = "/root/reference/results_qwen3_8b.json"
    assume(Files.exists(Paths.get(path)))
    val stored = EvalHarness.loadStoredResults(spark, path)
    val summary = Report.fromCases(EvalHarness.scoreStored(stored))
    val expected = mapper.readTree(Files.readAllBytes(Paths.get(path))).get("summary")
    assertSummaryMatches(summary, expected)
  }

  test("regex eval parity: harness-variant summary on combined-300") {
    val corpus = RegexBenchmark.loadCorpus(spark, "/root/reference/combined_test_cases.json")
    val summary = Report.fromCases(EvalHarness.evaluateRegex(corpus))
    assertSummaryMatches(summary, golden("regex_eval_summary_combined.json"))
  }

  test("split parity: base/advanced re-aggregations") {
    val corpus = RegexBenchmark.loadCorpus(spark, "/root/reference/combined_test_cases.json")
    val cases = EvalHarness.evaluateRegex(corpus).cache()
    val splits = EvalHarness.splits(cases)
    val g = golden("regex_eval_splits_combined.json")
    assertSummaryMatches(splits("base"), g.get("base"))
    assertSummaryMatches(splits("advanced"), g.get("advanced"))
  }

  test("hybrid parity: llm/regex/union/smart summaries match reference recomputation") {
    val corpus = RegexBenchmark.loadCorpus(spark, "/root/reference/combined_test_cases.json")
    val llm = EvalHarness.loadStoredResults(spark,
      "/root/reference/benchmark_results/results_qwen3_30b_v2_300.json")
    val got = HybridEval.summarize(HybridEval.methodCases(corpus, llm))
    val exp = golden("hybrid_summary_recomputed.json").get("summary")
    for (m <- Seq("llm", "regex", "hybrid", "smart")) {
      val e = exp.get(m); val g2 = got(m)
      assert(g2.tp == e.get("tp").asLong, s"$m tp: got ${g2.tp}")
      assert(g2.fp == e.get("fp").asLong, s"$m fp: got ${g2.fp}")
      assert(g2.fn == e.get("fn").asLong, s"$m fn: got ${g2.fn}")
      assert(g2.perfect == e.get("perfect").asLong, s"$m perfect: got ${g2.perfect}")
      assert(g2.precision == e.get("precision").asDouble, s"$m precision")
      assert(g2.recall == e.get("recall").asDouble, s"$m recall")
      assert(g2.f1 == e.get("f1").asDouble, s"$m f1")
      assert(g2.accuracy == e.get("accuracy").asDouble, s"$m accuracy")
    }
  }

  test("eval-category masking (P5) nulls out predictions outside the kept set") {
    val corpus = RegexBenchmark.loadCorpus(spark, "/root/reference/combined_test_cases.json")
    val keep = Set("이메일")
    val cases = EvalHarness.evaluateRegex(corpus, evalCategories = Some(keep)).collect()
    val emailIdx = PiiCategories.index("이메일")
    for (c <- cases; i <- 0 until PiiCategories.size if i != emailIdx)
      assert(c.predicted(i) == null)
    assert(cases.exists(_.predicted(emailIdx) != null))
  }

  test("filters: category contains (P1), difficulty (P2), id set (P3)") {
    val corpus = RegexBenchmark.loadCorpus(spark, "/root/reference/combined_test_cases.json")
    assert(EvalHarness.evaluateRegex(corpus, categoryFilter = Some("이름")).count() > 0)
    assert(EvalHarness.evaluateRegex(corpus, difficultyFilter = Some("HARD")).count() == 42)
    assert(EvalHarness.evaluateRegex(corpus, idFilter = Seq("TC001", "TC002")).count() == 2)
  }
}
