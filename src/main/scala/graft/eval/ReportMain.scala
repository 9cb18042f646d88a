package graft.eval

import graft.GraftSession
import graft.core.PiiCategories

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Report sinks (S7): markdown + self-contained HTML (HtmlReport — the
  * analog of the reference's generate_report.py/generate_charts.py, with
  * inline-SVG charts instead of matplotlib). Renders the regex evaluation,
  * the base/advanced splits, and — when stored LLM results are available —
  * the hybrid method comparison. The HTML lands next to the markdown file
  * with an .html extension.
  *
  * Usage: ReportMain [corpus.json] [out.md] [llm_results.json]
  */
object ReportMain {
  def main(args: Array[String]): Unit = {
    val corpusPath = args.lift(0).getOrElse("/root/reference/combined_test_cases.json")
    val outPath = args.lift(1).getOrElse("/tmp/graft_report.md")
    val llmPath = args.lift(2).getOrElse(
      "/root/reference/benchmark_results/results_qwen3_30b_v2_300.json")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt, "report")

    val corpus = RegexBenchmark.loadCorpus(spark, corpusPath)
    val cases = EvalHarness.evaluateRegex(corpus).cache()
    val summary = Report.fromCases(cases)
    val splits = EvalHarness.splits(cases)

    val sb = new StringBuilder
    sb ++= s"# PII detection evaluation report\n\n"
    sb ++= s"Corpus: `$corpusPath` (${summary.totalCases} cases)\n\n"
    sb ++= "## Regex detector (engine-native)\n\n"
    sb ++= f"Overall micro: **P ${summary.overallPrecision * 100}%.2f%% / " +
      f"R ${summary.overallRecall * 100}%.2f%% / F1 ${summary.overallF1 * 100}%.2f%%** — " +
      f"perfect ${summary.perfectCases}/${summary.totalCases} " +
      f"(${summary.overallAccuracy * 100}%.2f%%)\n\n"
    sb ++= "| category | P% | R% | cls-F1% | cls-Acc% |\n|---|---|---|---|---|\n"
    for (c <- PiiCategories.names) {
      val m = summary.categoryMetrics(c); val cl = summary.clsPerCategory(c)
      sb ++= f"| $c | ${m.precision * 100}%.1f | ${m.recall * 100}%.1f | ${cl.f1 * 100}%.1f | ${cl.accuracy * 100}%.1f |\n"
    }
    sb ++= "\n## Difficulty splits\n\n| split | cases | perfect | tp | fp | fn |\n|---|---|---|---|---|---|\n"
    for ((name, s) <- Seq("base" -> splits("base"), "advanced" -> splits("advanced")))
      sb ++= s"| $name | ${s.totalCases} | ${s.perfectCases} | — | — | — |\n"
    for (d <- Seq("EASY", "MEDIUM", "HARD"); row = summary.perDifficulty(d))
      sb ++= s"| $d | ${row.count} | ${row.perfect} | ${row.tp} | ${row.fp} | ${row.fn} |\n"
    if (summary.worstCases.nonEmpty) {
      sb ++= "\n## Worst cases\n\n"
      summary.worstCases.foreach { case (id, f1) => sb ++= f"- $id (F1 $f1%.4f)\n" }
    }

    val hybrid: Map[String, HybridEval.MethodSummary] =
      if (Files.exists(Paths.get(llmPath))) {
        val llm = EvalHarness.loadStoredResults(spark, llmPath)
        HybridEval.summarize(HybridEval.methodCases(corpus, llm))
      } else Map.empty
    if (hybrid.nonEmpty) {
      sb ++= "\n## Hybrid method comparison\n\n| method | TP | FP | FN | P% | R% | F1% | perfect |\n|---|---|---|---|---|---|---|---|\n"
      for (m <- Seq("llm", "regex", "hybrid", "smart"); s <- hybrid.get(m))
        sb ++= s"| $m | ${s.tp} | ${s.fp} | ${s.fn} | ${s.precision} | ${s.recall} | ${s.f1} | ${s.perfect}/${s.total} |\n"
    }

    Files.write(Paths.get(outPath), sb.toString.getBytes(StandardCharsets.UTF_8))
    val htmlPath = outPath.replaceAll("\\.md$", "") + ".html"
    Files.write(Paths.get(htmlPath),
      HtmlReport.render(corpusPath, summary, splits, hybrid).getBytes(StandardCharsets.UTF_8))
    println(s"report: $outPath + $htmlPath")
    spark.stop()
  }
}
