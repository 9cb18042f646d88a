package graft.eval

import graft.GraftSession
import graft.core.PiiCategories

/** The full evaluation CLI (run_pii_evaluation.py's shape with the native
  * detector in place of the LLM): corpus → detect → metrics → console report
  * (S6) → results JSON (S4) → base/advanced split files (S5).
  *
  * Usage: RegexEvalMain [corpus.json] [out.json] [--category c] [--difficulty d]
  */
object RegexEvalMain {
  def main(args: Array[String]): Unit = {
    val pos = args.filterNot(_.startsWith("--"))
    val corpusPath = pos.lift(0).getOrElse("/root/reference/combined_test_cases.json")
    val outPath = pos.lift(1).getOrElse("/tmp/graft_regex_results.json")
    def opt(name: String): Option[String] =
      args.sliding(2).collectFirst { case Array(k, v) if k == s"--$name" => v }

    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt, "regex-eval")
    val corpus = RegexBenchmark.loadCorpus(spark, corpusPath)
    val cases = EvalHarness.evaluateRegex(corpus,
      categoryFilter = opt("category"), difficultyFilter = opt("difficulty")).cache()
    val summary = Report.fromCases(cases)

    // S6: console report
    println("=" * 70)
    println(f"${"category"}%-16s ${"P"}%8s ${"R"}%8s ${"TP"}%5s")
    for (c <- PiiCategories.names) {
      val m = summary.categoryMetrics(c)
      println(f"$c%-16s ${m.precision * 100}%7.2f%% ${m.recall * 100}%7.2f%%")
    }
    println("-" * 70)
    println(f"overall: P=${summary.overallPrecision * 100}%.2f%% R=${summary.overallRecall * 100}%.2f%% " +
      f"F1=${summary.overallF1 * 100}%.2f%% Acc=${summary.overallAccuracy * 100}%.2f%%")
    println(s"perfect: ${summary.perfectCases}/${summary.totalCases}")
    for ((d, row) <- Seq("EASY", "MEDIUM", "HARD").flatMap(d => summary.perDifficulty.get(d).map(d -> _)))
      println(f"$d%-8s n=${row.count}%4d perfect=${row.perfect}%4d tp=${row.tp} fp=${row.fp} fn=${row.fn}")
    if (summary.worstCases.nonEmpty) {
      println("worst cases:")
      summary.worstCases.foreach { case (id, f1) => println(f"  $id f1=$f1%.4f") }
    }

    // S4 + S5: result JSON + splits
    val collected = cases.collect().toSeq.sortBy(_.id)
    EvalHarness.writeResultsJson(outPath, "graft-regex", summary, collected)
    val stem = outPath.stripSuffix(".json")
    val splits = EvalHarness.splits(cases)
    val base = collected.filter(_.difficulty == "EASY")
    val adv = collected.filter(c => c.difficulty == "MEDIUM" || c.difficulty == "HARD")
    if (base.nonEmpty) EvalHarness.writeResultsJson(s"${stem}_base.json", "graft-regex", splits("base"), base)
    if (adv.nonEmpty) EvalHarness.writeResultsJson(s"${stem}_advanced.json", "graft-regex", splits("advanced"), adv)
    println(s"results: $outPath (+ _base/_advanced splits)")
    spark.stop()
  }
}
