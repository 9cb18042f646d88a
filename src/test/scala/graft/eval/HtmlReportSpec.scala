package graft.eval

import graft.SparkSpecBase

/** The HTML sink (S7) must render the engine-recomputed numbers — checked
  * against the pinned BASELINE figures for the combined-300 corpus. */
class HtmlReportSpec extends SparkSpecBase {

  test("HTML report renders engine-computed baseline figures") {
    val corpus = RegexBenchmark.loadCorpus(spark, "/root/reference/combined_test_cases.json")
    val cases = EvalHarness.evaluateRegex(corpus).cache()
    val summary = Report.fromCases(cases)
    val html = HtmlReport.render("combined_test_cases.json", summary,
      EvalHarness.splits(cases), Map.empty)
    assert(html.contains("<b>51.3%</b>micro F1"), "baseline F1 51.3 expected")
    assert(html.contains("<b>64.3%</b>precision"))
    assert(html.contains("<b>42.7%</b>recall"))
    assert(html.contains(s"<b>137/300</b>perfect"))
    // structural sections of the reference report are all present
    for (sec <- Seq("Performance Summary", "Detailed Statistics",
        "Confusion Matrix (Document-Category Level)", "Difficulty Splits", "Worst Cases"))
      assert(html.contains(sec), s"missing section $sec")
    // inline-SVG chart exists with one bar per category
    assert(html.contains("<svg"))
    assert("<rect ".r.findAllIn(html).size == graft.core.PiiCategories.names.size)
  }
}
