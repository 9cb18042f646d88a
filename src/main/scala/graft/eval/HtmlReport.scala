package graft.eval

import graft.core.PiiCategories

/** Self-contained HTML report sink (S7 analog of the reference's
  * generate_report.py, ref /root/reference/generate_report.py:130-470):
  * performance summary, detailed statistics, document-category confusion
  * matrix, per-category confusion cells, difficulty splits, worst cases —
  * plus inline-SVG per-category F1 bars (the chart analog of
  * generate_charts.py, no plotting runtime required). All numbers come from
  * the engine's own aggregation (Report.fromCases), not stored artifacts.
  */
object HtmlReport {

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private def pct(d: Double): String = f"${d * 100}%.1f"

  /** Horizontal bar chart as inline SVG: (label, value∈[0,1]) rows. */
  private def svgBars(rows: Seq[(String, Double)], title: String): String = {
    val rowH = 22
    val h = rows.size * rowH + 30
    val sb = new StringBuilder
    sb ++= s"""<svg width="640" height="$h" role="img" aria-label="${esc(title)}">"""
    sb ++= s"""<text x="0" y="14" font-size="13" font-weight="700">${esc(title)}</text>"""
    for (((label, v), i) <- rows.zipWithIndex) {
      val y = 24 + i * rowH
      val w = math.max(1, (v * 380).round.toInt)
      sb ++= s"""<text x="0" y="${y + 14}" font-size="12">${esc(label)}</text>"""
      sb ++= s"""<rect x="170" y="$y" width="$w" height="${rowH - 6}" fill="#4e79a7"/>"""
      sb ++= s"""<text x="${175 + w}" y="${y + 14}" font-size="12">${pct(v)}%</text>"""
    }
    sb ++= "</svg>"
    sb.toString
  }

  private def confusionTable(tp: Long, tn: Long, fp: Long, fn: Long): String =
    s"""<table class="cm"><tr><th></th><th>pred +</th><th>pred −</th></tr>
       |<tr><th>actual +</th><td class="tp">$tp</td><td class="fn">$fn</td></tr>
       |<tr><th>actual −</th><td class="fp">$fp</td><td class="tn">$tn</td></tr></table>""".stripMargin

  def render(corpusPath: String, summary: EvalSummary,
             splits: Map[String, EvalSummary],
             hybrid: Map[String, HybridEval.MethodSummary]): String = {
    val sb = new StringBuilder
    sb ++= """<!DOCTYPE html><html><head><meta charset="utf-8">
             |<title>PII Detection Benchmark Report</title><style>
             |body { font-family: -apple-system, 'Segoe UI', sans-serif; max-width: 960px;
             |       margin: 24px auto; padding: 0 16px; color: #1a1a2e; }
             |h1 { font-size: 24px; } .section-title { font-size: 18px; font-weight: 700;
             |       margin: 32px 0 14px; border-bottom: 2px solid #eee; padding-bottom: 6px; }
             |table { border-collapse: collapse; margin: 8px 0; }
             |td, th { border: 1px solid #ddd; padding: 5px 10px; font-size: 13px; text-align: right; }
             |th { background: #f5f6fa; } td:first-child, th:first-child { text-align: left; }
             |.cm td.tp { background: #e8f5e9; } .cm td.tn { background: #f1f8ff; }
             |.cm td.fp, .cm td.fn { background: #ffebee; }
             |.kpi { display: inline-block; margin-right: 28px; }
             |.kpi b { font-size: 22px; display: block; }
             |</style></head><body>""".stripMargin
    sb ++= s"<h1>PII Detection Benchmark Report</h1>"
    sb ++= s"<p>Corpus: <code>${esc(corpusPath)}</code> — ${summary.totalCases} cases (engine-recomputed)</p>"

    sb ++= """<div class="section-title">Performance Summary</div>"""
    sb ++= s"""<div><span class="kpi"><b>${pct(summary.overallF1)}%</b>micro F1</span>
              |<span class="kpi"><b>${pct(summary.overallPrecision)}%</b>precision</span>
              |<span class="kpi"><b>${pct(summary.overallRecall)}%</b>recall</span>
              |<span class="kpi"><b>${summary.perfectCases}/${summary.totalCases}</b>perfect cases</span></div>""".stripMargin

    sb ++= """<div class="section-title">Detailed Statistics (per category)</div>"""
    sb ++= "<table><tr><th>category</th><th>P%</th><th>R%</th><th>cls-F1%</th><th>cls-Acc%</th></tr>"
    for (c <- PiiCategories.names) {
      val m = summary.categoryMetrics(c)
      val cl = summary.clsPerCategory(c)
      sb ++= s"<tr><td>${esc(c)}</td><td>${pct(m.precision)}</td><td>${pct(m.recall)}</td>" +
        s"<td>${pct(cl.f1)}</td><td>${pct(cl.accuracy)}</td></tr>"
    }
    sb ++= "</table>"
    sb ++= svgBars(PiiCategories.names.map(c => c -> summary.clsPerCategory(c).f1),
      "Per-category classification F1")

    sb ++= """<div class="section-title">Confusion Matrix (Document-Category Level)</div>"""
    val t = summary.clsTotal
    sb ++= confusionTable(t.tp, t.tn, t.fp, t.fn)
    sb ++= s"<p>P ${pct(t.precision)}% · R ${pct(t.recall)}% · F1 ${pct(t.f1)}% · Acc ${pct(t.accuracy)}%</p>"

    sb ++= """<div class="section-title">Difficulty Splits</div>"""
    sb ++= "<table><tr><th>split</th><th>cases</th><th>perfect</th><th>tp</th><th>fp</th><th>fn</th></tr>"
    for ((name, s) <- Seq("base" -> splits.get("base"), "advanced" -> splits.get("advanced"));
         sm <- s)
      sb ++= s"<tr><td>$name</td><td>${sm.totalCases}</td><td>${sm.perfectCases}</td><td>—</td><td>—</td><td>—</td></tr>"
    for (d <- Seq("EASY", "MEDIUM", "HARD"); row = summary.perDifficulty(d))
      sb ++= s"<tr><td>$d</td><td>${row.count}</td><td>${row.perfect}</td><td>${row.tp}</td><td>${row.fp}</td><td>${row.fn}</td></tr>"
    sb ++= "</table>"

    if (hybrid.nonEmpty) {
      sb ++= """<div class="section-title">Hybrid Method Comparison</div>"""
      sb ++= "<table><tr><th>method</th><th>TP</th><th>FP</th><th>FN</th><th>P%</th><th>R%</th><th>F1%</th><th>perfect</th></tr>"
      for (m <- Seq("llm", "regex", "hybrid", "smart"); s <- hybrid.get(m))
        sb ++= s"<tr><td>$m</td><td>${s.tp}</td><td>${s.fp}</td><td>${s.fn}</td>" +
          s"<td>${s.precision}</td><td>${s.recall}</td><td>${s.f1}</td><td>${s.perfect}/${s.total}</td></tr>"
      sb ++= "</table>"
    }

    if (summary.worstCases.nonEmpty) {
      sb ++= """<div class="section-title">Worst Cases</div><ul>"""
      for ((id, f1) <- summary.worstCases)
        sb ++= f"<li><code>${esc(id)}</code> — F1 $f1%.4f</li>"
      sb ++= "</ul>"
    }
    sb ++= "</body></html>"
    sb.toString
  }
}
