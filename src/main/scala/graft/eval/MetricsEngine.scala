package graft.eval

import graft.core.{PiiCategories, PyCompat}
import PyCompat.{pyRound, pyStrip}

/** Per-case score in the regex-benchmark variant (regex_pii_detector.py:354-371):
  * tp/fp/fn summed over the 12 categories on raw (unstripped) sets; edge rule
  * P=1 when tp+fp==0, R=1 when tp+fn==0, F1=0 when p+r==0.
  */
final case class CaseScore(tp: Int, fp: Int, fn: Int) {
  def precision: Double = if (tp + fp > 0) tp.toDouble / (tp + fp) else 1.0
  def recall: Double = if (tp + fn > 0) tp.toDouble / (tp + fn) else 1.0
  def f1: Double = {
    val p = precision; val r = recall
    if (p + r > 0) 2 * p * r / (p + r) else 0.0
  }
  def f1Rounded: Double = pyRound(f1, 4)
  def isPerfect: Boolean = f1 == 1.0
}

/** Per-category cell of the eval-harness metrics (run_pii_evaluation.py:452-507). */
final case class CategoryMetrics(
    tp: Int, fp: Int, fn: Int,
    precision: Double, recall: Double, f1: Double,
    expectedCount: Int, predictedCount: Int,
    categoryDetectionCorrect: Boolean,
    missing: List[String], extra: List[String])

final case class CaseMetrics(
    perCategory: IndexedSeq[CategoryMetrics],
    microPrecision: Double, microRecall: Double, microF1: Double,
    totalTp: Int, totalFp: Int, totalFn: Int) {
  def isPerfect: Boolean = microF1 == 1.0
}

/** Deterministic, pure metric computations replicated from the reference
  * evaluation harness. Two subtly different scoring variants exist in the
  * reference (regex benchmark vs LLM harness) — both are kept.
  */
object MetricsEngine {
  import PiiCategories.{names, normalizeType}

  /** expected_pii [{type,value}] → per-category lists, raw types, insertion
    * order, NO normalization (regex-benchmark variant, regex_pii_detector.py:346-351). */
  def pivotExpectedRaw(expected: Seq[(String, String)]): Array[List[String]] = {
    val out = new Array[List[String]](PiiCategories.size)
    val bufs = Array.fill(PiiCategories.size)(List.newBuilder[String])
    val touched = new Array[Boolean](PiiCategories.size)
    for ((t, v) <- expected; i <- PiiCategories.index.get(t)) {
      bufs(i) += v; touched(i) = true
    }
    var i = 0
    while (i < out.length) { if (touched(i)) out(i) = bufs(i).result(); i += 1 }
    out
  }

  /** expected_pii → normalized per-category lists: TYPE_NORMALIZATION folding,
    * sorted(set(...)) (code-point order), null when category absent
    * (eval-harness variant, run_pii_evaluation.py:436-445). */
  def normalizeExpected(expected: Seq[(String, String)]): Array[List[String]] = {
    val sets = Array.fill(PiiCategories.size)(Set.newBuilder[String])
    val touched = new Array[Boolean](PiiCategories.size)
    for ((t, v) <- expected) {
      val i = PiiCategories.index(normalizeType(t))
      sets(i) += v; touched(i) = true
    }
    Array.tabulate(PiiCategories.size) { i =>
      if (touched(i)) sets(i).result().toList.sorted else null
    }
  }

  /** Regex-benchmark scoring: raw string sets (no strip) per category.
    * Ref: regex_pii_detector.py:354-363. */
  def scoreCase(expected: Array[List[String]], predicted: Array[List[String]]): CaseScore = {
    var tp = 0; var fp = 0; var fn = 0
    var i = 0
    while (i < PiiCategories.size) {
      val e = if (expected(i) == null) Set.empty[String] else expected(i).toSet
      val p = if (predicted(i) == null) Set.empty[String] else predicted(i).toSet
      tp += (e & p).size
      fp += (p -- e).size
      fn += (e -- p).size
      i += 1
    }
    CaseScore(tp, fp, fn)
  }

  /** Eval-harness compute_metrics: whitespace-stripped sets, per-category
    * P/R/F1 with presence-aware edge rules, micro rollup with the all-zero ⇒
    * perfect rule. Ref: run_pii_evaluation.py:452-507. */
  def computeMetrics(expected: Array[List[String]], predicted: Array[List[String]]): CaseMetrics = {
    var totalTp = 0; var totalFp = 0; var totalFn = 0
    val per = IndexedSeq.tabulate(PiiCategories.size) { i =>
      val expVals = expected(i)
      val predVals = predicted(i)
      val expSet = if (expVals == null) Set.empty[String] else expVals.map(pyStrip).toSet
      val predSet = if (predVals == null) Set.empty[String] else predVals.map(pyStrip).toSet
      val tp = (expSet & predSet).size
      val fp = (predSet -- expSet).size
      val fn = (expSet -- predSet).size
      val precision =
        if (tp + fp > 0) tp.toDouble / (tp + fp) else if (expSet.isEmpty) 1.0 else 0.0
      val recall =
        if (tp + fn > 0) tp.toDouble / (tp + fn) else if (predSet.isEmpty) 1.0 else 0.0
      val f1 = if (precision + recall > 0) 2 * precision * recall / (precision + recall) else 0.0
      totalTp += tp; totalFp += fp; totalFn += fn
      CategoryMetrics(tp, fp, fn,
        pyRound(precision, 4), pyRound(recall, 4), pyRound(f1, 4),
        expSet.size, predSet.size,
        (expVals != null && expVals.nonEmpty) == (predVals != null && predVals.nonEmpty),
        (expSet -- predSet).toList.sorted, (predSet -- expSet).toList.sorted)
    }
    val (mp, mr, mf1) =
      if (totalTp == 0 && totalFp == 0 && totalFn == 0) (1.0, 1.0, 1.0)
      else {
        val p = if (totalTp + totalFp > 0) totalTp.toDouble / (totalTp + totalFp) else 0.0
        val r = if (totalTp + totalFn > 0) totalTp.toDouble / (totalTp + totalFn) else 0.0
        val f = if (p + r > 0) 2 * p * r / (p + r) else 0.0
        (p, r, f)
      }
    CaseMetrics(per, pyRound(mp, 4), pyRound(mr, 4), pyRound(mf1, 4), totalTp, totalFp, totalFn)
  }

  /** Corpus-level stats block of the regex benchmark (regex_pii_detector.py:380-397). */
  final case class CorpusStats(
      total: Int, perfect: Int, accuracy: Double,
      precision: Double, recall: Double, f1: Double,
      tp: Long, fp: Long, fn: Long)

  def corpusStats(total: Int, perfect: Int, tp: Long, fp: Long, fn: Long): CorpusStats = {
    val precision = if (tp + fp > 0) tp.toDouble / (tp + fp) else 0.0
    val recall = if (tp + fn > 0) tp.toDouble / (tp + fn) else 0.0
    val f1 = if (precision + recall > 0) 2 * precision * recall / (precision + recall) else 0.0
    CorpusStats(total, perfect,
      pyRound(perfect.toDouble / total * 100, 1),
      pyRound(precision * 100, 1), pyRound(recall * 100, 1), pyRound(f1 * 100, 1),
      tp, fp, fn)
  }
}
