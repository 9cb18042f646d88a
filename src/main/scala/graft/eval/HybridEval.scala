package graft.eval

import graft.core.{PiiCategories, PiiDetector}
import graft.model.TestCase
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Hybrid evaluation (run_hybrid_eval.py): stored LLM predictions ⋈ corpus
  * (broadcast hash join by id, missing → empty default), regex detection per
  * document, four prediction variants scored per case:
  *   llm | regex | hybrid (full union, sorted) | smart (계좌번호-only union),
  * then per-method rollup (tp/fp/fn/perfect → P/R/F1 percentages, round-1).
  */
object HybridEval {
  private val cats = PiiCategories.names
  private val acctIdx = PiiCategories.Account

  final case class MethodCase(method: String, id: String, f1: Double, tp: Int, fp: Int, fn: Int)
  final case class MethodSummary(tp: Long, fp: Long, fn: Long,
      precision: Double, recall: Double, f1: Double,
      perfect: Long, total: Long, accuracy: Double)

  /** Per-case scoring of the four variants. The left join with default-empty
    * prediction is J2; the union merges are U1/U2. */
  def methodCases(corpus: Dataset[TestCase], llm: DataFrame): Dataset[MethodCase] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val llmPreds = llm.select(col("id"), col("predicted"))
    val joined = corpus.toDF().join(broadcast(llmPreds), Seq("id"), "left")
    joined.flatMap { row =>
      val id = row.getAs[String]("id")
      val text = row.getAs[String]("document_text")
      val expItems = Option(row.getSeq[org.apache.spark.sql.Row](row.fieldIndex("expected_pii")))
        .getOrElse(Seq.empty).map(r => (r.getString(0), r.getString(1)))
      val expected = MetricsEngine.pivotExpectedRaw(expItems)

      val predRow = row.getAs[org.apache.spark.sql.Row]("predicted")
      // llm prediction: sparse (only non-empty kept, mirroring `if val:`)
      val llmPred: Array[List[String]] = Array.tabulate(cats.length) { i =>
        if (predRow == null || predRow.isNullAt(i)) null
        else {
          val v = predRow.getSeq[String](i).toList
          if (v.isEmpty) null else v
        }
      }
      val regexPred = PiiDetector.detect(text).cats
      val hybridPred = PiiDetector.mergePredictions(llmPred, regexPred)
      val smartPred = Array.tabulate(cats.length) { i =>
        if (i == acctIdx && regexPred(i) != null && regexPred(i).nonEmpty) {
          (Option(llmPred(i)).getOrElse(Nil).toSet ++ regexPred(i).toSet).toList.sorted
        } else llmPred(i)
      }
      Seq("llm" -> llmPred, "regex" -> regexPred, "hybrid" -> hybridPred, "smart" -> smartPred)
        .map { case (m, pred) =>
          val s = MetricsEngine.scoreCase(expected, pred)
          MethodCase(m, id, s.f1Rounded, s.tp, s.fp, s.fn)
        }
    }
  }

  /** Per-method rollup, percentages rounded to 1 decimal like the reference
    * comparison table (run_hybrid_eval.py:126-153). */
  def summarize(cases: Dataset[MethodCase]): Map[String, MethodSummary] = {
    import graft.core.PyCompat.pyRound
    cases.groupBy("method").agg(
      sum(col("tp").cast("long")), sum(col("fp").cast("long")), sum(col("fn").cast("long")),
      sum(when(col("f1") === 1.0, 1L).otherwise(0L)), count(lit(1))).collect()
      .map { r =>
        val (tp, fp, fn) = (r.getLong(1), r.getLong(2), r.getLong(3))
        val (perfect, total) = (r.getLong(4), r.getLong(5))
        val p = if (tp + fp > 0) tp.toDouble / (tp + fp) * 100 else 0.0
        val rc = if (tp + fn > 0) tp.toDouble / (tp + fn) * 100 else 0.0
        val f1 = if (p + rc > 0) 2 * p * rc / (p + rc) else 0.0
        r.getString(0) -> MethodSummary(tp, fp, fn,
          pyRound(p, 1), pyRound(rc, 1), pyRound(f1, 1),
          perfect, total, pyRound(perfect.toDouble / total * 100, 1))
      }.toMap
  }

  def main(args: Array[String]): Unit = {
    val llmPath = args.lift(0).getOrElse("/root/reference/benchmark_results/results_qwen3_30b_v2_300.json")
    val tcPath = args.lift(1).getOrElse("/root/reference/combined_test_cases.json")
    val spark = graft.GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt, "hybrid-eval")
    val corpus = RegexBenchmark.loadCorpus(spark, tcPath)
    val llm = EvalHarness.loadStoredResults(spark, llmPath)
    val summary = summarize(methodCases(corpus, llm))
    println(f"${"Method"}%-8s ${"TP"}%6s ${"FP"}%6s ${"FN"}%6s ${"P"}%7s ${"R"}%7s ${"F1"}%7s  Perfect")
    for (m <- Seq("llm", "regex", "hybrid", "smart"); s <- summary.get(m))
      println(f"${m.toUpperCase}%-8s ${s.tp}%6d ${s.fp}%6d ${s.fn}%6d ${s.precision}%6.1f%% ${s.recall}%6.1f%% ${s.f1}%6.1f%% ${s.perfect}%4d/${s.total}%-4d")
    spark.stop()
  }
}
