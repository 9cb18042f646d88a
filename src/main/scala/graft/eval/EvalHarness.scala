package graft.eval

import graft.core.{PiiCategories, PiiDetector}
import graft.model.TestCase
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The evaluation harness rebuilt Spark-native (run_pii_evaluation.py minus
  * the external LLM call): corpus scan + filters → (stored or regex)
  * predictions → left join with empty default → normalization → per-case
  * metrics → report aggregations → JSON sinks incl. base/advanced splits.
  */
object EvalHarness {
  private val cats = PiiCategories.names

  /** Schema of a stored results file ({model, ..., summary, results:[...]});
    * expected/predicted are sparse 12-field structs. */
  private def predStruct = StructType(cats.map(c =>
    StructField(c, ArrayType(StringType), nullable = true)))

  def storedResultsSchema: StructType = StructType(Seq(
    StructField("model", StringType), StructField("api_url", StringType),
    StructField("concurrency", LongType), StructField("inference_time_sec", DoubleType),
    StructField("timestamp", StringType),
    StructField("results", ArrayType(StructType(Seq(
      StructField("id", StringType), StructField("category", StringType),
      StructField("difficulty", StringType), StructField("intent", StringType),
      StructField("f1", DoubleType),
      StructField("expected", predStruct), StructField("predicted", predStruct),
      StructField("raw_response", StringType)))))))

  /** S2: stored LLM/regex results file → per-case rows. */
  def loadStoredResults(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(storedResultsSchema).option("multiLine", true).json(path)
      .select(explode(col("results")).as("r"))
      .select(col("r.id").as("id"), col("r.category").as("category"),
        col("r.difficulty").as("difficulty"), col("r.intent").as("intent"),
        col("r.expected").as("expected"), col("r.predicted").as("predicted"))

  /** Score stored per-case (expected, predicted) structs with the harness
    * metric semantics (regression-by-artifact path, as split_existing_results
    * does). */
  def scoreStored(stored: DataFrame): Dataset[ScoredEvalCase] = {
    val spark = stored.sparkSession
    import spark.implicits._
    stored.map { row =>
      def slots(field: String): Array[List[String]] = {
        val st = row.getAs[org.apache.spark.sql.Row](field)
        Array.tabulate(cats.length) { i =>
          if (st == null || st.isNullAt(i)) null else st.getSeq[String](i).toList
        }
      }
      score(row.getAs[String]("id"), row.getAs[String]("category"),
        row.getAs[String]("difficulty"), row.getAs[String]("intent"),
        slots("expected"), slots("predicted"))
    }
  }

  /** Full pipeline path: corpus + regex detector predictions (the LLM of the
    * reference is replaced by the native detector), with the harness's
    * filters (category-contains P1, difficulty P2, id set P3) and
    * eval-category masking (P5). */
  def evaluateRegex(corpus: Dataset[TestCase],
                    categoryFilter: Option[String] = None,
                    difficultyFilter: Option[String] = None,
                    idFilter: Seq[String] = Nil,
                    evalCategories: Option[Set[String]] = None): Dataset[ScoredEvalCase] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val filtered = corpus
      .transform(d => categoryFilter.fold(d)(c => d.filter(col("category").contains(c))))
      .transform(d => difficultyFilter.fold(d)(f => d.filter(col("difficulty") === f)))
      .transform(d => if (idFilter.isEmpty) d else d.filter(col("id").isin(idFilter: _*)))
    val mask = evalCategories
    filtered.map { tc =>
      val expected = MetricsEngine.normalizeExpected(
        Option(tc.expected_pii).getOrElse(Nil).map(e => (e.`type`, e.value)))
      val predictedRaw = PiiDetector.detect(tc.document_text).cats
      val predicted = mask match {
        case Some(keep) => Array.tabulate(cats.length)(i =>
          if (keep.contains(cats(i))) predictedRaw(i) else null)
        case None => predictedRaw
      }
      score(tc.id, tc.category, tc.difficulty, tc.intent, expected, predicted)
    }
  }

  private def score(id: String, category: String, difficulty: String, intent: String,
                    expected: Array[List[String]], predicted: Array[List[String]]): ScoredEvalCase = {
    val m = MetricsEngine.computeMetrics(expected, predicted)
    ScoredEvalCase(id, category, difficulty, intent,
      expected.toSeq, predicted.toSeq,
      m.microPrecision, m.microRecall, m.microF1, m.totalTp, m.totalFp, m.totalFn,
      m.perCategory.map(_.tp), m.perCategory.map(_.fp), m.perCategory.map(_.fn),
      expected.toSeq.map(v => v != null && v.nonEmpty),
      predicted.toSeq.map(v => v != null && v.nonEmpty))
  }

  /** P6/S5: base = EASY, advanced = MEDIUM+HARD, each re-aggregated. */
  def splits(ds: Dataset[ScoredEvalCase]): Map[String, EvalSummary] = Map(
    "base" -> Report.fromCases(ds.filter(col("difficulty") === "EASY")),
    "advanced" -> Report.fromCases(ds.filter(col("difficulty").isin("MEDIUM", "HARD"))))

  // --- S4: JSON result sink (driver-side report artifact) ----------------

  /** Render the result file shape of the reference (summary + per-case rows,
    * non-null categories only, ensure_ascii=False, 2-space indent). The
    * result list is a report artifact — bounded by corpus size, not by crawl
    * size; written driver-side. Unpaired surrogates are replaced (the
    * sanitize step at run_pii_evaluation.py:1100-1108). */
  def writeResultsJson(path: String, model: String, summary: EvalSummary,
                       cases: Seq[ScoredEvalCase]): Unit = {
    val sb = new StringBuilder
    sb.append("{\n")
    sb.append(s"""  "model": ${q(model)},\n""")
    sb.append(s"""  "summary": ${summaryJson(summary, indent = 2)},\n""")
    sb.append("  \"results\": [\n")
    sb.append(cases.map { c =>
      val exp = sparse(c.expected)
      val pred = sparse(c.predicted)
      s"""    {"id": ${q(c.id)}, "difficulty": ${q(c.difficulty)}, "f1": ${num(c.microF1)}, """ +
        s""""expected": $exp, "predicted": $pred}"""
    }.mkString(",\n"))
    sb.append("\n  ]\n}\n")
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      sanitize(sb.toString).getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  def summaryJson(s: EvalSummary, indent: Int = 0): String = {
    def catMap[A](m: Map[String, A])(f: A => String): String =
      cats.filter(m.contains).map(c => s"${q(c)}: ${f(m(c))}").mkString("{", ", ", "}")
    val cls = s.clsTotal
    s"""{"total_cases": ${s.totalCases}, "perfect_cases": ${s.perfectCases}, """ +
      s""""overall_accuracy": ${num(s.overallAccuracy)}, "overall_precision": ${num(s.overallPrecision)}, """ +
      s""""overall_recall": ${num(s.overallRecall)}, "overall_f1": ${num(s.overallF1)}, """ +
      s""""category_metrics": ${catMap(s.categoryMetrics)(v => s"""{"precision": ${num(v.precision)}, "recall": ${num(v.recall)}}""")}, """ +
      s""""classification_confusion_matrix": {"per_category": ${catMap(s.clsPerCategory)(cell)}, """ +
      s""""per_difficulty": ${Seq("EASY", "MEDIUM", "HARD").filter(s.clsPerDifficulty.contains).map(d => s"${q(d)}: ${cell(s.clsPerDifficulty(d))}").mkString("{", ", ", "}")}, """ +
      s""""total": {"tp": ${cls.tp}, "tn": ${cls.tn}, "fp": ${cls.fp}, "fn": ${cls.fn}, """ +
      s""""precision": ${num(cls.precision)}, "recall": ${num(cls.recall)}, "f1": ${num(cls.f1)}, "accuracy": ${num(cls.accuracy)}}}}"""
  }

  private def cell(c: ClsCell): String =
    s"""{"precision": ${num(c.precision)}, "recall": ${num(c.recall)}, "f1": ${num(c.f1)}, "accuracy": ${num(c.accuracy)}}"""

  private def sparse(slots: Seq[Seq[String]]): String =
    cats.zip(slots).collect { case (c, v) if v != null =>
      s"${q(c)}: ${v.map(q).mkString("[", ", ", "]")}"
    }.mkString("{", ", ", "}")

  private def num(d: Double): String =
    if (d == d.toLong.toDouble) s"${d.toLong}.0" else BigDecimal(d).underlying.stripTrailingZeros.toPlainString

  private def q(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** Replace unpaired surrogates (UTF-8 replace round-trip). */
  def sanitize(s: String): String =
    new String(s.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      java.nio.charset.StandardCharsets.UTF_8)
}
