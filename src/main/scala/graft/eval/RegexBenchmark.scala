package graft.eval

import graft.GraftSession
import graft.core.PiiDetector
import graft.model.TestCase
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Spark-native rebuild of the reference's regex benchmark CLI
  * (regex_pii_detector.py:334-419): corpus scan → per-row detect → per-case
  * score → corpus + per-category aggregation → console report.
  *
  * Shape: one narrow map stage (detector), then a tiny aggregate — the only
  * shuffle is the final per-category rollup over (case × category) rows.
  */
object RegexBenchmark {

  final case class ScoredCase(
      id: String, difficulty: String, tp: Int, fp: Int, fn: Int, f1: Double,
      catTp: Seq[Int], catFp: Seq[Int], catFn: Seq[Int])

  def loadCorpus(spark: SparkSession, path: String): Dataset[TestCase] = {
    import spark.implicits._
    spark.read.schema(TestCase.schema).option("multiLine", true).json(path).as[TestCase]
  }

  /** Per-case scoring: regex-benchmark variant (raw expected types, unstripped
    * sets). Also carries per-category cells for the rollup report. */
  def score(corpus: Dataset[TestCase]): Dataset[ScoredCase] = {
    import corpus.sparkSession.implicits._
    corpus.map { tc =>
      val pred = PiiDetector.detect(tc.document_text)
      val exp = MetricsEngine.pivotExpectedRaw(
        Option(tc.expected_pii).getOrElse(Nil).map(e => (e.`type`, e.value)))
      val s = MetricsEngine.scoreCase(exp, pred.cats)
      val cells = (0 until graft.core.PiiCategories.size).map { i =>
        val e = if (exp(i) == null) Set.empty[String] else exp(i).toSet
        val p = if (pred.cats(i) == null) Set.empty[String] else pred.cats(i).toSet
        ((e & p).size, (p -- e).size, (e -- p).size)
      }
      ScoredCase(tc.id, tc.difficulty, s.tp, s.fp, s.fn, s.f1Rounded,
        cells.map(_._1), cells.map(_._2), cells.map(_._3))
    }
  }

  def main(args: Array[String]): Unit = {
    val corpusPath = args.headOption.getOrElse("/root/reference/combined_test_cases.json")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt, "regex-benchmark")
    import spark.implicits._

    val scored = score(loadCorpus(spark, corpusPath)).cache()

    val row = scored.agg(
      count("*").as("total"),
      sum(when($"f1" === 1.0, 1).otherwise(0)).as("perfect"),
      sum($"tp").as("tp"), sum($"fp").as("fp"), sum($"fn").as("fn")).head()
    val stats = MetricsEngine.corpusStats(
      row.getLong(0).toInt, row.getLong(1).toInt, row.getLong(2), row.getLong(3), row.getLong(4))

    println("\n=== Regex-Only Results (Spark) ===")
    println(s"Total: ${stats.total} | Perfect: ${stats.perfect} (${stats.accuracy}%)")
    println(s"Precision: ${stats.precision}% | Recall: ${stats.recall}% | F1: ${stats.f1}%")
    println(s"TP: ${stats.tp} | FP: ${stats.fp} | FN: ${stats.fn}")

    // Per-category rollup (A4): explode (case × category) cells, sum per cat.
    val catNames = graft.core.PiiCategories.names
    val perCat = scored
      .select(explode(arrays_zip(
        lit(catNames.toArray), $"catTp", $"catFp", $"catFn")).as("c"))
      .select($"c.0".as("cat"), $"c.catTp".as("tp"), $"c.catFp".as("fp"), $"c.catFn".as("fn"))
      .groupBy($"cat").agg(sum($"tp").as("tp"), sum($"fp").as("fp"), sum($"fn").as("fn"))
      .withColumn("precision", round(lit(100) * $"tp" / greatest($"tp" + $"fp", lit(1)), 1))
      .withColumn("recall", round(lit(100) * $"tp" / greatest($"tp" + $"fn", lit(1)), 1))
      .collect()
      .sortBy(r => catNames.indexOf(r.getString(0)))

    println("\ncategory  tp/fp/fn  P%  R%")
    perCat.foreach { r =>
      println(f"${r.getString(0)}%-12s ${r.getLong(1)}%4d/${r.getLong(2)}%-4d/${r.getLong(3)}%-4d ${r.getDouble(4)}%5.1f ${r.getDouble(5)}%5.1f")
    }
    spark.stop()
  }
}
