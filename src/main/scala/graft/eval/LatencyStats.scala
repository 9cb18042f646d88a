package graft.eval

import graft.core.PyCompat.pyRound
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Latency-statistics engine (run_pii_evaluation.py:874-945): mean / median /
  * sample-stdev / min / max / linearly-interpolated P90-P99 over measurement
  * rows, all rounded HALF_EVEN to 4 decimals. Spark `percentile` implements
  * the same `(n-1)·p` interpolation as the reference's formula.
  */
object LatencyStats {

  final case class Stats(
      meanSec: Double, medianSec: Double, stdevSec: Double,
      minSec: Double, maxSec: Double,
      p90Sec: Double, p95Sec: Double, p99Sec: Double,
      avgPromptTokens: Double, avgCompletionTokens: Double)

  def measurementsSchema: StructType = StructType(Seq(
    StructField("run", LongType), StructField("latency_sec", DoubleType),
    StructField("prompt_tokens", LongType), StructField("completion_tokens", LongType),
    StructField("total_tokens", LongType)))

  /** Load the measurements array of a stored latency_*.json. */
  def loadMeasurements(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(StructType(Seq(StructField("measurements", ArrayType(measurementsSchema)))))
      .option("multiLine", true).json(path)
      .select(explode(col("measurements")).as("m"))
      .select("m.*")

  /** Statistics over the (small, report-scale) measurement set. Percentile /
    * mean / stdev reproduce CPython's exact arithmetic: the reference's
    * `(n-1)·p/100.0` interpolation (Spark's `percentile` associates the
    * multiplication differently — 1-ulp differences cross rounding
    * boundaries), `statistics.mean/median/stdev` exact-rational semantics. */
  def compute(measurements: DataFrame): Stats = {
    val rows = measurements.select("latency_sec", "prompt_tokens", "completion_tokens").collect()
    val lats = rows.map(_.getDouble(0))
    val sorted = lats.sorted
    val n = lats.length

    // ref percentile: k = (n-1)*p/100.0; vals[f] + (k-f)*(vals[c]-vals[f])
    def pct(p: Int): Double = {
      val k = (n - 1) * p / 100.0
      val f = k.toInt
      val c = math.min(f + 1, n - 1)
      sorted(f) + (k - f) * (sorted(c) - sorted(f))
    }
    val mean = exactMean(lats)
    val median =
      if (n % 2 == 1) sorted(n / 2)
      else (sorted(n / 2 - 1) + sorted(n / 2)) / 2.0
    val stdev = if (n > 1) exactStdev(lats) else 0.0

    Stats(pyRound(mean, 4), pyRound(median, 4), pyRound(stdev, 4),
      pyRound(sorted.head, 4), pyRound(sorted.last, 4),
      pyRound(pct(90), 4), pyRound(pct(95), 4), pyRound(pct(99), 4),
      pyRound(exactMean(rows.map(_.getLong(1).toDouble)), 1),
      pyRound(exactMean(rows.map(_.getLong(2).toDouble)), 1))
  }

  private val mc = new java.math.MathContext(50)

  /** statistics.mean — exact rational mean of the binary doubles. */
  private def exactMean(xs: Array[Double]): Double = {
    val sum = xs.foldLeft(java.math.BigDecimal.ZERO)((a, x) => a.add(new java.math.BigDecimal(x)))
    sum.divide(new java.math.BigDecimal(xs.length), mc).doubleValue()
  }

  /** statistics.stdev — sample stdev with exact sum-of-squares. */
  private def exactStdev(xs: Array[Double]): Double = {
    val m = {
      val sum = xs.foldLeft(java.math.BigDecimal.ZERO)((a, x) => a.add(new java.math.BigDecimal(x)))
      sum.divide(new java.math.BigDecimal(xs.length), mc)
    }
    val ss = xs.foldLeft(java.math.BigDecimal.ZERO) { (a, x) =>
      val d = new java.math.BigDecimal(x).subtract(m)
      a.add(d.multiply(d))
    }
    math.sqrt(ss.divide(new java.math.BigDecimal(xs.length - 1), mc).doubleValue())
  }
}
