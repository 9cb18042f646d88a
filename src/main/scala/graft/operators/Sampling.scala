package graft.operators

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data curation.
  *
  * `df.sample`/`sampleBy` draw from a per-partition RNG, so the selected set
  * changes whenever the partition layout does (repartition, AQE coalesce, a
  * different input split count) — a reproducibility hazard for dataset
  * releases. These operators hash the row's stable key instead: the same row
  * is kept or dropped regardless of layout, engine, or run, and the decision
  * is SQL-portable (md5-based hash60, oracle-checkable in DuckDB).
  *
  * Scale: pure narrow filters — no shuffle, no driver state; the selection
  * predicate pushes into the scan's codegen stage.
  */
object Sampling {

  private val Buckets = 10000L

  private def bucketOf(keyCol: Column, salt: String): Column =
    pmod(TF.hash60(concat(keyCol.cast("string"), lit("|" + salt))), lit(Buckets))

  /** Keep ~`fraction` of rows, chosen by hash of `keyCol`. `salt` decouples
    * independent samples over the same keys (train/eval splits). */
  def hashSample(df: DataFrame, keyCol: Column, fraction: Double,
                 salt: String = ""): DataFrame =
    df.filter(bucketOf(keyCol, salt) < lit(math.round(fraction * Buckets)))

  /** Per-stratum rates (e.g. downsample dominant languages, keep the rare
    * tail whole). Rates resolve via an inlined CASE — no join, still a
    * single narrow filter. Strata absent from `fractions` use `default`. */
  def stratifiedSample(df: DataFrame, strataCol: Column, keyCol: Column,
                       fractions: Map[String, Double], default: Double,
                       salt: String = ""): DataFrame = {
    val threshold = fractions.foldLeft(lit(math.round(default * Buckets))) {
      case (acc, (stratum, f)) =>
        when(strataCol === stratum, lit(math.round(f * Buckets))).otherwise(acc)
    }
    df.filter(bucketOf(keyCol, salt) < threshold)
  }

  /** Data-mixture construction: repeat each row `rate(stratum)` times, where
    * the rate may be fractional or < 1 (epoch weighting: wiki ×2.5, raw web
    * ×0.6, …). Each row gets `floor(rate)` copies plus one more iff its key
    * hash falls under the fractional part — so the realized per-stratum
    * count is exact to 1/Buckets and every decision is per-row deterministic
    * (same mixture for any partition layout, resumable mid-corpus).
    *
    * Emits a `copy` index (1-based) so downstream shuffles can't collapse
    * the duplicates. Pure narrow explode — no shuffle, no driver state. */
  def weightedRepeat(df: DataFrame, strataCol: Column, keyCol: Column,
                     rates: Map[String, Double], default: Double,
                     salt: String = ""): DataFrame = {
    def copiesFor(rate: Double): Column = {
      val whole = math.floor(rate).toLong
      lit(whole) + when(bucketOf(keyCol, salt) <
        lit(math.round((rate - whole) * Buckets)), lit(1L)).otherwise(lit(0L))
    }
    val nCopies = rates.foldLeft(copiesFor(default)) {
      case (acc, (stratum, r)) => when(strataCol === stratum, copiesFor(r)).otherwise(acc)
    }
    // sequence(1, 0) would count DOWN ([1,0]); rows with 0 copies must
    // instead explode an empty array (dropping the row).
    df.withColumn("copy", explode(when(nCopies >= 1, sequence(lit(1L), nCopies))
      .otherwise(array().cast("array<bigint>"))))
  }
}
