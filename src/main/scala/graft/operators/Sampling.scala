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
}
