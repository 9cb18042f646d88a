package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus data card — the release-documentation rollup every published
  * training set ships (per-language composition, token totals, host and
  * source diversity): one pass over the curated corpus producing a
  * per-stratum row PLUS the grand-total row, exactly the table a model card
  * prints.
  *
  * Scale shape: `rollup` plans as a single Expand(×2) + hash aggregate with
  * map-side partial aggregation — counts and sums combine before the one
  * dimension-scale shuffle. The distinct counts (hosts, sources) are EXACT
  * (a data card is a published artifact; ±2% sketch error is a correction
  * note waiting to happen) — Spark plans them as the expand-based
  * two-phase distinct aggregate, still map-side-combined per (stratum,
  * host) before anything moves. Output is |strata|+1 rows; it never
  * returns to executor scale. Runs once per release — the cost profile to
  * optimize is the scan, not the agg.
  *
  * Exactness across engines: counts/sums are integer; `mean_doc_tokens` is
  * ONE division of exact longs then `round(.,4)` — IEEE correctly-rounded
  * on both sides, so a DuckDB `GROUP BY ROLLUP` oracle hash-matches (the
  * q80 discipline).
  */
object DataCard {

  /** Summarize `df` per `strataCol` value plus an `ALL` grand-total row.
    * NULL strata label as `unknown` (they are real documents — a data card
    * that silently drops the unlabeled rows misstates the corpus; a corpus
    * whose strata legitimately contain the literal value `unknown` will see
    * those rows merged into the same label). The `is_total` flag (0 =
    * per-stratum row, 1 = grand total) disambiguates the total row even if
    * a stratum is literally named `ALL` — labels are for humans, the flag
    * is the contract. */
  def summarize(df: DataFrame, strataCol: String, tokensCol: Column,
                hostCol: Column, sourceCol: Column): DataFrame = {
    val prepared = df.select(
      coalesce(col(strataCol).cast("string"), lit("unknown")).as("__stratum"),
      tokensCol.cast("long").as("__toks"),
      hostCol.cast("string").as("__host"),
      sourceCol.cast("string").as("__source"))
    prepared.rollup(col("__stratum"))
      .agg(
        grouping(col("__stratum")).as("__g"),
        count(lit(1)).as("n_docs"),
        sum(col("__toks")).as("n_tokens"),
        countDistinct(col("__host")).as("n_hosts"),
        countDistinct(col("__source")).as("n_sources"),
        min(col("__toks")).as("min_doc_tokens"),
        max(col("__toks")).as("max_doc_tokens"),
        round(sum(col("__toks")).cast("double") / count(lit(1)), 4)
          .as("mean_doc_tokens"))
      .select(
        when(col("__g") === 1, lit("ALL")).otherwise(col("__stratum")).as(strataCol),
        col("__g").cast("int").as("is_total"),
        col("n_docs"), col("n_tokens"), col("n_hosts"), col("n_sources"),
        col("min_doc_tokens"), col("max_doc_tokens"), col("mean_doc_tokens"))
  }
}
