package graft.filter

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CCNet-style corpus bucketing (Wenzek et al. 2020 §4.4): per-language
  * perplexity cutoffs split the corpus into head / middle / tail, and
  * training mixes prefer the head. The cutoffs are a per-language aggregate
  * (one row per language — tiny) broadcast-joined back onto the corpus, so
  * the documents themselves never shuffle: one partial-agg shuffle of the
  * (lang, score) two-column projection plus one narrow labeling pass.
  *
  * Exact `percentile` is used rather than `percentile_approx` so the bucket
  * boundary is deterministic under any partition layout (and oracle-exact);
  * only the projected score column pays the sort. A 100-TB deployment that
  * tolerates sketch error at the boundary can swap in percentile_approx for
  * a cheaper single-pass cutoff.
  *
  * Lower score = better (perplexity semantics): score ≤ loCut-percentile →
  * "head", ≤ hiCut-percentile → "middle", else "tail".
  */
object CcnetBucket {
  def bucketByScore(df: DataFrame, langCol: String, scoreCol: String,
                    loCut: Double = 1.0 / 3, hiCut: Double = 2.0 / 3): DataFrame = {
    val cuts = df.groupBy(col(langCol)).agg(
      percentile(col(scoreCol), lit(loCut)).as("__lo"),
      percentile(col(scoreCol), lit(hiCut)).as("__hi"))
    // left join: a NULL langCol never equi-matches, and a labeling operator
    // must not silently drop documents — pre-langid pages fall to "tail"
    df.join(broadcast(cuts), Seq(langCol), "left")
      .withColumn("bucket",
        when(col("__lo").isNull, "tail")
          .when(col(scoreCol) <= col("__lo"), "head")
          .when(col(scoreCol) <= col("__hi"), "middle")
          .otherwise("tail"))
      .drop("__lo", "__hi")
  }
}
