package graft.operators

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: assign documents to fixed-token-budget training
  * sequences ("concat-and-chunk", the packing used by most LLM pretraining
  * pipelines: concatenate documents in a deterministic order, then cut the
  * stream into `budget`-token chunks; a document belongs to the chunk where
  * it STARTS).
  *
  * Distribution: a single global concatenation order would serialize the
  * window scan, so documents are first routed to `nShards` independent
  * streams by a stable hash of their id — each shard packs independently
  * and in parallel (one shuffle on the uniform shard key, then a
  * partition-local sort + running sum). At 100 TB you raise `nShards` to
  * O(10⁵) so each shard's stream fits one task; packing quality is
  * unaffected because chunk boundaries never cross shards anyway.
  *
  * Determinism: shard = hash60(id), order = id — same assignment for any
  * partition layout, engine, or run; the whole computation is two window
  * functions, mirrored exactly by the DuckDB oracle (q52).
  */
object Packing {

  /** Per-document packing assignment: `shard`, `start_off` (token offset of
    * the document within its shard's concatenated stream) and `seq_id`
    * (chunk index = floor(start_off / budget)).
    */
  def packSequences(df: DataFrame, idCol: Column, nTokensCol: Column,
                    budget: Int, nShards: Int): DataFrame = {
    val sharded = df.withColumn("shard", pmod(TF.hash60(idCol.cast("string")), lit(nShards)))
    val w = Window.partitionBy("shard").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    sharded
      .withColumn("start_off", coalesce(sum(nTokensCol).over(w), lit(0L)))
      .withColumn("seq_id", floor(col("start_off") / budget))
  }

  /** Roll a packing up to one row per produced training sequence. */
  def sequenceStats(packed: DataFrame, nTokensCol: Column): DataFrame =
    packed.groupBy("shard", "seq_id")
      .agg(count(lit(1)).as("n_docs"), sum(nTokensCol).as("n_tokens"))
}
