package graft.operators

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-shard construction — the LAST pass before a trainer consumes
  * the curated corpus. Trainers read shard files sequentially, so the
  * write order IS the training order: what's needed is a deterministic,
  * seeded global shuffle (no host/crawl-day locality bias inside any
  * shard) realized WITHOUT a global sort — shard assignment and in-shard
  * order both derive from one md5-based hash of the document key, so the
  * whole permutation is reproducible from (key, salt) alone, independent
  * of partition layout, cluster size, or input order; a new salt is a
  * fresh epoch-level reshuffle.
  *
  * Scale shape: one hash projection (narrow) + one shuffle keyed on the
  * shard id + per-shard sort — never a global sort, never driver state.
  * At 10¹² docs / 10⁴ shards each sort is corpus/10⁴ and spills
  * gracefully; shards stay balanced to O(√(n/S)) by the uniformity of the
  * hash (spec-asserted).
  */
object Sharding {

  /** The seeded shuffle hash — md5-backed so the DuckDB oracle can
    * reproduce it bit-exactly (the q37/q80 discipline). */
  private def shuffleHash(keyCol: Column, salt: String): Column =
    TF.hash60(concat(keyCol.cast("string"), lit("|" + salt)))

  /** Assign every row a shard (hash mod `nShards`) and its position within
    * the shard (rank by the same hash, key-tiebroken) — the verifiable
    * (shard, pos) contract a shard writer materializes. Deterministic for
    * any input layout; `salt` selects the epoch permutation. */
  def assignShards(df: DataFrame, keyCol: Column, nShards: Int,
                   salt: String = ""): DataFrame =
    curriculumShards(df, keyCol, nShards, Seq.empty, salt)

  /** Curriculum/annealing order inside seeded shards: shard MEMBERSHIP
    * stays the seeded random partition of [[assignShards]] (same hash,
    * same salt → the same shard, so no difficulty skew ACROSS shards —
    * every shard sees the full distribution), but the in-shard position
    * follows the caller's `curriculum` sort columns (length ascending for
    * short-to-long curricula, quality descending for anneal-to-best late
    * in training), with the shuffle hash as the within-tie randomizer and
    * the key as the final total-order tiebreak — the position is still
    * reproducible from (key, salt, curriculum) under any layout. Same
    * scale shape as [[assignShards]] (which is this with an empty
    * curriculum): one shard-keyed shuffle + per-shard sorts, never a
    * global sort. NULL-ordering caveat for nullable curriculum columns:
    * Spark's `asc` is NULLS FIRST while ANSI/DuckDB ASC is NULLS LAST —
    * oracle-parity callers should pass `asc_nulls_last`/
    * `desc_nulls_first` explicitly. */
  def curriculumShards(df: DataFrame, keyCol: Column, nShards: Int,
                       curriculum: Seq[Column], salt: String = ""): DataFrame = {
    require(nShards > 0, s"nShards must be positive: $nShards")
    val h = shuffleHash(keyCol, salt)
    df.withColumn("__h", h)
      .withColumn("shard", pmod(col("__h"), lit(nShards.toLong)))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard"))
          .orderBy(curriculum :+ col("__h").asc :+ keyCol.asc: _*))
        .cast("long"))
      .drop("__h")
  }

  /** Materialize the shards: one directory per shard
    * (`shard=<k>/part-*.parquet`, a single file each), rows written in
    * their in-shard shuffle order — a trainer streaming a shard file gets
    * the seeded permutation with zero read-time work. One shuffle
    * (repartition on shard) + in-task sort; never a global sort. */
  def writeShards(df: DataFrame, outDir: String, keyCol: Column,
                  nShards: Int, salt: String = ""): Unit = {
    val h = shuffleHash(keyCol, salt)
    df.withColumn("__h", h)
      .withColumn("shard", pmod(col("__h"), lit(nShards.toLong)))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("__h"), keyCol)
      .drop("__h")
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)
  }
}
