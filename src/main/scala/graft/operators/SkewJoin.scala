package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-resilient equi-join: the classic salting pattern for the
  * pathological hot key that AQE's skew split can't fix (one join key much
  * larger than a partition still hashes every probe row to ONE reducer when
  * the build side must co-locate).
  *
  * The big side gets a deterministic per-row salt in [0, salt); the other
  * side is replicated `salt` times (an explode over a literal sequence — a
  * narrow map); the join key becomes (key, _salt), spreading each hot key
  * over `salt` reducers. Result is exactly the plain equi-join
  * (oracle-checked by q47).
  *
  * Use this ONLY when the dim side is too large to broadcast — a broadcast
  * join has no reducer hotspot and needs no salt. This is the shuffle-join
  * regime: a 100 GB dim against a 100 TB fact with one hot key.
  *
  * The salt is hash-of-row-content (not rand()/monotonic id), so the result
  * is deterministic and stable under retries/recomputation — a correctness
  * requirement under Spark's task-retry semantics, where a lost partition is
  * recomputed from lineage and a rand() salt would re-deal rows differently.
  */
object SkewJoin {
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salt: Int = 16): DataFrame = {
    require(salt >= 1)
    val bigSalted = big.withColumn("_salt",
      pmod(hash(big.columns.map(col).toIndexedSeq: _*), lit(salt)))
    val smallRep = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salt - 1))))
    bigSalted.join(smallRep.hint("shuffle_hash"), Seq(key, "_salt")).drop("_salt")
  }
}
