package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Binned (bucketized) range join: points ⋈ intervals on containment.
  *
  * Spark plans a bare `p.ts BETWEEN i.start AND i.end` join as a
  * BroadcastNestedLoopJoin — O(|P|·|I|) and a driver OOM once the interval
  * side outgrows the broadcast threshold. Binning turns it into an
  * equi-join: each interval explodes to the time bins it covers (bounded by
  * span/binSize — a narrow map), each point maps to exactly one bin, and
  * the containment predicate rides the equi-join as a post-filter.
  *
  * Scale: the shuffle key (bin) is as uniform as the data's time
  * distribution; `binSize` trades interval replication (span/binSize rows
  * per interval) against per-bin population. Pick binSize ≈ the typical
  * interval length so most intervals land in 1-2 bins.
  */
object RangeJoin {
  /** Epoch seconds for binning: TIMESTAMP_NTZ (what plain parquet scans
    * yield) has no direct numeric cast — route it through the session-tz
    * timestamp; numerics cast straight through. */
  private def epochSec(df: DataFrame, c: String) =
    df.schema(c).dataType match {
      case org.apache.spark.sql.types.TimestampNTZType =>
        col(c).cast("timestamp_ltz").cast("long")
      case _ => col(c).cast("long")
    }

  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      ptCol: String, startCol: String, endCol: String,
                      binSizeSec: Long): DataFrame = {
    require(binSizeSec >= 1)
    val p = points.withColumn("_bin",
      floor(epochSec(points, ptCol) / binSizeSec))
    val i0 = intervals.withColumn("_s", epochSec(intervals, startCol))
      .withColumn("_e", epochSec(intervals, endCol))
    val i = i0.withColumn("_bin",
      explode(sequence(floor(col("_s") / binSizeSec),
        floor(col("_e") / binSizeSec)))).drop("_s", "_e")
    p.join(i, Seq("_bin"))
      .filter(col(ptCol) >= col(startCol) && col(ptCol) <= col(endCol))
      .drop("_bin")
  }
}
