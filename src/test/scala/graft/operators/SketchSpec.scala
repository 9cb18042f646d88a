package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Accuracy bounds for the sketch aggregates q49 ships: HLL++ approx
  * distinct (default rsd 5%) and approx percentile (accuracy 1000). These
  * are what replaces exact distinct/percentile at 100 TB — the gate is the
  * error bound, not exactness. */
class SketchSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val events = spark.read.parquet(s"$sfDir/events.parquet").cache()

  test("approx_count_distinct within 5% of exact on event users") {
    val rows = events.groupBy("event_type")
      .agg(approx_count_distinct($"user_id").as("approx"),
        count_distinct($"user_id").as("exact"))
      .collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (a, e) = (r.getAs[Long]("approx").toDouble, r.getAs[Long]("exact").toDouble)
      assert(math.abs(a - e) / e <= 0.05, s"${r.getString(0)}: approx=$a exact=$e")
    }
  }

  test("approx_percentile within one value-neighborhood of the exact percentile") {
    val r = events.agg(
      percentile_approx($"value", lit(0.5), lit(1000)).as("ap50"),
      expr("percentile(value, 0.5)").as("ep50"),
      expr("stddev_samp(value)").as("sd")).head()
    val (ap, ep, sd) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
    assert(math.abs(ap - ep) <= sd * 0.05, s"approx p50=$ap exact=$ep sd=$sd")
  }
}
