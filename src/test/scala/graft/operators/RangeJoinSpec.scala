package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  private lazy val points = (0L until 2000L).map(i => (i, ts(i * 37)))
    .toDF("pt_id", "ts").cache()
  private lazy val ivals = (0L until 40L)
    .map(i => (i, ts(i * 1800), ts(i * 1800 + 600))) // 10-min windows
    .toDF("ival_id", "t_start", "t_end").cache()

  test("binned range join equals the naive containment join for every bin size") {
    val naive = points.crossJoin(ivals)
      .filter($"ts" >= $"t_start" && $"ts" <= $"t_end")
      .select("pt_id", "ival_id").collect().map(_.toString).sorted.toSeq
    assert(naive.nonEmpty)
    for (bin <- Seq(60L, 600L, 7200L)) {
      val binned = RangeJoin.pointInInterval(points, ivals, "ts", "t_start", "t_end", bin)
        .select("pt_id", "ival_id").collect().map(_.toString).sorted.toSeq
      assert(binned == naive, s"bin=$bin diverged from naive")
    }
  }

  test("the plan is an equi-join on the bin — no nested-loop join") {
    val df = RangeJoin.pointInInterval(points, ivals, "ts", "t_start", "t_end", 600)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join must not nested-loop:\n$plan")
  }

  test("intervals straddling a bin boundary still match points in both bins") {
    val p = Seq((1L, ts(599)), (2L, ts(601))).toDF("pt_id", "ts")
    val i = Seq((7L, ts(590), ts(610))).toDF("ival_id", "t_start", "t_end")
    val got = RangeJoin.pointInInterval(p, i, "ts", "t_start", "t_end", 600)
      .select("pt_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(1L, 2L))
  }
}
