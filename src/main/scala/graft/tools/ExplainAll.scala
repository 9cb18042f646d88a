package graft.tools

import graft.{GraftSession, SparkEntry}

/** Plan inspection aid: dump the executed plan of selected (or all) queries
  * — the `.explain` iteration loop for plan-shape review. */
object ExplainAll {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4, "explain")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    for (q <- names) {
      println(s"===== $q =====")
      val df = SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
      df.collect() // materialize so AQE finalizes the plan
      println(df.queryExecution.executedPlan.toString.take(4000))
    }
    spark.stop()
  }
}
