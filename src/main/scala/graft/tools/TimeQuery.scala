package graft.tools

import graft.{GraftSession, SparkEntry}

/** Ad-hoc single-query timing: `runMain graft.tools.TimeQuery q53... [reps]`
  * (trailing integer = reps, default 4) over SPARK_GRAFT_SF_DIR (default
  * sf0.1) — isolates one query from the full bench when a number looks
  * noisy. */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val (names, reps) = args.lastOption.filter(_.forall(_.isDigit)) match {
      case Some(n) => (args.init.toSeq, n.toInt)
      case None => (args.toSeq, 4)
    }
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "time-query")
    for (q <- names) {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"TIMEQ $q reps=${times.map(t => f"$t%.2f").mkString(",")} min=${times.min}%.3f")
    }
    spark.stop()
  }
}
