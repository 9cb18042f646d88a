package graft.tools

import graft.{GraftSession, SparkEntry}

/** Ad-hoc query inspection: `runMain graft.tools.ShowQuery <sfDir> <name>`
  * prints the named SparkEntry query's result (default: the q64 composed-
  * curation stage counts). */
object ShowQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.local(8, "show-query")
    SparkEntry.queries(args.lift(1).getOrElse("q64_curation_counts"))(spark, sfDir)
      .show(100, false)
    spark.stop()
  }
}
