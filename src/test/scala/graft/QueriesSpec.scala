package graft

/** Smoke coverage: every SparkEntry query runs at sf0.001, yields rows, and
  * is deterministic across two executions (same content hash). */
class QueriesSpec extends SparkSpecBase {
  import org.apache.spark.sql.functions._

  private def contentHash(df: org.apache.spark.sql.DataFrame): java.math.BigDecimal = {
    val cols = df.columns.sorted.map(c => col(s"`$c`").cast("string"))
    df.select(md5(concat_ws("", cols: _*)).as("h"))
      .agg(sum(conv(substring(col("h"), 1, 15), 16, 10).cast("decimal(38,0)")))
      .head().getDecimal(0)
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs, non-empty, deterministic") {
      val df1 = fn(spark, sfDir)
      val n = df1.count()
      assert(n > 0, s"$name returned no rows")
      assert(contentHash(fn(spark, sfDir)) == contentHash(fn(spark, sfDir)))
    }
  }

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
