package graft.streaming

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

class EventStreamSpec extends SparkSpecBase {
  import spark.implicits._

  private val eventsPath = s"$sfDir/events.parquet"
  // the file stream source lists a directory; stage the single-file fixture
  private lazy val eventsDir: String = {
    val d = java.nio.file.Files.createTempDirectory("events-stream")
    java.nio.file.Files.copy(java.nio.file.Paths.get(eventsPath),
      d.resolve("part-0.parquet"))
    d.toString
  }

  test("windowed streaming counts equal the batch equivalent") {
    val streamed = EventStream.runOnce(spark,
      EventStream.windowedCounts(EventStream.readEvents(spark, eventsDir)),
      "win_counts", OutputMode.Append())
    val batch = spark.read.parquet(eventsPath)
      .groupBy(window($"ts", "5 minutes"), $"event_type")
      .agg(count(lit(1)).as("n"), sum($"value").as("sum_value"))
      .select($"window.start".as("w_start"), $"event_type", $"n", $"sum_value")
    // With AvailableNow over a static dir the watermark admits everything
    // except windows still open at end-of-stream; every emitted row must
    // match its batch counterpart exactly.
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select($"w_start".cast("string"), $"event_type", $"n", $"sum_value")
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val s = key(streamed)
    val b = key(batch)
    assert(s.nonEmpty)
    assert(s.subsetOf(b), "streamed rows must be a subset of batch rows")
  }

  test("stateful sessionization groups per user with correct counts") {
    val evs = spark.read.parquet(eventsPath)
      .select($"user_id", $"ts", $"value").as[EventStream.Ev]
    val sessions = EventStream.sessionize(evs).collect()
    val expected = spark.read.parquet(eventsPath)
      .groupBy("user_id").agg(count(lit(1)).as("n"), sum("value").as("v"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(sessions.length == expected.size)
    for (s <- sessions) {
      val (n, v) = expected(s.userId)
      assert(s.nEvents == n, s"user ${s.userId}")
      assert(math.abs(s.totalValue - v) < 1e-6)
      assert(s.firstTs <= s.lastTs)
    }
  }
}
