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

  test("dedupedEvents drops a re-delivery arriving in a LATER micro-batch") {
    // re-delivery lands in a second micro-batch: the drop must come from
    // persisted dedup state, not same-batch dedup
    def ts(sec: Long) = new java.sql.Timestamp((100000L + sec) * 1000L)
    val dir = java.nio.file.Files.createTempDirectory("dedup-stream")
    def stage(rows: Seq[(Long, java.sql.Timestamp, Long, String, Double, String)],
              name: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory(s"dedup-$name")
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = new java.io.File(tmp.toString).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(part.toPath, dir.resolve(s"$name.parquet"))
    }
    stage(Seq((1L, ts(0), 7L, "click", 1.0, "{}"),
              (2L, ts(5), 7L, "view", 2.0, "{}")), "a")
    Thread.sleep(1100)
    stage(Seq((1L, ts(0), 7L, "click", 1.0, "{}"), // re-delivered within watermark
              (3L, ts(10), 8L, "click", 3.0, "{}")), "b")
    val src = spark.readStream.schema(EventStream.eventSchema)
      .option("maxFilesPerTrigger", 1).parquet(dir.toString)
    val out = EventStream.runOnce(spark,
      EventStream.dedupedEvents(src, watermarkDelay = "1 hour")
        .select("event_id"), s"dedup_x_${System.nanoTime}")
    assert(out.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("sessionize splits on the inactivity gap and times out idle sessions") {
    // keep clear of epoch 0: the initial watermark is 0 and rows at/below
    // the watermark are dropped as late
    def ts(sec: Long) = new java.sql.Timestamp((100000L + sec) * 1000L)
    val gapMs = 60 * 1000L // 60s gap for the test
    // user 1: three sessions — [0,10,20], [200,210], [500] (gaps > 60s between)
    // user 2: a late high-ts event pushes the watermark far past user 1's
    //         open-session timeout so the trailing [500] session gets emitted
    val batch1 = Seq(
      EventStream.Ev(1L, ts(0), 1.0), EventStream.Ev(1L, ts(10), 2.0),
      EventStream.Ev(1L, ts(20), 3.0),
      EventStream.Ev(1L, ts(200), 4.0), EventStream.Ev(1L, ts(210), 5.0),
      EventStream.Ev(1L, ts(500), 6.0),
      EventStream.Ev(2L, ts(10000), 9.0))
    val batch2 = Seq(EventStream.Ev(2L, ts(10005), 1.0))
    val dir = java.nio.file.Files.createTempDirectory("sess-stream")
    def stage(evs: Seq[EventStream.Ev], name: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory(s"sess-$name")
      evs.toDF("user_id", "ts", "value").coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = new java.io.File(tmp.toString).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(part.toPath, dir.resolve(s"$name.parquet"))
    }
    stage(batch1, "a")
    Thread.sleep(1100) // file source orders batches by mod time (second granularity)
    stage(batch2, "b")
    val src = spark.readStream
      .schema("user_id LONG, ts TIMESTAMP, value DOUBLE")
      .option("maxFilesPerTrigger", 1) // two micro-batches → watermark advances
      .parquet(dir.toString).as[EventStream.Ev]
    val out = EventStream.runOnce(spark,
      EventStream.sessionize(src, gapMs, watermarkDelay = "10 seconds").toDF(),
      "sessions", OutputMode.Append())
    val sessions = out.as[EventStream.Session].collect()
      .map(s => (s.userId, s.nEvents, s.firstTs / 1000 - 100000L,
        s.lastTs / 1000 - 100000L, s.totalValue)).toSet
    // gap-split sessions emitted in-batch; trailing [500] emitted via timeout
    assert(sessions == Set(
      (1L, 3L, 0L, 20L, 6.0),
      (1L, 2L, 200L, 210L, 9.0),
      (1L, 1L, 500L, 500L, 6.0)), s"got $sessions")
  }

  test("sessionize handles a hot user with 100k events in one micro-batch") {
    // the documented bound: per (user, micro-batch) events are buffered for
    // the sort — ~24 B/event, so even a pathological 10⁵-event user is a few
    // MB of task memory. This pins that a hot user COMPLETES and aggregates
    // correctly (one contiguous session, exact count/sum).
    def ts(sec: Long) = new java.sql.Timestamp((100000L + sec) * 1000L)
    val n = 100000
    val dir = java.nio.file.Files.createTempDirectory("sess-hot")
    def stage(evs: Seq[EventStream.Ev], name: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory(s"sess-hot-$name")
      evs.toDF("user_id", "ts", "value").coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = new java.io.File(tmp.toString).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(part.toPath, dir.resolve(s"$name.parquet"))
    }
    stage((0 until n).map(i => EventStream.Ev(7L, ts(i / 100), 1.0)), "a")
    Thread.sleep(1100) // file source orders batches by mod time (second granularity)
    // second micro-batch pushes the watermark past user 7's timeout
    stage(Seq(EventStream.Ev(8L, ts(1000000L), 0.5)), "b")
    val src = spark.readStream
      .schema("user_id LONG, ts TIMESTAMP, value DOUBLE")
      .option("maxFilesPerTrigger", 1)
      .parquet(dir.toString).as[EventStream.Ev]
    val out = EventStream.runOnce(spark,
      EventStream.sessionize(src, gapMs = 60 * 1000L, watermarkDelay = "10 seconds").toDF(),
      s"hot_${System.nanoTime}", OutputMode.Append())
    val hot = out.as[EventStream.Session].collect().filter(_.userId == 7L)
    assert(hot.length == 1)
    assert(hot.head.nEvents == n && hot.head.totalValue == n.toDouble)
  }
}
