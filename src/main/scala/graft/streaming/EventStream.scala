package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured-Streaming operators over the `events` table shape
  * (event_id, ts, user_id, event_type, value, props).
  *
  * The reference is pure batch; these are the streaming analogues a
  * continuously-crawling pipeline needs: watermarked windowed aggregation and
  * custom sessionization state. File-source parquet streams make the same
  * code run in tests (one micro-batch over the fixture) and against a
  * continuously-appended directory at scale.
  */
object EventStream {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  def readEvents(spark: SparkSession, path: String): DataFrame =
    spark.readStream.schema(eventSchema).parquet(path)

  /** Watermarked sliding-window rollup: count + sum(value) per
    * (5-minute window, event_type); late data beyond 10 minutes dropped. */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Tumbling-window rollup with exact decimal sums (oracle-parity variant,
    * run in Complete mode so every window is emitted). */
  def windowedRollupExact(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Exactly-once ingestion from an at-least-once source: drop re-delivered
    * events by id. `dropDuplicatesWithinWatermark` keys state by event_id
    * but evicts entries once the watermark passes their ts + delay —
    * bounded state, unlike `dropDuplicates` which retains every id seen
    * forever (a leak on an unbounded stream). */
  def dedupedEvents(events: DataFrame, watermarkDelay: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("event_id")

  final case class Session(userId: Long, nEvents: Long, firstTs: Long, lastTs: Long,
      totalValue: Double)
  final case class Ev(user_id: Long, ts: java.sql.Timestamp, value: Double)

  /** Gap sessionization via flatMapGroupsWithState + event-time timeout
    * (the KeyValueGroupedDataset custom-state pattern the north rule calls
    * for): a per-user session CLOSES after `gapMs` of inactivity — either
    * observed directly (the next event arrives past the gap; the closed
    * session is emitted in the same micro-batch) or via the watermark
    * passing lastTs+gap (event-time timeout fires and emits it). The
    * in-flight session lives in state; output mode is Append.
    *
    * Memory bound: events of ONE user within ONE micro-batch are buffered to
    * sort by event time (the grouped iterator arrives unordered and gap
    * semantics need order). That is ~24 B/event of task memory — a 10⁵-event
    * hot user costs a few MB (pinned by the hot-user spec); the knob that
    * bounds it at scale is the trigger interval (events/user/batch), not
    * state size, which stays O(1) per user (one open session). */
  def sessionize(events: Dataset[Ev], gapMs: Long = 30 * 60 * 1000L,
                 watermarkDelay: String = "10 minutes"): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Session, Session](
          OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId, evs, state: GroupState[Session]) =>
          if (state.hasTimedOut) {
            val closed = state.getOption.toSeq
            state.remove()
            closed.iterator
          } else {
            val sorted = evs.toArray.sortBy(_.ts.getTime)
            val closed = Seq.newBuilder[Session]
            var cur = state.getOption
            for (e <- sorted) {
              val t = e.ts.getTime
              cur = cur match {
                case Some(s) if t - s.lastTs > gapMs =>
                  closed += s
                  Some(Session(userId, 1L, t, t, e.value))
                case Some(s) =>
                  Some(Session(userId, s.nEvents + 1,
                    math.min(s.firstTs, t), math.max(s.lastTs, t), s.totalValue + e.value))
                case None => Some(Session(userId, 1L, t, t, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // timeout must stay ahead of the current watermark (late data)
              state.setTimeoutTimestamp(
                math.max(s.lastTs + gapMs, state.getCurrentWatermarkMs() + 1))
            }
            closed.result().iterator
          }
      }
  }

  /** Run a streaming query to completion over a static directory (one pass)
    * and return the in-memory result — the test/local harness. */
  def runOnce(spark: SparkSession, df: DataFrame, queryName: String,
              mode: OutputMode = OutputMode.Append()): DataFrame = {
    val q = df.writeStream.outputMode(mode)
      .format("memory").queryName(queryName)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }
}
