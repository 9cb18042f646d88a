package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Cross-batch selection state: admission host caps and latest-capture
  * upserts. The invariant both operators are built on — and the one every
  * test here pins — is FULL-RUN EQUIVALENCE: N incremental steps must admit
  * exactly what the corpus-wide policy over the concatenated arrivals would
  * have selected, restricted to each batch's rows. */
class IncrementalSelectSpec extends SparkSpecBase {
  import spark.implicits._

  private def arrivals(rows: (Long, String, Long)*) =
    rows.toDF("doc_id", "host", "warc_ts")

  test("hostCapStep: saturated, safe and boundary hosts all resolve per the full-run rank") {
    // history: a.com has 3 arrivals, b.net has 1, c.org none
    val history = arrivals(
      (1L, "a.com", 10L), (2L, "a.com", 11L), (3L, "a.com", 12L),
      (4L, "b.net", 13L))
    val state = IncrementalSelect.hostCapInit(history, "host")
    // batch (cap=3): a.com saturated -> drop both; b.net boundary (1+3>3,
    // 1<3) -> first two by (ts, id) admitted; c.org safe -> all admitted
    val batch = arrivals(
      (10L, "a.com", 100L), (11L, "a.com", 101L),
      (12L, "b.net", 102L), (13L, "b.net", 103L), (14L, "b.net", 102L),
      (15L, "c.org", 104L))
    val r = IncrementalSelect.hostCapStep(state, batch, "host", "warc_ts", "doc_id", cap = 3)
    val kept = r.kept.select("doc_id").as[Long].collect().sorted
    // b.net ranks by ts asc, id asc: (102,12), (102,14), (103,13) -> 12, 14
    assert(kept.toSeq == Seq(12L, 14L, 15L))
    val ns = r.nextState.as[(String, Long)].collect().toMap
    assert(ns == Map("a.com" -> 5L, "b.net" -> 4L, "c.org" -> 1L))
  }

  test("hostCapStep: N steps equal the full-corpus window restricted to each batch") {
    val all = (0L until 120L).map { i =>
      (i, s"h${i % 7}", 1000L + i) // 7 hosts, ~17 arrivals each, ts = arrival order
    }
    val batches = all.grouped(40).map(b => arrivals(b: _*)).toSeq
    var state = IncrementalSelect.hostCapInit(arrivals(), "host")
    val admitted = scala.collection.mutable.ArrayBuffer[Long]()
    batches.foreach { b =>
      val r = IncrementalSelect.hostCapStep(state, b, "host", "warc_ts", "doc_id", cap = 9)
      admitted ++= r.kept.select("doc_id").as[Long].collect()
      state = r.nextState.localCheckpoint()
    }
    val full = arrivals(all: _*)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("host")
          .orderBy(col("warc_ts").asc, col("doc_id").asc)))
      .filter(col("rn") <= 9).select("doc_id").as[Long].collect()
    assert(admitted.sorted.toSeq == full.sorted.toSeq)
    // every host saw all its arrivals counted, admitted or not
    val ns = state.as[(String, Long)].collect().toMap
    assert(ns.values.sum == 120L)
  }

  test("hostCapStep: NULL-host rows are exempt from the cap and never counted") {
    val state = IncrementalSelect.hostCapInit(
      arrivals((1L, "a.com", 10L), (2L, "a.com", 11L), (3L, "a.com", 12L)), "host")
    val batch = Seq((10L, Option.empty[String], 100L), (11L, Some("a.com"), 101L))
      .toDF("doc_id", "host", "warc_ts")
    val r = IncrementalSelect.hostCapStep(state, batch, "host", "warc_ts", "doc_id", cap = 3)
    // a.com saturated -> 11 dropped; the unknown-host row passes through
    assert(r.kept.select("doc_id").as[Long].collect().toSeq == Seq(10L))
    val ns = r.nextState.as[(String, Long)].collect().toMap
    assert(ns == Map("a.com" -> 4L), "NULL hosts must not enter the counters")
  }

  test("latestCaptureStep: NULL urls form ONE key — cumulative count, single state row") {
    val state = IncrementalSelect.latestCaptureInit(
      Seq((2L, Option.empty[String], 10L), (4L, Option.empty[String], 20L))
        .toDF("doc_id", "url", "warc_ts"), "url", "warc_ts", "doc_id")
    val batch1 = Seq((7L, Option.empty[String], 30L)).toDF("doc_id", "url", "warc_ts")
    val r1 = IncrementalSelect.latestCaptureStep(state, batch1, "url", "warc_ts", "doc_id")
    assert(r1.upserts.select("doc_id", "n_captures").as[(Long, Long)].collect().toSeq ==
      Seq((7L, 3L)), "NULL-url batch winner must see the accumulated history count")
    // a stale NULL-url capture next step: no upsert, count still accrues,
    // and the state holds exactly ONE NULL-url row throughout
    val batch2 = Seq((9L, Option.empty[String], 5L)).toDF("doc_id", "url", "warc_ts")
    val r2 = IncrementalSelect.latestCaptureStep(r1.nextState, batch2, "url", "warc_ts", "doc_id")
    assert(r2.upserts.isEmpty)
    val rows = r2.nextState.as[(Option[String], Long, Long, Long)].collect().toSeq
    assert(rows == Seq((None, 30L, 7L, 4L)))
  }

  private def caps(rows: (Long, String, Long)*) =
    rows.map { case (id, u, ts) => (id, u, ts) }.toDF("doc_id", "url", "warc_ts")

  test("latestCaptureStep: fresh / superseding / stale / tied-both-ways upserts") {
    val history = caps(
      (2L, "u1", 50L), (4L, "u1", 60L), // u1 best: (4, 60)
      (6L, "u2", 70L),                  // u2 best: (6, 70)
      (8L, "u3", 80L))                  // u3 best: (8, 80)
    val state = IncrementalSelect.latestCaptureInit(history, "url", "warc_ts", "doc_id")
    val batch = caps(
      (11L, "u1", 65L), (13L, "u1", 61L), // beats u1 (65 > 60) after batch collapse
      (15L, "u2", 70L),                   // ties u2 ts but larger id -> history defends
      (3L, "u3", 80L),                    // ties u3 ts with SMALLER id -> batch wins
      (17L, "u4", 90L), (19L, "u4", 85L)) // fresh url
    val r = IncrementalSelect.latestCaptureStep(state, batch, "url", "warc_ts", "doc_id")
    val up = r.upserts.select("url", "doc_id", "warc_ts", "n_captures")
      .orderBy("url").as[(String, Long, Long, Long)].collect().toSeq
    assert(up == Seq(("u1", 11L, 65L, 4L), ("u3", 3L, 80L, 2L), ("u4", 17L, 90L, 2L)))
    val ns = r.nextState.orderBy("url").as[(String, Long, Long, Long)].collect().toSeq
    assert(ns == Seq(
      ("u1", 65L, 11L, 4L), // upserted winner, cumulative captures
      ("u2", 70L, 6L, 2L),  // history defended the tie; count still grew
      ("u3", 80L, 3L, 2L),  // batch won the tie
      ("u4", 90L, 17L, 2L)))
  }

  test("latestCaptureStep: N steps leave exactly the full-run latestCapture state") {
    val all = (0L until 90L).map(i => (i, s"u${i % 11}", (i * 13) % 40))
    val batches = all.grouped(30).map(b => caps(b: _*)).toSeq
    var state = IncrementalSelect.latestCaptureInit(caps(), "url", "warc_ts", "doc_id")
    batches.foreach { b =>
      val r = IncrementalSelect.latestCaptureStep(state, b, "url", "warc_ts", "doc_id")
      state = r.nextState.localCheckpoint()
    }
    val incr = state.orderBy("url").as[(String, Long, Long, Long)].collect().toSeq
    val full = Dedup.latestCapture(caps(all: _*), "url", "warc_ts", "doc_id")
      .select(col("url"), col("warc_ts"), col("doc_id"), col("n_captures"))
      .orderBy("url").as[(String, Long, Long, Long)].collect().toSeq
    assert(incr == full)
  }

  test("latestCaptureStep: state rows for untouched urls pass through a single anti-join") {
    val state = IncrementalSelect.latestCaptureInit(
      caps((1L, "u1", 10L), (2L, "u2", 20L)), "url", "warc_ts", "doc_id")
    val r = IncrementalSelect.latestCaptureStep(state,
      caps((5L, "u1", 30L)), "url", "warc_ts", "doc_id")
    val u2 = r.nextState.filter(col("url") === "u2")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(u2 == Seq(("u2", 20L, 2L, 1L)))
    assert(r.upserts.count() == 1L)
  }
}
