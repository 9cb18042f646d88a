package graft.filter

import graft.SparkSpecBase
import org.apache.spark.sql.functions.col

class ToxicitySpec extends SparkSpecBase {
  import spark.implicits._

  private val terms = Seq("bad", "awful")

  test("scores whole tokens only — no Scunthorpe substring hits") {
    val rows = Seq(
      (1L, "a bad and AWFUL day"),           // 2 hits of 5 tokens
      (2L, "badger abadfulness embadded ok") // substrings must NOT match
    ).toDF("doc_id", "text")
      .select(col("doc_id"), Toxicity.hits(col("text"), terms).as("h"),
        Toxicity.score(col("text"), terms).as("r"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
    assert(rows(1L) == ((2, 0.4)))
    assert(rows(2L) == ((0, 0.0)))
  }

  test("scrub masks word-boundary occurrences case-insensitively, leaves the rest") {
    val got = Seq("Bad things: a badger had an AWFUL, bad day").toDF("text")
      .select(Toxicity.scrub(col("text"), terms)).head().getString(0)
    assert(got == "[masked] things: a badger had an [masked], [masked] day")
  }
}
