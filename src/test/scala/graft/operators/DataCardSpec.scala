package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class DataCardSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val docs = Seq(
    ("en", "s1", "h1", 10L), ("en", "s1", "h1", 20L), ("en", "s2", "h2", 30L),
    ("ko", "s1", "h3", 5L), ("ko", "s3", "h3", 7L),
    (null.asInstanceOf[String], "s1", "h4", 2L)
  ).toDF("lang", "source", "host", "toks")

  test("per-stratum rows plus the ALL grand total, exact distincts") {
    val card = DataCard.summarize(docs, "lang", $"toks", $"host", $"source")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(card.keySet == Set("en", "ko", "unknown", "ALL"))
    val en = card("en")
    assert(en.getLong(1) == 3L && en.getLong(2) == 60L) // n_docs, n_tokens
    assert(en.getLong(3) == 2L && en.getLong(4) == 2L)  // hosts, sources
    assert(en.getLong(5) == 10L && en.getLong(6) == 30L)
    assert(en.getDouble(7) == 20.0)
    val all = card("ALL")
    assert(all.getLong(1) == 6L && all.getLong(2) == 74L)
    assert(all.getLong(3) == 4L && all.getLong(4) == 3L)
    // grand-total distincts are global, not a sum of per-stratum distincts
    assert(all.getLong(4) < card.values.filter(_.getString(0) != "ALL")
      .map(_.getLong(4)).sum)
  }

  test("NULL strata are reported as 'unknown', never dropped") {
    val card = DataCard.summarize(docs, "lang", $"toks", $"host", $"source")
    val unk = card.filter($"lang" === "unknown").collect()
    assert(unk.length == 1 && unk.head.getLong(1) == 1L)
  }

  test("single aggregation pass: one Expand, map-side partial aggregation") {
    val plan = DataCard.summarize(docs, "lang", $"toks", $"host", $"source")
      .queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), plan)
    assert(plan.contains("partial_count") || plan.contains("partial"), plan)
  }
}
