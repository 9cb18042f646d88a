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
    assert(en.getInt(1) == 0)                           // is_total
    assert(en.getLong(2) == 3L && en.getLong(3) == 60L) // n_docs, n_tokens
    assert(en.getLong(4) == 2L && en.getLong(5) == 2L)  // hosts, sources
    assert(en.getLong(6) == 10L && en.getLong(7) == 30L)
    assert(en.getDouble(8) == 20.0)
    val all = card("ALL")
    assert(all.getInt(1) == 1)
    assert(all.getLong(2) == 6L && all.getLong(3) == 74L)
    assert(all.getLong(4) == 4L && all.getLong(5) == 3L)
    // grand-total distincts are global, not a sum of per-stratum distincts
    assert(all.getLong(5) < card.values.filter(_.getString(0) != "ALL")
      .map(_.getLong(5)).sum)
  }

  test("NULL strata are reported as 'unknown', never dropped") {
    val card = DataCard.summarize(docs, "lang", $"toks", $"host", $"source")
    val unk = card.filter($"lang" === "unknown").collect()
    assert(unk.length == 1 && unk.head.getLong(2) == 1L)
  }

  test("a stratum literally named ALL stays distinguishable via is_total") {
    val tricky = Seq(("ALL", "s1", "h1", 4L), ("en", "s1", "h1", 6L))
      .toDF("lang", "source", "host", "toks")
    val rows = DataCard.summarize(tricky, "lang", $"toks", $"host", $"source")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    assert(rows.count(r => r._1 == "ALL" && r._2 == 0 && r._3 == 1L) == 1)
    assert(rows.count(r => r._1 == "ALL" && r._2 == 1 && r._3 == 2L) == 1)
  }

  test("single aggregation pass: one Expand, map-side partial aggregation") {
    val plan = DataCard.summarize(docs, "lang", $"toks", $"host", $"source")
      .queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), plan)
    assert(plan.contains("partial_count") || plan.contains("partial"), plan)
  }
}
