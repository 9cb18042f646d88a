package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val keys = spark.range(0, 10000).toDF("id").cache()

  test("hashSample rate lands near the requested fraction") {
    val n = Sampling.hashSample(keys, $"id", 0.3, "t").count()
    assert(math.abs(n - 3000) < 150, s"got $n for fraction 0.3 of 10000")
  }

  test("selection is stable under partition layout (unlike df.sample)") {
    val a = Sampling.hashSample(keys, $"id", 0.1, "t")
      .collect().map(_.getLong(0)).sorted.toSeq
    val b = Sampling.hashSample(keys.repartition(17), $"id", 0.1, "t")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(a == b)
  }

  test("different salts draw (near-)independent samples") {
    val a = Sampling.hashSample(keys, $"id", 0.2, "s1")
      .collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(keys, $"id", 0.2, "s2")
      .collect().map(_.getLong(0)).toSet
    val overlap = a.intersect(b).size.toDouble
    // independent 20% draws overlap on ~4% of keys; identical draws on 20%
    assert(overlap / 10000 < 0.08, s"overlap ${overlap / 10000}")
  }

  test("stratifiedSample applies per-stratum rates with default for the rest") {
    val strat = keys.withColumn("g", when($"id" % 10 === 0, "rare").otherwise("common"))
    val kept = Sampling.stratifiedSample(strat, $"g", $"id",
      Map("common" -> 0.1, "rare" -> 1.0), default = 0.0, salt = "t")
    val byG = kept.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byG("rare") == 1000L, s"rare stratum must be kept whole: $byG")
    assert(math.abs(byG("common") - 900L) < 120, s"common ~10% of 9000: $byG")
  }

  test("decontaminate flags the doc whose passage seeded the benchmark") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "one two three four five six seven eight nine ten eleven"),
      (3L, "totally unrelated words that never overlap with anything here")
    ).toDF("doc_id", "text")
    val bench = Seq("alpha beta gamma delta epsilon zeta eta theta").toDF("text")
    val hits = Dedup.decontaminate(docs, bench, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits == Map(1L -> 6L), s"got $hits") // 8 tokens → 6 shingles, all shared
  }
}
