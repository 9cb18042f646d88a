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

  test("hostCap: under-cap hosts untouched, over-cap hosts keep best-`order` rows") {
    val pages = spark.range(0, 1000).toDF("id")
      .withColumn("host", when($"id" < 900, lit("giant.com"))
        .otherwise(concat(lit("h"), ($"id" % 7).cast("string"), lit(".org"))))
      .withColumn("score", ($"id" * 13) % 1000)
    val kept = Sampling.hostCap(pages, "host", "score", "id", cap = 20)
    val byHost = kept.groupBy("host").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byHost("giant.com") == 20L, s"giant capped at 20: $byHost")
    assert(byHost.filter(_._1 != "giant.com").values.forall(_ <= 20L))
    assert(kept.count() == 20L + 100L) // 100 tail pages pass through whole
    // the survivors of the capped host are exactly its top-20 scores
    val giantScores = kept.filter($"host" === "giant.com")
      .select("score").collect().map(_.getLong(0)).toSet
    val top20 = pages.filter($"host" === "giant.com").orderBy($"score".desc, $"id")
      .limit(20).select("score").collect().map(_.getLong(0)).toSet
    assert(giantScores == top20)
  }

  test("hostCap is invariant to input partition layout") {
    val pages = spark.range(0, 500).toDF("id")
      .withColumn("host", concat(lit("h"), ($"id" % 9).cast("string")))
      .withColumn("score", ($"id" * 7) % 100) // score ties → id tie-break matters
    def ids(df: org.apache.spark.sql.DataFrame) =
      Sampling.hostCap(df, "host", "score", "id", cap = 11)
        .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids(pages) == ids(pages.repartition(13)))
  }

  test("domainPriorKeep: bad domains drop wholesale, excellent pages are rescued") {
    val d = Seq(
      (1L, "good.com", 900L), (2L, "good.com", 100L), // avg 500 ≥ 400 → kept even at 100
      (3L, "bad.com", 100L), (4L, "bad.com", 100L),   // avg 333 < 400 → dropped
      (5L, "bad.com", 800L)                            // rescued: own 800 ≥ 700
    ).toDF("id", "host", "score")
    val kept = Sampling.domainPriorKeep(d, "host", "score",
        domainBar = 400.0, docBar = 700L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L, 5L), s"kept: $kept")
  }

  test("temperatureSample: head language shrinks toward c·sqrt(n), tail kept whole") {
    val docs = spark.range(0, 11000).toDF("id")
      .withColumn("lang", when($"id" < 10000, "en").otherwise(
        when($"id" < 10960, "fr").otherwise("mi")))
    val kept = Sampling.temperatureSample(docs, "lang", $"id", c = 8.0, salt = "t")
    val byLang = kept.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // en: rate 8/sqrt(10000)=0.08 → ~800 of 10000
    assert(math.abs(byLang("en") - 800L) < 120, s"en ~800: $byLang")
    // fr: 8/sqrt(960)≈0.258 → ~248 of 960
    assert(math.abs(byLang("fr") - 248L) < 60, s"fr ~248: $byLang")
    // mi: 8/sqrt(40)=1.26 → rate clamps to 1, all 40 kept
    assert(byLang("mi") == 40L, s"tail language kept whole: $byLang")
  }

  test("temperatureSample selection is layout- and run-stable") {
    val docs = spark.range(0, 3000).toDF("id")
      .withColumn("lang", ($"id" % 5).cast("string"))
    def ids(df: org.apache.spark.sql.DataFrame) =
      Sampling.temperatureSample(df, "lang", $"id", c = 4.0, salt = "x")
        .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids(docs) == ids(docs.repartition(17)))
  }

  test("tokenBudget equals the naive per-stratum prefix fill, straddler included") {
    // 3 strata × varied token sizes, including zero-token rows (the strict
    // fully-admit bound must stay exact for them)
    val docs = spark.range(0, 3000).toDF("id")
      .withColumn("g", ($"id" % 3).cast("string"))
      .withColumn("toks", ($"id" % 7).cast("long")) // 0..6 tokens
    val budgets = Map("0" -> 800L, "1" -> 10L) // "2" uses default
    val out = Sampling.tokenBudget(docs, "g", "toks", $"id",
      budgets, default = 1000000L, salt = "tb")
    // naive reference: sort each stratum by (hash, id), admit while prior < B
    val hashed = docs.withColumn("h", graft.functions.TextFunctions.hash60(
        concat($"id".cast("string"), lit("|tb"))))
      .select("g", "id", "toks", "h")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expect = hashed.groupBy(_._1).toSeq.flatMap { case (g, rows) =>
      val b = budgets.getOrElse(g, 1000000L)
      var prior = 0L
      rows.sortBy(r => (r._4, r._2)).toSeq.flatMap { r =>
        val admit = prior < b; prior += r._3
        if (admit) Some(r._2) else None
      }
    }.toSet
    val got = out.select("id").collect().map(_.getLong(0)).toSet
    assert(got == expect,
      s"missing=${(expect -- got).take(5)} extra=${(got -- expect).take(5)}")
    // stratum "2" (budget far above total) is fully admitted
    assert(out.filter($"g" === "2").count() == 1000)
    // realized stratum-0 token sum straddles: ≥ budget, < budget + max toks
    val sum0 = out.filter($"g" === "0").agg(sum("toks")).head.getLong(0)
    assert(sum0 >= 800L && sum0 < 806L, s"stratum-0 tokens $sum0")
  }

  test("tokenBudget is invariant to input partition layout") {
    val docs = spark.range(0, 5000).toDF("id")
      .withColumn("g", ($"id" % 2).cast("string"))
      .withColumn("toks", ($"id" % 11 + 1).cast("long"))
    def ids(df: org.apache.spark.sql.DataFrame) =
      Sampling.tokenBudget(df, "g", "toks", $"id", Map("0" -> 2000L),
        default = 3000L, salt = "tb2")
        .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids(docs) == ids(docs.repartition(23)))
  }

  test("hostDisjointSplit: a host's pages all land in one split, fractions near cuts") {
    val pages = spark.range(0, 20000).toDF("id")
      .withColumn("host", concat(lit("h"), ($"id" % 1000).cast("string")))
    val out = Sampling.hostDisjointSplit(pages, $"host",
      Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1), salt = "sp")
    // host determines split: no host straddles two splits
    assert(out.groupBy("host").agg(countDistinct("split").as("k"))
      .filter($"k" =!= 1).count() == 0)
    val byHost = out.select("host", "split").distinct()
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(byHost("train") - 800L) < 60, s"train hosts: $byHost")
    assert(math.abs(byHost("valid") - 100L) < 40, s"valid hosts: $byHost")
    assert(math.abs(byHost("test") - 100L) < 40, s"test hosts: $byHost")
  }

  test("hostDisjointSplit: layout-invariant, NULL hosts grouped, no shuffle") {
    val pages = spark.range(0, 3000).toDF("id")
      .withColumn("host", when($"id" % 11 === 0, lit(null: String))
        .otherwise(concat(lit("h"), ($"id" % 97).cast("string"))))
    def splits(df: org.apache.spark.sql.DataFrame) =
      Sampling.hostDisjointSplit(df, $"host",
          Seq("train" -> 0.9, "eval" -> 0.1), salt = "z")
        .select("id", "split").collect()
        .map(r => r.getLong(0) -> r.getString(1)).sortBy(_._1).toSeq
    assert(splits(pages) == splits(pages.repartition(17)))
    // NULL hosts are one group: all carry the same split
    val nullSplits = Sampling.hostDisjointSplit(pages.filter($"host".isNull),
      $"host", Seq("train" -> 0.9, "eval" -> 0.1), salt = "z")
      .select("split").distinct().count()
    assert(nullSplits == 1)
    // the operator itself is a narrow projection — no exchange in its plan
    val plan = Sampling.hostDisjointSplit(pages, $"host",
      Seq("train" -> 0.9, "eval" -> 0.1), salt = "z")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
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
