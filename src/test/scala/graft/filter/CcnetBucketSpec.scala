package graft.filter

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** CCNet head/middle/tail bucketing (Wenzek et al. 2020 §4.4): per-language
  * tercile cutoffs on a score column, lower = better. */
class CcnetBucketSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val docs =
    spark.read.parquet(s"$sfDir/documents.parquet")

  private lazy val scored = docs.select(col("doc_id"), col("lang"),
    round(col("n_chars").cast("double") /
      (lit(1.0) + size(split(trim(col("text")), "\\s+"))), 4).as("score"))

  test("buckets are score-monotone per language: head <= middle <= tail") {
    val b = CcnetBucket.bucketByScore(scored, "lang", "score")
    val ranges = b.groupBy("lang", "bucket")
      .agg(min("score").as("lo"), max("score").as("hi"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getDouble(2), r.getDouble(3)))
      .toMap
    for (lang <- ranges.keys.map(_._1).toSet[String]) {
      for (Seq(a, bk) <- Seq("head", "middle", "tail").sliding(2)) {
        (ranges.get(lang -> a), ranges.get(lang -> bk)) match {
          case (Some((_, hiA)), Some((loB, _))) =>
            assert(hiA <= loB, s"$lang: max($a)=$hiA > min($bk)=$loB")
          case _ => // a tercile can be empty under heavy score ties
        }
      }
    }
  }

  test("each language splits into roughly equal terciles") {
    val b = CcnetBucket.bucketByScore(scored, "lang", "score")
    val counts = b.groupBy("lang").pivot("bucket").count().collect()
    counts.foreach { r =>
      val n = (1 until r.length).map(i => if (r.isNullAt(i)) 0L else r.getLong(i)).sum
      (1 until r.length).foreach { i =>
        val c = if (r.isNullAt(i)) 0L else r.getLong(i)
        // interpolated cutoffs on mostly-distinct scores: each tercile
        // within ±20% of n/3 even on the small fixture
        assert(math.abs(c - n / 3.0) <= n * 0.2 + 2,
          s"${r.getString(0)}: tercile $c of $n")
      }
    }
  }

  test("cutoffs are per-language, not global") {
    // lang B's scores all sit above lang A's; a global cutoff would dump
    // every B row into tail, but CCNet buckets WITHIN each language.
    val d = ((1 to 90).map(i => (i.toLong, "aa", i.toDouble)) ++
             (1 to 90).map(i => (i + 1000L, "bb", 1000.0 + i))).toDF("doc_id", "lang", "score")
    val b = CcnetBucket.bucketByScore(d, "lang", "score")
    val heads = b.filter(col("bucket") === "head").groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(heads.getOrElse("aa", 0L) >= 25 && heads.getOrElse("bb", 0L) >= 25, heads.toString)
  }

  test("layout-invariant: repartition does not change any bucket") {
    val a = CcnetBucket.bucketByScore(scored, "lang", "score")
      .select("doc_id", "bucket")
    val b = CcnetBucket.bucketByScore(scored.repartition(13), "lang", "score")
      .select("doc_id", "bucket")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("documents side never shuffles: cutoffs broadcast back") {
    val b = CcnetBucket.bucketByScore(scored, "lang", "score")
    val p = b.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast join:\n$p")
    // exactly one exchange — the two-row-per-lang cutoff aggregate; the
    // corpus-side scan flows into the join with no Exchange above it
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 1, s"corpus must not shuffle:\n$p")
  }

  test("NULL-language rows are bucketed to tail, never dropped") {
    // regression: an inner join against the per-language cutoffs silently
    // dropped pre-langid pages; a labeling operator must label all rows
    val d = Seq((1L, "aa", 1.0), (2L, "aa", 2.0), (3L, "aa", 3.0),
                (4L, null.asInstanceOf[String], 1.5)).toDF("doc_id", "lang", "score")
    val b = CcnetBucket.bucketByScore(d, "lang", "score")
    assert(b.count() == 4)
    val nullRow = b.filter(col("lang").isNull).collect()
    assert(nullRow.length == 1 && nullRow.head.getAs[String]("bucket") == "tail")
  }

  test("bucketing real KN-perplexity scores") {
    val texts = docs.select("text").as[String]
    val lm = BigramLM.fit(texts, maxVocab = 4096, maxBigrams = 1 << 14)
    val lmB = spark.sparkContext.broadcast(lm)
    val ppl = udf((t: String) => lmB.value.perplexity(t))
    val b = CcnetBucket.bucketByScore(
      docs.select(col("doc_id"), col("lang"), ppl(col("text")).as("score")),
      "lang", "score")
    val byBucket = b.groupBy("bucket").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(Set("head", "middle", "tail").subsetOf(byBucket.keySet), byBucket.toString)
    // head really is the low-perplexity (fluent) slice
    val headMax = b.filter(col("bucket") === "head").agg(max("score")).first().getDouble(0)
    val tailMin = b.filter(col("bucket") === "tail").agg(min("score")).first().getDouble(0)
    assert(headMax <= tailMin)
  }
}
