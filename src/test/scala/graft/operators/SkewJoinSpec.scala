package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpecBase {
  import spark.implicits._

  // 90% of rows share one hot key — the regime the salt exists for
  private lazy val big = spark.range(0, 20000)
    .select($"id", when($"id" % 10 === 0, $"id" % 7).otherwise(0L).cast("string").as("k"))
    .cache()
  private lazy val dim = Seq(("0", "hot"), ("1", "a"), ("2", "b"), ("3", "c"),
    ("4", "d"), ("5", "e"), ("6", "f")).toDF("k", "label")

  test("salted join equals the plain join exactly") {
    val plain = big.join(dim, "k").select("id", "k", "label")
      .collect().map(_.toString).sorted.toSeq
    val salted = SkewJoin.saltedJoin(big, dim, "k", salt = 8).select("id", "k", "label")
      .collect().map(_.toString).sorted.toSeq
    assert(salted == plain)
  }

  test("salt spreads the hot key across the composite join key space") {
    val saltCounts = big
      .withColumn("_salt", pmod(hash(big.columns.map(col).toIndexedSeq: _*), lit(8)))
      .filter($"k" === "0")
      .groupBy("_salt").count().collect().map(_.getLong(1))
    assert(saltCounts.length == 8, "hot key must occupy every salt bucket")
    val (mn, mx) = (saltCounts.min, saltCounts.max)
    assert(mx < mn * 2, s"salt buckets should be balanced: min=$mn max=$mx")
  }

  test("deterministic under partition layout (content-hash salt, not rand)") {
    val a = SkewJoin.saltedJoin(big, dim, "k", salt = 8)
      .agg(sum(conv(substring(md5(concat_ws("|", $"id", $"k", $"label")), 1, 15), 16, 10)
        .cast("decimal(38,0)"))).head().getDecimal(0)
    val b = SkewJoin.saltedJoin(big.repartition(13), dim, "k", salt = 8)
      .agg(sum(conv(substring(md5(concat_ws("|", $"id", $"k", $"label")), 1, 15), 16, 10)
        .cast("decimal(38,0)"))).head().getDecimal(0)
    assert(a == b)
  }
}
