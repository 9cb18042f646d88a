package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Pins the one-pass [[GramHash60s]] expression to the declarative chain it
  * replaced in ExactSubstring.occurrences —
  * `transform(ngrams(text, k, distinct = false), hash60)` — value- and
  * order-identical (multiset: duplicate grams kept, position = index) on
  * every tokenizer edge the chain had. The substring-span dedup paths
  * (q53/q74 corpus-wide, q91 incremental) ride this equality. */
class GramHash60Spec extends SparkSpecBase {
  import spark.implicits._

  /** The original declarative formulation, kept here as the oracle. */
  private def declarative(text: org.apache.spark.sql.Column, k: Int) =
    transform(TextFunctions.ngrams(text, k, distinct = false),
      g => TextFunctions.hash60(g))

  private val edgeTexts = Seq(
    "the quick brown fox jumps over the lazy dog",
    "a a a a a a",                       // repeated grams KEPT (multiset)
    "  leading and trailing spaces  ",
    "\ttab nbsp\nnewline mixed　ideographic ws",
    "", " ", "one", "one two",           // under gram width
    "one two three",                     // exactly one 3-gram
    "UPPER Case MiXeD İstanbul STRASSE ß", // locale-sensitive lowering
    "한국어 텍스트 샘플 데이터 그리고 더 많은 토큰",
    "word  double   spaces word",
    "a b c a b c a b c d"                // overlapping repeats, all kept
  )

  test("gram_hash60s equals the declarative transform/ngrams/hash60 chain") {
    for (k <- Seq(1, 2, 3, 8)) {
      val df = edgeTexts.toDF("t")
        .select(GramHash60Functions.gram_hash60s($"t", k).as("fast"),
          declarative($"t", k).as("slow"))
      df.collect().zip(edgeTexts).foreach { case (r, t) =>
        assert(r.getSeq[Long](0) == r.getSeq[Long](1),
          s"k=$k text='$t': ${r.getSeq[Long](0)} != ${r.getSeq[Long](1)}")
      }
    }
  }

  test("gram_hash60s: null text yields EMPTY array, like the declarative chain") {
    val df = Seq(Some("a b c d"), None).toDF("t")
      .select(GramHash60Functions.gram_hash60s($"t", 3).as("fast"),
        declarative($"t", 3).as("slow"))
    val rows = df.collect()
    assert(!rows(1).isNullAt(0))
    assert(rows(1).getSeq[Long](0).isEmpty && rows(1).getSeq[Long](1).isEmpty)
  }

  test("gram_hash60s: randomized differential vs the declarative chain") {
    val rnd = new scala.util.Random(43)
    val vocab = Vector("alpha", "beta", "GAMMA", "δelta", "데이터", "x1", "...", "a")
    val texts = (1 to 200).map { _ =>
      val n = rnd.nextInt(30)
      (1 to n).map(_ => vocab(rnd.nextInt(vocab.size)))
        .mkString(if (rnd.nextBoolean()) " " else "  ")
    }
    val df = texts.toDF("t")
      .select(GramHash60Functions.gram_hash60s($"t", 3).as("fast"),
        declarative($"t", 3).as("slow"))
    df.collect().foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    }
  }

  test("gram_hash60s value matches hash60 of the gram string itself") {
    // ties the byte-level digest arithmetic to the portable definition
    // (first 15 hex of md5) independently of the ngrams chain
    val df = Seq("alpha beta gamma").toDF("t")
      .select(element_at(GramHash60Functions.gram_hash60s($"t", 3), 1).as("g"),
        TextFunctions.hash60(lit("alpha beta gamma")).as("h"))
    val r = df.collect()(0)
    assert(r.getLong(0) == r.getLong(1))
  }
}
