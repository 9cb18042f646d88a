package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Pins the one-pass [[ShingleHashes]] expression to the declarative chain
  * it replaced — `transform(array_distinct(grams), xxhash64)` — value- and
  * order-identical on every tokenizer edge the chain had: leading/trailing
  * whitespace classes, empty/short inputs, repeated shingles, unicode case,
  * nulls. The near-dup Jaccard verify (full-corpus and incremental) rides
  * this equality. */
class ShingleHashesSpec extends SparkSpecBase {
  import spark.implicits._

  /** The original declarative formulation, kept here as the oracle. */
  private def declarative(text: org.apache.spark.sql.Column, k: Int) =
    transform(TextFunctions.shingles(text, k), s => xxhash64(s))

  private val edgeTexts = Seq(
    "the quick brown fox jumps over the lazy dog",
    "a a a a a a",                       // repeated shingles collapse once
    "  leading and trailing spaces  ",
    "\ttab nbsp\nnewline mixed　ideographic ws",
    "", " ", "one", "one two",           // under shingle width
    "one two three",                     // exactly one shingle
    "UPPER Case MiXeD İstanbul STRASSE ß", // locale-sensitive lowering
    "한국어 텍스트 샘플 데이터 그리고 더 많은 토큰",
    "word  double   spaces word",
    "a b c a b c a b c d"                // overlapping repeats
  )

  test("shingle_hashes equals the declarative transform/array_distinct/xxhash64 chain") {
    for (k <- Seq(1, 2, 3, 5)) {
      val df = edgeTexts.toDF("t")
        .select(TextFunctions.shingleHashes($"t", k).as("fast"),
          declarative($"t", k).as("slow"))
      df.collect().zip(edgeTexts).foreach { case (r, t) =>
        assert(r.getSeq[Long](0) == r.getSeq[Long](1),
          s"k=$k text='$t': ${r.getSeq[Long](0)} != ${r.getSeq[Long](1)}")
      }
    }
  }

  test("shingle_hashes: null text yields EMPTY array, like the declarative chain") {
    val df = Seq(Some("a b c d"), None).toDF("t")
      .select(TextFunctions.shingleHashes($"t", 3).as("fast"),
        declarative($"t", 3).as("slow"))
    val rows = df.collect()
    assert(!rows(0).isNullAt(0) && !rows(0).isNullAt(1))
    assert(!rows(1).isNullAt(0) && !rows(1).isNullAt(1))
    assert(rows(1).getSeq[Long](0).isEmpty && rows(1).getSeq[Long](1).isEmpty)
  }

  test("shingle_hashes: randomized differential vs the declarative chain") {
    val rnd = new scala.util.Random(42)
    val vocab = Vector("alpha", "beta", "GAMMA", "δelta", "데이터", "x1", "...", "a")
    val texts = (1 to 200).map { _ =>
      val n = rnd.nextInt(30)
      (1 to n).map(_ => vocab(rnd.nextInt(vocab.size)))
        .mkString(if (rnd.nextBoolean()) " " else "  ")
    }
    val df = texts.toDF("t")
      .select(TextFunctions.shingleHashes($"t", 3).as("fast"),
        declarative($"t", 3).as("slow"))
    df.collect().foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    }
  }
}
