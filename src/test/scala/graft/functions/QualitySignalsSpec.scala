package graft.functions

import graft.SparkSpecBase
import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.functions._

/** Value parity of the fused single-pass QualitySignals expression with the
  * built-in formulations it replaces (split/regexp_replace/rlike chains) —
  * on the real corpus AND on the whitespace/Unicode edge cases where the
  * built-ins' exact semantics bite (Spark trim strips only U+0020; Java \s
  * is NOT Unicode whitespace; split keeps leading/trailing empty tokens). */
class QualitySignalsSpec extends SparkSpecBase {
  import spark.implicits._

  private def builtins(df: org.apache.spark.sql.DataFrame) = df.select(
    col("id"),
    TF.tokenCount(col("text")).as("n_words"),
    TF.meanWordLen(col("text")).as("mean_word_len"),
    TF.symbolToWordRatio(col("text")).as("symbol_ratio"),
    TF.alphaWordRatio(col("text")).as("alpha_word_ratio"))

  private def fused(df: org.apache.spark.sql.DataFrame) = df.select(
    col("id"),
    QualityFunctions.quality_signals(col("text")).as("qs"))
    .select(col("id"),
      col("qs.n_words").as("n_words"),
      (col("qs.n_chars").cast("double") / col("qs.n_words")).as("mean_word_len"),
      (col("qs.n_symbols").cast("double") / col("qs.n_words")).as("symbol_ratio"),
      (col("qs.n_alpha_words").cast("double") / col("qs.n_words")).as("alpha_word_ratio"))

  private def assertParity(df: org.apache.spark.sql.DataFrame): Unit = {
    val want = builtins(df).collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    val got = fused(df).collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(got.keySet == want.keySet)
    for ((id, w) <- want) {
      val g = got(id)
      val same = w.zip(g).forall {
        case (a: Double, b: Double) => (a.isNaN && b.isNaN) || a == b
        case (a, b) => a == b
      }
      assert(same, s"id=$id fused=$g builtins=$w")
    }
  }

  test("parity on the documents corpus") {
    assertParity(spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id".as("id"), $"text"))
  }

  test("parity on whitespace / Unicode edge cases") {
    val edges = Seq(
      "",
      " ",
      "   ",
      "\t",
      "\tword",
      "word\n",
      "\t two \n three \r",
      "vertical\ftab\r",
      "one",
      "İstanbul DOES lower oddly",
      "KelvinK sign",
      "nbsp is not java ws",
      "### ## … … x",
      "…",
      "한국어 텍스트 no ascii",
      "MiXeD CaSe AlPhA",
      "ab controls  inside",
      "ends with tab\t",
      " \t mixed leading",
      "#hash…ellipsis#mix",
      "emoji 😀 pair and 😀😀 run", // supplementary plane: 1 code point, 2 UTF-16 units
      "😀")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    assertParity(edges.toDF("id", "text"))
  }

  test("differential fuzz vs built-ins over a hostile alphabet") {
    val rnd = new scala.util.Random(424242L)
    // whitespace variants, controls, symbols, ascii, hangul, combining
    // marks, a supplementary-plane code point
    val alphabet: Array[String] = Array(
      " ", "\t", "\n", "\r", "\f", "\u000B", "\u00A0", "\u2028", "\u001C",
      "#", "…", "a", "Z", "x", "7", ".", "İ", "ß", "한", "글", "\u0301",
      new String(Character.toChars(0x1F600)))
    val rows = (0 until 300).map { i =>
      val n = rnd.nextInt(24)
      (i.toLong, (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    }
    assertParity(rows.toDF("id", "text"))
  }

  /** quality_signals_full vs the three standalone formulations it fuses:
    * the four counts (quality_signals), the repetition ratio, and the
    * line-shape fractions rebuilt from its counts vs TF.lineShapeSignals'
    * declarative rlike chain. Exact equality, NaN-aware. */
  private def assertFullParity(df: org.apache.spark.sql.DataFrame): Unit = {
    val sep = df.select(col("id"),
        QualityFunctions.quality_signals(col("text")).as("qs"),
        QualityFunctions.repetition_ratio(col("text"), 2).as("rep2"),
        TF.lineShapeSignals(col("text")).as("ls"))
      .select(col("id"), col("qs.n_words"), col("qs.n_chars"),
        col("qs.n_symbols"), col("qs.n_alpha_words"), col("rep2"),
        col("ls.n_lines"), col("ls.frac_bullet"), col("ls.frac_ellipsis"))
    val ful = df.select(col("id"),
        QualityFunctions.quality_signals_full(col("text")).as("q"))
      .select(col("id"), col("q.n_words"), col("q.n_chars"),
        col("q.n_symbols"), col("q.n_alpha_words"), col("q.rep2"),
        col("q.n_lines"),
        (col("q.n_bullet").cast("double") / col("q.n_lines")).as("frac_bullet"),
        (col("q.n_ellipsis").cast("double") / col("q.n_lines")).as("frac_ellipsis"))
    val want = sep.collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    val got = ful.collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(got.keySet == want.keySet)
    for ((id, w) <- want) {
      val g = got(id)
      val same = w.zip(g).forall {
        case (a: Double, b: Double) => (a.isNaN && b.isNaN) || a == b
        case (a, b) => a == b
      }
      assert(same, s"id=$id full=$g separate=$w")
    }
  }

  test("fused-full parity: corpus, line-shape/repetition edges, hostile fuzz") {
    assertFullParity(spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id".as("id"), $"text"))
    val edges = Seq(
      "", " ", "\t", "line one\nline two\n", "• bullet\n* star\n- dash\nplain",
      "ends...\nends…\nends with dots ... \n…",
      "  • spaced bullet  \r\n-windows line\r\n",
      "dup dup dup dup tokens", "a b a b a b", "\n\n\n", "one\rtwo",
      "CRLF only\r\n", "- \n* x…\n...\n mixed … ends...",
      "*", "-", "•", "...", "..", ". . .", "…x", "x…y")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    assertFullParity(edges.toDF("id", "text"))
    val rnd = new scala.util.Random(777L)
    val alphabet: Array[String] = Array(
      " ", "\t", "\n", "\r", "\r\n", "\f", "•", "*", "-", "…", "...", ".",
      "#", "a", "Z", "7", "한", "İ", "word", "dup",
      new String(Character.toChars(0x1F600)))
    val rows = (0 until 400).map { i =>
      val n = rnd.nextInt(20)
      (1000L + i, (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    }
    assertFullParity(rows.toDF("id", "text"))
  }
}
