package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** FixMojibake: single- and double-encoded UTF-8-as-cp1252 damage repairs to
  * the original bytes; correct text (ASCII, accented Latin, CJK, emoji) is a
  * strict fixpoint. */
class MojibakeSpec extends SparkSpecBase {
  import spark.implicits._

  /** The upstream mistake being repaired: UTF-8 bytes decoded as cp1252 —
    * in the "sloppy" flavor (ftfy's sloppy-windows-1252) where the five
    * undefined bytes fall back to their latin-1 control chars. Java's nio
    * decoder instead REPLACES those bytes with U+FFFD, which destroys the
    * byte value — that flavor of damage is unrecoverable by any tool. */
  private def moji(s: String): String = {
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val sb = new StringBuilder(bytes.length)
    for (b <- bytes) {
      val x = b & 0xFF
      if (x == 0x81 || x == 0x8D || x == 0x8F || x == 0x90 || x == 0x9D)
        sb.append(x.toChar)
      else sb.append(new String(Array(b), "windows-1252").charAt(0))
    }
    sb.toString
  }

  private def fix(s: String): String =
    Seq(s).toDF("t").select(FixMojibake.fix_mojibake(col("t")).as("f"))
      .collect().head.getString(0)

  private val samples = Seq(
    "café naïve déjà vu",
    "an em—dash and ‘smart’ “quotes”…",
    "© 2026 « guillemets » °C ± µm",
    "한국어 中文 日本語 mixed with ASCII",
    "emoji 😀 survives",
    "€ 9,99 – Straße")

  test("single-encoded mojibake repairs to the original") {
    for (s <- samples) assert(fix(moji(s)) == s, s"sample: $s -> ${moji(s)}")
  }

  test("double-encoded mojibake repairs in the fixpoint loop") {
    for (s <- samples) assert(fix(moji(moji(s))) == s, s"sample: $s")
  }

  test("correct text is a fixpoint") {
    for (s <- samples :+ "plain ascii only" :+ "ÅÆ blåbær grød"
         :+ "" :+ "lone tilde-A Ã stays") {
      assert(fix(s) == s, s"sample: $s")
    }
  }

  test("repair applies per-run inside mixed content and leaves neighbours intact") {
    val damaged = "ok " + moji("été") + " fine ça " + moji("—") + " end"
    assert(fix(damaged) == "ok été fine ça — end")
  }

  test("the whole documents corpus is a fixpoint (ASCII)") {
    val changed = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(FixMojibake.fix_mojibake(col("text")) =!= col("text")).count()
    assert(changed == 0)
  }
}
