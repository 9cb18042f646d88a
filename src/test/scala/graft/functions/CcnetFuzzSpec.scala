package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Differential fuzz for CcnetNormalize: the production single-pass
  * implementation vs an independent regex-pipeline mirror built from
  * `\p{javaLetter}`/`\p{javaDigit}`/`\p{javaWhitespace}` (the exact same
  * Character.is* predicates, composed the slow declarative way). Seeded —
  * deterministic across runs. */
class CcnetFuzzSpec extends AnyFunSuite {

  /** Step-by-step mirror: lower → NFD → strip marks → fold digits → drop
    * non-letter/digit/ws → collapse ws → trim. */
  private def reference(s: String): String = {
    val lower = s.toLowerCase(java.util.Locale.ROOT)
    val nfd = java.text.Normalizer.normalize(lower, java.text.Normalizer.Form.NFD)
    nfd.replaceAll("\\p{Mn}", "")
      .replaceAll("\\p{javaDigit}", "0")
      .replaceAll("[^\\p{javaLetter}\\p{javaDigit}\\p{javaWhitespace}0]", "")
      .replaceAll("\\p{javaWhitespace}+", " ")
      .strip()
  }

  private val alphabet: Array[String] = Array(
    "a", "B", "z", "7", "0", "٣", "３", " ", "\t", "\n", "\r", "\f", "\u000b", "\u001c", "",
    ".", ",", "!", "-", "—", "'", "\"", "(", "…",
    "é", "À", "ü", "ñ", "Š", "ß", "œ",
    "한", "글", "中", "文", "日", "カ", "ナ",
    "é", "à", // decomposed accents in the INPUT
    "€", "©", "µ", "°", "½")

  test("10k seeded random strings agree with the independent mirror") {
    val rnd = new scala.util.Random(20260817L)
    for (i <- 0 until 10000) {
      val n = rnd.nextInt(40)
      val s = Seq.fill(n)(alphabet(rnd.nextInt(alphabet.length))).mkString
      val got = CcnetNormalize.normalize(s)
      val want = reference(s)
      assert(got == want,
        s"case $i: input=${s.map(c => f"\\u${c.toInt}%04x").mkString} got='$got' want='$want'")
    }
  }

  test("hostile edge cases agree") {
    for (s <- Seq("", " ", "\t\n", "…", "½¼¾", "ＡＢＣ１２３", "ﬁﬂ", "İstanbul",
                  "é́clair", "mixed한글and中文", "­ soft hyphen"))
      assert(CcnetNormalize.normalize(s) == reference(s), s"input '$s'")
  }
}
