package graft.core

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

/** CPython-compatible primitives the detection/eval semantics depend on.
  *
  * The reference's behavior is specified by CPython 3.11 (`str.strip`,
  * `round`, `int`); these helpers reproduce those semantics on the JVM so
  * that detection output and metric JSON are byte-identical.
  */
object PyCompat {

  /** True iff CPython `str.isspace()` is true for this char: Unicode
    * White_Space property plus the bidi-WS/B/S control chars CPython adds
    * (\x1c-\x1f, \x85). Java's Character.isWhitespace misses NBSP ( ),
    * which Python strips.
    */
  def isPySpace(c: Char): Boolean = {
    if (c == ' ' || c == '\u00A0' || c == '\u0085') true
    else if (c >= '\u001C' && c <= '\u001F') true
    else if (Character.isWhitespace(c)) true
    else {
      val t = Character.getType(c)
      t == Character.SPACE_SEPARATOR || t == Character.LINE_SEPARATOR ||
      t == Character.PARAGRAPH_SEPARATOR
    }
  }

  /** CPython `str.strip()` (no args): strips leading/trailing whitespace per
    * `isPySpace`. Ref call sites: regex_pii_detector.py:187,222,231-233.
    */
  def pyStrip(s: String): String = {
    var i = 0
    var j = s.length
    while (i < j && isPySpace(s.charAt(i))) i += 1
    while (j > i && isPySpace(s.charAt(j - 1))) j -= 1
    if (i == 0 && j == s.length) s else s.substring(i, j)
  }

  /** CPython `round(x, n)` for floats: round-half-even on the exact binary
    * value of the double (hence `new BigDecimal(x)`, not `valueOf`).
    * Ref: run_pii_evaluation.py:478-480; regex_pii_detector.py:374,388-396.
    */
  def pyRound(x: Double, n: Int): Double =
    if (x.isNaN || x.isInfinite) x
    else new JBigDecimal(x).setScale(n, RoundingMode.HALF_EVEN).doubleValue()

  /** CPython `int(s)` for the decimal strings produced by `\d{1,3}` matches:
    * accepts any Unicode decimal digits. Returns None if unparseable (the
    * reference would raise; we degrade gracefully for web-scale robustness).
    * Ref: regex_pii_detector.py:242-243.
    */
  def pyIntOpt(s: String): Option[Int] = {
    var acc = 0L
    var i = 0
    if (s.isEmpty) return None
    while (i < s.length) {
      val d = Character.digit(s.charAt(i), 10)
      if (d < 0) return None
      acc = acc * 10 + d
      if (acc > Int.MaxValue) return None
      i += 1
    }
    Some(acc.toInt)
  }
}
