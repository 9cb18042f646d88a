package graft.core

/** Hand-rolled equivalent of NAME_PATTERN.finditer — the 45-alternative label
  * regex is the detector's single most expensive scan (java.util.regex tries
  * each alternative at every position). This scanner is colon-driven:
  * a match requires `label \s* [:：] \s* ([가-힣]{2,5})`, so only colon
  * positions can anchor one.
  *
  * Exact-equivalence argument (verified by a differential fuzzer +
  * the 500-doc goldens):
  * - a label is all-Hangul (or 환자\s*성명), so it must end exactly at the
  *   start of the maximal whitespace run preceding the colon;
  * - candidate starts for a colon are label-suffix matches at that point
  *   (several can coexist: 담당자/감사담당자, 보증인/연대보증인 are
  *   suffix pairs) — finditer picks the leftmost start not before the
  *   resume point, which is min(start) among candidates ≥ resume;
  * - matches of later colons always start after earlier colons, so colon
  *   order equals match-start order;
  * - the captured name is the greedy run of up to 5 Hangul chars after the
  *   colon's trailing whitespace; <2 chars ⇒ no match at this colon;
  * - finditer resumes at the end of the captured name (nothing in the
  *   pattern follows the group).
  */
object NameScan {
  /** All plain label alternatives (the composite 환자\s*성명 is handled
    * separately); the scan checks every label as a suffix at the
    * whitespace-run start, so suffix pairs (담당자/감사담당자,
    * 보증인/연대보증인) are all considered. */
  private val labels: Array[String] = Array(
    "성명", "이름", "담당자", "신청자", "승인자", "수신", "참조", "발신", "위임인", "수임인",
    "추천인", "피추천인", "참석자", "퇴직자",
    "수상자", "청구인", "피보험자", "연구책임자", "대표자", "작성자",
    "계약자", "수익자", "위탁자", "수탁자", "보증인", "연대보증인", "진술인", "입회인",
    "면접관", "보호자", "담임교사", "멘토", "피면접자", "감사담당자", "회원명", "입찰담당",
    "대리업무자", "피청구인", "원고", "피고", "채권자", "채무자", "임차인", "임대인",
    "수하인", "송하인").distinct

  /** CPython `re.\s`: Unicode White_Space property PLUS the bidi control
    * chars U+001C-U+001F that CPython counts as whitespace (Java's
    * UNICODE_CHARACTER_CLASS `\s` excludes them; the compiled patterns add
    * them back via PiiPatterns.pyWs — this scanner must agree). */
  @inline private def isWs(c: Char): Boolean =
    (c >= '\u0009' && c <= '\u000D') || c == ' ' || c == '\u0085' ||
    (c >= '\u001C' && c <= '\u001F') ||
    c == '\u00A0' || c == '\u1680' || (c >= '\u2000' && c <= '\u200A') ||
    c == '\u2028' || c == '\u2029' || c == '\u202F' || c == '\u205F' || c == '\u3000'

  @inline private def isHangul(c: Char): Boolean = c >= '가' && c <= '힣'

  /** Emit (matchStart, nameStart, nameEnd) for each finditer match. */
  def scan(text: String)(emit: (Int, Int, Int) => Unit): Unit = {
    val n = text.length
    var resume = 0
    var c = 0
    while (c < n) {
      val ch = text.charAt(c)
      if ((ch == ':' || ch == '：') && c >= resume) {
        // maximal whitespace run ending at the colon
        var w = c
        while (w > 0 && isWs(text.charAt(w - 1))) w -= 1
        if (w > 0) {
          // best (leftmost) label candidate ending at w with start >= resume
          var best = Int.MaxValue
          var li = 0
          while (li < labels.length) {
            val l = labels(li)
            val s = w - l.length
            if (s >= resume && s >= 0 && text.regionMatches(s, l, 0, l.length) && s < best)
              best = s
            li += 1
          }
          // composite 환자\s*성명: "성명" at w, optional ws, then "환자"
          if (w >= 2 && text.regionMatches(w - 2, "성명", 0, 2)) {
            var j = w - 2
            while (j > 0 && isWs(text.charAt(j - 1))) j -= 1
            val s = j - 2
            if (s >= resume && s >= 0 && text.regionMatches(s, "환자", 0, 2) && s < best)
              best = s
          }
          if (best != Int.MaxValue) {
            // name: skip ws after colon, take 2..5 Hangul greedily
            var n0 = c + 1
            while (n0 < n && isWs(text.charAt(n0))) n0 += 1
            var n1 = n0
            while (n1 < n && n1 - n0 < 5 && isHangul(text.charAt(n1))) n1 += 1
            if (n1 - n0 >= 2) {
              emit(best, n0, n1)
              resume = n1
            }
          }
        }
      }
      c += 1
    }
  }
}
