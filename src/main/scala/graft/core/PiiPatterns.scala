package graft.core

import java.util.regex.Pattern

/** Compiled regex patterns for the 12 PII categories.
  *
  * Behavioral contract: byte-identical match semantics with the reference
  * detector's module-level patterns (/root/reference/regex_pii_detector.py:19-174).
  * Pattern strings are code-point-exact copies of the published grammar;
  * CPython's `re` on `str` is Unicode-aware by default, so every pattern is
  * compiled with UNICODE_CHARACTER_CLASS (making \d/\w/\b/\s Unicode-aware,
  * matching CPython), and the two IGNORECASE patterns additionally get
  * CASE_INSENSITIVE | UNICODE_CASE.
  *
  * Compiled once per JVM (executor) via object initialization — the
  * compile-once-per-executor requirement falls out of classloading.
  */
object PiiPatterns {
  private val U = Pattern.UNICODE_CHARACTER_CLASS
  private val UI = U | Pattern.CASE_INSENSITIVE | Pattern.UNICODE_CASE

  /** CPython `re` treats the bidi control chars U+001C–U+001F as `\s`
    * (str.isspace() is true for them); Java's UNICODE_CHARACTER_CLASS `\s`
    * follows the Unicode White_Space property, which excludes them. Rewrite
    * every `\s` (outside a char class → `[\s\x1c-\x1f]`, inside → add the
    * range) so compiled semantics match CPython on those code points too. */
  private def pyWs(pattern: String): String = {
    val sb = new StringBuilder
    var inClass = false
    var i = 0
    while (i < pattern.length) {
      val c = pattern.charAt(i)
      if (c == '\\' && i + 1 < pattern.length) {
        val n = pattern.charAt(i + 1)
        if (n == 's') sb.append(if (inClass) "\\s\\x1c-\\x1f" else "[\\s\\x1c-\\x1f]")
        else sb.append(c).append(n)
        i += 2
      } else {
        if (c == '[') inClass = true
        else if (c == ']') inClass = false
        sb.append(c)
        i += 1
      }
    }
    sb.toString
  }

  private def compile(p: String, flags: Int): Pattern = Pattern.compile(pyWs(p), flags)

  // 1. 이름 — label-driven extraction only (regex_pii_detector.py:19-29)
  val nameLabels: String =
    "(?:성명|이름|담당자|신청자|승인자|수신|참조|발신|위임인|수임인|추천인|피추천인|" +
    "환자\\s*성명|참석자|퇴직자|수상자|청구인|피보험자|연구책임자|대표자|작성자|" +
    "계약자|수익자|위탁자|수탁자|보증인|연대보증인|진술인|입회인|면접관|보호자|" +
    "담임교사|멘토|피면접자|감사담당자|회원명|입찰담당|대리업무자|피청구인|" +
    "원고|피고|채권자|채무자|임차인|임대인|수하인|송하인|위탁자|수탁자)"
  val namePattern: Pattern =
    compile(nameLabels + "\\s*[:：]\\s*([가-힣]{2,5})", U)

  // 2. 주소 — road-name / lot-number address grammars (regex_pii_detector.py:32-49)
  val roadAddr: Pattern = compile(
    "(?:[가-힣]{1,10}(?:특별시|광역시|특별자치시|도|특별자치도)\\s+)?" +
    "[가-힣]{1,10}(?:시|군|구)\\s+" +
    "(?:[가-힣]{1,10}(?:구|군)\\s+)?" +
    "[가-힣\\d]{1,20}(?:로|길)\\s*\\d+" +
    "(?:\\s*[-,]\\s*\\d+)?" +
    "(?:\\s*\\([가-힣\\d\\s,]+\\))?" +
    "(?:\\s*\\d{1,4}동?\\s*\\d{1,4}호)?", U)
  val lotAddr: Pattern = compile(
    "(?:[가-힣]{1,10}(?:특별시|광역시|특별자치시|도|특별자치도)\\s+)?" +
    "[가-힣]{1,10}(?:시|군|구)\\s+" +
    "(?:[가-힣]{1,10}(?:구|군)\\s+)?" +
    "[가-힣]{1,10}(?:읍|면|동|리|가)\\s+" +
    "(?:\\d+(?:[-의]\\d+)?(?:번지)?)", U)

  // 3. 주민등록번호 (regex_pii_detector.py:52-57). Note the trailing \b after
  // masked tails: a fully-masked tail at end-of-line does NOT match (quirk kept).
  val rrnPattern: Pattern = compile(
    "\\b(\\d{6})\\s*[-–—]\\s*([1-8*]\\d{6}|\\d[*]{5,6}|\\*{6,7})\\b", U)
  val rrnContinuous: Pattern = compile("\\b(\\d{6}[1-8]\\d{6})\\b", U)

  // 4. 여권번호 (regex_pii_detector.py:60-61). PASSPORT_FOREIGN is defined but
  // never invoked by the reference detector — kept identically unused.
  val passportKr: Pattern = compile("\\b[MmSs]\\d{8}\\b", U)
  val passportForeign: Pattern = compile("\\b[A-Z]{1,2}\\d{6,9}\\b", U)

  // 5. 운전면허번호 (regex_pii_detector.py:64-66)
  val driverLicense: Pattern = compile(
    "\\b\\d{2}\\s*[-–]\\s*\\d{2}\\s*[-–]\\s*\\d{6}\\s*[-–]\\s*\\d{2}\\b", U)

  // 6. 이메일 (regex_pii_detector.py:69-81); fullwidth ＠ is intentional.
  val emailPattern: Pattern = compile(
    "[a-zA-Z0-9._%+\\-]+\\s*[@＠]\\s*[a-zA-Z0-9.\\-]+\\.\\s*[a-zA-Z]{2,}", U)
  val emailObfuscated: Pattern = compile(
    "[a-zA-Z0-9._%+\\-]+\\s*(?:\\[at\\]|\\(at\\)|골뱅이|\\{at\\})\\s*" +
    "[a-zA-Z0-9.\\-]+\\s*(?:\\[dot\\]|\\(dot\\)|\\.)\\s*[a-zA-Z]{2,}", UI)
  val emailMasked: Pattern = compile(
    "[a-zA-Z][*]{2,}@[a-zA-Z0-9.\\-]+\\.[a-zA-Z]{2,}", U)
  /** Role-prefix exclusion, applied to the lowercased match anchored at start
    * (CPython re.match semantics). Ref: regex_pii_detector.py:227. */
  val emailRolePrefix: Pattern = compile(
    "^(?:info|support|contact|admin|webmaster|help)@", U)
  val emailExcludeSubstrings: Seq[String] =
    Seq("example.com", "test.com", "noreply", "no-reply")

  // 7. IP 주소 (regex_pii_detector.py:84-97)
  val ipv4Pattern: Pattern = compile(
    "\\b(\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3})(?::(\\d{1,5}))?\\b", U)
  val ipv6Pattern: Pattern = compile(
    "\\b(?:[0-9a-fA-F]{1,4}:){2,7}[0-9a-fA-F]{1,4}\\b" +
    "|(?:[0-9a-fA-F]{1,4}:){1,6}::[0-9a-fA-F]{0,4}\\b", U)
  val excludeIps: Set[String] = Set(
    "127.0.0.1", "0.0.0.0", "255.255.255.255",
    "8.8.8.8", "8.8.4.4", "1.1.1.1", "1.0.0.1",
    "208.67.222.222", "208.67.220.220", "9.9.9.9")

  // 8. 전화번호 (regex_pii_detector.py:100-120)
  val phoneMobile: Pattern = compile(
    "\\b01[016789]\\s*[-.)]\\s*\\d{3,4}\\s*[-.)]\\s*\\d{4}\\b", U)
  val phoneLandline: Pattern = compile(
    "\\b0(?:2|3[1-3]|4[1-4]|5[1-5]|6[1-4])\\s*[-.)]\\s*\\d{3,4}\\s*[-.)]\\s*\\d{4}\\b", U)
  val phoneIntl: Pattern = compile(
    "\\+\\d{1,3}\\s*[-.)]\\s*\\d{1,4}\\s*[-.)]\\s*\\d{3,4}\\s*[-.)]\\s*\\d{3,4}", U)
  val phoneContinuous: Pattern = compile("\\b01[016789]\\d{7,8}\\b", U)
  val phoneMasked: Pattern = compile(
    "\\b01[016789]\\s*[-.)]\\s*\\d{0,2}[*]{2,4}\\s*[-.)]\\s*\\d{0,2}[*]{2,4}\\b", U)
  val serviceNumber: Pattern = compile(
    "\\b(?:15\\d{2}|16\\d{2}|18\\d{2})\\s*[-.]?\\s*\\d{4}\\b", U)
  val tollFree: Pattern = compile(
    "\\b080\\s*[-.]?\\s*\\d{3,4}\\s*[-.]?\\s*\\d{4}\\b", U)

  // 9. 계좌번호 (regex_pii_detector.py:123-134) — capture is the number group only.
  val accountLabels: Pattern = compile(
    "(?:계좌|가상계좌|입금계좌|출금계좌|환불계좌)\\s*(?:번호)?\\s*[:：]?\\s*" +
    "(\\d{2,6}[-\\s]?\\d{2,8}[-\\s]?\\d{2,8}(?:[-\\s]?\\d{1,4})?)", U)
  val accountWithBank: Pattern = compile(
    "(?:국민|신한|우리|하나|농협|기업|SC|씨티|대구|부산|경남|광주|전북|제주|수협|" +
    "새마을|신협|우체국|카카오|토스|케이)\\s*(?:은행)?\\s*" +
    "(\\d{2,6}[-\\s]?\\d{2,8}[-\\s]?\\d{2,8}(?:[-\\s]?\\d{1,4})?)", U)
  /** The bank-name literals of ACCOUNT_WITH_BANK (necessary-condition gate). */
  val bankNames: IndexedSeq[String] = Vector(
    "국민", "신한", "우리", "하나", "농협", "기업", "SC", "씨티", "대구", "부산",
    "경남", "광주", "전북", "제주", "수협", "새마을", "신협", "우체국", "카카오", "토스", "케이")

  // 10. 카드번호 (regex_pii_detector.py:137-145); crypto wallets intentionally
  // land in this category, mirroring TYPE_NORMALIZATION.
  val cardPattern: Pattern = compile(
    "\\b\\d{4}\\s*[-\\s]\\s*\\d{4}\\s*[-\\s]\\s*\\d{4}\\s*[-\\s]\\s*\\d{4}\\b", U)
  val cardMasked: Pattern = compile(
    "\\b\\d{4}\\s*[-\\s]\\s*\\d{2}[*]{2}\\s*[-\\s]\\s*[*]{4}\\s*[-\\s]\\s*\\d{4}\\b", U)
  val btcAddr: Pattern = compile("\\b[13][a-km-zA-HJ-NP-Z1-9]{25,34}\\b", U)
  val ethAddr: Pattern = compile("\\b0x[0-9a-fA-F]{40}\\b", U)

  // 11. 생년월일 (regex_pii_detector.py:148-152) — IGNORECASE in the reference.
  val dobPattern: Pattern = compile(
    "(?:생년월일|출생일?|생일|DOB|Date\\s*of\\s*Birth|born)\\s*[:：]?\\s*" +
    "(\\d{4}[-./년\\s]\\s*\\d{1,2}[-./월\\s]\\s*\\d{1,2}일?|\\d{6})", UI)

  // 12. 기타_고유식별정보 (regex_pii_detector.py:156-174)
  val studentId: Pattern = compile("(?:학번)\\s*[:：]?\\s*(\\d{4}[-]?\\d{4,6})", U)
  val vehiclePlate: Pattern = compile("\\b\\d{2,3}\\s*[가-힣]\\s*\\d{4}\\b", U)
  val militaryId: Pattern = compile("(?:군번)\\s*[:：]?\\s*(\\d{2}[-]?\\d{8,})", U)
  val employeeId: Pattern = compile("(?:사번)\\s*[:：]?\\s*(\\d{4}[-]?\\d{4,6})", U)
  val doorlock: Pattern = compile(
    "(?:비밀번호|현관|도어락)\\s*[:：]?\\s*([#*]?\\d{4,8}[#*]?)", U)
}
