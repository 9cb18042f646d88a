package graft.core

/** The 12 canonical PII detection categories, in the fixed canonical order.
  *
  * Order is semantic everywhere: detection-result structs expose one field per
  * category in this order, and scrub tags embed the category name.
  *
  * Ref: /root/reference/run_pii_evaluation.py:62-65 (PII_CATEGORIES),
  * duplicated at regex_pii_detector.py:355-357.
  */
object PiiCategories {
  val Name = 0; val Addr = 1; val Rrn = 2; val Passport = 3; val License = 4
  val Email = 5; val Ip = 6; val Phone = 7; val Account = 8; val Card = 9
  val Dob = 10; val Other = 11

  val names: IndexedSeq[String] = Vector(
    "이름", "주소", "주민등록번호", "여권번호", "운전면허번호", "이메일",
    "IP주소", "전화번호", "계좌번호", "카드번호", "생년월일", "기타_고유식별정보")

  val size: Int = names.length

  val index: Map[String, Int] = names.zipWithIndex.toMap

  /** Label-variant → canonical-category folding applied to expected labels by
    * the evaluation harness; unknown types default to 기타_고유식별정보.
    * Ref: run_pii_evaluation.py:42-60 (TYPE_NORMALIZATION) + :439.
    */
  val typeNormalization: Map[String, String] = Map(
    "이름" -> "이름", "이름(부분마스킹)" -> "이름",
    "주소" -> "주소", "주소(부분)" -> "주소",
    "주민등록번호" -> "주민등록번호", "주민등록번호(마스킹)" -> "주민등록번호",
    "주민등록번호(앞자리)" -> "주민등록번호", "주민등록번호(OCR오류)" -> "주민등록번호",
    "외국인등록번호" -> "주민등록번호",
    "여권번호" -> "여권번호",
    "운전면허번호" -> "운전면허번호",
    "이메일" -> "이메일", "이메일(난독화)" -> "이메일", "이메일(마스킹)" -> "이메일",
    "IP주소" -> "IP주소", "IP주소(IPv6)" -> "IP주소", "IP주소(사설)" -> "IP주소",
    "IP주소(공인)" -> "IP주소", "IP주소:포트" -> "IP주소", "IP주소(CIDR)" -> "IP주소",
    "전화번호" -> "전화번호", "전화번호(부분마스킹)" -> "전화번호",
    "계좌번호" -> "계좌번호", "계좌번호(부분마스킹)" -> "계좌번호",
    "가상계좌번호" -> "계좌번호", "IBAN" -> "계좌번호",
    "카드번호" -> "카드번호", "카드번호(부분마스킹)" -> "카드번호", "카드번호(부분)" -> "카드번호",
    "암호화폐지갑주소(BTC)" -> "카드번호", "암호화폐지갑주소(ETH)" -> "카드번호",
    "생년월일" -> "생년월일",
    "학번" -> "기타_고유식별정보", "차량번호" -> "기타_고유식별정보")

  def normalizeType(t: String): String =
    typeNormalization.getOrElse(t, "기타_고유식별정보")
}
