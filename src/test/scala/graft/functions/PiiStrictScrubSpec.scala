package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** scrub_pii_strict: checksum-gated card/RRN redaction. Checksum-valid
  * candidates and every non-eligible shape scrub exactly like scrub_pii;
  * checksum-FAILING full-numeric candidates (the regex layer's random-number
  * false positives) stay in the clear. */
class PiiStrictScrubSpec extends SparkSpecBase {
  import spark.implicits._

  private def both(s: String): (String, String) = {
    val r = Seq(s).toDF("t").select(
      PiiFunctions.scrub_pii(col("t")).as("plain"),
      PiiFunctions.scrub_pii_strict(col("t")).as("strict")).head()
    (r.getString(0), r.getString(1))
  }

  test("Luhn-valid card scrubs in both modes; Luhn-invalid only in plain") {
    val (p1, s1) = both("결제 카드번호 4111-1111-1111-1111 입니다")
    assert(p1.contains("[카드번호]") && s1 == p1)
    val (p2, s2) = both("주문번호 4111-1111-1111-1112 입니다")
    assert(p2.contains("[카드번호]"), "plain scrub must redact the shape")
    assert(s2.contains("4111-1111-1111-1112"), "strict scrub must keep the failed-checksum number")
  }

  test("checksum-valid RRN scrubs in both modes; invalid only in plain") {
    val (p1, s1) = both("주민등록번호 900101-1234568 확인")
    assert(p1.contains("[주민등록번호]") && s1 == p1)
    val (p2, s2) = both("주민등록번호 900101-1234567 확인")
    assert(p2.contains("[주민등록번호]"))
    assert(s2.contains("900101-1234567"))
  }

  test("ARC-variant foreigner number stays redacted under strict") {
    val (p, s) = both("외국인등록번호 900101-5234561 확인")
    assert(p.contains("[주민등록번호]") && s == p)
  }

  test("non-eligible shapes always scrub: masked card (not Luhn-checkable)") {
    val (p1, s1) = both("카드 1234-56**-****-7890 말소")
    assert(p1 == s1 && p1.contains("[카드번호]"))
  }

  test("n_pii counting rule is identical across modes on gate-free rows") {
    // repeated value: both modes count distinct (category, value) pairs
    val r = Seq("이메일 kim.cs@corp.co.kr 재전송 kim.cs@corp.co.kr 확인")
      .toDF("t").select(
        PiiFunctions.process_pii(col("t")).as("p"),
        PiiFunctions.process_pii_strict(col("t")).as("s")).head()
    val (np, ns) = (r.getStruct(0).getInt(1), r.getStruct(1).getInt(1))
    assert(np == 1 && ns == 1, s"plain=$np strict=$ns — repeated email must count once in BOTH")
  }

  test("other categories are untouched by the gate") {
    val (p, s) = both("연락처 010-1234-5678 이메일 kim.cs@corp.co.kr")
    assert(p == s)
    assert(s.contains("[전화번호]") && s.contains("[이메일]"))
  }
}
