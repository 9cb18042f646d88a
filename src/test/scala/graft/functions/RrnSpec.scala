package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** RrnValid: Korean RRN weighted mod-11 checksum plus the gender-digit
  * issuance rule. Hand-computed vectors (weights 2..9,2..5 over d1-d12). */
class RrnSpec extends SparkSpecBase {
  import spark.implicits._

  private def v(s: String): Boolean = RrnValid.check(s)

  test("hand-computed valid RRN passes, with and without the hyphen") {
    // Σ w·d = 124, 124 mod 11 = 3, (11-3) mod 10 = 8
    assert(v("900101-1234568"))
    assert(v("9001011234568"))
  }

  test("a flipped check digit fails") {
    assert(!v("900101-1234567"))
    assert(!v("900101-1234569"))
  }

  test("gender digit 0 or 9 fails even when the checksum holds") {
    // Σ w·d = 188 for g=9 → check digit 0 is checksum-correct, still invalid
    assert(!v("900101-9234560"))
  }

  test("shape violations fail: wrong length, misplaced hyphen, garbage") {
    assert(!v("900101-123456"))    // 12 digits
    assert(!v("900101-12345678"))  // 14 digits
    assert(!v("90010-11234568"))   // hyphen not at the 6|7 boundary
    assert(!v("900101 1234568"))   // space is not a valid separator here
    assert(!v(""))
  }

  test("eligible: full 13-digit shape regardless of checksum; masked/partial forms are not") {
    assert(RrnValid.eligible("900101-1234567")) // wrong checksum — still eligible
    assert(RrnValid.eligible("9001011234568"))
    assert(!RrnValid.eligible("900101-1******"))
    assert(!RrnValid.eligible("900101-123456"))
    assert(!RrnValid.eligible("900101 1234568"))
    // at most ONE separator: stacked dashes at the boundary are malformed
    assert(!RrnValid.eligible("900101---1234568"))
    assert(!v("900101---1234568"))
  }

  test("ARC +2 variant: foreigner gender digit with the shifted check value") {
    // g=5 digits: Σ w·d = 156, 156 mod 11 = 2 → citizen check 9, ARC check 1
    assert(RrnValid.checkArc("900101-5234561"))
    assert(!RrnValid.checkArc("900101-5234569")) // that's the citizen value
    assert(RrnValid.check("900101-5234569"))     // which check() accepts
    assert(!RrnValid.checkArc("900101-1234568")) // citizen-range gender digit
  }

  test("column form: nulls pass through, values match the JVM check") {
    val rows = Seq(Some("900101-1234568"), Some("900101-1234567"), None)
      .toDF("c").select(RrnValid.rrn_valid(col("c")).as("v"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getBoolean(0)))
    assert(rows.toSeq == Seq(Some(true), Some(false), None))
  }
}
