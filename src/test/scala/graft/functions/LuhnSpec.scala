package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** LuhnValid: ISO/IEC 7812-1 mod-10 checksum over card-number candidates.
  * Canonical industry test PANs must pass; off-by-one check digits, short
  * strings, and non-separator garbage must fail. */
class LuhnSpec extends SparkSpecBase {
  import spark.implicits._

  private def v(s: String): Boolean = LuhnValid.check(s)

  test("canonical test PANs validate (Visa 16, Amex 15, Mastercard 16)") {
    assert(v("4111111111111111"))
    assert(v("378282246310005"))
    assert(v("5555555555554444"))
  }

  test("group separators -, ., space, tab are accepted and ignored") {
    assert(v("4111-1111-1111-1111"))
    assert(v("4111 1111 1111 1111"))
    assert(v("4111.1111.1111.1111"))
    assert(v("4111\t1111 1111-1111"))
  }

  test("a single flipped check digit fails") {
    assert(!v("4111111111111112"))
    assert(!v("378282246310006"))
  }

  test("digit-count bounds: <13 or >19 digits fail even when mod-10 holds") {
    assert(!v("0000"))            // sum 0 ≡ 0 mod 10 but only 4 digits
    assert(!v("0" * 20))          // 20 digits
    assert(v("0000000000000"))    // 13 zeros: within bounds, sum 0 → valid shape
  }

  test("non-separator garbage fails outright") {
    assert(!v("4111a11111111111"))
    assert(!v("4111/1111/1111/1111"))
    assert(!v(""))
  }

  test("column form: nulls pass through, values match the JVM check") {
    val rows = Seq(Some("4111-1111-1111-1111"), Some("4111111111111112"), None)
      .toDF("c").select(LuhnValid.luhn_valid(col("c")).as("v"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getBoolean(0)))
    assert(rows.toSeq == Seq(Some(true), Some(false), None))
  }
}
