package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** DupShapeSignals (Gopher dup_line/para fractions) edge cases: trimming is
  * space-only (the Spark/DuckDB `trim` the q67 oracle mirrors), empties are
  * dropped, paragraph split is blank-line (`(\r?\n){2,}`), char mass counts
  * code points. */
class DupShapeSpec extends SparkSpecBase {
  import spark.implicits._

  private def eval(text: String): Seq[Any] =
    Seq(text).toDF("text")
      .select(QualityFunctions.dup_shape_signals(col("text")).as("ds"))
      .select("ds.*").collect().head.toSeq

  test("single paragraph, one duplicated line") {
    // lines a,b,a → 1 dup; no blank line → one paragraph, no dup
    assert(eval("a\nb\na") == Seq(3, 1, 3L, 1L, 1, 0, 5L, 0L))
  }

  test("duplicate paragraph across a blank line") {
    // lines x,x → dup 1; paras x|x → dup 1
    assert(eval("x\n\nx") == Seq(2, 1, 2L, 1L, 2, 1, 2L, 1L))
  }

  test("space trimming and blank-line collapse") {
    // lines "  a  ", "", "", "  a" → trimmed a,a (blanks dropped);
    // paras split on the \n run → "  a  " | "  a" → both trim to a
    assert(eval("  a  \n\n\n  a") == Seq(2, 1, 2L, 1L, 2, 1, 2L, 1L))
  }

  test("CRLF lines and CRLF blank-line paragraph break") {
    // lines a,b,c (no dups); paras "a\r\nb" (4 code points) | "c"
    val r = eval("a\r\nb\r\n\r\nc")
    assert(r == Seq(3, 0, 3L, 0L, 2, 0, 5L, 0L), r.toString)
  }

  test("tab-edged lines are NOT trimmed (space-only trim, oracle parity)") {
    // "a\t" != "a" → no duplicate
    assert(eval("a\t\na") == Seq(2, 0, 3L, 0L, 1, 0, 4L, 0L))
  }

  test("empty and all-space documents") {
    assert(eval("") == Seq(0, 0, 0L, 0L, 0, 0, 0L, 0L))
    // all-space lines die, but the single paragraph space-trims to "\n"
    // (space-only trim — the exact DuckDB-trim semantics the oracle uses)
    assert(eval("   \n   ") == Seq(0, 0, 0L, 0L, 1, 0, 1L, 0L))
  }

  test("char mass counts code points, not UTF-16 units") {
    // U+1F600 is one code point (two UTF-16 units)
    assert(eval("😀\n😀") == Seq(2, 1, 2L, 1L, 1, 0, 3L, 0L))
  }

  test("triple repetition counts occurrences beyond the first") {
    assert(eval("nav\nnav\nnav\nprose line") ==
      Seq(4, 2, 19L, 6L, 1, 0, 22L, 0L))
  }
}
