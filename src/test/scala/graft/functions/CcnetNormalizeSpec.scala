package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** CcnetNormalize: the CCNet paragraph-dedup key (Wenzek et al. 2020 §4.1).
  * The q78 DuckDB oracle covers the ASCII contract end-to-end; this spec pins
  * the JVM-only behavior the SQL mirror can't reach — accent folding,
  * Unicode digit classes, exotic whitespace — plus the fixpoint property. */
class CcnetNormalizeSpec extends SparkSpecBase {
  import spark.implicits._

  private def norm(s: String): String = CcnetNormalize.normalize(s)

  test("case, digit, punctuation variants of boilerplate collapse to one key") {
    assert(norm("Share on FACEBOOK - 1,234 Likes!!!") == "share on facebook 0000 likes")
    assert(norm("share   on facebook 0000 likes") == "share on facebook 0000 likes")
  }

  test("accents fold via NFD mark-strip; precomposed and decomposed agree") {
    assert(norm("Café") == "cafe")
    assert(norm("Café") == "cafe") // decomposed input, same key
    assert(norm("DÉJÀ vu — naïve") == "deja vu naive")
  }

  test("Unicode digits fold to '0' like ASCII ones") {
    assert(norm("٣ ¼ ３") == norm("7 ¼ 4")) // Arabic-Indic + fullwidth digits
    assert(norm("٣٢١ items") == "000 items")
  }

  test("whitespace runs (tab, NBSP-free Zs, newline) collapse; edges trim") {
    assert(norm("  a \t b c \n") == "a b c")
    assert(norm("\t\t") == "")
  }

  test("normalization is a fixpoint") {
    for (s <- Seq("Share on FACEBOOK - 1,234 Likes!", "DÉJÀ vu", "a  b\tc", ""))
      assert(norm(norm(s)) == norm(s))
  }

  test("column form matches the JVM function, nulls pass through") {
    val rows = Seq(Some("Hello, WORLD 42!"), None).toDF("t")
      .select(CcnetNormalize.ccnet_normalize(col("t")).as("n"))
      .collect().map(r => Option(r.getString(0)))
    assert(rows.toSeq == Seq(Some("hello world 00"), None))
  }
}
