package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Pins the Mersenne-fold modular arithmetic in [[MinHashPerms.permute]] to
  * exact BigInt arithmetic, and the derived constants to their definition —
  * the q14–q16/q39/q64/q65/q75 oracles recompute both in DuckDB HUGEINT, so
  * any drift here is an oracle hash mismatch. */
class MinHashPermsSpec extends AnyFunSuite {
  private val P = BigInt(MinHashPerms.P)

  test("permute equals exact BigInt (a*h+b) mod 2^61-1 on random inputs") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 100000) {
      val a = rnd.nextLong() & ((1L << 61) - 1)
      val b = rnd.nextLong() % MinHashPerms.P match { case x => if (x < 0) x + MinHashPerms.P else x }
      val h = rnd.nextLong() >>> 4 // < 2^60, the hash60 range
      val expect = ((BigInt(a) * BigInt(h) + BigInt(b)) mod P).toLong
      assert(MinHashPerms.permute(a, b, h) == expect, s"a=$a b=$b h=$h")
    }
  }

  test("permute edge values: h=0, h=2^60-1, a=P-1 (max odd below P), b=0") {
    val hMax = (1L << 60) - 1
    for (a <- Seq(1L, MinHashPerms.P - 2); b <- Seq(0L, MinHashPerms.P - 1);
         h <- Seq(0L, 1L, hMax)) {
      val expect = ((BigInt(a) * BigInt(h) + BigInt(b)) mod P).toLong
      assert(MinHashPerms.permute(a, b, h) == expect, s"a=$a b=$b h=$h")
    }
  }

  test("lowerLikeSpark matches Spark's lower() dispatch, including under tr-TR") {
    import org.apache.spark.unsafe.types.UTF8String
    val prev = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(java.util.Locale.forLanguageTag("tr-TR"))
      // ASCII fast path is locale-INDEPENDENT in Spark — 'I' must lower to
      // 'i', not the Turkish dotless ı a bare String.toLowerCase() gives
      val ascii = "FREE WIFI IN LOBBY"
      assert(MinHashPerms.lowerLikeSpark(ascii) == "free wifi in lobby")
      assert(MinHashPerms.lowerLikeSpark(ascii) ==
        UTF8String.fromString(ascii).toLowerCase.toString)
      assert(ascii.toLowerCase() != "free wifi in lobby",
        "precondition: the bare JVM lowercase DOES diverge under tr-TR")
      // non-ASCII input takes Spark's slow path = default-locale toLowerCase
      for (s <- Seq("İSTANBUL Ağrı", "STRASSE ß", "ΑΘΗΝΑ MIX")) {
        assert(MinHashPerms.lowerLikeSpark(s) == s.toLowerCase())
        assert(MinHashPerms.lowerLikeSpark(s) ==
          UTF8String.fromString(s).toLowerCase.toString, s)
      }
    } finally java.util.Locale.setDefault(prev)
  }

  test("constants match their md5-60 definition and stay in range") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def h60(s: String): Long =
      java.lang.Long.parseLong(
        md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15), 16)
    for (i <- 0 until 16) {
      assert(MinHashPerms.a(i) == h60("a" + i) * 2 + 1)
      assert(MinHashPerms.b(i) == h60("b" + i))
      assert(MinHashPerms.a(i) > 0 && MinHashPerms.a(i) < MinHashPerms.P)
      assert(MinHashPerms.b(i) >= 0 && MinHashPerms.b(i) < MinHashPerms.P)
    }
  }
}
