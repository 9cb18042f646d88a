package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** minhash_sigs(text) → array<long> of k MinHash signature values, computed
  * in ONE pass per row: tokenize → distinct word-k-shingles → for each of k
  * salted hashes keep the min.
  *
  * Value-identical to the long-form explode/groupBy formulation
  * (Dedup.minhashSignatures): hash h_i(s) = first 15 hex digits of
  * md5(s + "#" + i) — but with no explode, no shuffle, no intermediate
  * (id × perm × shingle) rows. At crawl scale this turns the signature stage
  * from a multi-TB shuffle into a narrow map.
  */
case class MinHashSignatures(child: Expression, k: Int, shingleWidth: Int)
    extends UnaryExpression with CodegenFallback {
  require(k >= 1 && shingleWidth >= 1)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sigs"

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    // Tokenize EXACTLY like the long form / SQL oracle, i.e. Spark's
    // split(lower(trim(text)), "\s+"): trim strips only ' ' (not \t/\n like
    // JVM String.trim), and split keeps leading/trailing empty tokens
    // (Pattern.split limit -1, unlike String.split's trailing-empty drop).
    // Crawl text with leading/trailing \t or \n must shingle identically.
    var s = 0
    var e = text.length
    while (s < e && text.charAt(s) == ' ') s += 1
    while (e > s && text.charAt(e - 1) == ' ') e -= 1
    // no-arg toLowerCase on purpose: Spark's lower() (UTF8String
    // .toLowerCaseSlow) calls String.toLowerCase() with the DEFAULT locale
    // for non-ASCII input, so Locale.ROOT here would diverge from the long
    // form / oracle under e.g. a tr-TR JVM (İ → i̇ vs ı̇ dotting rules)
    val toks = MinHashSignatures.Ws.split(
      text.substring(s, e).toLowerCase(), -1)
    val sigs = Array.fill(k)(Long.MaxValue)
    if (toks.length >= shingleWidth) {
      val md = java.security.MessageDigest.getInstance("MD5")
      val seen = new java.util.HashSet[String]()
      val sb = new java.lang.StringBuilder
      var i = 0
      val last = toks.length - shingleWidth
      while (i <= last) {
        sb.setLength(0)
        var j = 0
        while (j < shingleWidth) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j)); j += 1
        }
        val sh = sb.toString
        if (seen.add(sh)) {
          var p = 0
          while (p < k) {
            md.reset()
            val h = md.digest((sh + "#" + p).getBytes(java.nio.charset.StandardCharsets.UTF_8))
            // first 15 hex digits = top 60 bits of the first 8 bytes, >>> 4
            var v = 0L
            var b = 0
            while (b < 8) { v = (v << 8) | (h(b) & 0xffL); b += 1 }
            v = v >>> 4
            if (v < sigs(p)) sigs(p) = v
            p += 1
          }
        }
        i += 1
      }
    }
    ArrayData.toArrayData(sigs)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSignatures {
  /** Same pattern Spark's split uses; compiled once per JVM. */
  private[functions] val Ws = java.util.regex.Pattern.compile("\\s+")
}

object MinHashFunctions {
  def minhash_sigs(c: Column, k: Int = 16, shingleWidth: Int = 3): Column =
    ColumnBridge.column(MinHashSignatures(ColumnBridge.expression(c), k, shingleWidth))
}
