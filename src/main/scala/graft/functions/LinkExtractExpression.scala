package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `extract_links(html)` → the href values of `<a>` tags, in document order,
  * duplicates kept (order and multiplicity carry anchor semantics). The
  * outlink side of the host link graph ([[graft.operators.LinkGraph]]) and
  * the crawl-frontier feed. Quote-aware attribute scanning (href values may
  * contain '>'), case-insensitive tag/attribute names, quoted or unquoted
  * values; `<a>` tags inside dropped elements (script/style/comments) are
  * NOT skipped — link extraction runs on the raw markup, not the extracted
  * text (a crawler follows links wherever they appear). One O(|html|) scan.
  */
case class ExtractLinks(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "extract_links"

  override def nullSafeEval(input: Any): Any = {
    val html = input.asInstanceOf[UTF8String].toString
    val out = ExtractLinks.links(html)
    ArrayData.toArrayData(out.map(UTF8String.fromString))
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ExtractLinks {
  def links(html: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val n = html.length
    var i = 0
    while (i < n) {
      i = html.indexOf('<', i)
      if (i < 0) return out.toArray
      // `<a` followed by whitespace or tag end — not <abbr>/<article>
      if (i + 1 < n && (html.charAt(i + 1) == 'a' || html.charAt(i + 1) == 'A') &&
        (i + 2 >= n || !html.charAt(i + 2).isLetterOrDigit)) {
        var j = i + 2
        // scan attributes to tag end, honoring quotes; pick up href
        var href: String = null
        while (j < n && html.charAt(j) != '>') {
          // the preceding char must be an attribute separator (whitespace or
          // a closing quote) — rejects hreflang's prefix and data-href
          if (href == null && html.regionMatches(true, j, "href", 0, 4) &&
            (Character.isWhitespace(html.charAt(j - 1)) ||
              html.charAt(j - 1) == '"' || html.charAt(j - 1) == '\'') &&
            j + 4 < n && !html.charAt(j + 4).isLetterOrDigit &&
            html.charAt(j + 4) != '-') {
            var k = j + 4
            while (k < n && Character.isWhitespace(html.charAt(k))) k += 1
            if (k < n && html.charAt(k) == '=') {
              k += 1
              while (k < n && Character.isWhitespace(html.charAt(k))) k += 1
              if (k < n && (html.charAt(k) == '"' || html.charAt(k) == '\'')) {
                val q = html.charAt(k)
                val e = html.indexOf(q, k + 1)
                if (e > 0) { href = html.substring(k + 1, e); j = e }
                else j = k
              } else { // unquoted: to whitespace or '>'
                var e = k
                while (e < n && !Character.isWhitespace(html.charAt(e)) &&
                  html.charAt(e) != '>') e += 1
                href = html.substring(k, e)
                j = e - 1
              }
            }
          } else {
            val c = html.charAt(j)
            if (c == '"' || c == '\'') { // skip other quoted attr values
              val e = html.indexOf(c, j + 1)
              if (e > 0) j = e
            }
          }
          j += 1
        }
        if (href != null) out += href
        i = j
      } else i += 1
    }
    out.toArray
  }

  def extract_links(c: Column): Column =
    ColumnBridge.column(ExtractLinks(ColumnBridge.expression(c)))
}
