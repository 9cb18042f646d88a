package graft.filter

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** C4-style blocklist toxicity filtering — the "toxicity" half of the
  * north rule's PII/toxicity scrub.
  *
  * Scoring matches LOWERED WHOLE TOKENS against the list (substring
  * matching is the classic Scunthorpe false-positive trap); scrubbing masks
  * word-boundary occurrences case-insensitively. The term list is a
  * parameter: real deployments load a published blocklist (e.g. the C4
  * "bad words" list) — the engine fixes only the column contract. For the
  * bounded lists these are (hundreds of terms) an inlined IN/alternation
  * compiles to an InSet / single regex per task — no join, no shuffle;
  * million-term lists would switch to a broadcast semi-join on exploded
  * tokens instead.
  */
object Toxicity {

  /** Number of tokens that are blocklisted (multiset count). */
  def hits(text: Column, terms: Seq[String]): Column = {
    require(terms.nonEmpty)
    size(filter(TF.tokensLower(text), t => t.isInCollection(terms)))
  }

  /** Blocklisted fraction of tokens, 4 decimals. */
  def score(text: Column, terms: Seq[String]): Column =
    round(hits(text, terms).cast("double") / TF.tokenCount(text), 4)

  /** Mask whole-word occurrences of the terms, case-insensitive. */
  def scrub(text: Column, terms: Seq[String], mask: String = "[masked]"): Column = {
    require(terms.nonEmpty)
    val pattern = "(?i)\\b(" + terms.map(java.util.regex.Pattern.quote).mkString("|") + ")\\b"
    regexp_replace(text, pattern, mask)
  }
}
