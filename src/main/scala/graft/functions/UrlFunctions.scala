package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for crawl dedup/rollups, composed entirely from
  * codegen'd built-ins so the same steps are expressible in the DuckDB
  * oracle (RE2-safe patterns, no lookaround):
  *
  *   1. strip the fragment;
  *   2. lowercase scheme and host (path/query case preserved);
  *   3. drop default ports (:80/:443) and a leading "www.";
  *   4. strip tracking params (utm_*, ref) and normalize separators.
  *
  * Canonical URLs make exact URL-dedup catch the dominant crawl duplicate
  * class (same page, different tracking decorations) before any content
  * hashing runs.
  */
object UrlFunctions {

  private def stripFragment(u: Column): Column = regexp_replace(u, "#.*$", "")

  /** Lowercased host with default port and "www." removed. */
  def hostOf(url: Column): Column = {
    val hp = lower(regexp_extract(stripFragment(url), "^[a-zA-Z]+://([^/?#]+)", 1))
    regexp_replace(regexp_replace(hp, ":(443|80)$", ""), "^www\\.", "")
  }

  /** Last two labels of the host — the registered domain for the common
    * case (a full public-suffix list is a broadcast lookup at scale). */
  def domainOf(url: Column): Column =
    regexp_extract(hostOf(url), "([^.]+\\.[^.]+)$", 1)

  def canonicalizeUrl(url: Column): Column = {
    val noFrag = stripFragment(url)
    val scheme = lower(regexp_extract(noFrag, "^([a-zA-Z]+)://", 1))
    val rest = regexp_replace(noFrag, "^[a-zA-Z]+://[^/?#]*", "")
    val noTrack = regexp_replace(rest, "(utm_[a-z_]+|ref)=[^&#]*", "")
    val collapsed = regexp_replace(noTrack, "&+", "&")
    val noLeadAmp = regexp_replace(collapsed, "\\?&", "?")
    val clean = regexp_replace(noLeadAmp, "[?&]$", "")
    concat(scheme, lit("://"), hostOf(url), clean)
  }
}
