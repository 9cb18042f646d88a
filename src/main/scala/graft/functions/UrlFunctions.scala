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

  /** Lowercased host: userinfo dropped, the scheme's OWN default port
    * removed (`:443` on a plain-http URL is a real distinct resource and is
    * kept), leading "www." removed. */
  def hostOf(url: Column): Column = {
    val noFrag = stripFragment(url)
    val scheme = lower(regexp_extract(noFrag, "^([a-zA-Z]+)://", 1))
    val hp = lower(regexp_extract(noFrag, "^[a-zA-Z]+://(?:[^/?#@]*@)?([^/?#]+)", 1))
    val noPort = when(scheme === "https", regexp_replace(hp, ":443$", ""))
      .when(scheme === "http", regexp_replace(hp, ":80$", ""))
      .otherwise(hp)
    regexp_replace(noPort, "^www\\.", "")
  }

  /** Last two labels of the host, any port dropped — the registered domain
    * for the common case (a full public-suffix list is a broadcast lookup at
    * scale). Non-default ports stay in hostOf (distinct resources) but must
    * not split or bypass domain blocklists/rollups. */
  def domainOf(url: Column): Column =
    regexp_extract(regexp_replace(hostOf(url), ":[0-9]+$", ""),
      "([^.]+\\.[^.]+)$", 1)

  /** All label-boundary suffixes of a host, shallowest-first capped at
    * `maxLabels` labels: "a.b.example.com" → ["com", "example.com",
    * "b.example.com", "a.b.example.com"]. UT1-style blocklists ban a
    * registrable domain INCLUDING its subdomains; matching host suffixes by
    * EQUALITY against an exploded suffix column turns that into a broadcast
    * hash join — the scale-safe form (a LIKE '%'||entry join is a cartesian
    * nested loop, and a bare string suffix match has no label boundary, so
    * "tracker.net" would wrongly ban "nottracker.net"). Hosts deeper than
    * maxLabels still produce their shallow suffixes, which is where
    * blocklist entries live. */
  def hostSuffixes(host: Column, maxLabels: Int = 8): Column = {
    val parts = split(host, "\\.")
    val n = size(parts)
    // i = 1..min(n, maxLabels) labels counted from the END of the host
    transform(sequence(lit(1), least(n, lit(maxLabels))),
      i => array_join(slice(parts, n - i + 1, lit(maxLabels)), "."))
  }

  /** URL-shape quality signals (the RefinedWeb URL-filter family: spam
    * URLs are URL-shaped before they are content-shaped — digit/hyphen-
    * stuffed hosts, deep auto-generated paths, tracking-parameter tails):
    * struct(path_depth, n_params, host_digit_permille, host_hyphens).
    * Integer-valued everywhere (permille uses integer div), so a SQL
    * oracle matches exactly; pure string ops — narrow, codegen'd, no
    * shuffle. Policy thresholds stay with the caller. */
  def urlShapeSignals(url: Column): Column = {
    val noFrag = stripFragment(url)
    val host = hostOf(url)
    val path = regexp_extract(noFrag, "^[a-zA-Z]+://[^/?#]+(/[^?#]*)?", 1)
    val query = regexp_extract(noFrag, "\\?([^#]*)", 1)
    val depth = length(path) - length(regexp_replace(path, "/", ""))
    val nParams = when(length(query) === 0, lit(0))
      .otherwise(length(query) - length(regexp_replace(query, "&", "")) + lit(1))
    val hostDigits = length(host) - length(regexp_replace(host, "[0-9]", ""))
    // floor of a correctly-rounded double quotient of small ints == integer
    // division (operands ≤ 6·10⁴; a non-integer quotient sits ≥ 1/len(host)
    // from any integer, far beyond one ulp) — same value as the oracle's //
    val permille = floor((hostDigits * lit(1000)).cast("double") / length(host))
    struct(
      depth.cast("int").as("path_depth"),
      nParams.cast("int").as("n_params"),
      permille.cast("int").as("host_digit_permille"),
      (length(host) - length(regexp_replace(host, "-", ""))).cast("int").as("host_hyphens"))
  }

  def canonicalizeUrl(url: Column): Column = {
    val noFrag = stripFragment(url)
    val scheme = lower(regexp_extract(noFrag, "^([a-zA-Z]+)://", 1))
    val rest = regexp_replace(noFrag, "^[a-zA-Z]+://[^/?#]*", "")
    // anchored on the separator (kept via $1) so 'pref=1' or a path segment
    // '/ref=...' never matches — only real ?/& delimited tracking params do
    val noTrack = regexp_replace(rest, "([?&])(utm_[a-z_]+|ref)=[^&#]*", "$1")
    val collapsed = regexp_replace(noTrack, "&+", "&")
    val noLeadAmp = regexp_replace(collapsed, "\\?&", "?")
    val clean = regexp_replace(noLeadAmp, "[?&]$", "")
    concat(scheme, lit("://"), hostOf(url), clean)
  }
}
