package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the first stage of web-corpus dedup: two crawls
  * of the same page routinely differ only in scheme/host case, a default
  * port, a `www.` prefix, tracking parameters, or a trailing slash, and
  * every such pair that survives to the hash stage is a missed duplicate.
  *
  * All pure per-row column expressions (builtin regexp functions — no
  * UDF, stays inside whole-stage codegen). Spark replacement syntax uses
  * Java group references (`$1`); the DuckDB oracle twin in
  * [[TextOps.l4pUrlCanonical]] mirrors each step with RE2 references
  * (`\1`) — the PAIR is kept in sync step-for-step, which the entry's
  * hash-match oracle enforces. RE2 has no lookahead, so boundary checks
  * are written as a captured following character instead.
  */
object Urls {

  private val AuthorityRe = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*"

  /** Canonical form: lowercased scheme+authority, `www.` stripped,
    * default ports (`https:443`, `http:80`) stripped, every `utm_*`
    * query parameter removed, dangling `?`/`&`/trailing-`/` cleaned.
    * Path, non-tracking params, and fragment are preserved as-is
    * (path case is significant per RFC 3986). */
  def canonicalize(url: Column): Column = {
    val authority = regexp_extract(url, AuthorityRe, 0)
    // lowercase ONLY scheme+authority; the path/query stay case-exact.
    // Tail length = length(url): always sufficient, and — unlike a fixed
    // cap — identical to the oracle's uncapped substr(url, n), so no URL
    // length can make the two engines diverge (ADVICE r4). A literal
    // Int.MaxValue would overflow substringSQL's start+len arithmetic.
    val lowered = concat(lower(authority), url.substr(length(authority) + 1, length(url)))
    val noWww = regexp_replace(lowered, "^(https?://)www\\.", "$1")
    // default port: match the boundary char (or end) and restore it —
    // RE2-portable alternative to a lookahead. `[^/?#]*` (not `[^/:?#]+`)
    // lets the authority carry userinfo (`user:pass@host`): greedy match
    // + the required boundary pins `:443` to the PORT position only.
    val noPort = regexp_replace(
      regexp_replace(noWww, "^(https://[^/?#]*):443(/|\\?|#|$)", "$1$2"),
      "^(http://[^/?#]*):80(/|\\?|#|$)", "$1$2")
    // a RUN of utm params each followed by & collapses in one match —
    // anchored to the [?&] separator so `xutm_a=1` (a NON-tracking param
    // that merely contains the substring) is never touched; a trailing
    // utm param (followed by # or end) drops with its separator
    val noUtm = regexp_replace(
      regexp_replace(noPort, "([?&])(?:utm_[A-Za-z_]+=[^&#]*&)+", "$1"),
      "[?&]utm_[A-Za-z_]+=[^&#]*", "")
    // dangling separators the removals can leave behind; '/' directly
    // before '?'/'#' is treated as a path terminator (a literal '/#'
    // inside a query VALUE is out of scope for this canonicalizer)
    val noSlashQ = regexp_replace(noUtm, "/([?#])", "$1")
    regexp_replace(regexp_replace(regexp_replace(noSlashQ, "\\?#", "#"), "\\?$", ""), "/$", "")
  }

  /** Registrable host of an already-canonicalized URL (no port — the
    * canonical form has stripped defaults; explicit nonstandard ports and
    * any `user:pass@` userinfo are excluded from the domain key on
    * purpose: one census row per host). */
  def domain(canonical: Column): Column =
    regexp_extract(canonical, "://(?:[^/?#@]*@)?([^/:?#]+)", 1)
}
