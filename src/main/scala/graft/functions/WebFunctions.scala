package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Web-crawl preprocessing: HTML→text extraction and URL hygiene — the
  * step between raw crawl records and every text operator in this
  * library (C4/CCNet/RefinedWeb pipelines run exactly this before
  * language ID, quality scoring, and dedup).
  *
  * Everything here is a chain of built-in `regexp_replace`/
  * `regexp_extract` column functions (codegen'd, no UDF), and every
  * pattern is written in the RE2-compatible subset (no lookbehind, no
  * backreferences, explicit whitespace classes) so a SQL engine replays
  * the transform byte-for-byte — the `text_html_extract` /
  * `text_url_normalize` oracles do.
  *
  * The reference pipeline has no content extraction (stateless message
  * transforms, `src/processor.js`); this is crawl-pipeline surface.
  */
object WebFunctions {

  /** Visible text of an HTML fragment: script/style blocks and comments
    * removed WITH their content, remaining tags stripped, the five
    * standard entities + `&nbsp;` decoded (ampersand LAST, so `&amp;lt;`
    * yields the literal `&lt;`), whitespace collapsed to single spaces,
    * trimmed. Deliberately a fixed, engine-replicable transform — not a
    * browser-grade parser: malformed nesting degrades to extra stripped
    * spans, never to an error.
    */
  def htmlToText(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<script\\b[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style\\b[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "(?s)<[^>]*>", " ")
    val ent = regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(regexp_replace(noTags,
        "&nbsp;", " "),
        "&lt;", "<"),
        "&gt;", ">"),
        "&quot;", "\""),
        "&#39;", "'"),
        "&amp;", "&")
    trim(regexp_replace(ent, "[ \\t\\r\\n]+", " "))
  }

  /** Canonical URL for dedup/blocklist joins: fragment dropped,
    * tracking parameters removed (`utm_*`, `fbclid`, `gclid`, `ref`),
    * query-separator debris tidied, scheme+host lowercased (path and
    * surviving query keep their case — they are case-significant).
    */
  def urlNormalize(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    // anchored on a CAPTURED [?&] delimiter (kept via $1): an unanchored
    // `ref=` would also match inside longer parameter names (`href=`,
    // `xref=`) and path segments (`/ref=sr_1_1`), silently mangling the
    // very URLs this canonicalizes for dedup/blocklist keys. Consecutive
    // stripped params leave `&&`/`?&`/trailing debris — tidied next.
    val noTrack = regexp_replace(noFrag,
      "([?&])(?:utm_[A-Za-z0-9_]*|fbclid|gclid|ref)=[^&#]*", "$1")
    val tidied = regexp_replace(regexp_replace(regexp_replace(noTrack,
      "&&+", "&"), "\\?&", "?"), "[?&]+$", "")
    val head = regexp_extract(tidied, "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)
    val tail = regexp_replace(tidied, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", "")
    concat(lower(head), tail)
  }

  /** Host of a URL (credentials and port stripped, lowercased). */
  def urlHost(url: Column): Column =
    lower(regexp_extract(url,
      "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)", 1))

  /** Registered domain: the last two labels of the host — the standard
    * blocklist/per-site-cap grouping key. (A public-suffix-list lookup
    * refines `co.uk`-style hosts at deploy time; the two-label rule is
    * the deterministic, engine-replicable default.)
    */
  def urlDomain(url: Column): Column =
    regexp_extract(urlHost(url), "([^.]+\\.[^.]+)$", 1)
}
