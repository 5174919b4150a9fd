package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Link extraction + reference resolution — the DISCOVERY half of the
  * crawl loop ([[Urls]] is the hygiene half): fetched pages carry the
  * next frontier in their `<a href>` attributes, as relative references
  * that only mean something against the page's own URL. Declared rules,
  * regexp/HOF tier only — map-only, codegen'd, no UDF, no java.net.URI
  * (not oracle-replayable), RE2-safe patterns (no lookaround) so the
  * DuckDB oracle runs the very same expressions.
  *
  * Extraction ([[hrefs]]): script / style / comment blocks drop first
  * (the [[graft.preprocess.HtmlText]] block rules — an href inside code
  * or a comment is not a link), then every `<a ... href="...">` or
  * single-quoted variant yields its reference, in document order with
  * duplicates preserved. Declared limits: quoted hrefs only, anchors
  * only (`<link href>` is a stylesheet, not an outlink).
  *
  * Resolution ([[resolve]]), RFC 3986 §5 reduced to declared cases over
  * an ABSOLUTE base:
  *  - "" or "#..." → the base itself (self reference);
  *  - "scheme://..." → the reference (already absolute);
  *  - "//host..." → base scheme + ":" + reference (protocol-relative);
  *  - "/path..." → base origin + reference (root-relative);
  *  - "?query" → base origin + base path + reference;
  *  - "scheme:opaque" (mailto:, javascript:, tel:, data:) → NULL — a
  *    non-hierarchical scheme is not crawlable, callers filter;
  *  - anything else → base DIRECTORY (path to the last '/') + reference.
  * Dot segments then collapse by a FIXED-DEPTH (8) chained rewrite of
  * `/./` and `seg/../` (the parent segment must not start with '.', so
  * `../../` never swallows itself) — deeper nesting and above-root
  * `../` leftovers stay literal, a declared limit like the HtmlText
  * tiers, degrading identically in both engines.
  */
object Links {

  private val blockStripped: Column => Column = html => {
    val noScript = regexp_replace(html, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
  }

  /** Anchor href pattern: group 1 is the quoted value INCLUDING quotes
    * (one group works for both quote styles; the quotes strip after). */
  val hrefPat: String = "(?i)<a\\s[^>]*href\\s*=\\s*(\"[^\"]*\"|'[^']*')"

  /** All anchor references in `html`, document order, quotes stripped. */
  def hrefs(html: Column): Column =
    transform(regexp_extract_all(blockStripped(html), lit(hrefPat), lit(1)),
      h => regexp_replace(h, "^[\"']|[\"']$", ""))

  /** Resolve reference `ref` against absolute `base` (NULL for
    * non-hierarchical schemes). Compose with [[Urls.canonicalize]] before
    * any frontier use — resolution preserves the reference's own case,
    * params and fragments. */
  def resolve(base: Column, ref: Column): Column = {
    val r = trim(ref)
    val scheme = regexp_extract(base, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    val origin = regexp_extract(base,
      "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)
    val basePath = regexp_extract(base,
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val baseDir = when(basePath === "", lit("/"))
      .otherwise(regexp_replace(basePath, "[^/]*$", ""))
    val joined =
      when(r === "" || r.startsWith("#"), base)
        .when(r.rlike("^[A-Za-z][A-Za-z0-9+.-]*://"), r)
        .when(r.startsWith("//"), concat(scheme, lit(":"), r))
        .when(r.startsWith("/"), concat(origin, r))
        .when(r.startsWith("?"), concat(origin, basePath, r))
        .when(r.rlike("^[A-Za-z][A-Za-z0-9+.-]*:"), lit(null))
        .otherwise(concat(origin, baseDir, r))
    // fixed-depth dot-segment rewrite over the PATH ONLY (the host is
    // split off first — an above-root "../" must never consume it); the
    // parent of "/../" must not start with '.' so "../../" can never
    // consume a ".." segment
    val jOrigin = regexp_extract(joined,
      "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)
    val jRest = regexp_replace(joined,
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", "")
    val dedot = (1 to 8).foldLeft(jRest) { (c, _) =>
      val dot = regexp_replace(c, "/\\./", "/")
      val dd = regexp_replace(dot, "/[^/.][^/]*/\\.\\./", "/")
      regexp_replace(dd, "/[^/.][^/]*/\\.\\.([?#]|$)", "/$1")
    }
    concat(jOrigin, dedot) // NULL joined (opaque scheme) stays NULL
  }
}
