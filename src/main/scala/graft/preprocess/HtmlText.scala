package graft.preprocess

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML → text extraction — the step BEFORE every quality gate in a
  * crawl-data pipeline (the corpus tables here start at clean text; a
  * real crawl starts at markup, and every downstream operator — hygiene,
  * quality, dedup, LM scoring — assumes the markup is gone).
  *
  * Declared-rules extraction, not a browser:
  *  1. script / style / comment BLOCKS drop whole (their content is code,
  *     not text — and stripping them first means a literal '<' inside
  *     script code can never confuse the tag pass);
  *  2. block-level closers (p, div, li, h1–h6, tr, ul, ol, table, title,
  *     header, footer) and void br become LINE BREAKS, so the document's
  *     logical line structure survives into the boilerplate pass;
  *  3. every remaining tag drops to a space;
  *  4. a DECLARED entity list unescapes (lt gt quot #39 apos nbsp, then
  *     amp LAST — the standard ordering, so a double-escaped "&amp;lt;"
  *     unescapes exactly one level);
  *  5. per line: whitespace collapses, then two declared boilerplate
  *     rules drop the line — shorter than `minLineChars` after trim
  *     (nav/heading furniture), or matching the literal boilerplate
  *     pattern (legalese; the jusText/CCNet line filter reduced to a
  *     replayable form).
  *
  * Scale shape: one chained regexp_replace + split + two array HOFs —
  * map-only, whole-stage-codegen'd, zero shuffle, zero UDF; at 100 TB
  * this runs at parquet-scan speed, and every rule is relational so a
  * DuckDB oracle replays the extraction byte for byte.
  *
  * Numeric character references (`&#NN;` decimal, `&#xNN;` hex, either
  * case) decode for the PRINTABLE-ASCII range 32–126 in ONE single-pass
  * tier: the string splits on the ref pattern and the segments
  * interleave with the decoded characters, so a segment is never
  * re-scanned — a decoded '&' cannot combine with following text into a
  * second entity (`"&#38;lt;"` yields `"&lt;"`, exactly one level).
  * Out-of-range codes keep their literal ref text. The tier runs after
  * the named list but BEFORE the amp fold, so `"&amp;#65;"` unescapes
  * one level to `"&#65;"`, never two.
  *
  * Declared limitations (v1, stated not hidden): numeric refs outside
  * printable ASCII stay literal, no CDATA, no attribute-aware parsing
  * (a literal '>' inside an attribute value ends that tag's match), and
  * a ref that decodes to '&' directly before a named entity body
  * (`"&#38;amp;"`) is re-folded by the final amp pass — malformed
  * markup degrades identically in any engine running the same rules.
  */
object HtmlText {

  /** Numeric character reference: decimal or hex form. */
  val numRefPat: String = "&#(?:[0-9]{1,7}|[xX][0-9a-fA-F]{1,6});"

  /** Decode one matched ref → its character when the code lands in
    * printable ASCII (32–126); anything else keeps the literal ref. */
  private def decodeNumRef(r: Column): Column = {
    val hex = regexp_extract(r, "^&#[xX]([0-9a-fA-F]+);$", 1)
    val code = when(hex =!= "", conv(hex, 16, 10).cast("long"))
      .otherwise(regexp_extract(r, "^&#([0-9]+);$", 1).cast("long"))
    when(code.between(32, 126), call_function("char", code)).otherwise(r)
  }

  /** Block-level closers (+ void br) rewritten to newlines BEFORE tag
    * stripping, so one extracted line per logical block survives. */
  val lineBreakTags: String =
    "(?i)<(/p|/div|/li|/h[1-6]|/tr|/ul|/ol|/table|/title|/header|/footer|br[^>]*)>"

  /** Default boilerplate-line pattern: legalese / cookie-nav furniture. */
  val defaultBoilerplate: String =
    "(?i)^(copyright\\b|all rights reserved|cookie|privacy policy|terms of (use|service))"

  /** The whole extraction chain to an array of trimmed, space-collapsed
    * lines (empty entries mark dropped structure and are filtered by the
    * consumers). One Column — map-only, codegen'd. */
  def extractedLines(html: Column): Column = {
    val noScript =
      regexp_replace(html, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle =
      regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val broken = regexp_replace(noComment, lineBreakTags, "\n")
    val noTags = regexp_replace(broken, "<[^>]*>", " ")
    // declared entity list; numeric refs after it (so "&#39;" now rides
    // the numeric tier) and amp LAST so "&amp;lt;" unescapes one level
    // (to "&lt;"), never two (to "<") — both engines replace single-pass
    val named = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
        "&apos;" -> "'", "&nbsp;" -> " ")
      .foldLeft(noTags) { case (c, (from, to)) =>
        replace(c, lit(from), lit(to))
      }
    // numeric-charref tier: split + interleave, single pass (segments are
    // never re-scanned). split keeps trailing empties (limit -1), so
    // len(segs) = len(refs)+1 and the zip's null tail pads with ""
    val segs = split(named, numRefPat, -1)
    val refs = regexp_extract_all(named, lit(numRefPat), lit(0))
    val unescaped = replace(
      array_join(zip_with(segs, refs, (s, r) =>
        concat(s, when(r.isNull, lit("")).otherwise(decodeNumRef(r)))), ""),
      lit("&amp;"), lit("&"))
    transform(split(unescaped, "\n"),
      l => trim(regexp_replace(l, "\\s+", " ")))
  }

  /** (doc_id, text, n_lines_kept, n_lines_dropped, n_chars) per non-null
    * input row: kept lines joined by '\n'; `n_lines_dropped` counts only
    * NON-EMPTY dropped lines (empty entries are structural split debris,
    * not content a rule rejected).
    */
  def extract(df: DataFrame, htmlCol: String, idCol: String,
              minLineChars: Int = 15,
              boilerplate: String = defaultBoilerplate): DataFrame = {
    require(minLineChars >= 1, s"need minLineChars >= 1, got $minLineChars")
    val lines = extractedLines(col(htmlCol))
    df.filter(col(htmlCol).isNotNull)
      .select(col(idCol).as("doc_id"), lines.as("__lines"))
      .select(col("doc_id"),
        filter(col("__lines"), l => length(l) >= minLineChars &&
          !l.rlike(boilerplate)).as("__kept"),
        filter(col("__lines"), l => length(l) > 0).as("__nonempty"))
      .select(col("doc_id"),
        array_join(col("__kept"), "\n").as("text"),
        size(col("__kept")).cast("long").as("n_lines_kept"),
        (size(col("__nonempty")) - size(col("__kept"))).cast("long")
          .as("n_lines_dropped"))
      .withColumn("n_chars", length(col("text")).cast("long"))
  }
}
