package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Simplified American Soundex as a pure column expression — the classic
  * phonetic BLOCKING key for name matching (Christen 2012 §4.3; the
  * third standard blocking family beside the reference's first-k-chars
  * blocking, `spark_indexing_utils.py` blocking_func, and its sorted
  * neighbourhood). Names that sound alike ("SMITH"/"SMYTHE",
  * "ROBERT"/"RUPERT") share a key, so a phonetic equi-join survives the
  * spelling noise that defeats prefix blocks.
  *
  * Spec (deliberately the SIMPLIFIED vowel-rule variant, so both engines
  * replay the identical arithmetic with only `upper`/`regexp_replace`/
  * `translate`/`substring` — no per-character loop, no UDF, fully inside
  * whole-stage codegen):
  *   1. uppercase, strip every non-A-Z character;
  *   2. map letters to digits via one `translate` over the fixed 26-char
  *      code table (B F P V→1, C G J K Q S X Z→2, D T→3, L→4, M N→5,
  *      R→6, vowels + H W Y→0);
  *   3. collapse adjacent equal digits (one regexp backreference pass) —
  *      H/W code as 0 here, i.e. they BREAK runs like vowels do, which is
  *      where this variant differs from Knuth's H/W-transparent original;
  *   4. key = first LETTER + (remaining digits, zeros removed, first 3,
  *      right-padded with '0'); empty/non-alpha input → NULL.
  *
  * Both halves of every oracle replay steps 1–4 verbatim, so the key is
  * a cross-engine-stable surface, unlike library soundex builtins whose
  * H/W and padding edge cases differ between implementations.
  */
object Phonetic {

  /** A→0 B→1 C→2 D→3 E→0 F→1 G→2 H→0 I→0 J→2 K→2 L→4 M→5 N→5 O→0 P→1
    * Q→2 R→6 S→2 T→3 U→0 V→1 W→0 X→2 Y→0 Z→2 */
  val CodeTable = "01230120022455012623010202"

  /** The 4-char soundex key of `name`, NULL when no letter survives the
    * strip. Map-only: safe inside any join key or groupBy. */
  def soundex4(name: Column): Column = {
    val clean = regexp_replace(upper(name), "[^A-Z]", "")
    val codes = translate(clean, ('A' to 'Z').mkString, CodeTable)
    // one pass collapses arbitrarily long runs: (d)\1+ -> d
    val collapsed = regexp_replace(codes, "(\\d)\\1+", "$1")
    val tail = regexp_replace(substring(collapsed, 2, 1000), "0", "")
    when(length(clean) === 0, lit(null).cast("string"))
      .otherwise(concat(substring(clean, 1, 1),
        rpad(substring(tail, 1, 3), 3, "0")))
  }

  /** Identical spec in DuckDB SQL, for oracle replay. `expr` must be a
    * column reference or parenthesised expression. */
  def soundex4Sql(expr: String): String = {
    val az = ('A' to 'Z').mkString
    s"""CASE WHEN length(regexp_replace(upper($expr), '[^A-Z]', '', 'g')) = 0
        THEN NULL ELSE
          substr(regexp_replace(upper($expr), '[^A-Z]', '', 'g'), 1, 1) ||
          rpad(substr(regexp_replace(
                 substr(
                   regexp_replace(
                     translate(regexp_replace(upper($expr), '[^A-Z]', '', 'g'),
                               '$az', '$CodeTable'),
                     '(\\d)\\1+', '\\1', 'g'),
                   2, 1000),
                 '0', '', 'g'),
               1, 3), 3, '0')
        END"""
  }
}
