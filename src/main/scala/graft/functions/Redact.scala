package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Rule-based PII-style redaction for corpus preparation.
  *
  * A redaction pass is a fold of `regexp_replace` steps — pure, codegen'd,
  * map-only, so it composes with scans and pushes no shuffle anywhere. The
  * built-in rule set masks the common structured identifiers (emails, URLs,
  * long digit runs, phone-shaped digit groups); `apply` takes any ordered
  * rule list, and order matters (an email must be masked before the digit
  * rule can eat its local part).
  *
  * Patterns deliberately stay inside the regex subset whose semantics agree
  * across engines (character classes, bounded repetition, alternation — no
  * lookaround, no backreferences), so the same rules replay identically in
  * Java regex (Spark), RE2 (DuckDB), and Python's `re`.
  */
object Redact {

  /** (pattern, replacement), applied in order. */
  type Rule = (String, String)

  val emailRule: Rule = ("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
  val urlRule: Rule = ("https?://[^\\s]+", "<URL>")
  /** Phone-shaped digit groups (e.g. the TPC-H `nn-nnn-nnn-nnnn` format). */
  val phoneRule: Rule = ("[0-9]{2,3}(-[0-9]{3,4}){2,3}", "<PHONE>")
  /** Long digit runs (account numbers, ids); applied after phone/email. */
  val digitsRule: Rule = ("[0-9]{6,}", "<NUM>")

  val defaultRules: Seq[Rule] = Seq(emailRule, urlRule, phoneRule, digitsRule)

  def apply(text: Column, rules: Seq[Rule] = defaultRules): Column =
    rules.foldLeft(text) { case (c, (pat, rep)) => regexp_replace(c, pat, rep) }

  /** How many matches the rule set would mask (for audit columns). */
  def hitCount(text: Column, rules: Seq[Rule] = defaultRules): Column =
    rules.map { case (pat, _) => regexp_count(text, lit(pat)) }
      .reduce(_ + _).cast("int")
}
