package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Robots-style fetch gating — the step a crawler runs BETWEEN frontier
  * dedup (q460) and fetching: a declared rule set (host, path prefix,
  * allow/disallow) applied with the longest-match semantics the
  * robots.txt RFC 9309 prescribes — among all rules of the url's host
  * whose prefix matches the url's path, the LONGEST prefix wins, and an
  * allow beats a disallow of equal length. No rule matched → allowed
  * (the crawl-by-default contract). This is a DECLARED-rules gate over
  * already-parsed rules, not a robots.txt parser: rule acquisition is a
  * fetch concern; the engine's job is applying millions of rules to
  * billions of frontier rows.
  *
  * Scale shape: rule sets are host-keyed and small relative to the
  * frontier — the join broadcasts the rules and hashes on host, the
  * prefix match rides as the join residual, and the longest-match pick
  * is a per-url argmax window over the url's OWN matched rules (fan-out
  * bounded by rules-per-host, not frontier size). Map-side against the
  * frontier scan; one url-keyed window over the matched subset only.
  */
object Robots {

  private val hostRe = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
  private val pathQueryRe = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"

  /** Gate `frontier` rows through `rules` (host, prefix, allow). Adds
    * `host`, `allowed`, and the winning rule's (`rule_prefix`,
    * `rule_allow`) — NULL when no rule matched (allowed by default).
    * Ties: longest prefix, then allow over disallow, then the smaller
    * prefix string (a total order, so the verdict is deterministic).
    */
  def gate(frontier: DataFrame, urlCol: String,
           rules: DataFrame): DataFrame = {
    val host = regexp_extract(col(urlCol), hostRe, 1)
    val path = regexp_replace(col(urlCol), pathQueryRe, "")
    val f = frontier.withColumn("host", host).withColumn("__path", path)
    val r = rules.select(col("host"), col("prefix"),
      col("allow").cast("boolean").as("allow"))
    val matched = f.join(broadcast(r),
      f("host") === r("host") && f.col("__path").startsWith(r("prefix")))
      .select(f("*"), r("prefix"), r("allow"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(urlCol))
      .orderBy(length(col("prefix")).desc, col("allow").desc,
        col("prefix"))
    val best = matched.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(urlCol), col("prefix").as("rule_prefix"),
        col("allow").as("rule_allow"))
    f.join(best, Seq(urlCol), "left")
      .withColumn("allowed", coalesce(col("rule_allow"), lit(true)))
      .drop("__path")
  }
}
