package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: a thresholded levenshtein COMPARISON never needs the
  * full O(|a|·|b|) DP — `levenshtein(a, b) <= k` is decided by the banded
  * O(k·min(|a|,|b|)) kernel Spark already ships (`Levenshtein` with
  * `threshold`, which returns −1 past the band). Users naturally write the
  * comparison form (every fuzzy-match WHERE clause does); this rule
  * rewrites it to
  *
  *   levenshtein(a, b, k) >= 0
  *
  * which is equivalent in ALL cases: null inputs stay null, distance ≤ k
  * gives a value ≥ 0 (true), distance > k gives −1 (false). Strict `<` is
  * rewritten with k−1. Only integer LITERAL bounds rewrite — a column-typed
  * bound would change the band per row, which the kernel does support but
  * keeps the match visibly trivial this way.
  *
  * Registered by [[graft.GraftExtensions]] (cluster-wide via
  * `spark.sql.extensions`) or per-session through
  * `spark.experimental.extraOptimizations`.
  */
object BandedLevenshteinRule extends Rule[LogicalPlan] {

  private def banded(a: Expression, b: Expression, k: Int): Expression =
    GreaterThanOrEqual(Levenshtein(a, b, Some(Literal(k))), Literal(0))

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case LessThanOrEqual(Levenshtein(a, b, None),
          Literal(k: Int, IntegerType)) if k >= 0 => banded(a, b, k)
      case GreaterThanOrEqual(Literal(k: Int, IntegerType),
          Levenshtein(a, b, None)) if k >= 0 => banded(a, b, k)
      case LessThan(Levenshtein(a, b, None),
          Literal(k: Int, IntegerType)) if k >= 1 => banded(a, b, k - 1)
      case GreaterThan(Literal(k: Int, IntegerType),
          Levenshtein(a, b, None)) if k >= 1 => banded(a, b, k - 1)
    }
}
