package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Top-n rows per group, with the reference's four tie-handling methods
  * (/root/reference/emm/indexing/spark_indexing_utils.py:158-196):
  *
  *  - `exactly`  — row_number(): exactly n rows per group (ties broken by the
  *    order columns; pass a total order for determinism).
  *  - `at_least` — rank(): at least n rows when ties straddle the cut.
  *  - `at_least_n_different_order_values` — dense_rank(): keeps whole tie
  *    groups; right for exploded candidate lists where rows are linked.
  *  - `at_most`  — count(*) over the ordered window (running count incl. ties):
  *    drops entire tie groups that cross the boundary, so never more than n.
  *
  * One window + one filter: a single shuffle on the group key with no
  * materialized intermediate — the skew-removal shape the reference uses to
  * cap duplicate GT names.
  */
object TopN {

  def takeTopNPerGroup(df: DataFrame, n: Int, groupCols: Seq[String],
                       orderBy: Seq[Column], method: String = "exactly",
                       rankCol: String = "group_rank",
                       keepRankCol: Boolean = true): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(orderBy: _*)
    val rankExpr: Column = method match {
      case "exactly"  => row_number().over(w)
      case "at_least" => rank().over(w)
      case "at_least_n_different_order_values" => dense_rank().over(w)
      case "at_most"  => count(lit(1)).over(w)
      case other => throw new IllegalArgumentException(s"Unknown method '$other'")
    }
    val ranked = df.withColumn(rankCol, rankExpr).filter(col(rankCol) <= n)
    if (keepRankCol) ranked else ranked.drop(rankCol)
  }
}
