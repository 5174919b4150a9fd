package graft.agg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Cols

/** Account-level aggregation: combine the match scores of the names under one
  * account into a single best (gt_uid, agg_score) per account.
  *
  * Semantics of the reference's aggregation stage
  * (/root/reference/emm/aggregation/base_entity_aggregation.py:32-126,
  * spark_entity_aggregation.py:127-195), which runs per-account pandas via
  * applyInPandas. Here it's a pure DataFrame plan — two hash aggregations and
  * one window argmax, with map-side partial aggregation and no Python/Arrow
  * boundary:
  *
  *  - `max_frequency_nm_score`: per (account, gt): sum(freq * score), divided
  *    by the account's total freq; argmax per account.
  *  - `mean_score`: per (account, gt): avg(score); argmax per account.
  *
  * Null-candidate rows and blacklisted/empty names are dropped first
  * (spark_entity_aggregation.py:173-195).
  *
  * Account-side grouping follows base_entity_aggregation.py:170-182: the
  * account column, plus — when present on the frame — the names' `entity_id`
  * (training evaluation aggregates per known entity) and `positive_set`
  * (metric collection keeps the split halves apart). One best row is emitted
  * per such group.
  */
object EntityAggregation {

  def aggregate(
      scored: DataFrame,
      method: String = "max_frequency_nm_score",
      accountCol: String = Cols.Account,
      freqCol: String = Cols.Freq,
      scoreCol: String = Cols.NmScore,
      blacklist: Seq[String] = Nil): DataFrame = {

    val cleaned = scored
      .filter(col(Cols.GtUid).isNotNull)                       // P4 null-match filter
      .filter(coalesce(col(Cols.Preprocessed), lit("")) =!= "" // P5 blacklist filter
        && !lower(col(Cols.Preprocessed)).isin(blacklist.map(_.toLowerCase): _*))

    val accountGroup = (Seq(accountCol) ++
      Seq(Cols.EntityId, "positive_set").filter(scored.columns.contains)).map(col)
    val groupCols = (accountGroup :+ col(Cols.GtUid)) ++
      (if (scored.columns.contains(Cols.GtEntityId)) Seq(col(Cols.GtEntityId)) else Nil)

    // sums go through DECIMAL so results are exact and order-independent
    // (a plain double sum varies with partitioning at the last ulp)
    val perGt = method match {
      case "max_frequency_nm_score" =>
        val weighted = cleaned.groupBy(groupCols: _*)
          .agg(sum((col(freqCol) * col(scoreCol)).cast("decimal(38,12)")).as("w_score"),
               sum(col(freqCol).cast("decimal(38,12)")).as("w_freq"))
        val totals = Window.partitionBy(accountGroup: _*)
        weighted.withColumn(Cols.AggScore,
          col("w_score").cast("double") / sum(col("w_freq")).over(totals).cast("double"))
      case "mean_score" =>
        cleaned.groupBy(groupCols: _*)
          .agg((sum(col(scoreCol).cast("decimal(38,12)")).cast("double") /
                count(lit(1)).cast("double")).as(Cols.AggScore))
      case other =>
        throw new IllegalArgumentException(s"unknown aggregation method: $other")
    }

    val best = Window.partitionBy(accountGroup: _*)
      .orderBy(col(Cols.AggScore).desc, col(Cols.GtUid))
    perGt.withColumn("__rn", row_number().over(best))
      .filter(col("__rn") === 1)
      .drop("__rn", "w_score", "w_freq")
  }
}
