package graft.agg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Cols

/** Account-level aggregation: combine the match scores of the names under one
  * account into a single best (gt_uid, agg_score) per account.
  *
  * Semantics of the reference's aggregation stage
  * (/root/reference/emm/aggregation/base_entity_aggregation.py:32-126,
  * spark_entity_aggregation.py:127-195), which runs per-account pandas via
  * applyInPandas. Here it's a pure DataFrame plan — two hash aggregations
  * with map-side partial aggregation and no Python/Arrow boundary. The
  * per-account argmax is a `max_by` aggregation rather than a window
  * row_number: a window must shuffle AND sort every (account, gt) row inside
  * its partition, while max_by partial-aggregates each map task down to one
  * candidate row per account before the exchange — at 100 TB the sort and
  * the shuffle volume are the difference:
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

    // the gt-side columns the winning row carries into the output
    val gtCols = Cols.GtUid +:
      (if (scored.columns.contains(Cols.GtEntityId)) Seq(Cols.GtEntityId) else Nil)
    // argmax ordering: maximize (score, -gt_uid) == (score DESC, gt_uid ASC).
    // gt_uid negation is order-reversing for any realistic id (Long.MinValue
    // alone would overflow). For max_frequency the ordering key is the EXACT
    // decimal numerator: within one account every candidate divides by the
    // same freq total, so this is argmax by agg_score in exact arithmetic —
    // ties are decided on the decimal value, not on the double-rounded
    // quotient (two decimal scores that collide only after double rounding
    // order by their true values; the oracle replays the same contract).
    def bestOf(scoreCol: String) =
      max_by(struct((gtCols :+ scoreCol).map(col): _*),
             struct(col(scoreCol), (-col(Cols.GtUid)).as("__nb"))).as("__best")

    // sums go through DECIMAL so results are exact and order-independent
    // (a plain double sum varies with partitioning at the last ulp)
    method match {
      case "max_frequency_nm_score" =>
        val weighted = cleaned.groupBy(groupCols: _*)
          .agg(sum((col(freqCol) * col(scoreCol)).cast("decimal(38,12)")).as("__w_score"),
               sum(col(freqCol).cast("decimal(38,12)")).as("__w_freq"))
        weighted.groupBy(accountGroup: _*)
          .agg(bestOf("__w_score"), sum(col("__w_freq")).as("__total"))
          .select(accountGroup ++ gtCols.map(c => col(s"__best.$c").as(c)) :+
            (col("__best.__w_score").cast("double") / col("__total").cast("double"))
              .as(Cols.AggScore): _*)
      case "mean_score" =>
        val perGt = cleaned.groupBy(groupCols: _*)
          .agg((sum(col(scoreCol).cast("decimal(38,12)")).cast("double") /
                count(lit(1)).cast("double")).as(Cols.AggScore))
        perGt.groupBy(accountGroup: _*)
          .agg(bestOf(Cols.AggScore))
          .select(accountGroup ++ gtCols.map(c => col(s"__best.$c").as(c)) :+
            col(s"__best.${Cols.AggScore}").as(Cols.AggScore): _*)
      case other =>
        throw new IllegalArgumentException(s"unknown aggregation method: $other")
    }
  }
}
