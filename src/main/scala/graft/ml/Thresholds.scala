package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Threshold-decision curves over scored best matches.
  *
  * Semantics of the reference's threshold module
  * (/root/reference/emm/threshold/threshold_decision.py:27-149,
  * base_entity_matching.py:211-268): sweep a threshold grid over nm_score of
  * best-match rows labeled `correct`, compute TP/FP/TN/FN per threshold, and
  * pick the smallest threshold meeting a target metric value.
  *
  * The reference collects scores to the driver; here the sweep is one
  * broadcast join of the (tiny) threshold grid against the scored rows plus a
  * hash aggregation — fully distributed, no collect.
  */
object Thresholds {

  /** One row per threshold: tp/fp/tn/fn + precision/recall/tnr. */
  def curves(scored: DataFrame, scoreCol: String, labelCol: String,
             steps: Int = 20): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    val grid = (0 to steps).map(i => i.toDouble / steps).toDF("threshold")
    scored.select(col(scoreCol).as("s"), col(labelCol).cast("boolean").as("y"))
      .crossJoin(broadcast(grid))
      .groupBy("threshold")
      .agg(
        sum(when(col("s") >= col("threshold") && col("y"), 1).otherwise(0)).cast("long").as("tp"),
        sum(when(col("s") >= col("threshold") && !col("y"), 1).otherwise(0)).cast("long").as("fp"),
        sum(when(col("s") < col("threshold") && !col("y"), 1).otherwise(0)).cast("long").as("tn"),
        sum(when(col("s") < col("threshold") && col("y"), 1).otherwise(0)).cast("long").as("fn"))
      .withColumn("precision", col("tp").cast("double") /
        greatest(col("tp") + col("fp"), lit(1L)).cast("double"))
      .withColumn("recall", col("tp").cast("double") /
        greatest(col("tp") + col("fn"), lit(1L)).cast("double"))
      .withColumn("tnr", col("tn").cast("double") /
        greatest(col("tn") + col("fp"), lit(1L)).cast("double"))
      // named metrics of the reference's threshold decision
      // (base_entity_matching.py:241-244): fullrecall = TP over ALL names to
      // match (not just labeled positives); predicted_matches_rate = fraction
      // of names predicted as a match at this threshold
      .withColumn("fullrecall", col("tp").cast("double") /
        greatest(col("tp") + col("fp") + col("tn") + col("fn"), lit(1L)).cast("double"))
      .withColumn("predicted_matches_rate", (col("tp") + col("fp")).cast("double") /
        greatest(col("tp") + col("fp") + col("tn") + col("fn"), lit(1L)).cast("double"))
  }

  /** Smallest threshold whose `metric` is >= target (driver-side on the tiny
    * curve table).
    */
  def decide(curvesDf: DataFrame, metric: String, target: Double): Option[Double] =
    curvesDf.filter(col(metric) >= target)
      .orderBy("threshold")
      .select("threshold")
      .collect().headOption.map(_.getDouble(0))
}
