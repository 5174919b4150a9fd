package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-fitted partialling-out ("double ML") treatment-effect estimator
  * (Chernozhukov et al. 2018, the partially linear form): residualize both
  * the outcome and the treatment on the confounders with OUT-OF-FOLD
  * nuisance models, then θ̂ = Σ ỹ·d̃ / Σ d̃² — orthogonal to nuisance error,
  * and cross-fitting removes the own-row overfitting bias.
  *
  * Nuisances here are the [[graft.features.TargetEncoder]] out-of-fold
  * per-segment means (exact floor-divided integers — the leakage-safe
  * conditional-mean model), so the whole estimator is: two cell-frame
  * aggregations + one broadcast join back + one product aggregation, all
  * in exact integer arithmetic until the final θ division.
  */
object DoubleML {

  private val D38 = "decimal(38,0)"

  /** @param df       rows with `foldCol`, categorical `segCol` (the
    *                 confounder), binary `dCol` ∈ {0,1} (treatment), and
    *                 integer-sub-unit `yIntCol` (outcome)
    * @return one row: `n, theta_u` — the effect in outcome sub-units per
    *         unit treatment, exact truncating integer division (NULL when
    *         the treatment residual is identically zero)
    */
  def ate(df: DataFrame, foldCol: String, segCol: String, dCol: String,
          yIntCol: String): DataFrame = {
    val base = df.select(col(foldCol), col(segCol),
      col(dCol).cast("long").as("__d"),
      col(yIntCol).cast("long").as("__y"))
      .withColumn("__d_ppm", col("__d") * lit(1000000L))
    val my = graft.features.TargetEncoder.encodingTable(
      base, segCol, foldCol, "__y")
      .withColumnRenamed("enc_u", "__my").drop("n_in_fold")
    val md = graft.features.TargetEncoder.encodingTable(
      base, segCol, foldCol, "__d_ppm")
      .withColumnRenamed("enc_u", "__md").drop("n_in_fold")
    val resid = base
      .join(broadcast(my), Seq(segCol, foldCol))
      .join(broadcast(md), Seq(segCol, foldCol))
      .withColumn("__yt", col("__y") - col("__my"))            // sub-units
      .withColumn("__dt", col("__d_ppm") - col("__md"))        // ppm
    resid.agg(
      count(lit(1)).cast("long").as("n"),
      sum(col("__yt").cast(D38) * col("__dt")).cast(D38).as("__num"),
      sum(col("__dt").cast(D38) * col("__dt")).cast(D38).as("__den"))
      // θ in sub-units / unit treatment: num·10⁶ / den as TRUNCATING
      // integer division via remainder subtraction — num may be negative,
      // and both Spark's % and DuckDB's // truncate toward zero, so the
      // two engines agree exactly (the q307 no-rounded-doubles lesson)
      .select(col("n"),
        when(col("__den") > 0,
          ((col("__num") * 1000000L -
            (col("__num") * 1000000L) % col("__den")) / col("__den"))
            .cast(D38).cast("long"))
          .otherwise(lit(null).cast("long")).as("theta_u"))
  }
}
