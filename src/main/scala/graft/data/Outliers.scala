package graft.data

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Robust per-stratum outlier flagging — modified z-scores from median/MAD
  * (Iglewicz–Hoaglin), the data-quality screen that survives the outliers it
  * is hunting (mean/stddev z-scores are dragged by the very rows they should
  * flag; median/MAD have a 50% breakdown point).
  *
  *   robust_z = 0.6745 · (x − median) / MAD,   outlier ⇔ |robust_z| > τ
  *
  * (0.6745 = Φ⁻¹(0.75) rescales MAD to σ under normality; τ = 3.5 is the
  * standard cut.) Scale shape mirrors [[Sampling.percentileBandFilter]]:
  * two grouped exact-percentile aggregations (median, then MAD of residuals
  * against the broadcast medians), bounds broadcast back, flagging map-side
  * — no window over the data, nothing row-count-sized ever collects. At
  * extreme stratum cardinality swap `percentile` for `percentile_approx`
  * and give up oracle replay, like the band filter documents.
  *
  * A NULL stratum is its own stratum (null-safe join, matching groupBy).
  * MAD = 0 (over half the stratum identical) yields robust_z = NULL and
  * is_outlier = false — a constant stratum has no outliers.
  */
object Outliers {

  def robustFlags(df: DataFrame, valueCol: String, strataCol: String,
      threshold: Double = 3.5): DataFrame = {
    require(threshold > 0, s"threshold must be positive, got $threshold")
    Seq("__s", "med", "mad").foreach { c =>
      require(!df.columns.contains(c),
        s"input must not use the operator's reserved '$c' column name")
    }
    val med = df.groupBy(col(strataCol).as("__s"))
      .agg(percentile(col(valueCol), lit(0.5)).as("med"))
    val withMed = df.join(broadcast(med), col(strataCol) <=> col("__s"))
      .drop("__s")
    val mad = withMed.groupBy(col(strataCol).as("__s"))
      .agg(percentile(abs(col(valueCol) - col("med")), lit(0.5)).as("mad"))
    withMed.join(broadcast(mad), col(strataCol) <=> col("__s"))
      .drop("__s")
      .withColumn("robust_z",
        when(col("mad") === 0.0, lit(null).cast("double"))
          .otherwise(lit(0.6745) * (col(valueCol) - col("med")) / col("mad")))
      .withColumn("is_outlier",
        coalesce(abs(col("robust_z")) > threshold, lit(false)))
  }
}
