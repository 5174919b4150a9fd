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
  * — no window over the data, nothing row-count-sized ever collects.
  * `exact = false` is the extreme-cardinality path: median and MAD from
  * `percentile_approx` (mergeable sketch state, the q97 trade), giving up
  * oracle replay, like the band filter documents.
  *
  * A NULL stratum is its own stratum (null-safe join, matching groupBy).
  * MAD = 0 (over half the stratum identical) yields robust_z = NULL and
  * is_outlier = false — a constant stratum has no outliers.
  */
object Outliers {

  def robustFlags(df: DataFrame, valueCol: String, strataCol: String,
      threshold: Double = 3.5, exact: Boolean = true): DataFrame = {
    require(threshold > 0, s"threshold must be positive, got $threshold")
    Seq("__s", "med", "mad").foreach { c =>
      require(!df.columns.contains(c),
        s"input must not use the operator's reserved '$c' column name")
    }
    def median(c: org.apache.spark.sql.Column) =
      if (exact) percentile(c, lit(0.5))
      else percentile_approx(c, lit(0.5), lit(10000)).cast("double")
    val med = df.groupBy(col(strataCol).as("__s"))
      .agg(median(col(valueCol)).as("med"))
    val withMed = df.join(broadcast(med), col(strataCol) <=> col("__s"))
      .drop("__s")
    val mad = withMed.groupBy(col(strataCol).as("__s"))
      .agg(median(abs(col(valueCol) - col("med"))).as("mad"))
    withMed.join(broadcast(mad), col(strataCol) <=> col("__s"))
      .drop("__s")
      .withColumn("robust_z",
        when(col("mad") === 0.0, lit(null).cast("double"))
          .otherwise(lit(0.6745) * (col(valueCol) - col("med")) / col("mad")))
      .withColumn("is_outlier",
        coalesce(abs(col("robust_z")) > threshold, lit(false)))
  }

  /** Per-stratum winsorization bounds: `(strataCol, lo, hi)` with
    * lo = floor(percentile(pLo)), hi = ceil(percentile(pHi)) as exact
    * integers — the value-CLIPPING complement of [[robustFlags]] (q170's
    * contract). Same plan budget as the flags: one grouped percentile agg,
    * stratum-count-sized output meant to broadcast back. `exact = false`
    * draws the bounds from `percentile_approx` (mergeable sketch state) —
    * clip bounds only need to sit near the tail, not be exact order
    * statistics.
    */
  def winsorizeBounds(df: DataFrame, valueCol: String, strataCol: String,
      pLo: Double = 0.01, pHi: Double = 0.99,
      exact: Boolean = true): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo <= pHi,
      s"need 0 <= pLo <= pHi <= 1, got [$pLo, $pHi]")
    def pct(p: Double) =
      if (exact) percentile(col(valueCol), lit(p))
      else percentile_approx(col(valueCol), lit(p), lit(10000))
    df.groupBy(strataCol)
      .agg(floor(pct(pLo)).cast("long").as("lo"),
        ceil(pct(pHi)).cast("long").as("hi"))
  }
}
