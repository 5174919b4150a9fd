package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fellegi–Sunter probabilistic record linkage — the classical
  * counterpart to the library's supervised matcher (reference's GBT
  * layer): per comparison feature, estimate m = P(agree | match) and
  * u = P(agree | non-match) from labeled pairs, and derive the
  * log-likelihood-ratio weights w⁺ = ln(m/u), w⁻ = ln((1−m)/(1−u)) that
  * a naive-Bayes scorer sums per pair.
  *
  * One explode + one hash aggregation collapses the pair relation to the
  * |features| frame; the agreement counts and m/u stay exact integers
  * (ppm via positive-dividend integer division — engine-replayable), and
  * each weight is ONE IEEE division of integer cross-products through ln.
  * ln is libm (not correctly rounded, engine-dependent), so the weights
  * are emitted as plain UNQUANTIZED doubles that callers keep out of
  * hashed surfaces, banding them against the exact integer cross-ratios
  * with verdict booleans (the Survival/Contingency round-12 discipline).
  * Degenerate features (m = 1, u = 0, …) get NULL for the undefined
  * weight instead of ±∞ — declared semantics, unit-pinned.
  */
object FellegiSunter {

  private val D38 = "decimal(38,0)"

  /** @param pairs       labeled comparison pairs
    * @param labelCol    1 = true match, 0 = non-match
    * @param featureCols boolean/0-1 agreement indicator columns
    * @return one row per feature: `feature, n_match, n_unmatch,
    *         n_agree_match, n_agree_unmatch, m_ppm, u_ppm` (exact
    *         integers — the hashable surface) plus `w_agree, w_disagree`
    *         (plain libm doubles — band, never hash)
    */
  def weights(pairs: DataFrame, labelCol: String,
              featureCols: Seq[String]): DataFrame = {
    require(featureCols.nonEmpty, "at least one comparison feature")
    val stacked = pairs.select(
      explode(array(featureCols.map(f =>
        struct(lit(f).as("feature"), col(f).cast("int").as("agree"))): _*))
        .as("s"),
      col(labelCol).cast("int").as("lbl"))
      .select(col("s.feature").as("feature"), col("s.agree").as("agree"),
        col("lbl"))
    val agg = stacked.groupBy("feature").agg(
      sum(when(col("lbl") === 1 && col("agree") === 1, 1L).otherwise(0L))
        .cast("long").as("am"),
      sum(when(col("lbl") === 1, 1L).otherwise(0L)).cast("long").as("nm"),
      sum(when(col("lbl") === 0 && col("agree") === 1, 1L).otherwise(0L))
        .cast("long").as("au"),
      sum(when(col("lbl") === 0, 1L).otherwise(0L)).cast("long").as("nu"))
    agg.select(col("feature"),
      col("nm").as("n_match"), col("nu").as("n_unmatch"),
      col("am").as("n_agree_match"), col("au").as("n_agree_unmatch"),
      expr("CAST(CAST(am AS DECIMAL(38,0)) * 1000000 div nm AS BIGINT)")
        .as("m_ppm"),
      expr("CAST(CAST(au AS DECIMAL(38,0)) * 1000000 div nu AS BIGINT)")
        .as("u_ppm"),
      when(col("am") > 0 && col("au") > 0,
        log((col("am").cast(D38) * col("nu")).cast("double") /
          (col("nm").cast(D38) * col("au")).cast("double"))).as("w_agree"),
      when(col("nm") - col("am") > 0 && col("nu") - col("au") > 0,
        log(
          ((col("nm") - col("am")).cast(D38) * col("nu")).cast("double") /
            (col("nm").cast(D38) * (col("nu") - col("au"))).cast("double")))
        .as("w_disagree"))
  }
}
