package graft.data

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Concentration / inequality measures over a pre-aggregated
  * (key, nonnegative integer weight) frame — the "is one source swallowing
  * the corpus" audit behind mix-governance gates: the discrete Gini
  * coefficient (via the Lorenz-order rank-weighted sum), the
  * Herfindahl–Hirschman index, and the top-1 share.
  *
  * Scale shape: the caller collapses raw rows to the key domain first (one
  * hash agg); this kernel's ordered pass is a DISTRIBUTED sort +
  * zipWithIndex global rank over that collapsed frame
  * ([[graft.operators.GlobalRank]] — never a 1-partition row_number), then
  * one scalar aggregation.
  *
  * Oracle determinism: with integer weights all three measures are RATIONAL
  * — G = (2·Σᵢ i·x₍ᵢ₎ − (n+1)·Σx) / (n·Σx) over the ascending (x, key)
  * total order, HHI = Σx² / (Σx)², top1 = max/Σx — so every reported value
  * is an exact cross-multiplied integer ppm quotient (positive dividends:
  * the Gini numerator is ≥ 0 by the rearrangement inequality on the
  * ascending order). Zero doubles. DECIMAL(38,0) bound: Σx² ≤ (Σx)² needs
  * Σx < ~10¹⁶ weight units with the 10⁶ scale — loud at the q306-style
  * bound.
  */
object Concentration {

  private val D38 = "decimal(38,0)"

  /** Gini + HHI + top-1 share from `(keyCol, weightCol)` rows (one row per
    * key, integer weights ≥ 0). Returns one row:
    * `n_keys, total_weight, gini_ppm, hhi_ppm, top1_share_ppm`.
    */
  def giniHhi(perKey: DataFrame, keyCol: String,
              weightCol: String): DataFrame = {
    val ranked = graft.operators.GlobalRank.withGlobalRank(
      perKey.select(col(weightCol).cast("long").as("__x"),
        col(keyCol).cast("string").as("__k")),
      "__rk0", Seq("__x", "__k"))
    ranked.agg(
      count(lit(1)).cast("long").as("n_keys"),
      sum("__x").cast("long").as("total_weight"),
      max("__x").cast("long").as("__mx"),
      sum(col("__x").cast(D38) * col("__x")).cast(D38).as("__sx2"),
      sum((col("__rk0").cast(D38) + 1) * col("__x")).cast(D38).as("__six"))
      .withColumn("__guard",
        when(col("total_weight") >= lit(10000000000000000L),
          raise_error(concat(lit("giniHhi: total weight "),
            col("total_weight"),
            lit(" exceeds the exact-arithmetic bound 1e16"))))
          .otherwise(lit(0L)))
      .select(col("n_keys"), col("total_weight"),
        when(col("total_weight") + col("__guard") > 0,
          expr(s"""CAST((2 * __six - (CAST(n_keys AS $D38) + 1) *
                   total_weight) * 1000000
                   div (CAST(n_keys AS $D38) * total_weight)
                   AS BIGINT)""")).otherwise(lit(null).cast("long"))
          .as("gini_ppm"),
        when(col("total_weight") > 0,
          expr(s"""CAST(__sx2 * 1000000
                   div (CAST(total_weight AS $D38) * total_weight)
                   AS BIGINT)""")).otherwise(lit(null).cast("long"))
          .as("hhi_ppm"),
        when(col("total_weight") > 0,
          expr(s"""CAST(CAST(__mx AS $D38) * 1000000 div total_weight
                   AS BIGINT)""")).otherwise(lit(null).cast("long"))
          .as("top1_share_ppm"))
  }
}
