package graft.data

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Survey raking (iterative proportional fitting): reweight a sample's
  * (row-category × column-category) cells so the weighted margins match
  * target row/column totals — the standard correction when a sample is
  * demographically skewed against a known population.
  *
  * The iteration runs UNROLLED on the |A|·|B| cell frame (kilobyte-sized
  * at any corpus scale — raw rows collapse once, margins are windows over
  * cells). Each half-step multiplies cell weights by target/current margin
  * ratios as EXACT cross-multiplied integer quotients on q9 (parts-per-
  * billion) weights: w′ = w_q9·t·10⁹ div (Σ w_q9·n), a positive-dividend
  * DECIMAL(38,0) integer division that Spark's `div` and DuckDB's HUGEINT
  * `//` truncate identically (the round-11 mcnemar_ppm discipline — no
  * round(double, 9) half-steps, no engine-specific rounding anywhere).
  * The declared semantics are "IPF with q9 floor quantization", exact and
  * bit-replayable, not "IPF to convergence".
  */
object Raking {

  private val D38 = "decimal(38,0)"

  /** @param sample  rows with categorical `aCol`, `bCol`
    * @param targets target margins: rows with `aCol`, `bCol`, `target_n`
    *                (typically the full population's cell counts — only
    *                its margins are used)
    * @param iters   full row+column iterations to unroll (≥ 1)
    * @return one row per cell: `a, b, n_sample, weight_q9, fitted_n_q9`
    *         (weight and fitted weighted count in exact integer q9 units)
    *         plus the post-fit ABSOLUTE margin gaps `row_absgap_ppm,
    *         col_absgap_ppm` (weighted margin vs target, cross-multiplied
    *         integer ppm — positive dividends keep both engines' integer
    *         division equal)
    */
  def ipf(sample: DataFrame, targets: DataFrame, aCol: String, bCol: String,
          iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 8, s"unrolled iters=$iters out of range")
    val cells0 = sample.groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).cast("long").as("n_sample"))
    val tgt = targets.select(col(aCol).as("a"), col(bCol).as("b"),
      col("target_n").cast("long").as("t_n"))
    val wa = Window.partitionBy("a")
    val wb = Window.partitionBy("b")
    // outer join so sample-empty target cells don't distort margins and
    // target-empty sample cells keep weight 0 (no mass to give them)
    val joined = cells0.join(tgt, Seq("a", "b"), "full_outer")
      .select(col("a"), col("b"),
        coalesce(col("n_sample"), lit(0L)).as("n_sample"),
        coalesce(col("t_n"), lit(0L)).as("t_n"))
      .withColumn("t_row", sum("t_n").over(wa).cast("long"))
      .withColumn("t_col", sum("t_n").over(wb).cast("long"))
      .withColumn("w_q9", lit(1000000000L))
    // half-step: w′_q9 = w_q9·t·10⁹ div (Σ w_q9·n) — dividend ≤
    // w_q9·t·10⁹ stays inside DECIMAL(38,0) for weights up to ~10¹⁹/t;
    // margins beyond ~10⁸ counts pre-aggregate upstream anyway
    val fitted = (1 to iters).foldLeft(joined) { (df, _) =>
      val rowScaled = df
        .withColumn("__cur",
          sum(col("w_q9").cast(D38) * col("n_sample")).over(wa).cast(D38))
        .withColumn("w_q9",
          when(col("__cur") > 0,
            expr("""CAST(CAST(w_q9 AS DECIMAL(38,0)) * t_row * 1000000000
                    div __cur AS BIGINT)"""))
            .otherwise(col("w_q9")))
        .drop("__cur")
      rowScaled
        .withColumn("__cur",
          sum(col("w_q9").cast(D38) * col("n_sample")).over(wb).cast(D38))
        .withColumn("w_q9",
          when(col("__cur") > 0,
            expr("""CAST(CAST(w_q9 AS DECIMAL(38,0)) * t_col * 1000000000
                    div __cur AS BIGINT)"""))
            .otherwise(col("w_q9")))
        .drop("__cur")
    }
    fitted
      .withColumn("fitted_n_q9",
        (col("w_q9").cast(D38) * col("n_sample")).cast("long"))
      .withColumn("__m_row", sum("fitted_n_q9").over(wa).cast(D38))
      .withColumn("__m_col", sum("fitted_n_q9").over(wb).cast(D38))
      // ABSOLUTE gaps as exact integer ppm: |Σ fitted_q9 − t·10⁹|·10⁶
      // div (t·10⁹) — the abs() keeps the dividend positive
      .withColumn("row_absgap_ppm",
        when(col("t_row") > 0,
          expr("""CAST(abs(__m_row - CAST(t_row AS DECIMAL(38,0)) *
                  1000000000) * 1000000
                  div (CAST(t_row AS DECIMAL(38,0)) * 1000000000)
                  AS BIGINT)""")).otherwise(lit(null).cast("long")))
      .withColumn("col_absgap_ppm",
        when(col("t_col") > 0,
          expr("""CAST(abs(__m_col - CAST(t_col AS DECIMAL(38,0)) *
                  1000000000) * 1000000
                  div (CAST(t_col AS DECIMAL(38,0)) * 1000000000)
                  AS BIGINT)""")).otherwise(lit(null).cast("long")))
      .select("a", "b", "n_sample", "w_q9", "fitted_n_q9",
        "row_absgap_ppm", "col_absgap_ppm")
      .withColumnRenamed("w_q9", "weight_q9")
  }
}
