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
  * ratios; weights are rounded to a fixed 9-dp scale after every half-step
  * so the weighted margin sums run in DECIMAL (order-independent) and the
  * whole fit is bit-replayable by any engine — the declared semantics are
  * "IPF with 9-dp weight quantization", exact, not "IPF to convergence".
  */
object Raking {

  // weight scale chosen so every product w·n stays inside DECIMAL(38,_)
  // EXACTLY in both engines (20+12+1 digits) — no engine-specific
  // precision-overflow rounding rules ever fire
  private val DW = "decimal(20,9)"
  private val DN = "decimal(12,0)"

  /** @param sample  rows with categorical `aCol`, `bCol`
    * @param targets target margins: rows with `aCol`, `bCol`, `target_n`
    *                (typically the full population's cell counts — only
    *                its margins are used)
    * @param iters   full row+column iterations to unroll (≥ 1)
    * @return one row per cell: `a, b, n_sample, weight, fitted_n` plus the
    *         post-fit ABSOLUTE margin gaps `row_absgap_ppm, col_absgap_ppm`
    *         (weighted margin vs target, cross-multiplied integer ppm — a
    *         positive dividend keeps both engines' integer division equal)
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
      .withColumn("w", lit(BigDecimal(1)).cast(DW))
    val fitted = (1 to iters).foldLeft(joined) { (df, _) =>
      val rowScaled = df
        .withColumn("__cur_row",
          sum(col("w") * col("n_sample").cast(DN)).over(wa)
            .cast("decimal(33,9)"))
        .withColumn("w",
          when(col("__cur_row") > 0,
            round(col("w").cast("double") * col("t_row").cast("double") /
              col("__cur_row").cast("double"), 9).cast(DW))
            .otherwise(col("w")))
        .drop("__cur_row")
      rowScaled
        .withColumn("__cur_col",
          sum(col("w") * col("n_sample").cast(DN)).over(wb)
            .cast("decimal(33,9)"))
        .withColumn("w",
          when(col("__cur_col") > 0,
            round(col("w").cast("double") * col("t_col").cast("double") /
              col("__cur_col").cast("double"), 9).cast(DW))
            .otherwise(col("w")))
        .drop("__cur_col")
    }
    fitted
      .withColumn("fitted_n",
        (col("w") * col("n_sample").cast(DN)).cast("decimal(33,9)"))
      // (27,9) keeps the whole gap-ppm chain inside exact DECIMAL(38,9)
      // arithmetic in BOTH engines (30,9 after the subtract, 38,9 after
      // the ×10⁶) — no precision-overflow scale reduction ever fires
      .withColumn("__m_row", sum("fitted_n").over(wa).cast("decimal(27,9)"))
      .withColumn("__m_col", sum("fitted_n").over(wb).cast("decimal(27,9)"))
      // ABSOLUTE gaps in double floor arithmetic — DuckDB's decimal
      // division falls back to DOUBLE, so the agreed op sequence is
      // exact-decimal diff → double → ×10⁶ → ÷ target → floor (every step
      // an identical IEEE op on identical inputs in either engine)
      .withColumn("row_absgap_ppm",
        when(col("t_row") > 0,
          expr("""CAST(floor(CAST(abs(__m_row - t_row) AS DOUBLE)
                  * 1000000 / t_row) AS BIGINT)""")).otherwise(lit(null)))
      .withColumn("col_absgap_ppm",
        when(col("t_col") > 0,
          expr("""CAST(floor(CAST(abs(__m_col - t_col) AS DOUBLE)
                  * 1000000 / t_col) AS BIGINT)""")).otherwise(lit(null)))
      .select("a", "b", "n_sample", "w", "fitted_n", "row_absgap_ppm",
        "col_absgap_ppm")
      .withColumnRenamed("w", "weight")
  }
}
