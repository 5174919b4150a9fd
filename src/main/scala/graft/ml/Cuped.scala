package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CUPED variance-reduced A/B effect estimate (Deng, Xu, Kohavi &
  * Walker, WSDM 2013) — the experimentation readout a training-data
  * platform runs on every pipeline change: adjust each unit's outcome y
  * by its PRE-period covariate x (θ the pooled regression slope), which
  * removes the between-unit variance x explains without biasing the
  * treatment contrast:
  *
  *   θ = Cov(x, y) / Var(x)            (pooled across both arms)
  *   Δ_adj = (ȳ_t − ȳ_c) − θ·(x̄_t − x̄_c)
  *
  * Exact-integer oracle discipline: inputs are integer micro-units, all
  * five moments (n, Σx, Σy, Σx², Σxy) exact DECIMAL(38,0) sums from ONE
  * hash aggregation over the per-unit frame, C = nΣxy − ΣxΣy and
  * V = nΣx² − (Σx)² exact, and the two emitted quotients are sign-split
  * floors by exact MULTI-LIMB long division (the hoeffding recipe —
  * C·10⁹ and the adjusted numerator ·10⁶ would pass 10³⁸):
  *   theta_q9  = sgn(C)·⌊|C|·10⁹ / V⌋         (0 when V = 0, declared)
  *   diff_x1e6 = sgn·⌊|Δy_num|·10⁶ / (n_t·n_c)⌋
  *   adj_x1e6  = sgn·⌊|Δy_num·10⁹ − θ_q9·Δx_num|·10⁶ / (n_t·n_c·10⁹)⌋
  * where Δy_num = Σy_t·n_c − Σy_c·n_t (and likewise Δx_num) — i.e. the
  * adjusted estimate replays the QUANTIZED θ (the one documented
  * quantization, quantize-once discipline). NULL estimates when either
  * arm is empty.
  *
  * Loud bounds: |θ| ≥ 10⁶ (a pre-period covariate 10⁶× steeper than
  * the outcome is a pipeline bug); n·Σx², n·Σ|xy| ≥ 10²⁹ (the
  * DECIMAL(38,0) exactness envelope for the limb products); and on the
  * derived numerators |Δy_num| ≥ 10²⁸ (multiplied by 10⁹ below) and
  * |Δx_num| ≥ 10²² (multiplied by θ_q9 < 10¹⁵ below) — every product
  * that reaches DECIMAL(38,0) is provably under 10³⁷, so the silent
  * non-ANSI NULL / DuckDB-error divergence past 10³⁸ is unreachable.
  * All raise with a pre-scale pointer.
  *
  * @param perUnit one row per unit: `treatCol` boolean,
  *                `xCol`/`yCol` integral micro-unit totals
  * @return one row: `n_units, n_t, n_c, theta_q9, diff_x1e6, adj_x1e6`
  */
object Cuped {

  private val D38 = "decimal(38,0)"

  def estimate(perUnit: DataFrame, treatCol: String, xCol: String,
               yCol: String): DataFrame =
    estimateGrouped(perUnit, Nil, treatCol, xCol, yCol)

  /** [[estimate]] per segment — one θ and one adjusted lift PER GROUP
    * KEY (the heterogeneous-treatment-effect report form): every sum is
    * one grouped hash aggregation, the limb arithmetic rides each row of
    * the collapsed per-segment frame. Same bounds and NULL semantics,
    * enforced per segment.
    */
  def estimateGrouped(perUnit: DataFrame, groupCols: Seq[String],
                      treatCol: String, xCol: String,
                      yCol: String): DataFrame = {
    val x = col(xCol).cast(D38)
    val y = col(yCol).cast(D38)
    val t = col(treatCol)
    val agg = perUnit.groupBy(groupCols.map(col): _*).agg(
      count(lit(1)).cast("long").as("n_units"),
      sum(when(t, 1L).otherwise(0L)).cast("long").as("n_t"),
      sum(when(t, 0L).otherwise(1L)).cast("long").as("n_c"),
      sum(x).cast(D38).as("__sx"),
      sum(y).cast(D38).as("__sy"),
      sum(x * x).cast(D38).as("__sxx"),
      sum(x * y).cast(D38).as("__sxy"),
      sum(abs(x * y)).cast(D38).as("__saxy"),
      sum(when(t, x).otherwise(lit(0).cast(D38))).cast(D38).as("__sxt"),
      sum(when(t, y).otherwise(lit(0).cast(D38))).cast(D38).as("__syt"))
    agg
      .withColumn("__c",
        when(expr(s"""CAST(n_units AS $D38) * __sxx >=
                      CAST('100000000000000000000000000000' AS $D38)""") ||
          expr(s"""CAST(n_units AS $D38) * __saxy >=
                   CAST('100000000000000000000000000000' AS $D38)"""),
          raise_error(lit("cuped: moment products exceed the " +
            "exact-arithmetic bound 1e29 - pre-scale the unit sums")))
          .otherwise(expr(
            s"CAST(n_units AS $D38) * __sxy - __sx * __sy")).cast(D38))
      .withColumn("__v",
        expr(s"CAST(n_units AS $D38) * __sxx - __sx * __sx"))
      // theta_q9 by three-limb division: |C| div V, then two decimal
      // limbs of 10^5 and 10^4 (|C|·10⁹ would pass 10³⁸)
      .withColumn("__q0",
        when(col("__v") > 0, expr("CAST(abs(__c) div __v AS BIGINT)"))
          .otherwise(lit(0L)))
      .withColumn("__q0",
        when(col("__q0") >= 1000000L,
          raise_error(concat(lit("cuped: |theta| = "), col("__q0"),
            lit(" exceeds the declared bound 1e6 - check unit scaling"))))
          .otherwise(col("__q0")))
      .withColumn("__r0",
        when(col("__v") > 0,
          expr(s"CAST(abs(__c) - __q0 * __v AS $D38)"))
          .otherwise(lit(0).cast(D38)))
      .withColumn("__q1",
        when(col("__v") > 0,
          expr("CAST((__r0 * 100000) div __v AS BIGINT)"))
          .otherwise(lit(0L)))
      .withColumn("__q2",
        when(col("__v") > 0,
          expr(s"""CAST(((__r0 * 100000 - __q1 * __v) * 10000) div __v
                   AS BIGINT)"""))
          .otherwise(lit(0L)))
      .withColumn("theta_q9",
        (when(col("__c") >= 0, lit(1L)).otherwise(lit(-1L))) *
          (col("__q0") * 1000000000L + col("__q1") * 10000L + col("__q2")))
      // y-side / cross-term loud bounds (the x-side 1e29 moment guard
      // does NOT cover these): __dyn is multiplied by 10⁹ below, so
      // |__dyn| < 10²⁸ keeps that product under 10³⁷; __dxn is
      // multiplied by theta_q9 (< 10¹⁵ by the |theta| < 10⁶ guard), so
      // |__dxn| < 10²² keeps that product under 10³⁷. Outside either
      // envelope non-ANSI Spark would silently NULL while the DuckDB
      // HUGEINT oracle errors — the exact divergence class the KW/JT
      // digit-string fixes closed; fail loudly instead.
      .withColumn("__dyn",
        expr(s"CAST(__syt * n_c - (__sy - __syt) * n_t AS $D38)"))
      .withColumn("__dyn",
        when(expr(s"abs(__dyn) >= CAST('1" + "0" * 28 + s"' AS $D38)"),
          raise_error(lit("cuped: |dy_num| exceeds the exact-arithmetic " +
            "bound 1e28 - pre-scale the outcome sums")).cast(D38))
          .otherwise(col("__dyn")))
      .withColumn("__dxn",
        expr(s"CAST(__sxt * n_c - (__sx - __sxt) * n_t AS $D38)"))
      .withColumn("__dxn",
        when(expr(s"abs(__dxn) >= CAST('1" + "0" * 22 + s"' AS $D38)"),
          raise_error(lit("cuped: |dx_num| exceeds the theta-product " +
            "exact-arithmetic bound 1e22 - pre-scale the covariate sums"))
            .cast(D38))
          .otherwise(col("__dxn")))
      .withColumn("__den",
        when(col("n_t") > 0 && col("n_c") > 0,
          expr(s"CAST(n_t AS $D38) * n_c")).otherwise(lit(1).cast(D38)))
      // two-limb here as well: the integer part of |Δȳ| is mean-scale
      // (fits a long) even when |Δy_num|·10⁶ would not
      .withColumn("__qd", expr("CAST(abs(__dyn) div __den AS BIGINT)"))
      .withColumn("diff_x1e6",
        when(col("n_t") > 0 && col("n_c") > 0,
          (when(col("__dyn") >= 0, lit(1L)).otherwise(lit(-1L))) *
            (col("__qd") * 1000000L +
              expr(s"""CAST((abs(__dyn) - __qd * __den) * 1000000
                       div __den AS BIGINT)""")))
          .otherwise(lit(null).cast("long")))
      // adjusted numerator replays the QUANTIZED theta; its ·10⁶ floor
      // comes out by a two-limb division against den·10⁹
      .withColumn("__a",
        expr(s"""CAST(__dyn * 1000000000 - CAST(theta_q9 AS $D38) * __dxn
                 AS $D38)"""))
      .withColumn("__den9", expr(s"CAST(__den * 1000000000 AS $D38)"))
      .withColumn("__qa",
        when(col("n_t") > 0 && col("n_c") > 0,
          expr("CAST(abs(__a) div __den9 AS BIGINT)"))
          .otherwise(lit(0L)))
      .withColumn("adj_x1e6",
        when(col("n_t") > 0 && col("n_c") > 0,
          (when(col("__a") >= 0, lit(1L)).otherwise(lit(-1L))) *
            (col("__qa") * 1000000L +
              expr(s"""CAST((abs(__a) - __qa * __den9) * 1000000
                       div __den9 AS BIGINT)""")))
          .otherwise(lit(null).cast("long")))
      .select((groupCols.map(col) ++ Seq(col("n_units"), col("n_t"),
        col("n_c"), col("theta_q9"), col("diff_x1e6"),
        col("adj_x1e6"))): _*)
  }
}
