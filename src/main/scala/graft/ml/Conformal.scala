package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Split-conformal prediction intervals — distribution-free ±q̂ bands around
  * ANY point predictor: q̂ is the ⌈(n+1)(1−α)⌉-th smallest calibration
  * residual, and the test-set coverage of pred ± q̂ is then ≥ 1−α in
  * expectation under exchangeability (Vovk et al.; the split/inductive
  * form — one calibration pass, no refitting).
  *
  * Everything is exact integer arithmetic on the caller's sub-unit scale:
  * residuals are |y_u − pred_u| longs, the rank k is exact ppm ceiling
  * arithmetic, q̂ is an order statistic read off the COLLAPSED residual
  * domain (counts + one cumulative window over distinct residual values —
  * the q245 boundedness argument), and coverage is an integer ppm floor.
  */
object Conformal {

  /** @param scored   rows with `splitCol` ∈ {calib, test} markers,
    *                 integer `yCol` and `predCol` in the same sub-unit
    * @param calibVal value of `splitCol` marking calibration rows
    * @param testVal  value of `splitCol` marking test rows
    * @param alphaPpm miscoverage level α in ppm (100000 = 90% intervals)
    * @return one row: `n_calib, n_test, k_rank, q_hat_u, coverage_ppm`
    *         (`q_hat_u` NULL when k exceeds n_calib — the interval is
    *         unbounded and coverage is trivially 10⁶)
    */
  def calibrate(scored: DataFrame, splitCol: String, yCol: String,
                predCol: String, calibVal: Int, testVal: Int,
                alphaPpm: Long): DataFrame = {
    require(alphaPpm > 0 && alphaPpm < 1000000L, s"alphaPpm=$alphaPpm")
    val withR = scored
      .filter(col(splitCol).isin(calibVal, testVal))
      .withColumn("__r", abs(col(yCol) - col(predCol)).cast("long"))
    // collapsed residual domain for the calibration order statistic
    val calibDom = withR.filter(col(splitCol) === calibVal)
      .groupBy("__r").agg(count(lit(1)).cast("long").as("cnt"))
    val cum = Window.orderBy("__r")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = calibDom
      .withColumn("__cum", sum("cnt").over(cum).cast("long"))
      .withColumn("__n_calib",
        sum("cnt").over(Window.partitionBy()).cast("long"))
      // k = ⌈(n+1)·(1−α)⌉ in exact ppm integer arithmetic
      .withColumn("__k",
        expr(s"""CAST(((__n_calib + 1) * ${1000000L - alphaPpm} + 999999)
                 div 1000000 AS BIGINT)"""))
    val qhat = ranked
      .agg(max("__n_calib").cast("long").as("n_calib"),
        max("__k").cast("long").as("k_rank"),
        min(when(col("__cum") >= col("__k"), col("__r")))
          .cast("long").as("q_hat_u"))
    val test = withR.filter(col(splitCol) === testVal)
      .select(col("__r"))
    test.crossJoin(broadcast(qhat)) // 1-row stat attach
      .agg(max("n_calib").as("n_calib"),
        count(lit(1)).cast("long").as("n_test"),
        max("k_rank").as("k_rank"),
        max("q_hat_u").as("q_hat_u"),
        sum(when(col("__r") <= coalesce(col("q_hat_u"),
          lit(Long.MaxValue)), 1L).otherwise(0L)).cast("long")
          .as("__covered"))
      .select(col("n_calib"), col("n_test"), col("k_rank"), col("q_hat_u"),
        expr("CAST(__covered * 1000000 div n_test AS BIGINT)")
          .as("coverage_ppm"))
  }
}
