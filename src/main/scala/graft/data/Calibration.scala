package graft.data

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Isotonic (monotone non-decreasing) score calibration via
  * pool-adjacent-violators — the map from raw scores to probabilities a
  * reliability diagram (q259) motivates.
  *
  * No iterative pooling loop: the PAV fit at bin i equals
  * max_{j≤i} min_{k≥i} avg(y over bins j..k) — the minimax characterization
  * of isotonic regression (Barlow, Bartholomew, Bremner & Brunk, *Statistical
  * Inference under Order Restrictions*, 1972). Prefix sums over the ordered
  * bin domain give every interval average, a per-j suffix-min window gives
  * the inner min, one grouped max gives the fit.
  *
  * Scale shape: everything past the caller's first aggregation runs on the
  * COLLAPSED bin domain — the interval square is |bins|², never rows², so a
  * 50-bin calibration is a ~1250-row join at ANY corpus size. Interval
  * averages are exact-integer ratios cast to double with one fixed op
  * sequence, so the fit is engine-reproducible bit-for-bit.
  */
object Calibration {

  /** PAV fit over ordered bins `(b, n, n_pos)` (bin key, row count,
    * positive count). Output: (bin, n, n_pos, rate_ppm, iso_fit) — the raw
    * per-bin rate as exact integer ppm beside the monotone fitted
    * probability. `iso_fit` is non-decreasing in `bin` by construction.
    */
  def pavFit(bins: DataFrame): DataFrame = {
    val wc = Window.orderBy("b")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pre = bins
      .withColumn("pn", sum("n").over(wc).cast("long"))
      .withColumn("pp", sum("n_pos").over(wc).cast("long"))
    val j = pre.select(col("b").as("jb"), col("n").as("nj"),
      col("n_pos").as("pj"), col("pn").as("pnj"), col("pp").as("ppj"))
    val k = pre.select(col("b").as("kb"), col("pn").as("pnk"),
      col("pp").as("ppk"))
    // avg over bins j..k = (Pp_k − Pp_{j−1}) / (Pn_k − Pn_{j−1})
    val a = j.join(k, col("jb") <= col("kb"))
      .select(col("jb"), col("kb"),
        ((col("ppk") - col("ppj") + col("pj")).cast("double") /
         (col("pnk") - col("pnj") + col("nj")).cast("double")).as("avg_jk"))
    val wSuf = Window.partitionBy("jb").orderBy(col("kb").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fit = a.withColumn("m", min("avg_jk").over(wSuf))
      .groupBy(col("kb").as("b"))
      .agg(max("m").as("iso_fit"))
    bins.join(fit, "b")
      .select(col("b").as("bin"), col("n"), col("n_pos"),
        expr("CAST(n_pos * 1000000 div n AS BIGINT)").as("rate_ppm"),
        col("iso_fit"))
  }

  /** [[pavFit]] per segment: one independent monotone fit per `groupCols`
    * key from bins `(groupCols…, b, n, n_pos)` — per-cohort / per-language
    * calibration in ONE plan. Every window and join partitions by the
    * group, so segments scale the parallelism while each segment's
    * interval square stays |its bins|²; no segment ever rides a global
    * sort.
    */
  def pavFitGrouped(bins: DataFrame, groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "use pavFit for the ungrouped form")
    val g = groupCols.map(col)
    val wc = Window.partitionBy(g: _*).orderBy("b")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pre = bins
      .withColumn("pn", sum("n").over(wc).cast("long"))
      .withColumn("pp", sum("n_pos").over(wc).cast("long"))
    val j = pre.select((g :+ col("b").as("jb")) ++ Seq(col("n").as("nj"),
      col("n_pos").as("pj"), col("pn").as("pnj"), col("pp").as("ppj")): _*)
    val k = pre.select((g :+ col("b").as("kb")) ++ Seq(col("pn").as("pnk"),
      col("pp").as("ppk")): _*)
    val a = j.join(k, groupCols).filter(col("jb") <= col("kb"))
      .select((g ++ Seq(col("jb"), col("kb"),
        ((col("ppk") - col("ppj") + col("pj")).cast("double") /
         (col("pnk") - col("pnj") + col("nj")).cast("double"))
          .as("avg_jk"))): _*)
    val wSuf = Window.partitionBy((g :+ col("jb")): _*)
      .orderBy(col("kb").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fit = a.withColumn("m", min("avg_jk").over(wSuf))
      .groupBy((g :+ col("kb").as("b")): _*)
      .agg(max("m").as("iso_fit"))
    bins.join(fit, groupCols :+ "b")
      .select((g ++ Seq(col("b").as("bin"), col("n"), col("n_pos"),
        expr("CAST(n_pos * 1000000 div n AS BIGINT)").as("rate_ppm"),
        col("iso_fit"))): _*)
  }
}
