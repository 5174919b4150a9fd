package graft.data

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift monitoring between a baseline slice and a current
  * slice of the same table — the check a training pipeline runs before
  * trusting this week's data against last week's, and the standard gate on
  * feature drift in scoring pipelines.
  *
  * Metric: Population Stability Index over baseline-derived quantile bins,
  * psi = Σ (p_base − p_curr) · ln(p_base / p_curr). Common practice reads
  * psi < 0.1 as stable, 0.1–0.25 as moderate drift, > 0.25 as action
  * (Siddiqi, "Credit Risk Scorecards", 2006 — the metric's origin).
  *
  * Shape: ONE exact-percentile aggregation over the baseline produces the
  * n−1 bin edges as a single array row (broadcast — bins are a constant);
  * bin assignment is a map-side fold over that array (no per-row join, no
  * width_bucket UDF); then one hash agg on bin and a 1-row totals broadcast.
  * Nothing corpus-sized crosses the cluster twice. `exact = false` is the
  * 100 TB path: bin edges from percentile_approx (the q97 trade, mergeable
  * sketch state) — the filter/agg side is unchanged.
  */
object Drift {

  /** Per-bin PSI report: bin, counts, proportions, and the bin's PSI
    * contribution (NULL for bins empty on either side — no epsilon fudge;
    * callers sum non-null contributions). Bin k holds values in
    * (edge_k−1, edge_k]; bin 0 is everything ≤ the first edge, bin n−1
    * everything above the last. NULL values are excluded from both slices.
    */
  def psiReport(df: DataFrame, valueCol: String, isBaseline: Column,
                nBins: Int = 10, exact: Boolean = true): DataFrame = {
    require(nBins >= 2, s"need at least 2 bins, got $nBins")
    Seq("__edges", "__bin", "__base").foreach { c =>
      require(!df.columns.contains(c),
        s"input must not use the operator's reserved $c column name")
    }
    val qs = array((1 until nBins).map(k => lit(k.toDouble / nBins)): _*)
    val src = df.filter(col(valueCol).isNotNull)
      .withColumn("__base", isBaseline)
    val edgeAgg =
      if (exact) percentile(col(valueCol), qs)
      else percentile_approx(col(valueCol), qs, lit(10000))
    val edges = src.filter(col("__base")).agg(edgeAgg.as("__edges"))
    val binned = src.crossJoin(broadcast(edges))
      .withColumn("__bin", aggregate(col("__edges"), lit(0),
        (acc, e) => acc + when(col(valueCol) > e, 1).otherwise(0)))
    val counts = binned.groupBy("__bin").agg(
      sum(when(col("__base"), 1L).otherwise(0L)).as("n_base"),
      sum(when(col("__base"), 0L).otherwise(1L)).as("n_curr"))
    // totals fold the (<= nBins)-row counts relation — every src row lands
    // in exactly one bin, so this equals a third scan of src without paying
    // for one
    val totals = counts.agg(
      sum(col("n_base")).cast("double").as("__tb"),
      sum(col("n_curr")).cast("double").as("__tc"))
    val pBase = col("n_base").cast("double") / col("__tb")
    val pCurr = col("n_curr").cast("double") / col("__tc")
    counts.crossJoin(broadcast(totals))
      .select(col("__bin").as("bin"), col("n_base"), col("n_curr"),
        pBase.as("p_base"), pCurr.as("p_curr"),
        when(col("n_base") > 0 && col("n_curr") > 0,
          round((pBase - pCurr) * log(pBase / pCurr), 9)).as("psi_contrib"))
  }

  /** Fixed-bin PSI from a pre-binned counts relation `(bin, n_base,
    * n_curr)` — the [[graft.data.HistStore]]-backed drift monitor: bins are
    * the store's declared edges (the standard scorecard practice) rather
    * than baseline quantiles, and the report folds |days|·|bins| integer
    * partials instead of re-scanning raw rows. Same per-bin output and
    * NULL-contribution contract as [[psiReport]]; at 100 TB this is the
    * difference between a weekly drift report that reads kilobytes and one
    * that re-reads two weeks of corpus.
    */
  def psiFromCounts(counts: DataFrame): DataFrame = {
    val totals = counts.agg(
      sum(col("n_base")).cast("double").as("__tb"),
      sum(col("n_curr")).cast("double").as("__tc"))
    val pBase = col("n_base").cast("double") / col("__tb")
    val pCurr = col("n_curr").cast("double") / col("__tc")
    counts.crossJoin(broadcast(totals))
      .select(col("bin"), col("n_base"), col("n_curr"),
        pBase.as("p_base"), pCurr.as("p_curr"),
        when(col("n_base") > 0 && col("n_curr") > 0,
          round((pBase - pCurr) * log(pBase / pCurr), 9)).as("psi_contrib"))
  }
}
