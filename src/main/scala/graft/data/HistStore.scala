package graft.data

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Mergeable fixed-bin histogram store — percentile state as incremental
  * per-day partials, completing the store family: [[AggStore]] (exact
  * sums), [[SketchStore]] (approx distinct), HistStore (exact-to-bin-width
  * quantiles).
  *
  * The 100 TB problem: "p99 latency, any date range" via
  * `percentile_approx` re-scans every raw row per report, and its sketch
  * state is not exposed for reuse. With FIXED bin edges the per-day state
  * is just bin counts — integers, associative, mergeable bit-exactly — so
  * a range report folds |days|·|bins| tiny rows and the answer is EXACT to
  * the bin width (a deliberate, declared resolution, unlike an opaque
  * sketch error). Same layout discipline as AggStore: `partitionBy(day)`
  * parquet, deltas append, [[AggStore.compactStore]]'s machinery applies
  * unchanged (same day-partitioned shape).
  *
  * Bins: `bin = clamp(floor((value - lo) / width), 0, nBins - 1)` —
  * under/overflow collapse into the edge bins, so totals are preserved for
  * any input range.
  */
object HistStore {

  private def binned(df: DataFrame, dateCol: String, valueCol: String,
                     lo: Double, width: Double, nBins: Int,
                     groupCols: Seq[String] = Nil): DataFrame =
    df.filter(col(valueCol).isNotNull)
      .groupBy((Seq(to_date(col(dateCol)).as("day")) ++
        groupCols.map(col) :+
        least(greatest(floor((col(valueCol) - lo) / width), lit(0.0)),
          lit((nBins - 1).toDouble)).cast("int").as("bin")): _*)
      .agg(count(lit(1)).cast("long").as("n"))

  /** Build the store (overwrite) from an initial corpus. `groupCols` adds
    * report dimensions ("p99 by endpoint by day"): per-day state grows to
    * |groups|·|bins| rows — still kilobytes per day for real dimension
    * cardinalities, and reports fold only their pruned slice.
    */
  def writeDaily(df: DataFrame, dateCol: String, valueCol: String,
                 path: String, lo: Double, width: Double, nBins: Int,
                 groupCols: Seq[String] = Nil): Unit =
    binned(df, dateCol, valueCol, lo, width, nBins, groupCols)
      .write.partitionBy("day").mode("overwrite").parquet(path)

  /** Append a delta's days — one partial-agg scan of the DELTA only;
    * duplicate (day[, group], bin) rows fold in reports because counts are
    * associative.
    */
  def appendDaily(df: DataFrame, dateCol: String, valueCol: String,
                  path: String, lo: Double, width: Double, nBins: Int,
                  groupCols: Seq[String] = Nil): Unit =
    binned(df, dateCol, valueCol, lo, width, nBins, groupCols)
      .write.partitionBy("day").mode("append").parquet(path)

  /** Percentile report over [from, to]: for each requested percentile (in
    * ppm, e.g. 500000 = p50) the FIRST bin whose cumulative count reaches
    * `ceil(p * total)` — the exact order statistic's bin, by integer
    * arithmetic only. Reads only the pruned day partitions; the window
    * runs over |bins| rows. Emits (pct_ppm, bin, bin_lo, bin_hi, cum_n,
    * total_n).
    */
  def reportPercentiles(spark: SparkSession, path: String, from: String,
                        to: String, pctPpm: Seq[Int], lo: Double,
                        width: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val merged = spark.read.parquet(path)
      .filter(col("day") >= lit(from).cast("date") &&
        col("day") <= lit(to).cast("date"))
      .groupBy("bin").agg(sum(col("n")).cast("long").as("n"))
    val w = Window.orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = merged
      .withColumn("cum_n", sum(col("n")).over(w).cast("long"))
      .withColumn("total_n", sum(col("n")).over(
        Window.orderBy("bin").rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)).cast("long"))
    val pcts = pctPpm.toDF("pct_ppm")
    // rank = ceil(p * total / 1e6) via integral `div` (never a rounding
    // decimal cast)
    cum.crossJoin(broadcast(pcts))
      .withColumn("target", expr(
        "CAST((CAST(pct_ppm AS DECIMAL(38,0)) * total_n + 999999) div " +
          "1000000 AS BIGINT)"))
      .filter(col("cum_n") >= col("target") &&
        col("cum_n") - col("n") < col("target"))
      .select(col("pct_ppm"), col("bin"),
        (lit(lo) + col("bin") * width).as("bin_lo"),
        (lit(lo) + (col("bin") + 1) * width).as("bin_hi"),
        col("cum_n"), col("total_n"))
  }

  /** Grouped percentile report over a store written with `groupCols`
    * ("p99 by endpoint, any date range"): same integer order-statistic
    * arithmetic as [[reportPercentiles]], with the cumulative pass
    * PARTITIONED by group — every window input is |groups|·|bins| rows
    * folded from the pruned day partitions, never corpus-sized. Emits one
    * row per (group, percentile).
    */
  def reportPercentilesGrouped(spark: SparkSession, path: String,
                               from: String, to: String, pctPpm: Seq[Int],
                               lo: Double, width: Double,
                               groupCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    require(groupCols.nonEmpty,
      "use reportPercentiles for the ungrouped store")
    val g = groupCols.map(col)
    val merged = spark.read.parquet(path)
      .filter(col("day") >= lit(from).cast("date") &&
        col("day") <= lit(to).cast("date"))
      .groupBy((g :+ col("bin")): _*).agg(sum(col("n")).cast("long").as("n"))
    val w = Window.partitionBy(g: _*).orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wt = Window.partitionBy(g: _*)
    val cum = merged
      .withColumn("cum_n", sum(col("n")).over(w).cast("long"))
      .withColumn("total_n", sum(col("n")).over(wt).cast("long"))
    val pcts = pctPpm.toDF("pct_ppm")
    cum.crossJoin(broadcast(pcts))
      .withColumn("target", expr(
        "CAST((CAST(pct_ppm AS DECIMAL(38,0)) * total_n + 999999) div " +
          "1000000 AS BIGINT)"))
      .filter(col("cum_n") >= col("target") &&
        col("cum_n") - col("n") < col("target"))
      .select((g ++ Seq(col("pct_ppm"), col("bin"),
        (lit(lo) + col("bin") * width).as("bin_lo"),
        (lit(lo) + (col("bin") + 1) * width).as("bin_hi"),
        col("cum_n"), col("total_n"))): _*)
  }
}
