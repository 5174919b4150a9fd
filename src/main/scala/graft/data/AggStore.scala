package graft.data

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Exact incremental aggregation store — the deterministic twin of
  * [[SketchStore]]: per-day EXACT partial aggregates (count + DECIMAL sum
  * per group) written once per ingested day, reports over any date range
  * folding only the partial rows that range touches.
  *
  * Why DECIMAL: fixed-point sums are associative bit-for-bit, so
  * sum-of-daily-sums equals the one-pass sum exactly — the merge is
  * lossless, unlike re-summing doubles whose result depends on order. That
  * is what lets a report over N days read N·|groups| tiny rows instead of
  * rescanning history, with answers identical to the full recompute.
  *
  * The store is `partitionBy(day)` parquet, so a date-range report prunes
  * to exactly the partitions inside the range (PartitionFilters — the
  * q75/q59 disk-index discipline applied to aggregation state).
  */
object AggStore {

  private def partials(df: DataFrame, dateCol: String, groupCol: String,
                       valueCol: String): DataFrame =
    df.groupBy(to_date(col(dateCol)).as("day"), col(groupCol))
      .agg(count(lit(1)).cast("long").as("n_rows"),
        sum(col(valueCol).cast("decimal(38,6)")).as("sum_v"))

  /** Build the store (overwrite) from an initial corpus. */
  def writeDaily(df: DataFrame, dateCol: String, groupCol: String,
                 valueCol: String, path: String): Unit =
    partials(df, dateCol, groupCol, valueCol)
      .write.partitionBy("day").mode("overwrite").parquet(path)

  /** Append a delta's days — one partial-agg scan of the DELTA only. Days
    * may repeat across appends; reports fold duplicates correctly because
    * the partials are associative.
    */
  def appendDaily(df: DataFrame, dateCol: String, groupCol: String,
                  valueCol: String, path: String): Unit =
    partials(df, dateCol, groupCol, valueCol)
      .write.partitionBy("day").mode("append").parquet(path)

  /** Rewrite the append-accumulated store so every day partition holds ONE
    * data file (each append adds a file per touched day forever; listing
    * cost grows per append even though reports stay correct). Pure file
    * movement via [[graft.operators.PartitionCompaction]] — rows, schema,
    * and the partitionBy(day) pruning layout are unchanged, so reports are
    * bit-identical before and after. `nDays` = expected distinct days (one
    * rewrite task per partition). Returns (files before, files after).
    */
  def compactStore(spark: SparkSession, path: String, nDays: Int): (Long, Long) =
    graft.operators.PartitionCompaction.compact(spark, path, "day", nDays)

  /** Exact per-group report over [from, to] (inclusive date strings):
    * n_events, total, mean — identical to recomputing from raw rows, but
    * reading only the pruned partial partitions.
    */
  /** Retention enforcement: DROP day partitions strictly before `cutoff`
    * (inclusive keep) — pure partition-directory deletion, no rewrite of
    * surviving data, so reports over the kept range are bit-identical
    * before and after. The lifecycle triplet: append (grow), compact
    * (defragment), vacuum (forget). Returns (partitions before, after).
    */
  def vacuumBefore(spark: SparkSession, path: String,
                   cutoff: String): (Long, Long) = {
    import org.apache.hadoop.fs.Path
    val dest = new Path(path)
    val fs = dest.getFileSystem(spark.sessionState.newHadoopConf())
    require(fs.exists(dest), s"vacuumBefore: $path does not exist")
    val dayDirs = fs.listStatus(dest).filter(s =>
      s.isDirectory && s.getPath.getName.startsWith("day="))
    val cut = java.time.LocalDate.parse(cutoff)
    var dropped = 0L
    dayDirs.foreach { d =>
      val day = java.time.LocalDate.parse(
        d.getPath.getName.stripPrefix("day="))
      if (day.isBefore(cut)) { fs.delete(d.getPath, true); dropped += 1L }
    }
    (dayDirs.length.toLong, dayDirs.length.toLong - dropped)
  }

  /** Multi-granularity derivation: a WEEKLY report folded from the stored
    * DAILY partials — sum-of-daily-partials per week is bit-identical to a
    * direct weekly recompute (DECIMAL associativity again), so coarser
    * rollups (week/month/quarter) never re-read raw history; they fold the
    * same kilobyte partial rows the daily reports do.
    */
  def weeklyReport(spark: SparkSession, path: String,
                   groupCol: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(date_trunc("week", col("day")).cast("date").as("week"),
        col(groupCol))
      .agg(sum(col("n_rows")).cast("long").as("n_events"),
        sum(col("sum_v")).cast("double").as("total"))

  def report(spark: SparkSession, path: String, groupCol: String,
             from: String, to: String): DataFrame =
    spark.read.parquet(path)
      .filter(col("day") >= lit(from).cast("date") &&
        col("day") <= lit(to).cast("date"))
      .groupBy(groupCol)
      .agg(sum(col("n_rows")).cast("long").as("n_events"),
        sum(col("sum_v")).cast("double").as("total"),
        (sum(col("sum_v")).cast("double") /
          sum(col("n_rows")).cast("double")).as("mean"))
}
