package graft.data

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Mergeable-sketch store — distinct counting as incremental state.
  *
  * The 100 TB problem: "distinct users, all time" is a full shuffle of every
  * key ever seen, re-paid on every report. The mergeable-state pattern
  * pre-aggregates each partition (day) into an HLL sketch ONCE — kilobytes
  * per day regardless of row count — and every later report is a merge of
  * sketches: no rescan of history, no key shuffle, and a new day is just one
  * more sketch row appended. Same recipe as the BM25/IVF index appends
  * (`Bm25.appendToIndex`, `Knn.ivfAppendToIndex`): state lives in parquet,
  * deltas append, reads merge.
  *
  * Sketches are Datasketches HLL via Spark's native `hll_sketch_agg` /
  * `hll_union_agg` (codegen'd aggregates, binary-stable layout). Union of
  * per-day sketches covers the same register state as one pass over the
  * union of days — estimates stay within HLL's rsd bound either way (the
  * union path drops the HIP estimator, so the two estimates may differ
  * inside the bound; neither is privileged).
  */
object SketchStore {

  /** Aggregate one HLL sketch (and an exact row count) per `dateCol` day of
    * `keyCol`, appended to the parquet store at `path` — call once per
    * ingested day; `overwrite = true` rebuilds the whole store.
    */
  def writeDailySketches(df: DataFrame, dateCol: String, keyCol: String,
      path: String, lgK: Int = 12, overwrite: Boolean = false): Unit =
    df.groupBy(to_date(col(dateCol)).as("day"))
      .agg(hll_sketch_agg(col(keyCol), lgK).as("sketch"),
        count(col(keyCol)).cast("long").as("n_rows"))
      .write.mode(if (overwrite) "overwrite" else "append").parquet(path)

  /** Merge every stored daily sketch into one distinct estimate — reads
    * kilobytes per day, shuffles nothing but sketches.
    */
  def mergedEstimate(spark: SparkSession, path: String): Long =
    spark.read.parquet(path)
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch"))).as("est"))
      .head().getLong(0)

  /** Rolling-window distinct estimates from the STORED daily sketches: for
    * every day present in the store, the HLL union of the trailing
    * `windowDays` days' sketches — rolling distinct counts with NO rescan of
    * raw history, the question ("7-day active users, every day") that is
    * unanswerable by prefix sums because distinct is not subtractable.
    * Fan-out is windowDays × kilobyte sketch rows; union is register-wise
    * max, so estimates are deterministic for a given store regardless of
    * append history or partitioning.
    */
  def rollingEstimate(spark: SparkSession, path: String,
                      windowDays: Int): DataFrame = {
    val daily = spark.read.parquet(path)
    val covers = daily.select(col("day"), col("sketch"),
        explode(sequence(lit(0), lit(windowDays - 1))).as("k"))
      .select(col("day"), date_add(col("day"), col("k")).as("cover_day"),
        col("sketch"))
    // only report days the store actually has (a ragged future tail would
    // otherwise surface as partial windows beyond the data)
    covers
      .join(daily.select(col("day").as("cover_day")).distinct(), "cover_day")
      .groupBy("cover_day")
      .agg(countDistinct(col("day")).cast("long").as("n_days_in_window"),
        hll_sketch_estimate(hll_union_agg(col("sketch"))).as("est"))
      .withColumnRenamed("cover_day", "day")
  }

  /** Compact the append-accumulated store: pre-union each day's sketch rows
    * into ONE row (HLL union is register-wise max — associative, so the
    * merged register state, hence every later estimate, is identical to
    * merging the uncompacted rows) and rewrite the whole store as one file
    * via the shared rename-swap. A store that ingests for years stays
    * one-row-per-day / one-file however many appends it took. Returns
    * (files before, files after).
    */
  def compactStore(spark: SparkSession, path: String): (Long, Long) = {
    import org.apache.hadoop.fs.Path
    import graft.operators.PartitionCompaction
    val dest = new Path(path)
    val fs = dest.getFileSystem(spark.sessionState.newHadoopConf())
    require(fs.exists(dest), s"compactStore: $path does not exist")
    val before = PartitionCompaction.dataFileCount(fs, dest)
    val tmp = new Path(path + "__compact_tmp")
    fs.delete(tmp, true)
    spark.read.parquet(path)
      .groupBy("day")
      .agg(hll_union_agg(col("sketch")).as("sketch"),
        sum(col("n_rows")).cast("long").as("n_rows"))
      .repartition(1)
      .write.mode("overwrite").parquet(tmp.toString)
    PartitionCompaction.swapIntoPlace(fs, dest, tmp,
      new Path(path + "__pre_compact"))
    (before, PartitionCompaction.dataFileCount(fs, dest))
  }
}
