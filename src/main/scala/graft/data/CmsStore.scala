package graft.data

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Count-min sketch store — point-frequency estimation as incremental state,
  * completing the mergeable-store family: [[SketchStore]] answers "how many
  * DISTINCT keys", [[HistStore]] "what quantile", this one "how often is
  * key k" — without ever rescanning history or shuffling the key space.
  *
  * The sketch is stored RELATIONALLY: one row per (day, row_i, col_j) counter
  * cell that is non-zero — at most depth × width rows per day (kilobytes),
  * partitioned by day. That keeps every operation a plain Spark plan:
  *  - ingest: d hash projections + one (day, slot) hash agg, map-side
  *    combined — each input row touches exactly `depth` cells;
  *  - merge across days/appends: groupBy(slot) sum — count-min is LINEAR,
  *    so merged counters are bit-identical to a single-pass build (the
  *    property the unit suite pins);
  *  - point estimate: probe `depth` cells per key, take the min — a
  *    broadcast-sized join against the merged counter table.
  *
  * Guarantee carried to the gate query (q183): the estimate NEVER
  * underestimates (each of the d counters holds the key's true count plus
  * non-negative collision mass), and overshoot is bounded by total mass.
  * Hashes are md5-slice mod width — seeded by row index, engine-replayable.
  */
object CmsStore {

  /** Cell coordinates for `key` in hash row `i`: md5("i|key") mod width. */
  private def slot(i: Int, key: Column, width: Int): Column =
    pmod(conv(substring(md5(concat(lit(s"$i|"), key.cast("string"))
      .cast("binary")), 1, 12), 16, 10).cast("long"), lit(width.toLong))
      .cast("int")

  /** Ingest one batch: per day, add every key's `depth` cells. Append-only —
    * merging appended rows with the prior state is exact (linearity).
    */
  def appendDaily(df: DataFrame, dateCol: String, keyCol: String,
                  path: String, depth: Int = 4, width: Int = 256,
                  overwrite: Boolean = false): Unit = {
    val cells = (0 until depth).map { i =>
      df.select(to_date(col(dateCol)).as("day"),
        lit(i).as("row_i"), slot(i, col(keyCol), width).as("col_j"))
    }.reduce(_ unionByName _)
    cells.groupBy("day", "row_i", "col_j")
      .agg(count(lit(1)).cast("long").as("cnt"))
      .write.mode(if (overwrite) "overwrite" else "append")
      .partitionBy("day").parquet(path)
  }

  /** The merged counter table over the whole store (or a day range):
    * depth × width rows max, whatever mix of writes and appends produced it.
    */
  def mergedCounters(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
      .groupBy("row_i", "col_j")
      .agg(sum(col("cnt")).cast("long").as("cnt"))

  /** Point estimates for every key in `keys` (one column named `key`):
    * min over the key's `depth` cells. The counter table is tiny —
    * broadcast it, keys stream map-side.
    */
  def estimate(keys: DataFrame, counters: DataFrame,
               depth: Int = 4, width: Int = 256): DataFrame = {
    val probes = (0 until depth).map { i =>
      keys.select(col("key"), lit(i).as("row_i"),
        slot(i, col("key"), width).as("col_j"))
    }.reduce(_ unionByName _)
    probes.join(broadcast(counters), Seq("row_i", "col_j"), "left")
      .groupBy("key")
      // a missing cell means zero collisions AND zero occurrences
      .agg(min(coalesce(col("cnt"), lit(0L))).cast("long").as("est"))
  }

  /** Compact append-accumulated day partitions: pre-merge each day's cells
    * (exact — linearity again) and rewrite one file per day via the shared
    * rename-swap. Returns (files before, files after).
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
      .groupBy("day", "row_i", "col_j")
      .agg(sum(col("cnt")).cast("long").as("cnt"))
      .repartition(1)
      .write.mode("overwrite").partitionBy("day").parquet(tmp.toString)
    PartitionCompaction.swapIntoPlace(fs, dest, tmp,
      new Path(path + "__pre_compact"))
    (before, PartitionCompaction.dataFileCount(fs, dest))
  }

  /** In-memory CMS counter table `(row_i, col_j, cnt)` for one relation's
    * key column — the sketch side of join-size estimation. ONE pass over
    * the data: each row explodes into its `depth` cells (appendDaily's
    * union-of-projections shape would re-scan the input `depth` times; an
    * in-flight estimate cannot afford that), then a depth×width-bounded
    * hash aggregate. Same [[slot]] hash as the store, so a persisted CMS
    * and an in-flight one are interchangeable.
    */
  def countersFor(df: DataFrame, keyCol: String,
                  depth: Int = 4, width: Int = 256): DataFrame = {
    val cells = array((0 until depth).map { i =>
      struct(lit(i).as("row_i"), slot(i, col(keyCol), width).as("col_j"))
    }: _*)
    df.select(explode(cells).as("cell"))
      .groupBy(col("cell.row_i").as("row_i"), col("cell.col_j").as("col_j"))
      .agg(count(lit(1)).cast("long").as("cnt"))
  }

  /** Join-cardinality estimate from two CMS counter tables over the SAME
    * (depth, width, hash) configuration: |A ⋈ B| = Σ_k cA(k)·cB(k) is
    * estimated by min over hash rows of the bucket-count inner product
    * (the classic CMS inner-product estimator; Cormode & Muthukrishnan,
    * J. Algorithms 2005). Never underestimates — every bucket product
    * carries the true mass plus non-negative collision cross-terms — and
    * each side is read ONCE to build a depth×width integer table, so the
    * planner learns the join's output size without shuffling either fact
    * relation. One row: (est) in DECIMAL(38,0) → BIGINT.
    */
  def joinSizeEstimate(countersA: DataFrame, countersB: DataFrame): DataFrame = {
    countersA.join(countersB.withColumnRenamed("cnt", "cnt_b"),
        Seq("row_i", "col_j"))
      .groupBy("row_i")
      .agg(sum(col("cnt").cast("decimal(38,0)") * col("cnt_b"))
        .cast("decimal(38,0)").as("dot"))
      .agg(min(col("dot")).cast("long").as("est_rows"))
  }
}
