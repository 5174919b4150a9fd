package graft.data

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Range-sharded sorted export: the layout primitive behind a sorted,
  * range-partitioned parquet table — the physical design that lets a 100 TB
  * corpus serve range scans with partition pruning and feed sort-merge joins
  * without a shuffle.
  *
  * Spark's own `repartitionByRange` draws SAMPLED boundaries (different per
  * run, invisible to the reader); this operator derives them from exact
  * integer-floored quantiles instead, so the shard layout is deterministic,
  * the manifest is replayable by any SQL engine, and two exports of the same
  * data are byte-comparable. At 100 TB the one non-map-side step — the
  * grouped percentile — runs as `percentile_approx` instead
  * (`boundaries(exact = false)`): boundaries only need to balance shards,
  * not be exact order statistics, and everything downstream of the boundary
  * array is map-side either way.
  *
  * Flooring the boundaries to BIGINT does two jobs: shard assignment never
  * depends on the last ulp of an interpolated double (the engines'
  * interpolations could differ there), and the manifest columns are exact
  * integers.
  */
object RangeShard {

  /** The `nShards - 1` interior cut points: floor(quantile(i/n)) for
    * i in 1..n-1. One aggregate; the result is (nShards-1)-sized —
    * driver-bounded by construction. `exact = false` computes the cut
    * points with `percentile_approx` (accuracy 10000) — the 100 TB path:
    * one sketchable pass instead of a sort-based exact percentile, at the
    * cost of slightly unbalanced (never overlapping) shards.
    */
  def boundaries(df: DataFrame, valueCol: String, nShards: Int,
                 exact: Boolean = true): Array[Long] = {
    require(nShards >= 2, s"need at least 2 shards, got $nShards")
    val ps = array((1 until nShards).map(i => lit(i.toDouble / nShards)): _*)
    val q =
      if (exact) percentile(col(valueCol), ps)
      else percentile_approx(col(valueCol), ps, lit(10000))
    val row = df.agg(q.as("qs"))
      .select(transform(col("qs"), x => floor(x).cast("long")).as("bs"))
      .head()
    // percentile over zero (non-null) rows yields NULL — surface it as a
    // layout error instead of an opaque NPE deep in getSeq
    require(!row.isNullAt(0),
      s"RangeShard.boundaries: no non-null '$valueCol' values to shard")
    row.getSeq[Long](0).toArray
  }

  /** Map-side shard assignment: shard = #{boundaries strictly below the
    * value}. The boundary array is a literal folded into the projection —
    * no join, no broadcast variable, codegen-friendly. NULL values get the
    * dedicated shard -1 (a `NULL > b` comparison is never true, so they
    * would otherwise silently pool with the lowest range shard and corrupt
    * its manifest min/max).
    */
  def assign(df: DataFrame, valueCol: String, bounds: Array[Long]): DataFrame =
    df.withColumn("shard",
      when(col(valueCol).isNull, lit(-1)).otherwise(
        bounds.foldLeft(lit(0)) { (acc, b) =>
          acc + when(col(valueCol) > lit(b), 1).otherwise(0)
        }).cast("int"))

  /** Export `df` partitioned by range shard, each shard's file(s) sorted by
    * `valueCol`: `repartition($"shard")` co-locates a shard on one task,
    * `sortWithinPartitions` orders it, `partitionBy("shard")` prunes reads.
    * Returns the manifest (shard, n, min_v, max_v).
    */
  def writeSharded(df: DataFrame, valueCol: String, nShards: Int,
                   path: String): DataFrame = {
    val assigned = assign(df, valueCol, boundaries(df, valueCol, nShards))
    // sort by (shard, value): the partition column leads, so FileFormatWriter's
    // required ordering is already satisfied and it does NOT inject its own
    // (non-stable) sort — which would destroy the value order inside each file
    assigned
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col(valueCol))
      .write.mode("overwrite").partitionBy("shard").parquet(path)
    manifest(assigned.sparkSession.read.parquet(path), valueCol)
  }

  /** Shard manifest over an assigned frame: per-shard row count and value
    * bounds. Shard-count-sized output.
    */
  def manifest(assigned: DataFrame, valueCol: String): DataFrame =
    assigned.groupBy("shard")
      .agg(count(lit(1)).cast("long").as("n"),
        min(col(valueCol)).as("min_v"),
        max(col(valueCol)).as("max_v"))
}
