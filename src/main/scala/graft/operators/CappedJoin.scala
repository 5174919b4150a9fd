package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fan-out-capped equi-join — the ENFORCEMENT twin of the q166 pre-flight
  * report: join `left` to at most `maxPerKey` right rows per key, selected
  * by a caller-supplied deterministic total order, so one hot key degrades
  * to a bounded, auditable truncation instead of an executor-killing
  * quadratic blow-up. The production shape for "attach up to N context rows
  * per entity" joins (top-N docs per query, last-N events per user, N
  * candidates per name) where the UNCAPPED fan-out is unknown at plan time.
  *
  * Plan: one window over the right side computes the per-key rank — the
  * same key shuffle the equi-join needs anyway, so under AQE the capped
  * side arrives at the join already partitioned; the cap then bounds the
  * join's output to |left| * maxPerKey regardless of the key distribution.
  * The dropped volume is never silent: [[overflowReport]] lists every
  * truncated key with exact kept/dropped counts (the no-silent-caps rule).
  */
object CappedJoin {

  /** Inner equi-join on `keys` keeping at most `maxPerKey` right rows per
    * key by `orderBy` (must be a total order within a key for deterministic
    * results). The kept right row's rank (1-based) rides along as
    * `join_rank`.
    */
  def cappedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 orderBy: Seq[Column], maxPerKey: Int): DataFrame = {
    require(maxPerKey > 0, s"maxPerKey must be positive, got $maxPerKey")
    require(orderBy.nonEmpty, "cap selection needs a deterministic order")
    require(!right.columns.contains("join_rank") && !left.columns.contains("join_rank"),
      "join_rank is the operator's output column — rename the input's")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderBy: _*)
    val capped = right.withColumn("join_rank", row_number().over(w).cast("int"))
      .filter(col("join_rank") <= maxPerKey)
    left.join(capped, keys)
  }

  /** Exact truncation audit: every key whose right-side fan-out exceeds the
    * cap, with kept/dropped counts — one hash agg, emit alongside the
    * capped join so the cut is a report row, not a silent loss.
    */
  def overflowReport(right: DataFrame, keys: Seq[String],
                     maxPerKey: Int): DataFrame = {
    require(maxPerKey > 0, s"maxPerKey must be positive, got $maxPerKey")
    right.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).cast("long").as("n_right"))
      .filter(col("n_right") > maxPerKey)
      .select(keys.map(col) :+
        col("n_right") :+
        lit(maxPerKey.toLong).as("n_kept") :+
        (col("n_right") - maxPerKey).cast("long").as("n_dropped"): _*)
  }
}
