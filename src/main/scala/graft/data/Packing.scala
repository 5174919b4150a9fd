package graft.data

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: assign documents to fixed-token-budget training packs.
  *
  * Semantics are the standard "concatenate the stream, cut every `budget`
  * tokens" packing (documents may straddle a cut): a doc's `pack_id` is the
  * pack its FIRST token lands in and `pack_offset` is that token's position
  * within the pack. This is a pure prefix-sum over a deterministic document
  * order — no bin-packing search, no driver state — so the whole operator is
  * one windowed cumulative sum.
  *
  * Scale: the window is partitioned by `partCols` (e.g. language, or
  * language × shard), never global — each partition packs independently,
  * which is exactly what a multi-host training job wants (each data-parallel
  * reader owns whole packs). At 100 TB you add a shard column
  * (`pmod(hash(id), nShards)`) to `partCols` to bound any one window's sort;
  * packs then number `(shard, pack_id)` pairs.
  */
object Packing {

  def packSequences(df: DataFrame, tokenCol: String, orderCol: String,
                    partCols: Seq[String], budget: Int): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val w = Window.partitionBy(partCols.map(col): _*).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cumBefore = coalesce(sum(col(tokenCol)).over(w), lit(0L))
    df.withColumn("pack_id", floor(cumBefore / budget))
      .withColumn("pack_offset", cumBefore % budget)
  }
}
