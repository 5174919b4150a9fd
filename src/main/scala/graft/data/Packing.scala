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

  /** Deterministic shard assignment — the last mile of the training
    * pipeline: distribute rows (typically packed sequences) across `nShards`
    * output shards with exactly-balanced row counts (±1) and ~equal token
    * totals, as `shard = content-hash global rank mod nShards`. The md5
    * order is a fixed pseudo-random permutation of the keys, so round-robin
    * over it balances rows exactly, decorrelates token counts from shard id
    * (~equal token totals without any bin-packing search), and stays
    * layout-independent/retry-stable/engine-replayable — the [[Sampling]]
    * family's contract. The rank is [[graft.operators.GlobalRank]]'s
    * distributed sort + zipWithIndex, never a single-partition window.
    *
    * Contract: `keyCol` must be UNIQUE per row — it is the row's identity in
    * the (hash, key) total order; duplicate keys would tie, making their
    * relative rank (and possibly their shard) depend on partition layout,
    * exactly the nondeterminism this operator exists to avoid.
    */
  def assignShards(df: DataFrame, keyCol: String, nShards: Int,
                   salt: String = "graft"): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val h = md5(concat(lit(salt), col(keyCol).cast("string")).cast("binary"))
    graft.operators.GlobalRank
      .withGlobalRank(df.withColumn("__h", h), "__rank", Seq("__h", keyCol))
      .withColumn("shard", pmod(col("__rank"), lit(nShards.toLong)).cast("int"))
      .drop("__h", "__rank")
  }

  /** [[assignShards]] + `partitionBy(shard)` parquet sink: each
    * data-parallel trainer then reads exactly its own shard directory
    * (static partition pruning, the q69 read-back recipe).
    */
  def writeShards(df: DataFrame, keyCol: String, nShards: Int, path: String,
                  salt: String = "graft"): Unit =
    assignShards(df, keyCol, nShards, salt)
      .write.mode("overwrite").partitionBy("shard").parquet(path)
}
