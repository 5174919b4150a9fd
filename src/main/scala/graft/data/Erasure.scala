package graft.data

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Right-to-be-forgotten erasure propagation — the GDPR/CCPA batch job a
  * 100 TB pipeline runs on every deletion-request cycle: given a key list,
  * scrub every store that carries the key, and prove the scrub with an
  * INDEPENDENT audit (re-scan the scrubbed output for surviving keys)
  * rather than trusting the anti-join's construction.
  *
  * Scale shape: deletion lists are small (thousands against billions) — the
  * distinct key set is broadcast, so both the scrub anti-join and the audit
  * semi-join are map-side against each store's scan; no store is shuffled.
  * Each audited store costs two scans (flag-count + post-scrub recheck);
  * fold the scrub into the store's next compaction cycle to pay one.
  */
object Erasure {

  /** The store minus every row whose `keyCol` appears in `deleteKeys` —
    * broadcast left-anti, map-side.
    */
  def scrub(df: DataFrame, keyCol: String, deleteKeys: DataFrame): DataFrame =
    df.join(broadcast(deleteKeys.select(col(keyCol)).distinct()),
      Seq(keyCol), "left_anti")

  /** One audit row for one store: (store, n_before, n_deleted, n_after,
    * n_remaining_matching). `n_remaining_matching` is recomputed from the
    * SCRUBBED output — a machine-checked zero, not an assumption.
    */
  def auditRow(store: String, df: DataFrame, keyCol: String,
               deleteKeys: DataFrame): DataFrame = {
    val keys = deleteKeys.select(col(keyCol)).distinct()
    val flagged = df
      .join(broadcast(keys.withColumn("__del", lit(1))), Seq(keyCol), "left")
      .agg(count(lit(1)).cast("long").as("n_before"),
        sum(when(col("__del").isNotNull, 1L).otherwise(0L)).cast("long")
          .as("n_deleted"))
    val scrubbed = scrub(df, keyCol, deleteKeys)
    val after = scrubbed.agg(count(lit(1)).cast("long").as("n_after"))
    val leak = scrubbed.join(broadcast(keys), Seq(keyCol), "left_semi")
      .agg(count(lit(1)).cast("long").as("n_remaining_matching"))
    flagged.crossJoin(after).crossJoin(leak)
      .select(lit(store).as("store"), col("n_before"), col("n_deleted"),
        col("n_after"), col("n_remaining_matching"))
  }
}
