package graft.operators

import org.apache.spark.sql.SparkSession

/** Shared guard for the vacuum/compaction row-count surfaces (Dedup,
  * Winnowing, Knn.ivf, Pq, Bm25): the one-pass `Dataset.observe` counts
  * fused onto each rewrite (opt guide §1.2) are exactly-once only while no
  * task attempt can be duplicated — CollectMetrics accumulators ride a
  * shuffle-map stage, and a stage re-executed after a fetch failure or a
  * speculative duplicate can double-fire them (r18 advisor, medium).
  * Single-host local mode never duplicates attempts; a cluster that turns
  * speculation on must fall back to exact `count()` actions because these
  * counts are QUERY OUTPUTS (q446–q456 GDPR row-conservation audits), not
  * diagnostics.
  */
object VacuumCounts {

  /** True when observe-based counts cannot be trusted to be exactly-once
    * and the caller must take its two-`count()` exact path instead. */
  def needExactCounts(spark: SparkSession): Boolean =
    spark.conf.getOption("spark.speculation").exists(_.trim.toBoolean)
}
