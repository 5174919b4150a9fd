package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted inner equi-join for skewed keys — the manual remedy when one hot
  * key would otherwise concentrate an entire shuffle partition on a single
  * task (AQE's skew-join handles sort-merge SPLITS at runtime, but a
  * deliberately salted layout also spreads the downstream per-key work and
  * survives plans AQE cannot rewrite).
  *
  * Shape: one aggregation over the left side finds keys whose row count
  * exceeds `hotThreshold` (the hot set is small by definition — broadcast);
  * hot left rows scatter across `nSalts` sub-keys via a deterministic
  * content hash, the right side's hot rows REPLICATE once per salt, cold
  * rows keep salt 0 on both sides, and the join runs on (key, salt). Every
  * left row still meets every right row of its key exactly once, so the
  * result is row-identical to the plain inner join (q108's oracle) — only
  * the task-level distribution changes: the hot key's pairs now spread
  * over `nSalts` tasks instead of one.
  *
  * Cost model: one extra pre-scan aggregation of the left side (map-side
  * partial, tiny output) + |hot right rows| * (nSalts - 1) replicated rows.
  * Worth it exactly when the hot key's pair volume dominates a task; size
  * `nSalts` to the observed skew ratio.
  */
object SkewJoin {

  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 nSalts: Int = 8, hotThreshold: Long = 1000000L): DataFrame = {
    require(nSalts > 0, s"nSalts must be positive, got $nSalts")
    require(hotThreshold > 0, s"hotThreshold must be positive, got $hotThreshold")
    Seq("__salt", "__hot").foreach { c =>
      require(!left.columns.contains(c) && !right.columns.contains(c),
        s"inputs must not use the operator's reserved $c column name")
    }
    // the hot set feeds THREE join branches — freeze it so the left-side
    // pre-scan runs exactly once (differing projections defeat exchange
    // reuse) and all branches see the SAME set even over a
    // non-deterministic source (disagreeing hot sets would silently drop
    // the hot key's pairs entirely)
    val hot = broadcast(
      left.groupBy(key).agg(count(lit(1)).as("__n"))
        .filter(col("__n") >= hotThreshold)
        .select(col(key)).withColumn("__hot", lit(true))
        .localCheckpoint())
    // deterministic per-row salt: content hash of the whole row — identical
    // rows share a salt, which only matters for distribution, never results
    val lSalted = left.join(hot, Seq(key), "left")
      .withColumn("__salt",
        when(col("__hot"),
          pmod(xxhash64(left.columns.map(col).toIndexedSeq: _*), lit(nSalts)))
          .otherwise(lit(0)).cast("int"))
      .drop("__hot")
    val rHot = right.join(hot.drop("__hot"), Seq(key), "left_semi")
      .withColumn("__salt", explode(sequence(lit(0), lit(nSalts - 1))))
      .withColumn("__salt", col("__salt").cast("int"))
    val rCold = right.join(hot.drop("__hot"), Seq(key), "left_anti")
      .withColumn("__salt", lit(0).cast("int"))
    lSalted.join(rHot.unionByName(rCold), Seq(key, "__salt")).drop("__salt")
  }
}
