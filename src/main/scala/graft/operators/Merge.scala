package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot maintenance for a continuously-updated 100 TB table: apply a
  * CDC delta (upserts + deletes) to a base snapshot, and diff two
  * snapshots into added / removed / changed rows.
  *
  * `applyChanges` is the MERGE INTO shape lakehouse pipelines run daily.
  * It is deliberately NOT a join: base and delta union into one stream and
  * a single partial-aggregating hash agg (`max_by` over the version) picks
  * the winner per key — one shuffle total, map-side combine does the bulk
  * of the collapsing, and there is no skew-fragile build side. A join-based
  * MERGE needs the same shuffle for the join plus a second pass to union
  * unmatched base rows.
  *
  * Reference analog: ing-bank/EntityMatchingModel keeps its ground-truth
  * "index" frames immutable per fit; this operator is the engine extension
  * that lets the same pipelines maintain a mutable snapshot incrementally
  * (the batch twin of Bm25.appendToIndex / Knn.ivfAppendToIndex).
  */
object Merge {

  private val Reserved = Seq("__p", "__v", "__op", "__w")

  /** Apply a CDC delta to a base snapshot.
    *
    * @param base     current snapshot; MUST be unique per `keys`
    * @param changes  delta rows carrying the base's payload columns plus
    *                 `versionCol` (LONG, strictly greater than
    *                 Long.MinValue) and `opCol` ('upsert' | 'delete').
    *                 (key, version) MUST be unique — the latest version
    *                 wins, so a tie would be nondeterministic.
    * @return the new snapshot, schema == base.schema
    */
  def applyChanges(base: DataFrame, changes: DataFrame, keys: Seq[String],
                   versionCol: String, opCol: String): DataFrame = {
    val payload = base.columns.filterNot(keys.contains).toSeq
    require(payload.nonEmpty, "base must carry payload columns beside the keys")
    Reserved.foreach { r =>
      require(!base.columns.contains(r) && !changes.columns.contains(r),
        s"column name $r is reserved by Merge.applyChanges")
    }
    val missing = (keys ++ payload :+ versionCol :+ opCol)
      .filterNot(changes.columns.contains)
    require(missing.isEmpty, s"changes is missing columns: ${missing.mkString(", ")}")

    val baseTagged = base.select(
      keys.map(col) ++ Seq(
        struct(payload.map(col): _*).as("__p"),
        lit(Long.MinValue).as("__v"),
        lit("upsert").as("__op")): _*)
    val deltaTagged = changes.select(
      keys.map(col) ++ Seq(
        struct(payload.map(col): _*).as("__p"),
        col(versionCol).cast("long").as("__v"),
        col(opCol).as("__op")): _*)

    baseTagged.unionByName(deltaTagged)
      .groupBy(keys.map(col): _*)
      .agg(max_by(struct(col("__op"), col("__p")), col("__v")).as("__w"))
      .filter(col("__w.__op") =!= "delete")
      .select(keys.map(col) ++ payload.map(c => col(s"__w.__p.$c").as(c)): _*)
  }

  /** Diff two snapshots on `keys`: one row per key whose presence or
    * payload changed, labeled 'added' / 'removed' / 'changed', with the
    * old and new payload side by side. Unchanged keys are dropped (on a
    * 100 TB snapshot the diff output is the small side; emitting the
    * unchanged majority would be the scan-sized anti-pattern).
    *
    * One null-safe full-outer sort-merge join — the minimum for a diff:
    * both sides must meet on the key, and AQE handles skew on it.
    * Payload equality is null-safe per column (`<=>`).
    */
  def diff(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String]): DataFrame = {
    val payload = oldDf.columns.filterNot(keys.contains).toSeq
      .filter(newDf.columns.contains)
    require(payload.nonEmpty, "old/new share no payload columns beside the keys")
    require(!keys.contains("change_type") && !payload.contains("change_type"),
      "column name change_type is reserved by Merge.diff")

    Seq("__om", "__nm").foreach { r =>
      require(!oldDf.columns.contains(r) && !newDf.columns.contains(r),
        s"column name $r is reserved by Merge.diff")
    }
    // presence is detected via a side marker, not the key columns, so a
    // legitimately all-NULL key row still classifies correctly
    val o = oldDf.select((keys ++ payload).map(col): _*)
      .withColumn("__om", lit(1)).alias("__o")
    val n = newDf.select((keys ++ payload).map(col): _*)
      .withColumn("__nm", lit(1)).alias("__n")
    val on = keys.map(k => col(s"__o.$k") <=> col(s"__n.$k")).reduce(_ && _)
    val payloadSame = payload
      .map(c => col(s"__o.$c") <=> col(s"__n.$c")).reduce(_ && _)

    o.join(n, on, "full_outer")
      .withColumn("change_type",
        when(col("__om").isNull, lit("added"))
          .when(col("__nm").isNull, lit("removed"))
          .when(!payloadSame, lit("changed"))
          .otherwise(lit("unchanged")))
      .filter(col("change_type") =!= "unchanged")
      .select(
        keys.map(k => coalesce(col(s"__o.$k"), col(s"__n.$k")).as(k)) ++
        Seq(col("change_type")) ++
        payload.flatMap(c => Seq(
          col(s"__o.$c").as(s"old_$c"), col(s"__n.$c").as(s"new_$c"))): _*)
  }
}
