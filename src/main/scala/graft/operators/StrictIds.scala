package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Strict id coercion for the ledger-erasure verbs (ADVICE r17): a
  * GDPR delete whose id column fails the BIGINT cast must fail LOUDLY,
  * not append a NULL tombstone that anti-joins nothing — a silent
  * non-deletion is the one failure mode an erasure pipeline cannot
  * have. The check rides the same job as the tombstone write (a
  * per-row `raise_error` branch, no extra pass over the delete set).
  */
object StrictIds {

  /** `deleteIds.idCol` cast to BIGINT as column `id`, raising on any
    * row where the cast produces NULL (non-numeric string, malformed
    * value, or a NULL id — none of them deletable keys).
    */
  def toLongStrict(deleteIds: DataFrame, idCol: String): DataFrame =
    deleteIds
      .select(col(idCol).as("__in"))
      // try_cast: NULL on failure in EVERY SQL mode, so the branch below
      // is the one loud error path regardless of spark.sql.ansi.enabled
      .select(col("__in").cast("string").as("__raw"),
        expr("TRY_CAST(__in AS BIGINT)").as("id"))
      .select(
        when(col("id").isNull,
          raise_error(concat(
            lit(s"ledger delete: id column '$idCol' value "),
            coalesce(col("__raw"), lit("NULL")),
            lit(" is not castable to BIGINT — refusing a tombstone " +
              "that would silently delete nothing"))))
          .otherwise(col("id")).as("id"))
}
