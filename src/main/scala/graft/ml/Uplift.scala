package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Uplift evaluation: the decile-grain cumulative uplift (Qini-style)
  * table — "if we target the top k% by predicted uplift, how much extra
  * response does treatment buy over control?"
  *
  * Scale shape: subjects carry a score and a total order (score desc, id
  * asc); the decile assignment is an explicit rank formula (no ntile
  * engine-variance), the per-decile aggregation is one hash agg, and the
  * cumulative pass runs over TEN rows. Nothing after the initial rank
  * window touches subject-level data.
  *
  * Exactness: response/size counts are integers; cumulative uplift is the
  * cross-multiplied ppm (Rt·Nc − Rc·Nt)·10⁶ div (Nt·Nc) — no empirical
  * rates in doubles anywhere.
  */
object Uplift {

  /** @param scored one row per subject: `idCol` (unique tiebreak),
    *               `scoreCol` (higher = more uplift expected),
    *               `treatCol` ∈ {0,1}, `respCol` ∈ {0,1}
    * @return ten rows: `decile, n_treat, n_ctrl, resp_treat, resp_ctrl,
    *         cum_uplift_ppm` (cumulative from the top decile down; NULL
    *         when either arm is still empty)
    */
  def qiniDeciles(scored: DataFrame, idCol: String, scoreCol: String,
                  treatCol: String, respCol: String): DataFrame = {
    val wRank = Window.orderBy(col(scoreCol).desc, col(idCol).asc)
    val n = scored.count()
    require(n > 0, "qiniDeciles on empty input")
    // decile = floor((rank-1)·10/n): exact integer formula, same in any
    // engine (ntile's remainder distribution is engine-lore; this is not)
    val perDecile = scored
      .withColumn("__rk", row_number().over(wRank).cast("long"))
      .withColumn("decile",
        expr(s"CAST((__rk - 1) * 10 div $n AS BIGINT)"))
      .groupBy("decile")
      .agg(sum(col(treatCol)).cast("long").as("n_treat"),
        sum(lit(1) - col(treatCol)).cast("long").as("n_ctrl"),
        sum(col(treatCol) * col(respCol)).cast("long").as("resp_treat"),
        sum((lit(1) - col(treatCol)) * col(respCol)).cast("long")
          .as("resp_ctrl"))
    val cum = Window.orderBy("decile")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perDecile
      .withColumn("__nt", sum("n_treat").over(cum).cast("long"))
      .withColumn("__nc", sum("n_ctrl").over(cum).cast("long"))
      .withColumn("__rt", sum("resp_treat").over(cum).cast("long"))
      .withColumn("__rc", sum("resp_ctrl").over(cum).cast("long"))
      .withColumn("cum_uplift_ppm",
        when(col("__nt") > 0 && col("__nc") > 0,
          expr("""CAST((CAST(__rt AS DECIMAL(38,0)) * __nc -
                        CAST(__rc AS DECIMAL(38,0)) * __nt) * 1000000
                  div (CAST(__nt AS DECIMAL(38,0)) * __nc) AS BIGINT)"""))
          .otherwise(lit(null).cast("long")))
      .select("decile", "n_treat", "n_ctrl", "resp_treat", "resp_ctrl",
        "cum_uplift_ppm")
  }
}
