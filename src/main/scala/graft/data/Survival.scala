package graft.data

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Right-censored survival estimation: grouped Kaplan–Meier survival curves
  * and Nelson–Aalen cumulative hazard from per-subject (duration, event)
  * observations.
  *
  * Scale shape: one hash aggregation collapses subjects to the per-group
  * event-time domain (|groups| · |distinct durations| rows — calendar-bounded
  * when durations are day-granular), then every ordered pass is PARTITIONED
  * by group, so no single task ever serializes more than one group's time
  * domain. No subject-level window, no driver collect.
  *
  * Oracle determinism: at-risk/event/censored counts are exact integers; the
  * per-step factors ln((n−d)/n) and d/n are single IEEE divisions of those
  * integers (correctly rounded, engine-independent) rounded to 9 dp BEFORE
  * the cumulative DECIMAL sum, so the running sums are order-independent
  * exact decimals; only the final exp re-enters double land (the q79
  * round-then-fix-scale precedent).
  */
object Survival {

  private val D209 = "decimal(20,9)"

  /** Kaplan–Meier + Nelson–Aalen per group.
    *
    * @param obs       one row per subject: `groupCols… , durCol, eventCol`
    * @param durCol    integer duration (e.g. days) — the time axis
    * @param eventCol  1 = event observed, 0 = right-censored at `durCol`
    * @return one row per (group, event time): `t, n_risk, d_events,
    *         n_censored, survival, cum_hazard` (event times only — steps of
    *         the KM curve; censor-only times shrink the risk set but emit no
    *         row, the textbook product-limit convention)
    */
  def kaplanMeier(obs: DataFrame, groupCols: Seq[String], durCol: String,
                  eventCol: String): DataFrame = {
    val g = groupCols.map(col)
    val perT = obs.groupBy((g :+ col(durCol).as("t")): _*)
      .agg(sum(col(eventCol)).cast("long").as("d_events"),
        sum(lit(1) - col(eventCol)).cast("long").as("n_censored"))
    val wg = Window.partitionBy(g: _*)
    val before = wg.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val upTo = wg.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perT
      .withColumn("n_risk",
        sum(col("d_events") + col("n_censored")).over(wg) -
          coalesce(sum(col("d_events") + col("n_censored")).over(before),
            lit(0L)))
      .filter(col("d_events") > 0)
      // per-step factors: exact-integer ratios through ONE IEEE division,
      // rounded to a fixed scale so the cumulative sums stay in DECIMAL
      .withColumn("__ln_surv",
        when(col("d_events") < col("n_risk"),
          round(log((col("n_risk") - col("d_events")).cast("double") /
            col("n_risk").cast("double")), 9).cast(D209))
          .otherwise(lit(null).cast(D209)))
      .withColumn("__h",
        round(col("d_events").cast("double") / col("n_risk").cast("double"),
          9).cast(D209))
      .withColumn("__ln_sum", sum(col("__ln_surv")).over(upTo))
      .withColumn("cum_hazard", sum(col("__h")).over(upTo).cast(D209))
      // d == n_risk ⇒ the risk set empties here: survival is EXACTLY zero
      // (ln would be −∞; only the terminal event time can hit this)
      .withColumn("survival",
        when(col("d_events") === col("n_risk"), lit(BigDecimal(0)).cast(D209))
          .otherwise(
            round(exp(col("__ln_sum").cast("double")), 9).cast(D209)))
      .select((g :+ col("t") :+ col("n_risk") :+ col("d_events") :+
        col("n_censored") :+ col("survival") :+ col("cum_hazard")): _*)
  }

  /** Two-sample log-rank test: does group A's survival differ from B's?
    *
    * χ² = (O_A − E_A)² / V with, at each death time t over the JOINT time
    * axis, E_A += d_t·n_At/N_t and the hypergeometric variance
    * V += d_t·(n_At/N_t)·(1 − n_At/N_t)·(N_t − d_t)/(N_t − 1).
    *
    * The time axis is the collapsed duration domain (calendar-bounded for
    * day/hour-granular durations — the q245 boundedness argument), so the
    * single ordered pass is over a kilobyte-scale frame regardless of
    * subject count. O/d/n are exact integers; E and V terms are fixed
    * IEEE op sequences rounded to 9 dp before the DECIMAL totals.
    *
    * @param obs `groupCol ∈ {0, 1}` (1 = group A), `durCol`, `eventCol`
    * @return one row: `o_a, e_a, v_lr, logrank_chi2`
    */
  def logRank(obs: DataFrame, groupCol: String, durCol: String,
              eventCol: String): DataFrame = {
    val perT = obs.groupBy(col(durCol).as("t"))
      .agg(
        sum(when(col(groupCol) === 1, col(eventCol)).otherwise(0))
          .cast("long").as("da"),
        sum(when(col(groupCol) === 1, lit(1) - col(eventCol)).otherwise(0))
          .cast("long").as("ca"),
        sum(when(col(groupCol) =!= 1, col(eventCol)).otherwise(0))
          .cast("long").as("db"),
        sum(when(col(groupCol) =!= 1, lit(1) - col(eventCol)).otherwise(0))
          .cast("long").as("cb"))
    val wAll = Window.partitionBy()
    val before = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val risky = perT
      .withColumn("na", sum(col("da") + col("ca")).over(wAll) -
        coalesce(sum(col("da") + col("ca")).over(before), lit(0L)))
      .withColumn("nb", sum(col("db") + col("cb")).over(wAll) -
        coalesce(sum(col("db") + col("cb")).over(before), lit(0L)))
      .filter(col("da") + col("db") > 0)
      .withColumn("nt", (col("na") + col("nb")).cast("double"))
      .withColumn("dt", (col("da") + col("db")).cast("double"))
      .withColumn("__e",
        round(col("dt") * col("na").cast("double") / col("nt"), 9)
          .cast("decimal(20,9)"))
      .withColumn("__v",
        when(col("na") + col("nb") > 1,
          round(col("dt") * (col("na").cast("double") / col("nt")) *
            (lit(1.0) - col("na").cast("double") / col("nt")) *
            ((col("nt") - col("dt")) / (col("nt") - lit(1.0))), 9))
          .otherwise(lit(0.0)).cast("decimal(20,9)"))
    risky.agg(
      sum("da").cast("long").as("o_a"),
      sum("__e").cast("decimal(20,9)").as("e_a"),
      sum("__v").cast("decimal(20,9)").as("v_lr"))
      .withColumn("logrank_chi2",
        round((col("o_a").cast("double") - col("e_a").cast("double")) *
          (col("o_a").cast("double") - col("e_a").cast("double")) /
          col("v_lr").cast("double"), 6).cast("decimal(28,6)"))
  }
}
