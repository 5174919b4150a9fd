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
  * Oracle determinism (round-11 discipline): at-risk/event/censored counts
  * are exact integers; the per-step hazard d/n is an exact cross-multiplied
  * integer quotient d·10⁹ div n (positive dividend — Spark `div` ≡ DuckDB
  * HUGEINT `//`), and the Nelson–Aalen cumulative hazard is an exact BIGINT
  * running sum of those quotients. The KM survival PRODUCT needs ln/exp
  * (libm — not correctly rounded, engine-dependent), so it is emitted as a
  * plain unquantized DOUBLE that callers must keep out of hashed surfaces,
  * banding it against the exact cumulative hazard with verdict booleans
  * (Weierstrass: 1 − H ≤ Π(1−hᵢ) ≤ exp(−H)).
  */
object Survival {

  /** Kaplan–Meier + Nelson–Aalen per group.
    *
    * @param obs       one row per subject: `groupCols… , durCol, eventCol`
    * @param durCol    integer duration (e.g. days) — the time axis
    * @param eventCol  1 = event observed, 0 = right-censored at `durCol`
    * @return one row per (group, event time): `t, n_risk, d_events,
    *         n_censored, haz_q9, cum_haz_q9, survival` (event times only —
    *         steps of the KM curve; censor-only times shrink the risk set
    *         but emit no row, the textbook product-limit convention).
    *         `haz_q9`/`cum_haz_q9` are the exact integer d·10⁹ div n hazard
    *         increments and their BIGINT running sum (Nelson–Aalen, q9
    *         units) — the hashable surface; `survival` is the KM product as
    *         a plain double (exp/ln — oracle callers band it, never hash it)
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
      // hazard increment d·10⁹ div n: exact integer quotient, positive
      // dividend — replayable bit-for-bit by any engine's integer division
      .withColumn("haz_q9",
        expr("""CAST(CAST(d_events AS DECIMAL(38,0)) * 1000000000
                div n_risk AS BIGINT)"""))
      .withColumn("cum_haz_q9", sum(col("haz_q9")).over(upTo).cast("long"))
      .withColumn("__ln_surv",
        when(col("d_events") < col("n_risk"),
          log((col("n_risk") - col("d_events")).cast("double") /
            col("n_risk").cast("double"))))
      .withColumn("__ln_sum", sum(col("__ln_surv")).over(upTo))
      // d == n_risk ⇒ the risk set empties here: survival is EXACTLY zero
      // (ln would be −∞; only the terminal event time can hit this)
      .withColumn("survival",
        when(col("d_events") === col("n_risk"), lit(0.0))
          .otherwise(exp(col("__ln_sum"))))
      .select((g :+ col("t") :+ col("n_risk") :+ col("d_events") :+
        col("n_censored") :+ col("haz_q9") :+ col("cum_haz_q9") :+
        col("survival")): _*)
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
    * subject count. O/d/n are exact integers; the E and V increments are
    * exact cross-multiplied integer quotients (q9 units, positive
    * dividends), their totals exact BIGINT sums, and the final χ² an exact
    * integer ppm quotient of those — zero doubles end to end.
    *
    * @param obs `groupCol ∈ {0, 1}` (1 = group A), `durCol`, `eventCol`
    * @return one row: `o_a, e_a_q9, v_q9, chi2_ppm`
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
      .withColumn("nt", (col("na") + col("nb")).cast("long"))
      .withColumn("dt", (col("da") + col("db")).cast("long"))
      // E increment d·n_A/N and hypergeometric V increment
      // d·n_A·n_B·(N−d) / (N²·(N−1)) — both as EXACT integer q9 quotients
      // (dividend ≤ N⁴·10⁹ < 10³⁸ for N < ~10⁷ per-time risk sets; bigger
      // cohorts bucket durations first). The bound FAILS LOUDLY: non-ANSI
      // Spark would wrap the DECIMAL(38,0) overflow to NULL and sum()
      // would silently drop the term, understating the statistic
      .withColumn("__e_q9",
        when(col("nt") >= lit(10000000L),
          raise_error(concat(lit("logRank: risk set "), col("nt"),
            lit(" exceeds the exact-arithmetic bound 1e7 - " +
              "bucket durations first"))))
          .otherwise(expr("""CAST(CAST(dt AS DECIMAL(38,0)) * na *
                  1000000000 div nt AS BIGINT)""")))
      .withColumn("__v_q9",
        when(col("nt") > 1,
          expr("""CAST(CAST(dt AS DECIMAL(38,0)) * na * nb * (nt - dt) *
                  1000000000 div (CAST(nt AS DECIMAL(38,0)) * nt * (nt - 1))
                  AS BIGINT)""")).otherwise(lit(0L)))
    risky.agg(
      sum("da").cast("long").as("o_a"),
      sum("__e_q9").cast("long").as("e_a_q9"),
      sum("__v_q9").cast("long").as("v_q9"))
      // χ² = (O − E)²/V: with O, E, V in q9 integer units this is
      // (O·10⁹ − E_q9)² div (V_q9·10³) in ppm — the square keeps the
      // dividend positive, so both engines' integer division agree.
      // (O·10⁹)² < 10³⁸ needs O < ~3·10⁹ — loud, like the per-time bound
      .withColumn("chi2_ppm",
        when(col("o_a") >= lit(3000000000L),
          raise_error(concat(lit("logRank: total events "), col("o_a"),
            lit(" exceed the exact-arithmetic bound 3e9"))))
          .when(col("v_q9") > 0,
          expr("""CAST((CAST(o_a AS DECIMAL(38,0)) * 1000000000 - e_a_q9) *
                  (CAST(o_a AS DECIMAL(38,0)) * 1000000000 - e_a_q9)
                  div (CAST(v_q9 AS DECIMAL(38,0)) * 1000) AS BIGINT)"""))
          .otherwise(lit(null).cast("long")))
  }
}
