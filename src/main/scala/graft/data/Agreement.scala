package graft.data

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-rater label-agreement statistics over annotation relations —
  * the label-quality gates a supervised-data pipeline runs before trusting
  * a labeling pass with MORE than the two raters Cohen's kappa (q179)
  * handles: Fleiss' kappa (Fleiss 1971, k raters × m categories) and
  * Cochran's Q (Cochran 1950, k paired binary treatments).
  *
  * Scale shape: annotations collapse to per-(item, category) cell counts in
  * ONE hash aggregation, then to the item frame, then to a single row (plus
  * one category-domain-sized agg) — each shuffle strictly smaller than the
  * last, no windows, no driver collect.
  *
  * Oracle determinism (the round-11/12 discipline): both statistics are
  * RATIONAL in the integer counts, so every reported value is an exact
  * cross-multiplied integer quotient — (dividend · 10^k) div divisor in
  * DECIMAL(38,0); negative-capable quotients (kappa) use the q179
  * sign-split abs-division so Spark's `div` truncation and DuckDB's
  * HUGEINT `//` agree. No doubles anywhere.
  */
object Agreement {

  private val D38 = "decimal(38,0)"

  /** Fleiss' kappa from an annotation relation: one row per (item, rater)
    * with the assigned category. Every item must carry the SAME number of
    * ratings n (the Fleiss design); a ragged panel fails loudly rather
    * than silently mis-weighting items.
    *
    * With N items, n ratings each, category totals t_c and per-item cell
    * counts n_ic:
    *   P̄o = A/B   where A = Σ_i Σ_c n_ic(n_ic−1),  B = N·n·(n−1)
    *   P̄e = C/D   where C = Σ_c t_c²,              D = (N·n)²
    *   κ  = (P̄o − P̄e)/(1 − P̄e) = (A·D − C·B) / (B·(D − C))
    * all integers; κ is emitted ×10⁶ via sign-split abs-division, NULL at
    * the P̄e = 1 degenerate (every rating in one category).
    *
    * Exact-arithmetic bound: A·D ≤ B·D = N·n(n−1)·(N·n)², so the
    * DECIMAL(38,0) products need N·n ≲ 3·10¹¹ ratings — far past any
    * labeling panel; the per-item n check fails loudly first anyway.
    *
    * @return one row: `n_items, n_raters, n_categories, po_ppm, pe_ppm,
    *         kappa_x1e6`
    */
  def fleissKappa(annotations: DataFrame, itemCol: String,
                  categoryCol: String): DataFrame = {
    val cells = annotations
      .groupBy(col(itemCol).as("item"), col(categoryCol).as("cat"))
      .agg(count(lit(1)).cast("long").as("nic"))
    val perItem = cells.groupBy("item")
      .agg(sum(col("nic").cast(D38) * (col("nic") - 1)).cast(D38).as("ai"),
        sum("nic").cast("long").as("ni"))
    val catTotals = cells.groupBy("cat")
      .agg(sum("nic").cast("long").as("tc"))
    val c = catTotals.agg(
      count(lit(1)).cast("long").as("n_categories"),
      sum(col("tc").cast(D38) * col("tc")).cast(D38).as("big_c"))
    perItem.agg(
      count(lit(1)).cast("long").as("n_items"),
      min("ni").cast("long").as("__nmin"),
      max("ni").cast("long").as("n_raters"),
      sum("ai").cast(D38).as("big_a"))
      .crossJoin(c)
      .withColumn("__b",
        (col("n_items").cast(D38) * col("n_raters") *
          (col("n_raters") - 1)).cast(D38))
      .withColumn("__d",
        (col("n_items").cast(D38) * col("n_raters") *
          col("n_items") * col("n_raters")).cast(D38))
      // the ragged-panel check rides the po_ppm branch chain so the
      // optimizer can never prune it away with an unused guard column
      .withColumn("po_ppm",
        when(col("__nmin") =!= col("n_raters"),
          raise_error(concat(lit("fleissKappa: ragged panel - items have "),
            col("__nmin"), lit(".."), col("n_raters"),
            lit(" ratings; Fleiss requires a constant rating count"))))
          .when(col("__b") > 0,
            expr("CAST(big_a * 1000000 div __b AS BIGINT)"))
          .otherwise(lit(null).cast("long")))
      .withColumn("pe_ppm",
        expr("CAST(big_c * 1000000 div __d AS BIGINT)"))
      // κ = (AD − CB)/(B(D − C)): sign-split abs-division (q179 recipe)
      // so both engines truncate the magnitude toward zero identically
      .withColumn("kappa_x1e6",
        when(col("__b") <= 0 || col("__d") === col("big_c"),
          lit(null).cast("long"))
          .otherwise(
            when(expr("big_a * __d >= big_c * __b"), lit(1L))
              .otherwise(lit(-1L)) *
            expr("""CAST(abs(big_a * __d - big_c * __b) * 1000000
                    div (__b * (__d - big_c)) AS BIGINT)""")))
      .select("n_items", "n_raters", "n_categories", "po_ppm", "pe_ppm",
        "kappa_x1e6")
  }

  /** Krippendorff's alpha for NOMINAL data — the agreement coefficient
    * that, unlike [[fleissKappa]], tolerates a RAGGED panel (items with
    * different rating counts; items with fewer than 2 pairable ratings
    * are excluded, the standard Krippendorff rule):
    *   α = 1 − D_o/D_e,
    *   D_o = (1/n)·Σ_i A_i/(n_i−1) with A_i = Σ_c n_ic(n_i − n_ic),
    *   D_e = Σ_c t_c(n − t_c) / (n(n−1)),  n = Σ n_i over kept items.
    *
    * Same collapse shape as Fleiss (annotations → cells → item frame →
    * one row + a category-domain agg). The per-item quotients A_i/(n_i−1)
    * have VARYING denominators, so each is quantized once as an exact
    * integer A_i·10⁹ div (n_i−1) (positive dividend — the logRank
    * increment discipline; ≤1 q9 unit truncation per item is declared
    * semantics), their sum is an exact BIGINT, and
    *   α ×10⁶ = (D_e·10⁹ − (n−1)·ΣA_q9) · 10⁶ div (D_e·10⁹)
    * via sign-split abs-division (α < 0 = worse than chance). NULL when
    * D_e = 0 (every rating one category). Bound: (n−1)·ΣA_q9·10⁶ needs
    * n ≲ 2·10⁷ ratings — fails loudly.
    *
    * @return one row: `n_items_kept, n_ratings, n_categories, do_sum_q9,
    *         de_pairs, alpha_x1e6`
    */
  def krippendorffAlpha(annotations: DataFrame, itemCol: String,
                        categoryCol: String): DataFrame = {
    val cells = annotations
      .groupBy(col(itemCol).as("item"), col(categoryCol).as("cat"))
      .agg(count(lit(1)).cast("long").as("nic"))
    val perItem = cells.groupBy("item")
      .agg(sum("nic").cast("long").as("ni"),
        sum(col("nic").cast(D38) * col("nic")).cast(D38).as("__s2"))
      .filter(col("ni") >= 2)
      // A_i = n_i² − Σ n_ic² ; quantize the per-item quotient once
      .withColumn("__a", (col("ni").cast(D38) * col("ni") - col("__s2"))
        .cast(D38))
      .withColumn("__do_q9",
        expr("CAST(__a * 1000000000 div (ni - 1) AS BIGINT)"))
    val kept = cells.join(perItem.select("item"), "item")
    val catTotals = kept.groupBy("cat")
      .agg(sum("nic").cast("long").as("tc"))
    val items = perItem.agg(
      count(lit(1)).cast("long").as("n_items_kept"),
      sum("ni").cast("long").as("n_ratings"),
      sum("__do_q9").cast("long").as("do_sum_q9"))
    val cats = items.crossJoin(
      catTotals.agg(count(lit(1)).cast("long").as("__ncat"))).select(
      col("n_items_kept"), col("n_ratings"), col("do_sum_q9"),
      col("__ncat").as("n_categories"))
    // D_e pair count Σ t_c(n − t_c) needs n from the item pass: rejoin
    // the two one-row frames (both broadcastable by construction)
    val de = catTotals.crossJoin(broadcast(
        items.select(col("n_ratings").as("__n"))))
      .agg(sum(col("tc").cast(D38) * (col("__n") - col("tc")))
        .cast("long").as("de_pairs"))
    cats.crossJoin(broadcast(de))
      .withColumn("alpha_x1e6",
        when(col("n_ratings") >= lit(20000000L),
          raise_error(concat(lit("krippendorffAlpha: "), col("n_ratings"),
            lit(" ratings exceed the exact-arithmetic bound 2e7"))))
          .when(col("de_pairs") <= 0, lit(null).cast("long"))
          .otherwise(
            when(expr("""CAST(de_pairs AS DECIMAL(38,0)) * 1000000000 >=
                  CAST(n_ratings - 1 AS DECIMAL(38,0)) * do_sum_q9"""),
              lit(1L)).otherwise(lit(-1L)) *
            expr("""CAST(abs(CAST(de_pairs AS DECIMAL(38,0)) * 1000000000
                    - CAST(n_ratings - 1 AS DECIMAL(38,0)) * do_sum_q9)
                    * 1000000
                    div (CAST(de_pairs AS DECIMAL(38,0)) * 1000000000)
                    AS BIGINT)""")))
      .select("n_items_kept", "n_ratings", "n_categories", "do_sum_q9",
        "de_pairs", "alpha_x1e6")
  }

  /** Cohen's kappa with LINEAR weights w_ij = |i − j| over ordinal
    * integer categories (the q179 two-rater gate upgraded for ordered
    * labels, where "off by one bucket" must cost less than "off by
    * three"): with cell counts n_ij, row/col margins r_i/c_j and N pairs,
    *   κ_w = 1 − N·Σ|i−j|·n_ij / Σ|i−j|·r_i·c_j = (D − N·W_o)/D,
    * ALL integers — observed and expected weighted disagreement are
    * exact sums over the k² cell/margin grid (one hash agg to cells,
    * margin frames k-sized, the cross products k²-sized), and κ_w ×10⁶
    * is the q179 sign-split abs-division. NULL when D = 0 (either rater
    * constant — no expected disagreement to normalize by).
    *
    * @return one row: `n_pairs, k_a, k_b, w_obs, w_exp, kappa_w_x1e6`
    */
  def weightedKappa(df: DataFrame, raterACol: String,
                    raterBCol: String): DataFrame = {
    val cells = df.groupBy(col(raterACol).cast("long").as("i"),
        col(raterBCol).cast("long").as("j"))
      .agg(count(lit(1)).cast("long").as("o"))
    val obs = cells.agg(
      sum("o").cast("long").as("n_pairs"),
      countDistinct("i").cast("long").as("k_a"),
      countDistinct("j").cast("long").as("k_b"),
      sum(abs(col("i") - col("j")).cast(D38) * col("o")).cast("long")
        .as("w_obs"))
    val ri = cells.groupBy("i").agg(sum("o").cast("long").as("r"))
    val cj = cells.groupBy("j").agg(sum("o").cast("long").as("c"))
    val exp = ri.crossJoin(broadcast(cj))
      .agg(sum(abs(col("i") - col("j")).cast(D38) * col("r") * col("c"))
        .cast("long").as("w_exp"))
    obs.crossJoin(broadcast(exp))
      .withColumn("kappa_w_x1e6",
        when(col("w_exp") <= 0, lit(null).cast("long"))
          .otherwise(
            when(expr(s"""CAST(w_exp AS $D38) >=
                  CAST(n_pairs AS $D38) * w_obs"""), lit(1L))
              .otherwise(lit(-1L)) *
            expr(s"""CAST(abs(CAST(w_exp AS $D38) -
                    CAST(n_pairs AS $D38) * w_obs) * 1000000
                    div w_exp AS BIGINT)""")))
  }

  /** Cochran's Q test for k paired binary treatments (does the success
    * rate differ across the k conditions, subjects as their own
    * controls — the k-ary generalization of McNemar):
    *   Q = (k−1)·(k·ΣC_j² − T²) / (k·T − ΣR_i²)
    * with R_i the per-subject success count, C_j the per-condition totals
    * and T = ΣR_i. Rational in the counts, so `q_ppm` is an exact integer
    * quotient; the dividend is ≥ 0 by Cauchy–Schwarz and the divisor is 0
    * exactly when every subject is all-0 or all-1 (no discordance) → NULL.
    *
    * One map-side projection + ONE aggregation — no shuffle beyond the
    * single global agg, any subject count.
    *
    * @param conditions k boolean/0-1 columns, one per condition
    * @return one row: `n_subjects, k_conditions, t_total, sum_r2, sum_c2,
    *         q_ppm`
    */
  def cochranQ(df: DataFrame, conditions: Seq[Column]): DataFrame = {
    require(conditions.size >= 2, "cochranQ needs at least 2 conditions")
    val k = conditions.size
    val xs = conditions.zipWithIndex.map { case (c, j) =>
      c.cast("int").as(s"__x$j")
    }
    val withR = df.select(xs: _*)
      .withColumn("__r",
        (0 until k).map(j => col(s"__x$j")).reduce(_ + _).cast("long"))
    val aggCols =
      (0 until k).map(j => sum(s"__x$j").cast("long").as(s"__c$j")) ++ Seq(
        count(lit(1)).cast("long").as("n_subjects"),
        sum("__r").cast("long").as("t_total"),
        sum(col("__r").cast(D38) * col("__r")).cast("long").as("sum_r2"))
    withR.agg(aggCols.head, aggCols.tail: _*)
      .withColumn("sum_c2",
        (0 until k).map(j => col(s"__c$j").cast(D38) * col(s"__c$j"))
          .reduce(_ + _).cast("long"))
      .withColumn("k_conditions", lit(k.toLong))
      .withColumn("q_ppm",
        when(col("k_conditions") * col("t_total") - col("sum_r2") > 0,
          expr(s"""CAST((k_conditions - 1) *
                   (CAST(k_conditions AS $D38) * sum_c2 -
                    CAST(t_total AS $D38) * t_total) * 1000000
                   div (CAST(k_conditions AS $D38) * t_total - sum_r2)
                   AS BIGINT)"""))
          .otherwise(lit(null).cast("long")))
      .select("n_subjects", "k_conditions", "t_total", "sum_r2", "sum_c2",
        "q_ppm")
  }
}
