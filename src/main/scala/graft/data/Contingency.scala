package graft.data

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Categorical association tests from exact contingency counts: Pearson's
  * chi-squared test of independence (+ Cramér's V effect size) and one-way
  * ANOVA from group moments.
  *
  * Scale shape: the raw relation collapses to |A|·|B| contingency cells (or
  * k group-moment rows) in ONE hash aggregation with map-side combine; every
  * later step runs on that collapsed frame (margins as windows over cells,
  * never a re-scan or a join back to the raw data). At 100 TB the cell/moment
  * frame is still category-sized.
  *
  * Oracle determinism (the round-11 discipline, replacing round-10's
  * round(double, 9) surfaces that diverged on the driver's libm): every
  * reportable statistic is an EXACT cross-multiplied integer quotient —
  * (dividend · 10^k) div divisor in DECIMAL(38,0) with a positive dividend,
  * so Spark's `div` and DuckDB's HUGEINT `//` truncate identically (the
  * proven mcnemar_ppm recipe) — or, where a square root is unavoidable
  * (Cramér's V), a fixed sequence of correctly-rounded IEEE ops (÷, √, ×)
  * on exact-integer inputs followed by floor: bit-identical in any IEEE-754
  * engine, never round(), never libm logs. ln-derived values (WOE, IV) stay
  * plain unquantized doubles so callers keep them OUT of hashed surfaces
  * and band them with verdict booleans instead.
  */
object Contingency {

  private val D38 = "decimal(38,0)"

  /** Chi-squared independence test for `aCol` × `bCol`. One row out:
    * `n, a_levels, b_levels, dof, chi2_ppm, cramers_v_q9`.
    */
  def chiSquare(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df.groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).cast("long").as("o"))
    chiSquareFromCellsGrouped(cells, Nil)
  }

  /** The same test from PRE-AGGREGATED cells `(groupCols…, a, b, o)` —
    * one statistic PER GROUP (empty `groupCols` = one global row). Margins
    * are windows over the cell frame partitioned by group, so a weekly
    * drift series never serializes all weeks through one task, and a
    * store-backed caller (mergeable daily counts) never re-scans raw rows.
    * Cells with o = 0 are legal and contribute their expected-count mass —
    * pass a complete level grid when absence matters. A level whose ENTIRE
    * margin is zero (a grid row/column with no mass anywhere) is excluded
    * from both the terms and the level counts — it carries no information
    * and would otherwise poison the statistic with 0/0.
    */
  def chiSquareFromCellsGrouped(cells: DataFrame,
                                groupCols: Seq[String]): DataFrame = {
    val g = groupCols.map(col)
    val wa = Window.partitionBy((g :+ col("a")): _*)
    val wb = Window.partitionBy((g :+ col("b")): _*)
    val wn = if (groupCols.isEmpty) Window.partitionBy()
             else Window.partitionBy(g: _*)
    val terms = cells
      .withColumn("r", sum("o").over(wa).cast("long"))
      .withColumn("c", sum("o").over(wb).cast("long"))
      .withColumn("n", sum("o").over(wn).cast("long"))
      // per-cell term (O·N − R·C)²·10⁶ div (N·R·C), all in EXACT
      // DECIMAL(38,0) integer arithmetic with a positive dividend (the
      // mcnemar_ppm recipe — Spark `div` ≡ DuckDB HUGEINT `//`).
      // Bound: |O·N − R·C| ≤ N² so the dividend needs N⁴·10⁶ < 10³⁸,
      // i.e. N < ~10⁸ total count; past that the caller pre-buckets
      // (the HistStore discipline). The bound FAILS LOUDLY: non-ANSI
      // Spark wraps DECIMAL(38,0) overflow to NULL and sum() would then
      // silently drop the term, understating χ²
      .withColumn("__num",
        (col("o").cast(D38) * col("n") - col("r").cast(D38) * col("c"))
          .cast(D38))
      .withColumn("__term_ppm",
        when(col("n") >= lit(100000000L),
          raise_error(concat(lit("chiSquare: total count "), col("n"),
            lit(" exceeds the exact-arithmetic bound 1e8 - " +
              "pre-bucket cells (HistStore discipline) first"))))
          .when(col("r") > 0 && col("c") > 0,
            expr("""CAST(__num * __num * 1000000
                  div (CAST(n AS DECIMAL(38,0)) * r * c) AS BIGINT)"""))
          .otherwise(lit(0L)))
    val agg = if (groupCols.isEmpty) terms.groupBy() else terms.groupBy(g: _*)
    agg.agg(
      max("n").cast("long").as("n"),
      countDistinct(when(col("r") > 0, col("a"))).cast("long")
        .as("a_levels"),
      countDistinct(when(col("c") > 0, col("b"))).cast("long")
        .as("b_levels"),
      sum("__term_ppm").cast("long").as("chi2_ppm"))
      .select((g ++ Seq(col("n"), col("a_levels"), col("b_levels"),
        ((col("a_levels") - 1) * (col("b_levels") - 1)).cast("long")
          .as("dof"),
        col("chi2_ppm"),
        // Cramér's V = √(χ² / (n·(min_levels−1))) from the quantized χ²:
        // exact integers through ÷, ÷, √, × (each correctly-rounded IEEE,
        // bit-identical cross-engine) then floor to q9 — no round()
        when(col("n") * (least(col("a_levels"), col("b_levels")) - 1) > 0,
          floor(sqrt(col("chi2_ppm").cast("double") /
            (col("n") * (least(col("a_levels"), col("b_levels")) - 1))
              .cast("double") / lit(1000000.0)) * lit(1000000000.0))
            .cast("long")).as("cramers_v_q9"))): _*)
  }

  /** Weight-of-evidence / information-value feature screen (the credit-
    * scoring standard for "how much does this bucketed feature separate a
    * binary label"): per bucket WOE = ln((pos_b/POS)/(neg_b/NEG)) and
    * IV = Σ_b (pos_b/POS − neg_b/NEG)·WOE_b.
    *
    * One hash agg collapses rows to buckets; totals are windows over the
    * bucket frame. The engine-independent surface is `odds_q9` — the odds
    * ratio pos_b·NEG / (neg_b·POS) as an exact cross-multiplied integer
    * quotient in parts-per-billion (positive dividend: Spark `div` ≡
    * DuckDB `//`). WOE = ln(odds) and the IV sum are plain unquantized
    * DOUBLES: libm's ln is not correctly rounded, so callers must keep
    * them out of hashed oracle surfaces and band them against `odds_q9`
    * with verdict booleans (the q97 invariant-oracle pattern). Buckets
    * with a zero class get NULL woe/odds and contribute nothing to IV —
    * declared semantics, no smoothing.
    *
    * @return one row per bucket: `bucket, n_pos, n_neg, odds_q9, woe,
    *         iv_term, iv` (`iv` repeated on every row — the bucket frame
    *         IS the report)
    */
  def woeIv(df: DataFrame, labelCol: String, bucketCol: String): DataFrame =
    woeIvFromCounts(
      df.groupBy(col(bucketCol).as("bucket"))
        .agg(sum(col(labelCol)).cast("long").as("n_pos"),
          sum(lit(1) - col(labelCol)).cast("long").as("n_neg")))
      .select("bucket", "n_pos", "n_neg", "odds_q9", "woe", "iv_term", "iv")

  /** [[woeIv]]'s core over PRE-AGGREGATED buckets (`n_pos`, `n_neg`
    * columns required; every other input column carried through) — the
    * entry point when buckets come from another operator (e.g. q324's
    * PAV-merged monotone segments) instead of raw rows.
    */
  def woeIvFromCounts(buckets: DataFrame): DataFrame = {
    val wAll = Window.partitionBy()
    val ok = col("n_pos") > 0 && col("n_neg") > 0
    buckets
      .withColumn("__pos", sum("n_pos").over(wAll).cast("long"))
      .withColumn("__neg", sum("n_neg").over(wAll).cast("long"))
      // exact hashable surface: odds ratio as integer parts-per-billion
      .withColumn("odds_q9",
        when(ok,
          expr("""CAST(CAST(n_pos AS DECIMAL(38,0)) * __neg * 1000000000
                  div (CAST(n_neg AS DECIMAL(38,0)) * __pos) AS BIGINT)"""))
          .otherwise(lit(null).cast("long")))
      // ln-derived values: plain doubles, NEVER for hashed surfaces
      .withColumn("woe",
        when(ok, log(
          (col("n_pos").cast(D38) * col("__neg")).cast("double") /
            (col("n_neg").cast(D38) * col("__pos")).cast("double")))
          .otherwise(lit(null).cast("double")))
      .withColumn("iv_term",
        when(ok,
          (col("n_pos").cast(D38) * col("__neg") -
            col("n_neg").cast(D38) * col("__pos")).cast("double") /
            (col("__pos").cast(D38) * col("__neg")).cast("double") *
            col("woe")).otherwise(lit(0.0)))
      .withColumn("iv", sum("iv_term").over(wAll))
      .drop("__pos", "__neg")
  }

  /** McNemar's paired test from per-subject (before, after) binary
    * outcomes: the discordant counts b (1→0) and c (0→1) decide everything,
    * so the statistic stays EXACT — (b−c)²·10⁶ div (b+c) as integer ppm,
    * plus the Edwards continuity-corrected variant. One aggregation.
    */
  def mcnemar(df: DataFrame, firstCol: String,
              secondCol: String): DataFrame = {
    df.agg(
      count(lit(1)).cast("long").as("n_pairs"),
      sum(when(col(firstCol) === 1 && col(secondCol) === 0, 1L)
        .otherwise(0L)).cast("long").as("b"),
      sum(when(col(firstCol) === 0 && col(secondCol) === 1, 1L)
        .otherwise(0L)).cast("long").as("c"))
      .select(col("n_pairs"), col("b"), col("c"),
        expr("""CAST(CASE WHEN b + c > 0 THEN
                  CAST((b - c) AS DECIMAL(38,0)) * (b - c) * 1000000
                  div (b + c) ELSE 0 END AS BIGINT)""").as("mcnemar_ppm"),
        expr("""CAST(CASE WHEN b + c > 0 THEN
                  CAST(greatest(abs(b - c) - 1, 0) AS DECIMAL(38,0)) *
                  greatest(abs(b - c) - 1, 0) * 1000000
                  div (b + c) ELSE 0 END AS BIGINT)""").as("mcnemar_cc_ppm"))
  }

  /** Bowker's test of symmetry (Bowker 1948) — McNemar generalized to
    * k×k paired categorical labels: did a relabeling pass drift
    * ASYMMETRICALLY (mass moving i→j without the j→i counterflow)?
    *   χ² = Σ_{i<j} (n_ij − n_ji)² / (n_ij + n_ji)
    * over the off-diagonal cell pairs, dof = #pairs with any discordant
    * mass. Pairs collapse to the ≤k² cell frame in ONE hash agg; the
    * {i,j} pairing is a key NORMALIZATION ((least, greatest) + one more
    * k²-bounded agg), never a self-join. Each pair term is an exact
    * cross-multiplied integer ppm quotient with a squared (positive)
    * dividend, the statistic their exact BIGINT sum — zero doubles.
    *
    * @param df one row per subject: `firstCol`, `secondCol` — comparable
    *           category labels (the before/after of the relabeling)
    * @return one row: `n_pairs, n_discordant, dof, bowker_ppm`
    */
  def bowker(df: DataFrame, firstCol: String,
             secondCol: String): DataFrame = {
    val cells = df
      .groupBy(col(firstCol).as("i"), col(secondCol).as("j"))
      .agg(count(lit(1)).cast("long").as("o"))
    val off = cells.filter(col("i") =!= col("j"))
      .select(least(col("i"), col("j")).as("lo"),
        greatest(col("i"), col("j")).as("hi"),
        when(col("i") < col("j"), col("o")).otherwise(0L).as("up"),
        when(col("i") > col("j"), col("o")).otherwise(0L).as("down"))
      .groupBy("lo", "hi")
      .agg(sum("up").cast("long").as("a"),
        sum("down").cast("long").as("b"))
      .withColumn("__term_ppm",
        expr("""CAST(CAST(a - b AS DECIMAL(38,0)) * (a - b) * 1000000
                div (a + b) AS BIGINT)"""))
    val total = df.agg(count(lit(1)).cast("long").as("n_pairs"))
    off.agg(
      sum(col("a") + col("b")).cast("long").as("n_discordant"),
      count(lit(1)).cast("long").as("dof"),
      sum("__term_ppm").cast("long").as("bowker_ppm"))
      .na.fill(0L, Seq("n_discordant", "dof", "bowker_ppm"))
      .crossJoin(broadcast(total))
      .select("n_pairs", "n_discordant", "dof", "bowker_ppm")
  }

  /** Cochran–Mantel–Haenszel stratified 2×2 association (Mantel &
    * Haenszel 1959): does exposure associate with outcome AFTER
    * controlling for a confounding stratum — the stratified sibling of
    * [[chiSquare]] and the arbitrary-stratum generalization of
    * [[graft.data.Survival.logRank]] (which is CMH over time strata).
    *
    * Per stratum k with cells a,b,c,d (a = exposed∩outcome) and
    * n = a+b+c+d:
    *   E_k = (a+b)(a+c)/n,   V_k = (a+b)(c+d)(a+c)(b+d) / (n²(n−1))
    *   χ²  = (Σa − ΣE)² / ΣV
    * and the pooled Mantel–Haenszel odds ratio Σ(a·d/n) / Σ(b·c/n).
    *
    * Raw rows collapse to the |strata| frame in ONE hash aggregation
    * (map-side combine); everything after runs on that frame. The E/V/R/S
    * increments are exact cross-multiplied integer q9 quotients (positive
    * dividends — Spark `div` ≡ DuckDB HUGEINT `//`), their totals exact
    * BIGINT sums, and χ²/OR exact integer ppm/q9 quotients of those —
    * zero doubles end to end (the logRank discipline). Per-stratum bound:
    * the V dividend needs n⁴·10⁹ < 10³⁸, i.e. n < ~10⁷ per stratum —
    * FAILS LOUDLY past it (non-ANSI Spark would wrap the DECIMAL overflow
    * to NULL and sum() would silently drop the stratum).
    *
    * @param df one row per subject: `stratumCol, exposureCol ∈ {0,1},
    *           outcomeCol ∈ {0,1}`
    * @return one row: `k_strata, sum_a, e_sum_q9, v_sum_q9, chi2_ppm,
    *         r_sum_q9, s_sum_q9, or_mh_q9`
    */
  def cmh(df: DataFrame, stratumCol: String, exposureCol: String,
          outcomeCol: String): DataFrame = {
    val e = col(exposureCol) === 1
    val y = col(outcomeCol) === 1
    val strata = df.groupBy(col(stratumCol).as("stratum"))
      .agg(
        sum(when(e && y, 1L).otherwise(0L)).cast("long").as("a"),
        sum(when(e && !y, 1L).otherwise(0L)).cast("long").as("b"),
        sum(when(!e && y, 1L).otherwise(0L)).cast("long").as("c"),
        sum(when(!e && !y, 1L).otherwise(0L)).cast("long").as("d"))
      .withColumn("n", (col("a") + col("b") + col("c") + col("d"))
        .cast("long"))
      .withColumn("__e_q9",
        when(col("n") >= lit(10000000L),
          raise_error(concat(lit("cmh: stratum size "), col("n"),
            lit(" exceeds the exact-arithmetic bound 1e7 - " +
              "split the stratum first"))))
          .otherwise(
            expr("""CAST(CAST(a + b AS DECIMAL(38,0)) * (a + c) *
                    1000000000 div n AS BIGINT)""")))
      .withColumn("__v_q9",
        when(col("n") > 1,
          expr("""CAST(CAST(a + b AS DECIMAL(38,0)) * (c + d) * (a + c) *
                  (b + d) * 1000000000
                  div (CAST(n AS DECIMAL(38,0)) * n * (n - 1))
                  AS BIGINT)""")).otherwise(lit(0L)))
      .withColumn("__r_q9",
        expr("""CAST(CAST(a AS DECIMAL(38,0)) * d * 1000000000 div n
                AS BIGINT)"""))
      .withColumn("__s_q9",
        expr("""CAST(CAST(b AS DECIMAL(38,0)) * c * 1000000000 div n
                AS BIGINT)"""))
    strata.agg(
      count(lit(1)).cast("long").as("k_strata"),
      sum("a").cast("long").as("sum_a"),
      sum("__e_q9").cast("long").as("e_sum_q9"),
      sum("__v_q9").cast("long").as("v_sum_q9"),
      sum("__r_q9").cast("long").as("r_sum_q9"),
      sum("__s_q9").cast("long").as("s_sum_q9"))
      // (Σa·10⁹ − ΣE_q9)² div (ΣV_q9·10³) in ppm — the square keeps the
      // dividend positive; Σa < 3·10⁹ bound fails loudly (logRank recipe)
      .withColumn("chi2_ppm",
        when(col("sum_a") >= lit(3000000000L),
          raise_error(concat(lit("cmh: total exposed outcomes "),
            col("sum_a"), lit(" exceed the exact-arithmetic bound 3e9"))))
          .when(col("v_sum_q9") > 0,
            expr("""CAST((CAST(sum_a AS DECIMAL(38,0)) * 1000000000
                    - e_sum_q9) *
                    (CAST(sum_a AS DECIMAL(38,0)) * 1000000000 - e_sum_q9)
                    div (CAST(v_sum_q9 AS DECIMAL(38,0)) * 1000)
                    AS BIGINT)"""))
          .otherwise(lit(null).cast("long")))
      .withColumn("or_mh_q9",
        when(col("s_sum_q9") > 0,
          expr("""CAST(CAST(r_sum_q9 AS DECIMAL(38,0)) * 1000000000
                  div s_sum_q9 AS BIGINT)"""))
          .otherwise(lit(null).cast("long")))
  }

  /** Cochran–Armitage trend test (Cochran 1954, Armitage 1955) — does a
    * BINARY outcome's rate trend with an ORDERED exposure (label
    * positivity across quality deciles, defect rate across priority
    * tiers)? With integer scores s_i, group sizes n_i, positives a_i,
    * N = Σn, A = Σa:
    *   T   = (N·Σs_i a_i − A·Σs_i n_i) / N
    *   z²  = N·T²/Var = N·t_num² / (A(N−A)·(N·Σs²n − (Σsn)²))
    * computed as two exact integer quotients (the quantize-once
    * discipline: u = t_num²·10⁶ div (A(N−A)), then z²_ppm = u·N div
    * den — one documented ppm-granularity floor between them, identical
    * in both engines; both dividends are squares, so positive). NULL at
    * the degenerates (A = 0, A = N, constant scores). N ≥ 10⁷ fails
    * loudly (the t_num² dividend needs s²N⁴·10⁶ < 10³⁸).
    *
    * @param df one row per subject: `scoreCol` SMALL integer exposure
    *           score (its order is the alternative), `outcomeCol` ∈ {0,1}
    * @return one row: `n_total, n_pos, k_levels, t_num, z2_ppm, trend_up`
    */
  def cochranArmitage(df: DataFrame, scoreCol: String,
                      outcomeCol: String): DataFrame = {
    df.groupBy(col(scoreCol).cast("long").as("s"))
      .agg(count(lit(1)).cast("long").as("ni"),
        sum(col(outcomeCol)).cast("long").as("ai"))
      .agg(
        sum("ni").cast("long").as("n_total"),
        sum("ai").cast("long").as("n_pos"),
        count(lit(1)).cast("long").as("k_levels"),
        sum(col("s").cast(D38) * col("ni")).cast(D38).as("__ssn"),
        sum(col("s").cast(D38) * col("ai")).cast(D38).as("__ssa"),
        sum(col("s").cast(D38) * col("s") * col("ni")).cast(D38)
          .as("__ss2n"))
      .withColumn("t_num",
        expr(s"""CAST(CAST(n_total AS $D38) * __ssa -
                 CAST(n_pos AS $D38) * __ssn AS BIGINT)"""))
      .withColumn("__den",
        expr(s"""CAST(n_total AS $D38) * __ss2n - __ssn * __ssn"""))
      .withColumn("z2_ppm",
        when(col("n_total") >= lit(10000000L),
          raise_error(concat(lit("cochranArmitage: N = "), col("n_total"),
            lit(" exceeds the exact-arithmetic bound 1e7 - " +
              "subsample or stratify first"))))
          .when(col("n_pos") > 0 && col("n_pos") < col("n_total") &&
            col("__den") > 0,
            expr(s"""CAST(
              CAST(CAST(t_num AS $D38) * t_num * 1000000
                   div (CAST(n_pos AS $D38) * (n_total - n_pos))
                   AS $D38)
              * n_total div __den AS BIGINT)"""))
          .otherwise(lit(null).cast("long")))
      .withColumn("trend_up", col("t_num") > 0)
      .select("n_total", "n_pos", "k_levels", "t_num", "z2_ppm",
        "trend_up")
  }

  /** One-way ANOVA from exact integer moments. `valueIntCol` must already be
    * an exact integer measurement (e.g. cents — the q249 sub-unit
    * discipline). One row out: `n_total, k_groups, ssb, ssw, f_ppm,
    * eta_sq_q9` with the sums of squares in floor-divided (sub-unit)²
    * integers and the F statistic / η² as exact cross-multiplied integer
    * quotients (ppm / parts-per-billion).
    *
    * All of SSB/SSW stay in EXACT integer arithmetic: the per-group s₁²/n
    * quotients are floor divisions done as (s₁² − s₁² mod n)/n in
    * DECIMAL(38,0) — never a rounded double (DuckDB's float-path round()
    * disagrees with BigDecimal rounding above 2⁵³, the q307 lesson). The
    * ≤1-subunit² truncation per group is part of the operator's declared
    * semantics and reproduced bit-for-bit by any engine.
    */
  /** Balanced two-way ANOVA + ICC(2,1) over a COMPLETE panel — one
    * integer observation per (row, col) cell, e.g. the dense day×type
    * daily-count grid: partitions N·SS_total = N·Σy² − T² exactly into
    *
    *   N·SS_row = b·ΣR_r² − T²,  N·SS_col = k·ΣC_c² − T²,  error = rest
    *
    * (all exact DECIMAL(38,0) integers — the common N clears every
    * mean), then F_row = SS_row·(k−1)/SS_err and F_col = SS_col·(b−1)/
    * SS_err as exact ppm floors, plus Shrout–Fleiss ICC(2,1) (two-way
    * random, absolute agreement — "do the k columns agree on which rows
    * are big", the continuous-rating sibling of the kappa family):
    *
    *   ICC = b(k−1)(A−E') … emitted as the exact sign-split ×10⁶ floor
    *   of [b(k−1)A − bE] / [b(k−1)A + b(k−1)E + k(b−1)C − kE]
    *
    * with A/C/E the N·SS quantities (the common multiplier clears all
    * df denominators — derivation in the round-14 notes). Ragged panels
    * fail loudly; NULL F/ICC when the error SS is zero.
    *
    * @param obs one row per (rowCol, colCol) cell with integer
    *            `valueIntCol`
    * @return one row: `b_rows, k_cols, nss_row, nss_col, nss_err,
    *         f_row_ppm, f_col_ppm, icc2_x1e6`
    */
  def anovaTwoWayPanel(obs: DataFrame, rowCol: String, colCol: String,
                       valueIntCol: String): DataFrame = {
    val y = col(valueIntCol).cast(D38)
    val cells = obs.select(col(rowCol).as("__r"), col(colCol).as("__c"), y.as("__y"))
    val rows = cells.groupBy("__r")
      .agg(count(lit(1)).cast("long").as("kb"),
        sum("__y").cast(D38).as("rs"))
    val cols = cells.groupBy("__c")
      .agg(count(lit(1)).cast("long").as("bk"),
        sum("__y").cast(D38).as("cs"))
    val tot = cells.agg(
      count(lit(1)).cast("long").as("n"),
      sum("__y").cast(D38).as("t"),
      sum(col("__y") * col("__y")).cast(D38).as("q"))
    val rAgg = rows.agg(count(lit(1)).cast("long").as("b_rows"),
      min("kb").cast("long").as("__kb_min"),
      max("kb").cast("long").as("__kb_max"),
      sum(col("rs") * col("rs")).cast(D38).as("__sr2"))
    val cAgg = cols.agg(count(lit(1)).cast("long").as("k_cols"),
      min("bk").cast("long").as("__bk_min"),
      max("bk").cast("long").as("__bk_max"),
      sum(col("cs") * col("cs")).cast(D38).as("__sc2"))
    rAgg.crossJoin(broadcast(cAgg)).crossJoin(broadcast(tot))
      .withColumn("__ok",
        when(col("__kb_min") =!= col("k_cols") ||
          col("__kb_max") =!= col("k_cols") ||
          col("__bk_min") =!= col("b_rows") ||
          col("__bk_max") =!= col("b_rows") ||
          col("n") =!= col("b_rows") * col("k_cols"),
          raise_error(lit("anova_two_way: ragged panel - one observation " +
            "per (row, col) cell required; densify with zeros first")))
          .otherwise(lit(1)))
      .withColumn("__a",
        expr(s"CAST(CAST(b_rows AS $D38) * __sr2 - t * t AS $D38)") *
          col("__ok"))
      .withColumn("__cc",
        expr(s"CAST(CAST(k_cols AS $D38) * __sc2 - t * t AS $D38)"))
      .withColumn("__tot",
        expr(s"CAST(CAST(n AS $D38) * q - t * t AS $D38)"))
      .withColumn("__e", col("__tot") - col("__a") - col("__cc"))
      .withColumn("nss_row", col("__a").cast("long"))
      .withColumn("nss_col", col("__cc").cast("long"))
      .withColumn("nss_err", col("__e").cast("long"))
      .withColumn("f_row_ppm",
        when(col("__e") > 0,
          expr(s"""CAST(__a * (k_cols - 1) * 1000000 div __e
                   AS BIGINT)"""))
          .otherwise(lit(null).cast("long")))
      .withColumn("f_col_ppm",
        when(col("__e") > 0,
          expr(s"""CAST(__cc * (b_rows - 1) * 1000000 div __e
                   AS BIGINT)"""))
          .otherwise(lit(null).cast("long")))
      .withColumn("__inum",
        expr(s"""CAST(CAST(b_rows AS $D38) * (k_cols - 1) * __a -
                 CAST(b_rows AS $D38) * __e AS $D38)"""))
      .withColumn("__iden",
        expr(s"""CAST(CAST(b_rows AS $D38) * (k_cols - 1) * __a +
                 CAST(b_rows AS $D38) * (k_cols - 1) * __e +
                 CAST(k_cols AS $D38) * (b_rows - 1) * __cc -
                 CAST(k_cols AS $D38) * __e AS $D38)"""))
      .withColumn("icc2_x1e6",
        when(col("__iden") > 0,
          (when(col("__inum") >= 0, lit(1L)).otherwise(lit(-1L))) *
            expr("CAST(abs(__inum) * 1000000 div __iden AS BIGINT)"))
          .otherwise(lit(null).cast("long")))
      .select("b_rows", "k_cols", "nss_row", "nss_col", "nss_err",
        "f_row_ppm", "f_col_ppm", "icc2_x1e6")
  }

  def anovaOneWay(df: DataFrame, groupCol: String,
                  valueIntCol: String): DataFrame = {
    val v = col(valueIntCol).cast(D38)
    val groups = df.groupBy(col(groupCol).as("g"))
      .agg(count(lit(1)).cast("long").as("ng"),
        sum(v).cast(D38).as("s1"),
        sum(v * v).cast(D38).as("s2"))
    // exact floor division: (a − a mod n) / n — the decimal quotient of an
    // exactly-divisible numerator is exact, no precision-rule divergence
    def floorDiv(a: Column, n: Column): Column =
      ((a - a % n.cast(D38)) / n.cast(D38)).cast(D38)
    val perG = groups.withColumn("__t",
      floorDiv(col("s1") * col("s1"), col("ng")))
    perG.agg(
      sum("ng").cast("long").as("n_total"),
      count(lit(1)).cast("long").as("k_groups"),
      sum("s1").cast(D38).as("__s1"),
      sum("s2").cast(D38).as("__s2"),
      sum("__t").cast(D38).as("__bg"))
      .select(col("n_total"), col("k_groups"),
        // the per-group floor divisions can push the raw SSB a few
        // subunits² NEGATIVE when the true SSB ≈ 0 — clamp to keep the
        // reported sum of squares sane and the f_ppm/eta_sq_q9 dividends
        // positive (the precondition that makes div ≡ DuckDB //)
        greatest((col("__bg") -
          floorDiv(col("__s1") * col("__s1"), col("n_total")))
          .cast("long"), lit(0L)).as("ssb"),
        (col("__s2") - col("__bg")).cast("long").as("ssw"))
      // F = (SSB/(k−1))/(SSW/(n−k)) = SSB·(n−k) / (SSW·(k−1)) — exact
      // integer ppm quotient (positive dividend), no doubles anywhere
      .withColumn("f_ppm",
        when(col("k_groups") > 1 && col("ssw") > 0,
          expr("""CAST(CAST(ssb AS DECIMAL(38,0)) * (n_total - k_groups)
                  * 1000000 div (CAST(ssw AS DECIMAL(38,0)) * (k_groups - 1))
                  AS BIGINT)""")).otherwise(lit(null).cast("long")))
      .withColumn("eta_sq_q9",
        when(col("ssb") + col("ssw") > 0,
          expr("""CAST(CAST(ssb AS DECIMAL(38,0)) * 1000000000
                  div (CAST(ssb AS DECIMAL(38,0)) + ssw) AS BIGINT)"""))
          .otherwise(lit(null).cast("long")))
  }
}
