package graft.data

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-sequence randomness and serial-dependence checks over keyed event
  * series — the temporal QA gates a pipeline runs before trusting ordered
  * data: Wald–Wolfowitz runs test (is a binary sequence random or does it
  * streak), lag-k autocorrelation (does today predict next week), and the
  * index of dispersion (is a count Poisson-like or bursty).
  *
  * Scale shape: every ordered pass is PARTITIONED by the series key — a
  * per-user or per-segment window, parallelism scales with key count and
  * no task ever holds more than one series. Aggregations are single hash
  * aggs with map-side combine. No global windows, no driver collect.
  *
  * Oracle determinism: all three statistics are RATIONAL in exact integer
  * sums (run counts, Σx, Σx², Σx·x₊ₖ cross-products), emitted as exact
  * cross-multiplied integer quotients in DECIMAL(38,0) — positive
  * dividends via squares, sign-split abs-division for the sign-capable
  * autocorrelation — so Spark's `div` ≡ DuckDB's HUGEINT `//`.
  */
object SeriesStats {

  private val D38 = "decimal(38,0)"

  /** Wald–Wolfowitz runs test per key: is each key's binary sequence
    * (ordered by `orderCols`) random, or does it streak? With n₁ ones, n₀
    * zeros, N = n₁+n₀ and R observed runs:
    *   E[R] = 1 + 2n₁n₀/N,   V[R] = 2n₁n₀(2n₁n₀−N) / (N²(N−1))
    *   z² = (R−E)²/V = (N(R−1) − 2n₁n₀)²·(N−1) / (2n₁n₀·(2n₁n₀−N))
    * — rational in the counts, emitted as exact integer ppm (the square
    * keeps the dividend positive). NULL when a key is single-class or
    * 2n₁n₀ = N (the N ≤ 2-ish degenerate where V = 0). Per-key sequences
    * past 2·10⁶ rows fail loudly (the z² dividend needs N⁵·10⁶ < 10³⁸ —
    * session-bound or bucket the sequence first).
    *
    * @param binCol boolean/0-1 column — the sequence value
    * @return one row per key: `keyCols…, n, n1, n0, runs, z2_ppm`
    */
  def runsTest(df: DataFrame, keyCols: Seq[String], orderCols: Seq[String],
               binCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val x = col(binCol).cast("int")
    val stepped = df
      .withColumn("__x", x)
      .withColumn("__new",
        when(lag("__x", 1).over(w).isNull ||
          col("__x") =!= lag("__x", 1).over(w), 1L).otherwise(0L))
    stepped.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).cast("long").as("n"),
        sum("__x").cast("long").as("n1"),
        sum(lit(1L) - col("__x")).cast("long").as("n0"),
        sum("__new").cast("long").as("runs"))
      .withColumn("z2_ppm",
        when(col("n") >= lit(2000000L),
          raise_error(concat(lit("runsTest: sequence length "), col("n"),
            lit(" exceeds the exact-arithmetic bound 2e6 - " +
              "session-split the key first"))))
          .when(col("n1") > 0 && col("n0") > 0 &&
            lit(2L) * col("n1") * col("n0") > col("n"),
            expr(s"""CAST(
              (CAST(n AS $D38) * (runs - 1) - CAST(2 AS $D38) * n1 * n0) *
              (CAST(n AS $D38) * (runs - 1) - CAST(2 AS $D38) * n1 * n0) *
              (n - 1) * 1000000
              div (CAST(2 AS $D38) * n1 * n0 *
                   (CAST(2 AS $D38) * n1 * n0 - n)) AS BIGINT)"""))
          .otherwise(lit(null).cast("long")))
  }

  /** Lag-k autocorrelation per series (Box–Jenkins sample ACF over the
    * observation order):
    *   r_k = Σ_{t≤N−k}(x_t−x̄)(x_{t+k}−x̄) / Σ_{t≤N}(x_t−x̄)²
    * cleared of the mean division by multiplying through by N²:
    *   num = N²·P − N·S·(S_head + S_tail) + (N−k)·S²
    *   den = N·(N·Q − S²)
    * with P = Σ x_t·x_{t+k}, S = Σx, Q = Σx², S_head/S_tail the paired
    * prefixes/suffixes — all exact integer sums off ONE lead() pass
    * partitioned by series. r_k ×10⁶ via sign-split abs-division (den ≥ 0
    * by Cauchy–Schwarz; NULL when den = 0 — constant series — or when the
    * series is shorter than k+1). Series past 10⁷ observations fail
    * loudly; `valueCol` must already be an exact integer measurement (the
    * q249 sub-unit discipline).
    *
    * @return one row per series: `seriesCols…, n, n_pairs, acf_x1e6`
    */
  def acf(df: DataFrame, seriesCols: Seq[String], orderCol: String,
          valueCol: String, k: Int): DataFrame = {
    require(k >= 1, "acf: lag k must be >= 1")
    val w = Window.partitionBy(seriesCols.map(col): _*)
      .orderBy(col(orderCol))
    val led = df
      .withColumn("__x", col(valueCol).cast("long"))
      .withColumn("__xk", lead("__x", k).over(w))
    led.groupBy(seriesCols.map(col): _*)
      .agg(count(lit(1)).cast("long").as("n"),
        count(col("__xk")).cast("long").as("n_pairs"),
        sum("__x").cast(D38).as("__s"),
        sum(col("__x").cast(D38) * col("__x")).cast(D38).as("__q"),
        sum(when(col("__xk").isNotNull,
          col("__x").cast(D38) * col("__xk")).otherwise(lit(0)))
          .cast(D38).as("__p"),
        sum(when(col("__xk").isNotNull, col("__x")).otherwise(lit(0L)))
          .cast(D38).as("__sh"),
        sum(coalesce(col("__xk"), lit(0L))).cast(D38).as("__st"))
      .withColumn("__num",
        (col("n").cast(D38) * col("n") * col("__p") -
          col("n").cast(D38) * col("__s") * (col("__sh") + col("__st")) +
          col("n_pairs").cast(D38) * col("__s") * col("__s")).cast(D38))
      .withColumn("__den",
        (col("n").cast(D38) *
          (col("n").cast(D38) * col("__q") - col("__s") * col("__s")))
          .cast(D38))
      .withColumn("acf_x1e6",
        when(col("n") >= lit(10000000L),
          raise_error(concat(lit("acf: series length "), col("n"),
            lit(" exceeds the exact-arithmetic bound 1e7 - " +
              "aggregate to a coarser grain first"))))
          .when(col("n_pairs") > 0 && col("__den") > 0,
            (when(col("__num") >= 0, lit(1L)).otherwise(lit(-1L))) *
              expr("CAST(abs(__num) * 1000000 div __den AS BIGINT)"))
          .otherwise(lit(null).cast("long")))
      .select((seriesCols.map(col) ++
        Seq(col("n"), col("n_pairs"), col("acf_x1e6"))): _*)
  }

  /** Durbin–Watson statistic per series — the classic lag-1 serial-
    * correlation gate on integer series (DW ≈ 2 independent, → 0 strongly
    * positive, → 4 strongly negative):
    *   DW = Σ_{t≥2}(x_t − x_{t−1})² / Σ(x_t − x̄)²
    * The numerator is mean-free (differences cancel x̄) and the
    * denominator clears its mean division by n: DW = n·Σd² / (n·Q − S²) —
    * both exact integer sums off ONE lag() pass partitioned by series,
    * emitted ×10⁶ as an exact cross-multiplied quotient (dividend ≥ 0, a
    * sum of squares). NULL when the series is constant (den = 0) or has
    * fewer than 2 rows. Series past 10⁷ observations fail loudly.
    *
    * @return one row per series: `seriesCols…, n, dw_ppm`
    */
  def durbinWatson(df: DataFrame, seriesCols: Seq[String], orderCol: String,
                   valueCol: String): DataFrame = {
    val w = Window.partitionBy(seriesCols.map(col): _*)
      .orderBy(col(orderCol))
    val led = df
      .withColumn("__x", col(valueCol).cast("long"))
      .withColumn("__xp", lag("__x", 1).over(w))
    led.groupBy(seriesCols.map(col): _*)
      .agg(count(lit(1)).cast("long").as("n"),
        sum("__x").cast(D38).as("__s"),
        sum(col("__x").cast(D38) * col("__x")).cast(D38).as("__q"),
        sum(when(col("__xp").isNotNull,
          (col("__x").cast(D38) - col("__xp")) *
            (col("__x").cast(D38) - col("__xp"))).otherwise(lit(0)))
          .cast(D38).as("__d2"))
      .withColumn("dw_ppm",
        when(col("n") >= lit(10000000L),
          raise_error(concat(lit("durbinWatson: series length "), col("n"),
            lit(" exceeds the exact-arithmetic bound 1e7 - " +
              "aggregate to a coarser grain first"))))
          .when(col("n") > 1 &&
            col("n").cast(D38) * col("__q") - col("__s") * col("__s") > 0,
            expr(s"""CAST(CAST(n AS $D38) * __d2 * 1000000
                     div (CAST(n AS $D38) * __q - __s * __s)
                     AS BIGINT)"""))
          .otherwise(lit(null).cast("long")))
      .select((seriesCols.map(col) ++ Seq(col("n"), col("dw_ppm"))): _*)
  }

  /** Turning-point test per series — the assumption-light randomness check
    * (counts STRICT local extrema; under i.i.d. data E[R] = 2(n−2)/3,
    * V[R] = (16n−29)/90):
    *   z² = (R−E)²/V = (3R − 2(n−2))²·10 / (16n − 29)
    * — rational in the extrema count, emitted as exact integer ppm (the
    * square keeps the dividend positive). Plateaus (equal neighbours) are
    * NOT extrema — strict inequalities both sides, declared semantics.
    * One lag+lead pass partitioned by series; NULL when n < 3. Series
    * past 10⁷ observations fail loudly.
    *
    * @return one row per series: `seriesCols…, n, turning_points, z2_ppm`
    */
  def turningPoints(df: DataFrame, seriesCols: Seq[String],
                    orderCol: String, valueCol: String): DataFrame = {
    val w = Window.partitionBy(seriesCols.map(col): _*)
      .orderBy(col(orderCol))
    val led = df
      .withColumn("__x", col(valueCol).cast("long"))
      .withColumn("__xp", lag("__x", 1).over(w))
      .withColumn("__xn", lead("__x", 1).over(w))
      .withColumn("__tp",
        when(col("__xp").isNotNull && col("__xn").isNotNull &&
          ((col("__x") > col("__xp") && col("__x") > col("__xn")) ||
           (col("__x") < col("__xp") && col("__x") < col("__xn"))), 1L)
          .otherwise(0L))
    led.groupBy(seriesCols.map(col): _*)
      .agg(count(lit(1)).cast("long").as("n"),
        sum("__tp").cast("long").as("turning_points"))
      .withColumn("z2_ppm",
        when(col("n") >= lit(10000000L),
          raise_error(concat(lit("turningPoints: series length "), col("n"),
            lit(" exceeds the exact-arithmetic bound 1e7 - " +
              "aggregate to a coarser grain first"))))
          .when(col("n") >= 3,
            expr(s"""CAST(
              (CAST(3 AS $D38) * turning_points - CAST(2 AS $D38) * (n - 2)) *
              (CAST(3 AS $D38) * turning_points - CAST(2 AS $D38) * (n - 2)) *
              10 * 1000000 div (CAST(16 AS $D38) * n - 29) AS BIGINT)"""))
          .otherwise(lit(null).cast("long")))
  }

  /** Mann–Kendall trend test per series — THE standard monotone-trend
    * detector for environmental/operational series (distribution-free,
    * tie-aware): S = Σ_{i<j} sgn(x_j − x_i) over time-ordered pairs, with
    * the tie-corrected null variance
    *   18·V = n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)
    * over tied-value group sizes t, and z² = S²·18 div (18·V) as exact
    * integer ppm (squared dividend; no continuity correction — declared
    * semantics). NULL when 18·V ≤ 0 (n < 2 or all values tied).
    *
    * Scale shape: the pair sweep is ONE self-join per series on the
    * ALREADY-AGGREGATED series frame (day/hour grain → calendar-bounded,
    * the q192 Theil–Sen discipline) — O(n²) pairs per series by design,
    * so per-series length is capped LOUDLY at 10⁵ observations
    * (aggregate to a coarser grain first); the tie spectrum is one hash
    * agg.
    *
    * @return one row per series: `seriesCols…, n, s_stat, v18, z2_ppm,
    *         trend_up`
    */
  def mannKendall(df: DataFrame, seriesCols: Seq[String], orderCol: String,
                  valueCol: String): DataFrame = {
    val seg = seriesCols.map(col)
    val base = df.select((seg :+ col(orderCol).as("__o") :+
      col(valueCol).cast("long").as("__x")): _*)
    val lhs = base.toDF(base.columns.map(c => s"${c}__l").toIndexedSeq: _*)
    val joinCond = seriesCols.map(c => col(s"${c}__l") === col(c))
      .reduce(_ && _) && col("__o__l") < col("__o")
    val pairs = lhs.join(base, joinCond)
      .groupBy(seg: _*)
      .agg(sum(signum(col("__x") - col("__x__l")).cast("long"))
        .cast("long").as("s_stat"))
    val ties = base
      .groupBy((seg :+ col("__x")): _*)
      .agg(count(lit(1)).cast("long").as("t"))
      .groupBy(seg: _*)
      .agg(count(lit(1)).cast("long").as("__nvals"),
        sum("t").cast("long").as("n"),
        sum(col("t").cast(D38) * (col("t") - 1) *
          (lit(2) * col("t") + 5)).cast(D38).as("__tie18"))
    ties.join(pairs, seriesCols, "left")
      .withColumn("s_stat", coalesce(col("s_stat"), lit(0L)))
      .withColumn("v18",
        when(col("n") >= lit(100000L),
          raise_error(concat(lit("mannKendall: series length "), col("n"),
            lit(" exceeds the O(n^2) pair bound 1e5 - " +
              "aggregate to a coarser grain first"))))
          .otherwise(expr(s"""CAST(CAST(n AS $D38) * (n - 1) *
                   (CAST(2 AS $D38) * n + 5) - __tie18 AS BIGINT)""")))
      .withColumn("z2_ppm",
        when(col("v18") > 0,
          expr(s"""CAST(CAST(s_stat AS $D38) * s_stat * 18 * 1000000
                   div v18 AS BIGINT)"""))
          .otherwise(lit(null).cast("long")))
      .withColumn("trend_up", col("s_stat") > 0)
      .select((seg ++ Seq(col("n"), col("s_stat"), col("v18"),
        col("z2_ppm"), col("trend_up"))): _*)
  }

  /** Index of dispersion per group over integer counts: the Poisson QA
    * gate (variance-to-mean ≈ 1 for Poisson arrivals; ≫1 = bursty, ≪1 =
    * regularized). χ²_disp = Σ(x−x̄)²/x̄ = (n·Σx² − S²)/S and the VMR
    * itself = χ²/(n−1) — both rational in the exact sums (dividend ≥ 0 by
    * Cauchy–Schwarz), emitted as integer ppm. One hash agg per group.
    * NULL when S = 0 (no mass) or, for VMR, n < 2.
    *
    * @return one row per group: `groupCols…, n, sum_c, chi2_ppm, vmr_ppm`
    */
  def dispersionIndex(df: DataFrame, groupCols: Seq[String],
                      countCol: String): DataFrame = {
    val c = col(countCol).cast(D38)
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).cast("long").as("n"),
        sum(c).cast(D38).as("__s"),
        sum(c * c).cast(D38).as("__q"))
      .withColumn("sum_c", col("__s").cast("long"))
      .withColumn("chi2_ppm",
        when(col("__s") > 0,
          expr(s"""CAST((CAST(n AS $D38) * __q - __s * __s) * 1000000
                   div __s AS BIGINT)"""))
          .otherwise(lit(null).cast("long")))
      .withColumn("vmr_ppm",
        when(col("__s") > 0 && col("n") > 1,
          expr(s"""CAST((CAST(n AS $D38) * __q - __s * __s) * 1000000
                   div (__s * (n - 1)) AS BIGINT)"""))
          .otherwise(lit(null).cast("long")))
      .select((groupCols.map(col) ++
        Seq(col("n"), col("sum_c"), col("chi2_ppm"), col("vmr_ppm"))): _*)
  }

  /** Ljung–Box portmanteau test per series (Ljung & Box 1978) — "is this
    * series white noise ACROSS the first L lags jointly", the closing
    * statistic of the [[acf]] family: Q = n(n+2)·Σ_{k≤L} ρ̂_k²/(n−k),
    * χ²_L under the null.
    *
    * Composition discipline (the q359 Mood shape): each ρ̂_k comes from
    * the [[acf]] kernel's already-quantized sign-split ×10⁶ surface, so
    * Q replays EXACTLY from L declared-quantized inputs — per-lag term
    * t_k = ρ_k,x1e6² div (n−k) (the one varying-denominator floor, KW
    * discipline), lb_x1e6 = n(n+2)·Σt div 10⁶. Constant/short series
    * contribute no term at the affected lags; `n_lags` reports how many
    * of the L lags actually entered. NULL Q when none did. L lead()
    * passes, each PARTITIONED by series.
    *
    * @return one row per series: `seriesCols…, n, n_lags, lb_x1e6`
    */
  def ljungBox(df: DataFrame, seriesCols: Seq[String], orderCol: String,
               valueCol: String, maxLag: Int): DataFrame = {
    require(maxLag >= 1, s"maxLag must be positive, got $maxLag")
    val per = (1 to maxLag).map { k =>
      acf(df, seriesCols, orderCol, valueCol, k)
        .withColumn("__k", lit(k.toLong))
    }.reduce(_.unionByName(_))
    per
      .withColumn("__t",
        when(col("acf_x1e6").isNotNull && col("n") > col("__k"),
          expr(s"""CAST(CAST(acf_x1e6 AS $D38) * acf_x1e6
                   div (n - __k) AS BIGINT)""")))
      .groupBy(seriesCols.map(col): _*)
      .agg(max("n").cast("long").as("n"),
        sum(when(col("__t").isNotNull, 1L).otherwise(0L))
          .cast("long").as("n_lags"),
        sum("__t").cast(D38).as("__T"))
      .withColumn("lb_x1e6",
        when(col("n_lags") > 0,
          expr(s"""CAST(CAST(n AS $D38) * (n + 2) * __T div 1000000
                   AS BIGINT)"""))
          .otherwise(lit(null).cast("long")))
      .select((seriesCols.map(col) ++
        Seq(col("n"), col("n_lags"), col("lb_x1e6"))): _*)
  }

  /** Pettitt changepoint test per series (Pettitt 1979) — the rank-based
    * "WHEN did this series shift" companion of [[mannKendall]]'s "does it
    * trend": U_t = Σ_{i≤t, j>t} sgn(x_i − x_j), K = max_t |U_t|, and the
    * argmax t* is the last index of the first segment.
    *
    * Never the O(n²) pair sweep: V_t = Σ_{j≠t} sgn(x_t − x_j) = #[<x_t] −
    * #[>x_t] comes from ONE ordered pass over the per-series COLLAPSED
    * value domain (self-comparison contributes sgn 0, so no exclusion
    * needed), rows join back to their domain row, and the telescoping
    * identity U_t = U_{t−1} + V_t makes U one cumulative window per
    * series. All exact integers; ties for the max break to the SMALLEST
    * order value (declared, both engines replay it). The last row (U_n =
    * 0 identically) is excluded per the 1 ≤ t < n definition.
    *
    * Significance: the standard approximation p ≈ 2·exp(−6K²/(n³+n²)) is
    * transcendental, so the hashed verdict replays the exact integer
    * comparison 6K²·10⁶ ≥ 3688879·(n³+n²) — the q6 floor of ln 40, i.e.
    * p < 0.05 under the approximation (declared constant). The compare
    * runs in DECIMAL(38,0): 6K²·10⁶ ≤ 1.5·n⁴·10⁶ passes 2⁶³ from
    * n ≈ 1,600 — exactly the silent-NULL regime the BIGINT cast would
    * hit — and stays exact to n < 10⁷, where the loud bound fires.
    * Length-1 series (no interior split point) are absent from the
    * report — the oracle's identical rn < n filter replays that.
    *
    * @return one row per series: `seriesCols…, n, k_stat, t_star, u_star,
    *         significant, shift_down`
    */
  def pettitt(df: DataFrame, seriesCols: Seq[String], orderCol: String,
              valueCol: String): DataFrame = {
    val seg = seriesCols.map(col)
    val base = df.select((seg :+ col(orderCol).cast("long").as("__o") :+
      col(valueCol).cast("long").as("__x")): _*)
    val dom = base.groupBy((seg :+ col("__x")): _*)
      .agg(count(lit(1)).cast("long").as("__cnt"))
    val wBefore = Window.partitionBy(seg: _*).orderBy(col("__x"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wUpto = Window.partitionBy(seg: _*).orderBy(col("__x"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(seg: _*)
    val vByVal = dom
      .withColumn("__lt", coalesce(sum("__cnt").over(wBefore), lit(0L)))
      .withColumn("__upto", sum("__cnt").over(wUpto).cast("long"))
      .withColumn("__n", sum("__cnt").over(wAll).cast("long"))
      // V for a row at value x: #[< x] − #[> x]
      .withColumn("__v", col("__lt") - (col("__n") - col("__upto")))
      .select((seg ++ Seq(col("__x"), col("__v"), col("__n"))): _*)
    val wOrd = Window.partitionBy(seg: _*).orderBy(col("__o"))
    val u = base.join(vByVal, seriesCols :+ "__x")
      .withColumn("__u",
        sum("__v").over(wOrd.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)).cast("long"))
      .withColumn("__rn", row_number().over(wOrd).cast("long"))
      .filter(col("__rn") < col("__n"))
    u.groupBy(seg: _*)
      .agg(
        max("__n").cast("long").as("n"),
        // lexicographic struct max: largest |U|, ties to the smallest
        // order value (negated), carrying the signed U and the order
        max(struct(abs(col("__u")).as("k"), (-col("__o")).as("no"),
          col("__u").as("u"))).as("__m"))
      .select((seg ++ Seq(col("n"),
        col("__m.k").as("k_stat"),
        (-col("__m.no")).cast("long").as("t_star"),
        col("__m.u").as("u_star"))): _*)
      .withColumn("significant",
        when(col("n") >= lit(10000000L),
          raise_error(concat(lit("pettitt: series length "), col("n"),
            lit(" exceeds the exact-arithmetic bound 1e7 - " +
              "aggregate to a coarser grain first"))))
          .otherwise(
            expr(s"""CAST(6 AS $D38) * k_stat * k_stat * 1000000 >=
                     CAST(3688879 AS $D38) *
                     (CAST(n AS $D38) * n * n + CAST(n AS $D38) * n)""")))
      .withColumn("shift_down", col("u_star") > 0)
  }
}
