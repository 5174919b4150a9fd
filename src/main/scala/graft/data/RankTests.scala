package graft.data

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** k-sample and paired rank tests over COLLAPSED domains — the
  * nonparametric siblings of q307's ANOVA (Kruskal–Wallis), q313's paired
  * McNemar (Friedman), and q246's Mann–Whitney (Cliff's delta effect
  * size), reference-free quality gates a data pipeline runs when value
  * distributions are skewed enough that moment tests mislead.
  *
  * Scale shape (the RankStats layout): raw rows collapse to per-(group,
  * value) or per-(block, treatment) cells in ONE hash aggregation with
  * map-side combine; ranks come from ordered passes over that collapsed
  * frame — the VALUE DOMAIN for Kruskal–Wallis/Cliff (bounded for
  * discrete measurements), the per-block k-row partitions for Friedman —
  * never a corpus-sized sort.
  *
  * Oracle determinism (the round-11/12 discipline): doubled tie-averaged
  * midranks (2·avg_rank = 2·cum_before + tie_count + 1) keep every rank
  * integral with full tie correction; each statistic is rational in those
  * integers and emitted as an exact cross-multiplied integer quotient —
  * (dividend · 10^k) div divisor in DECIMAL(38,0), positive dividends via
  * squares, sign-split abs-division where the value can be negative
  * (Cliff's delta) — so Spark's `div` and DuckDB's HUGEINT `//` agree
  * bit-for-bit. The only per-term quantization is Kruskal–Wallis'
  * between-group sum (varying n_g denominators → one q9 floor per group,
  * the logRank increment discipline). No doubles anywhere.
  */
object RankTests {

  private val D38 = "decimal(38,0)"

  /** Kruskal–Wallis H (rank one-way ANOVA, tie-corrected) from per-(group,
    * value) counts `(g, v, c)`.
    *
    * With doubled midranks r2 (mean doubled rank = N+1 exactly):
    *   B = Σ_g (R2_g − n_g(N+1))² / n_g   (between-group, doubled units)
    *   W = Σ_v t_v (r2_v − (N+1))²        (total, doubled units — integer)
    *   H = (N−1)·B/W
    * The per-group quotients have varying denominators, so each is
    * quantized ONCE as an exact q9 floor (positive dividend — a square),
    * summed in DECIMAL(38,0), and H ×10⁶ = (N−1)·b2_q9 div (W·1000).
    * The audit columns `w2_den` (~N³/3) and `b2_q9` (up to ~4N³·10⁹)
    * exceed BIGINT long before the 10⁷ exactness bound (empirically at
    * N ≈ 6·10⁵ on skewed groups), so they stay DECIMAL(38,0) end to end —
    * the per-group floor uses the mod-subtract identity (D − D mod n)/n
    * because Spark's `div` narrows to BIGINT — and the hashed surface
    * emits them as digit STRINGS (both engines print identical digits);
    * only the bounded `h_ppm` ≤ N·10⁶ is BIGINT. NULL when W = 0 (every
    * observation one value). The N ≥ 10⁷ bound fails loudly: the squared
    * dividend needs (2·n_g·N)²·10⁹ < 10³⁸.
    *
    * @param cells one row per (group, value): `g, v, c` with `v` orderable
    *              and `c` a positive count
    * @return one row: `n_total, k_groups, w2_den (string), b2_q9 (string),
    *         h_ppm`
    */
  def kruskalWallisFromCounts(cells: DataFrame): DataFrame = {
    val before = Window.orderBy(col("v"))
      .rangeBetween(Window.unboundedPreceding, -1)
    val ties = Window.orderBy(col("v")).rangeBetween(0, 0)
    val all = Window.partitionBy()
    val ranked = cells
      .withColumn("__cum_before",
        coalesce(sum("c").over(before), lit(0L)))
      .withColumn("__tv", sum("c").over(ties).cast("long"))
      .withColumn("__r2",
        lit(2L) * col("__cum_before") + col("__tv") + lit(1L))
      .withColumn("__n", sum("c").over(all).cast("long"))
    val perG = ranked.groupBy("g")
      .agg(sum("c").cast("long").as("ng"),
        sum(col("c").cast(D38) * col("__r2")).cast(D38).as("r2g"),
        // W contribution: Σ c·(r2 − (N+1))² — exact integer, no division
        sum(col("c").cast(D38) *
          (col("__r2").cast(D38) - (col("__n") + 1)) *
          (col("__r2").cast(D38) - (col("__n") + 1))).cast(D38).as("w2g"),
        max("__n").cast("long").as("n"))
    perG
      // between-group term (R2_g − n_g(N+1))²·10⁹ floor-div n_g: the one
      // varying-denominator quotient — quantized once per group (q9
      // floor, positive dividend), then summed exactly. The quotient can
      // reach ~4·n_g·N²·10⁹ ≫ 2⁶³, so it must stay DECIMAL: `div` would
      // narrow to BIGINT and non-ANSI Spark would NULL it silently while
      // DuckDB's cast errors — the mod-subtract identity keeps the floor
      // exact in DECIMAL(38,6) (integral, ≤ 10³² representable)
      .withColumn("__b2_q9",
        when(col("n") >= lit(10000000L),
          raise_error(concat(lit("kruskalWallis: N = "), col("n"),
            lit(" exceeds the exact-arithmetic bound 1e7 - " +
              "bucket values / sample first"))))
          .otherwise(expr(s"""CAST((
              (CAST(r2g AS $D38) - CAST(ng AS $D38) * (n + 1)) *
              (CAST(r2g AS $D38) - CAST(ng AS $D38) * (n + 1)) *
              1000000000 -
              ((CAST(r2g AS $D38) - CAST(ng AS $D38) * (n + 1)) *
               (CAST(r2g AS $D38) - CAST(ng AS $D38) * (n + 1)) *
               1000000000) % ng) / ng AS $D38)"""))
          .cast(D38))
      .agg(
        max("n").cast("long").as("n_total"),
        count(lit(1)).cast("long").as("k_groups"),
        sum("w2g").cast(D38).as("__w2"),
        sum("__b2_q9").cast(D38).as("__b2"))
      // H ×10⁶ = (N−1)·B_q9·10⁶ div (W·10⁹) = (N−1)·B_q9 div (W·1000)
      .withColumn("h_ppm",
        when(col("__w2") > 0,
          expr(s"""CAST(CAST(n_total - 1 AS $D38) * __b2
                   div (__w2 * 1000) AS BIGINT)"""))
          .otherwise(lit(null).cast("long")))
      .select(col("n_total"), col("k_groups"),
        col("__w2").cast("string").as("w2_den"),
        col("__b2").cast("string").as("b2_q9"),
        col("h_ppm"))
  }

  /** Friedman test (+ Kendall's W concordance) from a COMPLETE-BLOCK
    * relation: one row per (block, treatment) with an orderable value.
    * Within-block doubled midranks keep everything integral:
    *   B2 = Σ_j (R2_j − b(k+1))²            (between-treatment — integer)
    *   W2 = Σ_{blocks, i} (r2_i − (k+1))²   (total — integer)
    *   χ²_F = (k−1)·B2/W2,   Kendall's W = B2/(b·W2)
    * both exact cross-multiplied integer ppm quotients with positive
    * dividends — zero doubles, no per-term quantization at all (blocks
    * share the constant k). NULL when W2 = 0 (all values tied within
    * every block). A RAGGED panel — any block missing a treatment,
    * duplicating one, or carrying extras — fails loudly (the Fleiss
    * discipline: silent mis-weighting is worse than an error).
    *
    * @param obs one row per (block, treatment): `blockCol, treatCol,
    *            valueCol` (orderable; ties get midranks)
    * @return one row: `b_blocks, k_treatments, w2_den, chi2_ppm, w_ppm`
    */
  def friedman(obs: DataFrame, blockCol: String, treatCol: String,
               valueCol: String): DataFrame = {
    val wB = Window.partitionBy(col(blockCol))
    val wBV = Window.partitionBy(col(blockCol), col(valueCol))
    val ranked = obs
      .withColumn("__rank", rank().over(wB.orderBy(col(valueCol))))
      .withColumn("__teq", count(lit(1)).over(wBV).cast("long"))
      .withColumn("__r2",
        lit(2L) * col("__rank") + col("__teq") - lit(1L))
      .withColumn("__kb", count(lit(1)).over(wB).cast("long"))
      .withColumn("__kdist",
        size(collect_set(col(treatCol)).over(wB)).cast("long"))
    val perT = ranked.groupBy(col(treatCol).as("treat"))
      .agg(count(lit(1)).cast("long").as("b"),
        sum("__r2").cast("long").as("r2j"),
        min("__kb").cast("long").as("__kb_min"),
        max("__kb").cast("long").as("__kb_max"),
        min("__kdist").cast("long").as("__kd_min"),
        // W contribution with k constant per block: Σ (r2 − (k+1))²
        sum((col("__r2").cast(D38) - (col("__kb") + 1)) *
          (col("__r2").cast(D38) - (col("__kb") + 1))).cast(D38).as("w2t"))
    val all = Window.partitionBy()
    perT
      .withColumn("__k", count(lit(1)).over(all).cast("long"))
      .withColumn("__b2t",
        (col("r2j").cast(D38) - col("b").cast(D38) * (col("__k") + 1)) *
          (col("r2j").cast(D38) - col("b").cast(D38) * (col("__k") + 1)))
      .agg(
        max("b").cast("long").as("b_blocks"),
        max("__k").cast("long").as("k_treatments"),
        min("b").cast("long").as("__b_min"),
        min("__kb_min").cast("long").as("__kb_min"),
        max("__kb_max").cast("long").as("__kb_max"),
        min("__kd_min").cast("long").as("__kd_min"),
        sum("w2t").cast("long").as("w2_den"),
        sum("__b2t").cast(D38).as("__b2"))
      // the completeness check rides the chi2 branch chain so the
      // optimizer can never prune an unused guard column
      .withColumn("chi2_ppm",
        when(col("__b_min") =!= col("b_blocks") ||
          col("__kb_min") =!= col("k_treatments") ||
          col("__kb_max") =!= col("k_treatments") ||
          col("__kd_min") =!= col("k_treatments"),
          raise_error(concat(
            lit("friedman: ragged panel - every block must have exactly "),
            col("k_treatments"),
            lit(" distinct treatments and every treatment all blocks"))))
          .when(col("w2_den") > 0,
            expr(s"""CAST(CAST(k_treatments - 1 AS $D38) * __b2 * 1000000
                     div w2_den AS BIGINT)"""))
          .otherwise(lit(null).cast("long")))
      .withColumn("w_ppm",
        when(col("w2_den") > 0,
          expr(s"""CAST(__b2 * 1000000
                   div (CAST(b_blocks AS $D38) * w2_den) AS BIGINT)"""))
          .otherwise(lit(null).cast("long")))
      .select("b_blocks", "k_treatments", "w2_den",
        "chi2_ppm", "w_ppm")
  }

  /** Page's L trend test — [[friedman]]'s ORDERED-alternative sibling
    * (Page 1963): within complete blocks, do the treatments' ranks RISE
    * with the treatment order (learning curves, dose schedules, epoch
    * progression)? L = Σ_j j·R_j over the treatment order j = 1..k.
    *
    * Same within-block doubled-midrank pass as [[friedman]]; the order
    * index comes from one row_number over the k-treatment aggregate frame
    * (the collapsed-frame exception). In doubled units: L2 = Σ j·R2_j,
    * E[L2] = b·k(k+1)² div 2 (always even — exact), and under the NO-TIES
    * null V[L] = b·(k³−k)²/(144(k−1)), so
    *   z² = (L2 − E[L2])²·36·(k−1) div (b·(k³−k)²)
    * as exact integer ppm (squared dividend; the tie-corrected variance
    * is deliberately omitted — declared semantics, conservative under
    * ties). NULL when k < 2. Ragged panels fail loudly.
    *
    * @param treatCol NUMERIC — its ascending order IS the alternative
    * @return one row: `b_blocks, k_treatments, l2, e_l2, z2_ppm,
    *         trend_up`
    */
  def pageTrend(obs: DataFrame, blockCol: String, treatCol: String,
                valueCol: String): DataFrame = {
    val wB = Window.partitionBy(col(blockCol))
    val wBV = Window.partitionBy(col(blockCol), col(valueCol))
    val ranked = obs
      .withColumn("__rank", rank().over(wB.orderBy(col(valueCol))))
      .withColumn("__teq", count(lit(1)).over(wBV).cast("long"))
      .withColumn("__r2",
        lit(2L) * col("__rank") + col("__teq") - lit(1L))
      .withColumn("__kb", count(lit(1)).over(wB).cast("long"))
      .withColumn("__kdist",
        size(collect_set(col(treatCol)).over(wB)).cast("long"))
    val perT = ranked.groupBy(col(treatCol).as("treat"))
      .agg(count(lit(1)).cast("long").as("b"),
        sum("__r2").cast("long").as("r2j"),
        min("__kb").cast("long").as("__kb_min"),
        max("__kb").cast("long").as("__kb_max"),
        min("__kdist").cast("long").as("__kd_min"))
    val wOrd = Window.orderBy(col("treat"))
    perT
      .withColumn("__j", row_number().over(wOrd).cast("long"))
      .agg(
        max("b").cast("long").as("b_blocks"),
        count(lit(1)).cast("long").as("k_treatments"),
        min("b").cast("long").as("__b_min"),
        min("__kb_min").cast("long").as("__kb_min"),
        max("__kb_max").cast("long").as("__kb_max"),
        min("__kd_min").cast("long").as("__kd_min"),
        sum(col("__j").cast(D38) * col("r2j")).cast("long").as("l2"))
      .withColumn("e_l2",
        expr(s"""CAST(CAST(b_blocks AS $D38) * k_treatments *
                 (k_treatments + 1) * (k_treatments + 1) div 2
                 AS BIGINT)"""))
      .withColumn("z2_ppm",
        when(col("__b_min") =!= col("b_blocks") ||
          col("__kb_min") =!= col("k_treatments") ||
          col("__kb_max") =!= col("k_treatments") ||
          col("__kd_min") =!= col("k_treatments"),
          raise_error(concat(
            lit("pageTrend: ragged panel - every block must have exactly "),
            col("k_treatments"),
            lit(" distinct treatments and every treatment all blocks"))))
          .when(col("k_treatments") > 1,
            expr(s"""CAST((CAST(l2 AS $D38) - e_l2) *
                     (CAST(l2 AS $D38) - e_l2) * 36 *
                     (k_treatments - 1) * 1000000
                     div (CAST(b_blocks AS $D38) *
                          (CAST(k_treatments AS $D38) * k_treatments *
                           k_treatments - k_treatments) *
                          (CAST(k_treatments AS $D38) * k_treatments *
                           k_treatments - k_treatments))
                     AS BIGINT)"""))
          .otherwise(lit(null).cast("long")))
      .withColumn("trend_up", col("l2") > col("e_l2"))
      .select("b_blocks", "k_treatments", "l2", "e_l2", "z2_ppm",
        "trend_up")
  }

  /** [[kruskalWallisFromCounts]] per segment — one H statistic PER GROUP
    * KEY from cells `(segCols…, g, v, c)`: the segment-drift report form
    * (grouped-KS layout). Every window is PARTITIONED by segment, so a
    * thousand-segment report parallelizes across segments and no task
    * serializes more than one segment's value domain.
    *
    * @return one row per segment: `segCols…, n_total, k_groups, w2_den
    *         (string), b2_q9 (string), h_ppm`
    */
  def kruskalWallisFromCountsGrouped(cells: DataFrame,
                                     segCols: Seq[String]): DataFrame = {
    require(segCols.nonEmpty,
      "use kruskalWallisFromCounts for the ungrouped form")
    val seg = segCols.map(col)
    val before = Window.partitionBy(seg: _*).orderBy(col("v"))
      .rangeBetween(Window.unboundedPreceding, -1)
    val ties = Window.partitionBy(seg: _*).orderBy(col("v"))
      .rangeBetween(0, 0)
    val all = Window.partitionBy(seg: _*)
    val ranked = cells
      .withColumn("__cum_before",
        coalesce(sum("c").over(before), lit(0L)))
      .withColumn("__tv", sum("c").over(ties).cast("long"))
      .withColumn("__r2",
        lit(2L) * col("__cum_before") + col("__tv") + lit(1L))
      .withColumn("__n", sum("c").over(all).cast("long"))
    val perG = ranked.groupBy((seg :+ col("g")): _*)
      .agg(sum("c").cast("long").as("ng"),
        sum(col("c").cast(D38) * col("__r2")).cast(D38).as("r2g"),
        sum(col("c").cast(D38) *
          (col("__r2").cast(D38) - (col("__n") + 1)) *
          (col("__r2").cast(D38) - (col("__n") + 1))).cast(D38).as("w2g"),
        max("__n").cast("long").as("n"))
    perG
      .withColumn("__b2_q9",
        when(col("n") >= lit(10000000L),
          raise_error(concat(lit("kruskalWallis: N = "), col("n"),
            lit(" exceeds the exact-arithmetic bound 1e7 - " +
              "bucket values / sample first"))))
          .otherwise(expr(s"""CAST((
              (CAST(r2g AS $D38) - CAST(ng AS $D38) * (n + 1)) *
              (CAST(r2g AS $D38) - CAST(ng AS $D38) * (n + 1)) *
              1000000000 -
              ((CAST(r2g AS $D38) - CAST(ng AS $D38) * (n + 1)) *
               (CAST(r2g AS $D38) - CAST(ng AS $D38) * (n + 1)) *
               1000000000) % ng) / ng AS $D38)"""))
          .cast(D38))
      .groupBy(seg: _*)
      .agg(
        max("n").cast("long").as("n_total"),
        count(lit(1)).cast("long").as("k_groups"),
        sum("w2g").cast(D38).as("__w2"),
        sum("__b2_q9").cast(D38).as("__b2"))
      .withColumn("h_ppm",
        when(col("__w2") > 0,
          expr(s"""CAST(CAST(n_total - 1 AS $D38) * __b2
                   div (__w2 * 1000) AS BIGINT)"""))
          .otherwise(lit(null).cast("long")))
      .select((segCols.map(col) :+ col("n_total")) ++ Seq(
        col("k_groups"),
        col("__w2").cast("string").as("w2_den"),
        col("__b2").cast("string").as("b2_q9"),
        col("h_ppm")): _*)
  }

  /** Jonckheere–Terpstra ordered-alternative test — "does the value TREND
    * with the ordered group" (dose-response: does quantity rise with
    * priority), strictly more powerful than [[kruskalWallisFromCounts]]
    * when the alternative is monotone. J = Σ_{g<h} U_gh over ordered
    * group pairs, kept integral as 2J = Σ 2·#[x_g < x_h] + #[x_g = x_h].
    *
    * Never the quadratic pair set OR the k² group-pair sweep: the cells
    * densify to the |domain|·k grid (both dims bounded — the value domain
    * collapsed, k the group count), one cumulative pass per dimension
    * (C_g(<v) partitioned by group, then its prefix over the GROUP order
    * partitioned by value), and 2J is one weighted sum over the grid.
    *
    * The hashed surface is all-integer: `j2` = 2J, its null mean `e_j2` =
    * 2E[J] = Σ_{g<h} 2n_g n_h (exact), `v72` = 72·V[J] under the NO-TIES
    * null = n²(2n+3) − Σ n_g²(2n_g+3) (declared semantics — the
    * tie-corrected variance is deliberately omitted; with heavy ties z²
    * is conservative), and z² = (J−E)²/V = (j2−e_j2)²·18 div v72 as exact
    * integer ppm (squared dividend). `v72` ≈ 2n³ exceeds BIGINT at
    * n ≈ 1.66·10⁶ — far below the 10⁷ exactness bound — so it stays
    * DECIMAL(38,0) (≤ 2·10²¹ under the guard) and the hashed surface
    * emits it as a digit STRING; `j2`/`e_j2` ≤ n² ≤ 10¹⁴ and
    * `z2_ppm` ≲ 5n·10⁶ remain BIGINT. NULL z² when v72 ≤ 0; N ≥ 10⁷
    * fails loudly. `trend_up` = (j2 > e_j2) gives the direction.
    *
    * @param cells one row per (group, value): `g` (NUMERIC — the group
    *              ORDER is the alternative), `v` orderable, `c` count
    * @return one row: `n_total, k_groups, j2, e_j2, v72 (string), z2_ppm,
    *         trend_up`
    */
  def jonckheereFromCounts(cells: DataFrame): DataFrame = {
    val grid = cells.select("v").distinct()
      .crossJoin(cells.select("g").distinct())
      .join(cells, Seq("g", "v"), "left")
      .na.fill(0L, Seq("c"))
    val wg = Window.partitionBy("g").orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wv = Window.partitionBy("v").orderBy(col("g"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val terms = grid
      .withColumn("__cum_lt", coalesce(sum("c").over(wg), lit(0L)))
      .withColumn("__t_lt", coalesce(sum("__cum_lt").over(wv), lit(0L)))
      .withColumn("__t_eq", coalesce(sum("c").over(wv), lit(0L)))
    terms.groupBy("g")
      .agg(sum("c").cast("long").as("ng"),
        sum(col("c").cast(D38) *
          (lit(2) * col("__t_lt") + col("__t_eq"))).cast(D38).as("j2g"))
      .agg(
        sum("ng").cast("long").as("n_total"),
        count(lit(1)).cast("long").as("k_groups"),
        sum("j2g").cast("long").as("j2"),
        sum(col("ng").cast(D38) * col("ng")).cast(D38).as("__sq"),
        sum(col("ng").cast(D38) * col("ng") *
          (lit(2) * col("ng") + 3)).cast(D38).as("__sq3"))
      // n² − Σn_g² = 2·Σ_{g<h} n_g·n_h is even, so div 2 is exact
      .withColumn("e_j2",
        expr(s"""CAST((CAST(n_total AS $D38) * n_total - __sq) div 2
                 AS BIGINT)"""))
      // v72 ≈ 2n³ overflows BIGINT at n ≈ 1.66e6, so it stays DECIMAL
      // through the z² division and reaches the surface as digits
      .withColumn("__v72",
        expr(s"""CAST(CAST(n_total AS $D38) * n_total *
                 (CAST(2 AS $D38) * n_total + 3) - __sq3 AS $D38)"""))
      .withColumn("z2_ppm",
        when(col("n_total") >= lit(10000000L),
          raise_error(concat(lit("jonckheere: N = "), col("n_total"),
            lit(" exceeds the exact-arithmetic bound 1e7 - " +
              "bucket values / sample first"))))
          .when(col("__v72") > 0,
            expr(s"""CAST((CAST(j2 AS $D38) - e_j2) *
                     (CAST(j2 AS $D38) - e_j2) * 18 * 1000000
                     div __v72 AS BIGINT)"""))
          .otherwise(lit(null).cast("long")))
      .withColumn("trend_up", col("j2") > col("e_j2"))
      .select(col("n_total"), col("k_groups"), col("j2"), col("e_j2"),
        col("__v72").cast("string").as("v72"), col("z2_ppm"),
        col("trend_up"))
  }

  /** Lepage two-sample location–scale test from per-domain-value counts
    * `(v, ca, cb)` — the joint "did the center OR the spread move" gate
    * (Lepage 1971): L = z²_W + z²_AB, the standardized Wilcoxon rank-sum
    * (location, q246's statistic) plus the standardized Ansari–Bradley
    * (scale: ranks folded from both ends, a = min(r, n+1−r)), both from
    * ONE ordered pass over the collapsed combined domain.
    *
    * Doubled midranks keep everything integral: r2 as usual, the folded
    * score a2 = min(r2, 2(n+1) − r2), W2 = Σ ca·r2, A2 = Σ ca·a2. With
    * the declared NO-TIES null variances (the [[jonckheereFromCounts]]
    * convention — conservative under heavy ties):
    *   z²_W  = 3·(W2 − n_a(n+1))² / (n_a·n_b·(n+1))
    *   z²_AB = 3(n−1)·(2A2 − n_a(n+2))² / (n_a·n_b·(n+2)(n−2))   n even
    *         = 3·(2n·A2 − n_a(n+1)²)² / (n_a·n_b·(n+1)(3+n²))    n odd
    * all exact integer quotients (squared dividends). The odd-parity
    * dividend ~12n⁶ needs n < 10⁶ for DECIMAL(38,0) exactness (fails
    * loudly above), and its ·10⁶ ppm scaling would pass 10³⁸ — so both
    * z² floors come out by exact TWO-LIMB long division (the
    * [[hoeffdingFromCells]] recipe): q0 = num div den, then q0·10⁶ +
    * (rem·10⁶) div den. NULL when either sample is empty or n ≤ 2.
    *
    * @return one row: `n_total, n_a, n_b, w2, ab2, zw2_ppm, za2_ppm,
    *         lepage_ppm`
    */
  def lepageFromCounts(counts: DataFrame): DataFrame = {
    val before = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val all = Window.partitionBy()
    val ranked = counts
      .withColumn("__t", (col("ca") + col("cb")).cast("long"))
      .withColumn("__cum", coalesce(sum("__t").over(before), lit(0L)))
      .withColumn("__n", sum("__t").over(all).cast("long"))
      .withColumn("__r2", lit(2L) * col("__cum") + col("__t") + 1L)
      .withColumn("__a2",
        least(col("__r2"), lit(2L) * (col("__n") + 1) - col("__r2")))
    val agg = ranked.agg(
      max("__n").cast("long").as("n_total"),
      sum("ca").cast("long").as("n_a"),
      sum("cb").cast("long").as("n_b"),
      sum(col("ca").cast(D38) * col("__r2")).cast("long").as("w2"),
      sum(col("ca").cast(D38) * col("__a2")).cast("long").as("ab2"))
    val valid = col("n_a") > 0 && col("n_b") > 0 && col("n_total") > 2
    agg
      .withColumn("__numw",
        when(col("n_total") >= lit(1000000L),
          raise_error(concat(lit("lepage: N = "), col("n_total"),
            lit(" exceeds the exact-arithmetic bound 1e6 - " +
              "bucket values / sample first"))))
          .otherwise(expr(s"""
            CAST(3 AS $D38) *
            (CAST(w2 AS $D38) - CAST(n_a AS $D38) * (n_total + 1)) *
            (CAST(w2 AS $D38) - CAST(n_a AS $D38) * (n_total + 1))"""))
          .cast(D38))
      .withColumn("__denw",
        when(valid, expr(s"""CAST(n_a AS $D38) * n_b * (n_total + 1)"""))
          .otherwise(lit(1).cast(D38)))
      .withColumn("__numa",
        expr(s"""CASE WHEN n_total % 2 = 0 THEN
                   CAST(3 AS $D38) * (n_total - 1) *
                   (CAST(2 AS $D38) * ab2 - CAST(n_a AS $D38) *
                    (n_total + 2)) *
                   (CAST(2 AS $D38) * ab2 - CAST(n_a AS $D38) *
                    (n_total + 2))
                 ELSE
                   CAST(3 AS $D38) *
                   (CAST(2 AS $D38) * n_total * ab2 - CAST(n_a AS $D38) *
                    (n_total + 1) * (n_total + 1)) *
                   (CAST(2 AS $D38) * n_total * ab2 - CAST(n_a AS $D38) *
                    (n_total + 1) * (n_total + 1))
                 END"""))
      .withColumn("__dena",
        when(valid,
          expr(s"""CASE WHEN n_total % 2 = 0 THEN
                     CAST(n_a AS $D38) * n_b * (n_total + 2) *
                     (n_total - 2)
                   ELSE
                     CAST(n_a AS $D38) * n_b * (n_total + 1) *
                     (CAST(n_total AS $D38) * n_total + 3)
                   END"""))
          .otherwise(lit(1).cast(D38)))
      // two-limb exact q6 floors (num·10⁶ would pass 10³⁸ at the bound)
      .withColumn("__qw", expr("CAST(__numw div __denw AS BIGINT)"))
      .withColumn("__qa", expr("CAST(__numa div __dena AS BIGINT)"))
      .withColumn("zw2_ppm",
        when(valid,
          col("__qw") * 1000000L +
            expr(s"""CAST((__numw - __qw * __denw) * 1000000 div __denw
                     AS BIGINT)"""))
          .otherwise(lit(null).cast("long")))
      .withColumn("za2_ppm",
        when(valid,
          col("__qa") * 1000000L +
            expr(s"""CAST((__numa - __qa * __dena) * 1000000 div __dena
                     AS BIGINT)"""))
          .otherwise(lit(null).cast("long")))
      .withColumn("lepage_ppm", col("zw2_ppm") + col("za2_ppm"))
      .select("n_total", "n_a", "n_b", "w2", "ab2", "zw2_ppm",
        "za2_ppm", "lepage_ppm")
  }

  /** Hoeffding's D independence test from JOINT per-(x, y) counts —
    * the rank-dependence measure that sees what Spearman (q247) and
    * Kendall (q248) are blind to: NON-monotone association (a V-shaped
    * or circular relation has ρ ≈ τ ≈ 0 but D > 0). Hoeffding 1948;
    * tie conventions per the classical bivariate-rank form (ties count
    * half, coincident points a quarter).
    *
    * Never the O(n²) point-pair space: on the Dx×Dy joint-domain grid,
    * the bivariate rank Q_i of every point in a cell is a CELL quantity —
    * quadrupled to stay integral under tie-halving,
    *   q4 = 4·#[x'<x ∧ y'<y] + 2·#[x'=x ∧ y'<y] + 2·#[x'<x ∧ y'=y]
    *        + (c − 1),
    * with the dominance count from the q248 two-window cascade (per-y
    * prefix over x, then per-x prefix over y) and doubled midranks R2/S2
    * from the marginal domains. The three Hoeffding sums are emitted in
    * 16ths (exact integers):
    *   d1_16 = Σ c·q4·(q4−4)                 [16·Σ(Q−1)(Q−2)]
    *   d2_16 = Σ c·(R2−2)(R2−4)(S2−2)(S2−4)  [16·Σ(R−1)(R−2)(S−1)(S−2)]
    *   d3_16 = Σ c·(R2−4)(S2−4)·q4           [16·Σ(R−2)(S−2)(Q−1)]
    * and D = 30·((n−2)(n−3)D1 + D2 − 2(n−2)D3) / (n(n−1)…(n−4)) comes
    * out as `d_x1e9` — sign-split, with the q9 floor of |num|/den by
    * exact two-limb long division because |num|·10⁹ passes both 10³⁸
    * and HUGEINT near the bound (D ∈ [−0.5, 1]; the numerator CAN be
    * negative). d2_16 ~ n⁵ passes 2⁶³ at n ≈ 6,200, so all three sums
    * live in DECIMAL(38,0) and reach the hashed surface as digit
    * STRINGS (the q347 discipline); every intermediate stays under
    * 10³⁷ for n < 10⁶, and n ≥ 10⁶ fails loudly. NULL when n < 5
    * (the U-statistic needs 5 distinct indices).
    *
    * @param cells one row per joint value: `x, y, c` (both orderable,
    *              `c` a positive count)
    * @return one row: `n_total, d1_16 (string), d2_16 (string),
    *         d3_16 (string), d_x1e9`
    */
  def hoeffdingFromCells(cells: DataFrame): DataFrame = {
    val wM = Window.partitionBy("y").orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wLt = Window.partitionBy("x").orderBy(col("y"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val all = Window.partitionBy()
    // marginal doubled midranks, joined back by their own dimension
    def marg(dim: String, out: String): DataFrame = {
      val wb = Window.orderBy(col(dim))
        .rowsBetween(Window.unboundedPreceding, -1)
      cells.groupBy(dim).agg(sum("c").cast("long").as("__t"))
        .withColumn(out,
          lit(2L) * coalesce(sum("__t").over(wb), lit(0L)) +
            col("__t") + 1L)
        .select(col(dim), col(out))
    }
    val grid = cells
      // dominance needs the DENSE grid (absent cells still relay the
      // running sums) — the two prefix windows mirror q248's m/g_lt
      .select("x").distinct().crossJoin(cells.select("y").distinct())
      .join(cells, Seq("x", "y"), "left")
      .withColumn("c0", coalesce(col("c"), lit(0L)))
      .withColumn("__m", coalesce(sum("c0").over(wM), lit(0L)))
      .withColumn("__ltlt", coalesce(sum("__m").over(wLt), lit(0L)))
      .withColumn("__eqlt", coalesce(sum("c0").over(wLt), lit(0L)))
      .filter(col("c0") > 0L)
      .join(marg("x", "__r2"), Seq("x"))
      .join(marg("y", "__s2"), Seq("y"))
      .withColumn("__q4",
        lit(4L) * col("__ltlt") + lit(2L) * col("__eqlt") +
          lit(2L) * col("__m") + (col("c0") - 1L))
    grid.agg(
      sum("c0").cast("long").as("n_total"),
      sum(col("c0").cast(D38) * col("__q4") * (col("__q4") - 4))
        .cast(D38).as("__d1"),
      sum(col("c0").cast(D38) *
        (col("__r2").cast(D38) - 2) * (col("__r2").cast(D38) - 4) *
        (col("__s2").cast(D38) - 2) * (col("__s2").cast(D38) - 4))
        .cast(D38).as("__d2"),
      sum(col("c0").cast(D38) *
        (col("__r2").cast(D38) - 4) * (col("__s2").cast(D38) - 4) *
        col("__q4")).cast(D38).as("__d3"))
      .withColumn("__num",
        when(col("n_total") >= lit(1000000L),
          raise_error(concat(lit("hoeffdingD: N = "), col("n_total"),
            lit(" exceeds the exact-arithmetic bound 1e6 - " +
              "bucket values / sample first"))))
          .otherwise(
            expr(s"""(CAST(n_total - 2 AS $D38) * (n_total - 3) * __d1 +
                     __d2 -
                     CAST(2 AS $D38) * (n_total - 2) * __d3) * 30"""))
          .cast(D38))
      // |num|·10⁹ would pass 10³⁸ (and HUGEINT) near the n bound, so the
      // q9 quotient comes out by exact LONG DIVISION in two limbs —
      // floor(|num|·10⁹/den) = q·10⁹ + r1·10⁴ + floor(rem1·10⁴/den)
      // with q = |num| div den, r = |num| − q·den, r1 = (r·10⁵) div den,
      // rem1 = r·10⁵ − r1·den — every product < 10³⁷, every quotient
      // small; DuckDB replays the identical limbs
      // den = 1 below n = 5 keeps every limb division defined in both
      // ANSI and non-ANSI modes (the d_x1e9 branch still emits NULL
      // there); the oracle replays the same CASE
      .withColumn("__den",
        expr(s"""CASE WHEN n_total >= 5 THEN
                   CAST(16 AS $D38) * n_total * (n_total - 1) *
                   (n_total - 2) * (n_total - 3) * (n_total - 4)
                 ELSE CAST(1 AS $D38) END"""))
      .withColumn("__q", expr("CAST(abs(__num) div __den AS BIGINT)"))
      .withColumn("__r",
        expr(s"CAST(abs(__num) - __q * __den AS $D38)"))
      .withColumn("__r1",
        expr("CAST((__r * 100000) div __den AS BIGINT)"))
      .withColumn("__rem1",
        expr(s"CAST(__r * 100000 - __r1 * __den AS $D38)"))
      .withColumn("d_x1e9",
        when(col("n_total") >= 5,
          (when(col("__num") >= 0, lit(1L)).otherwise(lit(-1L))) *
            (col("__q") * 1000000000L + col("__r1") * 10000L +
              expr("CAST((__rem1 * 10000) div __den AS BIGINT)")))
          .otherwise(lit(null).cast("long")))
      .select(col("n_total"),
        col("__d1").cast("string").as("d1_16"),
        col("__d2").cast("string").as("d2_16"),
        col("__d3").cast("string").as("d3_16"),
        col("d_x1e9"))
  }

  /** Cliff's delta — the ordinal effect size behind q246's U ("HOW
    * shifted", where U answers "is it shifted"): δ = (#[a>b] − #[a<b]) /
    * (n_a·n_b) over all cross pairs, computed from per-domain-value counts
    * `(v, ca, cb)` with cumulative sums — never the quadratic pair set.
    * The pair counts are exact integers (one ordered pass over the
    * collapsed domain); δ ×10⁶ comes out via sign-split abs-division.
    * Emits the partition identity n_gt + n_lt + n_tie = n_a·n_b as a
    * verdict both engines replay. NULL δ when either sample is empty.
    *
    * @return one row: `n_a, n_b, n_gt, n_lt, n_tie, identity_ok,
    *         delta_x1e6`
    */
  def cliffsDeltaFromCounts(counts: DataFrame): DataFrame = {
    val before = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val upTo = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy()
    counts
      .withColumn("__cb_before", coalesce(sum("cb").over(before), lit(0L)))
      .withColumn("__cb_upto", sum("cb").over(upTo).cast("long"))
      .withColumn("__nb", sum("cb").over(all).cast("long"))
      .agg(
        sum("ca").cast("long").as("n_a"),
        sum("cb").cast("long").as("n_b"),
        sum(col("ca").cast(D38) * col("__cb_before")).cast(D38).as("__gt"),
        sum(col("ca").cast(D38) * (col("__nb") - col("__cb_upto")))
          .cast(D38).as("__lt"),
        sum(col("ca").cast(D38) * col("cb")).cast(D38).as("__tie"))
      .select(col("n_a"), col("n_b"),
        col("__gt").cast("long").as("n_gt"),
        col("__lt").cast("long").as("n_lt"),
        col("__tie").cast("long").as("n_tie"))
      .withColumn("identity_ok",
        col("n_gt").cast(D38) + col("n_lt") + col("n_tie") ===
          col("n_a").cast(D38) * col("n_b"))
      .withColumn("delta_x1e6",
        when(col("n_a") > 0 && col("n_b") > 0,
          (when(col("n_gt") >= col("n_lt"), lit(1L)).otherwise(lit(-1L))) *
            expr(s"""CAST(abs(CAST(n_gt AS $D38) - n_lt) * 1000000
                     div (CAST(n_a AS $D38) * n_b) AS BIGINT)"""))
          .otherwise(lit(null).cast("long")))
  }

  /** Brunner–Munzel test (Brunner & Munzel 2000) — the modern
    * Mann–Whitney replacement that stays valid under UNEQUAL variances /
    * shapes (the Behrens–Fisher situation q246's U silently assumes
    * away). From per-domain-value counts `(v, ca, cb)`, one ordered pass
    * over the collapsed domain yields global and within-group doubled
    * midranks; the doubled PLACEMENT p2 = r2_global − r2_within is
    * constant per cell, so both placement-variance sums fold from cell
    * multiplicities:
    *
    *   p̂ = (R̄2_b − (n_b+1)) / (2·n_a)           (P(a<b) + ½P(a=b))
    *   A_i = n_i·Σc·p2² − (Σc·p2)²               (n_i²(n_i−1)·4S_i²… )
    *   W² = d²·(n_a−1)(n_b−1) div
    *        (N·(A_a·n_b²(n_b−1) + A_b·n_a²(n_a−1))),  d = n_a·R2Σ_b − n_b·R2Σ_a
    *
    * all exact integers, one DECIMAL(38,0) division each for p_q6 and
    * w2_ppm. The d²(n−1)²·10⁶ dividend is ~N⁸·10⁶, so N ≥ 5000 fails
    * loudly (pre-collapse to a bounded grain first — the day-grain
    * discipline); NULL W² when both placement variances are zero
    * (complete separation / constant data), NULL p̂ when a side is empty.
    *
    * @return one row: `n_a, n_b, p_q6, w2_ppm, b_stochastically_larger`
    */
  def brunnerMunzelFromCounts(counts: DataFrame): DataFrame = {
    val before = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val all = Window.partitionBy()
    counts
      .withColumn("__cnt", col("ca") + col("cb"))
      .withColumn("__cumN", coalesce(sum("__cnt").over(before), lit(0L)))
      .withColumn("__cumA", coalesce(sum("ca").over(before), lit(0L)))
      .withColumn("__cumB", coalesce(sum("cb").over(before), lit(0L)))
      .withColumn("__r2", lit(2L) * col("__cumN") + col("__cnt") + 1L)
      .withColumn("__r2aw", lit(2L) * col("__cumA") + col("ca") + 1L)
      .withColumn("__r2bw", lit(2L) * col("__cumB") + col("cb") + 1L)
      .withColumn("__p2a", col("__r2") - col("__r2aw"))
      .withColumn("__p2b", col("__r2") - col("__r2bw"))
      .agg(
        sum("ca").cast("long").as("n_a"),
        sum("cb").cast("long").as("n_b"),
        sum(col("ca").cast(D38) * col("__r2")).cast(D38).as("__sa2"),
        sum(col("cb").cast(D38) * col("__r2")).cast(D38).as("__sb2"),
        sum(col("ca").cast(D38) * col("__p2a")).cast(D38).as("__spa"),
        sum(col("cb").cast(D38) * col("__p2b")).cast(D38).as("__spb"),
        sum(col("ca").cast(D38) * col("__p2a") * col("__p2a"))
          .cast(D38).as("__sqa"),
        sum(col("cb").cast(D38) * col("__p2b") * col("__p2b"))
          .cast(D38).as("__sqb"))
      .withColumn("__n",
        when(col("n_a") + col("n_b") >= 5000L,
          raise_error(lit("brunner_munzel: N exceeds the N^8 exact-" +
            "arithmetic envelope (5000) - pre-collapse to a bounded " +
            "grain first"))).otherwise(col("n_a") + col("n_b")))
      .withColumn("__aa",
        expr(s"CAST(CAST(n_a AS $D38) * __sqa - __spa * __spa AS $D38)"))
      .withColumn("__ab",
        expr(s"CAST(CAST(n_b AS $D38) * __sqb - __spb * __spb AS $D38)"))
      .withColumn("__d",
        expr(s"CAST(CAST(n_a AS $D38) * __sb2 - CAST(n_b AS $D38) * __sa2 AS $D38)"))
      .withColumn("__den",
        expr(s"""CAST(CAST(__n AS $D38) *
                 (__aa * n_b * n_b * (n_b - 1) +
                  __ab * n_a * n_a * (n_a - 1)) AS $D38)"""))
      .withColumn("p_q6",
        when(col("n_a") > 0 && col("n_b") > 0,
          expr(s"""CAST((__sb2 - CAST(n_b AS $D38) * (n_b + 1)) * 1000000
                   div (CAST(2 AS $D38) * n_a * n_b) AS BIGINT)"""))
          .otherwise(lit(null).cast("long")))
      .withColumn("w2_ppm",
        when(col("__den") > 0,
          expr(s"""CAST(__d * __d * (n_a - 1) * (n_b - 1) * 1000000
                   div __den AS BIGINT)"""))
          .otherwise(lit(null).cast("long")))
      .withColumn("b_stochastically_larger",
        when(col("n_a") > 0 && col("n_b") > 0,
          expr(s"__sb2 - CAST(n_b AS $D38) * (n_b + 1) > CAST(n_a AS $D38) * n_b"))
          .otherwise(lit(null).cast("boolean")))
      .select("n_a", "n_b", "p_q6", "w2_ppm", "b_stochastically_larger")
  }

  /** Hodges–Lehmann two-sample shift estimator — the robust "HOW FAR is
    * b shifted from a" companion to [[cliffsDeltaFromCounts]]'s "how
    * often": the median of all n_a·n_b cross differences (b − a),
    * computed on the DIFFERENCE DISTRIBUTION of the two collapsed
    * domains — the |Da|·|Db| grid collapses by difference value first
    * (integer domains telescope: |diff domain| ≤ range_a + range_b),
    * never the quadratic observation pair set. Weighted median by the
    * exact integer rule d_lo = smallest diff with 2·cum ≥ M and
    * d_up = smallest diff with 2·cum ≥ M+1 (M = n_a·n_b; equal for odd
    * M), emitted with `hl2 = d_lo + d_up` (TWICE the estimator — exact,
    * no halves). The grid mass is loudly bounded; NULL when a side is
    * empty.
    *
    * @return one row: `n_a, n_b, m_pairs, d_lo, d_up, hl2, identity_ok`
    *         (`identity_ok` checks m_pairs = n_a·n_b — the difference
    *         distribution accounted for every cross pair)
    */
  def hodgesLehmannFromCounts(counts: DataFrame,
                              maxCells: Long = 100000000L): DataFrame = {
    val all = Window.partitionBy()
    val aDom = counts.filter(col("ca") > 0)
      .select(col("v").as("va"), col("ca"))
      .withColumn("__da", count(lit(1)).over(all).cast("long"))
    val bDom = counts.filter(col("cb") > 0)
      .select(col("v").as("vb"), col("cb"))
      .withColumn("__db", count(lit(1)).over(all).cast("long"))
    val diffs = aDom.crossJoin(bDom)
      .withColumn("__guard",
        when(col("__da") * col("__db") > maxCells,
          raise_error(concat(lit("hodges_lehmann: domain grid "),
            col("__da") * col("__db"),
            lit(s" exceeds the declared bound $maxCells - bin first"))))
          .otherwise(lit(0L)))
      .groupBy((col("vb") - col("va") + col("__guard")).as("d"))
      .agg(sum(col("ca").cast(D38) * col("cb")).cast("long").as("w"))
    val upTo = Window.orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val med = diffs
      .withColumn("__cum", sum("w").over(upTo).cast("long"))
      .withColumn("__m", sum("w").over(all).cast("long"))
      .agg(
        max("__m").cast("long").as("m_pairs"),
        min(when(lit(2L) * col("__cum") >= col("__m"), col("d")))
          .cast("long").as("d_lo"),
        min(when(lit(2L) * col("__cum") >= col("__m") + 1L, col("d")))
          .cast("long").as("d_up"))
    val ns = counts.agg(sum("ca").cast("long").as("n_a"),
      sum("cb").cast("long").as("n_b"))
    med.crossJoin(broadcast(ns))
      .withColumn("identity_ok",
        col("m_pairs").cast(D38) === col("n_a").cast(D38) * col("n_b"))
      .select(col("n_a"), col("n_b"), col("m_pairs"), col("d_lo"),
        col("d_up"), (col("d_lo") + col("d_up")).as("hl2"),
        col("identity_ok"))
  }

  /** Wilcoxon signed-rank test from per-difference-value counts
    * `(d, c)` — the PAIRED location test ([[friedman]] at k = 2 is its
    * coarser sibling; q313's McNemar is its binary one): did the same
    * units' metric shift between two periods. Zero differences are
    * excluded (the classic Wilcoxon convention, declared); |d| ranks are
    * doubled midranks off one ordered pass over the collapsed |d|
    * domain, W2⁺ = Σ_{d>0} c·r2 is exactly twice the classic W⁺, and
    * with the tie-corrected variance
    *
    *   z² = 12·(W2⁺ − n(n+1)/2)² div (2n(n+1)(2n+1) − Σ_t(t³−t))
    *
    * as one exact DECIMAL(38,0) ppm floor (t = tie multiplicities on the
    * |d| domain). NULL when n = 0 or the variance term is zero (all
    * differences share one |d| and one sign… degenerate); n ≥ 10⁶ fails
    * loudly (the n⁴·10⁷ dividend envelope).
    *
    * @return one row: `n_nonzero, w2_plus, z2_ppm, positive_shift`
    */
  def signedRankFromCounts(diffs: DataFrame): DataFrame = {
    val byAd = diffs.filter(col("d") =!= 0L)
      .groupBy(abs(col("d")).as("ad"))
      .agg(sum("c").cast("long").as("t"),
        sum(when(col("d") > 0, col("c")).otherwise(0L)).cast("long").as("cp"))
    val before = Window.orderBy(col("ad"))
      .rowsBetween(Window.unboundedPreceding, -1)
    byAd
      .withColumn("__r2",
        lit(2L) * coalesce(sum("t").over(before), lit(0L)) + col("t") + 1L)
      .agg(
        sum("t").cast("long").as("n_nonzero"),
        sum(col("cp").cast(D38) * col("__r2")).cast(D38).as("__w2p"),
        sum(col("t").cast(D38) * col("t") * col("t") - col("t"))
          .cast(D38).as("__tie3"))
      .withColumn("n_nonzero",
        when(col("n_nonzero") >= 1000000L,
          raise_error(lit("signed_rank: n exceeds the exact-arithmetic " +
            "envelope 1e6 - pre-collapse to a bounded grain first")))
          .otherwise(coalesce(col("n_nonzero"), lit(0L))))
      .withColumn("__e2",
        expr(s"CAST(CAST(n_nonzero AS $D38) * (n_nonzero + 1) div 2 AS $D38)"))
      .withColumn("__den",
        expr(s"""CAST(CAST(2 AS $D38) * n_nonzero * (n_nonzero + 1) *
                 (2 * n_nonzero + 1) - __tie3 AS $D38)"""))
      .withColumn("w2_plus",
        when(col("n_nonzero") > 0, col("__w2p").cast("long"))
          .otherwise(lit(null).cast("long")))
      .withColumn("z2_ppm",
        when(col("n_nonzero") > 0 && col("__den") > 0,
          expr(s"""CAST((__w2p - __e2) * (__w2p - __e2) * 12 * 1000000
                   div __den AS BIGINT)"""))
          .otherwise(lit(null).cast("long")))
      .withColumn("positive_shift",
        when(col("n_nonzero") > 0, col("__w2p") > col("__e2"))
          .otherwise(lit(null).cast("boolean")))
      .select("n_nonzero", "w2_plus", "z2_ppm", "positive_shift")
  }

  /** Two-sample Cramér–von Mises test (Anderson 1962's canonical T) from
    * per-domain-value counts `(v, ca, cb)` — the whole-CDF companion to
    * q245's KS: KS sees the single worst deviation, T integrates ALL of
    * them, buying power against spread-out alternatives. Per cell the
    * block sum Σ_{i∈cell}(r̄ − i)² has the exact closed form
    * (3cm² − 6mc(c+1) + 2c(c+1)(2c+1))/3 with m = r2_pooled − 2·own-rank
    * prefix (doubled midranks — scipy's midrank convention replayed
    * exactly), so
    *
    *   T = [n₁S_a + n₂S_b − 2n₁n₂(4n₁n₂−1)] / (12·n₁n₂N)
    *
    * with S the tripled block sums, one exact sign-split DECIMAL(38,0)
    * ×10⁶ floor. NULL when a side is empty; N ≥ 10⁷ fails loudly (the
    * N⁴·10⁶ dividend envelope).
    *
    * @return one row: `n_a, n_b, t_x1e6`
    */
  def cvmFromCounts(counts: DataFrame): DataFrame = {
    val before = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    def blockSum3(cCol: Column, mCol: Column): Column =
      lit(3L) * cCol.cast(D38) * mCol * mCol -
        lit(6L) * mCol.cast(D38) * cCol * (cCol + 1L) +
        lit(2L) * cCol.cast(D38) * (cCol + 1L) * (lit(2L) * cCol + 1L)
    counts
      .withColumn("__cnt", col("ca") + col("cb"))
      .withColumn("__cumN", coalesce(sum("__cnt").over(before), lit(0L)))
      .withColumn("__cumA", coalesce(sum("ca").over(before), lit(0L)))
      .withColumn("__cumB", coalesce(sum("cb").over(before), lit(0L)))
      .withColumn("__r2", lit(2L) * col("__cumN") + col("__cnt") + 1L)
      .withColumn("__ma", col("__r2") - lit(2L) * col("__cumA"))
      .withColumn("__mb", col("__r2") - lit(2L) * col("__cumB"))
      .agg(
        sum("ca").cast("long").as("n_a"),
        sum("cb").cast("long").as("n_b"),
        sum(when(col("ca") > 0, blockSum3(col("ca"), col("__ma")))
          .otherwise(lit(0).cast(D38))).cast(D38).as("__sa"),
        sum(when(col("cb") > 0, blockSum3(col("cb"), col("__mb")))
          .otherwise(lit(0).cast(D38))).cast(D38).as("__sb"))
      .withColumn("__n",
        when(col("n_a") + col("n_b") >= 10000000L,
          raise_error(lit("cvm: N exceeds the exact-arithmetic envelope " +
            "1e7 - pre-collapse or bin first")))
          .otherwise(col("n_a") + col("n_b")))
      .withColumn("__num",
        expr(s"""CAST(CAST(n_a AS $D38) * __sa + CAST(n_b AS $D38) * __sb -
                 CAST(2 AS $D38) * n_a * n_b *
                 (CAST(4 AS $D38) * n_a * n_b - 1) AS $D38)"""))
      .withColumn("t_x1e6",
        when(col("n_a") > 0 && col("n_b") > 0,
          (when(col("__num") >= 0, lit(1L)).otherwise(lit(-1L))) *
            expr(s"""CAST(abs(__num) * 1000000
                     div (CAST(12 AS $D38) * n_a * n_b * __n) AS BIGINT)"""))
          .otherwise(lit(null).cast("long")))
      .select("n_a", "n_b", "t_x1e6")
  }

  /** Conover squared-ranks scale test (Conover 1999 §5.3) — the
    * DISPERSION question beside the location tests: is sample a more
    * variable than sample b, without normality. Deviations are taken
    * from each group's OWN mean kept exact by cross-multiplication
    * (u ∝ |v·n_g − S_g|·n_other — comparing a-deviations with
    * b-deviations under a common integer scale, no rational means),
    * then squared POOLED midranks (doubled, so A4 = r2² = 4A) with the
    * tie-general standardization
    *
    *   z² = (N·T4 − n_a·SA4)²·(N−1) div (n_a·n_b·(N·SA8 − SA4²))
    *
    * (T4 = group-a squared-rank sum, SA4/SA8 = pooled Σc·r2²/Σc·r2⁴ —
    * the uniform ×16 doubling cancels), one exact DECIMAL(38,0) ppm
    * floor. The ~N⁹·10⁶ dividend means N ≥ 2000 fails loudly
    * (day-grain collapse keeps N calendar-bounded, declared); NULL when
    * the pooled squared ranks are constant.
    *
    * @return one row: `n_a, n_b, t4_a, z2_ppm, a_more_variable`
    */
  def conoverScaleFromCounts(counts: DataFrame): DataFrame = {
    val all = Window.partitionBy()
    val scaled = counts
      .withColumn("__na", sum("ca").over(all).cast("long"))
      .withColumn("__nb", sum("cb").over(all).cast("long"))
      .withColumn("__sa", sum(col("ca").cast(D38) * col("v")).over(all)
        .cast(D38))
      .withColumn("__sb", sum(col("cb").cast(D38) * col("v")).over(all)
        .cast(D38))
    val aCells = scaled.filter(col("ca") > 0)
      .select(expr(s"abs(CAST(v AS $D38) * __na - __sa) * __nb").as("w"),
        col("ca").as("cw"), lit(1).as("__side"))
    val bCells = scaled.filter(col("cb") > 0)
      .select(expr(s"abs(CAST(v AS $D38) * __nb - __sb) * __na").as("w"),
        col("cb").as("cw"), lit(0).as("__side"))
    val pooled = aCells.unionByName(bCells)
      .groupBy("w")
      .agg(sum(when(col("__side") === 1, col("cw")).otherwise(0L))
        .cast("long").as("ca"),
        sum(when(col("__side") === 0, col("cw")).otherwise(0L))
          .cast("long").as("cb"))
    val before = Window.orderBy(col("w"))
      .rowsBetween(Window.unboundedPreceding, -1)
    pooled
      .withColumn("__cnt", col("ca") + col("cb"))
      .withColumn("__r2",
        lit(2L) * coalesce(sum("__cnt").over(before), lit(0L)) +
          col("__cnt") + 1L)
      .agg(
        sum("ca").cast("long").as("n_a"),
        sum("cb").cast("long").as("n_b"),
        sum(col("ca").cast(D38) * col("__r2") * col("__r2")).cast(D38)
          .as("__t4"),
        sum(col("__cnt").cast(D38) * col("__r2") * col("__r2")).cast(D38)
          .as("__sa4"),
        sum(col("__cnt").cast(D38) * col("__r2") * col("__r2") *
          col("__r2") * col("__r2")).cast(D38).as("__sa8"))
      .withColumn("__n",
        when(col("n_a") + col("n_b") >= 2000L,
          raise_error(lit("conover: N exceeds the N^9 exact-arithmetic " +
            "envelope (2000) - pre-collapse to a bounded grain first")))
          .otherwise(col("n_a") + col("n_b")))
      .withColumn("__num",
        expr(s"CAST(CAST(__n AS $D38) * __t4 - CAST(n_a AS $D38) * __sa4 AS $D38)"))
      .withColumn("__den",
        expr(s"""CAST(CAST(n_a AS $D38) * n_b *
                 (CAST(__n AS $D38) * __sa8 - __sa4 * __sa4) AS $D38)"""))
      .withColumn("t4_a", col("__t4").cast("long"))
      .withColumn("z2_ppm",
        when(col("__den") > 0,
          expr(s"""CAST(__num * __num * (__n - 1) * 1000000
                   div __den AS BIGINT)"""))
          .otherwise(lit(null).cast("long")))
      .withColumn("a_more_variable",
        when(col("n_a") > 0 && col("n_b") > 0, col("__num") > 0)
          .otherwise(lit(null).cast("boolean")))
      .select("n_a", "n_b", "t4_a", "z2_ppm", "a_more_variable")
  }

  /** Quade test (Quade 1979) — [[friedman]]'s RANGE-WEIGHTED sibling:
    * blocks whose treatment values spread more carry more weight, which
    * buys power when block scales differ (exactly the daily-volume
    * panels a pipeline monitors). Within-block doubled midranks r2,
    * block weights Q2 = doubled midrank of the block's RANGE across
    * blocks, scores S2 = Q2·(r2 − (k+1)) (the common ×4 doubling cancels
    * in the ratio), and
    *
    *   F = (b−1)·ΣT_j² div (b·ΣS2² − ΣT_j²),   T_j = Σ_b S2
    *
    * as one exact DECIMAL(38,0) ppm floor. Complete blocks required —
    * ragged panels fail loudly (the [[friedman]] guard); NULL when the
    * denominator is zero (all scores equal, e.g. every block internally
    * constant).
    *
    * @return one row: `b_blocks, k_treatments, f_ppm`
    */
  def quadeTest(obs: DataFrame, blockCol: String, treatCol: String,
                valueCol: String): DataFrame = {
    val wB = Window.partitionBy(col(blockCol))
    val wBV = Window.partitionBy(col(blockCol), col(valueCol))
    val ranked = obs
      .withColumn("__rank", rank().over(wB.orderBy(col(valueCol))))
      .withColumn("__teq", count(lit(1)).over(wBV).cast("long"))
      .withColumn("__r2", lit(2L) * col("__rank") + col("__teq") - 1L)
      .withColumn("__kb", count(lit(1)).over(wB).cast("long"))
      .withColumn("__kdist",
        size(collect_set(col(treatCol)).over(wB)).cast("long"))
      .withColumn("__range",
        max(col(valueCol)).over(wB) - min(col(valueCol)).over(wB))
    // block weights: doubled midrank of __range across the b-block frame
    // (calendar-bounded — the collapsed-frame exception)
    val wAllB = Window.orderBy(col("__range"))
    val wEqR = Window.partitionBy(col("__range"))
    val blocks = ranked.select(col(blockCol).as("__blk"), col("__range"))
      .distinct()
      .withColumn("__brank", rank().over(wAllB))
      .withColumn("__beq", count(lit(1)).over(wEqR).cast("long"))
      .withColumn("__q2", lit(2L) * col("__brank") + col("__beq") - 1L)
      .select(col("__blk"), col("__q2"))
    val scored = ranked
      .join(broadcast(blocks), col(blockCol) === col("__blk"))
      .withColumn("__s2",
        col("__q2").cast(D38) * (col("__r2").cast(D38) - (col("__kb") + 1)))
    val perT = scored.groupBy(col(treatCol).as("treat"))
      .agg(count(lit(1)).cast("long").as("b"),
        min("__kb").cast("long").as("__kb_min"),
        max("__kb").cast("long").as("__kb_max"),
        min("__kdist").cast("long").as("__kd_min"),
        sum(col("__s2") * col("__s2")).cast(D38).as("__sq"),
        sum("__s2").cast(D38).as("__tj"))
    val all = Window.partitionBy()
    perT
      .withColumn("__k", count(lit(1)).over(all).cast("long"))
      .agg(
        max("b").cast("long").as("b_blocks"),
        max("__k").cast("long").as("k_treatments"),
        min("b").cast("long").as("__b_min"),
        min("__kb_min").cast("long").as("__kb_min"),
        max("__kb_max").cast("long").as("__kb_max"),
        min("__kd_min").cast("long").as("__kd_min"),
        sum("__sq").cast(D38).as("__a2"),
        sum(col("__tj") * col("__tj")).cast(D38).as("__bnum"))
      .withColumn("f_ppm",
        when(col("__b_min") =!= col("b_blocks") ||
          col("__kb_min") =!= col("k_treatments") ||
          col("__kb_max") =!= col("k_treatments") ||
          col("__kd_min") =!= col("k_treatments"),
          raise_error(concat(
            lit("quade: ragged panel - every block must have exactly "),
            col("k_treatments"),
            lit(" distinct treatments and every treatment all blocks"))))
          .when(expr(s"CAST(b_blocks AS $D38) * __a2 - __bnum > 0"),
            expr(s"""CAST(CAST(b_blocks - 1 AS $D38) * __bnum * 1000000
                     div (CAST(b_blocks AS $D38) * __a2 - __bnum)
                     AS BIGINT)"""))
          .otherwise(lit(null).cast("long")))
      .select("b_blocks", "k_treatments", "f_ppm")
  }
}
