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
  * Oracle determinism: cell counts and margins are exact integers; the
  * per-cell χ² term (O·N − R·C)²/(N·R·C) keeps its numerator difference in
  * DECIMAL(38,0) and crosses into doubles only for square-and-divide
  * (IEEE-exact ops), is rounded to a fixed scale, and the final sum runs in
  * DECIMAL — order-independent across engines. ANOVA's sums of squares come
  * from exact integer moments (Σx, Σx² in sub-unit integers) the same way.
  */
object Contingency {

  private val D38 = "decimal(38,0)"

  /** Chi-squared independence test for `aCol` × `bCol`. One row out:
    * `n, a_levels, b_levels, dof, chi2, cramers_v`.
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
    * pass a complete level grid when absence matters.
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
      // (O·N − R·C) exact in DECIMAL(38,0); the square would overflow 38
      // digits at extreme N, so square-and-divide run in doubles (both are
      // correctly-rounded IEEE ops on identical inputs in either engine)
      .withColumn("__num",
        (col("o").cast(D38) * col("n") - col("r").cast(D38) * col("c"))
          .cast("double"))
      .withColumn("__den",
        (col("n").cast(D38) * col("r") * col("c")).cast("double"))
      .withColumn("__term",
        round(col("__num") * col("__num") / col("__den"), 9)
          .cast("decimal(28,9)"))
    val agg = if (groupCols.isEmpty) terms.groupBy() else terms.groupBy(g: _*)
    agg.agg(
      max("n").cast("long").as("n"),
      countDistinct("a").cast("long").as("a_levels"),
      countDistinct("b").cast("long").as("b_levels"),
      sum("__term").cast("decimal(28,9)").as("__chi2"))
      .select((g ++ Seq(col("n"), col("a_levels"), col("b_levels"),
        ((col("a_levels") - 1) * (col("b_levels") - 1)).cast("long")
          .as("dof"),
        col("__chi2").as("chi2"),
        round(sqrt(col("__chi2").cast("double") /
          (col("n") * least(col("a_levels"), col("b_levels")) - col("n"))
            .cast("double")), 9).cast("decimal(20,9)").as("cramers_v"))): _*)
  }

  /** Weight-of-evidence / information-value feature screen (the credit-
    * scoring standard for "how much does this bucketed feature separate a
    * binary label"): per bucket WOE = ln((pos_b/POS)/(neg_b/NEG)) and
    * IV = Σ_b (pos_b/POS − neg_b/NEG)·WOE_b.
    *
    * One hash agg collapses rows to buckets; totals are windows over the
    * bucket frame. Each ratio is ONE IEEE division of exact integer
    * products ((pos_b/POS)/(neg_b/NEG) = pos_b·NEG / (neg_b·POS)); WOE and
    * the IV terms are rounded to 9 dp before the DECIMAL IV sum (order-
    * independent). Buckets with a zero class get NULL woe and contribute
    * nothing to IV — declared semantics, no smoothing.
    *
    * @return one row per bucket: `bucket, n_pos, n_neg, woe, iv_term, iv`
    *         (`iv` repeated on every row — the bucket frame IS the report)
    */
  def woeIv(df: DataFrame, labelCol: String, bucketCol: String): DataFrame =
    woeIvFromCounts(
      df.groupBy(col(bucketCol).as("bucket"))
        .agg(sum(col(labelCol)).cast("long").as("n_pos"),
          sum(lit(1) - col(labelCol)).cast("long").as("n_neg")))
      .select("bucket", "n_pos", "n_neg", "woe", "iv_term", "iv")

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
      .withColumn("woe",
        when(ok, round(log(
          (col("n_pos").cast(D38) * col("__neg")).cast("double") /
            (col("n_neg").cast(D38) * col("__pos")).cast("double")), 9)
          .cast("decimal(20,9)")).otherwise(lit(null).cast("decimal(20,9)")))
      .withColumn("iv_term",
        when(ok, round(
          (col("n_pos").cast(D38) * col("__neg") -
            col("n_neg").cast(D38) * col("__pos")).cast("double") /
            (col("__pos").cast(D38) * col("__neg")).cast("double") *
            col("woe").cast("double"), 9).cast("decimal(20,9)"))
          .otherwise(lit(BigDecimal(0)).cast("decimal(20,9)")))
      .withColumn("iv", sum("iv_term").over(wAll).cast("decimal(20,9)"))
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

  /** One-way ANOVA from exact integer moments. `valueIntCol` must already be
    * an exact integer measurement (e.g. cents — the q249 sub-unit
    * discipline). One row out: `n_total, k_groups, ssb, ssw, f_stat, eta_sq`
    * with the sums of squares in floor-divided (sub-unit)² integers.
    *
    * All of SSB/SSW stay in EXACT integer arithmetic: the per-group s₁²/n
    * quotients are floor divisions done as (s₁² − s₁² mod n)/n in
    * DECIMAL(38,0) — never a rounded double (DuckDB's float-path round()
    * disagrees with BigDecimal rounding above 2⁵³, the q307 lesson). The
    * ≤1-subunit² truncation per group is part of the operator's declared
    * semantics and reproduced bit-for-bit by any engine.
    */
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
        (col("__bg") -
          floorDiv(col("__s1") * col("__s1"), col("n_total")))
          .cast("long").as("ssb"),
        (col("__s2") - col("__bg")).cast("long").as("ssw"))
      .withColumn("f_stat",
        round((col("ssb").cast("double") / (col("k_groups") - 1)) /
          (col("ssw").cast("double") / (col("n_total") - col("k_groups"))),
          6).cast("decimal(28,6)"))
      .withColumn("eta_sq",
        round(col("ssb").cast("double") /
          (col("ssb") + col("ssw")).cast("double"), 9)
          .cast("decimal(20,9)"))
  }
}
