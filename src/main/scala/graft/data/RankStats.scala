package graft.data

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-sample rank statistics (Kolmogorov–Smirnov, Mann–Whitney U) over a
  * COLLAPSED domain — one implementation serving two resolutions:
  *
  *  - **exact**: the domain is the distinct value set (q245/q246's form) —
  *    a window over however many distinct values the corpus has;
  *  - **binned**: the domain is [[HistStore]]'s fixed bins — exact to the
  *    declared bin width, and the ordered pass runs over ≤ `nBins` rows
  *    NO MATTER the corpus size. At 100 TB this is the difference between
  *    a window over a possibly-corpus-sized value domain and a window over
  *    a kilobyte: per-day bin counts are mergeable integer partials
  *    (HistStore's contract), so "KS between last week and this week" folds
  *    |days|·|bins| tiny rows and never re-sorts raw data.
  *
  * Both statistics stay in integer arithmetic (cross-multiplied CDF
  * numerators for KS, doubled tie-averaged ranks for U) — bit-replayable by
  * any engine, no empirical-CDF doubles. When every row in a bin carries
  * the same value (no intra-bin mass spread), the binned statistics EQUAL
  * the exact ones — the agreement a unit test pins.
  */
object RankStats {

  private val D38 = "decimal(38,0)"

  /** Exact two-sample KS from per-domain-value counts `(domainCol, ca, cb)`:
    * D = max |F_a − F_b| as the integer pair (d_num = max |cumA·nB −
    * cumB·nA|, d_ppm = d_num·1e6 div nA·nB). One ordered pass over the
    * (already collapsed) domain.
    */
  def ksFromCounts(counts: DataFrame, domainCol: String): DataFrame = {
    val w = Window.orderBy(domainCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy()
    counts
      .withColumn("cuma", sum("ca").over(w).cast("long"))
      .withColumn("cumb", sum("cb").over(w).cast("long"))
      .withColumn("na", sum("ca").over(tot).cast("long"))
      .withColumn("nb", sum("cb").over(tot).cast("long"))
      .agg(max("na").as("n_a"), max("nb").as("n_b"),
        max(abs(col("cuma").cast(D38) * col("nb") -
                col("cumb").cast(D38) * col("na"))).cast(D38).as("__d"))
      .select(col("n_a"), col("n_b"), col("__d").cast("long").as("d_num"),
        expr(s"""CAST((CAST(__d AS $D38) * 1000000)
                 div (CAST(n_a AS $D38) * n_b) AS BIGINT)""").as("d_ppm"))
  }

  /** Grouped KS — one statistic PER GROUP from counts `(groupCols...,
    * domainCol, ca, cb)`: the cumulative pass is PARTITIONED by group (a
    * segment-drift report never serializes all segments through one
    * task). Emits one row per group.
    */
  def ksFromCountsGrouped(counts: DataFrame, domainCol: String,
                          groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "use ksFromCounts for the ungrouped form")
    val g = groupCols.map(col)
    val w = Window.partitionBy(g: _*).orderBy(domainCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy(g: _*)
    counts
      .withColumn("cuma", sum("ca").over(w).cast("long"))
      .withColumn("cumb", sum("cb").over(w).cast("long"))
      .withColumn("na", sum("ca").over(tot).cast("long"))
      .withColumn("nb", sum("cb").over(tot).cast("long"))
      .groupBy(g: _*)
      .agg(max("na").as("n_a"), max("nb").as("n_b"),
        max(abs(col("cuma").cast(D38) * col("nb") -
                col("cumb").cast(D38) * col("na"))).cast(D38).as("__d"))
      .select((g ++ Seq(col("n_a"), col("n_b"),
        col("__d").cast("long").as("d_num"),
        expr(s"""CAST(CASE WHEN n_a > 0 AND n_b > 0 THEN
                 (CAST(__d AS $D38) * 1000000)
                 div (CAST(n_a AS $D38) * n_b) ELSE NULL END AS BIGINT)""")
          .as("d_ppm"))): _*)
  }

  /** Exact two-sample Mann–Whitney U from per-domain-value counts
    * `(domainCol, ca, cb)`: doubled tie-averaged ranks (2·avg_rank =
    * 2·cum_before + tie_count + 1) keep U integral with full tie
    * correction; emits both arms' 2U and the identity verdict
    * 2U_a + 2U_b = 2·n_a·n_b.
    */
  def mannWhitneyFromCounts(counts: DataFrame,
                            domainCol: String): DataFrame = {
    val w = Window.orderBy(domainCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    counts
      .withColumn("cnt", col("ca") + col("cb"))
      .withColumn("cum_before", coalesce(sum("cnt").over(w), lit(0L)))
      .withColumn("r2", lit(2L) * col("cum_before") + col("cnt") + 1L)
      .agg(sum("ca").cast("long").as("n_a"),
        sum("cb").cast("long").as("n_b"),
        sum(col("ca").cast(D38) * col("r2")).cast(D38).as("__r2a"),
        sum(col("cb").cast(D38) * col("r2")).cast(D38).as("__r2b"))
      .select(col("n_a"), col("n_b"),
        expr(s"CAST(__r2a - CAST(n_a AS $D38) * (n_a + 1) AS BIGINT)")
          .as("u2_a"),
        expr(s"CAST(__r2b - CAST(n_b AS $D38) * (n_b + 1) AS BIGINT)")
          .as("u2_b"))
      .withColumn("identity_ok",
        col("u2_a") + col("u2_b") === lit(2L) * col("n_a") * col("n_b"))
  }

  /** [[mannWhitneyFromCounts]] per group: one U statistic per `groupCols`
    * key from counts `(groupCols…, domainCol, ca, cb)`. The ordered pass is
    * PARTITIONED by group (the grouped-KS layout) — no segment ever funnels
    * through a single global sort task, so segment count scales the
    * parallelism, not the per-task state.
    */
  def mannWhitneyFromCountsGrouped(counts: DataFrame, domainCol: String,
                                   groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "use mannWhitneyFromCounts for the ungrouped form")
    val g = groupCols.map(col)
    val w = Window.partitionBy(g: _*).orderBy(domainCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    counts
      .withColumn("cnt", col("ca") + col("cb"))
      .withColumn("cum_before", coalesce(sum("cnt").over(w), lit(0L)))
      .withColumn("r2", lit(2L) * col("cum_before") + col("cnt") + 1L)
      .groupBy(g: _*)
      .agg(sum("ca").cast("long").as("n_a"),
        sum("cb").cast("long").as("n_b"),
        sum(col("ca").cast(D38) * col("r2")).cast(D38).as("__r2a"),
        sum(col("cb").cast(D38) * col("r2")).cast(D38).as("__r2b"))
      .select((g ++ Seq(col("n_a"), col("n_b"),
        expr(s"CAST(__r2a - CAST(n_a AS $D38) * (n_a + 1) AS BIGINT)")
          .as("u2_a"),
        expr(s"CAST(__r2b - CAST(n_b AS $D38) * (n_b + 1) AS BIGINT)")
          .as("u2_b"))): _*)
      .withColumn("identity_ok",
        col("u2_a") + col("u2_b") === lit(2L) * col("n_a") * col("n_b"))
  }

  /** HistStore's bin function — kept textually identical so a RankStats
    * bin and a HistStore bin can never disagree.
    */
  def binOf(valueCol: String, lo: Double, width: Double,
            nBins: Int): Column =
    least(greatest(floor((col(valueCol) - lo) / width), lit(0.0)),
      lit((nBins - 1).toDouble)).cast("int")

  /** Collapse raw rows to two-sample bin counts `(bin, ca, cb)` — one hash
    * agg to ≤ `nBins` rows; the map side does all the work.
    */
  def binCounts(df: DataFrame, valueCol: String, aPred: Column,
                bPred: Column, lo: Double, width: Double,
                nBins: Int): DataFrame =
    df.filter(col(valueCol).isNotNull && (aPred || bPred))
      .groupBy(binOf(valueCol, lo, width, nBins).as("bin"))
      .agg(sum(when(aPred, 1L).otherwise(0L)).cast("long").as("ca"),
        sum(when(bPred, 1L).otherwise(0L)).cast("long").as("cb"))

  /** Binned KS straight from raw rows (exact to `width`). */
  def ksBinned(df: DataFrame, valueCol: String, aPred: Column,
               bPred: Column, lo: Double, width: Double,
               nBins: Int): DataFrame =
    ksFromCounts(binCounts(df, valueCol, aPred, bPred, lo, width, nBins),
      "bin")

  /** Binned Mann–Whitney U straight from raw rows (exact to `width`). */
  def mannWhitneyBinned(df: DataFrame, valueCol: String, aPred: Column,
                        bPred: Column, lo: Double, width: Double,
                        nBins: Int): DataFrame =
    mannWhitneyFromCounts(
      binCounts(df, valueCol, aPred, bPred, lo, width, nBins), "bin")

  /** Fold two [[HistStore]] day-partitioned stores over a date range into
    * two-sample bin counts — the 100 TB path: day-partition pruning on
    * both reads, then a |days|·|bins|-row fold. Bins absent from one store
    * count 0 there (full outer on bin).
    */
  def countsFromStores(spark: SparkSession, pathA: String, pathB: String,
                       from: String, to: String): DataFrame = {
    def fold(path: String, out: String): DataFrame =
      spark.read.parquet(path)
        .filter(col("day") >= lit(from).cast("date") &&
          col("day") <= lit(to).cast("date"))
        .groupBy("bin").agg(sum("n").cast("long").as(out))
    fold(pathA, "ca").join(fold(pathB, "cb"), Seq("bin"), "full_outer")
      .select(col("bin"), coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
  }

  /** Fold ONE [[HistStore]] over two date ranges into two-sample bin
    * counts — the self-drift form ("last week vs this week" from the same
    * store). One pruned scan covering both ranges, one |days|·|bins| fold.
    */
  def countsFromStoreRanges(spark: SparkSession, path: String,
                            fromA: String, toA: String,
                            fromB: String, toB: String): DataFrame = {
    def in(from: String, to: String) =
      col("day") >= lit(from).cast("date") && col("day") <= lit(to).cast("date")
    spark.read.parquet(path)
      .filter(in(fromA, toA) || in(fromB, toB))
      .groupBy("bin")
      .agg(sum(when(in(fromA, toA), col("n")).otherwise(0L))
          .cast("long").as("ca"),
        sum(when(in(fromB, toB), col("n")).otherwise(0L))
          .cast("long").as("cb"))
      .filter(col("ca") + col("cb") > 0L)
  }

  /** Exact decision-stump fit from per-value class counts `(v, c, a)`
    * (c = total count at value v, a = positives): the best binary split
    * "x ≤ t" for a binary label, by Gini impurity — the single-feature
    * learner behind monotone-feature screens and shallow-tree seeding.
    *
    * Minimizing the weighted child Gini is maximizing
    *   S(t) = (a_l² + b_l²)/n_l + (a_r² + b_r²)/n_r
    * (b = negatives), all four corner sums exact from ONE cumulative
    * pass over the COLLAPSED value domain. The two varying-denominator
    * quotients are each quantized ONCE as exact q9 floors (the KW
    * per-group discipline) and the argmax takes the largest quantized
    * score with ties to the SMALLEST threshold (declared; replayed by
    * both engines). The last domain value (empty right child) is not a
    * candidate. `gain_q9` = best score − the parent's own q9 floor
    * (A² + B²)·10⁹ div N — a difference of documented floors.
    *
    * Bounds: every quotient ≤ n·10⁹, so n < 10⁹ keeps the surface in
    * BIGINT (fails loudly above); dividends ≤ n²·10⁹ < 10³⁸ to n < 10¹⁴.
    *
    * @return one row: `n, n_pos, split_v, n_left, a_left, score_q9,
    *         gain_q9`
    */
  def giniStumpFromCounts(cells: DataFrame): DataFrame = {
    val wUp = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy()
    cells
      .withColumn("__nl", sum("c").over(wUp).cast("long"))
      .withColumn("__al", sum("a").over(wUp).cast("long"))
      .withColumn("__n", sum("c").over(all).cast("long"))
      .withColumn("__a", sum("a").over(all).cast("long"))
      .filter(col("__nl") < col("__n")) // empty right child excluded
      .withColumn("__score",
        when(col("__n") >= lit(1000000000L),
          raise_error(concat(lit("giniStump: N = "), col("__n"),
            lit(" exceeds the BIGINT score bound 1e9 - sample first"))))
          .otherwise(
            expr(s"""CAST(
              (CAST(__al AS $D38) * __al +
               (CAST(__nl AS $D38) - __al) * (CAST(__nl AS $D38) - __al))
              * 1000000000 div __nl AS BIGINT) +
              CAST(
              ((CAST(__a AS $D38) - __al) * (CAST(__a AS $D38) - __al) +
               (CAST(__n AS $D38) - __nl - (CAST(__a AS $D38) - __al)) *
               (CAST(__n AS $D38) - __nl - (CAST(__a AS $D38) - __al)))
              * 1000000000 div (__n - __nl) AS BIGINT)""")))
      .agg(
        max("__n").cast("long").as("n"),
        max("__a").cast("long").as("n_pos"),
        max(struct(col("__score").as("s"), (-col("v")).as("nv"),
          col("__nl").as("nl"), col("__al").as("al"))).as("__m"))
      .select(col("n"), col("n_pos"),
        (-col("__m.nv")).cast("long").as("split_v"),
        col("__m.nl").cast("long").as("n_left"),
        col("__m.al").cast("long").as("a_left"),
        col("__m.s").cast("long").as("score_q9"))
      .withColumn("gain_q9",
        expr(s"""score_q9 - CAST(
          (CAST(n_pos AS $D38) * n_pos +
           (CAST(n AS $D38) - n_pos) * (CAST(n AS $D38) - n_pos))
          * 1000000000 div n AS BIGINT)"""))
  }

  /** Exact equi-depth bucket boundaries per group from per-value counts
    * `(groupCols…, v, c)` — the bucketizer FIT every quantile-feature
    * pipeline needs (equi-width is [[graft.data.HistStore]]'s job; this
    * is its rank-quantile sibling): boundary b (b = 1..B−1) is the
    * SMALLEST v whose cumulative count reaches b·n/B, replayed as the
    * cross-multiplied integer rule cum·B ≥ b·n — no division at all.
    *
    * Scale shape: one cumulative pass over the per-group COLLAPSED
    * domain, then each domain row EMITS the boundary indices it owns via
    * one bounded sequence-explode — b ∈ ((bef·B) div n, (upto·B) div n]
    * — so the output is ≤ B−1 rows per group and no row is visited
    * twice (never a B-way scan of the domain).
    *
    * @return one row per (group, bucket): `groupCols…, bucket,
    *         boundary` for bucket = 1..nBuckets−1
    */
  def equidepthBoundaries(cells: DataFrame, groupCols: Seq[String],
                          nBuckets: Int): DataFrame = {
    require(nBuckets >= 2, s"need at least 2 buckets, got $nBuckets")
    val seg = groupCols.map(col)
    val wUp = Window.partitionBy(seg: _*).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(seg: _*)
    cells
      .withColumn("__upto", sum("c").over(wUp).cast("long"))
      .withColumn("__bef", col("__upto") - col("c"))
      .withColumn("__n", sum("c").over(wAll).cast("long"))
      // cross-multiplications through DECIMAL(38,0): n·B would wrap
      // BIGINT silently past 2⁶³ (unreachable at B = 10 with realistic
      // n, but the sibling kernels' declared discipline is exact-or-loud,
      // never wrap)
      .withColumn("__blo",
        expr(s"CAST(CAST(__bef AS $D38) * $nBuckets div __n AS BIGINT) + 1"))
      .withColumn("__bhi",
        least(
          expr(s"CAST(CAST(__upto AS $D38) * $nBuckets div __n AS BIGINT)"),
          lit(nBuckets.toLong - 1)))
      .filter(col("__bhi") >= col("__blo"))
      .withColumn("bucket", explode(expr("sequence(__blo, __bhi)")))
      .select((seg ++ Seq(col("bucket"), col("v").as("boundary"))): _*)
  }

  /** Exact α-trimmed and winsorized means per group from per-value
    * counts `(groupCols…, v, c)` — the robust-metric hardening a
    * pipeline applies before any mean-based gate (one fat-fingered
    * 10⁹-unit outlier must not move the needle): drop (trimmed) or clamp
    * (winsorized) the k = ⌊n·α⌋ most extreme observations per side,
    * α = `trimPermille`/1000.
    *
    * All exact integers off ONE ordered pass over the per-group
    * COLLAPSED value domain: a value's kept multiplicity is the interval
    * overlap max(0, min(cum, n−k) − max(cum−c, k)) — no per-row rank,
    * no quadratic anything; the boundary order statistics v_lo =
    * v₍ₖ₊₁₎ and v_hi = v₍ₙ₋ₖ₎ fall out of the same cumulative frame
    * (min v with cum ≥ k+1 / ≥ n−k — v rises with cum, so min() finds
    * the boundary), and the winsorized sum is trimmedSum + k·(v_lo +
    * v_hi). Means emit as sign-split exact ×10⁶ floors; both lie in
    * [v_lo, v_hi], so the loud |v_lo|,|v_hi| < 10¹² bound keeps every
    * quotient in BIGINT (pre-scale coarser units first).
    *
    * @param trimPermille per-side trim fraction in permille, 0 ≤ tp < 500
    * @return one row per group: `groupCols…, n, k_trim, v_lo, v_hi,
    *         trimmed_mean_x1e6, winsor_mean_x1e6`
    */
  def trimmedMeansFromCounts(cells: DataFrame, groupCols: Seq[String],
                             trimPermille: Int): DataFrame = {
    require(trimPermille >= 0 && trimPermille < 500,
      s"per-side trim must be in [0, 500) permille, got $trimPermille")
    val seg = groupCols.map(col)
    val wUp = Window.partitionBy(seg: _*).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(seg: _*)
    val c1 = cells
      .withColumn("__upto", sum("c").over(wUp).cast("long"))
      .withColumn("__before", col("__upto") - col("c"))
      .withColumn("__n", sum("c").over(wAll).cast("long"))
      .withColumn("__k",
        expr(s"CAST(__n * $trimPermille div 1000 AS BIGINT)"))
      .withColumn("__inc",
        greatest(lit(0L),
          least(col("__upto"), col("__n") - col("__k")) -
            greatest(col("__before"), col("__k"))))
    val agg = c1.groupBy(seg: _*).agg(
      max("__n").cast("long").as("n"),
      max("__k").cast("long").as("k_trim"),
      sum(col("v").cast(D38) * col("__inc")).cast(D38).as("__ts"),
      min(when(col("__upto") >= col("__k") + 1, col("v")))
        .cast("long").as("v_lo"),
      min(when(col("__upto") >= col("__n") - col("__k"), col("v")))
        .cast("long").as("v_hi"))
    agg
      .withColumn("v_lo",
        when(greatest(abs(col("v_lo")), abs(col("v_hi"))) >=
          lit(1000000000000L),
          raise_error(lit("trimmedMeans: |value| exceeds the " +
            "exact-arithmetic bound 1e12 - pre-scale to coarser units")))
          .otherwise(col("v_lo")))
      .withColumn("__ws",
        expr(s"""CAST(__ts + CAST(k_trim AS $D38) * v_lo +
                 CAST(k_trim AS $D38) * v_hi AS $D38)"""))
      .withColumn("trimmed_mean_x1e6",
        when(col("n") - lit(2L) * col("k_trim") > 0,
          (when(col("__ts") >= 0, lit(1L)).otherwise(lit(-1L))) *
            expr(s"""CAST(abs(__ts) * 1000000
                     div (n - 2 * k_trim) AS BIGINT)"""))
          .otherwise(lit(null).cast("long")))
      .withColumn("winsor_mean_x1e6",
        when(col("n") > 0,
          (when(col("__ws") >= 0, lit(1L)).otherwise(lit(-1L))) *
            expr("CAST(abs(__ws) * 1000000 div n AS BIGINT)"))
          .otherwise(lit(null).cast("long")))
      .select((seg ++ Seq(col("n"), col("k_trim"), col("v_lo"),
        col("v_hi"), col("trimmed_mean_x1e6"),
        col("winsor_mean_x1e6"))): _*)
  }

  /** Dixon's Q outlier screen per group from per-value counts
    * `(groupCols…, v, c)` — the cheapest "is the extreme observation
    * suspicious" gate (Dixon 1950's r10 ratio): Q = gap/range where gap
    * is the distance from the extreme OBSERVATION to its nearest
    * neighbour observation and range = v_max − v_min. Observation-level
    * semantics on the collapsed domain, declared: an extreme value with
    * multiplicity ≥ 2 is its own nearest neighbour (gap 0 — a repeated
    * extreme is no outlier), otherwise the neighbour is the adjacent
    * distinct value. Both tails emitted as exact ppm floors; NULL when
    * n < 3 or range = 0. One ordered pass per group, windows PARTITIONED
    * by group.
    *
    * @return one row per group: `groupCols…, n, v_min, v_max,
    *         q_lo_ppm, q_hi_ppm`
    */
  def dixonQFromCounts(cells: DataFrame, groupCols: Seq[String]): DataFrame = {
    val seg = groupCols.map(col)
    val wAsc = Window.partitionBy(seg: _*).orderBy(col("v").asc)
    val wDesc = Window.partitionBy(seg: _*).orderBy(col("v").desc)
    cells
      .withColumn("__ra", row_number().over(wAsc))
      .withColumn("__rd", row_number().over(wDesc))
      .groupBy(seg: _*)
      .agg(
        sum("c").cast("long").as("n"),
        min("v").cast("long").as("v_min"),
        max("v").cast("long").as("v_max"),
        max(when(col("__ra") === 1, col("c"))).cast("long").as("__c_min"),
        max(when(col("__rd") === 1, col("c"))).cast("long").as("__c_max"),
        min(when(col("__ra") === 2, col("v"))).cast("long").as("__v2lo"),
        max(when(col("__rd") === 2, col("v"))).cast("long").as("__v2hi"))
      .withColumn("__gap_lo",
        when(col("__c_min") >= 2L, lit(0L))
          .otherwise(col("__v2lo") - col("v_min")))
      .withColumn("__gap_hi",
        when(col("__c_max") >= 2L, lit(0L))
          .otherwise(col("v_max") - col("__v2hi")))
      .withColumn("q_lo_ppm",
        when(col("n") >= 3L && col("v_max") > col("v_min"),
          expr(s"""CAST(CAST(__gap_lo AS $D38) * 1000000
                   div (CAST(v_max AS $D38) - v_min) AS BIGINT)"""))
          .otherwise(lit(null).cast("long")))
      .withColumn("q_hi_ppm",
        when(col("n") >= 3L && col("v_max") > col("v_min"),
          expr(s"""CAST(CAST(__gap_hi AS $D38) * 1000000
                   div (CAST(v_max AS $D38) - v_min) AS BIGINT)"""))
          .otherwise(lit(null).cast("long")))
      .select((seg ++ Seq(col("n"), col("v_min"), col("v_max"),
        col("q_lo_ppm"), col("q_hi_ppm"))): _*)
  }

  /** Exact 1-D Wasserstein-1 distance (earth mover's distance) between
    * two samples from per-domain-value counts `(v, ca, cb)` — the
    * "HOW MUCH mass moved HOW FAR" drift metric beside KS's worst
    * deviation and CvM's integrated deviation: on the real line
    * W₁ = ∫|F_a − F_b| dv exactly, so over the collapsed integer domain
    * it is one ordered pass summing |cumA·n_b − cumB·n_a|·gap between
    * successive domain values — exact integers, w1 emitted as the
    * ×10⁶ floor over n_a·n_b. NULL when a side is empty.
    *
    * @return one row: `n_a, n_b, w1_x1e6`
    */
  def wassersteinFromCounts(counts: DataFrame): DataFrame = {
    val upTo = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy()
    counts
      .withColumn("__cumA", sum("ca").over(upTo).cast("long"))
      .withColumn("__cumB", sum("cb").over(upTo).cast("long"))
      .withColumn("__na", sum("ca").over(all).cast("long"))
      .withColumn("__nb", sum("cb").over(all).cast("long"))
      .withColumn("__gap",
        coalesce(lead(col("v"), 1).over(Window.orderBy(col("v"))) -
          col("v"), lit(0L)))
      .agg(
        max("__na").cast("long").as("n_a"),
        max("__nb").cast("long").as("n_b"),
        sum(abs(col("__cumA").cast(D38) * col("__nb") -
          col("__cumB").cast(D38) * col("__na")) * col("__gap"))
          .cast(D38).as("__num"))
      .withColumn("w1_x1e6",
        when(col("n_a") > 0 && col("n_b") > 0,
          expr(s"""CAST(__num * 1000000
                   div (CAST(n_a AS $D38) * n_b) AS BIGINT)"""))
          .otherwise(lit(null).cast("long")))
      .select("n_a", "n_b", "w1_x1e6")
  }

  /** Exact energy distance (Székely & Rizzo 2004, V-statistic form)
    * between two samples from per-domain-value counts `(v, ca, cb)` —
    * the characteristic-function drift metric that, unlike W₁, weights
    * big displacements quadratically… and on the line reduces to three
    * pairwise-|difference| expectations, each computable EXACTLY in one
    * ordered pass over the collapsed domain (Σᵢⱼ cᵢc'ⱼ|vᵢ−vⱼ| via
    * value-weighted prefix sums — never the quadratic pair set):
    *
    *   D² = 2·S_ab/(n_a n_b) − S_aa/n_a² − S_bb/n_b²   (≥ 0, V-statistic)
    *
    * emitted as the exact ×10⁶ floor over the common denominator
    * n_a²n_b². Loud when the cross term nears the DECIMAL envelope;
    * NULL when a side is empty.
    *
    * @return one row: `n_a, n_b, e2_x1e6`
    */
  def energyDistanceFromCounts(counts: DataFrame): DataFrame = {
    val before = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val all = Window.partitionBy()
    // Σ_j c'_j Σ_i c_i |v_i − v_j| with i strictly before j, both orders
    // folded: for each row j and side pair (x→y), the strictly-before
    // contribution is y_j·(v_j·cumX_j − cumXV_j); summing it for (a→b)
    // and (b→a) gives S_ab; same-side sums use their own prefixes ×2.
    def term(yc: Column, cumX: Column, cumXV: Column): Column =
      yc.cast(D38) * (col("v").cast(D38) * cumX - cumXV)
    counts
      .withColumn("__ca_b", coalesce(sum("ca").over(before), lit(0L)))
      .withColumn("__cb_b", coalesce(sum("cb").over(before), lit(0L)))
      .withColumn("__cav_b",
        coalesce(sum(col("ca").cast(D38) * col("v")).over(before),
          lit(0).cast(D38)))
      .withColumn("__cbv_b",
        coalesce(sum(col("cb").cast(D38) * col("v")).over(before),
          lit(0).cast(D38)))
      .agg(
        sum("ca").cast("long").as("n_a"),
        sum("cb").cast("long").as("n_b"),
        sum(term(col("cb"), col("__ca_b"), col("__cav_b")) +
          term(col("ca"), col("__cb_b"), col("__cbv_b"))).cast(D38)
          .as("__sab"),
        sum(term(col("ca"), col("__ca_b"), col("__cav_b")) * 2).cast(D38)
          .as("__saa"),
        sum(term(col("cb"), col("__cb_b"), col("__cbv_b")) * 2).cast(D38)
          .as("__sbb"))
      .withColumn("__sab",
        when(expr(s"""abs(__sab) * n_a * n_b * 2 >=
                      CAST('1' || repeat('0', 31) AS $D38)"""),
          raise_error(lit("energy_distance: cross term exceeds the " +
            "exact-arithmetic envelope 1e31 - pre-scale or bin first")))
          .otherwise(col("__sab")))
      .withColumn("e2_x1e6",
        when(col("n_a") > 0 && col("n_b") > 0,
          expr(s"""CAST((CAST(2 AS $D38) * __sab * n_a * n_b -
                   __saa * n_b * n_b - __sbb * n_a * n_a) * 1000000
                   div (CAST(n_a AS $D38) * n_a * n_b * n_b) AS BIGINT)"""))
          .otherwise(lit(null).cast("long")))
      .select("n_a", "n_b", "e2_x1e6")
  }

  /** Quartile-based distribution-shape report per group from per-value
    * counts `(groupCols…, v, c)`: Bowley's quartile skewness
    * (q1 + q3 − 2·q2)/(q3 − q1) and the quartile coefficient of
    * dispersion (q3 − q1)/(q3 + q1), both as exact sign-split ppm
    * floors — the outlier-immune shape QA a metric-hardening pass runs
    * beside [[trimmedMeansFromCounts]]. Quartiles by the declared exact
    * integer rule q_k = smallest v with 4·cum ≥ k·n (the q359 grand-
    * median convention at quarter resolution) — cross-multiplied, no
    * division. Bowley NULL when q3 = q1 (no quartile spread); QCD is a
    * positive-scale measure, NULL unless q1 > 0. One ordered pass per
    * group, windows PARTITIONED by group.
    *
    * @return one row per group: `groupCols…, n, q1, q2, q3,
    *         bowley_skew_ppm, qcd_ppm`
    */
  def quartileShapeFromCounts(cells: DataFrame,
                              groupCols: Seq[String]): DataFrame = {
    val seg = groupCols.map(col)
    val wUp = Window.partitionBy(seg: _*).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(seg: _*)
    def qk(k: Int) =
      min(when(lit(4L) * col("__cum") >= lit(k.toLong) * col("__n"),
        col("v"))).cast("long").as(s"q$k")
    cells
      .withColumn("__cum", sum("c").over(wUp).cast("long"))
      .withColumn("__n", sum("c").over(wAll).cast("long"))
      .groupBy(seg: _*)
      .agg(max("__n").cast("long").as("n"), qk(1), qk(2), qk(3))
      .withColumn("bowley_skew_ppm", {
        val num = col("q1") + col("q3") - lit(2L) * col("q2")
        when(col("q3") > col("q1"),
          (when(num >= 0, lit(1L)).otherwise(lit(-1L))) *
            expr(s"""CAST(abs(CAST(q1 AS $D38) + q3 - 2 * q2) * 1000000
                     div (CAST(q3 AS $D38) - q1) AS BIGINT)"""))
          .otherwise(lit(null).cast("long"))
      })
      .withColumn("qcd_ppm",
        when(col("q1") > 0L,
          expr(s"""CAST((CAST(q3 AS $D38) - q1) * 1000000
                   div (CAST(q3 AS $D38) + q1) AS BIGINT)"""))
          .otherwise(lit(null).cast("long")))
      .select((seg ++ Seq(col("n"), col("q1"), col("q2"), col("q3"),
        col("bowley_skew_ppm"), col("qcd_ppm"))): _*)
  }
}
