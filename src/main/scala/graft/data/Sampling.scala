package graft.data

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling for training-data pipelines.
  *
  * A 100 TB pipeline cannot use `df.sample()`: its output depends on
  * partition layout and the sampler's per-partition RNG stream, so the
  * kept set changes whenever the file split plan changes, and two runs
  * (or a retried task) disagree. Content-hash Bernoulli sampling fixes
  * that: a row is kept iff a cryptographic hash of (salt, key) falls
  * under the rate threshold — a pure per-row predicate, so it is
  * map-only, pushes through column pruning, survives retries, and any
  * engine (here: DuckDB replaying the same md5 in the oracle) agrees
  * row-for-row. Varying the salt draws an independent sample.
  */
object Sampling {

  private val D38 = "decimal(38,0)"

  /** 4-hex-digit threshold: rows with md5 prefix strictly below it are kept,
    * so the effective rate is floor(rate * 65536) / 65536 — exact, engine-
    * independent, and monotone in `rate` (raising the rate only ADDS rows,
    * which makes downstream caches/reruns incremental).
    */
  def thresholdHex(rate: Double): String = {
    require(rate >= 0 && rate <= 1, s"rate must be in [0,1], got $rate")
    val n = math.floor(rate * 65536).toLong.min(65536)
    // rate 1.0 must keep EVERY row. The numeric threshold 65536 renders as
    // "10000", but the comparison is LEXICOGRAPHIC ("ffff" > "10000" because
    // 'f' > '1'), so that string would keep only prefixes starting '0'.
    // 'g' sorts above every hex digit, hence above every 4-hex-char prefix.
    if (n >= 65536) "g" else f"$n%04x"
  }

  /** The keep predicate: md5 of salt + key, first 4 hex chars, string-compared
    * against the rate threshold. Lowercase hex both here and in DuckDB.
    */
  def keepExpr(key: Column, rate: Double, salt: String): Column =
    substring(md5(concat(lit(salt), key.cast("string")).cast("binary")), 1, 4) <
      lit(thresholdHex(rate))

  /** Deterministic Bernoulli sample of `df` at `rate` keyed on `keyCol`. */
  def hashSample(df: DataFrame, keyCol: String, rate: Double,
                 salt: String = "graft"): DataFrame =
    df.filter(keepExpr(col(keyCol), rate, salt))

  /** Stratified deterministic sampling — the source/language MIXING primitive
    * of a training-data pipeline: each stratum (language, source, quality
    * bucket) keeps its own rate, so one map-only pass re-weights the corpus
    * ("keep 50% of en, 10% of fr, default 5%") with all of [[hashSample]]'s
    * guarantees: layout-independent, retry-stable, monotone in each rate, and
    * replayable by any engine. The per-stratum threshold is a CASE chain on
    * the stratum column — a pure row predicate, so column pruning and filter
    * pushdown survive, and there is no shuffle, no per-stratum pass, and no
    * driver-side stratum discovery.
    *
    * Strata absent from `rates` fall back to `defaultRate` (0.0 = drop, the
    * conservative default for unknown sources); a null stratum uses the
    * default too.
    */
  def stratifiedHashSample(df: DataFrame, keyCol: String, strataCol: String,
                           rates: Map[String, Double],
                           defaultRate: Double = 0.0,
                           salt: String = "graft"): DataFrame =
    df.filter(stratifiedKeepExpr(col(keyCol), col(strataCol), rates,
      defaultRate, salt))

  /** Fractional-EPOCH mixing — the UPSAMPLING dual of
    * [[stratifiedHashSample]]: every sampler above only drops rows; a
    * training-run mixture also REPEATS them ("3 epochs of wiki, 0.5 of
    * web", the data-mixing recipe for LLM training). Each stratum's epoch
    * count is given in exact ppm; a row emits `floor(epochs)` copies plus
    * one more iff its salted md5 prefix falls under the fractional-part
    * threshold, so expected multiplicity is exact to [[thresholdHex]]'s
    * 1/65536 granularity, per-row deterministic, layout-independent, and
    * map-only (a pure filter + a bounded explode — no shuffle, no RNG).
    * `copy_idx` (1-based) disambiguates the emitted duplicates so a
    * downstream global shuffle can separate them.
    */
  def epochMix(df: DataFrame, keyCol: String, strataCol: String,
               epochsPpm: Map[String, Long], defaultPpm: Long = 1000000L,
               salt: String = "graft"): DataFrame = {
    require((defaultPpm +: epochsPpm.values.toSeq).forall(_ >= 0),
      "epoch ppm values must be non-negative")
    def whole(ppm: Long): Long = ppm / 1000000L
    def fracHex(ppm: Long): String =
      thresholdHex((ppm % 1000000L).toDouble / 1000000.0)
    // deterministic CASE order (sorted keys) — the stratifiedKeepExpr rule
    val sorted = epochsPpm.toSeq.sortBy(_._1)
    val wholeCopies = sorted.foldLeft(lit(whole(defaultPpm))) {
      case (acc, (s0, ppm)) =>
        when(col(strataCol) === s0, lit(whole(ppm))).otherwise(acc)
    }
    val fracThreshold = sorted.foldLeft(lit(fracHex(defaultPpm))) {
      case (acc, (s0, ppm)) =>
        when(col(strataCol) === s0, lit(fracHex(ppm))).otherwise(acc)
    }
    val extra = when(
      substring(md5(concat(lit(salt), col(keyCol).cast("string"))
        .cast("binary")), 1, 4) < fracThreshold, 1L).otherwise(0L)
    df.withColumn("__n_copies", (wholeCopies + extra).cast("long"))
      .filter(col("__n_copies") > 0)
      .withColumn("copy_idx",
        explode(sequence(lit(1L), col("__n_copies"))))
      .drop("__n_copies")
  }

  /** The bare stratified keep predicate, for callers that need both halves
    * of the split (e.g. [[CorpusPipeline]]'s mixing stage labels the
    * complement as `sampled_out`).
    */
  def stratifiedKeepExpr(key: Column, strata: Column,
                         rates: Map[String, Double], defaultRate: Double,
                         salt: String = "graft"): Column = {
    // deterministic CASE order (sorted keys) so the expression — and any
    // plan fingerprint built from it — is stable across Map iteration orders
    val threshold = rates.toSeq.sortBy(_._1).foldLeft(lit(thresholdHex(defaultRate))) {
      case (acc, (stratum, rate)) =>
        when(strata === stratum, lit(thresholdHex(rate))).otherwise(acc)
    }
    substring(md5(concat(lit(salt), key.cast("string")).cast("binary")), 1, 4) <
      threshold
  }

  /** Temperature-based mixing rates — the multilingual-corpus recipe
    * (mBERT/XLM-R): sample stratum l with probability proportional to
    * (n_l/N)^alpha, re-weighting toward rare strata for alpha < 1 (alpha = 1
    * keeps natural proportions, alpha -> 0 approaches uniform). Returns the
    * per-stratum KEEP RATES whose expected output is `targetFraction` of the
    * corpus: rate_l = targetFraction * N * q_l / n_l with q_l the normalized
    * temperature weight, capped at 1.0 (a saturated rare stratum can push
    * the realized fraction slightly below target — the standard behavior).
    * Feed the result to [[stratifiedHashSample]].
    *
    * Deterministic given the data: one count aggregation, the tiny stratum
    * table is reduced driver-side in sorted-stratum order. alpha = 0.5 (the
    * common setting) computes weights with sqrt, which IEEE 754 rounds
    * exactly — bit-identical across engines, so the derived rates are
    * oracle-replayable; other alphas go through pow, whose last-ulp
    * behavior is library-specific.
    */
  def temperatureRates(df: DataFrame, strataCol: String, alpha: Double,
                       targetFraction: Double): Map[String, Double] = {
    require(alpha > 0, s"alpha must be positive, got $alpha")
    require(targetFraction > 0 && targetFraction <= 1,
      s"targetFraction must be in (0,1], got $targetFraction")
    val counts = df.filter(col(strataCol).isNotNull)
      .groupBy(col(strataCol).cast("string").as("__s"))
      .agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .sortBy(_._1)
    if (counts.isEmpty) return Map.empty
    val total = counts.map(_._2).sum.toDouble // integer sum: exact
    val wts = counts.map { case (s, n) =>
      val p = n.toDouble / total
      s -> (if (alpha == 0.5) math.sqrt(p) else math.pow(p, alpha))
    }
    val sw = wts.map(_._2).sum // summed in sorted-stratum order
    wts.zip(counts).map { case ((s, wt), (_, n)) =>
      s -> math.min(1.0, targetFraction * total * (wt / sw) / n.toDouble)
    }.toMap
  }

  /** Deterministic QUOTA sampling: exactly `n` rows per stratum (fewer if the
    * stratum is smaller) — the fixed-budget counterpart of
    * [[stratifiedHashSample]]'s rates, for "cap every source at N documents".
    * The kept set is the `n` rows with the smallest content hash, so it is
    * layout-independent and reproducible like every sampler here, and
    * RAISING n only ADDS rows (the hash order is a fixed permutation per
    * stratum — incremental quota growth never churns the previously kept
    * set). One shuffle on the stratum column + a per-group top-n window; for
    * heavily skewed strata sizes the window sort is bounded by the stratum's
    * row count, the same bound any per-group top-n pays.
    */
  def quotaSample(df: DataFrame, keyCol: String, strataCol: String, n: Int,
                  salt: String = "graft"): DataFrame = {
    require(n >= 0, s"quota must be non-negative, got $n")
    import org.apache.spark.sql.expressions.Window
    val h = md5(concat(lit(salt), col(keyCol).cast("string")).cast("binary"))
    val w = Window.partitionBy(strataCol).orderBy(h.asc, col(keyCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }

  /** Deterministic weighted sampling without replacement — Efraimidis &
    * Spirakis (IPL 2006): each row draws a reproducible uniform u from a
    * salted content hash and ranks by u^(1/w); the top n ranks ARE a
    * weight-proportional sample without replacement. Ranking uses the
    * monotone-equivalent ln(u)/w (descending) so the score stays in a
    * friendly magnitude range, rounded to 9 decimals with an id tiebreak so
    * the selection is stable against last-ulp libm drift (the BM25 oracle
    * convention).
    *
    * Shape: map-side score, then a distributed top-n (sort+limit lowers to
    * TakeOrdered — k rows per partition reach the driver merge, never a
    * global sort). u comes from 48 md5 bits (exactly representable in a
    * double), so every engine replays the same sample bit-for-bit.
    * Non-positive or null weights are excluded (they'd get -inf/NaN keys).
    *
    * Precondition (like [[graft.operators.AsofJoin]]'s right-side key):
    * `keyCol` values must be UNIQUE — duplicate keys draw the same u (so
    * their inclusion is fully correlated) and tie on the (key, score) sort,
    * making the cut at position n partitioning-dependent.
    */
  def weightedSample(df: DataFrame, keyCol: String, weightCol: String, n: Int,
                     salt: String = "graft"): DataFrame = {
    require(n >= 0, s"sample size must be non-negative, got $n")
    require(!df.columns.contains("__wkey"),
      "input must not use the operator's reserved __wkey column name")
    val u = conv(substring(
        md5(concat(lit(salt), col(keyCol).cast("string")).cast("binary")), 1, 12),
      16, 10).cast("long").cast("double") / 281474976710656.0 // 2^48
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("__wkey", round(log(u) / col(weightCol).cast("double"), 9))
      .orderBy(col("__wkey").desc, col(keyCol))
      .limit(n)
  }

  /** Per-stratum percentile band filter — the CCNet/Gopher-style quality
    * cut "keep documents between the p10 and p90 of their language's score
    * distribution", where absolute thresholds would mis-cut every stratum
    * whose score distribution differs.
    *
    * Shape: one aggregation computes each stratum's [lower, upper] exact
    * interpolated percentiles (one row per stratum — tiny by construction,
    * broadcast back), then a map-side filter keeps rows inside their own
    * stratum's band. No window over the data — the only shuffle is the
    * bounds aggregation's. `exact = false` is the 100 TB path: the bounds
    * come from `percentile_approx` (a GK sketch, accuracy 10000 — the q97
    * trade) whose state is mergeable, at the cost of oracle replayability;
    * the filter side is unchanged either way.
    */
  def percentileBandFilter(df: DataFrame, valueCol: String, strataCol: String,
                           lower: Double, upper: Double,
                           exact: Boolean = true): DataFrame = {
    require(lower >= 0 && upper <= 1 && lower <= upper,
      s"need 0 <= lower <= upper <= 1, got [$lower, $upper]")
    Seq("__lo", "__hi").foreach { c =>
      require(!df.columns.contains(c),
        s"input must not use the operator's reserved $c column name")
    }
    def pct(p: Double) =
      if (exact) percentile(col(valueCol), lit(p))
      else percentile_approx(col(valueCol), lit(p), lit(10000))
    val bounds = df.groupBy(strataCol).agg(
      pct(lower).as("__lo"), pct(upper).as("__hi"))
    df.join(broadcast(bounds), Seq(strataCol))
      .filter(col(valueCol) >= col("__lo") && col(valueCol) <= col("__hi"))
      .drop("__lo", "__hi")
  }

  /** Deterministic weight-proportional SYSTEMATIC sample — the
    * exact-integer complement of [[weightedSample]]'s hash draw (classic
    * PPS systematic selection, Madow 1949): lay the m stride marks
    * k·W/m (k = 1..m) along the cumulative weight axis in `keyCol`
    * order and keep every row whose weight interval (cum−w, cum] covers
    * a mark. The rule is replayed as two exact integer floors —
    * keep ⟺ (cum·m) div W > ((cum−w)·m) div W — so both engines select
    * the identical rows with zero randomness and zero doubles; rows
    * heavier than one stride are kept ONCE (declared semantics — no
    * multiplicity), so the sample can be smaller than m in a
    * heavy-tailed corpus, never larger.
    *
    * Shape: the running total comes from
    * [[graft.operators.GlobalCumsum]] (distributed sort + one partial
    * sum per partition — never a 1-partition window), the total-weight
    * frame is one row broadcast back, and the keep rule is a map-side
    * filter. The floors run in DECIMAL(38,0): cum·m stays exact to
    * W·m < 10³⁸ and the selected `pick_k` ≤ m fits a long.
    *
    * Non-positive / null weights are excluded (a zero-width interval
    * can cover no mark). `keyCol` must be unique (total order).
    *
    * @return the kept rows: `keyCol, weightCol, cum_w, pick_k`
    */
  def systematicWeighted(df: DataFrame, keyCol: String, weightCol: String,
                         m: Int): DataFrame = {
    require(m > 0, s"sample size must be positive, got $m")
    val pos = df.select(col(keyCol), col(weightCol).cast("long").as("__w"))
      .filter(col("__w").isNotNull && col("__w") > 0)
    val cum = graft.operators.GlobalCumsum
      .withCumsum(pos, "cum_w", "__w", Seq(keyCol))
    val tot = cum.agg(max("cum_w").cast("long").as("__tot"))
    cum.crossJoin(broadcast(tot))
      .withColumn("pick_k",
        expr(s"""CAST(CAST(cum_w AS $D38) * $m div __tot AS BIGINT)"""))
      .filter(col("pick_k") >
        expr(s"""CAST((CAST(cum_w AS $D38) - __w) * $m div __tot
                 AS BIGINT)"""))
      .select(col(keyCol), col("__w").as(weightCol), col("cum_w"),
        col("pick_k"))
  }
}
