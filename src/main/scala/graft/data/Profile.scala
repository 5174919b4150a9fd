package graft.data

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, StringType}

/** One-pass column profiling — the data-quality report every ingestion
  * pipeline runs before trusting a new table drop: per-column null counts,
  * cardinality and bounds, computed in a SINGLE aggregation over one scan
  * (Catalyst plans the multi-column exact distinct through one Expand +
  * partial aggregation — column count multiplies the Expand fan-out, never
  * the number of scans).
  *
  * Exact `count(DISTINCT)` keeps the report oracle-replayable; at 100 TB
  * flip `exactDistinct = false` to HLL (`approx_count_distinct`, rsd 5%),
  * which drops the Expand entirely — the same report shape from a plain
  * one-pass hash aggregate.
  */
object Profile {

  /** Profile `cols` of `df` (numeric and string columns; numeric bounds land
    * in `min_num`/`max_num` as doubles, string bounds in `min_str`/`max_str`).
    * Output: one row per column —
    * (col_name, n_rows, n_null, n_distinct, min_num, max_num, min_str, max_str).
    */
  def profile(df: DataFrame, cols: Seq[String],
      exactDistinct: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val nullD = lit(null).cast("double")
    val nullS = lit(null).cast("string")

    val aggs: Seq[Column] = cols.flatMap { c =>
      val nd =
        if (exactDistinct) countDistinct(col(c))
        else approx_count_distinct(col(c))
      Seq(count(col(c)).as(s"__cnt_$c"), nd.cast("long").as(s"__nd_$c")) ++
        (df.schema(c).dataType match {
          case _: NumericType => Seq(
            min(col(c)).cast("double").as(s"__min_$c"),
            max(col(c)).cast("double").as(s"__max_$c"))
          case StringType => Seq(
            min(col(c)).as(s"__min_$c"),
            max(col(c)).as(s"__max_$c"))
          case other => throw new IllegalArgumentException(
            s"profile supports numeric and string columns, '$c' is $other")
        })
    }
    val row = df.agg(count(lit(1)).as("__n"), aggs: _*)

    val perCol = cols.map { c =>
      val numeric = df.schema(c).dataType.isInstanceOf[NumericType]
      struct(
        lit(c).as("col_name"),
        col("__n").cast("long").as("n_rows"),
        (col("__n") - col(s"__cnt_$c")).cast("long").as("n_null"),
        col(s"__nd_$c").as("n_distinct"),
        (if (numeric) col(s"__min_$c") else nullD).as("min_num"),
        (if (numeric) col(s"__max_$c") else nullD).as("max_num"),
        (if (numeric) nullS else col(s"__min_$c")).as("min_str"),
        (if (numeric) nullS else col(s"__max_$c")).as("max_str"))
    }
    row.select(explode(array(perCol: _*)).as("p")).select("p.*")
  }

  /** Snapshot drift report — [[profile]] of two table drops joined per
    * column, with integer-exact deltas and a machine-checked drift flag:
    * the "did today's crawl change shape" gate run before a new snapshot
    * replaces yesterday's in a 100 TB pipeline. Two one-pass profiles
    * (each a single scan) + a column-count-sized join; nothing touches the
    * row data twice.
    *
    * Flags fire when the null rate moves more than 1% (10000 ppm), the
    * cardinality ratio leaves [0.5x, 2x], or any min/max bound changes —
    * all integer/boolean arithmetic, oracle-replayable.
    */
  def driftReport(before: DataFrame, after: DataFrame,
                  cols: Seq[String], exactDistinct: Boolean = true): DataFrame = {
    def side(df: DataFrame, tag: String) =
      profile(df, cols, exactDistinct).select(
        col("col_name"),
        col("n_rows").as(s"rows_$tag"), col("n_null").as(s"null_$tag"),
        col("n_distinct").as(s"nd_$tag"),
        col("min_num").as(s"min_num_$tag"), col("max_num").as(s"max_num_$tag"),
        col("min_str").as(s"min_str_$tag"), col("max_str").as(s"max_str_$tag"))
    val j = side(before, "a").join(side(after, "b"), "col_name")
    // `div` (integer division) everywhere: a decimal-scale cast would ROUND
    // where the oracle's // floors
    def ppm(n: String, d: String) =
      when(col(d) === 0L, lit(0L)).otherwise(
        expr(s"CAST((CAST($n AS DECIMAL(38,0)) * 1000000) div $d AS BIGINT)"))
    val nullPpmA = ppm("null_a", "rows_a")
    val nullPpmB = ppm("null_b", "rows_b")
    val ratio = when(col("nd_a") === 0L, lit(null).cast("long"))
      .otherwise(expr("CAST((CAST(nd_b AS DECIMAL(38,0)) * 1000) div nd_a AS BIGINT)"))
    val boundsChanged =
      !(col("min_num_a") <=> col("min_num_b")) ||
      !(col("max_num_a") <=> col("max_num_b")) ||
      !(col("min_str_a") <=> col("min_str_b")) ||
      !(col("max_str_a") <=> col("max_str_b"))
    j.select(col("col_name"), col("rows_a"), col("rows_b"),
        nullPpmA.as("null_ppm_a"), nullPpmB.as("null_ppm_b"),
        col("nd_a"), col("nd_b"), ratio.as("distinct_ratio_x1000"),
        boundsChanged.as("bounds_changed"))
      .withColumn("drift_flag",
        abs(col("null_ppm_a") - col("null_ppm_b")) > 10000L ||
        coalesce(col("distinct_ratio_x1000") < 500L ||
                 col("distinct_ratio_x1000") > 2000L, lit(true)) ||
        col("bounds_changed"))
  }

  /** Join-key skew report: Gini concentration of rows-per-key plus the
    * hottest key's share, all exact integer ppm — the pre-join audit that
    * decides salting / AQE-skew knobs BEFORE paying the shuffle.
    *
    * The sorted-rank sum Σ i·xᵢ is computed on the COLLAPSED
    * frequency-of-frequency domain: a block of m keys sharing count c,
    * preceded by prevN keys, contributes c·(m·prevN + m(m+1)/2) — so the
    * ordered pass runs over |distinct counts| rows (log-ish in practice),
    * never |keys|, at any scale. Gini = (2·Σi·xᵢ − (n+1)·Σx)/(n·Σx) with
    * ascending ranks; the numerator is ≥ 0 by the Chebyshev sum
    * inequality, so integer div truncation is engine-agnostic.
    *
    * One row: (n_keys, n_rows, max_c, gini_ppm, top1_share_ppm).
    */
  def keySkewGini(df: DataFrame, keyCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d38 = "decimal(38,0)"
    val fof = df.groupBy(keyCol)
      .agg(count(lit(1)).cast("long").as("c"))
      .groupBy("c").agg(count(lit(1)).cast("long").as("m"))
    val w = Window.orderBy("c").rowsBetween(Window.unboundedPreceding, -1)
    fof
      .withColumn("prev_n", coalesce(sum("m").over(w), lit(0L)))
      .withColumn("s1_part", expr(
        s"""CAST(c AS $d38) * (CAST(m AS $d38) * prev_n +
            (CAST(m AS $d38) * (m + 1)) div 2)"""))
      .agg(sum(col("m")).cast("long").as("n_keys"),
        sum(col("c").cast(d38) * col("m")).cast(d38).as("s"),
        sum(col("s1_part")).cast(d38).as("s1"),
        max("c").cast("long").as("max_c"))
      .select(col("n_keys"), col("s").cast("long").as("n_rows"), col("max_c"),
        expr(s"""CAST((CAST(2 AS $d38) * s1 - (CAST(n_keys AS $d38) + 1) * s)
                 * 1000000 div (CAST(n_keys AS $d38) * s) AS BIGINT)""")
          .as("gini_ppm"),
        expr(s"CAST(CAST(max_c AS $d38) * 1000000 div s AS BIGINT)")
          .as("top1_share_ppm"))
  }

  /** Good–Turing smoothing table from a one-column `(term)` relation:
    * per observed frequency c, the count-of-counts N_c and the adjusted
    * count c* = (c+1)·N_{c+1}/N_c (Good 1953) — the LM-smoothing /
    * vocabulary-truncation input. The spectrum is |distinct c|-sized, so
    * the N_{c+1} lookup is a self-join on c+1 over a kilobyte; corpus
    * totals ride along as a broadcast 1-row attach.
    */
  def goodTuringTable(tokens: DataFrame, termCol: String = "term"): DataFrame = {
    val spec = tokens
      .filter(col(termCol) =!= "")
      .groupBy(termCol).agg(count(lit(1)).as("c"))
      .groupBy("c").agg(count(lit(1)).cast("long").as("n_c"))
    val next = spec.select((col("c") - 1).as("c"), col("n_c").as("n_next"))
    val tot = spec.agg(
      sum(col("c").cast("decimal(38,0)") * col("n_c")).cast("long")
        .as("n_tokens"),
      sum("n_c").cast("long").as("n_types"))
    spec.join(next, Seq("c"), "left")
      .crossJoin(broadcast(tot))
      .select(col("c").cast("long").as("c"), col("n_c"),
        coalesce(col("n_next"), lit(0L)).as("n_c1"),
        ((col("c").cast("double") + lit(1.0)) *
          coalesce(col("n_next"), lit(0L)).cast("double") /
          col("n_c").cast("double")).as("gt_cstar"),
        col("n_tokens"), col("n_types"))
  }
}
