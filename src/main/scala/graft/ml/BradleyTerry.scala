package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bradley–Terry preference aggregation: latent "strength" ratings from
  * pairwise win counts — the model behind chess ratings and RLHF
  * preference-data quality checks ("is annotator agreement consistent
  * with a single latent ordering, and what is it?").
  *
  * Fit is Hunter's MM iteration, UNROLLED (the IPF/Raking discipline):
  *   r_i ← W_i / Σ_{j≠i} n_ij / (r_i + r_j),   renormalized to mean 10⁶.
  * Every per-edge term and every rating is FLOOR-QUANTIZED to integer
  * micro-units before any cross-row sum, so the whole fit is exact
  * integer arithmetic between single IEEE divisions — bit-replayable by
  * any engine ("MM with micro-unit quantization" as declared semantics).
  *
  * Scale shape: the input collapses to the pair frame (≤|items|² rows);
  * each iteration is one join of the pair frame to the item frame and one
  * per-item aggregation — item-frame-sized forever, raw data touched
  * exactly once by the caller building the pair counts.
  */
object BradleyTerry {

  /** @param pairs directed win counts: `a, b, wins` (= times a beat b);
    *              both orientations may appear, ties excluded by caller
    * @param iters MM iterations to unroll (1–8)
    * @return one row per item: `item, wins, games, rating_micro, rank`
    *         (rank 1 = strongest; ties broken by item value)
    */
  def fit(pairs: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 8, s"unrolled iters=$iters out of range")
    // symmetric game counts per unordered pair + per-item win totals
    val directed = pairs.select(col("a"), col("b"),
      col("wins").cast("long").as("w"))
    val games = directed
      .unionByName(directed.select(col("b").as("a"), col("a").as("b"),
        col("w")))
      .groupBy("a", "b").agg(sum("w").cast("long").as("n_ab"))
    val winTotals = directed.groupBy("a")
      .agg(sum("w").cast("long").as("wins"))
    val items = games.select(col("a").as("item")).distinct()
      .join(winTotals.withColumnRenamed("a", "item"), Seq("item"), "left")
      .withColumn("wins", coalesce(col("wins"), lit(0L)))
      .withColumn("rating_micro", lit(1000000L))
    val fitted = (1 to iters).foldLeft(items) { (r, _) =>
      val ra = r.select(col("item").as("a"),
        col("rating_micro").as("__ra"))
      val rb = r.select(col("item").as("b"),
        col("rating_micro").as("__rb"))
      // per-edge term n_ab/(r_a + r_b) in nano-units, floor-quantized
      // BEFORE the per-item sum (exact integer agg, order-free)
      val denom = games
        .join(broadcast(ra), "a").join(broadcast(rb), "b")
        .withColumn("__t",
          expr("""CAST(floor(CAST(n_ab AS DOUBLE) * 1000000000 /
                  (CAST(__ra AS DOUBLE) + CAST(__rb AS DOUBLE)))
                  AS BIGINT)"""))
        .groupBy(col("a").as("item"))
        .agg(sum("__t").cast("long").as("__denom"))
      val updated = r.drop("rating_micro")
        .join(denom, Seq("item"), "left")
        .withColumn("__raw",
          when(col("__denom") > 0,
            expr("""CAST(floor(CAST(wins AS DOUBLE) * 1000000000 * 1000000
                    / CAST(__denom AS DOUBLE)) AS BIGINT)"""))
            .otherwise(lit(1000000L)))
        .drop("__denom")
      // renormalize to mean 10⁶ (floor): fixes the MM scale freedom
      val wAll = Window.partitionBy()
      updated
        .withColumn("__mean",
          (sum("__raw").over(wAll) / count(lit(1)).over(wAll))
            .cast("double"))
        .withColumn("rating_micro",
          expr("""CAST(floor(CAST(__raw AS DOUBLE) * 1000000 / __mean)
                  AS BIGINT)"""))
        .drop("__raw", "__mean")
    }
    val gamesTot = games.groupBy(col("a").as("item"))
      .agg(sum("n_ab").cast("long").as("games"))
    fitted.join(gamesTot, "item")
      .withColumn("rank", row_number().over(
        Window.orderBy(col("rating_micro").desc, col("item").asc))
        .cast("long"))
      .select("item", "wins", "games", "rating_micro", "rank")
  }
}
