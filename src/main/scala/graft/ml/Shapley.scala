package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact Shapley-value channel attribution (Shapley 1953 applied to
  * conversion credit — the principled alternative to last-touch / decay
  * heuristics like q224): with a SMALL declared channel set, the
  * characteristic function v(S) = "converted users whose prior-touch
  * channel set ⊆ S" makes every Shapley value an exact rational with
  * denominator n!, so the whole computation stays in integers:
  *
  *   n!·φ_i = Σ_{S ⊆ N∖{i}} |S|!·(n−1−|S|)!·(v(S∪{i}) − v(S))
  *
  * Plan shape: ONE hash aggregation collapses users to 2ⁿ mask counts;
  * everything after runs on ≤ 2ⁿ-row frames (subset-containment joins
  * T ⊆ S ⟺ T AND S = T — no negation, replayable bit-for-bit in any
  * engine). Efficiency identity Σᵢ n!·φᵢ = n!·(v(N) − v(∅)) rides along
  * as a verdict column.
  *
  * @param userMasks one row per CONVERTED user with integer `mask`
  *                  (bit i set ⟺ channels(i) touched before conversion)
  * @param channels  the declared channel order (bit i = channels(i));
  *                  at most 8
  * @return one row per channel: `channel, shap_xnfact, share_ppm,
  *         efficiency_ok`
  */
object Shapley {

  private def fact(k: Int): Long = (1 to k).foldLeft(1L)(_ * _)

  def channelAttribution(userMasks: DataFrame,
                         channels: Seq[String]): DataFrame = {
    val n = channels.length
    require(n >= 1 && n <= 8, s"1 <= channels <= 8, got $n")
    val spark = userMasks.sparkSession
    import spark.implicits._
    val nSub = 1 << n
    val conv = userMasks
      .groupBy(col("mask").cast("int").as("m"))
      .agg(count(lit(1)).cast("long").as("cnt"))
    val subsets = (0 until nSub).map(s => Tuple1(s)).toDF("s")
    // v(S) = Σ_{T ⊆ S} conv(T); containment T ⊆ S ⟺ T AND S = T
    val v = subsets
      .join(conv, (col("m").bitwiseAND(col("s")) === col("m")), "left")
      .groupBy("s").agg(coalesce(sum("cnt"), lit(0L)).cast("long").as("v"))
    // weights |S|!(n-1-|S|)! by popcount, as a literal CASE chain
    val w = (0 until n).foldLeft(lit(0L)) { (acc, k) =>
      when(bit_count(col("s")) === k, lit(fact(k) * fact(n - 1 - k)))
        .otherwise(acc)
    }
    val chan = channels.zipWithIndex
      .map { case (c, i) => (c, 1 << i) }.toDF("channel", "bit")
    val terms = chan
      .join(v.select(col("s"), col("v").as("v_lo")),
        col("s").bitwiseAND(col("bit")) === 0)
      .join(v.select(col("s").as("s_hi"), col("v").as("v_hi")),
        col("s_hi") === col("s").bitwiseOR(col("bit")))
      .withColumn("__w", w)
      .groupBy("channel")
      .agg(sum(col("__w") * (col("v_hi") - col("v_lo"))).cast("long")
        .as("shap_xnfact"))
    val vAll = v.agg(
      max(when(col("s") === nSub - 1, col("v"))).cast("long").as("__vn"),
      max(when(col("s") === 0, col("v"))).cast("long").as("__v0"))
    val all = org.apache.spark.sql.expressions.Window.partitionBy()
    terms.crossJoin(broadcast(vAll))
      .withColumn("__total", sum("shap_xnfact").over(all).cast("long"))
      .withColumn("efficiency_ok",
        col("__total") === lit(fact(n)) * (col("__vn") - col("__v0")))
      .withColumn("share_ppm",
        when(col("__vn") - col("__v0") > 0,
          expr(s"""CAST(CAST(shap_xnfact AS DECIMAL(38,0)) * 1000000
                   div (${fact(n)} * (__vn - __v0)) AS BIGINT)"""))
          .otherwise(lit(null).cast("long")))
      .select("channel", "shap_xnfact", "share_ppm", "efficiency_ok")
  }
}
