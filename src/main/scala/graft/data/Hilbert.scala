package graft.data

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hilbert curve index for 2-D data layout — the locality-preserving
  * alternative to q240's Morton/Z-order: consecutive Hilbert ranks are
  * always grid-adjacent (Manhattan distance 1), so range shards cut along
  * the index enclose tighter x/y bounding boxes (better skip pruning for
  * point/range predicates on EITHER dimension).
  *
  * The classic xy2d loop carries a rotation state, so the index is built
  * as `order` UNROLLED per-round column projections (withColumn per round —
  * linear plan, full codegen, no UDF). [[sqlSteps]] emits the IDENTICAL
  * arithmetic as DuckDB CTE text from the same round loop, so the oracle
  * can never drift from the Spark implementation.
  *
  * Per round (s = 2^(order−1) … 1, quadrant via CASE, not bit-xor, so both
  * engines run literally the same expression shape):
  *   rx = (x & s) > 0 ; ry = (y & s) > 0
  *   d += s²·(rx&ry ? 2 : rx ? 3 : ry ? 1 : 0)
  *   if !ry { if rx { reflect }; swap(x, y) }
  */
object Hilbert {

  /** Append `outCol` = Hilbert index of (`xCol`, `yCol`) on the 2^order ×
    * 2^order grid. Inputs must already be in [0, 2^order).
    */
  def withIndex(df: DataFrame, xCol: String, yCol: String, order: Int,
                outCol: String): DataFrame = {
    require(order >= 1 && order <= 31, s"order=$order out of range")
    val x0 = s"__h_x"; val y0 = s"__h_y"; val d0 = s"__h_d"
    var cur = df
      .withColumn(x0, col(xCol).cast("long"))
      .withColumn(y0, col(yCol).cast("long"))
      .withColumn(d0, lit(0L))
    var s = 1L << (order - 1)
    while (s > 0) {
      val rx = col(x0).bitwiseAND(lit(s)) > 0
      val ry = col(y0).bitwiseAND(lit(s)) > 0
      val quad = when(rx && ry, lit(2L)).when(rx, lit(3L))
        .when(ry, lit(1L)).otherwise(lit(0L))
      // materialize each round as ONE projection: compute next x/y/d from
      // the previous round's frozen columns (no exponential expr blowup)
      cur = cur
        .withColumn("__h_d_n", col(d0) + lit(s * s) * quad)
        .withColumn("__h_x_n",
          when(!ry, when(rx, lit(s - 1) - col(y0)).otherwise(col(y0)))
            .otherwise(col(x0)))
        .withColumn("__h_y_n",
          when(!ry, when(rx, lit(s - 1) - col(x0)).otherwise(col(x0)))
            .otherwise(col(y0)))
        .withColumn(d0, col("__h_d_n"))
        .withColumn(x0, col("__h_x_n"))
        .withColumn(y0, col("__h_y_n"))
        .drop("__h_d_n", "__h_x_n", "__h_y_n")
      s >>= 1
    }
    cur.withColumn(outCol, col(d0)).drop(x0, y0, d0)
  }

  /** The same rounds as DuckDB CTE text: returns (cteChainSql, finalName).
    * `srcName` must expose columns `x, y` plus `carryCols`; the final CTE
    * exposes `carryCols, x, y` (mutated) and `d` (the Hilbert index).
    */
  def sqlSteps(srcName: String, carryCols: Seq[String],
               order: Int): (String, String) = {
    require(order >= 1 && order <= 31, s"order=$order out of range")
    val carry = carryCols.map(c => s"$c, ").mkString
    val sb = new StringBuilder
    var prev = srcName
    var s = 1L << (order - 1)
    var i = 0
    // seed CTE: d = 0
    sb.append(s"__h0 AS (SELECT $carry x, y, CAST(0 AS BIGINT) AS d FROM $srcName),\n")
    prev = "__h0"
    while (s > 0) {
      i += 1
      val name = s"__h$i"
      sb.append(
        s"""$name AS (
           SELECT $carry
             d + ${s * s} * (CASE WHEN (x & $s) > 0 AND (y & $s) > 0 THEN 2
                                  WHEN (x & $s) > 0 THEN 3
                                  WHEN (y & $s) > 0 THEN 1
                                  ELSE 0 END) AS d,
             CASE WHEN (y & $s) = 0 THEN
               (CASE WHEN (x & $s) > 0 THEN ${s - 1} - y ELSE y END)
             ELSE x END AS x,
             CASE WHEN (y & $s) = 0 THEN
               (CASE WHEN (x & $s) > 0 THEN ${s - 1} - x ELSE x END)
             ELSE y END AS y
           FROM $prev),\n""")
      prev = name
      s >>= 1
    }
    (sb.toString, prev)
  }
}
