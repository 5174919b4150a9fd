package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Backward (inclusive) as-of join — for every left row, the right row with
  * the greatest timestamp <= the left row's timestamp within the same key
  * group; the event-stream primitive ("state at the time of the event")
  * Spark has no built-in operator for.
  *
  * Spark-first shape: no range join and no per-key collect. Both sides union
  * into one relation tagged with a side marker, ONE window per key ordered by
  * (ts, side) carries the most recent right payload forward
  * (`last(_, ignoreNulls)` over an unbounded-preceding frame), and left rows
  * read it. Cost = one shuffle on the key columns + one in-partition sort —
  * the same plan a plain windowed aggregation pays, scaling with per-key
  * volume rather than pair cardinality (a range-predicate join would explode
  * on hot keys). Right rows sort BEFORE left rows at equal timestamps
  * (side 0 < 1), which is exactly backward-inclusive semantics.
  *
  * The payload travels as ONE struct column, not per-column carries: the
  * window's ignoreNulls must distinguish "no right row yet" (null struct —
  * skip) from "matched right row whose payload VALUE is null" (non-null
  * struct with null field — carry faithfully). Per-column last() would skip
  * genuinely-null payload values and resurrect a stale older row's value —
  * and with several payload columns could even mix values from different
  * right rows; the struct makes the whole payload atomic per matched row.
  *
  * NULL join keys and NULL timestamps never match (standard join semantics
  * — a NULL comparison is never true, and DuckDB's native ASOF JOIN agrees):
  * null-key/null-ts right rows are filtered out of the match relation, and a
  * null-ts left row's payload is forced null (in the descending forward scan
  * nulls sort last and would otherwise pick up a stale carry).
  *
  * Determinism contract: `right` must be unique per (keys, rightTs) — with
  * two right rows on the same instant "the latest one" is undefined in any
  * as-of semantics (DuckDB's ASOF JOIN has the same precondition); aggregate
  * the right side first (see q83).
  */
object AsofJoin {

  /** @param payload right columns carried onto matching left rows, each
    *                renamed with `suffix`; unmatched left rows get nulls
    *                (left-outer semantics).
    */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String, payload: Seq[String],
               suffix: String = "_asof"): DataFrame =
    join(left, right, keys, leftTs, rightTs, payload, suffix, forward = false)

  /** Forward (inclusive) as-of join: for every left row, the right row with
    * the SMALLEST timestamp >= the left row's timestamp — "the next state
    * change after the event". Same plan as [[backward]], scanning descending.
    */
  def forward(left: DataFrame, right: DataFrame, keys: Seq[String],
              leftTs: String, rightTs: String, payload: Seq[String],
              suffix: String = "_asof"): DataFrame =
    join(left, right, keys, leftTs, rightTs, payload, suffix, forward = true)

  private def join(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTs: String, rightTs: String, payload: Seq[String],
                   suffix: String, forward: Boolean): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one key column")
    require(payload.nonEmpty, "as-of join with no payload columns is a no-op")
    payload.foreach { p =>
      require(!left.columns.contains(p + suffix),
        s"left already has a column named '${p + suffix}' — pick another suffix")
    }
    require(!left.columns.exists(c => c == "__ts" || c == "__side" || c == "__p" || c == "__m"),
      "left must not use the operator's reserved __ts/__side/__p/__m column names")
    // the payload struct type, nullable so left rows can carry a null struct
    val pType = StructType(payload.map(p => right.schema(p).copy(name = p)))
    val lPrep = left
      .withColumn("__ts", col(leftTs)).withColumn("__side", lit(1))
      .withColumn("__p", lit(null).cast(pType))
    val rKeyed = right
      // null keys/timestamps never match: drop them before they can share a
      // window partition with (and leak payload into) null-key left rows
      .filter(keys.map(col(_).isNotNull).reduce(_ && _) && col(rightTs).isNotNull)
      .select(
        (keys.map(col) :+ col(rightTs).as("__ts")) :+
          struct(payload.map(col): _*).as("__p"): _*)
      .withColumn("__side", lit(0))
    // null-pad the left-only columns so the two sides union by name
    val leftOnly = left.columns.filterNot(keys.contains)
    val rPrep = leftOnly.foldLeft(rKeyed) { (df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    val unioned = lPrep.unionByName(rPrep.select(lPrep.columns.map(col).toIndexedSeq: _*))
    // scanning ascending, "last right seen" = greatest ts <= current
    // (backward); scanning descending it = smallest ts >= current (forward).
    // Right rows (side 0) sort before left rows at equal ts either way ->
    // both directions are inclusive.
    val tsOrder = if (forward) col("__ts").desc else col("__ts").asc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(tsOrder, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
    matched.filter(col("__side") === 1)
      .select(left.columns.map(col).toIndexedSeq ++
        payload.map(p => when(col("__ts").isNotNull, col("__m").getField(p))
          .as(p + suffix)): _*)
  }
}
