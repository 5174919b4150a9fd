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
    * @param tolerance maximum match staleness in timestamp units (pandas
    *                merge_asof's `tolerance`): a backward match older than
    *                `leftTs - tolerance` (or a forward match beyond
    *                `leftTs + tolerance`) reports null payload instead of a
    *                stale carry. Requires NUMERIC timestamps (unix
    *                micros/millis) so the bound is exact integer arithmetic.
    */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String, payload: Seq[String],
               suffix: String = "_asof",
               tolerance: Option[Long] = None): DataFrame =
    join(left, right, keys, leftTs, rightTs, payload, suffix, forward = false,
      tolerance)

  /** Forward (inclusive) as-of join: for every left row, the right row with
    * the SMALLEST timestamp >= the left row's timestamp — "the next state
    * change after the event". Same plan as [[backward]], scanning descending.
    */
  def forward(left: DataFrame, right: DataFrame, keys: Seq[String],
              leftTs: String, rightTs: String, payload: Seq[String],
              suffix: String = "_asof",
              tolerance: Option[Long] = None): DataFrame =
    join(left, right, keys, leftTs, rightTs, payload, suffix, forward = true,
      tolerance)

  private def join(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTs: String, rightTs: String, payload: Seq[String],
                   suffix: String, forward: Boolean,
                   tolerance: Option[Long]): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one key column")
    require(payload.nonEmpty, "as-of join with no payload columns is a no-op")
    payload.foreach { p =>
      require(!left.columns.contains(p + suffix),
        s"left already has a column named '${p + suffix}' — pick another suffix")
      require(p != "__mts", "payload must not use the reserved __mts name")
    }
    require(!left.columns.exists(c => c == "__ts" || c == "__side" || c == "__p" || c == "__m"),
      "left must not use the operator's reserved __ts/__side/__p/__m column names")
    tolerance.foreach { tol =>
      require(tol >= 0, s"tolerance must be non-negative, got $tol")
      require(left.schema(leftTs).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType] &&
              right.schema(rightTs).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
        "tolerance needs numeric timestamp columns (e.g. unix micros)")
    }
    // the payload struct type, nullable so left rows can carry a null struct;
    // the matched row's own timestamp travels as the hidden __mts field so
    // the tolerance bound reads the SAME atomic struct as the payload
    val pType = StructType(
      right.schema(rightTs).copy(name = "__mts") +:
        payload.map(p => right.schema(p).copy(name = p)))
    val lPrep = left
      .withColumn("__ts", col(leftTs)).withColumn("__side", lit(1))
      .withColumn("__p", lit(null).cast(pType))
    val rKeyed = right
      // null keys/timestamps never match: drop them before they can share a
      // window partition with (and leak payload into) null-key left rows
      .filter(keys.map(col(_).isNotNull).reduce(_ && _) && col(rightTs).isNotNull)
      .select(
        (keys.map(col) :+ col(rightTs).as("__ts")) :+
          struct(col(rightTs).as("__mts") +: payload.map(col): _*).as("__p"): _*)
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
    // tolerance bound: null carries (no match) yield a null comparison ->
    // the when() already reports null payload, exactly like no-match
    val within = tolerance.fold(lit(true)) { tol =>
      if (forward) col("__m").getField("__mts") - col("__ts") <= tol
      else col("__ts") - col("__m").getField("__mts") <= tol
    }
    matched.filter(col("__side") === 1)
      .select(left.columns.map(col).toIndexedSeq ++
        payload.map(p => when(col("__ts").isNotNull && within, col("__m").getField(p))
          .as(p + suffix)): _*)
  }
}
