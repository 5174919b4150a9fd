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
}
