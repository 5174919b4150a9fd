package graft.data

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Golden-record survivorship: collapse the multiple records observed for one
  * entity into a single canonical record, field by field, under explicit
  * per-field merge policies — the step after dedup clustering (q73/q181)
  * turns "these records are the same entity" into "this is the record".
  *
  * Policies (every one a TOTAL order — ties never depend on engine
  * iteration order):
  *  - [[Mode]]: most frequent value, tie → smallest value;
  *  - [[Latest]]: value carried by the greatest (orderCols…) tuple — pass a
  *    unique tiebreaker (e.g. an event id) as the last order column;
  *  - [[Max]]/[[Min]]: extremum of the field itself.
  *
  * Scale shape: one hash aggregation for all Latest/Max/Min fields plus the
  * record count; each Mode field costs one (key, value) count aggregation
  * and a per-key rank window — all partitioned by the entity key, so
  * parallelism scales with entities and nothing ever re-scans the raw
  * records per field. The final assembly joins on the already-shuffled key.
  */
object Survivorship {

  sealed trait Policy { def field: String }
  /** Most frequent value; tie broken toward the SMALLEST value. */
  final case class Mode(field: String) extends Policy
  /** Value at the greatest (orderCols…) tuple; make the tuple unique. */
  final case class Latest(field: String, orderCols: Seq[String]) extends Policy
  final case class Max(field: String) extends Policy
  final case class Min(field: String) extends Policy

  /** One row per entity key: `keyCols…, n_records, <field> per policy`. */
  def goldenRecord(records: DataFrame, keyCols: Seq[String],
                   policies: Seq[Policy]): DataFrame = {
    require(policies.nonEmpty, "at least one merge policy")
    val key = keyCols.map(col)
    val directAggs = policies.collect {
      case Max(f) => max(col(f)).as(f)
      case Min(f) => min(col(f)).as(f)
      case Latest(f, ord) =>
        // max over (ord…, field) struct = the field value at the greatest
        // order tuple — struct comparison is lexicographic, so a unique
        // order prefix makes the pick total
        max(struct((ord.map(col) :+ col(f)): _*)).getField(f).as(f)
    }
    val base = records.groupBy(key: _*)
      .agg(count(lit(1)).cast("long").as("n_records"), directAggs: _*)
    policies.collect { case Mode(f) => f }.foldLeft(base) { (acc, f) =>
      val counts = records.groupBy((key :+ col(f)): _*)
        .agg(count(lit(1)).as("__c"))
      // asc_nulls_last, NOT the bare asc: Spark's default ASC sorts NULL
      // first while DuckDB (and SQL's common convention) sorts it last —
      // a nullable mode field must not let NULL beat a real value on ties
      val w = Window.partitionBy(keyCols.map(col): _*)
        .orderBy(col("__c").desc, col(f).asc_nulls_last)
      val winner = counts.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select((key :+ col(f)): _*)
      acc.join(winner, keyCols)
    }
  }
}
