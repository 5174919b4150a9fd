package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.LongType

/** Dense global rank over a total ordering.
  *
  * `row_number() OVER (ORDER BY ...)` with an empty PARTITION BY collapses to
  * a single partition — fatal at 100 TB. Like the reference's SNI ranking
  * (/root/reference/emm/indexing/spark_sni.py:230-241) we sort distributedly
  * and use RDD `zipWithIndex`, which keeps the data partitioned (range
  * partitioning from the sort) and computes per-partition offsets with a
  * lightweight count pass.
  */
object GlobalRank {

  /** Append 0-based dense global rank `rankCol` ordered by `orderCols`.
    * `orderCols` must be a total order for deterministic output.
    */
  def withGlobalRank(df: DataFrame, rankCol: String, orderCols: Seq[String]): DataFrame = {
    val sorted = df.orderBy(orderCols.map(col): _*)
    val schema = sorted.schema.add(rankCol, LongType, nullable = false)
    val rdd = sorted.rdd.zipWithIndex().map { case (r, i) => Row.fromSeq(r.toSeq :+ i) }
    df.sparkSession.createDataFrame(rdd, schema)
  }
}
