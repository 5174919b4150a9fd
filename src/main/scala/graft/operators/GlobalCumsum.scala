package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.LongType

/** Global running total over a total ordering — [[GlobalRank]]'s additive
  * sibling (same reference lineage: the SNI rank pass,
  * /root/reference/emm/indexing/spark_sni.py:230-241).
  *
  * `sum() OVER (ORDER BY ...)` with an empty PARTITION BY collapses to a
  * single partition — fatal at 100 TB. Instead: one distributed sort
  * (range partitioning), one lightweight pass collecting ONE partial sum
  * per partition to the driver (thousands of longs, not rows), then a
  * per-partition scan seeded with the exclusive prefix of those partials.
  * Deterministic for any partitioning because the sort is a total order
  * and addition of longs is associative.
  */
object GlobalCumsum {

  /** Append inclusive running total `outCol` of `weightCol` (integral,
    * cast to long) ordered by `orderCols`, which must be a total order
    * for deterministic output. Overflow is the caller's contract: the
    * final total must fit a long (callers guard loudly upstream).
    */
  def withCumsum(df: DataFrame, outCol: String, weightCol: String,
                 orderCols: Seq[String]): DataFrame = {
    require(!df.columns.contains("__gc_w"),
      "input must not use the operator's reserved __gc_w column name")
    val sorted = df
      .withColumn("__gc_w", col(weightCol).cast(LongType))
      .orderBy(orderCols.map(col): _*)
    val wIdx = sorted.schema.fieldIndex("__gc_w")
    val rdd = sorted.rdd
    rdd.cache()
    val partSums = rdd
      .mapPartitionsWithIndex { (i, it) =>
        var s = 0L; it.foreach(r => s += r.getLong(wIdx)); Iterator((i, s))
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = partSums.scanLeft(0L)(_ + _) // exclusive prefix
    val schema = sorted.schema.add(outCol, LongType, nullable = false)
    val out = rdd.mapPartitionsWithIndex { (i, it) =>
      var acc = offsets(i)
      it.map { r => acc += r.getLong(wIdx); Row.fromSeq(r.toSeq :+ acc) }
    }
    df.sparkSession.createDataFrame(out, schema).drop("__gc_w")
  }
}
