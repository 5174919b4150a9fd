package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.{col, concat, lit, raise_error, when}
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
  *
  * Two actions run over the same sorted RDD; they see identical partition
  * contents WITHOUT any persistence because the sort's shuffle files are
  * written once and the second job skips the completed map stage (shuffle
  * reuse), and on shuffle-file loss the recompute is deterministic: the
  * range boundaries are seeded from the RDD id (stable across jobs on
  * this one RDD object) and `orderCols` is a total order by contract, so
  * re-sorting a deterministic input reproduces the exact partition
  * sequence. This deliberately replaces an earlier `rdd.cache()` which
  * pinned the full sorted relation in executor storage for the session
  * lifetime (a leak under repeated invocation; see Round14Spec's
  * no-persistent-blocks unit). Caller contract: `df` itself must be
  * deterministic (scan/agg lineage, not e.g. an unseeded sample).
  */
object GlobalCumsum {

  /** Append inclusive running total `outCol` of `weightCol` (integral,
    * cast to long) ordered by `orderCols`, which must be a total order
    * for deterministic output. A NULL weight (or a failed cast) raises
    * loudly — a silent 0 would shift every downstream stride mark.
    * Overflow is the caller's contract: the final total must fit a long
    * (callers guard loudly upstream).
    */
  def withCumsum(df: DataFrame, outCol: String, weightCol: String,
                 orderCols: Seq[String]): DataFrame = {
    require(!df.columns.contains("__gc_w"),
      "input must not use the operator's reserved __gc_w column name")
    require(!df.columns.contains(outCol),
      s"output column '$outCol' already exists on the input")
    val w = col(weightCol).cast(LongType)
    val sorted = df
      .withColumn("__gc_w",
        when(w.isNull, raise_error(concat(
          lit(s"GlobalCumsum: NULL weight in '$weightCol' (null input " +
            "or failed integral cast) - filter or fix upstream")))
          .cast(LongType))
          .otherwise(w))
      .orderBy(orderCols.map(col): _*)
    val wIdx = sorted.schema.fieldIndex("__gc_w")
    val rdd = sorted.rdd
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
