package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Auto-repartitioning by approximate row count
  * (/root/reference/emm/helper/spark_utils.py:63-76): estimate the dataset
  * size with `countApprox` (cheap partial job, bounded wait) and repartition
  * to `partitionSize` rows per partition. The reference defaults to 5000
  * names/partition so the downstream broadcast-kernel stages get even,
  * memory-bounded chunks regardless of input layout.
  */
object AutoRepartition {

  /** Returns (repartitioned df, estimated rows); (df, -1) when disabled. */
  def apply(df: DataFrame, partitionSize: Option[Int],
            cols: Seq[String] = Nil, timeoutMs: Long = 20000L): (DataFrame, Long) =
    partitionSize match {
      case None => (df, -1L)
      case Some(size) =>
        require(size > 0, "partitionSize must be positive")
        val n = df.rdd.countApprox(timeoutMs, 0.95).initialValue.mean.toLong
        val numPartitions = math.max(1L, n / size).toInt
        val out =
          if (cols.isEmpty) df.repartition(numPartitions)
          else df.repartition(numPartitions, cols.map(col): _*)
        (out, n)
    }
}
