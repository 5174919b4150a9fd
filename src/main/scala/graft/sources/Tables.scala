package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.LongType

/** Test-table loader for /root/testdata/sf*.
  *
  * `events.parquet` stores TIMESTAMP(NANOS) which Spark 4 only reads with
  * `spark.sql.legacy.parquet.nanosAsLong=true` (set in Verify/Bench/tests);
  * the resulting long is converted here to a microsecond timestamp with exact
  * integer arithmetic (`div`, not double division — a double mangles 1e18 ns).
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else df
  }
}
