package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.LongType

import graft.sources.Sources

/** Source formats and streaming, each with a relational DuckDB oracle.
  *
  *  - q55: CSV with a custom separator round-trips through [[Sources]]
  *    (S2 of the inventory; the reference ingests its sample data with
  *    sep=';' — create_data.py:91-96) and is aggregated from the CSV copy;
  *    the oracle aggregates the original parquet.
  *  - q56: the SAME hourly aggregation as q14, but executed as a Structured
  *    Streaming query — parquet source, stateful window aggregation across
  *    micro-batches, availableNow trigger, memory sink. Batch/stream parity
  *    against the q14 SQL oracle-checks the streaming plumbing end to end.
  */
object SourceStreamQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    graft.sources.Tables(s, dir, name)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q55_csv_source" -> { (s, dir) =>
      val li = t(s, dir, "lineitem").select("l_orderkey", "l_returnflag", "l_quantity")
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_q55_csv"
      Sources.writeCsv(li, path, sep = ";")
      Sources.readCsv(s, path, sep = ";")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
             sum(col("l_quantity").cast("decimal(38,6)")).cast("double").as("sum_qty"))
    },

    "q56_streaming_hourly" -> { (s, dir) =>
      val batchSchema = s.read.parquet(s"$dir/events.parquet").schema
      // the streaming file source wants a directory: stream the sf dir,
      // glob-filtered down to the events table
      val raw = s.readStream.schema(batchSchema)
        .option("pathGlobFilter", "events.parquet").parquet(dir)
      val events =
        if (batchSchema("ts").dataType == LongType)
          raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        else raw
      val agg = events
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).cast("long").as("n"),
             sum(col("value").cast("decimal(38,6)")).cast("double").as("total_value"))
        .select(unix_timestamp(col("w.start")).as("hour_epoch"),
                col("event_type"), col("n"), col("total_value"))
      // unique sink name: the bench runs the query repeatedly in one session
      val sink = s"graft_q56_mem_${System.nanoTime()}"
      val q = agg.writeStream.format("memory").queryName(sink)
        .outputMode("complete").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      s.table(sink)
    })

  val oracleSql: Map[String, String] = Map(
    "q55_csv_source" ->
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
                CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty
         FROM lineitem GROUP BY 1""",
    "q56_streaming_hourly" ->
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch, event_type,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
         FROM events GROUP BY 1, 2""")
}
