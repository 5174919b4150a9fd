package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted physical plans for selected queries. */
object Explain {
  def main(args: Array[String]): Unit = {
    // ORC (and legacy parquet INT96) timestamp paths consult the JVM
    // default zone, not the session TZ — pin it so results are
    // host-independent (a DST-transition hour on a non-UTC host would
    // otherwise shift timestamps on columnar round-trips).
    java.util.TimeZone.setDefault(java.util.TimeZone.getTimeZone("UTC"))
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // testdata parquet stamps ts as isAdjustedToUTC=false; read it as
      // TIMESTAMP (session UTC) so epoch extraction matches the DuckDB oracle
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.isEmpty) SparkEntry.queries.keys.toSeq.sorted
                else args(0).split(",").toSeq
    names.foreach { n =>
      println(s"\n########## $n ##########")
      try println(SparkEntry.queries(n)(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      catch { case e: Throwable => println(s"explain failed: $e") }
    }
    spark.stop()
  }
}
