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
    // args(2): directory to write one <query>_<args(3)>.txt per query
    // (plans/r18 judge evidence); stdout dump otherwise
    val outDir = if (args.length > 2) Some(args(2)) else None
    val suffix = if (args.length > 3) args(3) else "plan"
    outDir.foreach(d => java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(d)))
    names.foreach { n =>
      val txt =
        try SparkEntry.queries(n)(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        catch { case e: Throwable => s"explain failed: $e" }
      outDir match {
        case Some(d) => java.nio.file.Files.writeString(
          java.nio.file.Paths.get(d, s"${n}_$suffix.txt"), txt)
        case None =>
          println(s"\n########## $n ##########")
          println(txt)
      }
    }
    spark.stop()
  }
}
