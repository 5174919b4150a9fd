package graft
import org.apache.spark.sql.SparkSession

/** Scale-probe harness: times a named SparkEntry query across the data
  * dirs given as args (default: the q150 k-core probe at 1x and 10x).
  * Usage: KTime [queryName dir1 dir2 ...]
  */
object KTime {
  def main(args: Array[String]): Unit = {
    // ORC (and legacy parquet INT96) timestamp paths consult the JVM
    // default zone, not the session TZ — pin it so results are
    // host-independent (a DST-transition hour on a non-UTC host would
    // otherwise shift timestamps on columnar round-trips).
    java.util.TimeZone.setDefault(java.util.TimeZone.getTimeZone("UTC"))
    val query = if (args.nonEmpty) args(0) else "q150_kcore"
    val dirs =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- dirs) {
      val t0 = System.nanoTime()
      // benchQueries = the production configurations (correctness-only
      // oracle harnesses swapped out), the forms whose scaling matters
      val n = SparkEntry.benchQueries(query)(spark, dir).count()
      println(s"KTIME $query $dir rows=$n sec=${(System.nanoTime() - t0) / 1e9}")
    }
    spark.stop()
  }
}
