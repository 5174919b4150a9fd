package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {

  /** Diff aid for driver-red rows: the driver's compare sorts columns by
    * name and rows by all values before hashing — this writes the SAME
    * canonical form as one readable CSV so a mismatch can be diffed cell
    * by cell against the oracle (three rounds of q231 driver-only
    * divergence motivated this). Gated off the hot path: set env
    * `GRAFT_DUMP_CSV=1` (or JVM prop `graft.dump.csv=1` — unit hook).
    */
  def dumpWanted: Boolean =
    sys.env.get("GRAFT_DUMP_CSV").orElse(sys.props.get("graft.dump.csv"))
      .exists(v => v == "1" || v.equalsIgnoreCase("true"))

  def dumpCanonicalCsv(df: DataFrame, path: String): Unit = {
    val cols = df.columns.sorted.map(col)
    df.select(cols: _*).orderBy(cols: _*).coalesce(1)
      .write.mode("overwrite").option("header", "true").csv(path)
  }

  def main(args: Array[String]): Unit = {
    // ORC (and legacy parquet INT96) timestamp paths consult the JVM
    // default zone, not the session TZ — pin it so results are
    // host-independent (a DST-transition hour on a non-UTC host would
    // otherwise shift timestamps on columnar round-trips).
    java.util.TimeZone.setDefault(java.util.TimeZone.getTimeZone("UTC"))
    // optional 3rd arg: comma-separated substrings — dump only matching
    // queries (local dev loop; the driver always runs the full set)
    val Array(sfDir, outDir) = args.take(2)
    val only = args.drop(2).headOption.map(_.split(",").toSeq)
    def selected(name: String): Boolean =
      only.forall(_.exists(name.contains))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // testdata parquet stamps ts as isAdjustedToUTC=false; read it as
      // TIMESTAMP (session UTC) so epoch extraction matches the DuckDB oracle
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.filter(kv => selected(kv._1)).foreach { case (name, fn) =>
      try {
        val result = fn(spark, sfDir)
        result.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        if (dumpWanted)
          dumpCanonicalCsv(spark.read.parquet(s"$outDir/$name"),
            s"$outDir/$name.csv")
      }
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        // remove any stale output from a previous run: a failure must show
        // up as "no spark output", not silently pass on old results
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
          f.delete(); ()
        }
        val dir = new java.io.File(s"$outDir/$name")
        // best-effort: a cleanup failure must not abort the remaining queries
        try if (dir.exists()) rm(dir)
        catch { case e2: Throwable =>
          System.err.println(s"[verify] $name stale-output cleanup failed: ${e2.getMessage}")
        }
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
