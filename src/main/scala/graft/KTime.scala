package graft
import org.apache.spark.sql.SparkSession
object KTime {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries("q150_kcore")(spark, sf).count()
      println(s"KTIME $sf rows=$n sec=${(System.nanoTime()-t0)/1e9}")
    }
    spark.stop()
  }
}
