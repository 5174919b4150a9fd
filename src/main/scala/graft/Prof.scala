package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling main (not part of the library surface). */
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = "/root/testdata/sf0.1"
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    import graft.idx.{CosSimIndexer, SniIndexer}
    val part = spark.read.parquet(sf + "/part.parquet")
    time("warm")(part.count())
    val gtRaw = part.select(
      col("p_partkey").cast("long").as(Cols.Uid),
      col("p_name").as(Cols.Name),
      col("p_brand").as(Cols.EntityId))
    val nmRaw = gtRaw.filter(col(Cols.Uid) < 300)
    def mkMatcher() = EntityMatching(EmParams(), Seq(
      new CosSimIndexer(tokenizer = "words", ngram = 1, binary = true,
        numCandidates = 3, lowerBound = 0.5),
      new SniIndexer(window = 2, maxGtPerName = 10)))
    val m1 = time("fit")(mkMatcher().fit(gtRaw))
    time("fit again")(mkMatcher().fit(gtRaw))
    val pairs = time("createTrainingPairs build")(
      m1.createTrainingPairs(nmRaw, createNegativeSampleFraction = 0.5, seed = 42))
    time("pairs count")(pairs.count())
    val m2 = mkMatcher().fit(gtRaw)
    time("pairs count cold")(
      m2.createTrainingPairs(nmRaw, createNegativeSampleFraction = 0.5, seed = 42).count())
    spark.stop()
  }
}
