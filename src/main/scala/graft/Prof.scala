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
    val emb = spark.read.parquet(sf + "/embeddings.parquet")
    time("warm")(emb.count())
    val queries = emb.filter(col("vec_id") < 100)
    time("ivfFit 5it")(graft.ann.Knn.ivfFit(emb, 16, 7L, 5))
    time("ivfFit again")(graft.ann.Knn.ivfFit(emb, 16, 7L, 5))
    time("ivfTopK full")(graft.ann.Knn.ivfTopK(queries, emb, 5, 16, 16, 7L, 5).count())
    time("ivfTopK 2nd")(graft.ann.Knn.ivfTopK(queries, emb, 5, 16, 16, 7L, 5).count())
    time("bruteForce")(graft.ann.Knn.bruteForceTopK(queries, emb, 5).count())
    spark.stop()
  }
}
