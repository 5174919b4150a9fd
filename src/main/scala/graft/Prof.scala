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
    import graft.ann.Knn
    val emb = spark.read.parquet(sf + "/embeddings.parquet")
    time("warm")(emb.count())
    val queries = emb.filter(col("vec_id") < 100)
    time("bruteForce")(Knn.bruteForceTopK(queries, emb, 5).count())
    time("ivfTopK full probe")(Knn.ivfTopK(queries, emb, 5, 16, 16, 7L, 5).count())
    time("ivfTopK probe 4")(Knn.ivfTopK(queries, emb, 5, 16, 4, 7L, 5).count())
    time("lshCosinePairs")(
      Knn.lshCosinePairs(emb, nBands = 8, bitsPerBand = 6, minCosine = 0.35).count())
    val docs = spark.read.parquet(sf + "/documents.parquet")
    time("ngramJaccard")(graft.data.Dedup.ngramJaccardPairs(
      docs, "text", "doc_id", k = 5, threshold = 0.5).count())
    // stage dissection of the jaccard skeleton
    import graft.data.Dedup
    val sh = docs.select(col("doc_id").as("id"),
      explode(Dedup.wordShingles(col("text"), 5)).as("s"))
    time("explode count")(println("sh=" + sh.count()))
    val hot = sh.groupBy("s").agg(count(lit(1)).as("c"))
      .filter(col("c") > 1000).select("s")
    val filtered = sh.join(broadcast(hot), Seq("s"), "left_anti").select("id", "s")
    import org.apache.spark.sql.expressions.Window
    val sized = filtered.withColumn("n_sh",
      count(lit(1)).over(Window.partitionBy("id")))
    time("sized count")(sized.count())
    val joinOut = sized.toDF("id_a", "s", "n_a").hint("merge")
      .join(sized.toDF("id_b", "s", "n_b"), "s")
      .filter(col("id_a") < col("id_b"))
    time("join output rows")(println("joinOut=" + joinOut.count()))
    time("minHashLsh")(graft.data.Dedup.minHashLshPairs(
      docs, "text", "doc_id", k = 5, numHashes = 32, rowsPerBand = 4,
      threshold = 0.5).count())
    spark.stop()
  }
}
