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
    import graft.data.Dedup
    import graft.functions.ShingleExprs._
    val docs = spark.read.parquet(sf + "/documents.parquet")
    time("warm")(docs.count())

    // kernel vs HOF shingle computation
    time("kernel shingle hashes")(
      docs.select(explode(wordShingleHashes(col("text"), 5))).count())
    time("kernel shingle hashes again")(
      docs.select(explode(wordShingleHashes(col("text"), 5))).count())
    time("kernel minhash sigs")(
      docs.select(minhashSignature(wordShingleHashes(col("text"), 5), 32)).count())

    // hash equivalence spot-check: kernel == transform(wordShingles, xxhash64)
    val eq = docs.select(
      wordShingleHashes(col("text"), 5).as("a"),
      transform(Dedup.wordShingles(col("text"), 5), x => xxhash64(x)).as("b"))
      .filter(not(col("a") === col("b"))).count()
    println(s"PROF kernel-vs-declarative mismatches: $eq")

    time("full q40")(Dedup.ngramJaccardPairs(docs, "text", "doc_id",
      k = 5, threshold = 0.5, maxDocsPerShingle = 1000).count())
    time("full q40 again")(Dedup.ngramJaccardPairs(docs, "text", "doc_id",
      k = 5, threshold = 0.5, maxDocsPerShingle = 1000).count())
    val doubled = docs.select(col("doc_id"), col("text")).unionByName(
      docs.select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
    time("full q41 minhash")(Dedup.minHashLshPairs(doubled, "text", "doc_id",
      k = 5, numHashes = 32, rowsPerBand = 4, threshold = 0.5).count())
    time("full q41 again")(Dedup.minHashLshPairs(doubled, "text", "doc_id",
      k = 5, numHashes = 32, rowsPerBand = 4, threshold = 0.5).count())
    spark.stop()
  }
}
