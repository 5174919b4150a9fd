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
    // scaling smoke test: same operators at 1x and 8x corpus size; the
    // bucketed/capped plans should scale near-linearly, never quadratically.
    // Each copy is SALTED (distinct suffix per copy) so the 8x corpus keeps
    // roughly the 1x near-dup density — verbatim clones would make the pair
    // output itself grow quadratically and mask any plan regression
    val docs1 = spark.read.parquet(sf + "/documents.parquet")
    val docs8 = (0 until 8).map { i =>
      docs1.withColumn("doc_id", col("doc_id") + lit(i * 10000000L))
        .withColumn("text", concat(col("text"),
          lit(s" copy salt token alpha$i beta$i gamma$i delta$i epsilon$i")))
    }.reduce(_ unionByName _)
    time("warm")(docs8.count())
    time("jaccard 1x")(Dedup.ngramJaccardPairs(docs1, "text", "doc_id", k = 5, threshold = 0.5).count())
    time("jaccard 8x")(Dedup.ngramJaccardPairs(docs8, "text", "doc_id", k = 5, threshold = 0.5).count())
    time("minhash 1x")(Dedup.minHashLshPairs(docs1, "text", "doc_id", k = 5,
      numHashes = 32, rowsPerBand = 4, threshold = 0.5).count())
    time("minhash 8x")(Dedup.minHashLshPairs(docs8, "text", "doc_id", k = 5,
      numHashes = 32, rowsPerBand = 4, threshold = 0.5).count())
    time("simhash 1x")(Dedup.simHashPairs(docs1, "text", "doc_id").count())
    time("simhash 8x")(Dedup.simHashPairs(docs8, "text", "doc_id").count())
    // decontamination: train side scales 8x, eval side fixed — runtime should
    // track the train scan, not the pair space
    val evalDocs = docs1.filter(col("doc_id") % 17 === 0)
    time("decontam 1x")(Dedup.decontaminate(docs1, evalDocs, "text", "doc_id", k = 5).count())
    time("decontam 8x")(Dedup.decontaminate(docs8, evalDocs, "text", "doc_id", k = 5).count())
    val emb1 = spark.read.parquet(sf + "/embeddings.parquet")
    // salt: circular-shift each copy's coordinates by i — within-copy
    // cosine structure is identical to 1x (rotation-invariant), cross-copy
    // vectors decorrelate, so the pair output stays ~linear in corpus size
    val emb8 = (0 until 8).map { i =>
      emb1.withColumn("vec_id", col("vec_id") + lit(i * 10000000L))
        .withColumn("embedding",
          if (i == 0) col("embedding")
          else expr(s"concat(slice(embedding, ${8 * i + 1}, 64 - ${8 * i}), slice(embedding, 1, ${8 * i}))"))
    }.reduce(_ unionByName _)
    import graft.ann.Knn
    time("lsh pairs 1x")(Knn.lshCosinePairs(emb1, nBands = 8, bitsPerBand = 6, minCosine = 0.35).count())
    time("lsh pairs 8x")(Knn.lshCosinePairs(emb8, nBands = 8, bitsPerBand = 6, minCosine = 0.35).count())
    spark.stop()
  }
}
