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
    import graft.ann.Knn
    // replicate lshCosinePairs internals to time each stage
    val nBands = 8; val bitsPerBand = 6; val seed = 42L
    val dim = 64
    val nBits = nBands * bitsPerBand
    val planes = { val rng = new java.util.Random(seed); Array.fill(nBits * dim)(rng.nextGaussian()) }
    val bandKeysUdf = udf { (v: Seq[Float]) =>
      val keys = new Array[Long](nBands)
      var b = 0
      while (b < nBits) {
        var dot = 0.0; var d = 0; val off = b * dim; val n = math.min(dim, v.length)
        while (d < n) { dot += v(d) * planes(off + d); d += 1 }
        if (dot > 0) keys(b / bitsPerBand) |= (1L << (b % bitsPerBand))
        b += 1
      }
      keys.toSeq
    }
    val base = emb.select(col("vec_id").cast("long").as("id"), col("embedding").as("v"))
    val melted = base.select(col("id"), posexplode(bandKeysUdf(col("v"))).as(Seq("band_idx", "bk")))
    time("melted count")(println("melted=" + melted.count()))
    val joined = melted.toDF("id_a", "band_idx", "bk")
      .join(melted.toDF("id_b", "band_idx", "bk"), Seq("band_idx", "bk"))
      .filter(col("id_a") < col("id_b"))
    time("selfjoin count")(println("joined=" + joined.count()))
    val candidates = joined.select("id_a", "id_b").dropDuplicates("id_a", "id_b")
    time("dedup count")(println("cand=" + candidates.count()))
    val fetched = candidates
      .join(base.toDF("id_a", "v_a"), "id_a")
      .join(base.toDF("id_b", "v_b"), "id_b")
    time("fetch count")(fetched.count())
    val cosUdf = udf { (a: Seq[Float], b: Seq[Float]) =>
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var d = 0
      while (d < a.length) {
        dot += a(d).toDouble * b(d).toDouble
        na += a(d).toDouble * a(d).toDouble
        nb += b(d).toDouble * b(d).toDouble
        d += 1
      }
      val denom = math.sqrt(na) * math.sqrt(nb)
      if (denom == 0.0) 0.0
      else BigDecimal(dot / denom).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    time("verify udf deterministic")(
      fetched.withColumn("cosine", cosUdf(col("v_a"), col("v_b")))
        .filter(col("cosine") >= 0.35).select("id_a", "id_b", "cosine").count())
    val cosNd = cosUdf.asNondeterministic()
    time("verify udf nondeterministic")(
      fetched.withColumn("cosine", cosNd(col("v_a"), col("v_b")))
        .filter(col("cosine") >= 0.35).select("id_a", "id_b", "cosine").count())
    val fullOp = Knn.lshCosinePairs(emb, nBands = 8, bitsPerBand = 6, minCosine = 0.35)
    time("full op")(fullOp.count())
    spark.stop()
  }
}
