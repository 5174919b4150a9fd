package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** All-pairs sparse cosine similarity via an inverted index — the
  * beyond-broadcast scale path for document similarity.
  *
  * [[graft.idx.CosSimIndexer]] (J1) broadcasts the packed target matrix and
  * runs a map-side kernel: ideal when one side fits in a broadcast. This
  * operator is the other regime — corpus x itself at 100 TB — where neither
  * side broadcasts: vectors stay as (doc, term, count) postings, the dot
  * product distributes over a self-equi-join on the term, and cosine comes
  * from integer dot and integer norms, so every score is bit-stable on any
  * partitioning (the same order-independence argument as the int8 kernel,
  * `graft.ann.Knn.bruteForceTopKInt8`).
  *
  * Vector space: counted k-word shingles (k=1 is plain bag-of-words). On
  * repetitive synthetic corpora unigram vocabularies are tiny and every
  * term is hot; shingles keep the posting lists discriminative — same
  * reasoning as `Dedup.ngramJaccardPairs` (reference analog:
  * ing-bank/EntityMatchingModel blocks on tokenized name cosine,
  * emm/indexing.py, but computes it densely per block).
  *
  * Scale controls:
  *  - `maxDf` drops terms appearing in more than maxDf docs BEFORE the
  *    self-join (per-term fan-out is quadratic in df; a stopword-grade term
  *    would dominate the whole shuffle). Norms are computed on the capped
  *    space, so cosine stays exact over the effective vectors — the
  *    "effective set" semantics q40 uses for jaccard.
  *  - the df filter is a window over the SAME term partitioning the
  *    self-join shuffles on, not a separate aggregate+join pass.
  */
object SparseSim {

  /** Emit every unordered doc pair with cosine >= minCos over counted
    * k-word shingle vectors. Output: (<id>_a, <id>_b, dot, cos), id_a < id_b.
    */
  def shingleCosinePairs(docs: DataFrame, idCol: String, textCol: String,
                         k: Int = 3, maxDf: Int = 1000,
                         minCos: Double = 0.5): DataFrame = {
    require(k >= 1, s"shingle width must be >= 1, got $k")
    val idA = s"${idCol}_a"
    val idB = s"${idCol}_b"

    val parts = (0 until k).map(i => s"__toks[i+$i]").mkString(", ")
    val shingles = s"""CASE WHEN size(__toks) >= $k
        THEN transform(sequence(0, size(__toks) - $k),
                       i -> concat_ws(' ', $parts))
        ELSE CAST(array() AS ARRAY<STRING>) END"""
    val posts = docs
      .select(col(idCol).as("__id"),
        split(trim(col(textCol)), " ").as("__toks"))
      .select(col("__id"), explode(expr(shingles)).as("term"))
      .groupBy("__id", "term").agg(count(lit(1)).cast("long").as("cnt"))

    cosinePairsFromPostings(posts, "__id", "term", "cnt", maxDf, minCos,
      outIdA = idA, outIdB = idB)
  }

  /** The sparse-cosine kernel over an arbitrary integer-weighted posting
    * relation (one row per (vector id, dimension, weight)) — the same
    * inverted-index self-join used for shingle vectors, reusable for any
    * co-occurrence space: item-item similarity from (item, basket, qty),
    * user-user from (user, item, count), etc. Weights must be exact
    * integers so dot/norm2 replay bit-for-bit on any partitioning.
    */
  def cosinePairsFromPostings(posts: DataFrame, idCol: String, termCol: String,
                              cntCol: String, maxDf: Int, minCos: Double,
                              outIdA: String = "id_a",
                              outIdB: String = "id_b"): DataFrame = {
    require(maxDf >= 2, s"maxDf < 2 can emit no pairs, got $maxDf")
    val kept = posts
      .select(col(idCol).as("__id"), col(termCol).as("__t"),
        col(cntCol).cast("long").as("__cnt"))
      .withColumn("__df", count(lit(1)).over(Window.partitionBy("__t")))
      .filter(col("__df") <= maxDf).drop("__df")

    val norms = kept.groupBy("__id")
      .agg(sum(col("__cnt") * col("__cnt")).as("norm2"))

    val a = kept.select(col("__id").as(outIdA), col("__t"), col("__cnt").as("__ca"))
    val b = kept.select(col("__id").as(outIdB), col("__t"), col("__cnt").as("__cb"))
    val dots = a.join(b, "__t").filter(col(outIdA) < col(outIdB))
      .groupBy(outIdA, outIdB)
      .agg(sum(col("__ca") * col("__cb")).as("dot"))

    dots
      .join(norms.select(col("__id").as(outIdA), col("norm2").as("__na")), outIdA)
      .join(norms.select(col("__id").as(outIdB), col("norm2").as("__nb")), outIdB)
      .withColumn("cos", col("dot").cast("double") /
        sqrt(col("__na").cast("double") * col("__nb").cast("double")))
      .filter(col("cos") >= minCos)
      .select(col(outIdA), col(outIdB), col("dot"), col("cos"))
  }
}
