package graft.data

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** K-Minimum-Values distinct sketch — the SET-OPERATION member of the
  * sketch family: HLL (q97/q128) answers |A| but cannot intersect; a KMV
  * synopsis (the k smallest hash values of the distinct set, Bar-Yossef et
  * al. 2002 / Beyer et al. SIGMOD 2007) supports |A ∩ B| and Jaccard by
  * COMPARING synopses: the k smallest of A ∪ B is computable from the two
  * synopses alone, and the fraction of those present in both sides
  * estimates J with std-err ≈ √(J(1−J)/k).
  *
  * Everything is DETERMINISTIC — the synopsis is an exact function of the
  * data (k smallest xxhash64 values), no RNG — so estimates are replayable
  * run to run; the correctness gate compares them against exact relational
  * counts under a declared tolerance (the q97 sketch-family recipe).
  *
  * Scale shape: one distinct partial-agg shuffle collapses rows to the
  * (group, key) domain; the k-min selection is a per-group window over the
  * domain; synopses are k-sized and every downstream op touches only them.
  */
object KmvSketch {

  /** Per-group synopsis rows: the k smallest xxhash64(key) of each group's
    * distinct key set, as (g, h) rows (≤ k per group).
    */
  def kMinHashes(df: DataFrame, keyCol: String, groupCol: String,
                 k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val w = Window.partitionBy("g").orderBy("h")
    df.select(col(groupCol).as("g"), xxhash64(col(keyCol)).as("h"))
      .distinct()
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select("g", "h")
  }

  /** Daily synopsis store (the set-op member of the store family beside
    * AggStore/SketchStore/HistStore): one (day, h) partition per day, ≤ k
    * rows each. Synopses are MERGEABLE — the k smallest of a day range is
    * computable from the per-day synopses alone (k-min of a union is the
    * k-min of the k-mins), so range questions fold |days|·k tiny rows.
    */
  def writeDaily(df: DataFrame, dateCol: String, keyCol: String,
                 path: String, k: Int, overwrite: Boolean = false): Unit = {
    val w = Window.partitionBy("day").orderBy("h")
    df.select(to_date(col(dateCol)).as("day"),
        xxhash64(col(keyCol)).as("h"))
      .distinct()
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select("day", "h")
      .write.partitionBy("day")
      .mode(if (overwrite) "overwrite" else "append").parquet(path)
  }

  /** Range synopsis from the store: k smallest distinct hashes over the
    * pruned [from, to] day partitions — (h) rows, ≤ k.
    */
  def rangeSynopsis(spark: org.apache.spark.sql.SparkSession, path: String,
                    from: String, to: String, k: Int): DataFrame =
    spark.read.parquet(path)
      .filter(col("day") >= lit(from).cast("date") &&
        col("day") <= lit(to).cast("date"))
      .select("h").distinct()
      .orderBy("h").limit(k)

  /** Jaccard estimate (ppm) of two synopses: k smallest of the union,
    * fraction present in both. One k-sized TakeOrdered; 1-row output
    * (est_ppm, n_union_k).
    */
  def jaccardEstimatePpm(a: DataFrame, b: DataFrame, k: Int): DataFrame = {
    val u = a.select(col("h"), lit(1L).as("ina"))
      .join(b.select(col("h"), lit(1L).as("inb")), Seq("h"), "full_outer")
      .na.fill(0L, Seq("ina", "inb"))
      .orderBy("h").limit(k)
    u.agg(
      expr("CAST(sum(ina * inb) * 1000000 div count(*) AS BIGINT)")
        .as("est_ppm"),
      count(lit(1)).cast("long").as("n_union_k"))
  }
}
