package graft.ann

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The mergeable-store family extended to MODEL FITTING: Gram/mean moment
  * partials persisted per ingest batch, merged by pure integer addition at
  * read time — so a PCA (or whitening, or ridge-regression normal
  * equation) refits from kilobyte-scale stored partials WITHOUT ever
  * rescanning the corpus. The covariance moments are linear in the data,
  * which makes the store exact, not approximate: fit-from-store is
  * bit-identical to fit-from-scan (q325's machine-checked verdict).
  *
  * Layout: one parquet dir partitioned by `batch`; rows are the d(d+1)/2
  * upper-triangle Gram cells (`i, j ≥ 0`) PLUS the d component-sum rows
  * encoded as `j = −1` and one count row at `i = −1, j = −1` — everything
  * integer, everything mergeable by SUM (the [[graft.data.AggStore]]
  * append contract applied to model moments).
  */
object GramStore {

  /** Append one ingest batch's moment partials — one pass over the DELTA
    * only ([[Gram.gramUpper]]'s kernel + a component-sum agg).
    */
  def appendBatch(df: DataFrame, vecCol: String, batchId: Long,
                  path: String, overwrite: Boolean = false): Unit = {
    // NULL vectors contribute to neither the Gram cells nor the component
    // sums (posexplode emits nothing for them) — count the same
    // population, or the stored n would over-count and break the
    // fit-from-store ≡ fit-from-scan contract on batches with null rows
    val dfv = df.filter(col(vecCol).isNotNull)
    val gram = Gram.gramUpper(dfv, vecCol)
      .select(col("i"), col("j"), col("gram_u").as("v"))
    val sums = dfv.select(posexplode(col(vecCol)).as(Seq("i", "x")))
      .groupBy("i")
      .agg(sum(expr("CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)"))
        .cast("long").as("v"))
      .select(col("i"), lit(-1).as("j"), col("v"))
    val cnt = dfv.agg(count(lit(1)).cast("long").as("v"))
      .select(lit(-1).as("i"), lit(-1).as("j"), col("v"))
    gram.unionByName(sums).unionByName(cnt)
      .withColumn("batch", lit(batchId))
      .write.partitionBy("batch")
      .mode(if (overwrite) "overwrite" else "append").parquet(path)
  }

  /** Merged moments: (gram upper-triangle map, component sums, n) — pure
    * integer addition over the stored partials (DECIMAL merge, overflow-
    * guarded downcast like the Gram kernel's own contract).
    */
  def mergedMoments(spark: SparkSession,
                    path: String): (Map[(Int, Int), Long], Map[Int, Double], Long) = {
    val m = spark.read.parquet(path)
      .groupBy("i", "j")
      .agg(sum(col("v").cast("decimal(38,0)")).as("vd"))
      // merged DECIMAL can pass 2⁶³; a bare non-ANSI cast would wrap or
      // null SILENTLY — same loud guard as the Gram kernel's own downcast
      .select(col("i"), col("j"),
        when(abs(col("vd")) > lit(Long.MaxValue).cast("decimal(38,0)"),
          raise_error(concat(lit("GramStore cell (i="), col("i"),
            lit(", j="), col("j"), lit(") overflows BIGINT: "), col("vd"))))
          .otherwise(col("vd").cast("long")).as("v"))
      .collect()
    val gram = m.filter(r => r.getInt(1) >= 0)
      .map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    val sums = m.filter(r => r.getInt(1) == -1 && r.getInt(0) >= 0)
      .map(r => r.getInt(0) -> r.getLong(2).toDouble).toMap
    val n = m.find(r => r.getInt(0) == -1 && r.getInt(1) == -1)
      .map(_.getLong(2))
      .getOrElse(throw new IllegalStateException(s"no count row in $path"))
    (gram, sums, n)
  }

  /** Refit a PCA from the store — no corpus rescan; identical moments ⇒
    * a model bit-identical to [[Pca.fit]] on the full data.
    */
  def fitPca(spark: SparkSession, path: String, k: Int): Pca.Model = {
    val (gram, sums, n) = mergedMoments(spark, path)
    Pca.fitFromMoments(gram, sums, n, k)
  }
}
