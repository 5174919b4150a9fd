package graft.features

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic categorical encoder with an OOV bucket — the production
  * replacement for StringIndexer when the pipeline needs (a) a REPLAYABLE
  * id assignment (frequency-desc, value-asc — no tie left to hash order),
  * (b) a bounded vocabulary (top `maxSize`, everything else one OOV id), and
  * (c) a minimum-support cutoff so one-off strings never become features.
  *
  * Scale shape: the fit is one full hash agg collapsed to the category
  * domain, a frequency filter, then rank assignment over at most `maxSize`
  * rows via [[graft.operators.GlobalRank]] (distributed sort + zipWithIndex
  * — never a 1-partition window). The mapping is vocabulary-sized by
  * construction, so encode is a broadcast left join + two map-side columns.
  */
object CategoryEncoder {

  /** Fit the mapping: (value, id) with ids 0..k-1 by (freq desc, value asc),
    * k ≤ maxSize, categories below `minFreq` excluded (they fall to OOV).
    */
  def fit(df: DataFrame, colName: String, maxSize: Int,
          minFreq: Long = 1L): DataFrame = {
    require(maxSize > 0, s"maxSize must be positive, got $maxSize")
    val counts = df.filter(col(colName).isNotNull)
      .groupBy(col(colName).as("value"))
      .agg(count(lit(1)).cast("long").as("freq"))
      .filter(col("freq") >= minFreq)
      // negated freq makes GlobalRank's ascending sort a (freq desc, value)
      // total order
      .withColumn("__negfreq", -col("freq"))
      .orderBy(col("__negfreq"), col("value")).limit(maxSize)
    graft.operators.GlobalRank
      .withGlobalRank(counts, "id", Seq("__negfreq", "value"))
      .select(col("value"), col("id").cast("int").as("id"))
  }

  /** Encode: known categories get their fitted id, everything else (incl.
    * NULL) the OOV id = |mapping|. Broadcast join, map-side fallback.
    */
  def encode(df: DataFrame, colName: String, mapping: DataFrame,
             outCol: String): DataFrame = {
    val oov = mapping.count().toInt
    // The mapping's id column joins under a reserved temp name: if the
    // caller's frame already has an 'id' column, a bare col("id") would be
    // ambiguous (analysis error) and drop("id") would eat the caller's
    // column.
    df.join(broadcast(mapping.withColumnRenamed("value", colName)
          .withColumnRenamed("id", "__cat_id")),
        Seq(colName), "left")
      .withColumn(outCol, coalesce(col("__cat_id"), lit(oov)).cast("int"))
      .withColumn(s"${outCol}_is_oov", col(outCol) === lit(oov))
      .drop("__cat_id")
  }
}
