package graft.features

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Out-of-fold target encoding — the leakage-safe form of "replace the
  * category with its mean target": each fold's encoding is computed from
  * ALL OTHER folds' rows, so a row never sees its own target.
  *
  * enc(cat, fold) = (S_cat − s_{cat,fold}) / (N_cat − n_{cat,fold}),
  * falling back to the global out-of-fold prior when a (cat, fold) pair
  * holds the category's only rows.
  *
  * Scale shape: ONE hash aggregation collapses rows to (cat, fold) moment
  * cells — |cats|·|folds| rows at any corpus size; totals are windows over
  * that cell frame, never a second scan. The encoded table joins back
  * broadcast (cell-frame-sized).
  *
  * Determinism: sums are exact integers (the caller passes an integer
  * target — the q249 sub-unit discipline) and every division is a floor
  * division via remainder subtraction (the q307 lesson: no engine-specific
  * rounding), so the encoding is an exact integer in the target's sub-unit.
  */
object TargetEncoder {

  private val D38 = "decimal(38,0)"

  /** Per-(category, fold) encoding table: `catCol, foldCol, n_in_fold,
    * enc_u` (enc in the integer target's own sub-unit, floor-divided).
    */
  def encodingTable(df: DataFrame, catCol: String, foldCol: String,
                    targetIntCol: String): DataFrame = {
    val cells = df.groupBy(col(catCol), col(foldCol))
      .agg(count(lit(1)).cast("long").as("n_in_fold"),
        sum(col(targetIntCol).cast(D38)).cast(D38).as("s_in_fold"))
    val wc = Window.partitionBy(catCol)
    val wAll = Window.partitionBy()
    def floorDiv(a: org.apache.spark.sql.Column, n: org.apache.spark.sql.Column) =
      ((a - a % n.cast(D38)) / n.cast(D38)).cast(D38).cast("long")
    cells
      .withColumn("__S", sum("s_in_fold").over(wc).cast(D38))
      .withColumn("__N", sum("n_in_fold").over(wc).cast("long"))
      .withColumn("__Sg", sum("s_in_fold").over(wAll).cast(D38))
      .withColumn("__Ng", sum("n_in_fold").over(wAll).cast("long"))
      .withColumn("enc_u",
        when(col("__N") > col("n_in_fold"),
          floorDiv(col("__S") - col("s_in_fold"),
            col("__N") - col("n_in_fold")))
          .otherwise( // category exists only in this fold: OOF prior
            when(col("__Ng") > col("n_in_fold"),
              floorDiv(col("__Sg") - col("s_in_fold"),
                col("__Ng") - col("n_in_fold")))
              .otherwise(lit(0L))))
      .select(col(catCol), col(foldCol), col("n_in_fold"), col("enc_u"))
  }

  /** Apply: join the encoding back onto the rows (broadcast — the table is
    * cell-frame-sized), appending `outCol` = the out-of-fold encoding.
    */
  def encode(df: DataFrame, catCol: String, foldCol: String,
             targetIntCol: String, outCol: String): DataFrame = {
    val enc = encodingTable(df, catCol, foldCol, targetIntCol)
      .withColumnRenamed("enc_u", outCol).drop("n_in_fold")
    df.join(broadcast(enc), Seq(catCol, foldCol))
  }
}
