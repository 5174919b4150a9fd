package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-class classifier evaluation from exact confusion counts: one row
  * per TRUE class with support, predicted count, TP, and precision /
  * recall / F1 — every rate an exact cross-multiplied integer ppm
  * (F1 = 2·TP / (pred_n + true_n), the identity that keeps F1 rational in
  * the counts), plus micro accuracy and macro-F1 repeated on each row.
  *
  * Scale shape: rows collapse to the ≤|classes|² confusion cells in one
  * hash agg; everything after runs on class-frame-sized data (two tiny
  * aggs + windows over the class frame). Classes predicted but never true
  * (e.g. a reject label) count toward the FP side through pred_n without
  * emitting a row — declared semantics.
  */
object ClassifierEval {

  def confusionReport(df: DataFrame, trueCol: String,
                      predCol: String): DataFrame = {
    // cells feed three derivations — freeze the shared lineage once
    val cells = df.groupBy(col(trueCol).as("t"), col(predCol).as("p"))
      .agg(count(lit(1)).cast("long").as("o")).localCheckpoint()
    val trueTotals = cells.groupBy(col("t").as("label"))
      .agg(sum("o").cast("long").as("support"))
    val predTotals = cells.groupBy(col("p").as("label"))
      .agg(sum("o").cast("long").as("pred_n"))
    val tp = cells.filter(col("t") === col("p"))
      .select(col("t").as("label"), col("o").as("tp"))
    val wAll = Window.partitionBy()
    trueTotals
      .join(predTotals, Seq("label"), "left")
      .join(tp, Seq("label"), "left")
      .withColumn("pred_n", coalesce(col("pred_n"), lit(0L)))
      .withColumn("tp", coalesce(col("tp"), lit(0L)))
      .withColumn("precision_ppm",
        when(col("pred_n") > 0, expr(
          "CAST(CAST(tp AS DECIMAL(38,0)) * 1000000 div pred_n AS BIGINT)")))
      .withColumn("recall_ppm", expr(
        "CAST(CAST(tp AS DECIMAL(38,0)) * 1000000 div support AS BIGINT)"))
      .withColumn("f1_ppm", expr(
        """CAST(CAST(tp AS DECIMAL(38,0)) * 2000000
           div (pred_n + support) AS BIGINT)"""))
      .withColumn("__tp_all", sum("tp").over(wAll).cast("long"))
      .withColumn("__n_all", sum("support").over(wAll).cast("long"))
      .withColumn("__f1_sum", sum("f1_ppm").over(wAll).cast("long"))
      .withColumn("__k", count(lit(1)).over(wAll).cast("long"))
      .withColumn("accuracy_ppm", expr(
        """CAST(CAST(__tp_all AS DECIMAL(38,0)) * 1000000
           div __n_all AS BIGINT)"""))
      .withColumn("macro_f1_ppm", expr("CAST(__f1_sum div __k AS BIGINT)"))
      .select("label", "support", "pred_n", "tp", "precision_ppm",
        "recall_ppm", "f1_ppm", "accuracy_ppm", "macro_f1_ppm")
  }
}
