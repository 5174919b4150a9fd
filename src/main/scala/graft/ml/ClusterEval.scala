package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Clustering-vs-gold evaluation by PAIR COUNTING — the metric gate for a
  * dedup/entity-resolution run: did the predicted clusters put the right
  * rows together? Pairwise precision/recall/F1 and the adjusted Rand index,
  * computed ENTIRELY from the (cluster × gold) contingency table in integer
  * arithmetic:
  *
  *   TP = Σ_cells C(n_cg, 2)   P = Σ_clusters C(n_c, 2)
  *   G  = Σ_classes  C(n_g, 2)
  *
  * precision = TP/P, recall = TP/G, F1 = 2TP/(P+G) — emitted as exact
  * integer ppm (·1e6 div). ARI's numerator and denominator are likewise
  * exact integers after multiplying through by C(n, 2) (Hubert & Arabie
  * 1985); the single closing division is the only double, the q248
  * discipline. Plan: one contingency hash agg (cells ≤ clusters × classes),
  * two marginal folds of it, one 1-row combine — nothing row-count-sized
  * past the first agg.
  */
object ClusterEval {

  private val D38 = "decimal(38,0)"

  /** `df` carries one row per element with `predCol` (cluster id) and
    * `goldCol` (gold class). Returns one report row.
    */
  def pairwiseReport(df: DataFrame, predCol: String,
                     goldCol: String): DataFrame = {
    def pairsOf(c: String) =
      expr(s"CAST(sum(CAST($c AS $D38) * ($c - 1)) div 2 AS $D38)")
    val cells = df.groupBy(col(predCol).as("__c"), col(goldCol).as("__g"))
      .agg(count(lit(1)).cast("long").as("n_cg"))
    val tp = cells.agg(pairsOf("n_cg").as("tp"),
      sum("n_cg").cast("long").as("n"),
      countDistinct("__c").cast("long").as("n_pred_clusters"),
      countDistinct("__g").cast("long").as("n_gold_classes"))
    val p = cells.groupBy("__c").agg(sum("n_cg").cast("long").as("n_c"))
      .agg(pairsOf("n_c").as("pred_pairs"))
    val g = cells.groupBy("__g").agg(sum("n_cg").cast("long").as("n_g"))
      .agg(pairsOf("n_g").as("gold_pairs"))
    tp.crossJoin(broadcast(p)).crossJoin(broadcast(g))
      .withColumn("n2", expr(s"CAST(CAST(n AS $D38) * (n - 1) div 2 AS $D38)"))
      .select(col("n"), col("n_pred_clusters"), col("n_gold_classes"),
        col("tp").cast("long").as("tp_pairs"),
        col("pred_pairs").cast("long").as("pred_pairs"),
        col("gold_pairs").cast("long").as("gold_pairs"),
        expr(s"""CAST(CASE WHEN pred_pairs > 0 THEN
                   (CAST(tp AS $D38) * 1000000) div pred_pairs
                   ELSE 0 END AS BIGINT)""").as("precision_ppm"),
        expr(s"""CAST(CASE WHEN gold_pairs > 0 THEN
                   (CAST(tp AS $D38) * 1000000) div gold_pairs
                   ELSE 0 END AS BIGINT)""").as("recall_ppm"),
        expr(s"""CAST(CASE WHEN pred_pairs + gold_pairs > 0 THEN
                   (CAST(tp AS $D38) * 2000000) div (pred_pairs + gold_pairs)
                   ELSE 0 END AS BIGINT)""").as("f1_ppm"),
        // ARI = (n2·TP − P·G) / (n2·(P+G)/2 − P·G), ×n2 through
        ((col("n2").cast("double") * col("tp").cast("double") -
          col("pred_pairs").cast("double") * col("gold_pairs").cast("double")) /
         (col("n2").cast("double") *
            (col("pred_pairs") + col("gold_pairs")).cast("double") / 2.0 -
          col("pred_pairs").cast("double") * col("gold_pairs").cast("double")))
          .as("ari"))
  }
}
