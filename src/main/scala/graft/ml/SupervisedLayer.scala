package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.classification.GBTClassifier
import org.apache.spark.ml.feature.{StringIndexer, VectorAssembler}
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Cols
import graft.features.PairFeatures

/** Supervised scoring layer: pair features -> gradient-boosted classifier ->
  * nm_score + best_match.
  *
  * The reference runs an sklearn pipeline (PandasFeatureExtractor +
  * XGBClassifier) inside a pandas GROUPED_MAP UDF
  * (/root/reference/emm/supervised_model/spark_supervised_model.py:155-303,
  * base_supervised_model.py:40-198). We keep everything native: features are
  * column expressions/windows, the classifier is MLlib GBTClassifier (same
  * gradient-boosted-trees family; exact score parity with xgboost is not
  * reproducible offline, so correctness is validated with metric checks, not
  * hashes), and scoring is `model.transform` — vectorized, no Arrow hop, and
  * indifferent to physical partitioning (the reference must disable AQE to
  * keep its grouped-map stable; we don't).
  *
  * best_rank / best_match semantics follow spark_supervised_model.py:266-303:
  * row_number over (uid ORDER BY nm_score DESC, gt_uid DESC); best_match =
  * rank==1 AND nm_score>0 AND gt_uid IS NOT NULL.
  */
final class SupervisedLayer(
    val scoreCols: Seq[String],
    val maxIter: Int = 30,
    val maxDepth: Int = 5,
    val seed: Long = 0L) extends Serializable {

  private val numericFeatures: Seq[String] = Seq(
    "abs_len_diff", "len_ratio", "name_cut", "norm_ed", "norm_jaro", "ratio",
    "token_sort_ratio", "token_set_ratio", "partial_ratio", "w_ratio",
    "abbr_match", "n_overlap_words", "num_word_difference", "ratio_overlap_words")

  def featureCols: Seq[String] = scoreCols ++ numericFeatures :+ "lef_match_idx"

  /** Compute features + rank features for all score columns. */
  def addFeatures(pairs: DataFrame): DataFrame = {
    val withStr = PairFeatures.withStringFeatures(pairs)
    scoreCols.foldLeft(withStr)((df, s) => PairFeatures.rankFeatures(df, s))
  }

  private def prepare(pairs: DataFrame): DataFrame = {
    val feat = addFeatures(pairs)
    feat.na.fill(0.0, featureCols.filterNot(_ == "lef_match_idx"))
        .na.fill(0, scoreCols)
  }

  /** Train on candidate pairs labeled with a boolean `correct` column
    * (no-candidate rows excluded, like base_supervised_model.py:122-198).
    */
  def fit(trainPairs: DataFrame, labelCol: String = "correct"): SupervisedModel = {
    val prepared = prepare(trainPairs.filter(col(Cols.GtUid).isNotNull))
      .withColumn("label", col(labelCol).cast("double"))
    val stages = Seq(
      new StringIndexer().setInputCol("lef_match").setOutputCol("lef_match_idx")
        .setHandleInvalid("keep"),
      new VectorAssembler().setInputCols(featureCols.toArray)
        .setOutputCol("features_vec").setHandleInvalid("keep"),
      new GBTClassifier().setLabelCol("label").setFeaturesCol("features_vec")
        .setMaxIter(maxIter).setMaxDepth(maxDepth).setSeed(seed))
    val model = new Pipeline().setStages(stages.toArray).fit(prepared)
    new SupervisedModel(this, model)
  }
}

final class SupervisedModel(val layer: SupervisedLayer, val pipeline: PipelineModel)
    extends Serializable {

  /** Score candidate pairs: adds nm_score, best_rank, best_match. */
  def transform(candidates: DataFrame): DataFrame = {
    val matched  = candidates.filter(col(Cols.GtUid).isNotNull)
    val noMatch  = candidates.filter(col(Cols.GtUid).isNull)
    val prepared = layer.addFeatures(matched)
      .na.fill(0.0, layer.featureCols.filterNot(_ == "lef_match_idx"))
    val scored = pipeline.transform(prepared)
      .withColumn(Cols.NmScore, vector_to_array(col("probability")).getItem(1))
      .drop("features_vec", "rawPrediction", "probability", "prediction", "lef_match_idx")
    val all =
      if (noMatch.isEmpty) scored
      else scored.unionByName(
        noMatch.withColumn(Cols.NmScore, lit(null).cast("double")),
        allowMissingColumns = true)
    val w = Window.partitionBy(Cols.Uid).orderBy(col(Cols.NmScore).desc_nulls_last, col(Cols.GtUid).desc)
    all.withColumn(Cols.BestRank, row_number().over(w))
      .withColumn(Cols.BestMatch,
        col(Cols.BestRank) === 1 && col(Cols.NmScore) > 0.0 && col(Cols.GtUid).isNotNull)
  }
}
