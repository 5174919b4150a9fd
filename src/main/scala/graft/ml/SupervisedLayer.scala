package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.classification.GBTClassifier
import org.apache.spark.ml.feature.{StringIndexer, VectorAssembler}
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Cols
import graft.features.{PairFeatures, Vocabulary, VocabularyModel}

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
  * The classifier consumes the reference's FULL feature vector
  * (pandas_feature_extractor.py:91-146): indexer scores, 14 string-pair
  * features, 6 vocabulary tier features (features_vocabulary.py:103-165,
  * vocabulary fit on the training pairs' name columns when not supplied),
  * optional extra equality features (features_extra.py:28-60, e.g. country),
  * 7 rank/diff features PER score column (features_rank.py:34-112), and the
  * legal-entity-form match class. Rank/diff features are NaN-filled with -1
  * like the reference (calc_rank_features fillna=-1), others with 0.
  *
  * best_rank / best_match semantics follow spark_supervised_model.py:266-303:
  * row_number over (uid ORDER BY nm_score DESC, gt_uid DESC); best_match =
  * rank==1 AND nm_score>0 AND gt_uid IS NOT NULL.
  */
final class SupervisedLayer(
    val scoreCols: Seq[String],
    val extraFeatureCols: Seq[String] = Nil,
    val withRankFeatures: Boolean = true,
    val maxIter: Int = 30,
    val maxDepth: Int = 5,
    val seed: Long = 0L) extends Serializable {

  private val numericFeatures: Seq[String] = Seq(
    "abs_len_diff", "len_ratio", "name_cut", "norm_ed", "norm_jaro", "ratio",
    "token_sort_ratio", "token_set_ratio", "partial_ratio", "w_ratio",
    "abbr_match", "n_overlap_words", "num_word_difference", "ratio_overlap_words")

  def rankDiffCols: Seq[String] =
    if (!withRankFeatures) Nil
    else scoreCols.flatMap(s => PairFeatures.rankFeatureSuffixes.map(x => s"${s}_$x"))

  /** Extra equality features get a `_match_feat` suffix so the carried-on
    * source column (e.g. country) is never overwritten in the output.
    */
  def extraFeatNames: Seq[String] = extraFeatureCols.map(c => s"${c}_match_feat")

  def featureCols: Seq[String] =
    scoreCols ++ numericFeatures ++ VocabularyModel.featureNames ++
      extraFeatNames ++ rankDiffCols :+ "lef_match_idx"

  /** Feature columns that are internal to the classifier — everything added
    * by [[addFeatures]], dropped from the scored output (the reference keeps
    * features inside its grouped-map UDF and only emits nm_score).
    */
  def internalFeatureCols: Seq[String] =
    numericFeatures ++ VocabularyModel.featureNames ++ extraFeatNames ++
      rankDiffCols ++ Seq("lef_match", "lef_match_idx")

  /** Compute the full feature set: string-pair + vocabulary tiers + extra
    * equality features + rank features for all score columns.
    */
  def addFeatures(pairs: DataFrame, vocabulary: VocabularyModel): DataFrame = {
    val withStr = PairFeatures.withStringFeatures(pairs)
    val withVocab = vocabulary.withPairFeatures(withStr)
    val withExtra = extraFeatureCols.foldLeft(withVocab) { (df, c) =>
      df.withColumn(s"${c}_match_feat", PairFeatures.equalityFeature(c, Cols.gt(c)))
    }
    if (withRankFeatures)
      scoreCols.foldLeft(withExtra)((df, s) => PairFeatures.rankFeatures(df, s))
    else withExtra
  }

  private[ml] def prepare(pairs: DataFrame, vocabulary: VocabularyModel): DataFrame = {
    val feat = addFeatures(pairs, vocabulary)
    feat
      .na.fill(-1.0, rankDiffCols)
      .na.fill(0.0, (featureCols.toSet -- rankDiffCols - "lef_match_idx").toSeq)
  }

  /** Train on candidate pairs labeled with a boolean `correct` column
    * (no-candidate rows excluded, like base_supervised_model.py:122-198).
    * The vocabulary is fit on the training pairs' two name columns when not
    * supplied (pandas_feature_extractor.py:121-123).
    */
  def fit(trainPairs: DataFrame, labelCol: String = "correct",
          vocabulary: Option[VocabularyModel] = None): SupervisedModel = {
    val matched = trainPairs.filter(col(Cols.GtUid).isNotNull)
    val vocab = vocabulary.getOrElse(
      Vocabulary.fit(matched, Seq(Cols.Preprocessed, Cols.GtPreprocessed)))
    val prepared = prepare(matched, vocab)
      .withColumn("label", col(labelCol).cast("double"))
    val stages = Seq(
      new StringIndexer().setInputCol("lef_match").setOutputCol("lef_match_idx")
        .setHandleInvalid("keep"),
      new VectorAssembler().setInputCols(featureCols.toArray)
        .setOutputCol("features_vec").setHandleInvalid("keep"),
      new GBTClassifier().setLabelCol("label").setFeaturesCol("features_vec")
        .setMaxIter(maxIter).setMaxDepth(maxDepth).setSeed(seed))
    val model = new Pipeline().setStages(stages.toArray).fit(prepared)
    new SupervisedModel(this, model, vocab)
  }
}

final class SupervisedModel(val layer: SupervisedLayer, val pipeline: PipelineModel,
                            val vocabulary: VocabularyModel)
    extends Serializable {

  /** Score candidate pairs: adds nm_score, best_rank, best_match.
    * No-candidate rows pass through with a null score via one unconditional
    * unionByName — no eager driver-side emptiness probe on the hot path.
    */
  def transform(candidates: DataFrame): DataFrame = {
    val matched  = candidates.filter(col(Cols.GtUid).isNotNull)
    val noMatch  = candidates.filter(col(Cols.GtUid).isNull)
    val prepared = layer.prepare(matched, vocabulary)
    val scored = pipeline.transform(prepared)
      .withColumn(Cols.NmScore, vector_to_array(col("probability")).getItem(1))
      .drop("features_vec" +: "rawPrediction" +: "probability" +: "prediction" +:
        layer.internalFeatureCols: _*)
    val all = scored.unionByName(
      noMatch.withColumn(Cols.NmScore, lit(null).cast("double")),
      allowMissingColumns = true)
    val w = Window.partitionBy(Cols.Uid).orderBy(col(Cols.NmScore).desc_nulls_last, col(Cols.GtUid).desc)
    all.withColumn(Cols.BestRank, row_number().over(w))
      .withColumn(Cols.BestMatch,
        col(Cols.BestRank) === 1 && col(Cols.NmScore) > 0.0 && col(Cols.GtUid).isNotNull)
  }
}
