package graft.features

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Cols

/** Vocabulary of common / very-common words with doc-frequency thresholds.
  *
  * Semantics of the reference's vocabulary features
  * (/root/reference/emm/features/features_vocabulary.py:36-165): fit collects
  * two DISJOINT word sets over the corpus of names — `veryCommon` (document
  * frequency ratio >= veryCommonThreshold, default 0.01) and `common`
  * (>= commonThreshold, default 0.0001, minus the very-common words). Words
  * are `\w\w+` tokens (>= 2 word chars), like the reference's CountVectorizer
  * token pattern. Pair features then split the hit/miss word sets of a name
  * pair by tier:
  *   hits   = words present in both names  (set intersection)
  *   misses = words present in exactly one (set union minus intersection)
  * giving very_common/common/rare x hit/miss counts (6 features).
  *
  * Scale notes: the fit is one explode + groupBy(word) + count; only words
  * above the absolute `common` df threshold are driver-collected (bounded —
  * df >= 0.0001*N caps the set at 10k words per 100M docs even in theory);
  * the sets travel as array literals inside codegen'd expressions — no UDF,
  * no broadcast join on the hot path.
  */
final case class VocabularyModel(veryCommon: Set[String], common: Set[String]) {

  /** Names of the produced features, in output order. */
  def featureNames: Seq[String] = VocabularyModel.featureNames

  def pairFeatures(nameCol: String = Cols.Preprocessed,
                   gtNameCol: String = Cols.GtPreprocessed): Seq[(String, Column)] = {
    def words(c: String): Column =
      array_distinct(regexp_extract_all(coalesce(col(c), lit("")), lit("\\w\\w+"), lit(0)))
    val a = words(nameCol)
    val b = words(gtNameCol)
    val hits   = array_intersect(a, b)
    val misses = array_except(array_union(a, b), array_intersect(a, b))
    val vcLit    = typedLit(veryCommon.toSeq.sorted)
    val cLit     = typedLit(common.toSeq.sorted)
    val vocabLit = typedLit((veryCommon ++ common).toSeq.sorted)
    def tier(set: Column, of: Column): Column = size(array_intersect(of, set)).cast("int")
    Seq(
      "very_common_hit"  -> tier(vcLit, hits),
      "common_hit"       -> tier(cLit, hits),
      "rare_hit"         -> (size(hits) - size(array_intersect(hits, vocabLit))).cast("int"),
      "very_common_miss" -> tier(vcLit, misses),
      "common_miss"      -> tier(cLit, misses),
      "rare_miss"        -> (size(misses) - size(array_intersect(misses, vocabLit))).cast("int"))
  }

  /** Add all vocabulary features as columns. */
  def withPairFeatures(df: DataFrame,
                       nameCol: String = Cols.Preprocessed,
                       gtNameCol: String = Cols.GtPreprocessed): DataFrame =
    pairFeatures(nameCol, gtNameCol).foldLeft(df) { case (d, (n, c)) => d.withColumn(n, c) }
}

object VocabularyModel {
  val featureNames: Seq[String] = Seq(
    "very_common_hit", "common_hit", "rare_hit",
    "very_common_miss", "common_miss", "rare_miss")
}

object Vocabulary {

  /** Fit on one or more name columns (reference fits on
    * [preprocessed, gt_preprocessed] of the training pairs,
    * pandas_feature_extractor.py:121-123): the corpus is the distinct union
    * of all column values.
    */
  def fit(names: DataFrame, nameCols: Seq[String] = Seq(Cols.Preprocessed),
          veryCommonThreshold: Double = 0.01,
          commonThreshold: Double = 0.0001): VocabularyModel = {
    require(commonThreshold < veryCommonThreshold,
      "commonThreshold must be smaller than veryCommonThreshold")
    val corpus = nameCols.map(c => names.select(col(c).as("nm")))
      .reduce(_ union _).na.drop().distinct()
    val n = corpus.count().toDouble
    val words = corpus
      .select(explode(array_distinct(
        regexp_extract_all(col("nm"), lit("\\w\\w+"), lit(0)))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("df"))
      .filter(col("df") >= math.max(commonThreshold * n, 1.0))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val vc = words.filter(_._2 >= veryCommonThreshold * n).map(_._1).toSet
    VocabularyModel(
      veryCommon = vc,
      common     = words.map(_._1).toSet -- vc)
  }
}
