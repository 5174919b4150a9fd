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
  * df >= 0.0001*N caps the set at 10k words per 100M docs even in theory).
  * Tokenization stays a codegen'd regexp expression; the six tier counts are
  * produced by ONE hash-set pass per row (a single struct-returning UDF whose
  * closure carries the word sets once per task) — the previous form ran six
  * `array_intersect(_, typedLit(~10k words))` scans per row, a linear probe
  * of a 10k-element literal array 6× per training pair.
  */
final case class VocabularyModel(veryCommon: Set[String], common: Set[String]) {

  /** Names of the produced features, in output order. */
  def featureNames: Seq[String] = VocabularyModel.featureNames

  /** The six tier counts as one struct column; evaluated once per row
    * (CollapseProject never duplicates a non-trivial expression).
    */
  private def featStruct(nameCol: String, gtNameCol: String): Column = {
    def words(c: String): Column =
      array_distinct(regexp_extract_all(coalesce(col(c), lit("")), lit("\\w\\w+"), lit(0)))
    // immutable sets captured once; serialized to each task with the closure
    val vc = veryCommon
    val cm = common
    val tiers = udf { (a: Seq[String], b: Seq[String]) =>
      val aSet = a.toSet
      val bSet = b.toSet
      var vcHit = 0; var cHit = 0; var rHit = 0
      var vcMiss = 0; var cMiss = 0; var rMiss = 0
      aSet.foreach { w =>
        val hit = bSet.contains(w)
        if (vc.contains(w)) { if (hit) vcHit += 1 else vcMiss += 1 }
        else if (cm.contains(w)) { if (hit) cHit += 1 else cMiss += 1 }
        else { if (hit) rHit += 1 else rMiss += 1 }
      }
      bSet.foreach { w =>
        if (!aSet.contains(w)) {
          if (vc.contains(w)) vcMiss += 1
          else if (cm.contains(w)) cMiss += 1
          else rMiss += 1
        }
      }
      VocabularyModel.TierCounts(vcHit, cHit, rHit, vcMiss, cMiss, rMiss)
    }
    tiers(words(nameCol), words(gtNameCol))
  }

  def pairFeatures(nameCol: String = Cols.Preprocessed,
                   gtNameCol: String = Cols.GtPreprocessed): Seq[(String, Column)] = {
    val s = featStruct(nameCol, gtNameCol)
    featureNames.map(n => n -> s.getField(n))
  }

  /** Add all vocabulary features as columns: one UDF evaluation expanded into
    * the six named columns.
    */
  def withPairFeatures(df: DataFrame,
                       nameCol: String = Cols.Preprocessed,
                       gtNameCol: String = Cols.GtPreprocessed): DataFrame = {
    val expanded = df.columns.toIndexedSeq.map(col) ++
      featureNames.map(n => col("__voc_feats").getField(n).as(n))
    df.withColumn("__voc_feats", featStruct(nameCol, gtNameCol))
      .select(expanded: _*)
  }
}

object VocabularyModel {
  /** UDF return type: field names must equal [[featureNames]]. */
  final case class TierCounts(
      very_common_hit: Int, common_hit: Int, rare_hit: Int,
      very_common_miss: Int, common_miss: Int, rare_miss: Int)

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
