package graft.features

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Cols

/** Vocabulary of common / very-common words with doc-frequency thresholds.
  *
  * Semantics of the reference's vocabulary features
  * (/root/reference/emm/features/features_vocabulary.py:38-165): fit computes
  * two word sets over the corpus of names — words whose document frequency
  * ratio exceeds `veryCommonThreshold` (default 0.01) and `commonThreshold`
  * (default 0.0001) — then pair features count overlapping / differing words
  * split by very-common / common / rare.
  *
  * Scale notes: the fit is one explode + groupBy(word) + count aggregation;
  * the resulting sets are driver-collected (bounded: only words above an
  * absolute df threshold survive) and shipped via broadcast into expressions.
  */
final case class VocabularyModel(veryCommon: Set[String], common: Set[String]) {

  /** hits = overlapping words in a tier; misses = words of one side's tier
    * not present on the other side.
    */
  def pairFeatures(nameCol: String = Cols.Preprocessed,
                   gtNameCol: String = Cols.GtPreprocessed): Seq[(String, Column)] = {
    val a = split(coalesce(col(nameCol), lit("")), " ")
    val b = split(coalesce(col(gtNameCol), lit("")), " ")
    def inSet(arr: Column, s: Set[String]): Column =
      filter(arr, w => w.isInCollection(if (s.isEmpty) Set("") else s))
    def tier(name: String, s: Set[String]): Seq[(String, Column)] = Seq(
      s"${name}_hit" -> size(array_intersect(inSet(a, s), inSet(b, s))).cast("int"),
      s"${name}_miss" -> (size(array_except(inSet(a, s), b)) +
                          size(array_except(inSet(b, s), a))).cast("int"))
    tier("very_common", veryCommon) ++ tier("common", common -- veryCommon) ++ Seq(
      "rare_hit" -> size(array_except(array_intersect(a, b),
        lit((common ++ veryCommon).toArray))).cast("int"))
  }
}

object Vocabulary {
  def fit(names: DataFrame, nameCol: String = Cols.Preprocessed,
          veryCommonThreshold: Double = 0.01,
          commonThreshold: Double = 0.0001): VocabularyModel = {
    val n = names.count().toDouble
    val words = names
      .select(explode(array_distinct(split(coalesce(col(nameCol), lit("")), " "))).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("df"))
      .filter(col("df") >= math.max(commonThreshold * n, 1.0))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    VocabularyModel(
      veryCommon = words.filter(_._2 >= veryCommonThreshold * n).map(_._1).toSet,
      common     = words.filter(_._2 >= commonThreshold * n).map(_._1).toSet)
  }
}
