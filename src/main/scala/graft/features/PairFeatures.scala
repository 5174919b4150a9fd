package graft.features

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Cols
import graft.functions.{Abbreviations, FuzzyMatch, LegalForms}

/** Name-pair feature extraction for the supervised layer.
  *
  * Re-expresses the reference's PandasFeatureExtractor
  * (/root/reference/emm/features/pandas_feature_extractor.py:91-115,
  * features_name.py, features_rank.py, features_vocabulary.py) as native
  * column expressions + windows wherever Spark can (codegen'd, no
  * serialization boundary), with Scala UDFs only for the imperative string
  * kernels (fuzzy ratios, jaro, abbreviation match, legal-entity forms).
  */
object PairFeatures {

  private[graft] val jaroUdf  = udf((a: String, b: String) => FuzzyMatch.jaro(a, b))
  private val ratioUdf        = udf((a: String, b: String) => FuzzyMatch.ratio(a, b))
  private val tokenSortUdf    = udf((a: String, b: String) => FuzzyMatch.tokenSortRatio(a, b))
  private val tokenSetUdf     = udf((a: String, b: String) => FuzzyMatch.tokenSetRatio(a, b))
  private val partialUdf      = udf((a: String, b: String) => FuzzyMatch.partialRatio(a, b))
  private val wRatioUdf       = udf((a: String, b: String) => FuzzyMatch.wRatio(a, b))
  private val abbrMatchUdf    = udf((a: String, b: String) => if (Abbreviations.abbrMatch(a, b)) 1 else 0)
  private val lefMatchUdf     = udf((a: String, b: String) => LegalForms.matchClass(a, b))

  /** String-pair features on (nameCol, gtNameCol). Null-safe via coalesce. */
  def stringFeatures(nameCol: String = Cols.Preprocessed,
                     gtNameCol: String = Cols.GtPreprocessed): Seq[(String, Column)] = {
    val a = coalesce(col(nameCol), lit(""))
    val b = coalesce(col(gtNameCol), lit(""))
    Seq(
      // N2: length metrics — pure expressions
      "abs_len_diff" -> abs(length(a) - length(b)).cast("int"),
      "len_ratio" -> (least(length(a), length(b)).cast("double") /
                      greatest(greatest(length(a), length(b)), lit(1)).cast("double")),
      // N4: prefix containment either way
      "name_cut" -> (a.startsWith(b) || b.startsWith(a)).cast("int"),
      // N5: normalized edit distances
      "norm_ed" -> (lit(1.0) - levenshtein(a, b).cast("double") /
                    greatest(greatest(length(a), length(b)), lit(1)).cast("double")),
      "norm_jaro" -> jaroUdf(a, b),
      // N3: fuzzy ratios (Scala kernels)
      "ratio" -> ratioUdf(a, b),
      "token_sort_ratio" -> tokenSortUdf(a, b),
      "token_set_ratio" -> tokenSetUdf(a, b),
      "partial_ratio" -> partialUdf(a, b),
      "w_ratio" -> wRatioUdf(a, b),
      // N1: abbreviation / open-form heuristic
      "abbr_match" -> abbrMatchUdf(a, b),
      // N6 (set part): word overlap counts via array expressions
      "n_overlap_words" -> size(array_intersect(split(a, " "), split(b, " "))).cast("int"),
      "num_word_difference" -> abs(size(split(a, " ")) - size(split(b, " "))).cast("int"),
      "ratio_overlap_words" -> (size(array_intersect(split(a, " "), split(b, " "))).cast("double") /
        greatest(size(array_union(split(a, " "), split(b, " "))), lit(1)).cast("double")),
      // N9: legal-entity-form relation (categorical as string)
      "lef_match" -> lefMatchUdf(col(nameCol), col(gtNameCol)))
  }

  /** N8: equality feature -> {1, -1, 0 for null} (features_extra.py:28-60). */
  def equalityFeature(c1: String, c2: String): Column =
    when(col(c1).isNull || col(c2).isNull, 0)
      .when(col(c1) === col(c2), 1)
      .otherwise(-1)

  /** Suffixes of the columns produced by [[rankFeatures]], in output order. */
  val rankFeatureSuffixes: Seq[String] = Seq(
    "rank", "top2_dist", "dist_to_max", "dist_to_min", "ptp",
    "diff_to_next", "diff_to_prev")

  /** W4/W5: rank + distance + lag/lead diff features for one score column,
    * computed per-uid with windows (features_rank.py:34-112). Scores are
    * rounded to 5 decimals before ordering, like the reference; top2_dist is
    * the gap between the group's best and second-best score (ptp of
    * nlargest(2), 0 for singleton groups).
    */
  def rankFeatures(df: DataFrame, scoreCol: String,
                   uidCol: String = Cols.Uid): DataFrame = {
    val s    = round(col(scoreCol), 5)
    val grp  = Window.partitionBy(uidCol)
    val ord  = grp.orderBy(s.desc, col(Cols.GtUid))
    val full = ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    df.withColumn(s"${scoreCol}_rank", row_number().over(ord))
      .withColumn(s"${scoreCol}_top2_dist",
        max(s).over(grp) - coalesce(nth_value(s, 2).over(full), max(s).over(grp)))
      .withColumn(s"${scoreCol}_dist_to_max", max(s).over(grp) - s)
      .withColumn(s"${scoreCol}_dist_to_min", s - min(s).over(grp))
      .withColumn(s"${scoreCol}_ptp", max(s).over(grp) - min(s).over(grp))
      .withColumn(s"${scoreCol}_diff_to_next", s - lead(s, 1).over(ord))
      .withColumn(s"${scoreCol}_diff_to_prev", lag(s, 1).over(ord) - s)
  }

  /** Add all string-pair features as columns. */
  def withStringFeatures(df: DataFrame,
                         nameCol: String = Cols.Preprocessed,
                         gtNameCol: String = Cols.GtPreprocessed): DataFrame =
    stringFeatures(nameCol, gtNameCol).foldLeft(df) { case (d, (n, c)) => d.withColumn(n, c) }
}
