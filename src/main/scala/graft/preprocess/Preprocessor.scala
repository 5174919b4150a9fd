package graft.preprocess

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{Abbreviations, AsciiFold, LegalForms}

/** Name preprocessing: an ordered list of string transforms applied as chained
  * column expressions (one projection — Catalyst collapses the chain).
  *
  * Re-expresses the reference's preprocessing stage
  * (/root/reference/emm/preprocessing/base_name_preprocessor.py:32-80,
  * functions.py:31-102, spark_preprocessor.py:91-115). Pure-regex steps are
  * native `regexp_replace` (codegen'd); transliteration / abbreviation-merge /
  * LEF-strip need imperative string logic and are Scala UDFs.
  */
object Preprocessor {

  private val asciiFoldUdf  = udf((s: String) => AsciiFold.fold(s))
  private val mergeAbbrUdf  = udf((s: String) => Abbreviations.abbreviationsToWords(s))
  private val mergeLegalUdf = udf((s: String) => Abbreviations.legalAbbreviationsToWords(s))
  private val removeLefUdf  = udf((s: String) => LegalForms.removeLegalForm(s))

  /** Shorthand map applied in order (functions.py:37-49). */
  private def mapShorthands(c: Column): Column = {
    val steps: Seq[(String, String)] = Seq(
      "ver(?:eniging)? v(?:an)? (\\w*)(?:eigenaren|eigenaars)" -> "vve $1",
      "stichting" -> "stg",
      "straat" -> "str",
      "pub(?:lic)? lim(?:ited)? co(?:mpany)?|pub(?:lic)? l(?:td)? co(?:mpany)?|" +
        "pub(?:lic)? co(?:mpany)? lim(?:ited)?|pub(?:lic)? co(?:mpany)? l(?:td)?|pcl" -> "plc",
      "limited" -> "ltd")
    steps.foldLeft(c) { case (col, (pat, rep)) => regexp_replace(col, pat, rep) }
  }

  /** Registry of named column transforms (functions.py:31-96). */
  val functions: Map[String, Column => Column] = Map(
    "strip_accents_unicode" -> (c => asciiFoldUdf(c)),
    "strip_hyphens" -> (c => regexp_replace(c, "[-_]", " ")),
    "strip_punctuation" -> (c => regexp_replace(c, "[\\p{Punct}+|$=“”¨]", " ")),
    "insert_space_around_punctuation" -> (c => regexp_replace(c, "([\\p{Punct}+|$=“”])", " $1 ")),
    "handle_lower_trim" -> (c => trim(lower(c))),
    "handle_lower" -> (c => lower(c)),
    "handle_trim" -> (c => trim(c)),
    "merge_abbreviations" -> (c => mergeAbbrUdf(c)),
    "merge_legal_form_abbreviations" -> (c => mergeLegalUdf(c)),
    "remove_extra_space" -> (c => regexp_replace(c, "\\s+", " ")),
    "map_shorthands" -> (c => mapShorthands(c)),
    "merge_&" -> (c => regexp_replace(c, "(\\s|^)(\\w)\\s*[&/]\\s*(\\w)(\\s|$)", "$1$2$3$4")),
    "remove_legal_form" -> (c => removeLefUdf(c)),
    "remove_newline" -> (c => regexp_replace(c, "\n|\r", " ")),
    "replace_punctuation" -> (c => regexp_replace(c, "[–—―]", "-")))

  /** The reference's predefined pipelines (base_name_preprocessor.py:32-80). */
  val pipelines: Map[String, Seq[String]] = Map(
    "preprocess_name" -> Seq(
      "strip_accents_unicode", "replace_punctuation", "remove_newline",
      "strip_punctuation", "handle_lower_trim", "remove_extra_space"),
    "preprocess_with_punctuation" -> Seq(
      "strip_accents_unicode", "replace_punctuation", "remove_newline",
      "insert_space_around_punctuation", "handle_lower_trim", "remove_extra_space"),
    "preprocess_merge_abbr_v0" -> Seq(
      "strip_accents_unicode", "replace_punctuation", "remove_newline",
      "merge_abbreviations", "merge_&", "strip_punctuation",
      "handle_lower_trim", "map_shorthands"),
    "preprocess_merge_abbr" -> Seq(
      "strip_accents_unicode", "replace_punctuation", "remove_newline",
      "merge_abbreviations", "merge_&", "strip_punctuation",
      "handle_lower_trim", "map_shorthands", "remove_extra_space"),
    "preprocess_merge_legal_abbr" -> Seq(
      "strip_accents_unicode", "replace_punctuation", "remove_newline",
      "handle_lower", "merge_legal_form_abbreviations", "strip_punctuation",
      "handle_trim", "remove_extra_space"))

  /** Build the composite preprocessing expression for one pipeline. */
  def expr(input: Column, pipeline: Seq[String]): Column = {
    val start = coalesce(input, lit("")) // replace_none (functions.py:99-102)
    pipeline.foldLeft(start) { (c, fname) =>
      functions.getOrElse(fname,
        throw new IllegalArgumentException(s"unknown preprocessing function: $fname"))(c)
    }
  }

  def apply(df: DataFrame, pipeline: String = "preprocess_merge_abbr",
            inputCol: String = graft.Cols.Name,
            outputCol: String = graft.Cols.Preprocessed): DataFrame = {
    val steps = pipelines.getOrElse(pipeline,
      throw new IllegalArgumentException(s"unknown pipeline: $pipeline"))
    df.withColumn(outputCol, expr(col(inputCol), steps))
  }

  def custom(df: DataFrame, steps: Seq[String], inputCol: String,
             outputCol: String): DataFrame =
    df.withColumn(outputCol, expr(col(inputCol), steps))
}
