package graft.data

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Mergeable n-gram count store for language-model fitting — the store
  * member the LM family was missing (AggStore persists exact sums,
  * GramStore second moments for PCA; this persists the two integer
  * relations a Kneser–Ney fit is a pure function of): per-batch bigram
  * counts (`path/bigrams`: w1, w2, c_bigram) and unigram counts
  * (`path/unigrams`: term, c_term), appended one parquet file set per
  * ingest, merged by integer addition at read time.
  *
  * Counts are linear in the data, so a table fit from the merged store
  * ([[fitKn]]) is BIT-IDENTICAL to a fit from the full corpus scan
  * ([[graft.functions.LmKneserNey.bigramTable]]) — the GramStore q325
  * store⇒refit contract at LM order, machine-checked by q405. At 100 TB
  * this is the difference between refitting tomorrow's LM from
  * yesterday's kilobyte-per-type count partials plus today's delta and
  * rescanning the entire accumulated corpus text.
  *
  * Appends are pure `mode("append")` parquet writes (no rewrite of
  * history); a crashed-and-retried append DOES double-count — callers
  * needing exactly-once should write per-batch subdirs and promote, the
  * [[graft.queries.SourceStreamQueries]] idempotent-sink recipe.
  */
object LmStore {

  /** Count one batch of documents into the store: one map-only explode +
    * one hash agg per relation, nothing rescans prior batches. */
  def appendBatch(docs: DataFrame, textCol: String, path: String,
                  overwrite: Boolean = false): Unit = {
    val mode = if (overwrite) "overwrite" else "append"
    graft.functions.LmKneserNey.bigramCounts(docs, textCol)
      .write.mode(mode).parquet(s"$path/bigrams")
    graft.functions.LmKneserNey.trigramCounts(docs, textCol)
      .write.mode(mode).parquet(s"$path/trigrams")
    docs.filter(col(textCol).isNotNull)
      .select(explode(split(trim(col(textCol)), " ")).as("term"))
      .groupBy("term").agg(count(lit(1)).cast("long").as("c_term"))
      .write.mode(mode).parquet(s"$path/unigrams")
  }

  /** Merged bigram counts (w1, w2, c_bigram): one integer-sum shuffle
    * over the stored partials — cost scales with stored TYPES, never
    * with the corpus text. */
  def mergedBigrams(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/bigrams")
      .groupBy("w1", "w2")
      .agg(sum("c_bigram").cast("long").as("c_bigram"))

  /** Merged unigram counts (term, c_term). */
  def mergedUnigrams(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/unigrams")
      .groupBy("term").agg(sum("c_term").cast("long").as("c_term"))

  /** Merged trigram counts (w1, w2, w3, c_trigram). */
  def mergedTrigrams(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/trigrams")
      .groupBy("w1", "w2", "w3")
      .agg(sum("c_trigram").cast("long").as("c_trigram"))

  /** Interpolated Kneser–Ney table from the merged store — bit-identical
    * to a from-scan fit over the union of every appended batch. */
  def fitKn(spark: SparkSession, path: String, vocabTopK: Int = 100,
            dNum: Int = 3, dDen: Int = 4): DataFrame =
    graft.functions.LmKneserNey.bigramTableFromCounts(
      mergedBigrams(spark, path), mergedUnigrams(spark, path),
      vocabTopK, dNum, dDen)

  /** The trigram sibling of [[fitKn]] — same store⇒refit identity at
    * trigram order. */
  def fitKnTrigram(spark: SparkSession, path: String, vocabTopK: Int = 100,
                   dNum: Int = 3, dDen: Int = 4): DataFrame =
    graft.functions.LmKneserNey.trigramTableFromCounts(
      mergedTrigrams(spark, path), mergedUnigrams(spark, path),
      vocabTopK, dNum, dDen)
}
