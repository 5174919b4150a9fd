package graft.idx

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.ml.feature.{CountVectorizer, CountVectorizerModel, IDF, NGram, RegexTokenizer}
import org.apache.spark.ml.linalg.{SparseVector, Vector, Vectors}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Normalized TF-IDF vectorizer for name matching.
  *
  * Semantics of the reference's vectorizer pipeline
  * (/root/reference/emm/indexing/spark_cos_sim_matcher.py:158-183 and
  * spark_normalized_tfidf.py, pandas_normalized_tfidf.py:60-148):
  *
  *  - tokenize (word: runs of [letter|digit]; char: every character),
  *  - n-grams, count-vectorize (optionally binary) with a vocab cap,
  *  - idf = ln((m+1)/(df+1))  (Spark IDF's smoothed formula == sklearn's
  *    smoothed idf minus 1, which is what the reference aligns both to),
  *  - L2 normalization that accounts for out-of-vocabulary tokens: each OOV
  *    token contributes max(idf)^2 to the squared norm, so names full of
  *    unseen tokens get proportionally lower scores.
  *
  * We keep weights in double (not the reference's float32): exact IEEE doubles
  * are what the DuckDB oracle computes, and the broadcast size stays modest.
  */
final class TfidfVectorizer(
    val tokenizer: String = "words", // "words" | "characters"
    val ngram: Int = 1,
    val binary: Boolean = true,
    val vocabSize: Int = 1 << 25,
    val inputCol: String = graft.Cols.Preprocessed,
    val outputCol: String = "features") extends Serializable {

  private def tokenize(df: DataFrame): DataFrame = {
    val pattern = if (tokenizer == "words") "[\\p{IsAlphabetic}\\p{Digit}]+" else "."
    val tok = new RegexTokenizer()
      .setInputCol(inputCol).setOutputCol("tokens")
      .setPattern(pattern).setGaps(false).setToLowercase(true)
    val grams = new NGram().setInputCol("tokens").setOutputCol("ngram_tokens").setN(ngram)
    grams.transform(tok.transform(df))
  }

  def fit(gt: DataFrame): TfidfModel = {
    val toks = tokenize(gt)
    // empty GT, or a corpus that yields no n-gram tokens at all (e.g. word
    // 2-grams over single-word names): MLlib's CountVectorizer and IDF both
    // reject an empty vocabulary, so fall back to a single sentinel term
    // with idf weight 0.0 — even if an input ever produced that token, it
    // would contribute zero weight, so every name vectorizes to zero and
    // matches nothing, the correct degenerate behavior
    // the idf weight array is per-fit constant: broadcast it ONCE here (not
    // per transform call — at the 2^25 vocab cap that would re-ship up to
    // 256 MB on every batch/stream/widened transform) and register it for
    // lifecycle release alongside the packed GT blocks
    def mkModel(cvm: CountVectorizerModel, idfArr: Array[Double], maxIdfSq: Double) =
      new TfidfModel(this, cvm,
        graft.BroadcastLifecycle.track(gt.sparkSession.sparkContext.broadcast(idfArr)),
        maxIdfSq)
    if (toks.select(explode(col("ngram_tokens"))).isEmpty)
      return mkModel(
        new CountVectorizerModel(Array("\u0000")).setInputCol("ngram_tokens")
          .setOutputCol("tf"),
        Array(0.0), 0.0)
    val cv = new CountVectorizer()
      .setInputCol("ngram_tokens").setOutputCol("tf")
      .setVocabSize(vocabSize).setBinary(binary)
      .fit(toks)
    val tf  = cv.transform(toks)
    val idf = new IDF().setInputCol("tf").setOutputCol("idf_features").fit(tf)
    val idfArr = idf.idf.toArray
    val maxIdfSq = if (idfArr.isEmpty) 0.0 else { val m = idfArr.max; m * m }
    mkModel(cv, idfArr, maxIdfSq)
  }
}

final class TfidfModel(
    vec: TfidfVectorizer,
    val cv: CountVectorizerModel,
    val idfBc: Broadcast[Array[Double]],
    val maxIdfSq: Double) extends Serializable {

  def vocabularySize: Int = cv.vocabulary.length

  /** The fitted idf weights (driver-side view of the broadcast). */
  def idf: Array[Double] = idfBc.value

  /** Destroy the fit-time idf broadcast; the model is dead afterwards.
    * Called from `CosSimIndexerModel.release()` so the lifecycle covers
    * every broadcast a fitted cos-sim stack owns.
    */
  def release(): Unit = graft.BroadcastLifecycle.release(idfBc)

  /** Adds `ngram_tokens`, `tf` and the normalized `features` columns. */
  def transform(df: DataFrame): DataFrame = {
    val pattern = if (vec.tokenizer == "words") "[\\p{IsAlphabetic}\\p{Digit}]+" else "."
    val tok = new RegexTokenizer()
      .setInputCol(vec.inputCol).setOutputCol("tokens")
      .setPattern(pattern).setGaps(false).setToLowercase(true)
    val grams  = new NGram().setInputCol("tokens").setOutputCol("ngram_tokens").setN(vec.ngram)
    val withTf = cv.transform(grams.transform(tok.transform(df)))

    val idfBcRef = idfBc // fit-time broadcast; closure must not capture `this`
    val binaryCv = vec.binary
    val maxIdf2  = maxIdfSq

    val normalize = udf { (tf: Vector, tokens: Seq[String]) =>
      val sv  = tf match { case s: SparseVector => s; case d => d.toSparse }
      val w   = idfBcRef.value
      val nAll =
        if (binaryCv) { val s = new java.util.HashSet[String](); tokens.foreach(s.add); s.size }
        else tokens.size
      var matched = 0.0
      var sumSq   = 0.0
      val vals    = new Array[Double](sv.indices.length)
      var i = 0
      while (i < sv.indices.length) {
        matched += sv.values(i)
        val v = sv.values(i) * w(sv.indices(i))
        vals(i) = v
        sumSq += v * v
        i += 1
      }
      val oov  = math.max(nAll - matched, 0.0)
      val norm = math.max(math.sqrt(sumSq + oov * maxIdf2), 1e-9)
      i = 0
      while (i < vals.length) { vals(i) /= norm; i += 1 }
      Vectors.sparse(sv.size, sv.indices, vals)
    }
    withTf.withColumn(vec.outputCol, normalize(col("tf"), col("ngram_tokens")))
  }
}
