package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interpolated Kneser–Ney bigram language model table (Kneser & Ney
  * 1995; the Chen–Goodman interpolated form with one DECLARED rational
  * discount D = dNum/dDen) — the n-gram LM estimator a training-data
  * pipeline builds for perplexity-flavoured quality filtering and domain
  * scoring, completing the smoothing family beside Good–Turing (q292):
  *
  *   P_KN(w₂|w₁) = max(c(w₁w₂) − D, 0)/c(w₁·) + λ(w₁)·P_cont(w₂)
  *   λ(w₁)  = D·N₁₊(w₁·)/c(w₁·)
  *   P_cont(w₂) = N₁₊(·w₂)/N₁₊(··)
  *
  * Exact-integer oracle discipline: with D = dNum/dDen every term is a
  * rational of integer counts; each is emitted as its own q9 floor
  * (term1_q9 = (dDen·c − dNum)·10⁹ div (dDen·c₁), lambda_q9, pcont_q9)
  * and the interpolated probability REPLAYS THE QUANTIZED PIECES —
  * kn_q9 = term1_q9 + lambda_q9·pcont_q9 div 10⁹, the quantize-once-
  * per-piece discipline both engines reproduce bit-for-bit. Only
  * OBSERVED bigrams are emitted (the unseen mass is reachable through
  * the emitted λ and P_cont, declared), restricted to pairs whose both
  * words sit in the top-`vocabTopK` unigram vocabulary (count desc, term
  * asc — lowered to TakeOrdered, never a global window).
  *
  * Plan: one bigram explode (map-only) → one (w₁,w₂) hash agg → two
  * marginal re-aggregations of the COLLAPSED bigram relation → broadcast
  * vocabulary semi-joins. Cost past the first agg scales with distinct
  * bigram types, not corpus size.
  */
object LmKneserNey {

  def bigramTable(docs: DataFrame, textCol: String,
                  vocabTopK: Int = 100, dNum: Int = 3,
                  dDen: Int = 4): DataFrame = {
    require(vocabTopK >= 1 && dNum >= 0 && dDen >= 1 && dNum < dDen,
      s"need 0 <= D = $dNum/$dDen < 1 and vocabTopK >= 1")
    val d38 = "decimal(38,0)"
    val words = docs.filter(col(textCol).isNotNull)
      .select(split(trim(col(textCol)), " ").as("__ws"))
    val bigrams = words
      .filter(size(col("__ws")) >= 2)
      .select(explode(expr(
        """transform(sequence(1, size(__ws) - 1),
           i -> named_struct('w1', element_at(__ws, i),
                             'w2', element_at(__ws, i + 1)))""")).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
    val bc = bigrams.groupBy("w1", "w2")
      .agg(count(lit(1)).cast("long").as("c_bigram"))
    val leftM = bc.groupBy("w1")
      .agg(sum("c_bigram").cast("long").as("c_left"),
        count(lit(1)).cast("long").as("n_follow"))
    val rightM = bc.groupBy("w2")
      .agg(count(lit(1)).cast("long").as("n_precede"))
    val types = bc.agg(count(lit(1)).cast("long").as("__btypes"))
    val vocab = words.select(explode(col("__ws")).as("term"))
      .groupBy("term").agg(count(lit(1)).cast("long").as("__tc"))
      .orderBy(col("__tc").desc, col("term").asc)
      .limit(vocabTopK)
      .select("term")
    bc
      .join(broadcast(vocab.withColumnRenamed("term", "w1")), Seq("w1"),
        "left_semi")
      .join(broadcast(vocab.withColumnRenamed("term", "w2")), Seq("w2"),
        "left_semi")
      .join(leftM, "w1")
      .join(rightM, "w2")
      .crossJoin(broadcast(types))
      .withColumn("term1_q9",
        greatest(lit(0L), expr(
          s"""CAST((CAST($dDen AS $d38) * c_bigram - $dNum) * 1000000000
              div (CAST($dDen AS $d38) * c_left) AS BIGINT)""")))
      .withColumn("lambda_q9",
        expr(s"""CAST(CAST($dNum AS $d38) * n_follow * 1000000000
                 div (CAST($dDen AS $d38) * c_left) AS BIGINT)"""))
      .withColumn("pcont_q9",
        expr(s"""CAST(CAST(n_precede AS $d38) * 1000000000
                 div __btypes AS BIGINT)"""))
      .withColumn("kn_q9",
        expr(s"""CAST(term1_q9 + CAST(lambda_q9 AS $d38) * pcont_q9
                 div 1000000000 AS BIGINT)"""))
      .select("w1", "w2", "c_bigram", "c_left", "n_follow", "n_precede",
        "term1_q9", "lambda_q9", "pcont_q9", "kn_q9")
  }
}
