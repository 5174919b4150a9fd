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
    val words = docs.filter(col(textCol).isNotNull)
      .select(split(trim(col(textCol)), " ").as("__ws"))
    bigramTableFromCounts(bigramCounts(docs, textCol),
      words.select(explode(col("__ws")).as("term"))
        .groupBy("term").agg(count(lit(1)).cast("long").as("c_term")),
      vocabTopK, dNum, dDen)
  }

  /** The corpus-scan side of [[bigramTable]]: raw adjacent-pair counts
    * (w1, w2, c_bigram) — one map-only explode + one hash agg. Exposed so
    * a mergeable count store ([[graft.data.LmStore]]) can persist exactly
    * these rows per batch and refit without rescanning text. */
  def bigramCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.filter(col(textCol).isNotNull)
      .select(split(trim(col(textCol)), " ").as("__ws"))
      .filter(size(col("__ws")) >= 2)
      .select(explode(expr(
        """transform(sequence(1, size(__ws) - 1),
           i -> named_struct('w1', element_at(__ws, i),
                             'w2', element_at(__ws, i + 1)))""")).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .groupBy("w1", "w2")
      .agg(count(lit(1)).cast("long").as("c_bigram"))

  /** [[bigramTable]] from PRE-AGGREGATED counts: `bc` = (w1, w2,
    * c_bigram) bigram counts, `tokCounts` = (term, c_term) unigram
    * counts. Every KN quantity (marginals, continuation counts, vocab)
    * is a pure function of these two integer relations, so a table fit
    * from a mergeable count store is bit-identical to a fit from the
    * corpus scan — the [[graft.ann.GramStore]] store⇒refit contract at
    * LM order. */
  def bigramTableFromCounts(bc0: DataFrame, tokCounts: DataFrame,
                            vocabTopK: Int = 100, dNum: Int = 3,
                            dDen: Int = 4): DataFrame = {
    require(vocabTopK >= 1 && dNum >= 0 && dDen >= 1 && dNum < dDen,
      s"need 0 <= D = $dNum/$dDen < 1 and vocabTopK >= 1")
    val d38 = "decimal(38,0)"
    val bc = bc0.select(col("w1"), col("w2"),
      col("c_bigram").cast("long").as("c_bigram"))
    val leftM = bc.groupBy("w1")
      .agg(sum("c_bigram").cast("long").as("c_left"),
        count(lit(1)).cast("long").as("n_follow"))
    val rightM = bc.groupBy("w2")
      .agg(count(lit(1)).cast("long").as("n_precede"))
    val types = bc.agg(count(lit(1)).cast("long").as("__btypes"))
    val vocab = tokCounts
      .select(col("term"), col("c_term").cast("long").as("__tc"))
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

  /** Raw adjacent-triple counts (w1, w2, w3, c_trigram) — one map-only
    * explode + one hash agg, the trigram sibling of [[bigramCounts]].
    * Every quantity of the trigram model is a pure function of this one
    * integer relation, so it is also the only thing a count store needs
    * to persist for a trigram refit. */
  def trigramCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.filter(col(textCol).isNotNull)
      .select(split(trim(col(textCol)), " ").as("__ws"))
      .filter(size(col("__ws")) >= 3)
      .select(explode(expr(
        """transform(sequence(1, size(__ws) - 2),
           i -> named_struct('w1', element_at(__ws, i),
                             'w2', element_at(__ws, i + 1),
                             'w3', element_at(__ws, i + 2)))""")).as("t"))
      .select(col("t.w1").as("w1"), col("t.w2").as("w2"),
        col("t.w3").as("w3"))
      .groupBy("w1", "w2", "w3")
      .agg(count(lit(1)).cast("long").as("c_trigram"))

  /** Interpolated Kneser–Ney TRIGRAM table (Chen & Goodman's recursive
    * interpolated form, one declared rational discount D = dNum/dDen at
    * every level) — [[bigramTable]] carried one order up, completing the
    * LM family at the order real quality filters run:
    *
    *   P₃(w₃|w₁w₂) = max(c(w₁w₂w₃)−D, 0)/c(w₁w₂·) + λ₃(w₁w₂)·P₂(w₃|w₂)
    *   λ₃(w₁w₂)    = D·N₁₊(w₁w₂·)/c(w₁w₂·)
    *   P₂(w₃|w₂)   = max(N₁₊(·w₂w₃)−D, 0)/N₁₊(·w₂·) + λ₂(w₂)·P₁(w₃)
    *   λ₂(w₂)      = D·|{w₃ : N₁₊(·w₂w₃)>0}|/N₁₊(·w₂·)
    *   P₁(w₃)      = N₁₊(·w₃)/N₁₊(··)
    *
    * DECLARED convention: every lower-order count derives from the
    * TRIGRAM TYPE RELATION (the canonical modified-count rule — the
    * middle level sees continuation counts N₁₊(·w₂w₃), the unigram level
    * distinct-middle counts |{w₂ : (·,w₂,w₃) observed}| over the same
    * relation), so the whole table is a pure function of one integer
    * relation ([[trigramCounts]]) and refits from a count store without
    * any text rescan.
    *
    * Exact-integer oracle discipline, quantize-once-per-piece: each of
    * the five pieces is its own q9 floor; the two interpolations replay
    * the QUANTIZED pieces (p2_q9 = t2_q9 + λ2_q9·p1_q9 div 10⁹,
    * kn3_q9 = t1_q9 + λ3_q9·p2_q9 div 10⁹) — both engines bit-identical.
    * Emitted for observed trigrams with all three words in the
    * top-`vocabTopK` unigram vocabulary (TakeOrdered, never a global
    * window). Plan: one explode, one (w₁,w₂,w₃) hash agg, four marginal
    * re-aggs of the COLLAPSED type relation, broadcast vocab semi-joins —
    * cost past the first agg scales with trigram types, not corpus size.
    */
  def trigramTable(docs: DataFrame, textCol: String,
                   vocabTopK: Int = 100, dNum: Int = 3,
                   dDen: Int = 4): DataFrame = {
    val words = docs.filter(col(textCol).isNotNull)
      .select(split(trim(col(textCol)), " ").as("__ws"))
    trigramTableFromCounts(trigramCounts(docs, textCol),
      words.select(explode(col("__ws")).as("term"))
        .groupBy("term").agg(count(lit(1)).cast("long").as("c_term")),
      vocabTopK, dNum, dDen)
  }

  /** [[trigramTable]] from PRE-AGGREGATED counts — the
    * [[bigramTableFromCounts]] contract at trigram order: `tc0` =
    * (w1, w2, w3, c_trigram), `tokCounts` = (term, c_term); a table fit
    * from a mergeable count store is bit-identical to a fit from the
    * corpus scan. */
  def trigramTableFromCounts(tc0: DataFrame, tokCounts: DataFrame,
                             vocabTopK: Int = 100, dNum: Int = 3,
                             dDen: Int = 4): DataFrame = {
    require(vocabTopK >= 1 && dNum >= 0 && dDen >= 1 && dNum < dDen,
      s"need 0 <= D = $dNum/$dDen < 1 and vocabTopK >= 1")
    val d38 = "decimal(38,0)"
    val tc = tc0.select(col("w1"), col("w2"), col("w3"),
      col("c_trigram").cast("long").as("c_trigram"))
    // ctx: raw context mass + follow-type count (the top-level pieces)
    val ctx = tc.groupBy("w1", "w2")
      .agg(sum("c_trigram").cast("long").as("c_ctx"),
        count(lit(1)).cast("long").as("n_follow_ctx"))
    // cont: N1+(.w2w3) — distinct left contexts per (w2,w3) type
    val cont = tc.groupBy("w2", "w3")
      .agg(count(lit(1)).cast("long").as("n1p_cont"))
    // mid: N1+(.w2.) mass + |{w3 : cont>0}| follow types per w2
    val mid = cont.groupBy("w2")
      .agg(sum("n1p_cont").cast("long").as("n1p_mid"),
        count(lit(1)).cast("long").as("n_follow_mid"))
    // uni: N1+(.w3) distinct-middle count per w3; total = (w2,w3) types
    val uni = cont.groupBy("w3").agg(count(lit(1)).cast("long").as("n1p_uni"))
    val total = cont.agg(count(lit(1)).cast("long").as("__n1p_total"))
    val vocab = tokCounts
      .select(col("term"), col("c_term").cast("long").as("__tc"))
      .orderBy(col("__tc").desc, col("term").asc)
      .limit(vocabTopK)
      .select("term")
    tc
      .join(broadcast(vocab.withColumnRenamed("term", "w1")), Seq("w1"),
        "left_semi")
      .join(broadcast(vocab.withColumnRenamed("term", "w2")), Seq("w2"),
        "left_semi")
      .join(broadcast(vocab.withColumnRenamed("term", "w3")), Seq("w3"),
        "left_semi")
      .join(ctx, Seq("w1", "w2"))
      .join(cont, Seq("w2", "w3"))
      .join(mid, "w2")
      .join(uni, "w3")
      .crossJoin(broadcast(total))
      .withColumn("t1_q9",
        greatest(lit(0L), expr(
          s"""CAST((CAST($dDen AS $d38) * c_trigram - $dNum) * 1000000000
              div (CAST($dDen AS $d38) * c_ctx) AS BIGINT)""")))
      .withColumn("lam3_q9",
        expr(s"""CAST(CAST($dNum AS $d38) * n_follow_ctx * 1000000000
                 div (CAST($dDen AS $d38) * c_ctx) AS BIGINT)"""))
      .withColumn("t2_q9",
        greatest(lit(0L), expr(
          s"""CAST((CAST($dDen AS $d38) * n1p_cont - $dNum) * 1000000000
              div (CAST($dDen AS $d38) * n1p_mid) AS BIGINT)""")))
      .withColumn("lam2_q9",
        expr(s"""CAST(CAST($dNum AS $d38) * n_follow_mid * 1000000000
                 div (CAST($dDen AS $d38) * n1p_mid) AS BIGINT)"""))
      .withColumn("p1_q9",
        expr(s"""CAST(CAST(n1p_uni AS $d38) * 1000000000
                 div __n1p_total AS BIGINT)"""))
      .withColumn("p2_q9",
        expr(s"""CAST(t2_q9 + CAST(lam2_q9 AS $d38) * p1_q9
                 div 1000000000 AS BIGINT)"""))
      .withColumn("kn3_q9",
        expr(s"""CAST(t1_q9 + CAST(lam3_q9 AS $d38) * p2_q9
                 div 1000000000 AS BIGINT)"""))
      .select("w1", "w2", "w3", "c_trigram", "c_ctx", "n_follow_ctx",
        "n1p_cont", "n1p_mid", "n_follow_mid", "n1p_uni",
        "t1_q9", "lam3_q9", "t2_q9", "lam2_q9", "p1_q9", "p2_q9", "kn3_q9")
  }

  /** Per-document TRIGRAM log-probability against a fitted
    * [[trigramTable]] — [[scoreDocs]] carried one order up, with the full
    * interpolated-KN backoff CASCADE (DECLARED, every price replaying
    * the table's quantized q9 pieces):
    *
    *  1. observed trigram (a table row):        p = kn3_q9
    *  2. unseen trigram, observed context w₁w₂ and observed
    *     continuation w₂w₃:                     p = λ₃(w₁w₂)·p₂(w₂w₃)/10⁹
    *  3. unobserved context, observed w₂w₃:     p = p₂(w₂w₃)
    *     (c(w₁w₂·) = 0 ⇒ the trigram level contributes nothing and the
    *     model IS the bigram-continuation level — the standard KN
    *     zero-context rule)
    *  4. unseen w₂w₃ but w₂ has a λ₂ row and w₃ a P₁ row: the bigram
    *     level itself backs off — p₂ᵇ = λ₂(w₂)·p₁(w₃)/10⁹, then rule 2
    *     or 3 applies with p₂ᵇ in place of p₂
    *  5. anything else: the triple is SKIPPED and counted in
    *     n_oov_triples (the q402 CCNet convention).
    *
    * Priced probabilities are floored at one q9 grain; ln rounded to 9,
    * summed DECIMAL(20,9) (order-independent); docs with no priceable
    * triple preserved with n_scored = 0. The four marginal projections
    * (λ₃ by context, p₂ by continuation, λ₂ by w₂, p₁ by w₃ — each a
    * constant per its key, so max = the value) are vocab-bounded
    * broadcasts; the only data-sized shuffle is the per-doc agg.
    */
  def scoreDocsTrigram(docs: DataFrame, table: DataFrame, textCol: String,
                       idCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val tbl = table.localCheckpoint()
    val lam3 = tbl.groupBy("w1", "w2").agg(max("lam3_q9").as("lam3_q9"))
    val p2 = tbl.groupBy("w2", "w3").agg(max("p2_q9").as("p2_q9"))
    val lam2 = tbl.groupBy("w2").agg(max("lam2_q9").as("lam2_q9"))
    val p1 = tbl.groupBy("w3").agg(max("p1_q9").as("p1_q9"))
    val triples = docs.filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        split(trim(col(textCol)), " ").as("__ws"))
      .filter(size(col("__ws")) >= 3)
      .select(col("doc_id"), explode(expr(
        """transform(sequence(1, size(__ws) - 2),
           i -> named_struct('w1', element_at(__ws, i),
                             'w2', element_at(__ws, i + 1),
                             'w3', element_at(__ws, i + 2)))""")).as("t"))
      .select(col("doc_id"), col("t.w1").as("w1"), col("t.w2").as("w2"),
        col("t.w3").as("w3"))
    val priced = triples
      .join(broadcast(tbl.select("w1", "w2", "w3", "kn3_q9")),
        Seq("w1", "w2", "w3"), "left_outer")
      .join(broadcast(lam3), Seq("w1", "w2"), "left_outer")
      .join(broadcast(p2), Seq("w2", "w3"), "left_outer")
      .join(broadcast(lam2), Seq("w2"), "left_outer")
      .join(broadcast(p1), Seq("w3"), "left_outer")
      // effective bigram level: observed p2, else the λ2·p1 backoff
      .withColumn("__p2e",
        coalesce(col("p2_q9"),
          when(col("lam2_q9").isNotNull && col("p1_q9").isNotNull,
            expr(s"""CAST(CAST(lam2_q9 AS $d38) * p1_q9
                     div 1000000000 AS BIGINT)"""))))
      .withColumn("__p0",
        when(col("kn3_q9").isNotNull, col("kn3_q9"))
          .otherwise(when(col("__p2e").isNotNull,
            when(col("lam3_q9").isNotNull,
              expr(s"""CAST(CAST(lam3_q9 AS $d38) * __p2e
                       div 1000000000 AS BIGINT)"""))
              .otherwise(col("__p2e")))))
      .withColumn("p_q9",
        when(col("__p0").isNotNull, greatest(lit(1L), col("__p0"))))
      .withColumn("lp", when(col("p_q9").isNotNull,
        round(log(col("p_q9").cast("double") / 1e9), 9)
          .cast("decimal(20,9)")))
    val agg = priced.groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_triples"),
        sum(when(col("p_q9").isNotNull, 1L).otherwise(0L)).cast("long")
          .as("n_scored"),
        sum(when(col("p_q9").isNull, 1L).otherwise(0L)).cast("long")
          .as("n_oov_triples"),
        sum(col("lp")).as("__sum"))
    docs.select(col(idCol).as("doc_id")).distinct()
      .join(agg, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("n_triples"), lit(0L)).as("n_triples"),
        coalesce(col("n_scored"), lit(0L)).as("n_scored"),
        coalesce(col("n_oov_triples"), lit(0L)).as("n_oov_triples"),
        col("__sum").cast("double").as("sum_logprob"))
      .withColumn("mean_logprob",
        when(col("n_scored") > 0,
          col("sum_logprob") / col("n_scored").cast("double")))
  }

  /** Per-document bigram log-probability against a fitted
    * [[bigramTable]] — the consumer the table exists for (the bigram
    * sibling of q79's CCNet-style unigram quality filter): every
    * adjacent token pair of a doc is priced by the model and the doc
    * scored by its exact fixed-point log-prob sum.
    *
    * Pair pricing (DECLARED, all on the table's quantized q9 pieces):
    *  - observed pair (a table row): p_q9 = kn_q9;
    *  - unseen pair with both words known to the model (w1 has a λ row,
    *    w2 a P_cont row): the interpolated-KN backoff
    *    p_q9 = λ_q9·pcont_q9 div 10⁹ — replaying the QUANTIZED pieces,
    *    so both engines agree bit-for-bit;
    *  - either word outside the model: the pair is SKIPPED and counted
    *    in n_oov_pairs (the CCNet convention — OOV mass is reported,
    *    never priced at −∞).
    * Priced probabilities are floored at one q9 grain so ln stays
    * finite. Per-pair ln(p_q9/10⁹) is rounded to 9 and summed as
    * DECIMAL(20,9) — q79's fixed-point discipline, so the doc score is
    * independent of summation order. Docs with no priceable pair
    * (< 2 tokens, all-OOV, null text) are preserved with n_scored = 0
    * and NULL sum/mean.
    *
    * Scale shape: the table and its two marginal projections are
    * vocab²-/vocab-bounded → broadcast joins against the map-only pair
    * stream; the only data-sized shuffle is the per-doc hash agg. The
    * table is frozen once (localCheckpoint) because three consumers
    * read it (the pair join and both marginals).
    */
  def scoreDocs(docs: DataFrame, table: DataFrame, textCol: String,
                idCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val tbl = table.localCheckpoint()
    // λ is a function of w1 only and P_cont of w2 only: max = the value
    val lam = tbl.groupBy("w1").agg(max("lambda_q9").as("lambda_q9"))
    val pcont = tbl.groupBy("w2").agg(max("pcont_q9").as("pcont_q9"))
    val withWs = docs.filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        split(trim(col(textCol)), " ").as("__ws"))
    val pairs = withWs
      .filter(size(col("__ws")) >= 2)
      .select(col("doc_id"), explode(expr(
        """transform(sequence(1, size(__ws) - 1),
           i -> named_struct('w1', element_at(__ws, i),
                             'w2', element_at(__ws, i + 1)))""")).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val priced = pairs
      .join(broadcast(tbl.select("w1", "w2", "kn_q9")), Seq("w1", "w2"),
        "left_outer")
      .join(broadcast(lam), Seq("w1"), "left_outer")
      .join(broadcast(pcont), Seq("w2"), "left_outer")
      .withColumn("__p0",
        when(col("kn_q9").isNotNull, col("kn_q9"))
          .otherwise(when(
            col("lambda_q9").isNotNull && col("pcont_q9").isNotNull,
            expr(s"""CAST(CAST(lambda_q9 AS $d38) * pcont_q9
                     div 1000000000 AS BIGINT)"""))))
      .withColumn("p_q9",
        when(col("__p0").isNotNull, greatest(lit(1L), col("__p0"))))
      .withColumn("lp", when(col("p_q9").isNotNull,
        round(log(col("p_q9").cast("double") / 1e9), 9)
          .cast("decimal(20,9)")))
    val agg = priced.groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_pairs"),
        sum(when(col("p_q9").isNotNull, 1L).otherwise(0L)).cast("long")
          .as("n_scored"),
        sum(when(col("p_q9").isNull, 1L).otherwise(0L)).cast("long")
          .as("n_oov_pairs"),
        sum(col("lp")).as("__sum"))
    docs.select(col(idCol).as("doc_id")).distinct()
      .join(agg, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        coalesce(col("n_scored"), lit(0L)).as("n_scored"),
        coalesce(col("n_oov_pairs"), lit(0L)).as("n_oov_pairs"),
        col("__sum").cast("double").as("sum_logprob"))
      .withColumn("mean_logprob",
        when(col("n_scored") > 0,
          col("sum_logprob") / col("n_scored").cast("double")))
  }
}
