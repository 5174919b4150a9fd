package graft

import org.apache.spark.sql.functions._

/** Round-12 session-2 hand-value units for the new exact-integer kernels:
  * Fleiss' kappa, Cochran's Q, Cochran–Mantel–Haenszel, concentration
  * (Gini/HHI), and Chao1/Good–Turing coverage — every expected literal
  * derived by hand from the documented rational formulas.
  */
class Round12bSpec extends SparkSpec {

  test("Agreement.fleissKappa hand values: 3 items x 3 raters, kappa " +
      "exactly 0.55 via the all-integer (AD-CB)/(B(D-C)) identity") {
    val s = spark
    import s.implicits._
    // item1: A,A,A  item2: A,A,B  item3: B,B,B
    val ann = Seq((1L, "A"), (1L, "A"), (1L, "A"),
      (2L, "A"), (2L, "A"), (2L, "B"),
      (3L, "B"), (3L, "B"), (3L, "B")).toDF("item", "cat")
    val got = graft.data.Agreement.fleissKappa(ann, "item", "cat")
      .collect().head
    // A = 6+2+6 = 14, B = 3·3·2 = 18, C = 5²+4² = 41, D = 9² = 81
    assert(got.getAs[Long]("n_items") === 3L)
    assert(got.getAs[Long]("n_raters") === 3L)
    assert(got.getAs[Long]("n_categories") === 2L)
    assert(got.getAs[Long]("po_ppm") === 777777L)   // 14e6 div 18
    assert(got.getAs[Long]("pe_ppm") === 506172L)   // 41e6 div 81
    // kappa = (14·81 − 41·18)/(18·(81−41)) = 396/720 = 0.55 exactly
    assert(got.getAs[Long]("kappa_x1e6") === 550000L)
  }

  test("Agreement.fleissKappa: a ragged panel (unequal ratings per item) " +
      "fails loudly instead of silently mis-weighting") {
    val s = spark
    import s.implicits._
    val ann = Seq((1L, "A"), (1L, "B"), (2L, "A"))
      .toDF("item", "cat")
    val e = intercept[Exception] {
      graft.data.Agreement.fleissKappa(ann, "item", "cat").collect()
    }
    assert(Round12Spec.msgs(e).exists(_.contains("ragged panel")))
  }

  test("Agreement.cochranQ hand values: 4 subjects x 3 conditions, " +
      "Q = 2(3·14 - 36)/(3·6 - 14) = 3.0 exactly") {
    val s = spark
    import s.implicits._
    val df = Seq((1, 1, 0), (1, 0, 0), (1, 1, 1), (0, 0, 0))
      .toDF("c1", "c2", "c3")
    val got = graft.data.Agreement.cochranQ(df,
      Seq(col("c1"), col("c2"), col("c3"))).collect().head
    assert(got.getAs[Long]("n_subjects") === 4L)
    assert(got.getAs[Long]("k_conditions") === 3L)
    assert(got.getAs[Long]("t_total") === 6L)
    assert(got.getAs[Long]("sum_r2") === 14L)
    assert(got.getAs[Long]("sum_c2") === 14L)
    assert(got.getAs[Long]("q_ppm") === 3000000L)
  }

  test("Agreement.cochranQ degenerate: every subject all-0 or all-1 " +
      "(no discordance) => NULL statistic, not a division error") {
    val s = spark
    import s.implicits._
    val df = Seq((1, 1, 1), (0, 0, 0)).toDF("c1", "c2", "c3")
    val got = graft.data.Agreement.cochranQ(df,
      Seq(col("c1"), col("c2"), col("c3"))).collect().head
    assert(got.isNullAt(got.fieldIndex("q_ppm")))
  }

  test("Contingency.cmh hand values: two 8-subject strata, chi2 " +
      "875000 ppm and pooled MH odds ratio exactly 2.6") {
    val s = spark
    import s.implicits._
    def rows(st: Long, e: Int, y: Int, k: Int) =
      Seq.fill(k)((st, e, y))
    // stratum 1: a=3 b=1 c=1 d=3; stratum 2: a=b=c=d=2
    val df = (rows(1L, 1, 1, 3) ++ rows(1L, 1, 0, 1) ++
      rows(1L, 0, 1, 1) ++ rows(1L, 0, 0, 3) ++
      rows(2L, 1, 1, 2) ++ rows(2L, 1, 0, 2) ++
      rows(2L, 0, 1, 2) ++ rows(2L, 0, 0, 2))
      .toDF("stratum", "exposure", "outcome")
    val got = graft.data.Contingency.cmh(df, "stratum", "exposure",
      "outcome").collect().head
    assert(got.getAs[Long]("k_strata") === 2L)
    assert(got.getAs[Long]("sum_a") === 5L)
    // E = 2 + 2 (q9), V = 256e9 div 448 twice
    assert(got.getAs[Long]("e_sum_q9") === 4000000000L)
    assert(got.getAs[Long]("v_sum_q9") === 1142857142L)
    // chi2 = (5−4)²/1.142857142 → 875000 ppm (floor)
    assert(got.getAs[Long]("chi2_ppm") === 875000L)
    // R = 9/8 + 4/8, S = 1/8 + 4/8 → OR = 13/5 = 2.6
    assert(got.getAs[Long]("r_sum_q9") === 1625000000L)
    assert(got.getAs[Long]("s_sum_q9") === 625000000L)
    assert(got.getAs[Long]("or_mh_q9") === 2600000000L)
  }

  test("Contingency.cmh degenerate: one single-subject stratum gets " +
      "V = 0 and contributes only its E increment") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 1, 1)).toDF("stratum", "exposure", "outcome")
    val got = graft.data.Contingency.cmh(df, "stratum", "exposure",
      "outcome").collect().head
    assert(got.getAs[Long]("v_sum_q9") === 0L)
    assert(got.isNullAt(got.fieldIndex("chi2_ppm")))
    assert(got.isNullAt(got.fieldIndex("or_mh_q9")))
  }

  test("Concentration.giniHhi hand values: weights 1,1,2,4 => gini " +
      "312500 ppm, hhi 343750 ppm, top1 500000 ppm") {
    val s = spark
    import s.implicits._
    val per = Seq(("a", 1L), ("b", 1L), ("c", 2L), ("d", 4L))
      .toDF("k", "w")
    val got = graft.data.Concentration.giniHhi(per, "k", "w")
      .collect().head
    assert(got.getAs[Long]("n_keys") === 4L)
    assert(got.getAs[Long]("total_weight") === 8L)
    // (2·25 − 5·8)·1e6 div (4·8) = 10e6 div 32
    assert(got.getAs[Long]("gini_ppm") === 312500L)
    // 22·1e6 div 64
    assert(got.getAs[Long]("hhi_ppm") === 343750L)
    assert(got.getAs[Long]("top1_share_ppm") === 500000L)
  }

  test("Concentration.giniHhi: equal weights => gini 0, hhi = 1e6/n " +
      "(the perfectly-mixed corpus reads as no concentration)") {
    val s = spark
    import s.implicits._
    val per = Seq(("a", 5L), ("b", 5L), ("c", 5L), ("d", 5L))
      .toDF("k", "w")
    val got = graft.data.Concentration.giniHhi(per, "k", "w")
      .collect().head
    assert(got.getAs[Long]("gini_ppm") === 0L)
    assert(got.getAs[Long]("hhi_ppm") === 250000L)
    assert(got.getAs[Long]("top1_share_ppm") === 250000L)
  }

  test("Contingency.bowker hand values: 3 discordant pairs, chi2 " +
      "exactly 3.0 ppm-scaled; diagonal mass ignored") {
    val s = spark
    import s.implicits._
    val df = (Seq.fill(3)((1L, 2L)) ++ Seq((2L, 1L)) ++
      Seq.fill(2)((3L, 1L)) ++ Seq((2L, 3L), (3L, 2L)) ++
      Seq.fill(2)((1L, 1L))).toDF("before", "after")
    val got = graft.data.Contingency.bowker(df, "before", "after")
      .collect().head
    assert(got.getAs[Long]("n_pairs") === 10L)
    assert(got.getAs[Long]("n_discordant") === 8L)
    assert(got.getAs[Long]("dof") === 3L)
    // {1,2}: (3−1)²/4 = 1; {1,3}: (0−2)²/2 = 2; {2,3}: (1−1)²/2 = 0
    assert(got.getAs[Long]("bowker_ppm") === 3000000L)
  }

  test("Contingency.bowker degenerate: perfectly symmetric (or all-" +
      "diagonal) labels => statistic 0 with dof counting discordant pairs") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 1L), (2L, 2L), (1L, 2L), (2L, 1L))
      .toDF("before", "after")
    val got = graft.data.Contingency.bowker(df, "before", "after")
      .collect().head
    assert(got.getAs[Long]("bowker_ppm") === 0L)
    assert(got.getAs[Long]("dof") === 1L)
  }

  test("Agreement.weightedKappa hand values: linear weights, kappa_w " +
      "= (34 - 6·3)/34 exactly (floor to 470588 x1e6)") {
    val s = spark
    import s.implicits._
    val df = Seq((0L, 0L), (0L, 0L), (1L, 1L), (2L, 2L), (0L, 2L),
      (2L, 1L)).toDF("ra", "rb")
    val got = graft.data.Agreement.weightedKappa(df, "ra", "rb")
      .collect().head
    assert(got.getAs[Long]("n_pairs") === 6L)
    assert(got.getAs[Long]("w_obs") === 3L)
    assert(got.getAs[Long]("w_exp") === 34L)
    assert(got.getAs[Long]("kappa_w_x1e6") === 470588L)
  }

  test("Agreement.weightedKappa degenerate: a constant rater => w_exp 0 " +
      "=> NULL (no expected disagreement to normalize by)") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 1L), (1L, 2L)).toDF("ra", "rb")
    val got = graft.data.Agreement.weightedKappa(df, "ra", "rb")
      .collect().head
    // ra constant: every |i−j| weight pairs ra=1 with rb margins —
    // w_exp = 2·(|1−1|·1 + |1−2|·1) = 2 > 0 here, so use BOTH constant
    val df2 = Seq((1L, 1L), (1L, 1L)).toDF("ra", "rb")
    val got2 = graft.data.Agreement.weightedKappa(df2, "ra", "rb")
      .collect().head
    assert(got2.isNullAt(got2.fieldIndex("kappa_w_x1e6")))
    assert(got.getAs[Long]("w_exp") === 2L)
  }

  test("Agreement.krippendorffAlpha hand values: ragged panel, items " +
      "with <2 ratings dropped, alpha exactly 1/3 (floor 333333)") {
    val s = spark
    import s.implicits._
    val ann = Seq((1L, "A"), (1L, "A"), (1L, "B"),
      (2L, "B"), (2L, "B"), (3L, "A")).toDF("item", "cat")
    val got = graft.data.Agreement.krippendorffAlpha(ann, "item", "cat")
      .collect().head
    assert(got.getAs[Long]("n_items_kept") === 2L)   // item 3 dropped
    assert(got.getAs[Long]("n_ratings") === 5L)
    assert(got.getAs[Long]("n_categories") === 2L)
    assert(got.getAs[Long]("do_sum_q9") === 2000000000L) // 4e9 div 2
    assert(got.getAs[Long]("de_pairs") === 12L)      // 2·3 + 3·2
    // alpha = 1 − (1/5·2)/(12/20) = 1/3
    assert(got.getAs[Long]("alpha_x1e6") === 333333L)
  }

  test("Agreement.krippendorffAlpha: systematic disagreement goes " +
      "NEGATIVE via the sign-split division (alpha = -0.5)") {
    val s = spark
    import s.implicits._
    val ann = Seq((1L, "A"), (1L, "B"), (2L, "A"), (2L, "B"))
      .toDF("item", "cat")
    val got = graft.data.Agreement.krippendorffAlpha(ann, "item", "cat")
      .collect().head
    assert(got.getAs[Long]("alpha_x1e6") === -500000L)
  }

  test("q342 chao1 identities on tiny corpora: f2>0 classic form, f2=0 " +
      "bias-corrected form, Good-Turing mass = f1/N") {
    val s = spark
    import s.implicits._
    def run(texts: Seq[String]) = {
      val dir = java.nio.file.Files
        .createTempDirectory("graft_chao1").toString
      texts.zipWithIndex
        .map { case (t, i) =>
          (i.toLong, t, "en", "src", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite")
        .parquet(s"$dir/documents.parquet")
      graft.queries.TextQueries.queries("q342_chao1_coverage")(s, dir)
        .collect().head
    }
    // tokens a b c c d d d: D=4 N=7 f1=2 f2=1 → chao1 = 4e6 + 2e6
    val g1 = run(Seq("a b c c", "d d d"))
    assert(g1.getAs[Long]("chao1_x1e6") === 6000000L)
    assert(g1.getAs[Long]("unseen_mass_ppm") === 285714L) // 2e6 div 7
    assert(g1.getAs[Long]("coverage_ppm") === 714286L)
    // tokens a b: D=2 f1=2 f2=0 → bias-corrected 2e6 + 2·1·1e6/(2·1)
    val g2 = run(Seq("a b"))
    assert(g2.getAs[Long]("chao1_x1e6") === 3000000L)
  }
}
