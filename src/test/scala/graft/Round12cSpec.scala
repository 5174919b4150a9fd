package graft

import org.apache.spark.sql.functions._

/** Round-12 session-3 hand-value units for the rank-test / series-stat
  * kernels: Kruskal–Wallis, Friedman + Kendall's W, Cliff's delta, the
  * Wald–Wolfowitz runs test, lag-k autocorrelation, and the index of
  * dispersion — every expected literal derived by hand from the documented
  * rational formulas (doubled midranks, cross-multiplied integer
  * quotients).
  */
class Round12cSpec extends SparkSpec {

  test("RankTests.kruskalWallisFromCounts hand values: A=[1,2,2] vs " +
      "B=[2,3,3], tie-corrected H = 2.7222 exactly in ppm") {
    val s = spark
    import s.implicits._
    val cells = Seq(("A", 1L, 1L), ("A", 2L, 2L),
      ("B", 2L, 1L), ("B", 3L, 2L)).toDF("g", "v", "c")
    val got = graft.data.RankTests.kruskalWallisFromCounts(cells)
      .collect().head
    // doubled midranks: v=1 → 2, v=2 → 6 (ranks 2,3,4 avg 3), v=3 → 11
    // R2_A = 2+12 = 14, R2_B = 6+22 = 28; dev = ±7 with N+1 = 7
    // W2 = 1·25 + 3·1 + 2·16 = 60; b2_q9 = 2·(49e9 div 3) = 32666666666
    assert(got.getAs[Long]("n_total") === 6L)
    assert(got.getAs[Long]("k_groups") === 2L)
    assert(got.getAs[String]("w2_den") === "60")
    assert(got.getAs[String]("b2_q9") === "32666666666")
    // H = 5·32666666666 div 60000 = 2722222 ppm (= 2.7222, the
    // textbook tie-corrected value for this design)
    assert(got.getAs[Long]("h_ppm") === 2722222L)
  }

  test("RankTests.kruskalWallisFromCounts degenerate: one shared value " +
      "ranks everything identically, W = 0, H NULL") {
    val s = spark
    import s.implicits._
    val cells = Seq(("A", 5L, 3L), ("B", 5L, 4L)).toDF("g", "v", "c")
    val got = graft.data.RankTests.kruskalWallisFromCounts(cells)
      .collect().head
    assert(got.getAs[String]("w2_den") === "0")
    assert(got.isNullAt(got.fieldIndex("h_ppm")))
  }

  test("RankTests.friedman hand values: 3 blocks x 3 treatments, " +
      "chi2 = 2/3 and Kendall's W = 1/9 exactly in ppm") {
    val s = spark
    import s.implicits._
    val obs = Seq(
      (1L, "t1", 10L), (1L, "t2", 20L), (1L, "t3", 30L),
      (2L, "t1", 10L), (2L, "t2", 20L), (2L, "t3", 30L),
      (3L, "t1", 30L), (3L, "t2", 20L), (3L, "t3", 10L))
      .toDF("blk", "treat", "val")
    val got = graft.data.RankTests.friedman(obs, "blk", "treat", "val")
      .collect().head
    // doubled ranks per block: 2,4,6; R2 = (10, 12, 14), b(k+1) = 12
    // B2 = 4+0+4 = 8; W2 = 3·((−2)²+0+2²) = 24
    assert(got.getAs[Long]("b_blocks") === 3L)
    assert(got.getAs[Long]("k_treatments") === 3L)
    assert(got.getAs[Long]("w2_den") === 24L)
    assert(got.getAs[Long]("chi2_ppm") === 666666L) // 2·8e6 div 24
    assert(got.getAs[Long]("w_ppm") === 111111L)    // 8e6 div (3·24)
  }

  test("RankTests.friedman midranks: within-block ties get doubled " +
      "average ranks that still sum to k(k+1) per block") {
    val s = spark
    import s.implicits._
    // block ranks: t1,t2 tie at 1.5 (doubled 3), t3 rank 3 (doubled 6)
    val obs = Seq(
      (1L, "t1", 10L), (1L, "t2", 10L), (1L, "t3", 30L),
      (2L, "t1", 10L), (2L, "t2", 20L), (2L, "t3", 30L))
      .toDF("blk", "treat", "val")
    val got = graft.data.RankTests.friedman(obs, "blk", "treat", "val")
      .collect().head
    // R2: t1 = 3+2 = 5, t2 = 3+4 = 7, t3 = 6+6 = 12; b(k+1) = 8
    // B2 = 9+1+16 = 26
    // W2: block1 (3−4)²·2 + (6−4)² = 6; block2 4+0+4 = 8 → 14
    assert(got.getAs[Long]("w2_den") === 14L)
    assert(got.getAs[Long]("chi2_ppm") === 3714285L) // 2·26e6 div 14
  }

  test("RankTests.friedman: a ragged panel (block missing a treatment) " +
      "fails loudly") {
    val s = spark
    import s.implicits._
    val obs = Seq(
      (1L, "t1", 10L), (1L, "t2", 20L),
      (2L, "t1", 10L)).toDF("blk", "treat", "val")
    val e = intercept[Exception] {
      graft.data.RankTests.friedman(obs, "blk", "treat", "val").collect()
    }
    assert(Round12Spec.msgs(e).exists(_.contains("ragged panel")))
  }

  test("RankTests.cliffsDeltaFromCounts hand values: A=[1,2,2] vs " +
      "B=[2,3]: delta = -2/3, partition identity holds") {
    val s = spark
    import s.implicits._
    val dom = Seq((1L, 1L, 0L), (2L, 2L, 1L), (3L, 0L, 1L))
      .toDF("v", "ca", "cb")
    val got = graft.data.RankTests.cliffsDeltaFromCounts(dom)
      .collect().head
    assert(got.getAs[Long]("n_a") === 3L)
    assert(got.getAs[Long]("n_b") === 2L)
    assert(got.getAs[Long]("n_gt") === 0L)
    assert(got.getAs[Long]("n_lt") === 4L)
    assert(got.getAs[Long]("n_tie") === 2L)
    assert(got.getAs[Boolean]("identity_ok"))
    assert(got.getAs[Long]("delta_x1e6") === -666666L) // −(4e6 div 6)
  }

  test("SeriesStats.runsTest hand values: 0,0,1,1,0 gives 3 runs, " +
      "z2 = 4/21 exactly in ppm; degenerates are NULL") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("a", 1L, 0), ("a", 2L, 0), ("a", 3L, 1), ("a", 4L, 1), ("a", 5L, 0),
      ("b", 1L, 1), ("b", 2L, 1),              // single-class → NULL
      ("c", 1L, 0), ("c", 2L, 1))              // 2n1n0 = n → NULL
      .toDF("k", "t", "x")
    val got = graft.data.SeriesStats
      .runsTest(df, Seq("k"), Seq("t"), "x")
      .collect().map(r => r.getAs[String]("k") -> r).toMap
    val a = got("a")
    assert(a.getAs[Long]("n") === 5L)
    assert(a.getAs[Long]("n1") === 2L)
    assert(a.getAs[Long]("n0") === 3L)
    assert(a.getAs[Long]("runs") === 3L)
    // (5·2 − 12)²·4·1e6 div (12·(12−5)) = 16e6 div 84 = 190476
    assert(a.getAs[Long]("z2_ppm") === 190476L)
    assert(got("b").isNullAt(got("b").fieldIndex("z2_ppm")))
    assert(got("c").isNullAt(got("c").fieldIndex("z2_ppm")))
  }

  test("SeriesStats.acf hand values: rising series +0.25, alternating " +
      "series -0.8 at lag 1 via the sign-split N2-cleared quotient") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("up", 1L, 1L), ("up", 2L, 2L), ("up", 3L, 3L), ("up", 4L, 4L),
      ("alt", 1L, 1L), ("alt", 2L, 2L), ("alt", 3L, 1L), ("alt", 4L, 2L),
      ("alt", 5L, 1L))
      .toDF("sid", "t", "x")
    val got = graft.data.SeriesStats.acf(df, Seq("sid"), "t", "x", 1)
      .collect().map(r => r.getAs[String]("sid") -> r).toMap
    // up: num = 16·20 − 4·10·15 + 3·100 = 20; den = 4·20 = 80 → 0.25
    assert(got("up").getAs[Long]("n_pairs") === 3L)
    assert(got("up").getAs[Long]("acf_x1e6") === 250000L)
    // alt: num = 25·8 − 5·7·12 + 4·49 = −24; den = 5·6 = 30 → −0.8
    assert(got("alt").getAs[Long]("acf_x1e6") === -800000L)
  }

  test("SeriesStats.acf degenerate: constant series (den = 0) and " +
      "series shorter than the lag are NULL") {
    val s = spark
    import s.implicits._
    val df = Seq(("c", 1L, 5L), ("c", 2L, 5L), ("c", 3L, 5L),
      ("s", 1L, 1L), ("s", 2L, 2L)).toDF("sid", "t", "x")
    val got = graft.data.SeriesStats.acf(df, Seq("sid"), "t", "x", 2)
      .collect().map(r => r.getAs[String]("sid") -> r).toMap
    assert(got("c").isNullAt(got("c").fieldIndex("acf_x1e6")))
    assert(got("s").getAs[Long]("n_pairs") === 0L)
    assert(got("s").isNullAt(got("s").fieldIndex("acf_x1e6")))
  }

  test("RankTests.jonckheereFromCounts hand values: A=[1,2] < B=[2,3] " +
      "gives 2J = 7 (one tie midcounted), z2 = 1.35 exactly in ppm") {
    val s = spark
    import s.implicits._
    val cells = Seq((1L, 1L, 1L), (1L, 2L, 1L),
      (2L, 2L, 1L), (2L, 3L, 1L)).toDF("g", "v", "c")
    val got = graft.data.RankTests.jonckheereFromCounts(cells)
      .collect().head
    // pairs: (1,2)<, (1,3)<, (2,2)=, (2,3)< → 2J = 2·3 + 1 = 7
    assert(got.getAs[Long]("n_total") === 4L)
    assert(got.getAs[Long]("k_groups") === 2L)
    assert(got.getAs[Long]("j2") === 7L)
    assert(got.getAs[Long]("e_j2") === 4L)   // n_A·n_B = 4
    // v72 = 16·11 − 2·(4·7) = 120; z² = (7−4)²·18e6 div 120 = 1350000
    assert(got.getAs[String]("v72") === "120")
    assert(got.getAs[Long]("z2_ppm") === 1350000L)
    assert(got.getAs[Boolean]("trend_up"))
  }

  test("RankTests.jonckheereFromCounts: a perfect 3-group staircase " +
      "counts every cross pair once (2J = 6)") {
    val s = spark
    import s.implicits._
    val cells = Seq((1L, 1L, 1L), (2L, 2L, 1L), (3L, 3L, 1L))
      .toDF("g", "v", "c")
    val got = graft.data.RankTests.jonckheereFromCounts(cells)
      .collect().head
    assert(got.getAs[Long]("j2") === 6L)
    assert(got.getAs[Long]("e_j2") === 3L)   // (9−3) div 2
    assert(got.getAs[String]("v72") === "66")   // 81 − 3·5
    assert(got.getAs[Long]("z2_ppm") === 2454545L) // 9·18e6 div 66
  }

  test("SeriesStats.durbinWatson hand values: rising [1,2,3,4] gives " +
      "DW = 0.6 exactly; a constant series is NULL") {
    val s = spark
    import s.implicits._
    val df = Seq(("r", 1L, 1L), ("r", 2L, 2L), ("r", 3L, 3L), ("r", 4L, 4L),
      ("c", 1L, 5L), ("c", 2L, 5L)).toDF("sid", "t", "x")
    val got = graft.data.SeriesStats
      .durbinWatson(df, Seq("sid"), "t", "x")
      .collect().map(r => r.getAs[String]("sid") -> r).toMap
    // Σd² = 3, n·Q − S² = 120 − 100 = 20 → 4·3e6 div 20 = 600000
    assert(got("r").getAs[Long]("dw_ppm") === 600000L)
    assert(got("c").isNullAt(got("c").fieldIndex("dw_ppm")))
  }

  test("SeriesStats.turningPoints hand values: [1,3,2,4,3] has 3 strict " +
      "extrema (z2 = 90/51); a plateau is NOT an extremum") {
    val s = spark
    import s.implicits._
    val df = Seq(("a", 1L, 1L), ("a", 2L, 3L), ("a", 3L, 2L),
      ("a", 4L, 4L), ("a", 5L, 3L),
      ("p", 1L, 1L), ("p", 2L, 2L), ("p", 3L, 2L), ("p", 4L, 1L))
      .toDF("sid", "t", "x")
    val got = graft.data.SeriesStats
      .turningPoints(df, Seq("sid"), "t", "x")
      .collect().map(r => r.getAs[String]("sid") -> r).toMap
    val a = got("a")
    assert(a.getAs[Long]("turning_points") === 3L)
    // (3·3 − 2·3)²·10⁷ div (16·5 − 29) = 9e7 div 51 = 1764705
    assert(a.getAs[Long]("z2_ppm") === 1764705L)
    val p = got("p")
    assert(p.getAs[Long]("turning_points") === 0L)
    // (0 − 2·2)²·10⁷ div 35 = 16e7 div 35 = 4571428
    assert(p.getAs[Long]("z2_ppm") === 4571428L)
  }

  test("RankTests.pageTrend hand values: one block ranked 1<2<3 in " +
      "treatment order gives L2 = 28, z2 = 2.0 exactly") {
    val s = spark
    import s.implicits._
    val obs = Seq((1L, 1L, 10L), (1L, 2L, 20L), (1L, 3L, 30L))
      .toDF("blk", "tr", "v")
    val got = graft.data.RankTests.pageTrend(obs, "blk", "tr", "v")
      .collect().head
    assert(got.getAs[Long]("l2") === 28L)   // 1·2 + 2·4 + 3·6
    assert(got.getAs[Long]("e_l2") === 24L) // 1·3·16 div 2
    // (28−24)²·36·2·1e6 div (1·24·24) = 2000000
    assert(got.getAs[Long]("z2_ppm") === 2000000L)
    assert(got.getAs[Boolean]("trend_up"))
  }

  test("RankTests.pageTrend: ragged panel fails loudly") {
    val s = spark
    import s.implicits._
    val obs = Seq((1L, 1L, 10L), (1L, 2L, 20L), (2L, 1L, 10L))
      .toDF("blk", "tr", "v")
    val e = intercept[Exception] {
      graft.data.RankTests.pageTrend(obs, "blk", "tr", "v").collect()
    }
    assert(Round12Spec.msgs(e).exists(_.contains("ragged panel")))
  }

  test("Contingency.cochranArmitage hand values: rates 0/2, 1/2, 2/2 " +
      "across scores 1,2,3 give z2 = 4.0 exactly") {
    val s = spark
    import s.implicits._
    val d = Seq((1L, 0L), (1L, 0L), (2L, 0L), (2L, 1L), (3L, 1L),
      (3L, 1L)).toDF("s", "y")
    val got = graft.data.Contingency.cochranArmitage(d, "s", "y")
      .collect().head
    assert(got.getAs[Long]("n_total") === 6L)
    assert(got.getAs[Long]("n_pos") === 3L)
    assert(got.getAs[Long]("t_num") === 12L) // 6·8 − 3·12
    // u = 144e6 div 9 = 16e6; z² = 16e6·6 div 24 = 4000000
    assert(got.getAs[Long]("z2_ppm") === 4000000L)
    assert(got.getAs[Boolean]("trend_up"))
  }

  test("Contingency.cochranArmitage degenerates: all-positive and " +
      "constant-score inputs are NULL") {
    val s = spark
    import s.implicits._
    val allPos = Seq((1L, 1L), (2L, 1L)).toDF("s", "y")
    val g1 = graft.data.Contingency.cochranArmitage(allPos, "s", "y")
      .collect().head
    assert(g1.isNullAt(g1.fieldIndex("z2_ppm")))
    val oneScore = Seq((2L, 0L), (2L, 1L)).toDF("s", "y")
    val g2 = graft.data.Contingency.cochranArmitage(oneScore, "s", "y")
      .collect().head
    assert(g2.isNullAt(g2.fieldIndex("z2_ppm")))
  }

  test("SeriesStats.mannKendall hand values: [1,3,2] gives S = 1; " +
      "[2,2,3] tie-corrects the variance (v18 = 48)") {
    val s = spark
    import s.implicits._
    val df = Seq(("a", 1L, 1L), ("a", 2L, 3L), ("a", 3L, 2L),
      ("t", 1L, 2L), ("t", 2L, 2L), ("t", 3L, 3L)).toDF("sid", "t", "x")
    val got = graft.data.SeriesStats
      .mannKendall(df, Seq("sid"), "t", "x")
      .collect().map(r => r.getAs[String]("sid") -> r).toMap
    val a = got("a")
    assert(a.getAs[Long]("s_stat") === 1L)
    assert(a.getAs[Long]("v18") === 66L)     // 3·2·11, no ties
    assert(a.getAs[Long]("z2_ppm") === 272727L)
    val t = got("t")
    assert(t.getAs[Long]("s_stat") === 2L)
    assert(t.getAs[Long]("v18") === 48L)     // 66 − 2·1·9
    assert(t.getAs[Long]("z2_ppm") === 1500000L) // 4·18e6 div 48
    assert(t.getAs[Boolean]("trend_up"))
  }

  test("RankTests.kruskalWallisFromCountsGrouped: each segment's H " +
      "equals the ungrouped kernel run on that segment alone") {
    val s = spark
    import s.implicits._
    val cells = Seq(
      ("s1", "A", 1L, 1L), ("s1", "A", 2L, 2L),
      ("s1", "B", 2L, 1L), ("s1", "B", 3L, 2L),
      ("s2", "A", 5L, 3L), ("s2", "B", 7L, 3L))
      .toDF("seg", "g", "v", "c")
    val grouped = graft.data.RankTests
      .kruskalWallisFromCountsGrouped(cells, Seq("seg"))
      .collect().map(r => r.getAs[String]("seg") -> r).toMap
    val s1 = graft.data.RankTests.kruskalWallisFromCounts(
      cells.filter(col("seg") === "s1").drop("seg")).collect().head
    assert(grouped("s1").getAs[Long]("h_ppm") ===
      s1.getAs[Long]("h_ppm"))
    assert(grouped("s1").getAs[Long]("h_ppm") === 2722222L)
    // s2: perfectly separated groups, H = (N−1)·B/W maximal for n=6,k=2
    assert(grouped("s2").getAs[String]("w2_den").toLong > 0)
  }

  test("Hits.fixedPoint hand values: 2-hub/2-authority bipartite graph, " +
      "two iterations, every normalization replayed by hand") {
    val s = spark
    import s.implicits._
    // edges 1→3, 2→3, 2→4: node 2 the stronger hub, 3 the stronger auth
    val e = Seq((1L, 3L), (2L, 3L), (2L, 4L)).toDF("src", "dst")
    val got = graft.operators.Hits.fixedPoint(e, "src", "dst", 2)
      .collect().map(r => r.getAs[Long]("node") -> r).toMap
    // iter1: a(3) = 2e6·4e6 div 3e6 = 2666666, a(4) = 1333333
    //        h(1) = 2666666·4e6 div 6666665 = 1600000 (exact),
    //        h(2) = 3999999·4e6 div 6666665 = 2400000 (exact)
    // iter2: a(3) = 4e6·4e6 div 6.4e6 = 2500000, a(4) = 1500000
    //        h(1) = 2.5e6·4e6 div 6.5e6 = 1538461, h(2) = 2461538
    assert(got(1L).getAs[Long]("hub_fp") === 1538461L)
    assert(got(2L).getAs[Long]("hub_fp") === 2461538L)
    assert(got(3L).getAs[Long]("auth_fp") === 2500000L)
    assert(got(4L).getAs[Long]("auth_fp") === 1500000L)
    assert(got(1L).getAs[Long]("auth_fp") === 0L)
    assert(got(3L).getAs[Long]("hub_fp") === 0L)
  }

  test("SeriesStats.dispersionIndex hand values: [1,2,3] gives chi2 = 1 " +
      "and VMR = 0.5 exactly; zero mass is NULL") {
    val s = spark
    import s.implicits._
    val df = Seq(("g", 1L), ("g", 2L), ("g", 3L),
      ("z", 0L), ("z", 0L)).toDF("grp", "c")
    val got = graft.data.SeriesStats
      .dispersionIndex(df, Seq("grp"), "c")
      .collect().map(r => r.getAs[String]("grp") -> r).toMap
    val g = got("g")
    assert(g.getAs[Long]("n") === 3L)
    assert(g.getAs[Long]("sum_c") === 6L)
    assert(g.getAs[Long]("chi2_ppm") === 1000000L) // (3·14−36)e6 div 6
    assert(g.getAs[Long]("vmr_ppm") === 500000L)
    assert(got("z").isNullAt(got("z").fieldIndex("chi2_ppm")))
    assert(got("z").isNullAt(got("z").fieldIndex("vmr_ppm")))
  }
}
