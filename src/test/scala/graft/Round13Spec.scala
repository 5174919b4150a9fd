package graft

import org.apache.spark.sql.functions._

/** Round-13 units: the DECIMAL-through overflow fix for the rank-test
  * audit surfaces. Each test constructs a dataset whose `b2_q9` /
  * `w2_den` / `v72` value exceeds Long.MaxValue (the regime where the
  * old BIGINT casts silently NULLed in non-ANSI Spark while DuckDB's
  * cast errored) and pins the exact digit-string the DECIMAL(38,0) path
  * must emit.
  */
class Round13Spec extends SparkSpec {

  test("kruskalWallisFromCounts past Long.Max: two perfectly separated " +
      "2e6-count groups keep exact b2_q9/w2_den digits and H = N-1") {
    val s = spark
    import s.implicits._
    // N = 4e6 (< the 1e7 guard) but the per-group b2 term is 8e27 and
    // W2 = 1.6e19 - both far past 2^63 ~ 9.2e18
    val cells = Seq(("A", 1L, 2000000L), ("B", 2L, 2000000L))
      .toDF("g", "v", "c")
    val got = graft.data.RankTests.kruskalWallisFromCounts(cells)
      .collect().head
    assert(got.getAs[Long]("n_total") === 4000000L)
    // doubled midranks 2000001 / 6000001, dev = -/+ 4e12 per group:
    // W2 = 2 * 2e6 * (2e6)^2 = 1.6e19
    assert(got.getAs[String]("w2_den") === "16000000000000000000")
    // b2_q9 = 2 * ((4e12)^2 * 1e9 div 2e6) = 1.6e28
    assert(got.getAs[String]("b2_q9") ===
      "16000000000000000000000000000")
    // perfect separation: H = N-1 exactly -> (N-1)*1e6 ppm
    assert(got.getAs[Long]("h_ppm") === 3999999000000L)
  }

  test("kruskalWallisFromCountsGrouped past Long.Max: the big segment " +
      "matches the ungrouped kernel digit for digit") {
    val s = spark
    import s.implicits._
    val cells = Seq(
      ("big", "A", 1L, 2000000L), ("big", "B", 2L, 2000000L),
      ("small", "A", 1L, 1L), ("small", "B", 2L, 2L))
      .toDF("seg", "g", "v", "c")
    val got = graft.data.RankTests
      .kruskalWallisFromCountsGrouped(cells, Seq("seg"))
      .collect().map(r => r.getAs[String]("seg") -> r).toMap
    assert(got("big").getAs[String]("b2_q9") ===
      "16000000000000000000000000000")
    assert(got("big").getAs[Long]("h_ppm") === 3999999000000L)
    // the small segment still agrees with the ungrouped run
    val small = graft.data.RankTests.kruskalWallisFromCounts(
      cells.filter(col("seg") === "small").drop("seg")).collect().head
    assert(got("small").getAs[Long]("h_ppm") ===
      small.getAs[Long]("h_ppm"))
  }

  test("jonckheereFromCounts past Long.Max: n = 2e6 puts v72 at 1.2e19 " +
      "and the exact z2 replays in BigInt") {
    val s = spark
    import s.implicits._
    // two separated 1e6 groups: v72 = n^2(2n+3) - 2*ng^2(2ng+3) > 2^63
    val cells = Seq((1L, 1L, 1000000L), (2L, 2L, 1000000L))
      .toDF("g", "v", "c")
    val got = graft.data.RankTests.jonckheereFromCounts(cells)
      .collect().head
    val n = BigInt(2000000); val ng = BigInt(1000000)
    val v72 = n * n * (2 * n + 3) - 2 * (ng * ng * (2 * ng + 3))
    assert(v72 > BigInt(Long.MaxValue))
    assert(got.getAs[String]("v72") === v72.toString)
    val j2 = BigInt(got.getAs[Long]("j2"))
    val eJ2 = BigInt(got.getAs[Long]("e_j2"))
    assert(j2 === 2 * ng * ng)      // every cross pair a strict <
    assert(eJ2 === ng * ng)
    val z2 = (j2 - eJ2) * (j2 - eJ2) * 18 * 1000000 / v72
    assert(BigInt(got.getAs[Long]("z2_ppm")) === z2)
    assert(got.getAs[Boolean]("trend_up"))
  }

  test("SeriesStats.pettitt hand values: [1,2,10,11] breaks after t=2 " +
      "with K=4; [5,1,1,5] ties break to the smallest day; length-1 " +
      "series are absent") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("a", 1L, 1L), ("a", 2L, 2L), ("a", 3L, 10L), ("a", 4L, 11L),
      ("b", 1L, 5L), ("b", 2L, 1L), ("b", 3L, 1L), ("b", 4L, 5L),
      ("c", 1L, 7L))
      .toDF("sid", "t", "x")
    val got = graft.data.SeriesStats.pettitt(df, Seq("sid"), "t", "x")
      .collect().map(r => r.getAs[String]("sid") -> r).toMap
    // a: V = -3,-1,1,3 -> U = -3,-4,-3 -> K=4 at t=2, upward shift
    val a = got("a")
    assert(a.getAs[Long]("n") === 4L)
    assert(a.getAs[Long]("k_stat") === 4L)
    assert(a.getAs[Long]("t_star") === 2L)
    assert(a.getAs[Long]("u_star") === -4L)
    assert(!a.getAs[Boolean]("shift_down"))
    assert(!a.getAs[Boolean]("significant")) // 9.6e7 < 3688879*80
    // b: V = 2,-2,-2,2 -> U = 2,0,-2 -> |U| ties at t=1 and t=3,
    // declared break to the smallest day
    val b = got("b")
    assert(b.getAs[Long]("k_stat") === 2L)
    assert(b.getAs[Long]("t_star") === 1L)
    assert(b.getAs[Long]("u_star") === 2L)
    assert(b.getAs[Boolean]("shift_down"))
    assert(!got.contains("c")) // no interior split point
  }

  test("SeriesStats.pettitt past Long.Max significance compare: a " +
      "2000-point step series is significant with 6K^2*1e6 = 6e24") {
    val s = spark
    import s.implicits._
    val df = ((1 to 1000).map(i => ("s", i.toLong, 1L)) ++
      (1001 to 2000).map(i => ("s", i.toLong, 2L))).toDF("sid", "t", "x")
    val got = graft.data.SeriesStats.pettitt(df, Seq("sid"), "t", "x")
      .collect().head
    assert(got.getAs[Long]("n") === 2000L)
    assert(got.getAs[Long]("k_stat") === 1000000L) // 1000*1000 at t=1000
    assert(got.getAs[Long]("t_star") === 1000L)
    assert(got.getAs[Boolean]("significant"))
    assert(!got.getAs[Boolean]("shift_down")) // values step UP
  }

  test("Sampling.systematicWeighted hand values: W=10 m=5 keeps every " +
      "interval covering a stride mark, heavy rows once; m=2 keeps the " +
      "two crossers") {
    val s = spark
    import s.implicits._
    val df = Seq(("a", 3L), ("b", 1L), ("c", 4L), ("d", 2L), ("e", 0L))
      .toDF("k", "w")
    val m5 = graft.data.Sampling.systematicWeighted(df, "k", "w", 5)
      .collect().map(r => (r.getAs[String]("k"),
        r.getAs[Long]("cum_w"), r.getAs[Long]("pick_k"))).toSet
    // cum = 3,4,8,10; pick = cum*5 div 10; e excluded (w=0)
    assert(m5 === Set(("a", 3L, 1L), ("b", 4L, 2L), ("c", 8L, 4L),
      ("d", 10L, 5L)))
    val m2 = graft.data.Sampling.systematicWeighted(df, "k", "w", 2)
      .collect().map(r => (r.getAs[String]("k"),
        r.getAs[Long]("pick_k"))).toSet
    assert(m2 === Set(("c", 1L), ("d", 2L)))
  }

  test("RankTests.hoeffdingFromCells hand values: perfect monotone " +
      "n=5 gives D = 1 exactly; full tie degeneracy replays -2.5") {
    val s = spark
    import s.implicits._
    val mono = (1L to 5L).map(i => (i, i, 1L)).toDF("x", "y", "c")
    val got = graft.data.RankTests.hoeffdingFromCells(mono)
      .collect().head
    assert(got.getAs[Long]("n_total") === 5L)
    assert(got.getAs[String]("d1_16") === "320")
    assert(got.getAs[String]("d2_16") === "2944")
    assert(got.getAs[String]("d3_16") === "800")
    assert(got.getAs[Long]("d_x1e9") === 1000000000L)
    // one coincident cell of 5: Q = 2, R = S = 3 -> D = -2.5 (the
    // documented heavy-tie excursion below -0.5, replayed exactly)
    val ties = Seq((7L, 7L, 5L)).toDF("x", "y", "c")
    val t2 = graft.data.RankTests.hoeffdingFromCells(ties)
      .collect().head
    assert(t2.getAs[String]("d1_16") === "0")
    assert(t2.getAs[String]("d2_16") === "320")
    assert(t2.getAs[String]("d3_16") === "80")
    assert(t2.getAs[Long]("d_x1e9") === -2500000000L)
  }

  test("RankTests.hoeffdingFromCells degenerate: n = 4 < 5 has NULL D " +
      "but exact audit sums") {
    val s = spark
    import s.implicits._
    val cells = (1L to 4L).map(i => (i, i, 1L)).toDF("x", "y", "c")
    val got = graft.data.RankTests.hoeffdingFromCells(cells)
      .collect().head
    assert(got.getAs[Long]("n_total") === 4L)
    assert(got.isNullAt(got.fieldIndex("d_x1e9")))
  }

  test("RankTests.lepageFromCounts hand values: pure shift excites the " +
      "Wilcoxon term, pure spread the Ansari-Bradley term") {
    val s = spark
    import s.implicits._
    // shift: A=[1,2] vs B=[3,4] -> zW^2 = 2.4, zAB^2 = 0
    val shift = Seq((1L, 1L, 0L), (2L, 1L, 0L), (3L, 0L, 1L),
      (4L, 0L, 1L)).toDF("v", "ca", "cb")
    val g1 = graft.data.RankTests.lepageFromCounts(shift).collect().head
    assert(g1.getAs[Long]("n_total") === 4L)
    assert(g1.getAs[Long]("w2") === 6L)   // doubled ranks 2+4
    assert(g1.getAs[Long]("ab2") === 6L)  // folded 2+4
    assert(g1.getAs[Long]("zw2_ppm") === 2400000L) // 3*16/20
    assert(g1.getAs[Long]("za2_ppm") === 0L)
    assert(g1.getAs[Long]("lepage_ppm") === 2400000L)
    // spread: A=[1,4] vs B=[2,3] -> zW^2 = 0, zAB^2 = 3
    val spread = Seq((1L, 1L, 0L), (2L, 0L, 1L), (3L, 0L, 1L),
      (4L, 1L, 0L)).toDF("v", "ca", "cb")
    val g2 = graft.data.RankTests.lepageFromCounts(spread).collect().head
    assert(g2.getAs[Long]("zw2_ppm") === 0L)
    assert(g2.getAs[Long]("za2_ppm") === 3000000L) // 3*3*16/48
    // odd n: A=[1,2] vs B=[3] -> zW^2 = 1.5, zAB^2 = 0.5
    val odd = Seq((1L, 1L, 0L), (2L, 1L, 0L), (3L, 0L, 1L))
      .toDF("v", "ca", "cb")
    val g3 = graft.data.RankTests.lepageFromCounts(odd).collect().head
    assert(g3.getAs[Long]("zw2_ppm") === 1500000L) // 3*4/8
    assert(g3.getAs[Long]("za2_ppm") === 500000L)  // 3*16/96
    assert(g3.getAs[Long]("lepage_ppm") === 2000000L)
  }

  test("RankTests.lepageFromCounts degenerate: an empty side is NULL") {
    val s = spark
    import s.implicits._
    val oneSided = Seq((1L, 2L, 0L), (2L, 3L, 0L)).toDF("v", "ca", "cb")
    val got = graft.data.RankTests.lepageFromCounts(oneSided)
      .collect().head
    assert(got.isNullAt(got.fieldIndex("zw2_ppm")))
    assert(got.isNullAt(got.fieldIndex("lepage_ppm")))
  }

  test("Cuped.estimate hand values: theta = 2.6 exactly in q9, the " +
      "adjusted lift replays the quantized theta") {
    val s = spark
    import s.implicits._
    // t: (2,10),(4,14); c: (1,5),(3,9) -> C=52 V=20 theta=2.6
    // diff = 12-7 = 5; adj = 5 - 2.6*(3-2) = 2.4
    val pu = Seq((true, 2L, 10L), (true, 4L, 14L),
      (false, 1L, 5L), (false, 3L, 9L)).toDF("treat", "x", "y")
    val got = graft.ml.Cuped.estimate(pu, "treat", "x", "y")
      .collect().head
    assert(got.getAs[Long]("n_units") === 4L)
    assert(got.getAs[Long]("n_t") === 2L)
    assert(got.getAs[Long]("n_c") === 2L)
    assert(got.getAs[Long]("theta_q9") === 2600000000L)
    assert(got.getAs[Long]("diff_x1e6") === 5000000L)
    assert(got.getAs[Long]("adj_x1e6") === 2400000L)
  }

  test("Cuped.estimate degenerates: constant covariate gives theta 0 " +
      "and adj = diff; an empty arm gives NULL estimates") {
    val s = spark
    import s.implicits._
    val flat = Seq((true, 7L, 10L), (true, 7L, 14L),
      (false, 7L, 5L), (false, 7L, 9L)).toDF("treat", "x", "y")
    val g1 = graft.ml.Cuped.estimate(flat, "treat", "x", "y")
      .collect().head
    assert(g1.getAs[Long]("theta_q9") === 0L)
    assert(g1.getAs[Long]("adj_x1e6") === g1.getAs[Long]("diff_x1e6"))
    val oneArm = Seq((true, 1L, 2L), (true, 2L, 3L))
      .toDF("treat", "x", "y")
    val g2 = graft.ml.Cuped.estimate(oneArm, "treat", "x", "y")
      .collect().head
    assert(g2.isNullAt(g2.fieldIndex("diff_x1e6")))
    assert(g2.isNullAt(g2.fieldIndex("adj_x1e6")))
  }

  test("RankStats.trimmedMeansFromCounts hand values: [1,1,1,9,9] at " +
      "200 permille trims one per side; 0 permille is the plain mean; " +
      "negative sums sign-split") {
    val s = spark
    import s.implicits._
    val cells = Seq(("g", 1L, 3L), ("g", 9L, 2L)).toDF("k", "v", "c")
    val got = graft.data.RankStats
      .trimmedMeansFromCounts(cells, Seq("k"), 200).collect().head
    assert(got.getAs[Long]("n") === 5L)
    assert(got.getAs[Long]("k_trim") === 1L)
    assert(got.getAs[Long]("v_lo") === 1L)
    assert(got.getAs[Long]("v_hi") === 9L)
    // kept multiplicities 2x1 + 1x9 = 11 over 3; winsor 21 over 5
    assert(got.getAs[Long]("trimmed_mean_x1e6") === 3666666L)
    assert(got.getAs[Long]("winsor_mean_x1e6") === 4200000L)
    val plain = Seq(("p", 2L, 1L), ("p", 4L, 1L)).toDF("k", "v", "c")
    val g0 = graft.data.RankStats
      .trimmedMeansFromCounts(plain, Seq("k"), 0).collect().head
    assert(g0.getAs[Long]("k_trim") === 0L)
    assert(g0.getAs[Long]("trimmed_mean_x1e6") === 3000000L)
    assert(g0.getAs[Long]("winsor_mean_x1e6") === 3000000L)
    val neg = Seq(("n", -5L, 1L), ("n", 1L, 1L)).toDF("k", "v", "c")
    val gn = graft.data.RankStats
      .trimmedMeansFromCounts(neg, Seq("k"), 0).collect().head
    assert(gn.getAs[Long]("trimmed_mean_x1e6") === -2000000L)
  }

  test("SeriesStats.ljungBox composes the quantized acf surfaces: " +
      "rising [1,2,3,4] replays Q by hand at L=1 and L=2") {
    val s = spark
    import s.implicits._
    val df = Seq(("u", 1L, 1L), ("u", 2L, 2L), ("u", 3L, 3L),
      ("u", 4L, 4L)).toDF("sid", "t", "x")
    val l1 = graft.data.SeriesStats
      .ljungBox(df, Seq("sid"), "t", "x", 1).collect().head
    // acf1 = 250000; term = 250000^2 div 3; Q = 4*6*term div 1e6
    assert(l1.getAs[Long]("n_lags") === 1L)
    assert(l1.getAs[Long]("lb_x1e6") === 499999L)
    val l2 = graft.data.SeriesStats
      .ljungBox(df, Seq("sid"), "t", "x", 2).collect().head
    // acf2 = -300000; term2 = 9e10 div 2; Q = 24*(T1+T2) div 1e6
    assert(l2.getAs[Long]("n_lags") === 2L)
    assert(l2.getAs[Long]("lb_x1e6") === 1579999L)
  }

  test("Cuped.estimateGrouped: each segment equals the ungrouped run " +
      "on that segment alone") {
    val s = spark
    import s.implicits._
    val pu = Seq(
      ("a", true, 2L, 10L), ("a", true, 4L, 14L),
      ("a", false, 1L, 5L), ("a", false, 3L, 9L),
      ("b", true, 7L, 10L), ("b", false, 7L, 5L))
      .toDF("seg", "treat", "x", "y")
    val grouped = graft.ml.Cuped
      .estimateGrouped(pu, Seq("seg"), "treat", "x", "y")
      .collect().map(r => r.getAs[String]("seg") -> r).toMap
    assert(grouped("a").getAs[Long]("theta_q9") === 2600000000L)
    assert(grouped("a").getAs[Long]("adj_x1e6") === 2400000L)
    val solo = graft.ml.Cuped.estimate(
      pu.filter(col("seg") === "b").drop("seg"), "treat", "x", "y")
      .collect().head
    assert(grouped("b").getAs[Long]("diff_x1e6") ===
      solo.getAs[Long]("diff_x1e6"))
  }

  test("RankStats.equidepthBoundaries hand values: deciles of " +
      "[1x3, 2x3, 3x4] split 1-3/4-6/7-9; exact-divisibility takes the " +
      "lower value") {
    val s = spark
    import s.implicits._
    val cells = Seq(("g", 1L, 3L), ("g", 2L, 3L), ("g", 3L, 4L))
      .toDF("k", "v", "c")
    val got = graft.data.RankStats
      .equidepthBoundaries(cells, Seq("k"), 10)
      .collect().map(r => r.getAs[Long]("bucket") ->
        r.getAs[Long]("boundary")).toMap
    assert(got.size === 9)
    assert((1L to 3L).forall(got(_) === 1L))
    assert((4L to 6L).forall(got(_) === 2L))
    assert((7L to 9L).forall(got(_) === 3L))
    // median of an even split: cum*2 >= n exactly at the lower value
    val even = Seq(("e", 1L, 5L), ("e", 2L, 5L)).toDF("k", "v", "c")
    val m = graft.data.RankStats.equidepthBoundaries(even, Seq("k"), 2)
      .collect()
    assert(m.length === 1)
    assert(m.head.getAs[Long]("boundary") === 1L)
  }

  test("RankStats.giniStumpFromCounts hand values: a perfect split " +
      "scores n*1e9; score ties break to the smallest threshold") {
    val s = spark
    import s.implicits._
    // v=1 all positive, v=2 all negative -> perfect split at 1
    val pure = Seq((1L, 3L, 3L), (2L, 2L, 0L)).toDF("v", "c", "a")
    val g1 = graft.data.RankStats.giniStumpFromCounts(pure)
      .collect().head
    assert(g1.getAs[Long]("split_v") === 1L)
    assert(g1.getAs[Long]("score_q9") === 5000000000L)  // 3e9 + 2e9
    assert(g1.getAs[Long]("gain_q9") === 2400000000L)   // - 13e9/5
    // graded: best split after the second value
    val graded = Seq((1L, 2L, 1L), (2L, 2L, 1L), (3L, 2L, 2L))
      .toDF("v", "c", "a")
    val g2 = graft.data.RankStats.giniStumpFromCounts(graded)
      .collect().head
    assert(g2.getAs[Long]("split_v") === 2L)
    assert(g2.getAs[Long]("score_q9") === 4000000000L)
    assert(g2.getAs[Long]("gain_q9") === 666666667L)
    // symmetric tie: both candidate thresholds score 4.5e9 -> smallest
    val tie = Seq((1L, 2L, 2L), (2L, 2L, 1L), (3L, 2L, 0L))
      .toDF("v", "c", "a")
    val g3 = graft.data.RankStats.giniStumpFromCounts(tie)
      .collect().head
    assert(g3.getAs[Long]("score_q9") === 4500000000L)
    assert(g3.getAs[Long]("split_v") === 1L)
  }

  test("runs-test click flag: NULL event_type counts as non-click " +
      "(the oracle's CASE WHEN semantics), not as a NULL flag") {
    val s = spark
    import s.implicits._
    // u1: click, NULL, click -> flags 1,0,1 -> 3 runs (the bare ===
    // would NULL the middle flag and report a 2-run sequence)
    val ev = Seq(
      ("u1", 1L, 1L, Some("click")),
      ("u1", 2L, 2L, None),
      ("u1", 3L, 3L, Some("click")))
      .toDF("user_id", "ts", "event_id", "event_type")
    val flagged = ev.select(col("user_id"), col("ts"), col("event_id"),
      coalesce(col("event_type") === "click", lit(false)).as("is_click"))
    val got = graft.data.SeriesStats
      .runsTest(flagged, Seq("user_id"), Seq("ts", "event_id"),
        "is_click")
      .collect().head
    assert(got.getAs[Long]("n") === 3L)
    assert(got.getAs[Long]("n1") === 2L)
    assert(got.getAs[Long]("n0") === 1L)
    assert(got.getAs[Long]("runs") === 3L)
  }
}
