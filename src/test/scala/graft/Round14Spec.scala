package graft

import org.apache.spark.sql.functions._

/** Round-14 units: the ADVICE r13 closures — GlobalCumsum storage-leak /
  * null-weight / output-collision hardening, the Cuped derived-product
  * loud bounds (the y-side of the 1e29 moment guard), and the equidepth
  * DECIMAL cross-multiplication.
  */
class Round14Spec extends SparkSpec {

  test("GlobalCumsum leaves no persistent RDD blocks behind (two calls, " +
      "storage empty after each materializes)") {
    val s = spark
    import s.implicits._
    val before = s.sparkContext.getPersistentRDDs.keySet
    val df = (1 to 100).map(i => (i.toLong, (i % 7 + 1).toLong))
      .toDF("id", "w")
    val r1 = graft.operators.GlobalCumsum
      .withCumsum(df, "cum", "w", Seq("id")).collect()
    val r2 = graft.operators.GlobalCumsum
      .withCumsum(df, "cum", "w", Seq("id")).collect()
    assert(r1.sameElements(r2))
    val leaked = s.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty,
      s"GlobalCumsum pinned RDDs in executor storage: $leaked")
  }

  test("GlobalCumsum exact running total across many partitions equals " +
      "the sequential scan") {
    val s = spark
    import s.implicits._
    val rows = (1 to 5000).map(i => ((i * 37) % 5000, (i % 11).toLong + 1L))
    val df = rows.toDF("k", "w").repartition(13)
    val got = graft.operators.GlobalCumsum
      .withCumsum(df, "cum", "w", Seq("k"))
      .orderBy("k").select("k", "cum").as[(Int, Long)].collect()
    var acc = 0L
    val want = rows.sortBy(_._1).map { case (k, w) => acc += w; (k, acc) }
    assert(got.toSeq === want.toSeq)
  }

  test("GlobalCumsum raises loudly on a NULL weight and on an output " +
      "column collision") {
    val s = spark
    import s.implicits._
    val bad = Seq((1L, Some(2L)), (2L, None)).toDF("id", "w")
    val e = intercept[Exception] {
      graft.operators.GlobalCumsum
        .withCumsum(bad, "cum", "w", Seq("id")).collect()
    }
    assert(e.getMessage.contains("NULL weight") ||
      Option(e.getCause).exists(_.getMessage.contains("NULL weight")))
    val clash = Seq((1L, 2L)).toDF("id", "cum")
    val e2 = intercept[IllegalArgumentException] {
      graft.operators.GlobalCumsum.withCumsum(clash, "cum", "id", Seq("id"))
    }
    assert(e2.getMessage.contains("already exists"))
  }

  private def msgs(t: Throwable): Seq[String] =
    Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))

  test("Cuped raises loudly when |dy_num| reaches 1e28 (the y-side " +
      "product envelope) instead of silently NULLing") {
    val s = spark
    import s.implicits._
    // Constructed so every OTHER guard stays quiet: x in {1,2} both arms
    // (moments tiny, C = 0 so theta = 0), y = 5e27 on the two treat
    // units -> dy_num = Syt*n_c = 1e28*2 = 2e28 >= 1e28.
    val pu = Seq((true, 1L, "5000000000000000000000000000"),
      (true, 2L, "5000000000000000000000000000"),
      (false, 1L, "0"), (false, 2L, "0"))
      .toDF("treat", "x", "ys")
      .withColumn("y", col("ys").cast("decimal(38,0)"))
    val e = intercept[Exception] {
      graft.ml.Cuped.estimate(pu, "treat", "x", "y").collect()
    }
    assert(msgs(e).exists(_.contains("dy_num")))
  }

  test("Cuped raises loudly when |dx_num| reaches 1e22 (the theta-product " +
      "envelope)") {
    val s = spark
    // Cauchy–Schwarz ties dx_num to the moment envelope (|Sxt| <=
    // sqrt(n_t*Sxx)), so the guard is only reachable at large n — the
    // regime it exists for. n = 1e8 units, x = +-3.1e6 by arm, y = 0:
    // n*Sxx = 9.61e28 < 1e29 (moment guard quiet), theta = 0, and
    // dx_num = 1.55e14*5e7*2 = 1.55e22 >= 1e22.
    val pu = s.range(0, 100000000L)
      .withColumn("treat", col("id") % 2 === 0)
      .withColumn("x", when(col("treat"), lit(3100000L))
        .otherwise(lit(-3100000L)))
      .withColumn("y", lit(0L))
    val e = intercept[Exception] {
      graft.ml.Cuped.estimate(pu, "treat", "x", "y").collect()
    }
    assert(msgs(e).exists(_.contains("dx_num")))
  }

  test("Cuped in-range results are unchanged by the new guards " +
      "(hand-value replay)") {
    val s = spark
    import s.implicits._
    val pu = Seq((true, 10L, 30L), (true, 20L, 55L), (false, 10L, 28L),
      (false, 20L, 52L), (false, 30L, 80L)).toDF("treat", "x", "y")
    val got = graft.ml.Cuped.estimate(pu, "treat", "x", "y").collect().head
    // moments: n=5 Sx=90 Sy=245 Sxx=1900 Sxy=5120
    // C = 5*5120 - 90*245 = 25600 - 22050 = 3550
    // V = 5*1900 - 8100 = 1400 ; theta = 3550/1400 = 2.535714285...
    assert(got.getAs[Long]("theta_q9") === 2535714285L)
    // dy_num = 85*3 - 160*2 = -65 ; den = 6 -> diff = -10.833333
    assert(got.getAs[Long]("diff_x1e6") === -10833333L)
  }

  private def ledgerTmp(tag: String): String = {
    val p = s"${System.getProperty("java.io.tmpdir")}/graft_r14_$tag"
    graft.operators.FsUtil.deleteRecursively(new java.io.File(p))
    p
  }

  test("minHashLedger hand case: exact twin reported at jaccard 1, " +
      "near-dup above threshold reported, novel doc silent") {
    val s = spark
    import s.implicits._
    val base = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight nine ten"),
      (3L, "totally unrelated content about spark physical plans"))
      .toDF("doc_id", "text")
    // delta: 11 = exact dup of 1; 12 = near-dup of 2 (one word changed
    // out of ten -> shingle jaccard well above 0.3); 13 = novel
    val delta = Seq(
      (11L, "alpha beta gamma delta epsilon zeta eta theta"),
      (12L, "one two three four five six seven eight nine eleven"),
      (13L, "completely fresh never before seen crawl text"))
      .toDF("doc_id", "text")
    val path = ledgerTmp("hand")
    val first = graft.data.Dedup.minHashLedger(base, path, k = 3,
      numHashes = 32, rowsPerBand = 4, threshold = 0.3)
    assert(first.count() === 0L) // empty ledger: nothing to match
    val got = graft.data.Dedup.minHashLedger(delta, path, k = 3,
      numHashes = 32, rowsPerBand = 4, threshold = 0.3)
      .orderBy("id_new").collect()
    val byNew = got.map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(byNew(11L) === ((1L, 1.0)))
    assert(byNew.contains(12L) && byNew(12L)._1 === 2L &&
      byNew(12L)._2 > 0.3 && byNew(12L)._2 < 1.0)
    assert(!byNew.contains(13L))
    graft.operators.FsUtil.deleteRecursively(new java.io.File(path))
  }

  test("minHashLedger retry idempotence: re-scoring an appended delta " +
      "reports the same historical pairs, never itself; a double-appended " +
      "base does not duplicate pairs") {
    val s = spark
    import s.implicits._
    val base = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text")
    val delta = Seq(
      (11L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val path = ledgerTmp("retry")
    // crashed-and-retried base append: same batch lands twice
    graft.data.Dedup.minHashLedger(base, path, k = 3, numHashes = 32,
      rowsPerBand = 4, threshold = 0.3)
    graft.data.Dedup.minHashLedger(base, path, k = 3, numHashes = 32,
      rowsPerBand = 4, threshold = 0.3)
    val run1 = graft.data.Dedup.minHashLedger(delta, path, k = 3,
      numHashes = 32, rowsPerBand = 4, threshold = 0.3)
      .select("id_new", "id_old").as[(Long, Long)].collect().toSet
    // duplicate ledger rows deduped on read: exactly one (11, 1) pair
    assert(run1 === Set((11L, 1L)))
    // delta now appended: re-scoring must not match itself
    val run2 = graft.data.Dedup.minHashLedger(delta, path, k = 3,
      numHashes = 32, rowsPerBand = 4, threshold = 0.3)
      .select("id_new", "id_old").as[(Long, Long)].collect().toSet
    assert(run2 === run1)
    graft.operators.FsUtil.deleteRecursively(new java.io.File(path))
  }

  test("cutOverlapSpans hand case: later-doc spans removed, overlapping " +
      "intervals merged, full-dup doc cut to empty, keeper untouched") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "x y a b c d e f g z"),
      (3L, "a b c d e f g h i j"),
      (5L, "a b c d e f g h q r"))
      .toDF("doc_id", "text")
    val got = graft.data.Dedup
      .cutOverlapSpans(docs, "doc_id", "text", k = 5, maxDf = 20,
        minGrams = 3)
      .orderBy("doc_id")
      .as[(Long, String, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      // (1,2) span covers doc2 words [2,9) -> "x y z" survives
      (2L, "x y z", 10L, 7L, 14L, 1L),
      // (1,3) covers [0,10), (2,3) covers [0,7): merged = whole doc
      (3L, "", 10L, 10L, 19L, 2L),
      // (1,5)/(3,5) cover [0,8), (2,5) covers [0,7): merged [0,8)
      (5L, "q r", 10L, 8L, 16L, 3L)))
  }

  test("brunnerMunzelFromCounts hand values: interleaved samples give " +
      "p=0.75 and W^2=0.5 exactly; complete separation gives NULL W^2 " +
      "and p=1; past the N^8 envelope raises") {
    val s = spark
    import s.implicits._
    // a = {1,3}, b = {2,4}: hand-derived p_q6 = 750000, w2_ppm = 500000
    val mixed = Seq((1L, 1L, 0L), (2L, 0L, 1L), (3L, 1L, 0L), (4L, 0L, 1L))
      .toDF("v", "ca", "cb")
    val g1 = graft.data.RankTests.brunnerMunzelFromCounts(mixed)
      .collect().head
    assert(g1.getAs[Long]("p_q6") === 750000L)
    assert(g1.getAs[Long]("w2_ppm") === 500000L)
    assert(g1.getAs[Boolean]("b_stochastically_larger"))
    // a = {1,2}, b = {3,4}: placements constant -> variance 0 -> NULL
    val sep = Seq((1L, 1L, 0L), (2L, 1L, 0L), (3L, 0L, 1L), (4L, 0L, 1L))
      .toDF("v", "ca", "cb")
    val g2 = graft.data.RankTests.brunnerMunzelFromCounts(sep)
      .collect().head
    assert(g2.getAs[Long]("p_q6") === 1000000L)
    assert(g2.isNullAt(g2.fieldIndex("w2_ppm")))
    val big = Seq((1L, 3000L, 2500L)).toDF("v", "ca", "cb")
    val e = intercept[Exception] {
      graft.data.RankTests.brunnerMunzelFromCounts(big).collect()
    }
    assert(msgs(e).exists(_.contains("brunner_munzel")))
  }

  test("hodgesLehmannFromCounts hand values: odd and even pair counts, " +
      "identity verdict") {
    val s = spark
    import s.implicits._
    // a = {1,2,3}, b = {5,7,9}: 9 diffs sorted 2,3,4,4,5,6,6,7,8 -> HL 5
    val odd = Seq((1L, 1L, 0L), (2L, 1L, 0L), (3L, 1L, 0L),
      (5L, 0L, 1L), (7L, 0L, 1L), (9L, 0L, 1L)).toDF("v", "ca", "cb")
    val g1 = graft.data.RankTests.hodgesLehmannFromCounts(odd)
      .collect().head
    assert(g1.getAs[Long]("m_pairs") === 9L)
    assert(g1.getAs[Long]("d_lo") === 5L && g1.getAs[Long]("d_up") === 5L)
    assert(g1.getAs[Long]("hl2") === 10L)
    assert(g1.getAs[Boolean]("identity_ok"))
    // a = {0}, b = {2,4}: diffs 2,4 -> lower 2, upper 4, hl2 = 6
    val even = Seq((0L, 1L, 0L), (2L, 0L, 1L), (4L, 0L, 1L))
      .toDF("v", "ca", "cb")
    val g2 = graft.data.RankTests.hodgesLehmannFromCounts(even)
      .collect().head
    assert(g2.getAs[Long]("d_lo") === 2L && g2.getAs[Long]("d_up") === 4L)
    assert(g2.getAs[Long]("hl2") === 6L)
  }

  test("dixonQFromCounts hand values: clean gaps, repeated extreme, " +
      "degenerate small group") {
    val s = spark
    import s.implicits._
    val cells = Seq(
      ("g1", 1L, 1L), ("g1", 2L, 1L), ("g1", 3L, 1L), ("g1", 10L, 1L),
      ("g2", 1L, 1L), ("g2", 2L, 1L), ("g2", 10L, 2L),
      ("g3", 1L, 1L), ("g3", 5L, 1L))
      .toDF("g", "v", "c")
    val got = graft.data.RankStats.dixonQFromCounts(cells, Seq("g"))
      .orderBy("g").collect()
    val g1 = got(0)
    assert(g1.getAs[Long]("q_hi_ppm") === 777777L) // (10-3)/9
    assert(g1.getAs[Long]("q_lo_ppm") === 111111L) // (2-1)/9
    val g2 = got(1)
    assert(g2.getAs[Long]("q_hi_ppm") === 0L) // repeated max
    assert(g2.getAs[Long]("q_lo_ppm") === 111111L)
    val g3 = got(2)
    assert(g3.isNullAt(g3.fieldIndex("q_hi_ppm"))) // n = 2 < 3
  }

  test("quartileShapeFromCounts hand values: symmetric 1..100 and a " +
      "right-skewed group") {
    val s = spark
    import s.implicits._
    val sym = (1 to 100).map(v => ("s", v.toLong, 1L))
    val skew = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 9L, 18L)
      .map(v => ("k", v, 1L))
    val got = graft.data.RankStats
      .quartileShapeFromCounts((sym ++ skew).toDF("g", "v", "c"), Seq("g"))
      .orderBy("g").collect()
    val k = got(0)
    assert((k.getAs[Long]("q1"), k.getAs[Long]("q2"),
      k.getAs[Long]("q3")) === ((3L, 5L, 8L)))
    assert(k.getAs[Long]("bowley_skew_ppm") === 200000L) // (3+8-10)/5
    assert(k.getAs[Long]("qcd_ppm") === 454545L) // 5/11
    val sy = got(1)
    assert((sy.getAs[Long]("q1"), sy.getAs[Long]("q2"),
      sy.getAs[Long]("q3")) === ((25L, 50L, 75L)))
    assert(sy.getAs[Long]("bowley_skew_ppm") === 0L)
    assert(sy.getAs[Long]("qcd_ppm") === 500000L)
  }

  test("quadeTest hand values: 3 blocks x 2 treatments with a tied block " +
      "matches the classical F = 1/19; ragged panel raises") {
    val s = spark
    import s.implicits._
    val obs = Seq(
      (1L, "t1", 1L), (1L, "t2", 3L),
      (2L, "t1", 2L), (2L, "t2", 2L),
      (3L, "t1", 5L), (3L, "t2", 1L))
      .toDF("blk", "treat", "y")
    val got = graft.data.RankTests.quadeTest(obs, "blk", "treat", "y")
      .collect().head
    assert(got.getAs[Long]("b_blocks") === 3L)
    assert(got.getAs[Long]("k_treatments") === 2L)
    assert(got.getAs[Long]("f_ppm") === 52631L) // 1/19
    val ragged = obs.filter(!(col("blk") === 2L && col("treat") === "t2"))
    val e = intercept[Exception] {
      graft.data.RankTests.quadeTest(ragged, "blk", "treat", "y").collect()
    }
    assert(msgs(e).exists(_.contains("ragged")))
  }

  test("Truss.peel: K4 + pendant keeps the K4 at support 2; a shared-edge " +
      "triangle pair cascades to empty under k=4") {
    val s = spark
    import s.implicits._
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 9L)).toDF("src", "dst")
    val got = graft.operators.Truss.peel(k4, "src", "dst", k = 4, rounds = 2)
      .orderBy("u", "v").as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 2L, 2L), (1L, 3L, 2L), (1L, 4L, 2L),
      (2L, 3L, 2L), (2L, 4L, 2L), (3L, 4L, 2L)))
    // two triangles sharing edge (1,3): round 1 keeps only the shared
    // edge (support 2), round 2 finds it triangle-less and drops it
    val twoTri = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 1L))
      .toDF("src", "dst")
    val got2 = graft.operators.Truss.peel(twoTri, "src", "dst",
      k = 4, rounds = 2).count()
    assert(got2 === 0L)
  }

  test("simHashLedger: twin reported at hamming 0, novel doc silent, " +
      "retry idempotent") {
    val s = spark
    import s.implicits._
    val base = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text")
    val delta = Seq(
      (11L, "alpha beta gamma delta epsilon zeta eta theta"),
      (13L, "completely fresh never before seen crawl text today"))
      .toDF("doc_id", "text")
    val path = ledgerTmp("simhand")
    assert(graft.data.Dedup.simHashLedger(base, path).count() === 0L)
    val run1 = graft.data.Dedup.simHashLedger(delta, path)
      .select("id_new", "id_old", "hamming")
      .as[(Long, Long, Int)].collect().toSet
    assert(run1.contains((11L, 1L, 0)))
    assert(run1.forall(_._3 <= 3)) // declared radius is a hard filter
    val run2 = graft.data.Dedup.simHashLedger(delta, path)
      .select("id_new", "id_old", "hamming")
      .as[(Long, Long, Int)].collect().toSet
    // re-scoring never matches itself and reproduces run1's pairs
    assert(run2.filter(p => p._1 != p._2) === run2)
    assert(run1.subsetOf(run2) && run2.forall(p => p._1 != p._2))
    graft.operators.FsUtil.deleteRecursively(new java.io.File(path))
  }

  test("signedRankFromCounts hand values: all-positive shift matches the " +
      "classical z^2, a +/- tie cancels to zero, zero diffs excluded") {
    val s = spark
    import s.implicits._
    // d = {+1,+2,+3}: W+ = 6, E = 3, Var = 3.5 -> z^2 = 9/3.5
    val up = Seq((1L, 1L), (2L, 1L), (3L, 1L), (0L, 5L)).toDF("d", "c")
    val g1 = graft.data.RankTests.signedRankFromCounts(up).collect().head
    assert(g1.getAs[Long]("n_nonzero") === 3L)
    assert(g1.getAs[Long]("w2_plus") === 12L)
    assert(g1.getAs[Long]("z2_ppm") === 2571428L)
    assert(g1.getAs[Boolean]("positive_shift"))
    // d = {+1,-1}: tied |d| midranks, W2+ = E2 -> z^2 = 0
    val bal = Seq((1L, 1L), (-1L, 1L)).toDF("d", "c")
    val g2 = graft.data.RankTests.signedRankFromCounts(bal).collect().head
    assert(g2.getAs[Long]("z2_ppm") === 0L)
    assert(!g2.getAs[Boolean]("positive_shift"))
  }

  test("cvmFromCounts hand values: {1} vs {2} gives scipy's T = 0.25; " +
      "identical samples give T = 0") {
    val s = spark
    import s.implicits._
    val tiny = Seq((1L, 1L, 0L), (2L, 0L, 1L)).toDF("v", "ca", "cb")
    val g1 = graft.data.RankTests.cvmFromCounts(tiny).collect().head
    assert(g1.getAs[Long]("t_x1e6") === 250000L)
    val same = Seq((1L, 1L, 1L), (2L, 1L, 1L)).toDF("v", "ca", "cb")
    val g2 = graft.data.RankTests.cvmFromCounts(same).collect().head
    assert(g2.getAs[Long]("t_x1e6") === 0L)
  }

  test("Passages.windows hand case: overlapping windows with a short " +
      "tail; a sub-size doc yields itself") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"), (2L, "a b"))
      .toDF("doc_id", "text")
    val got = graft.functions.Passages
      .windows(docs, "doc_id", "text", winSize = 4, stride = 3)
      .orderBy("doc_id", "win_idx")
      .select("doc_id", "win_idx", "passage", "n_words")
      .as[(Long, Long, String, Long)].collect().toSeq
    assert(got === Seq(
      (1L, 0L, "w1 w2 w3 w4", 4L),
      (1L, 1L, "w4 w5 w6 w7", 4L),
      (1L, 2L, "w7 w8 w9 w10", 4L),
      (1L, 3L, "w10", 1L),
      (2L, 0L, "a b", 2L)))
  }

  test("Shapley.channelAttribution hand values: 2-channel hand case " +
      "matches the axioms (efficiency, null error credit beyond synergy)") {
    val s = spark
    import s.implicits._
    // converted users: 1 no-touch (mask 0), 2 click-only (1),
    // 1 click+error (3). v(0)=1 v(c)=3 v(e)=1 v(ce)=4
    // 2*phi_click = (3-1) + (4-1) = 5 ; 2*phi_error = 0 + (4-3) = 1
    val masks = Seq(0, 1, 1, 3).toDF("mask")
    val got = graft.ml.Shapley
      .channelAttribution(masks, Seq("click", "error"))
      .orderBy("channel").collect()
    val click = got(0); val err = got(1)
    assert(click.getAs[String]("channel") === "click")
    assert(click.getAs[Long]("shap_xnfact") === 5L)
    assert(click.getAs[Long]("share_ppm") === 833333L) // 5/6
    assert(err.getAs[Long]("shap_xnfact") === 1L)
    assert(err.getAs[Long]("share_ppm") === 166666L) // 1/6
    assert(got.forall(_.getAs[Boolean]("efficiency_ok")))
  }

  test("conoverScaleFromCounts hand values: a = {1,5} vs b = {3,3} gives " +
      "the classical z^2 = 3; identical samples give z^2 = 0") {
    val s = spark
    import s.implicits._
    // u_a = {2,2}, u_b = {0,0}: squared midranks A = {2.25,2.25,
    // 12.25,12.25}, T = 24.5, E = 14.5, Var = 100/3 -> z^2 = 3
    val cells = Seq((1L, 1L, 0L), (3L, 0L, 2L), (5L, 1L, 0L))
      .toDF("v", "ca", "cb")
    val g1 = graft.data.RankTests.conoverScaleFromCounts(cells)
      .collect().head
    assert(g1.getAs[Long]("z2_ppm") === 3000000L)
    assert(g1.getAs[Boolean]("a_more_variable"))
    // identical samples: every pooled deviation ties -> the squared
    // ranks are constant, variance 0 -> declared NULL (degenerate)
    val same = Seq((1L, 1L, 1L), (5L, 1L, 1L)).toDF("v", "ca", "cb")
    val g2 = graft.data.RankTests.conoverScaleFromCounts(same)
      .collect().head
    assert(g2.isNullAt(g2.fieldIndex("z2_ppm")))
  }

  test("Graphs.modularity hand values: two triangles + one bridge under " +
      "the triangle partition give Q = 70/196") {
    val s = spark
    import s.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L),
      (4L, 5L), (5L, 6L), (4L, 6L)).toDF("src", "dst")
    val labels = Seq((1L, "A"), (2L, "A"), (3L, "A"),
      (4L, "B"), (5L, "B"), (6L, "B")).toDF("node", "lbl")
    val got = graft.operators.Graphs
      .modularity(edges, "src", "dst", labels, "node", "lbl")
      .collect().head
    assert(got.getAs[Long]("n_edges") === 7L)
    assert(got.getAs[Long]("intra_edges") === 6L)
    assert(got.getAs[Long]("n_communities") === 2L)
    assert(got.getAs[Long]("n_unlabeled") === 0L)
    // 4mQ... num = 4*7*6 - (49 + 49) = 70 ; 4m^2 = 196
    assert(got.getAs[Long]("q_x1e6") === 357142L)
  }

  test("Knn.dbscanCosine hand case: one core, two borders attached to " +
      "it, one noise point") {
    val s = spark
    import s.implicits._
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f)),        // border: only b within 0.95
      (2L, Seq(0.998f, 0.06f)),     // core: neighbours {1, 3}
      (3L, Seq(0.94f, 0.34f)),      // border: only b within 0.95
      (4L, Seq(0.0f, 1.0f)))        // noise
      .toDF("vec_id", "embedding")
    val got = graft.ann.Knn
      .dbscanCosine(emb, minCosine = 0.95, minPts = 2)
      .orderBy("vec_id").as[(Long, Long, Boolean)].collect().toSeq
    assert(got === Seq((1L, 2L, false), (2L, 2L, true),
      (3L, 2L, false), (4L, -1L, false)))
  }

  test("wassersteinFromCounts hand values: point masses, mixed masses, " +
      "identical distributions") {
    val s = spark
    import s.implicits._
    // a = {0}, b = {10}: W1 = 10
    val pt = Seq((0L, 1L, 0L), (10L, 0L, 1L)).toDF("v", "ca", "cb")
    assert(graft.data.RankStats.wassersteinFromCounts(pt)
      .collect().head.getAs[Long]("w1_x1e6") === 10000000L)
    // a = {0, 4}, b = {2, 2}: |F diff| is 1/2 on [0,2) and [2,4) -> W1 = 2
    val mx = Seq((0L, 1L, 0L), (2L, 0L, 2L), (4L, 1L, 0L))
      .toDF("v", "ca", "cb")
    assert(graft.data.RankStats.wassersteinFromCounts(mx)
      .collect().head.getAs[Long]("w1_x1e6") === 2000000L)
    val same = Seq((1L, 2L, 2L), (5L, 3L, 3L)).toDF("v", "ca", "cb")
    assert(graft.data.RankStats.wassersteinFromCounts(same)
      .collect().head.getAs[Long]("w1_x1e6") === 0L)
  }

  test("energyDistanceFromCounts hand values: D^2 = 4 for unit point " +
      "masses at distance 2, and the {0,2} vs {1} case gives 1") {
    val s = spark
    import s.implicits._
    val pt = Seq((0L, 1L, 0L), (2L, 0L, 1L)).toDF("v", "ca", "cb")
    assert(graft.data.RankStats.energyDistanceFromCounts(pt)
      .collect().head.getAs[Long]("e2_x1e6") === 4000000L)
    // 2E|XY| = 2 ; E|XX'| = 1 ; E|YY'| = 0 -> D^2 = 1
    val mx = Seq((0L, 1L, 0L), (1L, 0L, 1L), (2L, 1L, 0L))
      .toDF("v", "ca", "cb")
    assert(graft.data.RankStats.energyDistanceFromCounts(mx)
      .collect().head.getAs[Long]("e2_x1e6") === 1000000L)
  }

  test("anovaTwoWayPanel hand values: the 2x2 panel [[1,2],[4,3]] gives " +
      "F_row = 4 and ICC(2,1) = 0.75; ragged panel raises") {
    val s = spark
    import s.implicits._
    val obs = Seq((1L, "a", 1L), (1L, "b", 2L), (2L, "a", 4L),
      (2L, "b", 3L)).toDF("r", "c", "y")
    val got = graft.data.Contingency.anovaTwoWayPanel(obs, "r", "c", "y")
      .collect().head
    assert(got.getAs[Long]("nss_row") === 16L)
    assert(got.getAs[Long]("nss_col") === 0L)
    assert(got.getAs[Long]("nss_err") === 4L)
    assert(got.getAs[Long]("f_row_ppm") === 4000000L)
    assert(got.getAs[Long]("f_col_ppm") === 0L)
    assert(got.getAs[Long]("icc2_x1e6") === 750000L)
    val e = intercept[Exception] {
      graft.data.Contingency
        .anovaTwoWayPanel(obs.limit(3), "r", "c", "y").collect()
    }
    assert(msgs(e).exists(_.contains("ragged")))
  }

  test("LmKneserNey hand values: a tiny corpus reproduces the " +
      "interpolated D = 3/4 estimates piece by piece") {
    val s = spark
    import s.implicits._
    // corpus: "a b", "a b", "a c" -> bigrams ab x2, ac x1
    // c_left(a) = 3, n_follow(a) = 2, B = 2 bigram types
    // n_precede(b) = 1, n_precede(c) = 1
    val docs = Seq("a b", "a b", "a c").map(Tuple1(_)).toDF("text")
    val got = graft.functions.LmKneserNey
      .bigramTable(docs, "text", vocabTopK = 10)
      .orderBy("w1", "w2").collect()
    val ab = got(0); val ac = got(1)
    assert(ab.getAs[String]("w2") === "b")
    // term1(ab) = (2 - 3/4)/3 = 5/12 -> 416666666
    assert(ab.getAs[Long]("term1_q9") === 416666666L)
    // lambda(a) = (3/4)*2/3 = 1/2 ; pcont(b) = 1/2
    assert(ab.getAs[Long]("lambda_q9") === 500000000L)
    assert(ab.getAs[Long]("pcont_q9") === 500000000L)
    // kn = 5/12 + 1/4 = 2/3 (quantized pieces compose exactly here)
    assert(ab.getAs[Long]("kn_q9") === 666666666L)
    // term1(ac) = (1 - 3/4)/3 = 1/12 -> 83333333
    assert(ac.getAs[Long]("term1_q9") === 83333333L)
    assert(ac.getAs[Long]("kn_q9") === 83333333L + 250000000L)
  }

  test("equidepthBoundaries DECIMAL cross-multiplication leaves the " +
      "small-n boundaries bit-identical") {
    val s = spark
    import s.implicits._
    // 1..100 each once, 4 buckets -> boundaries at 25, 50, 75
    val cells = (1 to 100).map(v => ("g", v.toLong, 1L)).toDF("g", "v", "c")
    val got = graft.data.RankStats
      .equidepthBoundaries(cells, Seq("g"), 4)
      .orderBy("bucket").select("bucket", "boundary")
      .as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 25L), (2L, 50L), (3L, 75L)))
  }
}
