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
