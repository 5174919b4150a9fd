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
