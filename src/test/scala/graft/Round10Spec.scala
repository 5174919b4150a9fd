package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, TimeMode, Trigger}
import org.apache.spark.sql.types.{LongType, StructType, TimestampType}
import java.nio.file.{Files, Paths}

/** Round-10 regressions: streaming late-batch timer anchoring. */
class Round10Spec extends SparkSpec {

  test("SessionTimeout: a late-but-in-watermark batch never re-arms the " +
      "timer earlier than last_event + 30min") {
    val s = spark
    import s.implicits._
    val base = Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_t_session_late_" + s.sparkContext.applicationId)
    graft.operators.FsUtil.deleteRecursively(base.toFile)
    Files.createDirectories(base.resolve("data"))
    val schema = new StructType()
      .add("user_id", LongType).add("ts", TimestampType)
    val outSchema = new StructType()
      .add("user_id", LongType).add("n_events", LongType)
    val epochBase = 1767225600L // 2026-01-01 00:00:00 UTC
    def rows(pairs: (Long, Long)*) = pairs.toSeq.toDF("user_id", "m")
      .select(col("user_id"),
        timestamp_seconds(lit(epochBase) + col("m") * 60).as("ts"))
    val prev = s.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      def runOnce(): Unit = {
        val q = s.readStream.schema(schema).parquet(s"$base/data")
          .withWatermark("ts", "100 minutes")
          .as[(Long, java.sql.Timestamp)]
          .groupByKey(_._1)
          .transformWithState(new graft.streaming.SessionTimeout,
            TimeMode.EventTime(), OutputMode.Append())
          .toDF("user_id", "n_events")
          .writeStream.format("parquet")
          .option("path", s"$base/out")
          .option("checkpointLocation", s"$base/ckpt")
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      def emitted(): Seq[(Long, Long)] =
        s.read.schema(outSchema).parquet(s"$base/out")
          .as[(Long, Long)].collect().toSeq.sorted
      // batch 1: user 1 at minutes 0 and 50 (timer -> 80), clock at 140
      // (post-batch watermark 40)
      rows(1L -> 0L, 1L -> 50L, 999L -> 140L)
        .coalesce(1).write.mode("append").parquet(s"$base/data")
      runOnce()
      // batch 2: LATE event for user 1 at minute 44 (older than the stored
      // last=50, above watermark 40 so accepted). The regression re-armed
      // the timer at 44+30=74; the fix keeps max(50,44)+30=80. Clock 175
      // moves the watermark to 75 — past 74 but not past 80, so the run's
      // own watermark-advance batch fires the buggy timer immediately.
      rows(1L -> 44L, 999L -> 175L)
        .coalesce(1).write.mode("append").parquet(s"$base/data")
      runOnce()
      assert(emitted().isEmpty,
        "session closed early: late batch re-armed the timer below last_event")
      // batch 3 nudges the watermark to 78 — still below the anchored
      // 80-timer; the session must stay open.
      rows(999L -> 178L).coalesce(1).write.mode("append").parquet(s"$base/data")
      runOnce()
      assert(emitted().isEmpty,
        "session closed between watermark 75 and 78: timer below 80")
      // batch 4 moves the watermark to 300 > 80: the session closes now
      // with all 3 events counted (2 on-time + 1 late).
      rows(999L -> 400L).coalesce(1).write.mode("append").parquet(s"$base/data")
      runOnce()
      assert(emitted() === Seq(1L -> 3L))
    } finally {
      prev match {
        case Some(p) =>
          s.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None =>
          s.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("ORC round-trip: TIMESTAMP_NTZ is byte-stable under a non-UTC JVM zone") {
    val s = spark
    import s.implicits._
    val prevTz = java.util.TimeZone.getDefault
    // a zone with DST transitions — the q231 driver-only hash miss's root
    // cause: classic ORC TIMESTAMP round-trips through the JVM-default
    // zone, and wall-clocks in a DST gap shift by an hour on read-back
    java.util.TimeZone.setDefault(
      java.util.TimeZone.getTimeZone("America/New_York"))
    try {
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_t_orc_dst_" +
        s.sparkContext.applicationId
      // 2024-03-10 02:30 UTC-naive falls inside New York's spring-forward
      // gap; 2024-11-03 01:30 falls in the fall-back overlap
      val ts = Seq("2024-03-10 02:30:00", "2024-11-03 01:30:00",
        "2024-06-01 12:00:00")
      val df = ts.toDF("t")
        .select(col("t"), to_timestamp_ntz(col("t")).as("ts"))
      df.write.mode("overwrite").orc(path)
      val back = s.read.orc(path)
        .select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("rt"),
          col("t")).as[(String, String)].collect().toMap
      ts.foreach { v =>
        assert(back(v) === v, s"NTZ ORC round-trip shifted $v -> ${back(v)}")
      }
    } finally java.util.TimeZone.setDefault(prevTz)
  }

  test("RangeShard.assign: NULLs land in the dedicated -1 shard, not shard 0") {
    val s = spark
    import s.implicits._
    val df = Seq(Some(1L), Some(5L), None, Some(9L), None).toDF("v")
    val bounds = graft.data.RangeShard.boundaries(df, "v", 2)
    val out = graft.data.RangeShard.assign(df, "v", bounds)
      .groupBy("shard").count().as[(Int, Long)].collect().toMap
    assert(out(-1) === 2L, "both NULLs in the null shard")
    assert(out.getOrElse(0, 0L) + out.getOrElse(1, 0L) === 3L)
    // manifest of the null shard: min/max NULL, never polluting shard 0's
    val man = graft.data.RangeShard
      .manifest(graft.data.RangeShard.assign(df, "v", bounds), "v")
      .filter(col("shard") === 0).select("min_v").as[Long].head()
    assert(man === 1L, "shard 0 min unpolluted by nulls")
  }

  test("RangeShard.boundaries: empty / all-null input raises a clear error") {
    val s = spark
    import s.implicits._
    val empty = Seq.empty[Option[Long]].toDF("v")
    val allNull = Seq(Option.empty[Long], None).toDF("v")
    for (df <- Seq(empty, allNull)) {
      val e = intercept[IllegalArgumentException] {
        graft.data.RangeShard.boundaries(df, "v", 4)
      }
      assert(e.getMessage.contains("no non-null"))
    }
  }

  test("Gram.gramUpper: guarded BIGINT downcast raises on an overflowing cell") {
    val s = spark
    import s.implicits._
    // two vectors of [2^20] → cell = 2 * (2^20 * 1e6)^2 ≈ 2.2e24 >> 2^63
    val big = Seq(Tuple1(Array(1048576.0f)), Tuple1(Array(1048576.0f)))
      .toDF("embedding")
    val e = intercept[Exception] {
      graft.ann.Gram.gramUpper(big, "embedding").collect()
    }
    assert(e.getMessage.contains("overflows BIGINT"))
    // and the normal regime is unchanged: [1.5] → floor(1.5e6)^2 per row
    val ok = Seq(Tuple1(Array(1.5f)), Tuple1(Array(1.5f))).toDF("embedding")
    val row = graft.ann.Gram.gramUpper(ok, "embedding")
      .select("n", "gram_u").as[(Long, Long)].head()
    assert(row === ((2L, 2L * 1500000L * 1500000L)))
  }

  test("RankStats: binned KS and U equal the exact ones when no intra-bin mass") {
    val s = spark
    import s.implicits._
    // every value sits exactly on a bin lower edge (width 25 → one distinct
    // value per bin): binning loses nothing, so binned == exact
    val rows = Seq(
      ("a", 0.0), ("a", 0.0), ("a", 25.0), ("a", 50.0), ("a", 75.0),
      ("b", 25.0), ("b", 50.0), ("b", 50.0), ("b", 100.0), ("b", 125.0))
      .toDF("g", "v")
    val aP = col("g") === "a"
    val bP = col("g") === "b"
    val exactDom = rows.groupBy(col("v").as("x"))
      .agg(sum(when(aP, 1L).otherwise(0L)).cast("long").as("ca"),
        sum(when(bP, 1L).otherwise(0L)).cast("long").as("cb"))
    import graft.data.RankStats
    val ksExact = RankStats.ksFromCounts(exactDom, "x")
      .select("n_a", "n_b", "d_num", "d_ppm").as[(Long, Long, Long, Long)].head()
    val ksBin = RankStats.ksBinned(rows, "v", aP, bP, 0.0, 25.0, 16)
      .select("n_a", "n_b", "d_num", "d_ppm").as[(Long, Long, Long, Long)].head()
    assert(ksBin === ksExact)
    val uExact = RankStats.mannWhitneyFromCounts(exactDom, "x")
      .select("n_a", "n_b", "u2_a", "u2_b", "identity_ok")
      .as[(Long, Long, Long, Long, Boolean)].head()
    val uBin = RankStats.mannWhitneyBinned(rows, "v", aP, bP, 0.0, 25.0, 16)
      .select("n_a", "n_b", "u2_a", "u2_b", "identity_ok")
      .as[(Long, Long, Long, Long, Boolean)].head()
    assert(uBin === uExact)
    assert(uBin._5, "2U_a + 2U_b == 2 n_a n_b")
    // and with INTRA-bin mass the binned form ties values the exact form
    // separates — the declared resolution contract, not an equality
    val spread = rows.withColumn("v", col("v") + when(aP, 0.0).otherwise(5.0))
    val ksSpread = RankStats.ksBinned(spread, "v", aP, bP, 0.0, 25.0, 16)
      .select("n_a", "n_b").as[(Long, Long)].head()
    assert(ksSpread === ((5L, 5L)), "totals preserved under intra-bin spread")
  }

  test("exact=false percentile paths: band filter, PSI, robust flags, winsorize") {
    val s = spark
    import s.implicits._
    val df = ((1 to 100).map(i => ("a", i.toLong)) ++
      (1 to 100).map(i => ("b", (i * 10).toLong)) :+ (("b", 100000L)))
      .toDF("g", "v")
    // band filter: approx bounds still cut both tails per stratum
    val band = graft.data.Sampling
      .percentileBandFilter(df, "v", "g", 0.1, 0.9, exact = false)
    val nA = band.filter(col("g") === "a").count()
    assert(nA >= 70 && nA <= 90, s"p10-p90 band kept $nA of 100")
    assert(band.columns.toSeq === df.columns.toSeq, "reserved cols dropped")
    // PSI: approx edges still partition everything; totals preserved
    val psi = graft.data.Drift.psiReport(df, "v", col("g") === "a",
      nBins = 5, exact = false)
    assert(psi.agg(sum("n_base")).as[Long].head() === 100L)
    assert(psi.agg(sum("n_curr")).as[Long].head() === 101L)
    assert(psi.count() <= 5)
    // robust flags: the 100000 point is an outlier under approx median/MAD
    val flags = graft.data.Outliers.robustFlags(df, "v", "g", exact = false)
    assert(flags.filter(col("v") === 100000L).select("is_outlier")
      .as[Boolean].head())
    assert(flags.count() === 201L)
    // winsorize bounds: sane integer band inside the value range
    val wbMap = graft.data.Outliers.winsorizeBounds(df, "v", "g",
      exact = false).collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(wbMap("a")._1 >= 1L && wbMap("a")._2 <= 100L &&
      wbMap("a")._1 <= wbMap("a")._2)
    assert(wbMap("b")._2 <= 100000L && wbMap("b")._1 <= wbMap("b")._2)
  }

  test("FuzzyJoin: exact pairs on a known fixture; short strings raise") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "kitten"), (2L, "sitten"), (3L, "sittin"),
      (4L, "banana"), (5L, "kitten")).toDF("id", "name")
    val got = graft.operators.FuzzyJoin
      .editDistanceSelfJoin(df, "id", "name", maxDist = 2)
      .as[(Long, Long, Int)].collect().toSet
    // kitten~sitten 1, sitten~sittin 1, kitten~sittin 2, dup kitten 0,
    // sitten/sittin vs the second kitten mirror the first; banana matches
    // nothing within 2
    assert(got === Set((1L, 2L, 1), (2L, 3L, 1), (1L, 3L, 2), (1L, 5L, 0),
      (2L, 5L, 1), (3L, 5L, 2)))
    val e = intercept[Exception] {
      graft.operators.FuzzyJoin
        .editDistanceSelfJoin(Seq((1L, "abc"), (2L, "xyz")).toDF("id", "n"),
          "id", "n", maxDist = 2).collect()
    }
    assert(e.getMessage.contains("q-gram count bound"))
  }

  test("KmvSketch: half-overlap Jaccard estimated within tolerance; exact under k") {
    val s = spark
    import s.implicits._
    // A = 0..1999, B = 1000..2999 → J = 1000/3000 = 1/3
    val rows = ((0 until 2000).map(i => ("a", i.toLong)) ++
      (1000 until 3000).map(i => ("b", i.toLong))).toDF("g", "k")
    val syn = graft.data.KmvSketch.kMinHashes(rows, "k", "g", k = 512)
    assert(syn.groupBy("g").count().as[(String, Long)].collect().toMap
      .values.forall(_ == 512L))
    val est = graft.data.KmvSketch.jaccardEstimatePpm(
      syn.filter(col("g") === "a"), syn.filter(col("g") === "b"), 512)
      .select("est_ppm").as[Long].head()
    assert(math.abs(est - 333333L) <= 70000L,
      s"J=1/3 within ~3 std errs, got $est ppm")
    // k >= |domain| → the synopsis IS the distinct set and the estimate is
    // exact: two tiny sets with J = 1/3
    val tiny = (Seq(("a", 1L), ("a", 2L), ("a", 3L), ("a", 4L)) ++
      Seq(("b", 3L), ("b", 4L), ("b", 5L), ("b", 6L))).toDF("g", "k")
    val tsyn = graft.data.KmvSketch.kMinHashes(tiny, "k", "g", k = 100)
    val texact = graft.data.KmvSketch.jaccardEstimatePpm(
      tsyn.filter(col("g") === "a"), tsyn.filter(col("g") === "b"), 100)
      .select("est_ppm").as[Long].head()
    assert(texact === 333333L)
  }

  test("BandedLevenshteinRule: comparisons rewrite to the threshold kernel, " +
      "same results") {
    val s = spark
    import s.implicits._
    // parquet source: a local Seq would let ConvertToLocalRelation fold
    // the whole filter at optimize time and hide the rewrite under test
    val pdocs = spark.read.parquet(s"$sf/part.parquet")
      .select(col("p_partkey").as("id"), col("p_name").as("a"),
        regexp_replace(col("p_name"), "^[^ ]* ", "").as("b"))
    val before = pdocs.filter(levenshtein(col("a"), col("b")) <= 2)
      .select("id").as[Long].collect().sorted
    s.experimental.extraOptimizations =
      s.experimental.extraOptimizations :+ graft.plans.BandedLevenshteinRule
    try {
      val q = pdocs.filter(levenshtein(col("a"), col("b")) <= 2)
      val optimized = q.queryExecution.optimizedPlan
      val rewritten = optimized.collect { case p => p }.flatMap(
        _.expressions.flatMap(_.collect {
          case l: org.apache.spark.sql.catalyst.expressions.Levenshtein
            if l.threshold.isDefined => l
        }))
      assert(rewritten.nonEmpty, s"expected threshold rewrite:\n$optimized")
      assert(q.select("id").as[Long].collect().sorted === before)
      // strict < rewrites with k-1
      val lt = pdocs.filter(levenshtein(col("a"), col("b")) < 3)
        .select("id").as[Long].collect().sorted
      assert(lt === before)
    } finally {
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations
          .filterNot(_ == graft.plans.BandedLevenshteinRule)
    }
  }

  test("ClusterEval: textbook hand values — P/R/F1 ppm and ARI") {
    val s = spark
    import s.implicits._
    // clusters {1,2,3},{4,5}; gold {1,2},{3,4,5}
    // TP = C(2,2)-pairs inside both: cells (c1,g1)=2 -> 1 pair,
    // (c1,g2)=1 -> 0, (c2,g2)=2 -> 1 pair => TP = 2
    // pred pairs = C(3,2)+C(2,2) = 4; gold pairs = C(2,2)+C(3,2) = 4
    // precision = recall = 2/4 = 0.5; F1 = 0.5; n2 = C(5,2) = 10
    // ARI = (10*2 - 4*4) / (10*(4+4)/2 - 4*4) = 4/24 = 1/6
    val df = Seq((1L, "c1", "g1"), (2L, "c1", "g1"), (3L, "c1", "g2"),
      (4L, "c2", "g2"), (5L, "c2", "g2")).toDF("id", "pred", "gold")
    val r = graft.ml.ClusterEval.pairwiseReport(df, "pred", "gold")
      .collect().head
    assert(r.getAs[Long]("tp_pairs") === 2L)
    assert(r.getAs[Long]("pred_pairs") === 4L)
    assert(r.getAs[Long]("gold_pairs") === 4L)
    assert(r.getAs[Long]("precision_ppm") === 500000L)
    assert(r.getAs[Long]("recall_ppm") === 500000L)
    assert(r.getAs[Long]("f1_ppm") === 500000L)
    assert(math.abs(r.getAs[Double]("ari") - 1.0 / 6.0) < 1e-12)
  }

  test("RankStats grouped KS: hand values per group, groups independent") {
    val s = spark
    import s.implicits._
    // group g1: A = {1,2}, B = {3,4} (disjoint) -> D = 1 (1e6 ppm)
    // group g2: A = {1,2}, B = {1,2} (identical) -> D = 0
    val counts = Seq(
      ("g1", 1L, 1L, 0L), ("g1", 2L, 1L, 0L),
      ("g1", 3L, 0L, 1L), ("g1", 4L, 0L, 1L),
      ("g2", 1L, 1L, 1L), ("g2", 2L, 1L, 1L))
      .toDF("g", "v", "ca", "cb")
    val r = graft.data.RankStats
      .ksFromCountsGrouped(counts, "v", Seq("g"))
      .collect().map(x => x.getString(0) -> x.getAs[Long]("d_ppm")).toMap
    assert(r === Map("g1" -> 1000000L, "g2" -> 0L))
  }

  test("Triangles.perVertex: hand-checked K4-minus-an-edge, reversed/dup " +
      "edges collapsed") {
    val s = spark
    import s.implicits._
    // edges of K4 minus {3,4}, with a duplicate and a reversed copy thrown
    // in: triangles are {1,2,3} and {1,2,4}
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 3L), (1L, 4L), (2L, 3L),
      (2L, 4L), (2L, 4L)).toDF("src", "dst")
    val got = graft.operators.Triangles.perVertex(edges, "src", "dst")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    // v1: d=3 tri=2 → 2·2/(3·2)=2/3; v2 same; v3: d=2 tri=1 → 1; v4 same
    assert(got.toSeq === Seq(
      (1L, 3L, 2L, 666666L), (2L, 3L, 2L, 666666L),
      (3L, 2L, 1L, 1000000L), (4L, 2L, 1L, 1000000L)))
  }

  test("RankStats.mannWhitneyFromCountsGrouped: per-group results equal " +
      "the ungrouped kernel run on each group") {
    val s = spark
    import s.implicits._
    val counts = Seq(
      ("g1", 1L, 2L, 0L), ("g1", 2L, 1L, 1L), ("g1", 3L, 0L, 2L),
      ("g2", 5L, 1L, 1L), ("g2", 7L, 2L, 2L))
      .toDF("g", "v", "ca", "cb")
    val grouped = graft.data.RankStats
      .mannWhitneyFromCountsGrouped(counts, "v", Seq("g"))
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("u2_a"), r.getAs[Long]("u2_b"),
         r.getAs[Boolean]("identity_ok"))).toMap
    for (g <- Seq("g1", "g2")) {
      val solo = graft.data.RankStats
        .mannWhitneyFromCounts(counts.filter($"g" === g).drop("g"), "v")
        .collect().head
      assert(grouped(g) === ((solo.getAs[Long]("u2_a"),
        solo.getAs[Long]("u2_b"), solo.getAs[Boolean]("identity_ok"))),
        s"group $g")
      assert(grouped(g)._3, s"tie identity must hold for $g")
    }
  }

  test("CmsStore join-size estimate: exact on a collision-free fixture, " +
      "never an underestimate, counters conserve mass") {
    val s = spark
    import s.implicits._
    val a = Seq(1L, 1L, 2L, 3L, 3L, 3L).toDF("k")
    val b = Seq(1L, 2L, 2L, 4L).toDF("k")
    val ca = graft.data.CmsStore.countersFor(a, "k")
    val cb = graft.data.CmsStore.countersFor(b, "k")
    // every hash row holds the full mass exactly once
    val rowMass = ca.groupBy("row_i")
      .agg(org.apache.spark.sql.functions.sum("cnt").as("m"))
      .as[(Int, Long)].collect().toMap
    assert(rowMass === Map(0 -> 6L, 1 -> 6L, 2 -> 6L, 3 -> 6L))
    val est = graft.data.CmsStore.joinSizeEstimate(ca, cb)
      .collect().head.getLong(0)
    // exact |A ⋈ B| = 2·1 + 1·2 = 4; 5 distinct keys in 256 buckets are
    // collision-free for this fixed md5 seed, so the estimate is exact —
    // and the ≥ bound holds unconditionally
    assert(est >= 4L, "CMS inner product must never underestimate")
    assert(est === 4L, "collision-free fixture estimates exactly")
  }

  test("Calibration.pavFit: textbook pooling — a decreasing pair pools to " +
      "its weighted mean, the tail stays; fit is monotone") {
    val s = spark
    import s.implicits._
    // rates 0.5, 0.2, 0.8 with n=10 each: PAV pools bins 1-2 → 0.35
    val bins = Seq((1L, 10L, 5L), (2L, 10L, 2L), (3L, 10L, 8L))
      .toDF("b", "n", "n_pos")
    val got = graft.data.Calibration.pavFit(bins)
      .orderBy("bin")
      .select("bin", "rate_ppm", "iso_fit")
      .as[(Long, Long, Double)].collect().toSeq
    assert(got.map(_._2) === Seq(500000L, 200000L, 800000L))
    assert(got.map(_._3) === Seq(0.35, 0.35, 0.8))
    assert(got.map(_._3).sliding(2).forall(p => p(0) <= p(1)),
      "isotonic fit must be non-decreasing")
  }

  test("Calibration.pavFitGrouped: per-segment fits equal the ungrouped " +
      "kernel run on each segment") {
    val s = spark
    import s.implicits._
    val bins = Seq(
      ("s1", 1L, 10L, 5L), ("s1", 2L, 10L, 2L), ("s1", 3L, 10L, 8L),
      ("s2", 1L, 4L, 1L), ("s2", 2L, 8L, 6L))
      .toDF("seg", "b", "n", "n_pos")
    val grouped = graft.data.Calibration.pavFitGrouped(bins, Seq("seg"))
      .select("seg", "bin", "iso_fit")
      .as[(String, Long, Double)].collect().toSet
    val solo = Seq("s1", "s2").flatMap { seg =>
      graft.data.Calibration.pavFit(bins.filter($"seg" === seg).drop("seg"))
        .select("bin", "iso_fit").as[(Long, Double)].collect()
        .map { case (b, f) => (seg, b, f) }
    }.toSet
    assert(grouped === solo)
    assert(grouped("s1", 1L, 0.35) || grouped.exists(t =>
      t._1 == "s1" && t._2 == 1L && t._3 == 0.35), "s1 pools bins 1-2")
  }

  test("Profile.keySkewGini: hand-checked on counts (1,1,2,4)") {
    val s = spark
    import s.implicits._
    val rows = Seq("k1", "k2", "k3", "k3", "k4", "k4", "k4", "k4")
      .toDF("key")
    val r = graft.data.Profile.keySkewGini(rows, "key").collect().head
    // sorted x=(1,1,2,4): Σi·x=25, S=8, n=4 → G=(50−40)/32=0.3125
    assert(r.getAs[Long]("n_keys") === 4L)
    assert(r.getAs[Long]("n_rows") === 8L)
    assert(r.getAs[Long]("max_c") === 4L)
    assert(r.getAs[Long]("gini_ppm") === 312500L)
    assert(r.getAs[Long]("top1_share_ppm") === 500000L)
  }

  test("Dedup.overlapSpans: one shared 7-word run localizes as one maximal " +
      "span with exact offsets") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "x1 x2 a b c d e f g x3"),
      (2L, "y1 a b c d e f g y2 y3"),
      (3L, "z1 z2 z3 z4 z5 z6 z7 z8")).toDF("doc_id", "text")
    val got = graft.data.Dedup
      .overlapSpans(docs, "doc_id", "text", k = 5, maxDf = 20, minGrams = 3)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    // 'a b c d e f g' = 3 consecutive 5-grams at word offsets 2 (doc 1)
    // and 1 (doc 2); doc 3 shares nothing
    assert(got === Seq((1L, 2L, 2L, 1L, 3L, 7L)))
  }

  test("FixedWidth DSv2 source: round-trip, blank-as-null, pruned filter " +
      "column, and post-scan fallback for unsupported predicates") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft_t_fw_").toFile
    val w = new java.io.PrintWriter(new java.io.File(dir, "part-0.txt"))
    w.println("           1purchase              5000")
    w.println("           2click                  100")
    w.println("                                      ") // all-blank = nulls
    w.println("           4purchase               200")
    w.close()
    def read() = s.read.format("graft.sources.FixedWidthDataSource")
      .option("widths", "user_id:long:12,event_type:string:10,v_micro:long:16")
      .load(dir.getAbsolutePath)
    // full read including the null row
    assert(read().count() === 4)
    assert(read().filter(col("user_id").isNull).count() === 1)
    // pushed EqualTo with the filter column PRUNED from the projection
    val vs = read().filter(col("event_type") === "purchase")
      .select("v_micro").as[Long].collect().sorted
    assert(vs.toSeq === Seq(200L, 5000L))
    // GreaterThan is not pushable here — must still evaluate post-scan
    assert(read().filter(col("v_micro") > 150L).count() === 2)
    graft.operators.FsUtil.deleteRecursively(dir)
  }

  test("HeavyHitters (Misra-Gries): guarantees hold on a skewed stream " +
      "across two batches — heavy item tracked, est within [true - n/(k+1), true]") {
    val s = spark
    import s.implicits._
    val base = Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_t_mg_" + s.sparkContext.applicationId)
    graft.operators.FsUtil.deleteRecursively(base.toFile)
    Files.createDirectories(base.resolve("data"))
    val schema = new StructType()
      .add("user_id", LongType)
      .add("item", org.apache.spark.sql.types.StringType)
    // user 1: 'a'×7, 'b'×4, then 6 singletons — n=17, k=3:
    // count('a')=7 > 17/4, so 'a' MUST survive any processing order
    val batch1 = Seq.fill(4)("a") ++ Seq.fill(2)("b") ++ Seq("c", "d")
    val batch2 = Seq.fill(3)("a") ++ Seq.fill(2)("b") ++ Seq("e", "f", "g", "h")
    val prev = s.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      def runOnce(): Unit = {
        val q = s.readStream.schema(schema).parquet(s"$base/data")
          .as[(Long, String)]
          .groupByKey(_._1)
          .transformWithState(new graft.streaming.HeavyHitters(3),
            org.apache.spark.sql.streaming.TimeMode.None(),
            OutputMode.Append())
          .toDF("user_id", "n_seen", "mg")
          .writeStream.format("parquet")
          .option("path", s"$base/out")
          .option("checkpointLocation", s"$base/ckpt")
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      batch1.map(i => (1L, i)).toDF("user_id", "item")
        .coalesce(1).write.mode("append").parquet(s"$base/data")
      runOnce()
      batch2.map(i => (1L, i)).toDF("user_id", "item")
        .coalesce(1).write.mode("append").parquet(s"$base/data")
      runOnce()
    } finally {
      prev match {
        case Some(p) =>
          s.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None =>
          s.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
    val fin = s.read.parquet(s"$base/out")
      .orderBy(org.apache.spark.sql.functions.desc("n_seen"))
      .select("n_seen", "mg").as[(Long, String)].collect().head
    assert(fin._1 === 17L, "n_seen accumulates across the checkpoint resume")
    val est = fin._2.split(",").filter(_.nonEmpty)
      .map(_.split(":")).map(a => a(0) -> a(1).toLong).toMap
    assert(est.size <= 3, "at most k counters survive")
    assert(est.contains("a"), "an item above n/(k+1) is always tracked")
    assert(est("a") <= 7L && est("a") * 4 >= 7L * 4 - 17L,
      s"MG bounds: got ${est("a")}")
  }

  test("Dedup.ngramJaccardPairsPrefix: identical pairs to the exhaustive " +
      "inverted-index kernel") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "the quick brown fox jumps over the lazy dog today"),
      (3L, "a completely different document about spark engines"),
      (4L, "a completely different document about spark clusters"),
      (5L, "short text")).toDF("doc_id", "text")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Long, Double)].collect().toSet
    val exhaustive = canon(graft.data.Dedup.ngramJaccardPairs(
      docs, "text", "doc_id", k = 5, threshold = 0.3))
    val prefix = canon(graft.data.Dedup.ngramJaccardPairsPrefix(
      docs, "text", "doc_id", k = 5, threshold = 0.3))
    assert(prefix === exhaustive)
    assert(exhaustive.nonEmpty, "fixture must actually produce pairs")
  }

  test("Profile.goodTuringTable: hand-checked on 'a a a b b c'") {
    val s = spark
    import s.implicits._
    val tokens = Seq("a", "a", "a", "b", "b", "c").toDF("term")
    val got = graft.data.Profile.goodTuringTable(tokens)
      .orderBy("c")
      .select("c", "n_c", "n_c1", "gt_cstar", "n_tokens", "n_types")
      .as[(Long, Long, Long, Double, Long, Long)].collect().toSeq
    // N1=N2=N3=1: c*=2·1/1=2 at c=1, 3·1/1=3 at c=2, 4·0/1=0 at c=3
    assert(got === Seq(
      (1L, 1L, 1L, 2.0, 6L, 3L),
      (2L, 1L, 1L, 3.0, 6L, 3L),
      (3L, 1L, 0L, 0.0, 6L, 3L)))
  }

  test("CategoryEncoder.encode: survives a caller frame that already has 'id'") {
    val s = spark
    import s.implicits._
    val df = Seq((10L, "a"), (11L, "b"), (12L, "a"), (13L, "zz"))
      .toDF("id", "cat")
    // minFreq 2: only "a" (freq 2) makes the vocabulary → id 0, OOV id 1
    val mapping = graft.features.CategoryEncoder.fit(df, "cat", maxSize = 8,
      minFreq = 2L)
    val out = graft.features.CategoryEncoder.encode(df, "cat", mapping, "cat_id")
    // the caller's id column is intact and the encoding is correct
    assert(out.columns.count(_ == "id") === 1)
    val got = out.select("id", "cat_id", "cat_id_is_oov")
      .as[(Long, Int, Boolean)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq === Seq(10L, 11L, 12L, 13L),
      "caller id values preserved")
    assert(got(0)._2 === 0 && got(2)._2 === 0, "'a' rows get fitted id 0")
    assert(got(1)._3 && got(3)._3, "below-minFreq categories fall to OOV")
  }

  test("Survival.kaplanMeier: Freireich 6-MP arm, textbook KM values") {
    val s = spark
    import s.implicits._
    // the classic 21-subject 6-MP remission data (Freireich et al. 1963):
    // + marks right-censoring
    val obs = Seq(
      (6, 1), (6, 1), (6, 1), (6, 0), (7, 1), (9, 0), (10, 1), (10, 0),
      (11, 0), (13, 1), (16, 1), (17, 0), (19, 0), (20, 0), (22, 1),
      (23, 1), (25, 0), (32, 0), (32, 0), (34, 0), (35, 0))
      .map { case (t, e) => (0L, t.toLong, e) }
      .toDF("cohort", "dur", "ev")
    val km = graft.data.Survival.kaplanMeier(obs, Seq("cohort"), "dur", "ev")
      .orderBy("t")
      .select("t", "n_risk", "d_events", "n_censored", "survival",
        "haz_q9", "cum_haz_q9")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getLong(5), r.getLong(6)))
    val expected = Seq(
      (6L, 21L, 3L, 1L, 0.857142857),
      (7L, 17L, 1L, 0L, 0.806722689),
      (10L, 15L, 1L, 1L, 0.752941176),
      (13L, 12L, 1L, 0L, 0.690196078),
      (16L, 11L, 1L, 0L, 0.627450980),
      (22L, 7L, 1L, 0L, 0.537815126),
      (23L, 6L, 1L, 0L, 0.448179272))
    assert(km.length === expected.length)
    var cum = 0L
    km.zip(expected).foreach {
      case ((t, n, d, c, surv, haz, cumHaz), (et, en, ed, ec, es)) =>
        assert(t === et && n === en && d === ed && c === ec)
        // survival is the plain-double KM product (never hashed — banded
        // by callers); the textbook values are 9-dp truncations
        assert(math.abs(surv - es) < 1e-6, s"t=$t survival $surv vs $es")
        // the hashable surface: exact integer d·10⁹ div n and its running
        // Nelson–Aalen sum
        assert(haz === (BigInt(d) * 1000000000 / BigInt(n)).toLong,
          s"t=$t haz_q9")
        cum += haz
        assert(cumHaz === cum, s"t=$t cum_haz_q9")
    }
  }

  test("Survival.kaplanMeier: risk set empties => survival exactly zero") {
    val s = spark
    import s.implicits._
    val obs = Seq((0L, 1L, 1), (0L, 2L, 1), (0L, 2L, 1))
      .toDF("cohort", "dur", "ev")
    val km = graft.data.Survival.kaplanMeier(obs, Seq("cohort"), "dur", "ev")
      .orderBy("t").select("t", "n_risk", "d_events", "survival").collect()
    assert(km.length === 2)
    assert(km(0).getLong(1) === 3 && km(1).getLong(1) === 2)
    assert(km(1).getDouble(3) === 0.0,
      "terminal event time with d == n_risk must be exactly zero")
  }

  test("Contingency.chiSquare: 2x2 hand table") {
    val s = spark
    import s.implicits._
    // O = [[10,20],[30,40]] => chi2 = N(ad-bc)^2/(R1 R2 C1 C2) = 0.793650793
    val rows = Seq.fill(10)(("x", "p")) ++ Seq.fill(20)(("x", "q")) ++
      Seq.fill(30)(("y", "p")) ++ Seq.fill(40)(("y", "q"))
    val got = graft.data.Contingency.chiSquare(rows.toDF("a", "b"), "a", "b")
      .collect().head
    assert(got.getAs[Long]("n") === 100L)
    assert(got.getAs[Long]("dof") === 1L)
    // exact per-cell floor terms: 333333 + 222222 + 142857 + 95238
    assert(got.getAs[Long]("chi2_ppm") === 793650L)
    val v = got.getAs[Long]("cramers_v_q9") / 1e9
    assert(math.abs(v - math.sqrt(0.793650793 / 100.0)) < 1e-6)
  }

  test("Contingency.anovaOneWay: hand moments incl. the declared floor-div") {
    val s = spark
    import s.implicits._
    // a: [1,2,3], b: [5,7] => bg = 36//3 + 144//2 = 84;
    // corr = 324//5 = 64 (floor — declared semantics); ssb = 20, ssw = 4;
    // F = (20/1)/(4/3) = 15; eta^2 = 20/24
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("b", 5L), ("b", 7L))
      .toDF("g", "v")
    val got = graft.data.Contingency.anovaOneWay(df, "g", "v").collect().head
    assert(got.getAs[Long]("n_total") === 5L)
    assert(got.getAs[Long]("k_groups") === 2L)
    assert(got.getAs[Long]("ssb") === 20L)
    assert(got.getAs[Long]("ssw") === 4L)
    // F = 20·3·10⁶ div (4·1) = 15e6 ppm; η² = 20·10⁹ div 24
    assert(got.getAs[Long]("f_ppm") === 15000000L)
    assert(got.getAs[Long]("eta_sq_q9") === 833333333L)
  }

  test("Survivorship.goldenRecord: every policy + its tie-break, by hand") {
    val s = spark
    import s.implicits._
    import graft.data.Survivorship._
    // entity 1: mode tie between "a" and "b" (2 each) -> smallest ("a");
    // latest by (ts, id): (3,31) carries v=7; extremes 2/9
    val recs = Seq(
      (1L, "b", 1L, 10L, 9L), (1L, "a", 2L, 20L, 2L),
      (1L, "a", 3L, 30L, 5L), (1L, "b", 3L, 31L, 7L),
      (2L, "z", 9L, 90L, 4L))
      .toDF("k", "cat", "ts", "id", "v")
    val got = goldenRecord(recs, Seq("k"), Seq(
      Mode("cat"), Latest("v", Seq("ts", "id")), Max("ts"), Min("id")))
      .orderBy("k")
      .select("k", "n_records", "cat", "v", "ts", "id")
      .as[(Long, Long, String, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (1L, 4L, "a", 7L, 3L, 10L),
      (2L, 1L, "z", 4L, 9L, 90L)))
  }

  test("Pca: known 2D principal axis, orthonormal loadings, exact projection") {
    val s = spark
    import s.implicits._
    // points on y = x plus symmetric off-axis noise: first PC is (1,1)/sqrt(2)
    val pts = Seq(
      Array(1.0f, 1.0f), Array(2.0f, 2.0f), Array(3.0f, 3.0f),
      Array(4.0f, 4.0f), Array(2.5f, 1.5f), Array(1.5f, 2.5f))
      .toDF("vec")
    val m = graft.ann.Pca.fit(pts, "vec", 2)
    assert(m.d === 2 && m.n === 6L)
    assert(m.orthonormalDefect < 1e-9)
    assert(m.eigenvalues(0) >= m.eigenvalues(1))
    val pc1 = m.components(0)
    val inv = 1.0 / math.sqrt(2.0)
    assert(math.abs(math.abs(pc1(0)) - inv) < 1e-9 &&
      math.abs(math.abs(pc1(1)) - inv) < 1e-9,
      s"pc1 = ${pc1.toSeq}")
    assert(pc1(0) > 0, "sign convention: largest-|loading| coord positive")
    // trace = sum of eigenvalues (rotation preserves it)
    assert(math.abs(m.trace - m.eigenvalues.sum) < 1e-6 * m.trace)
    // projection of the mean point is the zero vector
    val mean = Seq(Array.tabulate(2)(i => (m.meanU(i) / 1e6).toFloat))
      .toDF("vec")
    val z = graft.ann.Pca.project(mean, "vec", m, "p")
      .select("p").as[Seq[Double]].collect().head
    assert(z.forall(v => math.abs(v) < 2.0),
      s"mean projects to ~0 (1e-6 quantization slack): $z")
  }

  test("Pca.jacobi: [[2,1],[1,2]] -> eigenvalues {3,1}") {
    val (vals, vecs) = graft.ann.Pca.jacobi(
      Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(vals.max - 3.0) < 1e-12)
    assert(math.abs(vals.min - 1.0) < 1e-12)
    // eigenvector columns orthonormal
    val dot = vecs(0)(0) * vecs(0)(1) + vecs(1)(0) * vecs(1)(1)
    assert(math.abs(dot) < 1e-12)
  }

  test("Bpe: merge order and greedy encode on the classic toy corpus") {
    import graft.functions.Bpe
    // (a,b) count 5 beats (b,a) count 2 -> merge 0 = (a,b);
    // then (ab,ab) appears twice -> merge 1
    val m = Bpe.fit(Seq(("abab", 2L), ("ab", 1L)), nMerges = 5)
    assert(m.merges.take(2) === Seq(("a", "b"), ("ab", "ab")))
    assert(m.encodeWord("ababab") === List("abab", "ab"),
      "lowest-rank pair merges left-to-right")
    assert(m.encodeWord("ba") === List("b", "a"), "no merge applies")
    assert(m.encodeWord("x") === List("x"))
    // lossless roundtrip on arbitrary input
    Seq("abababab", "aabb", "bbaa", "abba").foreach { w =>
      assert(m.encodeWord(w).mkString === w)
    }
  }

  test("Survival.logRank: hand-computed two-group example") {
    val s = spark
    import s.implicits._
    // A: [1+e, 2+e]; B: [1 censored, 2+e, 3+e]
    // t=1: O_A=1, E+=1*2/5=0.4, V+=0.24; t=2: O_A+=1, E+=2/3, V+=2/9
    // t=3: N=1 -> E+=0 (da+db>0 but na=0), V guard
    val obs = Seq((1, 1L, 1), (1, 2L, 1), (0, 1L, 0), (0, 2L, 1),
      (0, 3L, 1)).toDF("grp", "dur", "ev")
    val r = graft.data.Survival.logRank(obs, "grp", "dur", "ev")
      .collect().head
    assert(r.getAs[Long]("o_a") === 2L)
    // exact q9 increments: E = 1·2·10⁹ div 5 + 2·1·10⁹ div 3 + 0,
    // V = 1·2·3·4·10⁹ div 100 + 2·1·2·1·10⁹ div 18 + 0
    assert(r.getAs[Long]("e_a_q9") === 400000000L + 666666666L)
    assert(r.getAs[Long]("v_q9") === 240000000L + 222222222L)
    // χ² = (2·10⁹ − E_q9)² div (V_q9·10³), replayed exactly in BigInt
    val expectChi = ((BigInt(2000000000L) - 1066666666L).pow(2) /
      (BigInt(462222222L) * 1000)).toLong
    assert(r.getAs[Long]("chi2_ppm") === expectChi)
    assert(math.abs(expectChi / 1e6 - 1.884615385) < 1e-5,
      "quantized chi2 agrees with the hand double value")
  }

  test("Contingency.woeIv: hand WOE/IV incl. zero-class bucket exclusion") {
    val s = spark
    import s.implicits._
    // b0: 2 pos / 2 neg; b1: 1 pos / 3 neg; b2: 1 pos / 0 neg (excluded)
    val rows = Seq((1L, 0L), (1L, 0L), (0L, 0L), (0L, 0L),
      (1L, 1L), (0L, 1L), (0L, 1L), (0L, 1L), (1L, 2L))
      .toDF("y", "vb")
    val got = graft.data.Contingency.woeIv(rows, "y", "vb")
      .orderBy("bucket").collect()
    assert(got.length === 3)
    // exact hashable surface: odds = 2·5 / (2·4) → 1250000000 q9
    assert(got(0).getAs[Long]("odds_q9") === 1250000000L)
    assert(got(2).isNullAt(got(2).fieldIndex("odds_q9")),
      "zero-neg bucket gets NULL odds_q9")
    // ln-derived doubles (callers band them, never hash them)
    val woe0 = got(0).getAs[Double]("woe")
    assert(math.abs(woe0 - math.log(1.25)) < 1e-12)
    assert(got(2).isNullAt(got(2).fieldIndex("woe")),
      "zero-neg bucket gets NULL woe")
    val iv = got(0).getAs[Double]("iv")
    assert(math.abs(iv - 0.328728413) < 1e-6)
    assert(got.map(_.getAs[Double]("iv")).distinct.length === 1,
      "iv repeated identically on every row")
  }

  test("Contingency.mcnemar: exact integer ppm + continuity correction") {
    val s = spark
    import s.implicits._
    val rows = Seq((1, 0), (1, 0), (1, 0), (0, 1), (1, 1), (1, 1), (0, 0))
      .toDF("f1", "f2")
    val r = graft.data.Contingency.mcnemar(rows, "f1", "f2").collect().head
    assert(r.getAs[Long]("n_pairs") === 7L)
    assert(r.getAs[Long]("b") === 3L && r.getAs[Long]("c") === 1L)
    assert(r.getAs[Long]("mcnemar_ppm") === 1000000L)     // 4/4
    assert(r.getAs[Long]("mcnemar_cc_ppm") === 250000L)   // 1/4
  }

  test("Contingency.chiSquareFromCellsGrouped: per-group == ungrouped run " +
      "group by group; zero cells contribute expected mass") {
    val s = spark
    import s.implicits._
    val cells = Seq(
      ("g1", "x", "p", 10L), ("g1", "x", "q", 20L),
      ("g1", "y", "p", 30L), ("g1", "y", "q", 40L),
      ("g2", "x", "p", 5L), ("g2", "x", "q", 0L),
      ("g2", "y", "p", 2L), ("g2", "y", "q", 8L))
      .toDF("g", "a", "b", "o")
    val grouped = graft.data.Contingency
      .chiSquareFromCellsGrouped(cells, Seq("g"))
      .orderBy("g").collect()
    assert(grouped.length === 2)
    Seq("g1", "g2").zipWithIndex.foreach { case (g, i) =>
      val solo = graft.data.Contingency.chiSquareFromCellsGrouped(
        cells.filter(col("g") === g).drop("g"), Nil).collect().head
      assert(grouped(i).getAs[Long]("chi2_ppm") ===
        solo.getAs[Long]("chi2_ppm"), s"group $g")
      assert(grouped(i).getAs[Long]("n") === solo.getAs[Long]("n"))
    }
    // g1 is the hand 2x2 from the ungrouped unit (exact floor-term sum)
    assert(grouped(0).getAs[Long]("chi2_ppm") === 793650L)
    // g2's zero cell: chi2 = 15*(5*8-0*2)^2/(5*10*7*8) = 24000/2800 ≈
    // 8.571428; each of the 4 cells floors < 1 ppm, so the exact-integer
    // sum sits within 4 ppm below the real value
    val g2 = grouped(1).getAs[Long]("chi2_ppm")
    assert(g2 <= 8571428L && g2 > 8571428L - 4L, s"g2 chi2_ppm $g2")
  }

  test("Conformal.calibrate: exact order-statistic rank and coverage") {
    val s = spark
    import s.implicits._
    // calib residuals 1..10 (y=pred+r), test residuals {5, 10, 11}
    val calib = (1 to 10).map(r => (2, 100L + r, 100L))
    val test = Seq(5, 10, 11).map(r => (3, 100L + r, 100L))
    val df = (calib ++ test).toDF("split", "y", "pred")
    val r = graft.ml.Conformal.calibrate(df, "split", "y", "pred",
      calibVal = 2, testVal = 3, alphaPpm = 100000L).collect().head
    assert(r.getAs[Long]("n_calib") === 10L)
    assert(r.getAs[Long]("k_rank") === 10L) // ceil(11 * 0.9) = 10
    assert(r.getAs[Long]("q_hat_u") === 10L)
    assert(r.getAs[Long]("coverage_ppm") === 666666L) // 2 of 3
    // k beyond n_calib: interval unbounded, coverage trivially 1e6
    val r2 = graft.ml.Conformal.calibrate(df, "split", "y", "pred",
      calibVal = 2, testVal = 3, alphaPpm = 1L).collect().head
    assert(r2.getAs[Long]("k_rank") === 11L)
    assert(r2.isNullAt(r2.fieldIndex("q_hat_u")))
    assert(r2.getAs[Long]("coverage_ppm") === 1000000L)
  }

  test("TargetEncoder.encodingTable: out-of-fold means + prior fallback") {
    val s = spark
    import s.implicits._
    val rows = Seq(("A", 0L, 10L), ("A", 0L, 20L), ("A", 1L, 30L),
      ("B", 0L, 100L)).toDF("cat", "fold", "y")
    val got = graft.features.TargetEncoder
      .encodingTable(rows, "cat", "fold", "y")
      .orderBy("cat", "fold")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      ("A", 0L, 2L, 30L),   // (60-30)/(3-2)
      ("A", 1L, 1L, 15L),   // (60-30)/(3-1)
      ("B", 0L, 1L, 20L)))  // only-fold category: OOF prior (160-100)/3
  }

  test("DoubleML.ate: recovers a constructed exact effect of 100 units") {
    val s = spark
    import s.implicits._
    // y = 100*d + 10*seg, balanced over (seg, fold, d): OOF means are
    // exact, residuals align perfectly -> theta exactly 100
    val rows = for {
      seg <- Seq(0L, 1L); fold <- Seq(0, 1); d <- Seq(0, 1)
    } yield (seg, fold, d, 100L * d + 10L * seg)
    val r = graft.ml.DoubleML.ate(rows.toDF("seg", "fold", "d", "y"),
      "fold", "seg", "d", "y").collect().head
    assert(r.getAs[Long]("n") === 8L)
    assert(r.getAs[Long]("theta_u") === 100L)
  }

  test("Uplift.qiniDeciles: explicit decile formula and exact cum uplift") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      (1L, 50L, 1, 1), (2L, 40L, 0, 0), (3L, 30L, 1, 1),
      (4L, 20L, 0, 1), (5L, 10L, 1, 0))
      .toDF("id", "score", "d", "resp")
    val got = graft.ml.Uplift.qiniDeciles(rows, "id", "score", "d", "resp")
      .orderBy("decile").collect()
    assert(got.map(_.getAs[Long]("decile")).toSeq === Seq(0L, 2L, 4L, 6L, 8L))
    // top decile: treated-only -> no control arm yet -> NULL
    assert(got(0).isNullAt(got(0).fieldIndex("cum_uplift_ppm")))
    assert(got(1).getAs[Long]("cum_uplift_ppm") === 1000000L)
    assert(got(2).getAs[Long]("cum_uplift_ppm") === 1000000L)
    assert(got(3).getAs[Long]("cum_uplift_ppm") === 500000L)
    assert(got(4).getAs[Long]("cum_uplift_ppm") === 166666L)
  }

  test("Raking.ipf: exactly-separable margins converge in one iteration " +
      "with zero gaps") {
    val s = spark
    import s.implicits._
    // uniform sample, row-separable targets: w = [[5,5],[15,15]] exactly
    val sample = Seq(("r0", "c0"), ("r0", "c1"), ("r1", "c0"), ("r1", "c1"))
      .toDF("a", "b")
    val targets = Seq(("r0", "c0", 5L), ("r0", "c1", 5L),
      ("r1", "c0", 15L), ("r1", "c1", 15L)).toDF("a", "b", "target_n")
    val got = graft.data.Raking.ipf(sample, targets, "a", "b", iters = 1)
      .orderBy("a", "b").collect()
    assert(got.map(_.getAs[Long]("weight_q9")).toSeq ===
      Seq(5000000000L, 5000000000L, 15000000000L, 15000000000L))
    assert(got.forall(_.getAs[Long]("row_absgap_ppm") === 0L))
    assert(got.forall(_.getAs[Long]("col_absgap_ppm") === 0L))
  }

  test("Raking.ipf: skewed sample margins shrink toward targets") {
    val s = spark
    import s.implicits._
    val sample = (Seq.fill(1)(("r0", "c0")) ++ Seq.fill(2)(("r0", "c1")) ++
      Seq.fill(3)(("r1", "c0")) ++ Seq.fill(4)(("r1", "c1")))
      .toDF("a", "b")
    val targets = Seq(("r0", "c0", 10L), ("r0", "c1", 20L),
      ("r1", "c0", 30L), ("r1", "c1", 40L)).toDF("a", "b", "target_n")
    val got = graft.data.Raking.ipf(sample, targets, "a", "b", iters = 3)
      .collect()
    assert(got.forall(_.getAs[Long]("row_absgap_ppm") < 1000L),
      "row margins within 0.1% after 3 iterations")
    assert(got.forall(_.getAs[Long]("col_absgap_ppm") < 1000L))
    assert(got.forall(_.getAs[Long]("weight_q9") > 0L))
  }

  test("Hilbert.withIndex: matches the imperative xy2d reference; " +
      "bijection + unit-step adjacency") {
    val s = spark
    import s.implicits._
    def ref(order: Int, x0: Long, y0: Long): Long = {
      var (x, y, d) = (x0, y0, 0L)
      var step = 1L << (order - 1)
      while (step > 0) {
        val rx = if ((x & step) > 0) 1L else 0L
        val ry = if ((y & step) > 0) 1L else 0L
        d += step * step * ((3 * rx) ^ ry)
        if (ry == 0) {
          if (rx == 1) { x = step - 1 - x; y = step - 1 - y }
          val t = x; x = y; y = t
        }
        step >>= 1
      }
      d
    }
    val order = 5
    val n = 1 << order
    val cells = (for (x <- 0 until n; y <- 0 until n) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val got = graft.data.Hilbert.withIndex(cells, "x", "y", order, "h")
      .select("x", "y", "h").as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, h) =>
      assert(h === ref(order, x, y), s"($x,$y)")
    }
    // bijection onto [0, 4^order)
    assert(got.map(_._3).sorted.toSeq === (0L until (n.toLong * n)).toSeq)
    // consecutive ranks are grid-adjacent: the Hilbert guarantee
    val byH = got.sortBy(_._3)
    byH.sliding(2).foreach { case Array((x1, y1, _), (x2, y2, _)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1L)
    }
  }

  test("ClassifierEval.confusionReport: hand confusion incl. FP-only class") {
    val s = spark
    import s.implicits._
    // true a: 3 rows (2 pred a, 1 pred b); true b: 2 rows (1 b, 1 c);
    // c never true but predicted once (affects nothing emitted except
    // via pred_n of c's absence from rows)
    val rows = Seq(("a", "a"), ("a", "a"), ("a", "b"), ("b", "b"),
      ("b", "c")).toDF("t", "p")
    val got = graft.ml.ClassifierEval.confusionReport(rows, "t", "p")
      .orderBy("label").collect()
    assert(got.map(_.getAs[String]("label")).toSeq === Seq("a", "b"))
    val a = got(0); val b = got(1)
    assert(a.getAs[Long]("support") === 3L && a.getAs[Long]("pred_n") === 2L
      && a.getAs[Long]("tp") === 2L)
    assert(a.getAs[Long]("precision_ppm") === 1000000L)
    assert(a.getAs[Long]("recall_ppm") === 666666L)
    assert(a.getAs[Long]("f1_ppm") === 800000L) // 2*2/(2+3)
    assert(b.getAs[Long]("support") === 2L && b.getAs[Long]("pred_n") === 2L
      && b.getAs[Long]("tp") === 1L)
    assert(b.getAs[Long]("f1_ppm") === 500000L) // 2*1/(2+2)
    assert(a.getAs[Long]("accuracy_ppm") === 600000L) // 3/5
    assert(a.getAs[Long]("macro_f1_ppm") === 650000L) // (800000+500000)/2
  }

  test("q322's floor-quantized EWMA recursion: hand values") {
    val s = spark
    import s.implicits._
    val df = Seq(("a", java.sql.Date.valueOf("2024-01-01"), 10L),
      ("a", java.sql.Date.valueOf("2024-01-02"), 20L),
      ("a", java.sql.Date.valueOf("2024-01-03"), 10L))
      .toDF("event_type", "day", "x")
    val got = df.groupBy("event_type")
      .agg(sort_array(collect_list(struct(col("day"), col("x"))))
        .as("__days"))
      .select(expr(
        """explode(transform(sequence(1, size(__days)), t ->
             aggregate(slice(__days, 2, t - 1),
               element_at(__days, 1).x * 1000000L,
               (acc, e) -> CAST(floor(0.3D * (e.x * 1000000L) +
                 0.7D * acc) AS BIGINT))))""").as("ewma_u"))
      .as[Long].collect().toSeq
    // 10e6; floor(.3*20e6+.7*10e6)=13e6; floor(.3*10e6+.7*13e6)=12.1e6
    assert(got === Seq(10000000L, 13000000L, 12100000L))
  }

  test("monotone WOE composition: PAV merges a rate violation, WOE on " +
      "merged segments") {
    val s = spark
    import s.implicits._
    // rates .5 then .25 violate monotonicity -> PAV pools to one segment
    val bins = Seq((0L, 4L, 2L), (1L, 4L, 1L)).toDF("b", "n", "n_pos")
    val fit = graft.data.Calibration.pavFit(bins)
    val merged = fit.groupBy(col("iso_fit"))
      .agg(min("bin").cast("long").as("bin_lo"),
        max("bin").cast("long").as("bin_hi"),
        sum("n_pos").cast("long").as("n_pos"),
        (sum("n") - sum("n_pos")).cast("long").as("n_neg"))
    val woe = graft.data.Contingency.woeIvFromCounts(merged).collect()
    assert(woe.length === 1)
    assert(woe(0).getAs[Long]("bin_lo") === 0L)
    assert(woe(0).getAs[Long]("bin_hi") === 1L)
    assert(woe(0).getAs[Long]("n_pos") === 3L && woe(0).getAs[Long]("n_neg") === 5L)
    // one segment: pos/POS == neg/NEG == 1 -> odds exactly 1e9, woe/iv 0
    assert(woe(0).getAs[Long]("odds_q9") === 1000000000L)
    assert(woe(0).getAs[Double]("woe") === 0.0)
    assert(woe(0).getAs[Double]("iv") === 0.0)
    assert(woe(0).getAs[Double]("iso_fit") === 0.375)
  }

  test("GramStore: two-batch merged moments == one-shot moments, and " +
      "fitPca == Pca.fit bit-for-bit") {
    val s = spark
    import s.implicits._
    val vecs = Seq(
      (0L, Array(1.0f, 2.0f, 3.0f)), (1L, Array(2.0f, 1.0f, 0.5f)),
      (2L, Array(0.1f, 0.2f, 0.9f)), (3L, Array(3.0f, 2.5f, 1.5f)))
      .toDF("vec_id", "vec")
    val path = java.nio.file.Files
      .createTempDirectory("gramstore").toString + "/store"
    graft.ann.GramStore.appendBatch(vecs.filter(col("vec_id") < 2), "vec",
      0L, path, overwrite = true)
    graft.ann.GramStore.appendBatch(vecs.filter(col("vec_id") >= 2), "vec",
      1L, path)
    val (gram, sums, n) = graft.ann.GramStore.mergedMoments(s, path)
    assert(n === 4L)
    // merged gram equals the direct kernel's cells
    val direct = graft.ann.Gram.gramUpper(vecs, "vec").collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getLong(3))).toMap
    assert(gram === direct)
    val mStore = graft.ann.GramStore.fitPca(s, path, 2)
    val mScan = graft.ann.Pca.fit(vecs, "vec", 2)
    assert(java.util.Arrays.equals(mStore.eigenvalues, mScan.eigenvalues))
    assert(java.util.Arrays.equals(mStore.meanU, mScan.meanU))
    mStore.components.zip(mScan.components).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(a, b))
    }
    assert(sums.keySet === Set(0, 1, 2))
  }

  test("BloomIndex: sound (no false negatives) and effective pruning") {
    val s = spark
    import s.implicits._
    // 10 partitions, each with disjoint keys p*100..p*100+9
    val rows = (for (p <- 0 until 10; k <- 0 until 10)
      yield (p.toLong, p * 100L + k)).toDF("part", "key")
    val base = java.nio.file.Files
      .createTempDirectory("bloomidx").toString
    rows.write.partitionBy("part").mode("overwrite")
      .parquet(s"$base/store")
    graft.data.BloomIndex.build(s.read.parquet(s"$base/store"), "part",
      "key", s"$base/bloom")
    // keys live in partitions 2 and 7 only; 999999 exists nowhere
    val keys: Seq[Any] = Seq(203L, 207L, 701L, 999999L)
    val (res, scanned) = graft.data.BloomIndex.lookup(s, s"$base/store",
      s"$base/bloom", "part", "key", keys)
    val got = res.select("key").as[Long].collect().sorted.toSeq
    assert(got === Seq(203L, 207L, 701L), "exactly the existing keys")
    assert(scanned >= 2 && scanned < 10,
      s"pruning must keep the 2 true partitions and skip most others " +
        s"(scanned=$scanned)")
    // a miss-only probe prunes everything modulo false positives
    val (res2, scanned2) = graft.data.BloomIndex.lookup(s, s"$base/store",
      s"$base/bloom", "part", "key", Seq(424242L))
    assert(res2.count() === 0L)
    assert(scanned2 <= 2, s"miss probe should scan ~0 partitions " +
      s"(fp-bounded), got $scanned2")
  }

  test("BradleyTerry.fit: 2-item MLE ratio and transitive ordering") {
    val s = spark
    import s.implicits._
    // two items: MLE has r_A/r_B = 3 (A won 3 of 4)
    val p2 = Seq(("A", "B", 3L), ("B", "A", 1L)).toDF("a", "b", "wins")
    val r2 = graft.ml.BradleyTerry.fit(p2, iters = 6)
      .orderBy("rank").collect()
    assert(r2.map(_.getAs[String]("item")).toSeq === Seq("A", "B"))
    val ratio = r2(0).getAs[Long]("rating_micro").toDouble /
      r2(1).getAs[Long]("rating_micro").toDouble
    assert(math.abs(ratio - 3.0) < 0.05, s"ratio $ratio should approach 3")
    assert(r2(0).getAs[Long]("games") === 4L && r2(0).getAs[Long]("wins") === 3L)
    // consistent A > B > C tournament sorts correctly
    val p3 = Seq(("A", "B", 8L), ("B", "A", 2L), ("B", "C", 8L),
      ("C", "B", 2L), ("A", "C", 9L), ("C", "A", 1L)).toDF("a", "b", "wins")
    val r3 = graft.ml.BradleyTerry.fit(p3, iters = 6).orderBy("rank")
      .collect()
    assert(r3.map(_.getAs[String]("item")).toSeq === Seq("A", "B", "C"))
    // mean rating stays (floor-)normalized at ~1e6
    val mean = r3.map(_.getAs[Long]("rating_micro")).sum / 3
    assert(math.abs(mean - 1000000L) <= 2L)
  }

  test("FellegiSunter.weights: hand m/u/weights + degenerate-feature guard") {
    val s = spark
    import s.implicits._
    // f1: 3/4 matches agree, 2/10 non-matches agree;
    // f2: all 4 matches agree (w_disagree undefined -> NULL)
    val pairs = (Seq.fill(3)((1, 1, 1)) ++ Seq((1, 0, 1)) ++
      Seq.fill(2)((0, 1, 0)) ++ Seq.fill(8)((0, 0, 0)))
      .map { case (l, f1, _) => (l, f1, l) } // f2 agrees iff match
      .toDF("lbl", "f1", "f2")
    val got = graft.ml.FellegiSunter.weights(pairs, "lbl", Seq("f1", "f2"))
      .orderBy("feature").collect()
    val f1 = got(0); val f2 = got(1)
    assert(f1.getAs[String]("feature") === "f1")
    assert(f1.getAs[Long]("n_match") === 4L && f1.getAs[Long]("n_unmatch") === 10L)
    assert(f1.getAs[Long]("n_agree_match") === 3L)
    assert(f1.getAs[Long]("n_agree_unmatch") === 2L)
    assert(f1.getAs[Long]("m_ppm") === 750000L)
    assert(f1.getAs[Long]("u_ppm") === 200000L)
    // ln weights are plain unquantized doubles (band, never hash)
    assert(math.abs(f1.getAs[Double]("w_agree") - math.log(3.75)) < 1e-12)
    assert(math.abs(f1.getAs[Double]("w_disagree") - math.log(0.3125))
      < 1e-12)
    // degenerate: m = 1 (all matches agree), u = 0 -> w_agree needs au>0
    assert(f2.getAs[Long]("m_ppm") === 1000000L)
    assert(f2.getAs[Long]("u_ppm") === 0L)
    assert(f2.isNullAt(f2.fieldIndex("w_agree")))
    assert(f2.isNullAt(f2.fieldIndex("w_disagree")))
  }
}
