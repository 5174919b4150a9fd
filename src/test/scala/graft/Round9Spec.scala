package graft

import org.apache.spark.sql.functions._

import graft.data.{AggStore, SketchStore}

/** Round-9 units: compaction for the two aggregation stores (file-count
  * contract + report/estimate stability across the rewrite).
  */
class Round9Spec extends SparkSpec {
  import spark.implicits._

  test("AggStore.compactStore: one file per day, report bit-identical") {
    val tmp = System.getProperty("java.io.tmpdir")
    val path = s"$tmp/graft_r9_aggstore_compact"
    val rows = (1 to 200).map { i =>
      (s"2024-02-${"%02d".format(i % 5 + 1)} 0${i % 10}:00:00",
        if (i % 3 == 0) "click" else "view", i.toDouble / 7.0)
    }.toDF("ts", "event_type", "value")
      .select(col("ts").cast("timestamp").as("ts"), col("event_type"),
        col("value"))
    // two overlapping writes: every day gets files from both
    AggStore.writeDaily(rows.filter(hour(col("ts")) < 5), "ts", "event_type",
      "value", path)
    AggStore.appendDaily(rows.filter(hour(col("ts")) >= 5), "ts",
      "event_type", "value", path)
    val pre = AggStore.report(spark, path, "event_type",
      from = "2024-02-01", to = "2024-02-06").collect().toSet
    val (before, after) = AggStore.compactStore(spark, path, nDays = 5)
    assert(after == 5, s"expected one file per day, got $after")
    assert(before > after, s"files $before -> $after")
    val post = AggStore.report(spark, path, "event_type",
      from = "2024-02-01", to = "2024-02-06").collect().toSet
    assert(post == pre, "report changed across compaction")
  }

  test("HistStore: append folds, percentile bin is the exact order statistic") {
    import graft.data.HistStore
    val tmp = System.getProperty("java.io.tmpdir")
    val path = s"$tmp/graft_r9_histstore"
    // 100 values 0..99 on one day, split across write + append
    val rows = (0 until 100).map(i => ("2024-03-01 00:00:00", i.toDouble))
      .toDF("ts", "value")
      .select(col("ts").cast("timestamp").as("ts"), col("value"))
    HistStore.writeDaily(rows.filter(col("value") < 40), "ts", "value", path,
      lo = 0.0, width = 10.0, nBins = 10)
    HistStore.appendDaily(rows.filter(col("value") >= 40), "ts", "value", path,
      lo = 0.0, width = 10.0, nBins = 10)
    val rep = HistStore.reportPercentiles(spark, path, "2024-03-01",
        "2024-03-01", pctPpm = Seq(500000, 990000, 1000000), lo = 0.0,
        width = 10.0)
      .collect().map(r => r.getInt(0) -> (r.getInt(1), r.getLong(4), r.getLong(5)))
      .toMap
    // p50: rank ceil(0.5*100)=50 -> value 49 -> bin 4; p99: rank 99 ->
    // value 98 -> bin 9; p100: rank 100 -> bin 9
    assert(rep(500000) == ((4, 50L, 100L)), s"p50 got ${rep(500000)}")
    assert(rep(990000)._1 == 9 && rep(1000000)._1 == 9)
    // out-of-range values clamp into edge bins, totals preserved
    val extreme = Seq(("2024-03-02 00:00:00", -5.0), ("2024-03-02 00:00:00", 1e9))
      .toDF("ts", "value")
      .select(col("ts").cast("timestamp").as("ts"), col("value"))
    HistStore.appendDaily(extreme, "ts", "value", path, 0.0, 10.0, 10)
    val bins = spark.read.parquet(path)
      .filter(col("day") === lit("2024-03-02").cast("date"))
      .collect().map(r => r.getAs[Int]("bin") -> r.getAs[Long]("n")).toMap
    assert(bins == Map(0 -> 1L, 9 -> 1L), s"clamped bins got $bins")
  }

  test("SketchStore.compactStore: one row per day, one file, estimate bit-stable") {
    val tmp = System.getProperty("java.io.tmpdir")
    val path = s"$tmp/graft_r9_sketchstore_compact"
    val rows = (1 to 300).map { i =>
      (s"2024-02-0${i % 4 + 1} 00:00:00", i % 97L)
    }.toDF("ts", "user_id")
      .select(col("ts").cast("timestamp").as("ts"), col("user_id"))
    SketchStore.writeDailySketches(rows.filter(col("user_id") % 2 === 0),
      "ts", "user_id", path, overwrite = true)
    SketchStore.writeDailySketches(rows.filter(col("user_id") % 2 === 1),
      "ts", "user_id", path)
    assert(spark.read.parquet(path).count() == 8, "4 days x 2 appends")
    val pre = SketchStore.mergedEstimate(spark, path)
    val (before, after) = SketchStore.compactStore(spark, path)
    assert(after == 1L && before > after, s"files $before -> $after")
    val compacted = spark.read.parquet(path)
    assert(compacted.count() == 4, "one row per day after compaction")
    assert(compacted.agg(sum("n_rows")).head().getLong(0) == 300L,
      "row counts must fold across the union")
    assert(SketchStore.mergedEstimate(spark, path) == pre,
      "HLL union is associative — the merged estimate must be bit-stable")
  }

  test("clusteredCosinePairs: subset of exact with identical scores, nonzero recall") {
    import graft.ann.Knn
    val emb = graft.sources.Tables(spark, sf, "embeddings")
    val clustered = Knn.clusteredCosinePairs(emb, nLists = 8, minCosine = 0.3,
      seed = 7L, maxIter = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val exact = Knn.exactCosinePairs(emb, minCosine = 0.3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(clustered.nonEmpty, "the clustered path must find pairs on the fixture")
    clustered.foreach { case (k, s) =>
      assert(exact.get(k).contains(s),
        s"pair $k score $s must appear in the exact join with the same score")
    }
    // near-identical vectors land in the same cluster: high-threshold recall
    val hiExact = exact.filter(_._2 >= 0.9).keySet
    val hiFound = clustered.filter(_._2 >= 0.9).keySet
    assert(hiExact.isEmpty || hiFound.size * 2 >= hiExact.size,
      s"cosine>=0.9 recall collapsed: ${hiFound.size}/${hiExact.size}")
  }

  test("audioEnergySig64: hand-computed envelope bits, edit locality") {
    import graft.multimodal.BinaryMedia
    // 128 samples: first half loud(ish) descending, second half quiet —
    // exactly 2 samples per window; hand-compute the expected bits
    val samples = Array.tabulate(128)(i =>
      if (i < 64) (1000 - i * 10).toShort else 5.toShort)
    val wav = BinaryMedia.WavAudio(8000, 1, 16, samples)
    val sig = BinaryMedia.audioEnergySig64(wav)
    val e = Array.tabulate(64) { w =>
      val a = math.abs(samples(2 * w).toInt); val b = math.abs(samples(2 * w + 1).toInt)
      (a + b) / 2
    }
    var expected = 0L
    for (w <- 0 until 63) if (e(w) > e(w + 1)) expected |= 1L << w
    assert(sig == expected, s"sig $sig != hand-computed $expected")
    assert(sig >= 0L, "bits 0..62 only: signature is always non-negative")
    // editing the head only moves bits near window 0: hamming stays small
    val edited = samples.clone(); edited(0) = 2000.toShort
    val sig2 = BinaryMedia.audioEnergySig64(BinaryMedia.WavAudio(8000, 1, 16, edited))
    assert(java.lang.Long.bitCount(sig ^ sig2) <= 2,
      "a first-sample edit must stay within hamming 2")
    assert(BinaryMedia.audioEnergySig64(BinaryMedia.WavAudio(8000, 1, 16,
      Array.empty[Short])) == 0L, "empty audio fingerprints to 0")
  }

  test("shingleLedgerNovelty: delta never rescans history, retry reports zero") {
    import graft.data.Dedup
    val tmp = System.getProperty("java.io.tmpdir")
    val path = s"$tmp/graft_r9_shingle_ledger"
    graft.operators.FsUtil.deleteRecursively(new java.io.File(path))
    val base = Seq((1L, "a b c d e"), (2L, "x y z w")).toDF("doc_id", "text")
    val delta = Seq(
      (10L, "a b c d"),       // shingles {a b c, b c d} — both in ledger
      (11L, "p q r s"),       // {p q r, q r s} — both new, attributed to 11
      (12L, "p q r")          // {p q r} — new but first seen in doc 11
    ).toDF("doc_id", "text")
    Dedup.shingleLedgerNovelty(base, path)
    val out = Dedup.shingleLedgerNovelty(delta, path)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(10L) == ((2L, 0L)), s"doc 10: ${out(10L)}")
    assert(out(11L) == ((2L, 2L)), s"doc 11: ${out(11L)}")
    assert(out(12L) == ((1L, 0L)), s"doc 12 loses the shared shingle to doc 11: ${out(12L)}")
    // retry: the delta's shingles are all in the ledger now
    val again = Dedup.shingleLedgerNovelty(delta, path)
      .agg(sum("n_new")).head().getLong(0)
    assert(again == 0L, "re-scoring an appended delta must report zero novelty")
  }

  test("CappedJoin: fan-out bounded, ranks deterministic, overflow audited") {
    import graft.operators.CappedJoin
    val left = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "lv")
    val right = (1 to 7).map(i => (1L, i, s"r$i")).toDF("k", "ord", "rv")
      .union(Seq((2L, 1, "s1")).toDF("k", "ord", "rv"))
    val joined = CappedJoin.cappedJoin(left, right, Seq("k"),
      Seq(col("ord").asc), maxPerKey = 3)
    assert(joined.count() == 4, "7 rows capped to 3 for k=1, 1 row for k=2, none for k=3")
    val k1 = joined.filter(col("k") === 1L)
      .select("join_rank", "rv").collect().map(r => (r.getInt(0), r.getString(1))).sorted
    assert(k1.toSeq == Seq((1, "r1"), (2, "r2"), (3, "r3")),
      s"deterministic lowest-ord selection, got ${k1.toSeq}")
    val report = CappedJoin.overflowReport(right, Seq("k"), maxPerKey = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(report.toSeq == Seq((1L, 7L, 3L, 4L)),
      s"only k=1 overflows: 7 right rows, 3 kept, 4 dropped; got ${report.toSeq}")
  }

  test("temporal split audit: leakage verdicts all true on the events table") {
    val out = graft.SparkEntry.queries("q172_temporal_split_audit")(spark, sf)
    val bad = out.filter(!col("no_future_feature") || !col("feature_precedes_label"))
      .count()
    assert(bad == 0L, s"$bad rows leaked a post-cutoff feature")
    assert(out.filter(col("value_feat").isNotNull).count() > 0,
      "some label rows must actually receive a feature on the fixture")
  }

  test("Erasure: scrub removes exactly the listed keys, audit re-proves zero") {
    import graft.data.Erasure
    val store = Seq((1L, "a"), (1L, "b"), (2L, "c"), (3L, "d")).toDF("k", "v")
    val del = Seq(1L, 9L).toDF("k") // 9 not present: deletes are idempotent
    val scrubbed = Erasure.scrub(store, "k", del)
    assert(scrubbed.count() == 2 &&
      scrubbed.filter(col("k") === 1L).count() == 0)
    val audit = Erasure.auditRow("s", store, "k", del).head()
    assert((audit.getLong(1), audit.getLong(2), audit.getLong(3), audit.getLong(4))
      == ((4L, 2L, 2L, 0L)), s"audit row: $audit")
  }

  test("Profile.driftReport: integer deltas, flags fire on injected drift") {
    import graft.data.Profile
    val a = Seq((1, "x"), (2, "y"), (3, "z")).toDF("n", "s")
    // same bounds on n; s loses a value (ratio 666) and gains nulls
    val b = Seq((1, "x"), (3, null.asInstanceOf[String]), (2, "x"))
      .toDF("n", "s")
    val out = Profile.driftReport(a, b, Seq("n", "s"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(!out("n").getBoolean(9), "numeric column unchanged -> no flag")
    val s = out("s")
    assert(s.getLong(4) == 333333L, s"null ppm floor(1e6/3): ${s.getLong(4)}")
    assert(s.getBoolean(9), "null-rate jump + bound change must flag")
  }

  test("join preflight: estimated self-join cardinality is exact") {
    val df = Seq(1, 1, 1, 2, 2, 3).map(k => (k, s"v$k")).toDF("k", "v")
    val perKey = df.groupBy("k").agg(count(lit(1)).as("n"))
    val est = perKey.agg(sum(col("n") * col("n"))).head().getLong(0)
    val actual = df.select("k").join(df.select(col("k").as("k2")),
      col("k") === col("k2")).count()
    assert(est == actual, s"sum of squares $est must equal the self-join count $actual")
  }

  test("RangeShard.writeSharded: pruned layout, sorted shards, manifest consistent") {
    import graft.data.RangeShard
    val tmp = System.getProperty("java.io.tmpdir")
    val path = s"$tmp/graft_r9_rangeshard"
    graft.operators.FsUtil.deleteRecursively(new java.io.File(path))
    val df = (1 to 400).map(i => (i.toLong, ((i * 37) % 400).toDouble + 0.25))
      .toDF("id", "v")
    val man = RangeShard.writeSharded(df, "v", 4, path).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(man.keySet == Set(0, 1, 2, 3), s"shards: ${man.keySet}")
    assert(man.values.map(_._1).sum == 400L, "every row lands in some shard")
    val bySh = man.toSeq.sortBy(_._1)
    for (i <- 1 until bySh.length)
      assert(bySh(i - 1)._2._3 <= bySh(i)._2._2,
        s"shards ${i - 1}/$i overlap: ${bySh(i - 1)} vs ${bySh(i)}")
    for (sh <- 0 to 3) {
      // partition-pruned read of one shard; small single-file shards read as
      // one split, so encounter order == file order
      val vals = spark.read.parquet(s"$path/shard=$sh")
        .select("v").collect().map(_.getDouble(0))
      assert(vals.length.toLong == man(sh)._1, s"shard $sh count")
      assert(vals.sameElements(vals.sorted), s"shard $sh not sorted on disk")
    }
  }

  test("CmsStore: split-append counters == single-pass (linearity), compaction stable") {
    import graft.data.CmsStore
    val tmp = System.getProperty("java.io.tmpdir")
    val rows = (1 to 300).map { i =>
      (s"2024-04-${"%02d".format(i % 4 + 1)} 00:00:00", (i % 37).toLong)
    }.toDF("ts", "k").select(col("ts").cast("timestamp").as("ts"), col("k"))
    val split = s"$tmp/graft_r9_cms_split"
    val whole = s"$tmp/graft_r9_cms_whole"
    CmsStore.appendDaily(rows.filter(col("k") % 2 === 0), "ts", "k", split,
      overwrite = true)
    CmsStore.appendDaily(rows.filter(col("k") % 2 =!= 0), "ts", "k", split)
    CmsStore.appendDaily(rows, "ts", "k", whole, overwrite = true)
    val a = CmsStore.mergedCounters(spark, split).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val b = CmsStore.mergedCounters(spark, whole).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(a == b, "linearity: appends must merge to the single-pass counters")
    // estimates: never under the exact count
    val keys = rows.select(col("k").as("key")).distinct()
    val truth = rows.groupBy(col("k").as("key"))
      .agg(count(lit(1)).as("true_cnt"))
    val bad = CmsStore.estimate(keys, CmsStore.mergedCounters(spark, split))
      .join(truth, "key").filter(col("est") < col("true_cnt")).count()
    assert(bad == 0L, "count-min must never underestimate")
    // compaction: files per day -> 1, counters bit-identical
    val (before, after) = CmsStore.compactStore(spark, split)
    assert(before > after && after == 4L, s"files $before -> $after")
    val post = CmsStore.mergedCounters(spark, split).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(post == a, "counters changed across compaction")
  }

  test("Gram.gramUpper: hand-computed cells, partitioning-invariant") {
    import graft.ann.Gram
    // v1 = (1, 2), v2 = (3, -1) in 1e-6 units after flooring
    val df = Seq(
      (1L, Seq(1.0f, 2.0f)), (2L, Seq(3.0f, -1.0f))
    ).toDF("vec_id", "embedding")
    def cells(d: org.apache.spark.sql.DataFrame) =
      Gram.gramUpper(d, "embedding").collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> ((r.getLong(2), r.getLong(3))))
        .toMap
    val g = cells(df)
    val M = 1000000L
    assert(g((0, 0)) == ((2L, 1L * M * M + 9L * M * M)), s"g00: ${g((0, 0))}")
    assert(g((0, 1)) == ((2L, 2L * M * M - 3L * M * M)), s"g01: ${g((0, 1))}")
    assert(g((1, 1)) == ((2L, 4L * M * M + 1L * M * M)), s"g11: ${g((1, 1))}")
    // exact integers => identical on any partitioning
    assert(cells(df.repartition(7)) == g, "partitioning changed the result")
  }

  test("CategoryEncoder: deterministic ids, min-freq to OOV, null to OOV") {
    import graft.features.CategoryEncoder
    val df = Seq("b", "b", "b", "a", "a", "a", "c", "c", "d", null)
      .toDF("cat")
    // freq ties (a=3, b=3) break by value: a -> 0, b -> 1; c -> 2;
    // d (freq 1 < minFreq 2) and null -> OOV id 3
    val mapping = CategoryEncoder.fit(df, "cat", maxSize = 10, minFreq = 2L)
    assert(mapping.collect().map(r => r.getString(0) -> r.getInt(1)).toMap
      == Map("a" -> 0, "b" -> 1, "c" -> 2))
    val enc = CategoryEncoder.encode(df, "cat", mapping, "cid")
      .select("cat", "cid", "cid_is_oov").distinct().collect()
      .map(r => Option(r.getString(0)).getOrElse("NULL") ->
        ((r.getInt(1), r.getBoolean(2)))).toMap
    assert(enc == Map("a" -> ((0, false)), "b" -> ((1, false)),
      "c" -> ((2, false)), "d" -> ((3, true)), "NULL" -> ((3, true))))
  }

  test("PageRank resume: k + m iterations from saved state == k+m straight") {
    import graft.operators.PageRank
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 1L))
      .toDF("src", "dst")
    val straight = PageRank.fixedPointRanks(edges, "src", "dst", iterations = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val mid = PageRank.fixedPointRanks(edges, "src", "dst", iterations = 3)
      .localCheckpoint()
    val resumed = PageRank.fixedPointRanks(edges, "src", "dst",
        iterations = 2, initRanks = Some(mid))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(resumed == straight, s"resumed $resumed != straight $straight")
  }

  test("lerp imputation: hand-computed interior fill, truncation toward zero") {
    // observed: day 1 -> 100, day 4 -> 10; missing days 2, 3 interpolate
    // 100 + (-90 * k) div 3 for k = 1, 2 -> 70, 40
    val obs = Seq(("2024-06-01", 100L), ("2024-06-04", 10L))
      .toDF("day", "sum_u").select(col("day").cast("date").as("day"),
        col("sum_u"))
    val grid = spark.sql(
      "SELECT explode(sequence(DATE'2024-06-01', DATE'2024-06-04')) AS day")
    val j = grid.join(obs, Seq("day"), "left")
      .withColumn("vday", when(col("sum_u").isNotNull, col("day")))
    val prevW = org.apache.spark.sql.expressions.Window.orderBy("day")
      .rowsBetween(Long.MinValue, 0)
    val nextW = org.apache.spark.sql.expressions.Window.orderBy("day")
      .rowsBetween(0, Long.MaxValue)
    val out = j
      .withColumn("prev_u", last(col("sum_u"), ignoreNulls = true).over(prevW))
      .withColumn("prev_d", last(col("vday"), ignoreNulls = true).over(prevW))
      .withColumn("next_u", first(col("sum_u"), ignoreNulls = true).over(nextW))
      .withColumn("next_d", first(col("vday"), ignoreNulls = true).over(nextW))
      .withColumn("v", when(col("sum_u").isNotNull, col("sum_u")).otherwise(
        expr("""prev_u + ((next_u - prev_u) * datediff(day, prev_d))
                div datediff(next_d, prev_d)""")))
      .orderBy("day").collect().map(_.getAs[Long]("v"))
    assert(out.toSeq == Seq(100L, 70L, 40L, 10L), out.toSeq.toString)
  }

  test("SQL surface: registered functions == Column API, extensions injectable") {
    import graft.functions.ShingleExprs
    graft.GraftFunctions.register(spark)
    val df = Seq((1L, "a b c d e f g"), (2L, "x y z")).toDF("id", "text")
    df.createOrReplaceTempView("graft_fn_test")
    val viaSql = spark.sql(
      "SELECT id, shingle_hashes(text, 5) AS hs, simhash64(text) AS sh " +
      "FROM graft_fn_test").collect()
      .map(r => r.getLong(0) -> ((r.getSeq[Long](1).toSet, r.getLong(2)))).toMap
    val viaApi = df.select(col("id"),
        ShingleExprs.wordShingleHashes(col("text"), 5).as("hs"),
        ShingleExprs.simhash64(col("text")).as("sh")).collect()
      .map(r => r.getLong(0) -> ((r.getSeq[Long](1).toSet, r.getLong(2)))).toMap
    assert(viaSql == viaApi, "SQL function must equal the Column API")
    // non-literal k must fail loudly, not silently misparse
    intercept[Exception] {
      spark.sql("SELECT shingle_hashes(text, id) FROM graft_fn_test").collect()
    }
    // the extensions class applies the same builder triples without error;
    // actual injection is only observable on a freshly built session (racy
    // on the shared context), so pin the published surface instead
    new graft.GraftExtensions()(new org.apache.spark.sql.SparkSessionExtensions)
    assert(graft.GraftFunctions.all.map(_._1.funcName).sorted ==
      Seq("minhash_signature", "shingle_hashes", "simhash64"))
  }

  test("Sssp.hopDistances: hand-computed layers, radius cutoff, seed dedup") {
    import graft.operators.Sssp
    // path 1 -> 2 -> 3 -> 4 -> 5 (directed), seed {1, 1 dup}
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val seeds = Seq(1L, 1L).toDF("node")
    val d2 = Sssp.hopDistances(edges, seeds, rounds = 2).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(d2 == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> -1L, 5L -> -1L),
      s"2-round radius: $d2")
    val d4 = Sssp.hopDistances(edges, seeds, rounds = 4).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(d4 == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 4L),
      s"full reach: $d4")
  }

  test("RangeShard: collided boundaries on skewed data leave shards empty, never wrong") {
    import graft.data.RangeShard
    // 90% of mass at one value: most quantile cut points collide
    val df = (Seq.fill(90)(5.0) ++ Seq(1.0, 2.0, 3.0, 9.0, 9.5, 11.0, 12.0,
      13.0, 14.0, 15.0)).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val bounds = RangeShard.boundaries(df, "v", 8)
    assert(bounds.length == 7)
    val assigned = RangeShard.assign(df, "v", bounds)
    assert(assigned.count() == 100, "every row keeps exactly one shard")
    val man = RangeShard.manifest(assigned, "v").collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .sortBy(_._1)
    // non-overlap must hold even with empty/skipped shard ids
    for (i <- 1 until man.length)
      assert(man(i - 1)._2._3 <= man(i)._2._2,
        s"overlap between ${man(i - 1)} and ${man(i)}")
    assert(man.map(_._2._1).sum == 100L)
  }

  test("RangeShard approx boundaries: valid non-overlapping layout, full coverage") {
    import graft.data.RangeShard
    val df = (1 to 1000).map(i => (i.toLong, ((i * 131) % 997).toDouble))
      .toDF("id", "v")
    val bounds = RangeShard.boundaries(df, "v", 8, exact = false)
    assert(bounds.length == 7 && bounds.sorted.sameElements(bounds),
      s"approx cut points must be sorted: ${bounds.toSeq}")
    val man = RangeShard.manifest(RangeShard.assign(df, "v", bounds), "v")
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3)))).sortBy(_._1)
    assert(man.map(_._2._1).sum == 1000L, "approx layout must cover every row")
    for (i <- 1 until man.length)
      assert(man(i - 1)._2._3 <= man(i)._2._2, "approx shards must not overlap")
  }

  test("rank statistics: textbook hand values (KS, Mann-Whitney U, Kendall tau-b)") {
    // the q245/q246/q248 oracles replay the SAME algebra as the queries, so
    // cross-engine agreement alone could mask a shared formula error; these
    // fixtures pin the algebra against externally derived textbook values
    import org.apache.spark.sql.expressions.Window
    // KS: A={1,2,3}, B={2,3,4} -> D = 1/3 (d_num 3 over nA*nB = 9)
    val ks = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("b", 2L), ("b", 3L),
      ("b", 4L)).toDF("g", "v")
      .groupBy("v")
      .agg(sum(when(col("g") === "a", 1L).otherwise(0L)).as("ca"),
        sum(when(col("g") === "b", 1L).otherwise(0L)).as("cb"))
    val w = Window.orderBy("v").rowsBetween(Long.MinValue, 0)
    val tot = Window.partitionBy()
    val ksRow = ks.withColumn("cuma", sum("ca").over(w))
      .withColumn("cumb", sum("cb").over(w))
      .withColumn("na", sum("ca").over(tot))
      .withColumn("nb", sum("cb").over(tot))
      .agg(max(abs(col("cuma") * col("nb") - col("cumb") * col("na"))))
      .head().getLong(0)
    assert(ksRow == 3L, s"KS d_num: $ksRow")

    // Mann-Whitney on the same data: 2U_a = 4 (U_a = 2), 2U_b = 14 (U_b = 7)
    val wb = Window.orderBy("v").rowsBetween(Long.MinValue, -1)
    val mw = ks.withColumn("cnt", col("ca") + col("cb"))
      .withColumn("cum_before", coalesce(sum("cnt").over(wb), lit(0L)))
      .withColumn("r2", lit(2L) * col("cum_before") + col("cnt") + 1L)
      .agg(sum("ca").as("na"), sum("cb").as("nb"),
        sum(col("ca") * col("r2")).as("r2a"),
        sum(col("cb") * col("r2")).as("r2b")).head()
    val u2a = mw.getLong(2) - mw.getLong(0) * (mw.getLong(0) + 1)
    val u2b = mw.getLong(3) - mw.getLong(1) * (mw.getLong(1) + 1)
    assert(u2a == 4L && u2b == 14L, s"2U: $u2a, $u2b")

    // Kendall tau-b: points (1,1),(2,2),(3,3),(4,1) -> C=3, D=2, n1=0, n2=1
    // tau_b = 1/sqrt(30)
    val pts = Seq((1L, 1L), (2L, 2L), (3L, 3L), (4L, 1L)).toDF("x", "y")
    val joint = pts.groupBy("x", "y").agg(count(lit(1)).as("c"))
    val a = joint.toDF("x1", "y1", "c1"); val b = joint.toDF("x2", "y2", "c2")
    val cd = a.join(b, col("x1") < col("x2")).agg(
      sum(when(col("y1") < col("y2"), col("c1") * col("c2")).otherwise(0L)),
      sum(when(col("y1") > col("y2"), col("c1") * col("c2")).otherwise(0L)))
      .head()
    assert(cd.getLong(0) == 3L && cd.getLong(1) == 2L, s"C/D: $cd")
    val tau = (cd.getLong(0) - cd.getLong(1)).toDouble /
      math.sqrt((6.0 - 0.0) * (6.0 - 1.0))
    assert(math.abs(tau - 1.0 / math.sqrt(30.0)) < 1e-12, s"tau_b: $tau")
  }

  test("mergeClusters: prior stars + delta pairs == from-scratch closure") {
    import graft.data.Dedup
    // history: components {1,2,3} (chain) and {4,5}; 6..8 singletons
    val ids = (1L to 8L).toDF("doc_id")
    val oldPairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("id_a", "id_b")
    val prior = Dedup.clustersFromPairs(ids, "doc_id", oldPairs)
    assert(prior.filter(col("doc_id") === 3L).head().getLong(1) == 1L)
    // delta: 9 bridges the two old components (2-9, 9-4) and 10 pairs with
    // singleton 6 — the bridge is the case a naive "relabel only new ids"
    // incremental gets wrong
    val all = (1L to 10L).toDF("doc_id")
    val deltaPairs = Seq((2L, 9L), (9L, 4L), (6L, 10L)).toDF("id_a", "id_b")
    val merged = Dedup.mergeClusters(all, "doc_id", prior, deltaPairs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    val full = Dedup.clustersFromPairs(all, "doc_id",
        oldPairs.unionByName(deltaPairs))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(merged == full, s"merged $merged != full $full")
    assert(merged(4L) == ((1L, true)), "bridge must land 4 in component 1")
    assert(merged(7L) == ((7L, false)), "untouched singleton stays itself")
  }
}
