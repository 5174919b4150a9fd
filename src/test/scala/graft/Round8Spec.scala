package graft

import org.apache.spark.sql.functions._

import graft.idx.CosSimIndexer

/** Round-8 units: the de-bottlenecked negative-split (GlobalRank instead of
  * a single-partition global window + forced broadcast) at 10x the entity
  * counts the query suite uses.
  */
class Round8Spec extends SparkSpec {
  import spark.implicits._

  test("compactIndex: one file per partition afterwards, probes unchanged (both indexes)") {
    import graft.ann.Knn
    import graft.search.Bm25
    val tmp = System.getProperty("java.io.tmpdir")

    // BM25: build on half, append the rest -> 2 files per touched bucket
    val docs = Seq((1L, "alpha beta gamma"), (2L, "beta gamma delta"),
      (3L, "gamma delta epsilon"), (4L, "delta epsilon zeta"),
      (5L, "epsilon zeta alpha"), (6L, "zeta alpha beta")).toDF("doc_id", "text")
    val qs = Seq((1L, "alpha delta")).toDF("query_id", "query_text")
    val bPath = s"$tmp/graft_r8_bm25_compact"
    Bm25.writeIndex(docs.filter($"doc_id" <= 3), bPath, nBuckets = 4)
    Bm25.appendToIndex(docs.filter($"doc_id" > 3), bPath)
    val preB = Bm25.topKIndexed(qs, bPath, k = 10).collect().toSet
    val (b0, b1) = Bm25.compactIndex(spark, bPath)
    assert(b1 < b0 && b1 <= 4, s"bm25 files $b0 -> $b1")
    assert(Bm25.topKIndexed(qs, bPath, k = 10).collect().toSet == preB)

    // IVF: same recipe over the list_id layout
    val emb = (1L to 12L).map(i =>
      (i, Seq(math.cos(i.toDouble).toFloat, math.sin(i.toDouble).toFloat)))
      .toDF("vec_id", "embedding")
    val iPath = s"$tmp/graft_r8_ivf_compact"
    Knn.ivfWriteIndex(emb.filter($"vec_id" % 2 === 0), iPath, nLists = 2, seed = 3L)
    Knn.ivfAppendToIndex(emb.filter($"vec_id" % 2 === 1), iPath)
    val preI = Knn.ivfTopKIndexed(emb, iPath, k = 3, nProbe = 2).collect().toSet
    val (i0, i1) = Knn.ivfCompactIndex(spark, iPath)
    assert(i1 < i0 && i1 <= 2, s"ivf files $i0 -> $i1")
    assert(Knn.ivfTopKIndexed(emb, iPath, k = 3, nProbe = 2).collect().toSet == preI)
  }

  test("ivf refit: drift skew rebalances, vector set and exhaustive probe unchanged") {
    import graft.ann.Knn
    // two tight clusters; the index is FIT on cluster A only, so after
    // appending cluster B both clusters share A's lists (drift skew)
    val a = (1L to 10L).map(i => (i, Seq(1.0f, 0.01f * i)))
    val b = (11L to 20L).map(i => (i, Seq(-1.0f, 0.01f * i)))
    val emb = (a ++ b).toDF("vec_id", "embedding")
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_r8_ivf_refit"
    Knn.ivfWriteIndex(emb.filter($"vec_id" <= 10), path, nLists = 2, seed = 3L)
    Knn.ivfAppendToIndex(emb.filter($"vec_id" > 10), path)
    val preProbe = Knn.ivfTopKIndexed(emb, path, k = 3, nProbe = 2).collect().toSet
    val preOcc = Knn.ivfOccupancyReport(spark, path).head
    assert(preOcc.getLong(1) == 20L)
    Knn.ivfRefitIndex(spark, path, nLists = 2, seed = 5L)
    val postOcc = Knn.ivfOccupancyReport(spark, path).head
    assert(postOcc.getLong(1) == 20L, "refit must preserve every vector")
    // the refit quantizer separates the two clusters: 10/10 (imbalance 1.0)
    assert(postOcc.getDouble(4) <= preOcc.getDouble(4),
      s"refit must not worsen imbalance: ${preOcc.getDouble(4)} -> ${postOcc.getDouble(4)}")
    assert(postOcc.getLong(0) == 2L && postOcc.getDouble(4) == 1.0,
      s"two tight clusters refit to two balanced lists, got $postOcc")
    // exhaustive probe is independent of list membership
    assert(Knn.ivfTopKIndexed(emb, path, k = 3, nProbe = 2).collect().toSet == preProbe)
  }

  test("watermark: a late row is dropped from an already-evicted window") {
    import java.nio.file.{Files, Paths}
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types.{LongType, StructType, TimestampType}
    val base = Paths.get(System.getProperty("java.io.tmpdir"), "graft_r8_wm")
    graft.operators.FsUtil.deleteRecursively(base)
    Files.createDirectories(base.resolve("data"))
    val epoch = 1767225600L
    def writeOne(rows: Seq[(Long, Long)], name: String): Unit = {
      val stage = base.resolve(s"__stage_$name")
      rows.toDF("id", "sec").select($"id", timestamp_seconds($"sec").as("ts"))
        .coalesce(1).write.mode("overwrite").parquet(stage.toString)
      val l = Files.list(stage)
      val part = try l.filter(_.getFileName.toString.endsWith(".parquet")).findFirst().get()
                 finally l.close()
      Files.move(part, base.resolve("data").resolve(s"$name.parquet"))
    }
    val schema = new StructType().add("id", LongType).add("ts", TimestampType)
    def runOnce(): Map[Long, (Long, Long)] = {
      val q = spark.readStream.schema(schema).parquet(s"$base/data")
        .withWatermark("ts", "30 minutes")
        .groupBy(window($"ts", "1 hour").as("w"))
        .agg(count(lit(1)).as("n"), sum($"id").as("sum_id"))
        .select(unix_timestamp($"w.start").as("h"), $"n", $"sum_id")
        .writeStream.format("parquet")
        .option("path", s"$base/out")
        .option("checkpointLocation", s"$base/ckpt")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      spark.read.parquet(s"$base/out").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    }
    // run 1: one row in hour 0, watermark driver at hour 5 (wm -> 4:30);
    // the closing batch emits hour 0
    writeOne(Seq((1L, epoch), (2L, epoch + 5 * 3600)), "f1")
    val out1 = runOnce()
    assert(out1(epoch) == (1L, 1L), s"run 1 must emit hour 0 on time, got $out1")
    // run 2 (watermark restored from the checkpoint): a LATE row for the
    // evicted hour 0 + a sentinel at hour 7 closing hour 5. The sink is
    // cumulative (parquet append), so hour 0 must STILL be (1,1): the late
    // id=3 was dropped, never re-emitted
    writeOne(Seq((3L, epoch), (4L, epoch + 7 * 3600)), "f2")
    val out2 = runOnce()
    assert(out2(epoch) == (1L, 1L), s"late row must be dropped, got $out2")
    assert(out2.contains(epoch + 5 * 3600) && !out2.contains(epoch + 7 * 3600),
      s"hour 5 closes, sentinel hour 7 stays open, got $out2")
  }

  test("dedup-within-watermark: in-delay duplicates drop, evicted keys re-emit") {
    import java.nio.file.{Files, Paths}
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types.{LongType, StructType, TimestampType}
    val base = Paths.get(System.getProperty("java.io.tmpdir"), "graft_r8_ddwm")
    graft.operators.FsUtil.deleteRecursively(base)
    Files.createDirectories(base.resolve("data"))
    val epoch = 1767225600L
    def writeOne(rows: Seq[(Long, Long)], name: String): Unit = {
      val stage = base.resolve(s"__stage_$name")
      rows.toDF("id", "sec").select($"id", timestamp_seconds($"sec").as("ts"))
        .coalesce(1).write.mode("overwrite").parquet(stage.toString)
      val l = Files.list(stage)
      val part = try l.filter(_.getFileName.toString.endsWith(".parquet")).findFirst().get()
                 finally l.close()
      Files.move(part, base.resolve("data").resolve(s"$name.parquet"))
    }
    val schema = new StructType().add("id", LongType).add("ts", TimestampType)
    def runOnce(): Map[Long, Long] = {
      val q = spark.readStream.schema(schema).parquet(s"$base/data")
        .withWatermark("ts", "30 minutes")
        .dropDuplicatesWithinWatermark("id")
        .writeStream.format("parquet")
        .option("path", s"$base/out")
        .option("checkpointLocation", s"$base/ckpt")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      spark.read.parquet(s"$base/out").collect()
        .groupBy(_.getLong(0)).view.mapValues(_.length.toLong).toMap
    }
    // run 1: id=1 at hour 0 (in-batch duplicate dropped), id=2 at hour 5
    // drives the watermark to 4:30 — id=1's state (expiry 0:30) evicts
    writeOne(Seq((1L, epoch), (1L, epoch), (2L, epoch + 5 * 3600)), "f1")
    assert(runOnce() == Map(1L -> 1L, 2L -> 1L))
    // run 2: id=1 returns after eviction -> RE-EMITTED (bounded state, the
    // contract's flip side); id=2 returns within its delay -> still dropped
    writeOne(Seq((1L, epoch + 6 * 3600), (2L, epoch + 5 * 3600 + 600)), "f2")
    assert(runOnce() == Map(1L -> 2L, 2L -> 1L),
      "evicted key must re-emit; in-delay duplicate must drop")
  }

  test("asof tolerance: stale matches null out, fresh ones carry, no-match unchanged") {
    import graft.operators.AsofJoin
    val left = Seq((1L, "a", 100L), (2L, "b", 100L), (3L, "c", 100L))
      .toDF("id", "key", "ts")
    // a: match at 10 (stale by 90 > tol 50); b: match at 90 (fresh); c: none
    val right = Seq((10L, "a", 1), (90L, "b", 2)).toDF("rts", "key", "value")
    val out = AsofJoin.backward(left, right, Seq("key"), "ts", "rts",
        Seq("value"), tolerance = Some(50L))
      .orderBy("id").collect()
    assert(out(0).isNullAt(3), s"stale match must null out, got ${out(0)}")
    assert(out(1).getInt(3) == 2)
    assert(out(2).isNullAt(3))
    // without tolerance the stale match carries — the bound is the only delta
    val unbounded = AsofJoin.backward(left, right, Seq("key"), "ts", "rts",
      Seq("value")).orderBy("id").collect()
    assert(unbounded(0).getInt(3) == 1)
  }

  test("TopKAgg: partition-layout independent, ties by id, short groups intact") {
    import graft.operators.TopKAgg
    // group 1: 5 rows incl. a value tie (ids 11 vs 12 -> smaller id first);
    // group 2: fewer rows than k
    val rows = Seq((1L, 5.0, 10L), (1L, 7.0, 11L), (1L, 7.0, 12L),
                   (1L, 1.0, 13L), (1L, 6.0, 14L), (2L, 3.0, 20L), (2L, 2.0, 21L))
    def run(parts: Int) =
      rows.toDF("g", "v", "id").repartition(parts)
        .groupBy("g").agg(TopKAgg.topK(3)(col("v"), col("id")).as("top"))
        .select(col("g"), col("top"))
        .collect().map(r => r.getLong(0) ->
          r.getSeq[org.apache.spark.sql.Row](1).map(e => (e.getDouble(0), e.getLong(1))))
        .toMap
    val expected = Map(
      1L -> Seq((7.0, 11L), (7.0, 12L), (6.0, 14L)),
      2L -> Seq((3.0, 20L), (2.0, 21L)))
    assert(run(1) == expected, s"single partition: ${run(1)}")
    assert(run(7) == expected, "the sorted merge must be layout-independent")
  }

  test("TopKAgg: NaN ranks first like Spark's descending sort") {
    import graft.operators.TopKAgg
    val rows = Seq((1L, 5.0, 10L), (1L, Double.NaN, 11L), (1L, 7.0, 12L))
    val got = rows.toDF("g", "v", "id")
      .groupBy("g").agg(TopKAgg.topK(2)(col("v"), col("id")).as("top"))
      .select(explode(col("top")).as("e")).select("e.id")
      .collect().map(_.getLong(0)).toSeq
    // window form: orderBy(desc) puts NaN above +Inf -> NaN first
    assert(got == Seq(11L, 12L), s"NaN must rank first (Spark ordering), got $got")
  }

  test("incremental dedup: duplicate ledger rows from a retried append never fan out") {
    import graft.data.Dedup
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_r8_ledger"
    graft.operators.FsUtil.deleteRecursively(new java.io.File(path))
    val base = Seq((1L, "aa"), (2L, "bb")).toDF("doc_id", "text")
    Dedup.exactIncremental(base, path)
    // simulate the documented failure mode: the append half of a call
    // re-runs, duplicating every ledger row
    spark.read.parquet(path).write.mode("append").parquet(path)
    val delta = Seq((3L, "aa"), (4L, "cc")).toDF("doc_id", "text")
    val out = Dedup.exactIncremental(delta, path)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out == Map(3L -> false, 4L -> true),
      s"one row per delta doc with correct verdicts, got $out")
  }

  test("negative split: GlobalRank path is exact and deterministic at 10x entity count") {
    // 3000 entities x 2 names — an order of magnitude over the q48/q50
    // fixtures; the former Window.orderBy(...) plan put all of it in ONE
    // partition and force-broadcast the flag table
    val names = spark.range(6000).select(
      col("id").as(Cols.Uid),
      concat(lit("name "), (col("id") / 2).cast("long").cast("string")).as(Cols.Name),
      (col("id") / 2).cast("long").cast("string").as(Cols.EntityId))
    val model = EntityMatching(EmParams(), Seq(
      new CosSimIndexer(numCandidates = 1, lowerBound = 0.9))).fit(
      names.select(col(Cols.EntityId).cast("long").as(Cols.Uid), col(Cols.Name),
                   col(Cols.EntityId)).distinct())
    val frac = 0.25
    val pairs = model.createTrainingPairs(names, createNegativeSampleFraction = frac)
    val posEntities = pairs.filter(col("positive_set"))
      .select(Cols.EntityId).distinct().count()
    val negEntities = pairs.filter(!col("positive_set"))
      .select(Cols.EntityId).distinct().count()
    assert(posEntities == math.floor((1.0 - frac) * 3000).toLong,
      s"expected floor(0.75*3000)=2250 positive entities, got $posEntities")
    assert(posEntities + negEntities == 3000)
    // the hash split is a pure function of (entity_id, seed): re-running
    // yields the identical partition of entities
    val again = model.createTrainingPairs(names, createNegativeSampleFraction = frac)
    val a = pairs.filter(col("positive_set")).select(Cols.EntityId).distinct()
    val b = again.filter(col("positive_set")).select(Cols.EntityId).distinct()
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }

  test("bloom semi join: string keys, null keys, fpp independence") {
    import graft.operators.BloomJoin
    val fact = Seq(Some("alpha"), Some("beta"), Some("gamma"), None,
      Some("delta"), Some("alpha")).toDF("k")
    val dim = Seq("alpha", "delta", "omega").toDF("k")
    val plain = fact.join(dim.distinct(), Seq("k"), "left_semi")
    // tiny filter → fpp near its bound; exactness must come from the final
    // semi join, not from the bloom filter being lucky
    for (fpp <- Seq(0.5, 0.01)) {
      val got = BloomJoin.bloomSemiJoin(fact, dim, "k",
        expectedItems = 4L, fpp = fpp)
      assert(got.exceptAll(plain).count() == 0 &&
        plain.exceptAll(got).count() == 0, s"fpp=$fpp mismatch")
    }
    // integral widths share the long encoding
    val factI = Seq(1, 2, 3, 4).toDF("k")
    val dimL = Seq(2L, 4L, 9L).toDF("k")
    val gotI = BloomJoin.bloomSemiJoin(
      factI.select(col("k").cast("long").as("k")), dimL, "k", 8L)
    assert(gotI.as[Long].collect().sorted.toSeq == Seq(2L, 4L))
  }

  test("pagerank: hand-computed fixed point, dangling leak, duplicate edges") {
    import graft.operators.PageRank
    // 1 -> {2,3}, 2 -> 1; 3 dangling (its mass leaks, classic convention);
    // duplicate edge rows must not double outdeg or contributions
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 1L), (1L, 2L)).toDF("s", "d")
    def ranks(iters: Int): Map[Long, Long] =
      PageRank.fixedPointRanks(edges, "s", "d", iterations = iters)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // iter1: contrib(1)=500000 to each of 2,3; contrib(2)=1000000 to 1
    assert(ranks(1) == Map(1L -> 1000000L, 2L -> 575000L, 3L -> 575000L))
    // iter2: 1 receives 575000, 2/3 receive 500000 each
    assert(ranks(2) == Map(1L -> 638750L, 2L -> 575000L, 3L -> 575000L))
  }

  test("sparse cosine: hand-computed pairs, counted shingles, df cap re-norms") {
    import graft.search.SparseSim
    val docs = Seq((1L, "a b c d"), (2L, "a b c d"), (3L, "a b c e"),
      (4L, "x y"), (5L, "a b a b a b")).toDF("doc_id", "text")
    def pairs(maxDf: Int, minCos: Double) =
      SparseSim.shingleCosinePairs(docs, "doc_id", "text",
          k = 3, maxDf = maxDf, minCos = minCos)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSet
    // shingle vectors: d1=d2={abc:1,bcd:1}, d3={abc:1,bce:1}, d4 empty
    // (len<k), d5={aba:2,bab:2} (counted, norm2=8, overlaps nobody)
    assert(pairs(1000, 0.4) ==
      Set((1L, 2L, 2L, 1.0), (1L, 3L, 1L, 0.5), (2L, 3L, 1L, 0.5)))
    assert(pairs(1000, 0.6) == Set((1L, 2L, 2L, 1.0)))
    // maxDf=2 drops 'a b c' (df=3); norms shrink to the capped space, so
    // (1,2) still hits cos=1 on {bcd} alone and (1,3)/(2,3) vanish
    assert(pairs(2, 0.4) == Set((1L, 2L, 1L, 1.0)))
  }

  test("weighted sample: bad weights excluded, n monotone, overshoot returns all") {
    import graft.data.Sampling
    val rows = Seq((1L, 10), (2L, 20), (3L, 0), (4L, -5), (5L, 30), (6L, 1))
      .toDF("id", "w")
      .unionByName(Seq((7L, Option.empty[Int])).toDF("id", "w"))
    def ids(n: Int) = Sampling.weightedSample(rows, "id", "w", n, "t|")
      .select("id").as[Long].collect().toSet
    // zero/negative/null weights can never be drawn
    assert(ids(100) == Set(1L, 2L, 5L, 6L))
    // raising n only adds (fixed key permutation)
    val two = ids(2); val three = ids(3)
    assert(two.size == 2 && three.size == 3 && two.subsetOf(three))
  }

  test("label propagation: path graph, lexicographic ties, frozen seeds") {
    import graft.operators.LabelProp
    // path 1-2-3-4-5, seeds A at 1 and B at 5
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val seeds = Seq((1L, "A"), (5L, "B")).toDF("node", "lbl")
    def labels(iters: Int): Map[Long, String] =
      LabelProp.propagate(edges, "src", "dst", seeds, "node", "lbl", iters)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // r1: neighbours of seeds pick up A/B, centre has no labeled neighbour
    assert(labels(1) == Map(1L -> "A", 2L -> "A", 3L -> null, 4L -> "B", 5L -> "B"))
    // r2: centre ties A-vs-B -> lexicographically smallest (A)
    assert(labels(2)(3L) == "A")
    // r3: node 4 now ties A(from 3) vs B(from 5) -> flips to A; seed 5 stays B
    assert(labels(3) == Map(1L -> "A", 2L -> "A", 3L -> "A", 4L -> "A", 5L -> "B"))
  }

  test("triangles: K4 + pendant, duplicate/reverse/self edges collapse") {
    import graft.operators.Triangles
    // K4 on {1,2,3,4} (4 triangles) + pendant 5-1; noise: reverse dup (2,1),
    // self-loop (3,3), exact dup (3,4)
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (5L, 1L), (2L, 1L), (3L, 3L), (3L, 4L)).toDF("src", "dst")
    val r = Triangles.count(edges, "src", "dst").collect().head
    // orientation: deg(1)=4 pulls 2/3/4/5 -> 1; ids order 2->3->4; oriented
    // outdegs 2:3, 3:2 -> C(3,2)+C(2,2)=4 wedges, all closed
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      (4L, 4L, 7L, 5L))
  }

  test("interval join: inclusive bounds, bin spanning, no duplicate pairs, loud blowup") {
    import graft.operators.IntervalJoin
    val pts = Seq((1L, "a", 0L), (2L, "a", 10L), (3L, "a", 15L), (4L, "a", 19L),
      (5L, "a", 25L), (6L, "b", 12L)).toDF("id", "k", "t")
    // [10, 19] spans bins 1..1 at width 10? no: start bin 1, end bin 1 —
    // use [5, 14]: bins 0..1, so a point in either bin can match it once
    val iv = Seq(("a", 5L, 14L), ("a", 14L, 20L), ("b", 0L, 30L))
      .toDF("k", "s", "e")
    val got = IntervalJoin.binned(pts, iv, Seq("k"), "t", "s", "e",
        binWidth = 10L)
      .select("id", "s", "e").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = Set((2L, 5L, 14L), (3L, 14L, 20L), (4L, 14L, 20L),
      (6L, 0L, 30L))
    assert(got == want, s"got $got")
    // ends inclusive both sides: t=14 would match both; t=20 matches [14,20]
    val edge = IntervalJoin.binned(Seq((9L, "a", 14L)).toDF("id", "k", "t"),
      iv, Seq("k"), "t", "s", "e", 10L).count()
    assert(edge == 2)
    // an interval spanning more bins than the cap fails loudly
    val bad = Seq(("a", 0L, 1000000L)).toDF("k", "s", "e")
    val err = intercept[Exception] {
      IntervalJoin.binned(pts, bad, Seq("k"), "t", "s", "e", 10L,
        maxBinsPerInterval = 16).count()
    }
    assert(err.getMessage != null)
    // the join is equi on (key, bin) — never key-only (per-key quadratic);
    // static plan: AQE wraps the tree and hides the join from collect
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val plan =
      try IntervalJoin.binned(pts, iv, Seq("k"), "t", "s", "e", 10L)
        .queryExecution.executedPlan
      finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    val keyCounts = plan.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j.leftKeys.size
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j.leftKeys.size
    }
    assert(keyCounts.nonEmpty && keyCounts.forall(_ == 2),
      s"join must key on (k, bin):\n$plan")
  }
}
