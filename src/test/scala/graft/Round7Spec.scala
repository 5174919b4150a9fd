package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.AsofJoin

/** Round-7 units: as-of join null semantics (struct payload carry), the
  * connected-components convergence contract, and the disk-index append
  * paths.
  */
class Round7Spec extends SparkSpec {
  import spark.implicits._

  // ===== as-of join null semantics =========================================

  test("asof: a matched right row's NULL payload value stays null (no stale carry)") {
    val left = Seq((1L, "k", 10L), (2L, "k", 20L)).toDF("id", "key", "ts")
    // right row at ts=5 has value 100; the later row at ts=15 has a NULL
    // value — the ts=20 left row matched ts=15 and must report null, not 100
    val right = Seq((5L, "k", Some(100)), (15L, "k", None))
      .toDF("rts", "key", "value")
    val out = AsofJoin.backward(left, right, Seq("key"), "ts", "rts", Seq("value"))
      .orderBy("id").collect()
    assert(out(0).getInt(3) == 100)
    assert(out(1).isNullAt(3), s"ts=20 matched the ts=15 row whose value IS null; got ${out(1)}")
  }

  test("asof: multi-column payload comes from ONE right row, never mixed") {
    val left = Seq((1L, "k", 20L)).toDF("id", "key", "ts")
    // latest match is ts=15 with (a=null, b=2); per-column carry would
    // resurrect a=1 from ts=5 while taking b=2 from ts=15
    val right = Seq((5L, "k", Some(1), Some(1)), (15L, "k", None, Some(2)))
      .toDF("rts", "key", "a", "b")
    val out = AsofJoin.backward(left, right, Seq("key"), "ts", "rts", Seq("a", "b"))
      .collect()(0)
    assert(out.isNullAt(3), s"a must be the matched row's null, got $out")
    assert(out.getInt(4) == 2)
  }

  test("asof: NULL keys and NULL timestamps never match") {
    val left = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, null, 5L), Row(2L, "k", null), Row(3L, "k", 5L))),
      new org.apache.spark.sql.types.StructType()
        .add("id", "long", false).add("key", "string", true).add("ts", "long", true))
    val right = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(5L, null, 100), Row(5L, "k", 200), Row(null, "k", 300))),
      new org.apache.spark.sql.types.StructType()
        .add("rts", "long", true).add("key", "string", true).add("value", "integer", true))
    // backward: null-key left row (1) and null-ts left row (2) match nothing;
    // row 3 (ts=5) matches the (5,k,200) right row inclusively in BOTH
    // directions — the null-key and null-ts right rows are invisible
    val back = AsofJoin.backward(left, right, Seq("key"), "ts", "rts", Seq("value"))
      .orderBy("id").collect()
    assert(back(0).isNullAt(3) && back(1).isNullAt(3))
    assert(back(2).getInt(3) == 200)
    // forward (descending scan, where nulls would otherwise sort into a
    // carried payload): same three verdicts
    val fwd = AsofJoin.forward(left, right, Seq("key"), "ts", "rts", Seq("value"))
      .orderBy("id").collect()
    assert(fwd(0).isNullAt(3) && fwd(1).isNullAt(3))
    assert(fwd(2).getInt(3) == 200)
  }

  test("asof: unmatched left rows still get null payload (left-outer)") {
    val left = Seq((1L, "k", 3L)).toDF("id", "key", "ts")
    val right = Seq((5L, "k", 100)).toDF("rts", "key", "value")
    val out = AsofJoin.backward(left, right, Seq("key"), "ts", "rts", Seq("value"))
      .collect()(0)
    assert(out.isNullAt(3))
  }

  // ===== disk-index incremental append =====================================

  private def freshTmp(name: String): String = {
    val p = s"${System.getProperty("java.io.tmpdir")}/graft_test_$name"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete(); ()
    }
    rm(new java.io.File(p))
    p
  }

  test("bm25 append: merged stats and probe results equal a full rebuild exactly") {
    import graft.search.Bm25
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val qs = docs.filter(col("doc_id") < 3)
      .select(col("doc_id").as("query_id"),
        array_join(slice(split(trim(col("text")), " "), 1, 4), " ").as("query_text"))
    val full = freshTmp("bm25_full")
    val inc  = freshTmp("bm25_inc")
    Bm25.writeIndex(docs, full, nBuckets = 8)
    Bm25.writeIndex(docs.filter(col("doc_id") % 2 === 0), inc, nBuckets = 8)
    Bm25.appendToIndex(docs.filter(col("doc_id") % 2 =!= 0), inc)
    // stats recombine exactly: long token totals + the same double division
    val sFull = spark.read.parquet(s"$full/stats").head
    val sInc  = spark.read.parquet(s"$inc/stats").head
    assert(sFull.getDouble(sFull.fieldIndex("n_docs")) ==
           sInc.getDouble(sInc.fieldIndex("n_docs")))
    assert(sFull.getLong(sFull.fieldIndex("sum_dl")) ==
           sInc.getLong(sInc.fieldIndex("sum_dl")))
    assert(sFull.getDouble(sFull.fieldIndex("avgdl")) ==
           sInc.getDouble(sInc.fieldIndex("avgdl")))
    // probes bit-identical
    val a = Bm25.topKIndexed(qs, full, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).sorted
    val b = Bm25.topKIndexed(qs, inc, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).sorted
    assert(a.nonEmpty && a.sameElements(b))
  }

  test("ivf append: appended vectors live in their own nearest-centroid list") {
    import graft.ann.Knn
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val base     = emb.filter(col("vec_id") % 2 === 0)
    val appended = emb.filter(col("vec_id") % 2 =!= 0)
    val path = freshTmp("ivf_inc")
    Knn.ivfWriteIndex(base, path, nLists = 8, seed = 7L, maxIter = 5)
    Knn.ivfAppendToIndex(appended, path)
    // nProbe=1 probes exactly the query's own nearest list; every appended
    // vector must find ITSELF there (cosine 1 at rank 1), proving the append
    // assigned it with the same stored centroids the probe uses
    val self = Knn.ivfTopKIndexed(appended, path, k = 1, nProbe = 1).collect()
    assert(self.length == appended.count())
    self.foreach { r =>
      assert(r.getLong(0) == r.getLong(1) && r.getDouble(2) == 1.0, s"$r")
    }
    // and the lists partition layout still holds every row exactly once
    val n = spark.read.parquet(s"$path/lists").count()
    assert(n == emb.count())
  }

  test("index appends tolerate an EMPTY delta (stats/layout unchanged)") {
    import graft.search.Bm25
    import graft.ann.Knn
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(50)
    val emptyDocs = docs.filter(lit(false))
    val bp = freshTmp("bm25_empty_delta")
    Bm25.writeIndex(docs, bp, nBuckets = 4)
    val before = spark.read.parquet(s"$bp/stats").head
    Bm25.appendToIndex(emptyDocs, bp)
    val after = spark.read.parquet(s"$bp/stats").head
    assert(before.getDouble(before.fieldIndex("n_docs")) ==
           after.getDouble(after.fieldIndex("n_docs")))
    assert(before.getLong(before.fieldIndex("sum_dl")) ==
           after.getLong(after.fieldIndex("sum_dl")))
    assert(before.getDouble(before.fieldIndex("avgdl")) ==
           after.getDouble(after.fieldIndex("avgdl")))

    val emb = spark.read.parquet(s"$sf/embeddings.parquet").limit(50)
    val ip = freshTmp("ivf_empty_delta")
    Knn.ivfWriteIndex(emb, ip, nLists = 4, seed = 7L, maxIter = 3)
    val nBefore = spark.read.parquet(s"$ip/lists").count()
    Knn.ivfAppendToIndex(emb.filter(lit(false)), ip)
    assert(spark.read.parquet(s"$ip/lists").count() == nBefore)
  }

  // ===== corpus mixing stage ===============================================

  test("corpus mixing samples ONLY stage-4 survivors, labels stay disjoint") {
    import graft.data.{CorpusConfig, CorpusPipeline}
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val base = CorpusConfig(minTokens = 25, maxTokens = 90,
      nearDedupThreshold = Some(0.5), shingleK = 5)
    val plain = CorpusPipeline.run(docs, base)
    val mixed = CorpusPipeline.run(docs, base.copy(
      mixStrataCol = Some("lang"),
      mixRates = Map("en" -> 0.5, "de" -> 0.25),
      mixDefaultRate = 0.1, mixSalt = "s42|"))
    def stageIds(r: graft.data.CorpusResult, stage: String): Set[Long] =
      r.labels.filter(col("drop_stage") === stage)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val keptPlain   = stageIds(plain, "kept")
    val keptMixed   = stageIds(mixed, "kept")
    val sampledOut  = stageIds(mixed, "sampled_out")
    // mixing partitions the unmixed survivors; no earlier label changes
    assert(keptMixed.union(sampledOut) == keptPlain)
    assert(keptMixed.intersect(sampledOut).isEmpty)
    assert(sampledOut.nonEmpty && keptMixed.nonEmpty)
    Seq("quality", "exact_dup", "near_dup").foreach { s =>
      assert(stageIds(plain, s) == stageIds(mixed, s), s"stage $s changed")
    }
    // kept frame matches the kept label set
    assert(mixed.kept.select("doc_id").collect().map(_.getLong(0)).toSet == keptMixed)
  }

  test("temperatureRates: alpha=1 keeps proportions, alpha<1 upsamples rare strata") {
    import graft.data.Sampling
    val docs = Seq.tabulate(900)(i => (i.toLong, "en")) ++
      Seq.tabulate(100)(i => (1000L + i, "fr"))
    val df = docs.toDF("doc_id", "lang")
    // alpha = 1: every stratum keeps exactly targetFraction
    val r1 = Sampling.temperatureRates(df, "lang", alpha = 1.0, targetFraction = 0.3)
    assert(math.abs(r1("en") - 0.3) < 1e-12 && math.abs(r1("fr") - 0.3) < 1e-12)
    // alpha = 0.5: rare stratum rate rises, common falls; expected output
    // stays at targetFraction (no cap hit here)
    val r5 = Sampling.temperatureRates(df, "lang", alpha = 0.5, targetFraction = 0.3)
    assert(r5("fr") > 0.3 && r5("en") < 0.3)
    val expectedRows = 900 * r5("en") + 100 * r5("fr")
    assert(math.abs(expectedRows - 300.0) < 1e-9, s"$r5")
    // saturation: a tiny stratum caps at 1.0
    val skew = (Seq.tabulate(998)(i => (i.toLong, "en")) ++
      Seq((2000L, "xx"), (2001L, "xx"))).toDF("doc_id", "lang")
    val rs = Sampling.temperatureRates(skew, "lang", alpha = 0.1, targetFraction = 0.5)
    assert(rs("xx") == 1.0)
  }

  // ===== shard writer ======================================================

  test("assignShards balances rows exactly and token totals approximately") {
    import graft.data.Packing
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"))
    val n = docs.count()
    val assigned = Packing.assignShards(docs, "doc_id", nShards = 8)
    val per = assigned.groupBy("shard")
      .agg(count(lit(1)).as("rows"), sum("n_tokens").as("toks"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(per.length == 8)
    assert(per.map(_._2).sum == n, "every row lands in exactly one shard")
    assert(per.map(_._2).max - per.map(_._2).min <= 1,
      s"row counts must balance to +-1: ${per.toSeq}")
    // hash order decorrelates token counts from shard id: loose 20% bound
    val toks = per.map(_._3.toDouble)
    assert(toks.max <= toks.min * 1.2,
      s"token totals should be near-equal: ${per.toSeq}")
    // deterministic: a second run assigns identically
    val again = Packing.assignShards(docs, "doc_id", nShards = 8)
      .select("doc_id", "shard").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val first = assigned.select("doc_id", "shard").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(first == again)
  }

  // ===== connected-components convergence contract =========================

  test("connectedComponents fails loudly when maxRounds is exhausted") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("id_a", "id_b")
    val verts = Seq(1L, 2L, 3L, 4L, 5L).toDF("id")
    val e = intercept[IllegalArgumentException] {
      // maxDriverEdges = 0 forces the distributed loop (the driver
      // union-find has no round cap to exhaust)
      graft.data.Dedup.connectedComponents(verts, pairs, maxRounds = 1,
        maxDriverEdges = 0L).collect()
    }
    assert(e.getMessage.contains("did not converge"))
    // and the default cap converges on the same chain — on BOTH paths
    val ok = graft.data.Dedup.connectedComponents(verts, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ok.values.toSet == Set(1L))
    val okDist = graft.data.Dedup.connectedComponents(verts, pairs,
        maxDriverEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(okDist == ok, "driver union-find and distributed loop agree")
  }
}
