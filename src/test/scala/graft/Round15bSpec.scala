package graft

import org.apache.spark.sql.functions._

import graft.ann.Pq

/** Round-15 second wave: product quantization (q412–q414).
  *
  * The PQ tier's verification story is unusual for ANN — the fit is exact
  * integer arithmetic, so the DuckDB oracle replays it bit-for-bit and the
  * units here lock the SEMANTIC contract instead: hand-replayed Lloyd
  * rounds, the empty-cluster and tie-break rules, ADC self-distance, and
  * the IVF-PQ ⊆/≡ exhaustive-ADC relations.
  */
class Round15bSpec extends SparkSpec {
  import spark.implicits._

  private def vecDf(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")

  test("pq fit: two Lloyd rounds replayed by hand (m=1, k=2)") {
    // scale=1 ⇒ quantized vectors are the inputs themselves
    val df = vecDf(0L -> Seq(0f, 0f), 1L -> Seq(10f, 0f),
      2L -> Seq(12f, 0f), 3L -> Seq(2f, 0f))
    val cb = Pq.fitCodebook(df, m = 1, subDim = 2, k = 2, iters = 2,
      scale = 1.0)
    // init c0=(0,0) c1=(10,0); round 1: {0,3}→c0 ⇒ (1,0), {1,2}→c1 ⇒ (11,0)
    // round 2: memberships unchanged ⇒ fixed point
    assert(cb.cents(0)(0).toSeq == Seq(1L, 0L))
    assert(cb.cents(0)(1).toSeq == Seq(11L, 0L))
  }

  test("pq fit: an emptied cluster keeps its previous centroid") {
    // ids 0 and 1 are identical, so init c0 = c1 = (0,0); the tie sends
    // both points to cid 0 and cluster 1 receives nothing — it must keep
    // its centroid rather than vanish or NPE
    val df = vecDf(0L -> Seq(0f, 0f), 1L -> Seq(0f, 0f), 2L -> Seq(8f, 0f))
    val cb = Pq.fitCodebook(df, m = 1, subDim = 2, k = 3, iters = 1,
      scale = 1.0)
    assert(cb.cents(0)(0).toSeq == Seq(0L, 0L))
    assert(cb.cents(0)(1).toSeq == Seq(0L, 0L), "emptied cluster retained")
    assert(cb.cents(0)(2).toSeq == Seq(8L, 0L))
  }

  test("pq encode: equidistant vector takes the smaller cid") {
    val seeds = vecDf(0L -> Seq(1f, 0f), 1L -> Seq(11f, 0f))
    val cb = Pq.fitCodebook(seeds, m = 1, subDim = 2, k = 2, iters = 0,
      scale = 1.0) // iters=0 ⇒ codebook == the two seeds
    val probe = vecDf(5L -> Seq(6f, 0f)) // dist 25 to both centroids
    val code = Pq.encode(probe, cb).select("code").as[Int].head()
    assert(code == 0, "tie must break to the smaller cid")
  }

  test("pq adc: a vector that IS a centroid combination self-scores 0 at rank 1") {
    val seeds = vecDf(0L -> Seq(0f, 2f, 7f, 1f), 1L -> Seq(9f, 4f, 3f, 8f))
    // m=2 subspaces of 2 dims; iters=0 keeps the seed subvectors as
    // centroids, so each seed's ADC distance to itself is exactly 0
    val cb = Pq.fitCodebook(seeds, m = 2, subDim = 2, k = 2, iters = 0,
      scale = 1.0)
    val top = Pq.adcTopK(seeds, seeds, cb, k = 1)
      .select("query_id", "target_id", "adc_dist", "rank")
      .as[(Long, Long, Long, Int)].collect().toSet
    assert(top == Set((0L, 0L, 0L, 1), (1L, 1L, 0L, 1)))
  }

  test("residual ivf-pq: with ONE coarse list it equals plain ADC over " +
      "pre-centered vectors (residual arithmetic is exact centering)") {
    // coarse k=1, iters=1 ⇒ the single centroid is the floored mean
    // (4,4,4,4); the residual index must therefore behave exactly like a
    // plain PQ index built on the hand-centered data
    val raw = vecDf(0L -> Seq(0f, 0f, 4f, 4f), 1L -> Seq(2f, 2f, 0f, 0f),
      2L -> Seq(8f, 8f, 8f, 8f), 3L -> Seq(6f, 6f, 4f, 4f))
    val centered = vecDf(0L -> Seq(-4f, -4f, 0f, 0f),
      1L -> Seq(-2f, -2f, -4f, -4f), 2L -> Seq(4f, 4f, 4f, 4f),
      3L -> Seq(2f, 2f, 0f, 0f))
    val coarse = Pq.fitCodebook(raw, m = 1, subDim = 4, k = 1, iters = 1,
      scale = 1.0)
    assert(coarse.cents(0)(0).toSeq == Seq(4L, 4L, 4L, 4L))
    val rcb = Pq.fitResidualCodebook(raw, coarse, m = 2, subDim = 2, k = 2,
      iters = 1)
    val cb = Pq.fitCodebook(centered, m = 2, subDim = 2, k = 2, iters = 1,
      scale = 1.0)
    assert(rcb.cents.map(_.map(_.toSeq).toSeq).toSeq ==
      cb.cents.map(_.map(_.toSeq).toSeq).toSeq,
      "residual codebook must equal the centered-data codebook")
    val viaResidual = Pq.residualIvfAdcTopK(raw, raw, coarse, rcb,
      nProbe = 1, k = 4).as[(Long, Long, Long, Int)].collect().toSet
    val viaCentered = Pq.adcTopK(centered, centered, cb, k = 4)
      .as[(Long, Long, Long, Int)].collect().toSet
    assert(viaResidual == viaCentered)
  }

  test("residual ivf-pq: gating changes recall, never arithmetic — " +
      "nProbe=1 distances are a subset of the all-lists scan") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 10)
    val coarse = Pq.fitCodebook(emb, m = 1, subDim = 64, k = 4, iters = 1)
    val rcb = Pq.fitResidualCodebook(emb, coarse, m = 4, subDim = 16,
      k = 8, iters = 1)
    val all = Pq.residualIvfAdcTopK(emb, queries, coarse, rcb, nProbe = 4,
      k = 1 << 30).select("query_id", "target_id", "adc_dist")
      .as[(Long, Long, Long)].collect().toSet
    val gated = Pq.residualIvfAdcTopK(emb, queries, coarse, rcb,
      nProbe = 1, k = 1 << 30).select("query_id", "target_id", "adc_dist")
      .as[(Long, Long, Long)].collect().toSet
    assert(gated.nonEmpty && gated.subsetOf(all))
  }

  test("index recall gate (q416): every variant scores 30 queries with " +
      "recall in [0, 10^6] and worst-case <= mean") {
    val out = graft.queries.DataQueries
      .queries("q416_index_recall_gate")(spark, sf)
      .as[(String, Long, Long, Long)].collect()
    assert(out.map(_._1).toSet == Set("int8", "pq_adc", "ivf_pq"))
    out.foreach { case (v, nq, mean, worst) =>
      assert(nq == 30L, s"$v must score every query")
      assert(mean >= 0L && mean <= 1000000L, s"$v mean out of range")
      assert(worst >= 0L && worst <= mean, s"$v worst-case above mean")
    }
  }

  test("pq disk index: the probe is bit-identical to the in-memory " +
      "search, and a frozen-codebook append equals indexing the union") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 10)
    val tmpDir = System.getProperty("java.io.tmpdir")
    val p1 = s"$tmpDir/graft_test_pqidx_${spark.sparkContext.applicationId}"
    graft.operators.FsUtil.deleteRecursively(new java.io.File(p1))
    graft.ann.Pq.writeIndex(emb, p1, m = 4, subDim = 16, k = 8, iters = 1,
      nLists = 4)
    val disk = graft.ann.Pq.probeIndex(q, p1, nProbe = 2, k = 5)
      .as[(Long, Long, Long, Int)].collect().toSet
    val coarse = graft.ann.Pq.fitCodebook(emb, m = 1, subDim = 64, k = 4,
      iters = 1)
    val rcb = graft.ann.Pq.fitResidualCodebook(emb, coarse, m = 4,
      subDim = 16, k = 8, iters = 1)
    val mem = graft.ann.Pq.residualIvfAdcTopK(emb, q, coarse, rcb,
      nProbe = 2, k = 5).as[(Long, Long, Long, Int)].collect().toSet
    assert(disk == mem, "disk probe must equal the in-memory search")
    graft.operators.FsUtil.deleteRecursively(new java.io.File(p1))

    // append identity: build on evens, append odds; probing must equal an
    // in-memory search over the FULL corpus with the even-fitted codebooks
    val a = emb.filter(col("vec_id") % 2 === 0)
    val b = emb.filter(col("vec_id") % 2 === 1)
    val p2 = s"$tmpDir/graft_test_pqapp_${spark.sparkContext.applicationId}"
    graft.operators.FsUtil.deleteRecursively(new java.io.File(p2))
    graft.ann.Pq.writeIndex(a, p2, m = 4, subDim = 16, k = 8, iters = 1,
      nLists = 4)
    graft.ann.Pq.appendToIndex(b, p2)
    val appended = graft.ann.Pq.probeIndex(q, p2, nProbe = 4, k = 5)
      .as[(Long, Long, Long, Int)].collect().toSet
    val coarseA = graft.ann.Pq.fitCodebook(a, m = 1, subDim = 64, k = 4,
      iters = 1)
    val rcbA = graft.ann.Pq.fitResidualCodebook(a, coarseA, m = 4,
      subDim = 16, k = 8, iters = 1)
    val union = graft.ann.Pq.residualIvfAdcTopK(emb, q, coarseA, rcbA,
      nProbe = 4, k = 5).as[(Long, Long, Long, Int)].collect().toSet
    assert(appended == union,
      "append under frozen codebooks must equal indexing the union")
    graft.operators.FsUtil.deleteRecursively(new java.io.File(p2))
  }

  test("refined recall gate (q432): re-ranking the shortlist never " +
      "loses recall vs raw ADC (hits are a superset structurally)") {
    val out = graft.queries.DataQueries
      .queries("q432_refined_recall_gate")(spark, sf)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(out.keySet == Set("ivf_pq_raw", "refined"))
    assert(out("refined") >= out("ivf_pq_raw"),
      s"refined recall must dominate raw ADC: $out")
  }

  test("pq refined search: probing every list with a corpus-sized " +
      "shortlist reproduces the exact brute-force top-k bit for bit") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 10)
    val coarse = graft.ann.Pq.fitCodebook(emb, m = 1, subDim = 64, k = 4,
      iters = 1)
    val rcb = graft.ann.Pq.fitResidualCodebook(emb, coarse, m = 4,
      subDim = 16, k = 8, iters = 1)
    val refined = graft.ann.Pq.refinedTopK(emb, q, coarse, rcb,
        nProbe = 4, shortlist = 1 << 20, k = 5)
      .as[(Long, Long, Double, Int)].collect().toSet
    val exact = graft.ann.Knn.bruteForceTopK(q, emb, k = 5)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(refined == exact,
      "exhaustive shortlist + exact re-rank must equal brute force")
  }

  test("personalized pagerank: hand-replayed 2 iterations on a 3-chain " +
      "seeded at one end") {
    // chain 0-1-2 (both directions), seed {0}, d = 500000:
    // r0 = (1e6, 0, 0)
    // it1: inc = (0, 1e6, 0)  -> r1 = (5e5, 5e5, 0)
    // it2: contrib 0->1: 5e5; 1->{0,2}: 25e4 each
    //      r2 = (5e5 + 125000, 250000, 125000)
    val edges = Seq((0L, 1L), (1L, 0L), (1L, 2L), (2L, 1L))
      .toDF("src", "dst")
    val seeds = Seq(0L).toDF("id")
    val out = graft.operators.PageRank.personalizedRanks(edges, "src",
        "dst", seeds, "id", iterations = 2, dampingPpm = 500000L)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(0L -> 625000L, 1L -> 250000L, 2L -> 125000L),
      s"hand-computed PPR mismatch: $out")
  }

  test("rocchio feedback: centroid, query move, and second-pass dots " +
      "hand-replayed exactly") {
    // q=(10,0); rel1: a=100, b=90, c=0, d=30 -> fb={a,b};
    // centroid = floor((19/2, 3/2)) = (9,1); q' = (19,1);
    // rel2: a=190, b=174, d=66, c=8
    val q = Seq((7L, Seq(10f, 0f))).toDF("vec_id", "embedding")
    val t = Seq((0L, Seq(10f, 0f)), (1L, Seq(9f, 3f)), (2L, Seq(0f, 8f)),
      (3L, Seq(3f, 9f))).toDF("vec_id", "embedding")
    val out = graft.ann.Rocchio.feedbackTopK(q, t, fbDocs = 2, k = 4,
      scale = 1.0).as[(Long, Long, Long, Int)].collect().sortBy(_._4)
    assert(out.toSeq == Seq((7L, 0L, 190L, 1), (7L, 1L, 174L, 2),
      (7L, 3L, 66L, 3), (7L, 2L, 8L, 4)),
      s"hand-computed Rocchio sequence mismatch: ${out.mkString(", ")}")
  }

  test("query likelihood: higher tf wins at equal length, shorter doc " +
      "wins at equal tf (the Dirichlet normalizer)") {
    val docs = Seq((1L, "apple apple"), (2L, "apple pear"),
      (3L, "apple pear plum grape")).toDF("doc_id", "text")
    val qs = Seq((9L, "apple")).toDF("query_id", "query_text")
    val out = graft.search.Bm25
      .topKQueryLikelihood(docs, qs, k = 10, mu = 2000.0)
      .orderBy("rank").select("doc_id").as[Long].collect().toSeq
    assert(out == Seq(1L, 2L, 3L),
      s"expected tf then length to decide the order, got $out")
  }

  test("bm25 rm3: expansion terms recall a document sharing NO original " +
      "query term; plain bm25 cannot see it") {
    val docs = Seq((1L, "apple banana"), (2L, "apple cherry"),
      (3L, "cherry mango")).toDF("doc_id", "text")
    val qs = Seq((100L, "apple")).toDF("query_id", "query_text")
    val plain = graft.search.Bm25.topK(docs, qs, k = 10)
      .select("doc_id").as[Long].collect().toSet
    assert(!plain.contains(3L), "no 'apple' in doc 3")
    val expanded = graft.search.Bm25.topKExpanded(docs, qs, k = 10,
      fbDocs = 2, fbTerms = 2)
      .select("doc_id").as[Long].collect().toSet
    // feedback docs 1 and 2 donate 'banana' and 'cherry'; 'cherry' recalls
    // doc 3 in the second pass
    assert(expanded.contains(3L),
      s"expansion must recall doc 3, got $expanded")
    assert(expanded.contains(1L) && expanded.contains(2L))
  }

  test("mmr rerank: the near-duplicate of the best hit is pushed below " +
      "a diverse candidate — hand-checked greedy sequence") {
    // query (10,1); candidates 0 and 1 are identical (9,0), candidate 2 is
    // orthogonal-ish (0,60). rel: 90, 90, 60. Pick 1: cand 0 (rel tie to
    // the smaller id). Pick 2: cand 1 scores 2*90 - 81 = 99, cand 2 scores
    // 2*60 - 0 = 120 -> the diverse cand 2 wins. Pick 3: cand 1.
    val q = Seq((100L, Seq(10f, 1f))).toDF("vec_id", "embedding")
    val t = Seq((0L, Seq(9f, 0f)), (1L, Seq(9f, 0f)), (2L, Seq(0f, 60f)))
      .toDF("vec_id", "embedding")
    val out = graft.ann.Mmr.rerank(q, t, nCandidates = 3, k = 3,
      scale = 1.0).as[(Long, Long, Long, Int)].collect().sortBy(_._4)
    assert(out.map(r => (r._2, r._4)).toSeq == Seq((0L, 1), (2L, 2), (1L, 3)),
      s"expected MMR order 0, 2, 1 — got ${out.mkString(", ")}")
    assert(out.map(_._3).toSeq == Seq(90L, 60L, 90L))
  }

  test("streaming pq probe (q425): both streamed batches land and every " +
      "query scores a full top-5") {
    val out = graft.queries.SourceStreamQueries
      .queries("q425_stream_pq_adc")(spark, sf)
      .as[(Long, Long, Long, Int)].collect()
    assert(out.length == 150, s"30 queries x top-5, got ${out.length}")
    assert(out.map(_._1).distinct.sorted.toSeq == (0L until 30L),
      "both batches' query ranges must be present")
    assert(out.groupBy(_._1).values.forall(_.map(_._4).sorted.toSeq ==
      Seq(1, 2, 3, 4, 5)))
  }

  test("skip-gram pairs: hand-counted emission over a revisiting walk, " +
      "window 2") {
    // walk [5,6,7,6]: ordered position pairs with |i-j| in {1,2} give
    // (5,6)1 (5,7)1 (6,5)1 (6,7)2 (6,6)2 (7,5)1 (7,6)2 — revisits emit
    // legitimate (v,v) pairs
    val walks = Seq((9L, 0, 5L), (9L, 1, 6L), (9L, 2, 7L), (9L, 3, 6L))
      .toDF("start", "step", "node")
    val pairs = graft.operators.Graphs.skipGramPairs(walks, window = 2)
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(pairs == Map((5L, 6L) -> 1L, (5L, 7L) -> 1L, (6L, 5L) -> 1L,
      (6L, 7L) -> 2L, (6L, 6L) -> 2L, (7L, 5L) -> 1L, (7L, 6L) -> 2L),
      s"hand-counted skip-gram mismatch: $pairs")
  }

  test("hash walks: hops are always edges, forced hops are taken, " +
      "isolated starts emit only step 0") {
    val edges = Seq((0L, 1L), (1L, 2L)).toDF("src", "dst") // path 0-1-2
    val starts = Seq(0L, 99L).toDF("id") // 99 is not a graph node
    val walks = graft.operators.Graphs
      .hashWalks(edges, "src", "dst", starts, "id", len = 3)
      .as[(Long, Int, Long)].collect()
    val w0 = walks.filter(_._1 == 0L).sortBy(_._2)
    assert(w0.map(_._2).toSeq == Seq(0, 1, 2, 3))
    assert(w0(0)._3 == 0L && w0(1)._3 == 1L,
      "step 1 from node 0 must take its only edge")
    val edgeSet = Set((0L, 1L), (1L, 0L), (1L, 2L), (2L, 1L))
    w0.sliding(2).foreach {
      case Array(a, b) => assert(edgeSet.contains((a._3, b._3)),
        s"hop ${a._3}->${b._3} is not an edge")
      case _ =>
    }
    assert(walks.filter(_._1 == 99L).map(_._2).toSeq == Seq(0),
      "isolated start emits only its step-0 row")
  }

  test("winnowing: a shared 6-word run (w+k-1) guarantees a shared " +
      "fingerprint; a 6-word doc yields exactly one") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota"),
      (2L, "one two three gamma delta epsilon zeta eta kappa"),
      (3L, "six little words exactly here now")).toDF("doc_id", "text")
    val fp = graft.functions.Winnowing
      .fingerprints(docs, "doc_id", "text", k = 3, w = 4)
      .as[(Long, Long, String)].collect()
    val byDoc = fp.groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    // docs 1 and 2 share "gamma delta epsilon zeta eta" plus one more
    // overlapping token position — a >= w+k-1 run — so the detection
    // guarantee applies
    assert(byDoc(1L).intersect(byDoc(2L)).nonEmpty,
      "shared 6-word run must share a fingerprint")
    assert(byDoc(3L).size == 1, "exactly one full window for 6 words")
  }

  test("winnowing: density guarantee — selected positions never gap by " +
      "more than w") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") < 50)
    val fp = graft.functions.Winnowing
      .fingerprints(docs, "doc_id", "text", k = 3, w = 4)
      .select("doc_id", "fp_pos").as[(Long, Long)].collect()
    fp.groupBy(_._1).foreach { case (d, rows) =>
      val ps = rows.map(_._2).sorted
      ps.sliding(2).foreach {
        case Array(a, b) =>
          assert(b - a <= 4L, s"doc $d gaps ${b - a} > w between $a and $b")
        case _ =>
      }
    }
  }

  test("k-center coreset: hand-replayed 1-D farthest-point traversal") {
    val df = Seq((0L, Seq(0f)), (1L, Seq(1f)), (2L, Seq(10f)),
      (3L, Seq(20f))).toDF("vec_id", "embedding")
    val out = graft.ann.Coreset.kCenters(df, k = 3, dim = 1, scale = 1.0)
      .as[(Int, Long, Option[Long], Long)].collect().sortBy(_._1)
    // anchor 0; farthest is 3 (400); then 2 (min(100 to 0, 100 to 20)=100);
    // remaining point 1 has dmin 1 = the cover radius
    assert(out.toSeq == Seq((1, 0L, None, 1L), (2, 3L, Some(400L), 1L),
      (3, 2L, Some(100L), 1L)))
  }

  test("k-center coreset: selection distances are non-increasing and " +
      "bound the final cover radius") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val out = graft.ann.Coreset.kCenters(emb, k = 5, dim = 64)
      .as[(Int, Long, Option[Long], Long)].collect().sortBy(_._1)
    val dsels = out.flatMap(_._3)
    assert(dsels.length == 4)
    dsels.sliding(2).foreach {
      case Array(a, b) => assert(b <= a, "greedy picks must not increase")
      case _ =>
    }
    assert(out.head._4 <= dsels.last,
      "cover radius cannot exceed the last selection distance")
    assert(out.map(_._2).distinct.length == 5, "centers are distinct")
  }

  test("multi-probe lsh: an exact twin is found at cosine 1.0 even with " +
      "a single probe (identical signature is structural)") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val twin = emb.filter(col("vec_id") === 0)
      .withColumn("vec_id", lit(999999L))
    val corpus = emb.unionByName(twin)
    val res = graft.ann.Knn.lshMultiProbeTopK(corpus,
        corpus.filter(col("vec_id") === 0), k = 5, nBits = 12, nProbes = 1)
      .as[(Long, Long, Double, Int)].collect()
    val found = res.filter(t => t._2 == 999999L)
    assert(found.length == 1 && found.head._3 == 1.0,
      s"twin must collide and score exactly 1.0: ${res.mkString(", ")}")
    assert(res.exists(t => t._2 == 0L && t._3 == 1.0), "self found too")
  }

  test("multi-probe lsh: more probes never lose recall, and reported " +
      "cosines equal the exact kernel's") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 20)
    val exact = graft.ann.Knn.bruteForceTopK(q, emb, k = 5)
      .select("query_id", "target_id", "cosine").localCheckpoint()
    def run(p: Int) = graft.ann.Knn.lshMultiProbeTopK(emb, q, k = 5,
      nBits = 12, nProbes = p).localCheckpoint()
    val r1 = run(1); val r8 = run(8)
    def hits(df: org.apache.spark.sql.DataFrame): Long =
      df.join(exact.select("query_id", "target_id"),
        Seq("query_id", "target_id"), "left_semi").count()
    assert(hits(r8) >= hits(r1), "probe superset must not lose recall")
    // any (query, target) reported by LSH and present in the exact top-5
    // must carry the identical round-9 cosine — verification is exact
    val mismatches = r8.select(col("query_id"), col("target_id"),
        col("cosine").as("c_lsh"))
      .join(exact, Seq("query_id", "target_id"))
      .filter(col("c_lsh") =!= col("cosine")).count()
    assert(mismatches == 0L)
  }

  test("louvain move: the mislabeled triangle member rejoins its " +
      "triangle — hand-checked 2m^2-scaled gains") {
    // two triangles {0,1,2} and {3,4,5} plus the bridge 2–3; node 2 is
    // mislabeled B. gain(2→A)·2m² = 2·7·(2−1) − 3·(4−10+3) = 23 > 0 and
    // every other node's best alternative is non-positive, so EXACTLY
    // node 2 moves and the partition becomes the two triangles
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 2L), (3L, 4L), (3L, 5L),
      (4L, 5L), (2L, 3L)).toDF("src", "dst")
    val labels = Seq((0L, "A"), (1L, "A"), (2L, "B"), (3L, "B"),
      (4L, "B"), (5L, "B")).toDF("node", "lbl")
    val moves = graft.operators.Graphs
      .louvainMove(edges, "src", "dst", labels, "node", "lbl")
      .as[(Long, String, String)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(moves(2L) == ("B", "A"))
    moves.filterNot(_._1 == 2L).foreach { case (n, (o, nw)) =>
      assert(o == nw, s"node $n must not move")
    }
  }

  test("louvain move: a partition at its local optimum is a fixpoint") {
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 2L), (3L, 4L), (3L, 5L),
      (4L, 5L), (2L, 3L)).toDF("src", "dst")
    val perfect = Seq((0L, "A"), (1L, "A"), (2L, "A"), (3L, "B"),
      (4L, "B"), (5L, "B")).toDF("node", "lbl")
    val moves = graft.operators.Graphs
      .louvainMove(edges, "src", "dst", perfect, "node", "lbl")
      .as[(Long, String, String)].collect()
    assert(moves.length == 6 && moves.forall(t => t._2 == t._3),
      s"no node may move off the optimum: ${moves.mkString(", ")}")
  }

  test("ivf-pq: probing every list reproduces exhaustive ADC exactly; " +
      "fewer probes stay a subset per query") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 10)
    val cb = Pq.fitCodebook(emb, m = 4, subDim = 16, k = 8, iters = 1)
    val coarse = Pq.fitCodebook(emb, m = 1, subDim = 64, k = 4, iters = 1)
    val exhaustive = Pq.adcTopK(emb, queries, cb, k = 5)
      .as[(Long, Long, Long, Int)].collect().toSet
    val allProbes = Pq.ivfAdcTopK(emb, queries, cb, coarse, nProbe = 4,
      k = 5).as[(Long, Long, Long, Int)].collect().toSet
    assert(allProbes == exhaustive,
      "nProbe = nLists must equal the exhaustive ADC scan")
    // nProbe=1: every returned (query, target, dist) must appear in the
    // exhaustive scoring with the SAME distance (gating changes recall,
    // never arithmetic)
    val gatedDists = Pq.ivfAdcTopK(emb, queries, cb, coarse, nProbe = 1,
      k = 5).select("query_id", "target_id", "adc_dist")
      .as[(Long, Long, Long)].collect().toSet
    val exhaustiveAll = Pq.adcTopK(emb, queries, cb, k = 1 << 30)
      .select("query_id", "target_id", "adc_dist")
      .as[(Long, Long, Long)].collect().toSet
    assert(gatedDists.subsetOf(exhaustiveAll),
      "gated ADC distances must match the exhaustive arithmetic")
  }
}
