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
}
