package graft

import org.apache.spark.sql.functions._

import graft.ann.Knn
import graft.data.Dedup
import graft.multimodal.BinaryMedia

class DataPipelineSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog today"),
    (1L, "the quick brown fox jumps over the lazy dog today"),   // exact dup
    (2L, "the quick brown fox jumps over the lazy cat today"),   // near dup
    (3L, "completely different content about spark engines here"),
    (4L, "another unrelated document speaking of query planners")
  ).toDF("doc_id", "text")

  test("exact dedup groups identical texts") {
    val out = Dedup.exact(docs, "text", "doc_id")
    assert(out.count() == 4)
    assert(out.filter(col("n_copies") === 2 && col("canonical_id") === 0).count() == 1)
  }

  test("ngram jaccard finds exact and near dups") {
    val pairs = Dedup.ngramJaccardPairs(docs, "text", "doc_id", k = 3, threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L))) // exact dup, jaccard 1
    assert(pairs.contains((0L, 2L)) && pairs.contains((1L, 2L))) // near dup
    assert(!pairs.exists(p => p._2 == 3L || p._2 == 4L))
  }

  test("minhash lsh recovers exact dups and verifies with true jaccard") {
    val pairs = Dedup.minHashLshPairs(docs, "text", "doc_id",
      k = 3, numHashes = 32, rowsPerBand = 4, threshold = 0.9)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs.get((0L, 1L)).contains(1.0)) // identical docs always collide
    assert(!pairs.keySet.exists(p => p._2 >= 3L))
  }

  test("simhash puts identical docs at hamming 0") {
    val pairs = Dedup.simHashPairs(docs, "text", "doc_id", maxHamming = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(pairs.get((0L, 1L)).contains(0))
  }

  test("brute force knn ranks identical vector first") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val out = Knn.bruteForceTopK(emb.filter(col("vec_id") < 5), emb, k = 3)
    val top = out.filter(col("rank") === 1).collect()
    assert(top.length == 5)
    top.foreach { r =>
      assert(r.getLong(0) == r.getLong(1)) // self is nearest
      assert(math.abs(r.getDouble(2) - 1.0) < 1e-9)
    }
  }

  test("lsh cosine pairs only reports bucket-mates above threshold") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val out = Knn.lshCosinePairs(emb, nBands = 4, bitsPerBand = 2, minCosine = 0.3)
    assert(out.filter(col("cosine") < 0.3).count() == 0)
  }

  test("banded lsh recall covers brute-force top-1 neighbours on a seeded fixture") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet").filter(col("vec_id") < 200)
    // ground truth: mutual high-cosine pairs from the exact kernel
    val exact = Knn.bruteForceTopK(emb, emb, k = 2, excludeSelf = true)
      .filter(col("rank") === 1 && col("cosine") >= 0.5)
      .select(least(col("query_id"), col("target_id")).as("id_a"),
              greatest(col("query_id"), col("target_id")).as("id_b"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Knn.lshCosinePairs(emb, nBands = 16, bitsPerBand = 4, minCosine = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 16 bands x 4 bits: collision prob for cosine>=0.5 pairs is high; on the
    // seeded fixture the banded index must recover at least 80% of the exact
    // top-1 pairs (the old single-signature variant recovered far fewer)
    if (exact.nonEmpty)
      assert(lsh.intersect(exact).size >= (0.8 * exact.size).floor.toInt)
  }

  test("embedding near-dup star clustering groups mutual neighbours") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.999f, 0.01f, 0.0f)),  // near-dup of 0
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(0.01f, 0.999f, 0.0f)),  // near-dup of 2
      (4L, Array(0.0f, 0.0f, 1.0f))      // singleton
    ).toDF("vec_id", "embedding")
    val out = Dedup.embeddingNearDup(emb, minCosine = 0.95)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out(0L) == (0L, false) && out(1L) == (0L, true))
    assert(out(2L) == (2L, false) && out(3L) == (2L, true))
    assert(out(4L) == (4L, false))
    // LSH path reports a subset of the exact pairs, so each row's rep is
    // bounded by the exact rep below and its own id above (with larger
    // cliques a missed min-id edge can yield an intermediate rep — asserting
    // exact equality would reject correct behavior)
    val lsh = Dedup.embeddingNearDup(emb, minCosine = 0.95, exact = false)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    lsh.foreach { case (id, rep) => assert(rep >= out(id)._1 && rep <= id) }
  }

  test("dedup and lsh operators leave no cached RDDs behind") {
    // other suites share the session and legitimately hold localCheckpoints;
    // this test owns the whole persistent-RDD space only after clearing them
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    val emb = spark.read.parquet(s"$sf/embeddings.parquet").filter(col("vec_id") < 100)
    Dedup.ngramJaccardPairs(docs, "text", "doc_id", k = 3, threshold = 0.3).count()
    Dedup.minHashLshPairs(docs, "text", "doc_id", k = 3, numHashes = 32,
      rowsPerBand = 4, threshold = 0.9).count()
    Dedup.simHashPairs(docs, "text", "doc_id").count()
    Knn.lshCosinePairs(emb, nBands = 4, bitsPerBand = 2, minCosine = 0.3).count()
    // library operators must not pin executor memory the caller can't release
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }

  test("hot-shingle cap keeps candidate pairs linear under pathological skew") {
    // 40 docs sharing one boilerplate prefix (a hot shingle in every doc) +
    // unique tails: without the cap the prefix alone creates 40*39/2 join
    // rows; with cap=5 the shared shingles drop out pre-join
    val boiler = (0 until 40).map { i =>
      (i.toLong, s"terms and conditions apply to document number $i uniquely")
    }
    val hot = boiler.toDF("doc_id", "text")
    val capped = Dedup.ngramJaccardPairs(hot, "text", "doc_id",
      k = 3, threshold = 0.0, maxDocsPerShingle = 5)
    // every shared 3-shingle of the boilerplate appears in all 40 docs > cap,
    // so no pair survives on shared shingles alone
    val nPairs = capped.count()
    assert(nPairs <= 40L * 5)
    val uncapped = Dedup.ngramJaccardPairs(hot, "text", "doc_id",
      k = 3, threshold = 0.0, maxDocsPerShingle = 0)
    assert(uncapped.count() == 40L * 39 / 2) // the quadratic blowup the cap kills
  }

  test("ivf with exhaustive probing equals brute force; partial probe is exact-subset") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 30)
    val bf = Knn.bruteForceTopK(queries, emb, k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> (r.getLong(1), r.getDouble(2))).toMap
    val full = Knn.ivfTopK(queries, emb, k = 3, nLists = 8, nProbe = 8, seed = 7L)
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(full == bf) // exhaustive probing is bit-identical to brute force
    val partial = Knn.ivfTopK(queries, emb, k = 3, nLists = 8, nProbe = 2, seed = 7L)
      .collect()
    // partial probing: every reported cosine is the true cosine (never an
    // estimate), so a reported rank-r score can never beat brute-force rank-r
    partial.foreach { r =>
      val bfEntry = bf((r.getLong(0), r.getInt(3)))
      assert(r.getDouble(2) <= bfEntry._2 + 1e-12)
    }
    // self-match lives in the query's own probed list: recall@1 is perfect
    val top1 = partial.filter(_.getInt(3) == 1)
    assert(top1.forall(r => r.getLong(0) == r.getLong(1)))
  }

  test("disk ivf index: pruned probe reads match the broadcast kernel") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet").filter(col("vec_id") < 150)
    val queries = emb.filter(col("vec_id") < 20)
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_ivf_idx"
    Knn.ivfWriteIndex(emb, path, nLists = 8, seed = 7L, maxIter = 5)
    def key(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getInt(3)) -> (r.getLong(1), r.getDouble(2))).toMap
    val kernel  = key(Knn.ivfTopK(queries, emb, k = 3, nLists = 8, nProbe = 3,
      seed = 7L, maxIter = 5).collect())
    val indexed = Knn.ivfTopKIndexed(queries, path, k = 3, nProbe = 3)
    assert(key(indexed.collect()) == kernel)
    // the index scan must be pruned to the probed list partitions (the
    // mapPartitions scoring puts an RDD boundary in `indexed`, so assert on
    // the scan stage the operator builds internally: an isin filter on the
    // partition column compiles to PartitionFilters, no data filter)
    val prunedScan = spark.read.parquet(s"$path/lists")
      .filter(col("list_id").isin(0, 1, 2))
    val scanStr = prunedScan.queryExecution.executedPlan.toString
    assert(scanStr.contains("PartitionFilters: [list_id#") ||
      scanStr.contains("PartitionFilters: [list_id "),
      s"expected partition pruning in:\n$scanStr")
  }

  test("bucketed ivf path is bit-identical to the broadcast kernel") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet").filter(col("vec_id") < 150)
    val queries = emb.filter(col("vec_id") < 20)
    def key(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getInt(3)) -> (r.getLong(1), r.getDouble(2))).toMap
    val kernel   = key(Knn.ivfTopK(queries, emb, k = 3, nLists = 8, nProbe = 3, seed = 7L).collect())
    val bucketed = key(Knn.ivfTopKBucketed(queries, emb, k = 3, nLists = 8, nProbe = 3, seed = 7L).collect())
    assert(kernel == bucketed)
  }

  test("BMP codec round-trips pixels exactly, both row orders, with padding") {
    // 3x2 image: width 3 -> 9 data bytes/row -> 3 padding bytes/row
    val bgr = Array.tabulate[Byte](3 * 2 * 3)(i => (i * 7 + 1).toByte)
    val bmp = BinaryMedia.encodeBmp(3, 2, bgr)
    assert(bmp(0) == 'B' && bmp(1) == 'M')
    assert(bmp.length == 54 + 12 * 2) // rowSize 12 = 9 data + 3 pad
    val img = BinaryMedia.decodeBmp(bmp)
    assert(img.width == 3 && img.height == 2)
    assert(img.bgr.toSeq == bgr.toSeq)
    // top-down variant (negative height) decodes to the same logical pixels
    val td = bmp.clone()
    td(22) = (-2 & 0xff).toByte; td(23) = 0xff.toByte; td(24) = 0xff.toByte; td(25) = 0xff.toByte
    // flip the row order in the pixel data to match the top-down declaration
    Array.copy(bmp, 54 + 12, td, 54, 12); Array.copy(bmp, 54, td, 54 + 12, 12)
    assert(BinaryMedia.decodeBmp(td).bgr.toSeq == bgr.toSeq)
  }

  test("nearest-neighbour resize picks the classic floor mapping") {
    // 2x2 image with distinct pixels; upscale to 4x4: each source pixel
    // becomes a 2x2 block
    val px = Array[Byte](1, 1, 1, 2, 2, 2, 3, 3, 3, 4, 4, 4)
    val up = BinaryMedia.resizeNearest(BinaryMedia.BmpImage(2, 2, px), 4, 4)
    val b = (x: Int, y: Int) => up.bgr((y * 4 + x) * 3)
    assert(b(0, 0) == 1 && b(1, 1) == 1 && b(2, 0) == 2 && b(3, 3) == 4 && b(0, 2) == 3)
    // downscale back: picks rows/cols 0 and 2 -> original pixels
    val down = BinaryMedia.resizeNearest(up, 2, 2)
    assert(down.bgr.toSeq == px.toSeq)
  }

  test("WAV codec round-trips header and samples; parser skips foreign chunks") {
    val samples = Array[Short](0, 100, -100, 32512, -32768)
    val wav = BinaryMedia.encodeWav(12000, samples)
    val decoded = BinaryMedia.decodeWav(wav)
    assert(decoded.sampleRate == 12000 && decoded.channels == 1 && decoded.bitsPerSample == 16)
    assert(decoded.samples.toSeq == samples.toSeq)
    // splice an unknown (odd-sized, hence padded) chunk between fmt and data
    val fmtEnd = 36 // canonical header: fmt chunk ends where "data" starts
    val extra = Array[Byte]('L', 'I', 'S', 'T', 3, 0, 0, 0, 9, 9, 9, 0) // 3 bytes + pad
    val spliced = wav.take(fmtEnd) ++ extra ++ wav.drop(fmtEnd)
    assert(BinaryMedia.decodeWav(spliced).samples.toSeq == samples.toSeq)
  }

  test("media frames: imageFromText round-trip and header-walking frame sampling") {
    val media = BinaryMedia.imageFromText(docs, "doc_id", "text", width = 16)
    assert(media.schema("media").dataType.typeName == "binary")
    val stats = BinaryMedia.imageStats(media)
    // byte_sum equals the plain sum of UTF-8 bytes (padding contributes 0);
    // a one-row independent check suffices here — the full-table replay is
    // q45's oracle
    val one = stats.orderBy("media_id").head
    val txt = docs.orderBy("doc_id").head.getString(1)
    assert(one.getLong(3) == txt.getBytes("UTF-8").map(_ & 0xff).map(_.toLong).sum)
    assert(one.getInt(1) == 16)
    val resized = BinaryMedia.resizeImages(media, 8, 8)
    val rDims = BinaryMedia.imageStats(resized).select("img_w", "img_h").distinct().collect()
    assert(rDims.length == 1 && rDims(0).getInt(0) == 8 && rDims(0).getInt(1) == 8)
    val video = BinaryMedia.videoFromText(docs, "doc_id", "text", nFrames = 4)
    val all = BinaryMedia.sampleFrames(video, every = 1)
    assert(all.select(min(col("n_frames"))).head.getInt(0) == 4)
    val everyOther = BinaryMedia.sampleFrames(video, every = 2)
    assert(everyOther.select(min(col("n_frames"))).head.getInt(0) == 2)
  }
}
