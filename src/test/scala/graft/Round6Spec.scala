package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.idx.{CosSimIndexer, CosSimKernel}
import graft.multimodal.BinaryMedia

/** Round-6 additions: fit-time idf broadcast lifecycle, weak-reference
  * registry, allocation-free HALF_UP rounding, video frame stats, codec
  * header hardening.
  */
class Round6Spec extends SparkSpec {

  import spark.implicits._

  private def gtDf = Seq(
    (1L, 1L, "acme industries"),
    (2L, 2L, "zenith corp"),
    (3L, 3L, "nadir holdings")).toDF("uid", "entity_id", "preprocessed")

  private def eventually(timeoutMs: Long = 15000)(cond: => Boolean): Boolean = {
    val deadline = System.currentTimeMillis() + timeoutMs
    var ok = cond
    while (!ok && System.currentTimeMillis() < deadline) { Thread.sleep(100); ok = cond }
    ok
  }

  // ===== allocation-free HALF_UP ==========================================

  test("roundHalfUp is bit-identical to the BigDecimal HALF_UP expansion") {
    def exact(x: Double, p: Int): Double =
      BigDecimal(x).setScale(p, BigDecimal.RoundingMode.HALF_UP).toDouble
    // exact binary ties (x.5 at prec 0) must round away from zero
    for (x <- Seq(0.5, 1.5, 2.5, -0.5, -1.5, 3.0, -0.0, 0.0))
      assert(java.lang.Double.compare(CosSimKernel.roundHalfUp(x, 0), exact(x, 0)) == 0,
        s"prec=0 x=$x")
    // deterministic sweep: cosine-like values, near-tie grids, negatives
    val rnd = new scala.util.Random(42)
    val samples =
      (0 until 20000).map(_ => rnd.nextDouble() * 1.2) ++
      (0 until 5000).map(_ => -rnd.nextDouble()) ++
      // values engineered close to the .5 boundary at prec 9
      (0 until 2000).map(i => (i.toLong * 1000 + 500).toDouble / 1e12) ++
      (0 until 2000).map(i => (i.toLong * 1000 + 499).toDouble / 1e12 + 1e-13) ++
      Seq(0.1234567895, 0.9999999995, 1.0000000005, 4.9999999999e-10, 5.0000000001e-10)
    for (x <- samples; p <- Seq(2, 6, 9)) {
      val got = CosSimKernel.roundHalfUp(x, p)
      val want = exact(x, p)
      assert(java.lang.Double.compare(got, want) == 0,
        s"prec=$p x=$x got=$got want=$want")
    }
  }

  // ===== fit-time idf broadcast lifecycle =================================

  test("TfidfModel broadcasts idf once at fit; transform adds nothing; release drops it") {
    BroadcastLifecycle.releaseAll()
    val model = new CosSimIndexer(numCandidates = 3, lowerBound = 0.1).fit(gtDf)
    // exactly two tracked broadcasts per fitted cos-sim stack: packed GT + idf
    assert(BroadcastLifecycle.trackedCount == 2,
      s"expected gt+idf tracked, got ${BroadcastLifecycle.trackedCount}")
    val names = Seq((10L, "acme industries"), (11L, "zenith corp"))
      .toDF("uid", "preprocessed")
    (1 to 3).foreach(_ => assert(model.transform(names).count() >= 1))
    assert(BroadcastLifecycle.trackedCount == 2,
      "transform must NOT create new tracked broadcasts")
    model.release()
    assert(BroadcastLifecycle.trackedCount == 0)
    // transform after release is dead (idf broadcast destroyed)
    intercept[Exception] { model.tfidf.idfBc.value }
  }

  // ===== weak-reference registry ==========================================

  test("a dropped, unreleased broadcast stays ContextCleaner-eligible (weak refs)") {
    BroadcastLifecycle.releaseAll()
    def leak(): Unit = {
      BroadcastLifecycle.track(spark.sparkContext.broadcast(Array.fill(1024)(1.0)))
      ()
    }
    leak()
    // the registry must not pin the abandoned broadcast: once GC clears the
    // weak ref the entry disappears from the live count
    assert(eventually() { System.gc(); BroadcastLifecycle.trackedCount == 0 },
      "registry pinned an unreachable broadcast")
  }

  test("live broadcasts survive GC and stay releasable") {
    BroadcastLifecycle.releaseAll()
    val bc = BroadcastLifecycle.track(spark.sparkContext.broadcast(Array(1, 2, 3)))
    System.gc()
    assert(BroadcastLifecycle.trackedCount == 1)
    assert(BroadcastLifecycle.releaseAll() == 1)
    intercept[Exception] { bc.value }
  }

  // ===== persistence round-trip leaves no tracked leak ====================

  test("Persistence.load -> release() leaves trackedCount at 0") {
    val parts = spark.read.parquet(s"$sf/part.parquet")
      .select(col("p_partkey").as("id"), col("p_name").as("company"),
              col("p_brand").as("brand"))
    val model = EntityMatching(
      EmParams(nameCol = "company", entityIdCol = "brand", uidCol = "id"),
      indexers = Seq(new CosSimIndexer(numCandidates = 2, lowerBound = 0.3)))
      .fit(parts)
    val dir = Files.createTempDirectory("graftmodel6").toString + "/model"
    Persistence.save(model, dir)
    model.release()
    BroadcastLifecycle.releaseAll()
    val loaded = Persistence.load(spark, dir)
    assert(loaded.transform(parts.limit(5)).count() > 0)
    assert(BroadcastLifecycle.trackedCount > 0, "load re-fits and re-tracks")
    loaded.release()
    assert(BroadcastLifecycle.trackedCount == 0,
      "release() after load must drop every re-fit broadcast (gt + idf)")
  }

  // ===== video frame stats (q71 kernel) ===================================

  test("frameStats replays the frame splitter and per-frame decode") {
    // 100 ASCII bytes -> per = 25 bytes/frame; at width 8 (24 B/row) each
    // frame is 2 rows => 54 + 48 = 102 container bytes; every=2 keeps f0, f2
    val text = (0 until 100).map(i => ('A' + i % 26).toChar).mkString
    val df = Seq((7L, text)).toDF("doc_id", "text")
    val out = BinaryMedia.frameStats(BinaryMedia.sampleFrames(
      BinaryMedia.videoFromText(df, "doc_id", "text", nFrames = 4, frameWidth = 8),
      every = 2)).collect()
    assert(out.length == 1)
    val r = out.head
    val bytes = text.getBytes(StandardCharsets.UTF_8)
    val expectedPx = bytes.slice(0, 25).map(_ & 0xff).sum.toLong +
      bytes.slice(50, 75).map(_ & 0xff).sum.toLong
    assert(r.getLong(0) == 7L)
    assert(r.getInt(1) == 2, "every=2 over 4 frames keeps 2")
    assert(r.getLong(2) == 204L, s"2 frames x 102 bytes, got ${r.getLong(2)}")
    assert(r.getLong(3) == expectedPx)
    assert(r.getInt(4) == 2, "tail frame is 25 bytes = 2 rows of 24")
  }

  test("empty text still yields nFrames 8x1 zero frames") {
    val df = Seq((1L, "")).toDF("doc_id", "text")
    val r = BinaryMedia.frameStats(BinaryMedia.sampleFrames(
      BinaryMedia.videoFromText(df, "doc_id", "text", nFrames = 4, frameWidth = 8),
      every = 2)).collect().head
    // each empty frame: 1 row of zero-padded pixels, 54 + 24 bytes
    assert(r.getInt(1) == 2 && r.getLong(2) == 156L && r.getLong(3) == 0L &&
      r.getInt(4) == 1)
  }

  // ===== codec header hardening ===========================================

  test("decodeBmp rejects hostile headers with clean errors") {
    val good = BinaryMedia.encodeBmp(2, 2, new Array[Byte](12))
    def corrupt(off: Int, value: Int): Array[Byte] = {
      val b = good.clone()
      b(off) = (value & 0xff).toByte
      b(off + 1) = ((value >> 8) & 0xff).toByte
      b(off + 2) = ((value >> 16) & 0xff).toByte
      b(off + 3) = ((value >> 24) & 0xff).toByte
      b
    }
    intercept[IllegalArgumentException] { BinaryMedia.decodeBmp(corrupt(18, -5)) }
    intercept[IllegalArgumentException] { BinaryMedia.decodeBmp(corrupt(18, 0)) }
    intercept[IllegalArgumentException] { BinaryMedia.decodeBmp(corrupt(22, Int.MinValue)) }
    // implausible volume: width*height*3 overflows Int
    intercept[IllegalArgumentException] { BinaryMedia.decodeBmp(corrupt(18, 1 << 20)) }
    intercept[IllegalArgumentException] { BinaryMedia.decodeBmp(corrupt(10, 7)) }
    intercept[IllegalArgumentException] { BinaryMedia.decodeBmp(corrupt(10, 1 << 30)) }
    // the original still decodes
    assert(BinaryMedia.decodeBmp(good).width == 2)
  }

  test("sampleFrames stops at a declared frame size smaller than a header") {
    val frame = BinaryMedia.encodeBmp(2, 1, new Array[Byte](6))
    val corrupt = frame.clone()
    corrupt(2) = 10; corrupt(3) = 0; corrupt(4) = 0; corrupt(5) = 0 // size=10 < 54
    val df = Seq((1L, frame ++ frame), (2L, corrupt ++ frame))
      .toDF("media_id", "media")
    val got = BinaryMedia.sampleFrames(df).select("media_id", "n_frames")
      .as[(Long, Int)].collect().toMap
    assert(got(1L) == 2 && got(2L) == 0)
  }

  // ===== kernel scratch memory bound ======================================

  test("Scratch caps cached per-block score arrays") {
    val scratch = new CosSimKernel.Scratch
    (0 until 5 * CosSimKernel.MaxCachedBlocks)
      .foreach(i => scratch.scoresFor("block" + i, 16))
    assert(scratch.blockScores.size() == CosSimKernel.MaxCachedBlocks)
    // LRU: the most recently touched block survives
    assert(scratch.blockScores.containsKey(
      "block" + (5 * CosSimKernel.MaxCachedBlocks - 1)))
  }
}
