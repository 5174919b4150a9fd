package graft.ann

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Approximate/exact nearest-neighbour search over an embedding column
  * (`array<float>`), for embedding-based dedup and similarity search.
  *
  * Brute-force path: the target set is collected and broadcast as one packed
  * primitive float array (row-major), queries stream through a map-only
  * partition kernel computing cosine top-k — the same broadcast-join shape as
  * the cos-sim name indexer, so the query side never shuffles. Fine up to a
  * few million targets (64-dim × 4B ≈ 256 MB at 1M rows).
  *
  * LSH path for the scale beyond broadcast: deterministic random-hyperplane
  * signatures bucket both sides; only bucket-mates are scored. Map-only +
  * one shuffle on the bucket key.
  *
  * Scores are rounded at 9 decimals (HALF_UP) before ranking, like the
  * cos-sim indexer, so ordering is stable across summation orders.
  */
/** Bounded (cosine DESC, target_id ASC) insertion buffer shared by the four
  * broadcast top-k kernels (float/int8 brute force, float/int8 IVF) — ONE
  * implementation of the ordering contract, so the bit-identity oracles
  * (q43 vs q53, q76 vs q81) cannot drift. `bestS`/`bestT` hold the current
  * top `nBest` (scores descending, `bestT` indexing into the packed block
  * whose ids break score ties ascending); k is small, so insertion beats a
  * heap. Static-dispatch object: closures reference the module method
  * without capturing per-row state.
  */
private[ann] object TopKBuffer extends Serializable {
  /** Offer (s, ti); returns the new filled count. */
  def insert(bestS: Array[Double], bestT: Array[Int], nBest: Int, k: Int,
             ids: Array[Long], s: Double, ti: Int): Int = {
    var pos = nBest
    while (pos > 0 && {
      val ps = bestS(pos - 1)
      ps < s || (ps == s && ids(bestT(pos - 1)) > ids(ti))
    }) pos -= 1
    if (pos < k) {
      var m = math.min(nBest, k - 1)
      while (m > pos) { bestS(m) = bestS(m - 1); bestT(m) = bestT(m - 1); m -= 1 }
      bestS(pos) = s
      bestT(pos) = ti
      if (nBest < k) nBest + 1 else nBest
    } else nBest
  }
}

object Knn {

  // shared allocation-free HALF_UP (falls back to exact BigDecimal near ties)
  private def round9(x: Double): Double = graft.idx.CosSimKernel.roundHalfUp(x, 9)

  /** Row column -> primitive Array[Float] for the distributed kernels: an
    * `ArraySeq.ofFloat` backing array unwraps IN PLACE (no copy, no boxing);
    * anything else (e.g. the boxed-element wrapper `DataFrame.rdd`'s
    * converter builds) copies ONCE so the hot loops downstream always run
    * over a primitive array instead of a per-access-boxing Seq.
    */
  private def floatArr(r: Row, i: Int): Array[Float] =
    if (r.isNullAt(i)) Array.emptyFloatArray
    else r.get(i) match {
      case a: scala.collection.mutable.ArraySeq.ofFloat => a.array
      case s: scala.collection.Seq[_] =>
        val n = s.length
        val out = new Array[Float](n)
        val it = s.iterator
        var j = 0
        while (it.hasNext) { out(j) = it.next().asInstanceOf[Float]; j += 1 }
        out
      case other =>
        throw new IllegalArgumentException(
          s"expected a float vector at column $i, got ${other.getClass}")
    }

  private val outSchema = StructType(Seq(
    StructField("query_id", LongType, nullable = false),
    StructField("target_id", LongType, nullable = false),
    StructField("cosine", DoubleType, nullable = false),
    StructField("rank", IntegerType, nullable = false)))

  /** A corpus collected to the driver and packed as primitive blocks: ids,
    * row-major float data, per-row L2 norms. Vectors shorter than `dim` are
    * zero-padded (and longer ones truncated), so EVERY kernel in this file
    * sees the same ragged-input behavior.
    */
  private[graft] final case class PackedVecs(
      ids: Array[Long], data: Array[Float], norms: Array[Double], dim: Int) {
    def n: Int = ids.length
    def row(i: Int): Array[Float] =
      java.util.Arrays.copyOfRange(data, i * dim, (i + 1) * dim)
  }

  /** Hard ceiling for a packed broadcast block (2 GiB — a single JVM array
    * and a broadcast value both top out around Int.MaxValue elements/bytes):
    * past this the broadcast kernels are the wrong tool regardless of
    * executor memory — fail BEFORE shipping to executors with a pointer at
    * the scale paths.
    */
  private[graft] val MaxPackedBroadcastBytes: Long = 2L << 30

  /** `elemsPerRow` = entries the row contributes to the packed data array
    * (dim for both float and int8): n*dim must itself fit in one JVM array,
    * or `new Array(n * dim)` Int-overflows into NegativeArraySizeException
    * before the byte ceiling ever triggers (e.g. dim=112, n=2^25 is only
    * ~3.8 GB of floats but 3.76e9 elements).
    */
  private[graft] def checkPackable(n: Long, bytesPerRow: Long,
                                   elemsPerRow: Long): Unit = {
    val est = n * bytesPerRow
    def guidance =
      "use the distributed paths instead: ivfTopKBucketed (shuffle join on " +
      "list_id), ivfTopKIndexed (disk index, pruned probes) or lshCosinePairs"
    require(est <= MaxPackedBroadcastBytes,
      s"packed target set is ~$est bytes ($n rows x $bytesPerRow B), over the " +
      s"$MaxPackedBroadcastBytes-byte broadcast-kernel ceiling — $guidance")
    require(n * elemsPerRow <= Int.MaxValue,
      s"packed target set needs ${n * elemsPerRow} data-array entries " +
      s"($n rows x $elemsPerRow), over the ${Int.MaxValue} JVM array bound — " +
      guidance)
  }

  private def packVecs(df: DataFrame, idCol: String, vecCol: String,
                       dimHint: Int = -1): PackedVecs = {
    val collected = df.select(col(idCol).cast("long"), col(vecCol)).collect()
    val n   = collected.length
    val dim =
      if (dimHint >= 0) dimHint
      else if (n == 0) 0
      else collected(0).getSeq[Float](1).length
    checkPackable(n, dim.toLong * 4 + 16, dim.toLong)
    val ids   = new Array[Long](n)
    val data  = new Array[Float](n * dim)
    val norms = new Array[Double](n)
    var i = 0
    while (i < n) {
      ids(i) = collected(i).getLong(0)
      val v = collected(i).getSeq[Float](1)
      val m = if (v == null) 0 else math.min(dim, v.length)
      var d = 0
      var nr = 0.0
      while (d < m) {
        val x = v(d)
        data(i * dim + d) = x
        nr += x.toDouble * x.toDouble
        d += 1
      }
      norms(i) = math.sqrt(nr)
      i += 1
    }
    PackedVecs(ids, data, norms, dim)
  }

  /** Exact cosine top-k of each query against all targets.
    * Inputs: (idCol: long, vecCol: array<float>); queries and targets may be
    * the same DataFrame (self-join for near-dup); self-pairs are skipped when
    * `excludeSelf`.
    */
  /** `maxScore` bounds admitted cosines from ABOVE (exclusive): the
    * hard-negative mining band — "most similar targets that are NOT
    * near-duplicates" — as a kernel-side filter, so excluded candidates
    * never occupy top-k slots. Default admits everything.
    */
  def bruteForceTopK(queries: DataFrame, targets: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding",
                     excludeSelf: Boolean = false,
                     maxScore: Double = Double.MaxValue): DataFrame = {
    val packed = packVecs(targets, idCol, vecCol)
    val bc = graft.BroadcastLifecycle.track(queries.sparkSession.sparkContext.broadcast(packed))

    val rdd = queries.select(col(idCol).cast("long"), col(vecCol)).rdd.mapPartitions { it =>
      val p = bc.value
      val tIds = p.ids; val tData = p.data; val tNorms = p.norms; val d = p.dim
      val nT = tIds.length
      it.flatMap { r =>
        val qid = r.getLong(0)
        val q   = if (r.isNullAt(1)) Array.empty[Float] else r.getSeq[Float](1).toArray
        val qLen = math.min(d, q.length) // ragged inputs are zero-padded
        var qn  = 0.0
        var j = 0
        while (j < qLen) { qn += q(j).toDouble * q(j).toDouble; j += 1 }
        val qNorm = math.sqrt(qn)
        // top-k by insertion (k small)
        val bestS = new Array[Double](k)
        val bestT = new Array[Int](k)
        var nBest = 0
        var ti = 0
        while (ti < nT) {
          if (!(excludeSelf && tIds(ti) == qid)) {
            var dot = 0.0
            var dd  = 0
            val off = ti * d
            while (dd < qLen) { dot += q(dd).toDouble * tData(off + dd).toDouble; dd += 1 }
            val denom = qNorm * tNorms(ti)
            val s = if (denom == 0.0) 0.0 else round9(dot / denom)
            if (s < maxScore)
              nBest = TopKBuffer.insert(bestS, bestT, nBest, k, tIds, s, ti)
          }
          ti += 1
        }
        (0 until nBest).iterator.map(idx => Row(qid, tIds(bestT(idx)), bestS(idx), idx + 1))
      }
    }
    queries.sparkSession.createDataFrame(rdd, outSchema)
  }

  /** Targets quantized to symmetric per-vector int8: ids, row-major bytes,
    * per-row norms OF THE INT VECTORS (cosine is scale-invariant, so the
    * per-vector scale never needs to ship).
    */
  private[graft] final case class PackedInt8(
      ids: Array[Long], data: Array[Byte], norms: Array[Double], dim: Int)

  /** Quantize one vector into `out` at `off`: q_i = floor(v_i * 127/maxAbs
    * + 0.5) — deterministic floor-plus-half rounding (replayable as
    * `floor(x*127.0/ma + 0.5)` in any engine; results never leave [-127,127]
    * so no clamp exists to diverge on). Returns the L2 norm of the int
    * vector. maxAbs 0 (or an absent/short vector) quantizes to zeros.
    */
  private def quantizeInt8(v: Seq[Float], dim: Int,
                           out: Array[Byte], off: Int): Double = {
    val m = if (v == null) 0 else math.min(dim, v.length)
    var ma = 0.0
    var i = 0
    while (i < m) {
      val a = math.abs(v(i).toDouble); if (a > ma) ma = a; i += 1
    }
    java.util.Arrays.fill(out, off, off + dim, 0: Byte)
    if (ma == 0.0) return 0.0
    var ss = 0L
    i = 0
    while (i < m) {
      val q = math.floor(v(i).toDouble * 127.0 / ma + 0.5).toInt
      out(off + i) = q.toByte
      ss += q.toLong * q
      i += 1
    }
    math.sqrt(ss.toDouble)
  }

  private def packInt8(df: DataFrame, idCol: String, vecCol: String): PackedInt8 = {
    val collected = df.select(col(idCol).cast("long"), col(vecCol)).collect()
    val n   = collected.length
    val dim = if (n == 0) 0 else {
      val v = collected(0).getSeq[Float](1)
      if (v == null) 0 else v.length
    }
    checkPackable(n, dim.toLong + 16, dim.toLong)
    val ids   = new Array[Long](n)
    val data  = new Array[Byte](n * dim)
    val norms = new Array[Double](n)
    var i = 0
    while (i < n) {
      ids(i) = collected(i).getLong(0)
      val v = if (collected(i).isNullAt(1)) null else collected(i).getSeq[Float](1)
      norms(i) = quantizeInt8(v, dim, data, i * dim)
      i += 1
    }
    PackedInt8(ids, data, norms, dim)
  }

  /** Exact top-k over int8-QUANTIZED vectors — the broadcast-budget scale
    * path of [[bruteForceTopK]]: a 64-dim float target row costs 256 B in the
    * packed block, the quantized row 64 B + one norm, so ~4x more targets fit
    * under the same broadcast ceiling before the IVF/LSH paths take over.
    * Because cosine is scale-invariant, symmetric per-vector quantization
    * drops only direction precision (~0.5/127 per component); the kernel
    * scores the int vectors directly — no dequantization, and the integer
    * dot product is EXACT (Long accumulation, values bounded by 127²·dim),
    * so scores are bit-stable across partitionings and engines by
    * construction, stronger than the float kernel's rounded-sum contract.
    * Returned `cosine` is the quantized-vector cosine (ranking metric), not
    * the float cosine.
    */
  def bruteForceTopKInt8(queries: DataFrame, targets: DataFrame, k: Int,
                         idCol: String = "vec_id", vecCol: String = "embedding",
                         excludeSelf: Boolean = false): DataFrame = {
    val packed = packInt8(targets, idCol, vecCol)
    val bc = graft.BroadcastLifecycle.track(
      queries.sparkSession.sparkContext.broadcast(packed))

    val rdd = queries.select(col(idCol).cast("long"), col(vecCol)).rdd.mapPartitions { it =>
      val p = bc.value
      val tIds = p.ids; val tData = p.data; val tNorms = p.norms; val d = p.dim
      val nT = tIds.length
      val qBuf = new Array[Byte](d)
      it.flatMap { r =>
        val qid = r.getLong(0)
        val qv  = if (r.isNullAt(1)) null else r.getSeq[Float](1)
        val qNorm = quantizeInt8(qv, d, qBuf, 0)
        val bestS = new Array[Double](k)
        val bestT = new Array[Int](k)
        var nBest = 0
        var ti = 0
        while (ti < nT) {
          if (!(excludeSelf && tIds(ti) == qid)) {
            var dot = 0L
            var dd  = 0
            val off = ti * d
            while (dd < d) { dot += qBuf(dd).toInt * tData(off + dd).toInt; dd += 1 }
            val denom = qNorm * tNorms(ti)
            val s = if (denom == 0.0) 0.0 else round9(dot.toDouble / denom)
            nBest = TopKBuffer.insert(bestS, bestT, nBest, k, tIds, s, ti)
          }
          ti += 1
        }
        (0 until nBest).iterator.map(idx => Row(qid, tIds(bestT(idx)), bestS(idx), idx + 1))
      }
    }
    queries.sparkSession.createDataFrame(rdd, outSchema)
  }

  private val pairSchema = StructType(Seq(
    StructField("id_a", LongType, nullable = false),
    StructField("id_b", LongType, nullable = false),
    StructField("cosine", DoubleType, nullable = false)))

  /** Exact all-pairs cosine threshold join (id_a < id_b): the reference
    * answer for LSH recall checks. Same broadcast-kernel shape as
    * [[bruteForceTopK]] — packed primitive target array, map-only scan, no
    * shuffle — and the same broadcastable-target-set bound applies.
    */
  def exactCosinePairs(df: DataFrame, minCosine: Double,
                       idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val packed = packVecs(df, idCol, vecCol)
    val bc = graft.BroadcastLifecycle.track(df.sparkSession.sparkContext.broadcast(packed))
    val rdd = df.select(col(idCol).cast("long"), col(vecCol)).rdd.mapPartitions { it =>
      val p = bc.value
      val tIds = p.ids; val tData = p.data; val tNorms = p.norms; val d = p.dim
      val nT = tIds.length
      it.flatMap { r =>
        val qid = r.getLong(0)
        val q   = if (r.isNullAt(1)) Array.empty[Float] else r.getSeq[Float](1).toArray
        val qLen = math.min(d, q.length)
        var qn  = 0.0
        var j = 0
        while (j < qLen) { qn += q(j).toDouble * q(j).toDouble; j += 1 }
        val qNorm = math.sqrt(qn)
        val out = scala.collection.mutable.ArrayBuffer.empty[Row]
        var ti = 0
        while (ti < nT) {
          if (tIds(ti) > qid) {
            var dot = 0.0
            var dd  = 0
            val off = ti * d
            while (dd < qLen) { dot += q(dd).toDouble * tData(off + dd).toDouble; dd += 1 }
            val denom = qNorm * tNorms(ti)
            val s = if (denom == 0.0) 0.0 else round9(dot / denom)
            if (s >= minCosine) out += Row(qid, tIds(ti), s)
          }
          ti += 1
        }
        out.iterator
      }
    }
    df.sparkSession.createDataFrame(rdd, pairSchema)
  }

  /** Random-hyperplane LSH near-dup pairs with banding.
    *
    * Signatures: `nBands * bitsPerBand` sign bits against Gaussian hyperplanes
    * that are generated ONCE on the driver (data-independent, seeded) and
    * shipped in the UDF closure — never re-derived per row. Each band's
    * `bitsPerBand` bits form a bucket key; a pair is a candidate if it
    * collides in ANY band (standard OR-amplification: recall
    * 1-(1-p^bitsPerBand)^nBands for bit-agreement probability p), which fixes
    * both the poor recall and the hot-bucket blowup of a single long
    * signature. Candidates are verified with the exact cosine, so every
    * reported pair satisfies cosine >= minCosine — LSH only affects recall.
    *
    * SIZING AT SCALE: each band has 2^bitsPerBand buckets, so with a fixed
    * bitsPerBand the per-bucket occupancy — and the candidate-pair volume —
    * grows quadratically with the corpus. Grow bitsPerBand with log2(n)
    * (keep expected bucket size roughly constant) and compensate recall with
    * more bands; an 8x corpus wants bitsPerBand+3. Measured: with the
    * default 6 bits, an 8x corpus produces ~64x candidates yet still only
    * ~9x runtime (the kernel verify is cheap), but the shuffle volume is the
    * part that matters at 100 TB.
    *
    * Plan shape mirrors the MinHash path: map-only signatures, posexplode to
    * (band, key), ONE self-join on the bucket key, dedup, verify. Only
    * (id, band_idx, bk) travels through the band melt and self-join — the
    * embeddings never ride the band shuffle. Verification streams the
    * deduped (id_a, id_b) pairs through the same packed-primitive broadcast
    * kernel as [[exactCosinePairs]] (a per-pair `udf` over two array<float>
    * columns costs ~20µs/row in Seq[Float] deserialization alone — measured
    * 6 s for 256k pairs — while the kernel reads two longs per row and
    * scores from the broadcast float block). Same broadcastable-corpus bound
    * as the rest of the family; beyond it, join the vectors back per
    * candidate pair instead. No caching anywhere: the self-join sides
    * re-derive the cheap band keys map-side under AQE (which does not reuse
    * these stages); with AQE off ReuseExchange shares one exchange.
    */
  def lshCosinePairs(df: DataFrame, nBands: Int = 8, bitsPerBand: Int = 8,
                     seed: Long = 42L, minCosine: Double = 0.9,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val dim = df.select(size(col(vecCol))).head(1).headOption.map(_.getInt(0)).getOrElse(0)
    val nBits = nBands * bitsPerBand
    // hyperplanes: row-major [nBits x dim], one deterministic stream
    val planes = {
      val rng = new java.util.Random(seed)
      Array.fill(nBits * dim)(rng.nextGaussian())
    }
    val bandKeysUdf = udf { (vRaw: Seq[Float]) =>
      val v = if (vRaw == null) Seq.empty[Float] else vRaw
      val keys = new Array[Long](nBands)
      var b = 0
      while (b < nBits) {
        var dot = 0.0
        var d = 0
        val off = b * dim
        val n = math.min(dim, v.length)
        while (d < n) { dot += v(d) * planes(off + d); d += 1 }
        if (dot > 0) keys(b / bitsPerBand) |= (1L << (b % bitsPerBand))
        b += 1
      }
      keys.toSeq
    }
    val base = df.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
    // melted to (id, band_idx, key) ONLY: candidate generation is ONE
    // self-join that never shuffles the embedding payload
    val melted = base.select(col("id"),
      posexplode(bandKeysUdf(col("v"))).as(Seq("band_idx", "bk")))
    val candidates = melted.toDF("id_a", "band_idx", "bk").hint("merge")
      .join(melted.toDF("id_b", "band_idx", "bk"), Seq("band_idx", "bk"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")

    // broadcast-kernel verification: pack the corpus once, stream long pairs.
    // sqrt(na)*sqrt(nb) like exactCosinePairs, so the output is a true subset
    // of the exact threshold join
    val packed = packVecs(df, idCol, vecCol)
    val index = new java.util.HashMap[Long, Integer](2 * packed.n)
    var i = 0
    while (i < packed.n) { index.put(packed.ids(i), i); i += 1 }
    val bc = graft.BroadcastLifecycle.track(df.sparkSession.sparkContext.broadcast((index, packed)))
    val rdd = candidates.rdd.mapPartitions { it =>
      val (idx, p) = bc.value
      val tData = p.data; val tNorms = p.norms; val d = p.dim
      it.flatMap { r =>
        val ia = r.getLong(0)
        val ib = r.getLong(1)
        val pa = idx.get(ia)
        val pb = idx.get(ib)
        if (pa == null || pb == null) Iterator.empty
        else {
          var dot = 0.0
          var dd = 0
          val offA = pa.intValue() * d
          val offB = pb.intValue() * d
          while (dd < d) { dot += tData(offA + dd).toDouble * tData(offB + dd).toDouble; dd += 1 }
          val denom = tNorms(pa.intValue()) * tNorms(pb.intValue())
          val s = if (denom == 0.0) 0.0 else round9(dot / denom)
          if (s >= minCosine) Iterator.single(Row(ia, ib, s)) else Iterator.empty
        }
      }
    }
    df.sparkSession.createDataFrame(rdd, pairSchema)
  }

  /** Multi-probe LSH top-k search (Lv et al. 2007, VLDB): ONE nBits-bit
    * random-hyperplane signature buckets the corpus; each query probes its
    * own bucket PLUS the `nProbes − 1` buckets reached by flipping its
    * least-confident sign bits one at a time — the bits whose |dot| margin
    * is smallest are the ones a near neighbour most likely disagrees on,
    * so probing them buys most of the recall of extra hash tables at ZERO
    * extra index cost (the classic multi-probe trade: memory for probes).
    * Candidates are exact-cosine verified through the packed broadcast
    * kernel, so reported scores are exact and probing affects RECALL ONLY;
    * top-k is a query-partitioned (cosine desc, id) window.
    *
    * Scale shape: the corpus carries one long bucket key (map-only
    * signature UDF, the seeded-plane closure idiom of [[lshCosinePairs]]);
    * probe pairs are |Q|·nProbes and broadcast against it — the corpus
    * never shuffles. Size nBits with log2(n) to hold bucket occupancy
    * constant; recall then comes from nProbes, not from re-hashing the
    * corpus. Verification rides the same broadcastable-corpus bound as
    * the rest of the family.
    *
    * Determinism: planes seeded; probe order (|margin| asc, bit asc);
    * single-bit flips give nProbes DISTINCT buckets, so no candidate
    * dedup is needed. Every query that is itself a member of `targets`
    * finds itself (identical vector ⇒ identical signature ⇒ probe 0), so
    * self-recall is structural — the q42-style oracle invariant.
    */
  def lshMultiProbeTopK(targets: DataFrame, queries: DataFrame, k: Int,
                        nBits: Int = 12, nProbes: Int = 4, seed: Long = 42L,
                        idCol: String = "vec_id",
                        vecCol: String = "embedding"): DataFrame = {
    require(nBits >= 1 && nBits <= 62, s"nBits must be in [1, 62], got $nBits")
    require(nProbes >= 1 && nProbes <= nBits + 1,
      s"nProbes must be in [1, nBits + 1], got $nProbes")
    // deterministic hyperplane width: the corpus-wide max vector length,
    // not an arbitrary first row (a null/short head row would silently
    // truncate every dot product — r15 ADVICE)
    val dim = targets.agg(max(size(col(vecCol)))).head(1).headOption
      .flatMap(r => if (r.isNullAt(0)) None else Some(r.getInt(0)))
      .getOrElse(0)
    val planes = {
      val rng = new java.util.Random(seed)
      Array.fill(nBits * dim)(rng.nextGaussian())
    }
    def dots(v: Seq[Float]): Array[Double] = {
      val out = new Array[Double](nBits)
      var b = 0
      while (b < nBits) {
        var dot = 0.0
        var d = 0
        val off = b * dim
        val n = math.min(dim, v.length)
        while (d < n) { dot += v(d) * planes(off + d); d += 1 }
        out(b) = dot
        b += 1
      }
      out
    }
    def sigOf(ds: Array[Double]): Long = {
      var sig = 0L
      var b = 0
      while (b < nBits) { if (ds(b) > 0) sig |= (1L << b); b += 1 }
      sig
    }
    val sigUdf = udf { (vRaw: Seq[Float]) =>
      sigOf(dots(if (vRaw == null) Seq.empty[Float] else vRaw))
    }
    val probesUdf = udf { (vRaw: Seq[Float]) =>
      val ds = dots(if (vRaw == null) Seq.empty[Float] else vRaw)
      val sig = sigOf(ds)
      // flip order: |margin| asc, bit index asc — deterministic
      val order = (0 until nBits).sortBy(b => (math.abs(ds(b)), b))
      (Seq(sig) ++ order.take(nProbes - 1).map(b => sig ^ (1L << b))).toSeq
    }
    val tsig = targets.select(col(idCol).cast("long").as("target_id"),
      sigUdf(col(vecCol)).as("bucket"))
    val qprobes = queries.select(col(idCol).cast("long").as("query_id"),
      explode(probesUdf(col(vecCol))).as("bucket"))
    val cand = tsig.join(broadcast(qprobes), Seq("bucket"))
      .select("query_id", "target_id")
    // exact verification through the packed kernel — reported cosines are
    // the true float cosines, identical to the brute-force baseline's
    val packed = packVecs(targets, idCol, vecCol)
    val qpacked = packVecs(queries, idCol, vecCol, dimHint = packed.dim)
    val index = new java.util.HashMap[Long, Integer](2 * packed.n)
    var i = 0
    while (i < packed.n) { index.put(packed.ids(i), i); i += 1 }
    val qindex = new java.util.HashMap[Long, Integer](2 * qpacked.n)
    i = 0
    while (i < qpacked.n) { qindex.put(qpacked.ids(i), i); i += 1 }
    val bc = graft.BroadcastLifecycle.track(
      targets.sparkSession.sparkContext.broadcast(
        (index, packed, qindex, qpacked)))
    val scoredSchema = StructType(Seq(
      StructField("query_id", LongType, nullable = false),
      StructField("target_id", LongType, nullable = false),
      StructField("cosine", DoubleType, nullable = false)))
    val rdd = cand.rdd.mapPartitions { it =>
      val (idx, p, qidx, qp) = bc.value
      val tData = p.data; val tNorms = p.norms; val d = p.dim
      val qData = qp.data; val qNorms = qp.norms
      it.flatMap { r =>
        val qid = r.getLong(0)
        val tid = r.getLong(1)
        val pq = qidx.get(qid)
        val pt = idx.get(tid)
        if (pq == null || pt == null) Iterator.empty
        else {
          var dot = 0.0
          var dd = 0
          val offQ = pq.intValue() * d
          val offT = pt.intValue() * d
          while (dd < d) {
            dot += qData(offQ + dd).toDouble * tData(offT + dd).toDouble
            dd += 1
          }
          val denom = qNorms(pq.intValue()) * tNorms(pt.intValue())
          val s = if (denom == 0.0) 0.0 else round9(dot / denom)
          Iterator.single(Row(qid, tid, s))
        }
      }
    }
    val scored = targets.sparkSession.createDataFrame(rdd, scoredSchema)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cosine").desc, col("target_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "target_id", "cosine", "rank")
  }

  /** IVF (inverted-file) coarse quantizer: seeded Lloyd's k-means over a
    * bounded sample of the target set, run ON THE DRIVER over primitive
    * arrays. Quantizer training is deliberately a small-data problem — at
    * 100 TB one trains on <=maxFitRows sampled vectors (FAISS practice) and
    * only the ASSIGNMENT is distributed — so a driver loop beats a
    * multi-job distributed k-means by orders of magnitude in overhead while
    * producing the same kind of centroids. Deterministic given (data order,
    * seed). Returns packed row-major centroids + the vector dimension.
    */
  def ivfFit(targets: DataFrame, nLists: Int, seed: Long = 42L,
             maxIter: Int = 10, maxFitRows: Int = 100000,
             idCol: String = "vec_id",
             vecCol: String = "embedding"): (Array[Double], Int) = {
    // deterministic bounded sample: seeded-hash order + limit compiles to
    // TakeOrderedAndProject (per-partition top-K, no full sort/shuffle), so
    // the sample — and therefore the centroids — is identical on any
    // partition layout (a bare limit() is plan-dependent)
    val rows = targets
      .select(col(idCol).cast("long").as("__id"), col(vecCol).as("__v"))
      .orderBy(xxhash64(col("__id"), lit(seed)), col("__id"))
      .limit(maxFitRows)
      .select(col("__v"))
      .collect()
    val n = rows.length
    if (n == 0) return (Array.empty[Double], 0)
    val dim = {
      val v0 = rows(0).getSeq[Float](0)
      if (v0 == null) 0 else v0.length
    }
    val data = new Array[Double](n * dim)
    var i = 0
    while (i < n) {
      val v = rows(i).getSeq[Float](0)
      val m = if (v == null) 0 else math.min(dim, v.length) // ragged: zero-padded
      var d = 0
      while (d < m) { data(i * dim + d) = v(d); d += 1 }
      i += 1
    }
    val k = math.max(1, math.min(nLists, n))
    // seeded Fisher-Yates prefix: k distinct sample rows as initial centroids
    val rng = new java.util.Random(seed)
    val idx = Array.tabulate(n)(identity)
    var s = 0
    while (s < k) {
      val j = s + rng.nextInt(n - s)
      val t = idx(s); idx(s) = idx(j); idx(j) = t
      s += 1
    }
    val centroids = new Array[Double](k * dim)
    var c = 0
    while (c < k) {
      System.arraycopy(data, idx(c) * dim, centroids, c * dim, dim)
      c += 1
    }
    val sums = new Array[Double](k * dim)
    val counts = new Array[Int](k)
    var iter = 0
    while (iter < maxIter) {
      java.util.Arrays.fill(sums, 0.0)
      java.util.Arrays.fill(counts, 0)
      var p = 0
      while (p < n) {
        var best = 0
        var bestD = Double.MaxValue
        var cc = 0
        while (cc < k) {
          var dist = 0.0
          var d = 0
          while (d < dim) {
            val x = data(p * dim + d) - centroids(cc * dim + d)
            dist += x * x
            d += 1
          }
          if (dist < bestD) { bestD = dist; best = cc }
          cc += 1
        }
        var d = 0
        while (d < dim) { sums(best * dim + d) += data(p * dim + d); d += 1 }
        counts(best) += 1
        p += 1
      }
      var cc = 0
      while (cc < k) {
        if (counts(cc) > 0) {
          var d = 0
          while (d < dim) {
            centroids(cc * dim + d) = sums(cc * dim + d) / counts(cc)
            d += 1
          }
        } // empty cluster: keep the previous centroid
        cc += 1
      }
      iter += 1
    }
    (centroids, dim)
  }

  /** Nearest-centroid selection into `out` (list ids by (L2 dist ASC, idx
    * ASC) insertion); returns the probe count actually filled. Shared by both
    * IVF paths so assignment and probing agree bit-for-bit.
    */
  private def nearestCentroids(v: Array[Float], centroids: Array[Double],
                               dim: Int, nL: Int, nP: Int,
                               out: Array[Int]): Int = {
    val dists = new Array[Double](nL)
    var c = 0
    while (c < nL) {
      var s = 0.0
      var d = 0
      val off = c * dim
      val n = math.min(dim, v.length)
      while (d < n) { val x = v(d) - centroids(off + d); s += x * x; d += 1 }
      // a ragged-short vector is zero-padded to the fitted dim: the missing
      // dims contribute the centroid's own squared coordinate, keeping raw
      // and pre-packed callers bit-identical
      while (d < dim) { val x = centroids(off + d); s += x * x; d += 1 }
      dists(c) = s
      c += 1
    }
    var filled = 0
    c = 0
    while (c < nL) {
      // insertion by (dist asc, idx asc); idx tie-break is implied by scan order
      var pos = filled
      while (pos > 0 && dists(out(pos - 1)) > dists(c)) pos -= 1
      if (pos < nP) {
        var m = math.min(filled, nP - 1)
        while (m > pos) { out(m) = out(m - 1); m -= 1 }
        out(pos) = c
        if (filled < nP) filled += 1
      }
      c += 1
    }
    filled
  }

  /** IVF packed target index: per-list CSR blocks over primitive arrays
    * (ids/data/norms grouped by list, `listPtr` delimiting blocks), plus the
    * centroids that defined the assignment.
    */
  private final case class PackedIvf(
      listPtr: Array[Int], ids: Array[Long], data: Array[Float],
      norms: Array[Double], centroids: Array[Double], dim: Int) {
    def nLists: Int = listPtr.length - 1
  }

  private def packIvf(targets: DataFrame, centroids: Array[Double], dim: Int,
                      idCol: String, vecCol: String): PackedIvf = {
    // one shared collect-and-pack (zero-padded ragged inputs, at the FITTED
    // dim — the collect order's first row may differ from the fit sample's),
    // then a stable regrouping of the packed rows into per-list blocks
    val flat = packVecs(targets, idCol, vecCol, dimHint = dim)
    val n = flat.n
    val nL = if (dim == 0) 1 else centroids.length / dim
    val assign = new Array[Int](n)
    val counts = new Array[Int](nL)
    val one = new Array[Int](1)
    var i = 0
    while (i < n) {
      nearestCentroids(flat.row(i), centroids, dim, nL, 1, one)
      assign(i) = one(0)
      counts(one(0)) += 1
      i += 1
    }
    val listPtr = new Array[Int](nL + 1)
    var l = 0
    while (l < nL) { listPtr(l + 1) = listPtr(l) + counts(l); l += 1 }
    val fill  = new Array[Int](nL)
    val ids   = new Array[Long](n)
    val data  = new Array[Float](n * dim)
    val norms = new Array[Double](n)
    i = 0
    while (i < n) {
      val pos = listPtr(assign(i)) + fill(assign(i))
      fill(assign(i)) += 1
      ids(pos) = flat.ids(i)
      System.arraycopy(flat.data, i * dim, data, pos * dim, dim)
      norms(pos) = flat.norms(i)
      i += 1
    }
    PackedIvf(listPtr, ids, data, norms, centroids, dim)
  }

  /** IVF top-k ANN search, broadcast kernel.
    *
    * The target set is collected once, assigned to its nearest centroid's
    * inverted list, and broadcast as per-list packed float blocks (the same
    * packed-primitive shape as [[bruteForceTopK]], just list-partitioned).
    * Queries stream through a map-only partition kernel: nearest `nProbe`
    * centroids, then a top-k insertion scan over ONLY those blocks — no
    * shuffle anywhere, and each query touches ~nProbe/nLists of the corpus.
    * Same broadcastable-target bound as brute force; beyond it use
    * [[ivfTopKBucketed]], which keeps the probed join shape distributed.
    *
    * Scoring uses the same round-9 cosine, the same `sqrt(na)*sqrt(nb)`
    * denominator, and the same (cosine DESC, target_id ASC) insertion as
    * [[bruteForceTopK]], so with nProbe = nLists the result is bit-identical
    * to brute force (quantization only ever affects recall, never reported
    * scores) — that exhaustive-probe equality is the oracle for the
    * plumbing; partial-probe recall is checked in unit tests.
    */
  def ivfTopK(queries: DataFrame, targets: DataFrame, k: Int,
              nLists: Int = 64, nProbe: Int = 8, seed: Long = 42L,
              maxIter: Int = 10, maxFitRows: Int = 100000,
              idCol: String = "vec_id", vecCol: String = "embedding",
              excludeSelf: Boolean = false): DataFrame = {
    val (centroids, dim) = ivfFit(targets, nLists, seed, maxIter, maxFitRows, idCol, vecCol)
    val packed = packIvf(targets, centroids, dim, idCol, vecCol)
    val spark = queries.sparkSession
    val bc = graft.BroadcastLifecycle.track(spark.sparkContext.broadcast(packed))
    val nP = math.min(nProbe, packed.nLists)

    val rdd = queries.select(col(idCol).cast("long"), col(vecCol)).rdd.mapPartitions { it =>
      val ivf = bc.value
      val d = ivf.dim
      val probes = new Array[Int](math.max(nP, 1))
      it.flatMap { r =>
        val qid = r.getLong(0)
        val q   = if (r.isNullAt(1)) Array.empty[Float] else r.getSeq[Float](1).toArray
        val qLen = math.min(d, q.length) // ragged inputs are zero-padded
        var qn  = 0.0
        var j = 0
        while (j < qLen) { qn += q(j).toDouble * q(j).toDouble; j += 1 }
        val qNorm = math.sqrt(qn)
        val nProbes = nearestCentroids(q, ivf.centroids, d, ivf.nLists, nP, probes)
        val bestS = new Array[Double](k)
        val bestT = new Array[Int](k)
        var nBest = 0
        var p = 0
        while (p < nProbes) {
          val list = probes(p)
          var ti = ivf.listPtr(list)
          val end = ivf.listPtr(list + 1)
          while (ti < end) {
            if (!(excludeSelf && ivf.ids(ti) == qid)) {
              var dot = 0.0
              var dd  = 0
              val off = ti * d
              while (dd < qLen) { dot += q(dd).toDouble * ivf.data(off + dd).toDouble; dd += 1 }
              val denom = qNorm * ivf.norms(ti)
              val s = if (denom == 0.0) 0.0 else round9(dot / denom)
              nBest = TopKBuffer.insert(bestS, bestT, nBest, k, ivf.ids, s, ti)
            }
            ti += 1
          }
          p += 1
        }
        (0 until nBest).iterator.map(idx => Row(qid, ivf.ids(bestT(idx)), bestS(idx), idx + 1))
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** IVF with int8-quantized inverted lists: [[PackedIvf]]'s layout with the
    * list data quantized per vector ([[quantizeInt8]]'s contract). Centroids
    * stay float — assignment quality should not pay the quantization tax,
    * and the centroid table is nLists*dim, negligible next to the lists.
    */
  private[graft] final case class PackedIvfInt8(
      listPtr: Array[Int], ids: Array[Long], data: Array[Byte],
      norms: Array[Double], centroids: Array[Double], dim: Int) {
    def nLists: Int = listPtr.length - 1
  }

  private def packIvfInt8(targets: DataFrame, centroids: Array[Double], dim: Int,
                          idCol: String, vecCol: String): PackedIvfInt8 = {
    import scala.collection.immutable.ArraySeq
    val flat = packVecs(targets, idCol, vecCol, dim)
    val n  = flat.n
    val nL = if (dim == 0) 1 else centroids.length / dim
    val assign = new Array[Int](n)
    val counts = new Array[Int](nL)
    val one = new Array[Int](1)
    var i = 0
    while (i < n) {
      nearestCentroids(flat.row(i), centroids, dim, nL, 1, one)
      assign(i) = one(0)
      counts(one(0)) += 1
      i += 1
    }
    val listPtr = new Array[Int](nL + 1)
    var l = 0
    while (l < nL) { listPtr(l + 1) = listPtr(l) + counts(l); l += 1 }
    val fill  = new Array[Int](nL)
    val ids   = new Array[Long](n)
    val data  = new Array[Byte](n * dim)
    val norms = new Array[Double](n)
    i = 0
    while (i < n) {
      val pos = listPtr(assign(i)) + fill(assign(i))
      fill(assign(i)) += 1
      ids(pos) = flat.ids(i)
      // quantizing the zero-padded row equals quantizing the raw vector:
      // maxAbs comes from the real components, pad positions stay 0
      norms(pos) = quantizeInt8(ArraySeq.unsafeWrapArray(flat.row(i)), dim,
        data, pos * dim)
      i += 1
    }
    PackedIvfInt8(listPtr, ids, data, norms, centroids, dim)
  }

  /** The production ANN configuration composed: IVF probing (compute ~
    * nProbe/nLists of the corpus per query) over int8-quantized lists (4x
    * more targets per broadcast byte, [[bruteForceTopKInt8]]'s argument).
    * Assignment runs on the float vectors against float centroids; scoring
    * runs the exact integer-dot kernel over the probed lists. With
    * nProbe = nLists the result is bit-identical to [[bruteForceTopKInt8]]
    * (list membership cannot change per-vector quantization or scores),
    * which is the oracle for the plumbing — the q53/q70/q59 recipe.
    */
  def ivfTopKInt8(queries: DataFrame, targets: DataFrame, k: Int,
                  nLists: Int = 64, nProbe: Int = 8, seed: Long = 42L,
                  maxIter: Int = 10, maxFitRows: Int = 100000,
                  idCol: String = "vec_id", vecCol: String = "embedding",
                  excludeSelf: Boolean = false): DataFrame = {
    val (centroids, dim) = ivfFit(targets, nLists, seed, maxIter, maxFitRows, idCol, vecCol)
    val packed = packIvfInt8(targets, centroids, dim, idCol, vecCol)
    val spark = queries.sparkSession
    val bc = graft.BroadcastLifecycle.track(spark.sparkContext.broadcast(packed))
    val nP = math.min(nProbe, packed.nLists)

    val rdd = queries.select(col(idCol).cast("long"), col(vecCol)).rdd.mapPartitions { it =>
      val ivf = bc.value
      val d = ivf.dim
      val probes = new Array[Int](math.max(nP, 1))
      val qBuf = new Array[Byte](d)
      it.flatMap { r =>
        val qid = r.getLong(0)
        val qv  = if (r.isNullAt(1)) null else r.getSeq[Float](1)
        val qArr = if (qv == null) Array.empty[Float] else qv.toArray
        val qNorm = quantizeInt8(qv, d, qBuf, 0)
        val nProbes = nearestCentroids(qArr, ivf.centroids, d, ivf.nLists, nP, probes)
        val bestS = new Array[Double](k)
        val bestT = new Array[Int](k)
        var nBest = 0
        var p = 0
        while (p < nProbes) {
          val list = probes(p)
          var ti = ivf.listPtr(list)
          val end = ivf.listPtr(list + 1)
          while (ti < end) {
            if (!(excludeSelf && ivf.ids(ti) == qid)) {
              var dot = 0L
              var dd  = 0
              val off = ti * d
              while (dd < d) { dot += qBuf(dd).toInt * ivf.data(off + dd).toInt; dd += 1 }
              val denom = qNorm * ivf.norms(ti)
              val s = if (denom == 0.0) 0.0 else round9(dot.toDouble / denom)
              nBest = TopKBuffer.insert(bestS, bestT, nBest, k, ivf.ids, s, ti)
            }
            ti += 1
          }
          p += 1
        }
        (0 until nBest).iterator.map(idx => Row(qid, ivf.ids(bestT(idx)), bestS(idx), idx + 1))
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Materialize an IVF index on disk: targets are assigned (map-only
    * kernel) to their nearest list and written PARTITIONED BY `list_id` —
    * the storage analogue of a bucketed layout, and the real 100 TB shape:
    * the index is built once, and a probe reads only its `nProbe` partition
    * directories (static partition pruning, visible as `PartitionFilters`
    * in the scan). Centroids are stored alongside as a small parquet.
    */
  def ivfWriteIndex(targets: DataFrame, path: String,
                    nLists: Int = 64, seed: Long = 42L,
                    maxIter: Int = 10, maxFitRows: Int = 100000,
                    idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    val (centroids, dim) = ivfFit(targets, nLists, seed, maxIter, maxFitRows, idCol, vecCol)
    val spark = targets.sparkSession
    val nL = if (dim == 0) 1 else centroids.length / dim
    assignToLists(targets, centroids, dim, idCol, vecCol)
      .write.mode("overwrite").partitionBy("list_id").parquet(s"$path/lists")
    val centroidRows = (0 until nL).map { l =>
      Row(l, (0 until dim).map(d => centroids(l * dim + d)))
    }
    val cSchema = StructType(Seq(
      StructField("list_id", IntegerType, nullable = false),
      StructField("centroid", ArrayType(DoubleType), nullable = false)))
    spark.createDataFrame(spark.sparkContext.parallelize(centroidRows, 1), cSchema)
      .write.mode("overwrite").parquet(s"$path/centroids")
  }

  /** Incrementally add `newTargets` to a [[ivfWriteIndex]]-materialized
    * index — a corpus delta costs one map-only scan of the DELTA, never a
    * re-scan (or re-fit) of the indexed 100 TB. New targets are assigned
    * with the STORED centroids (the quantizer is frozen at build time, the
    * standard IVF serving practice) and appended into the same `list_id`
    * partition layout, so [[ivfTopKIndexed]]'s static partition pruning is
    * unchanged and every appended vector is probed exactly where its own
    * nearest-centroid probe looks for it. Scores never depend on list
    * membership, so an exhaustive probe over build+append is BIT-IDENTICAL
    * to a full rebuild (q88's oracle); partial probes differ from a rebuild
    * only through the re-fit centroids a rebuild would choose.
    *
    * Contract: `newTargets` ids must be disjoint from the indexed set
    * (re-appending duplicates rows). Not atomic; re-run on failure.
    */
  def ivfAppendToIndex(newTargets: DataFrame, path: String,
                       idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    val (centroids, dim) = readCentroids(newTargets.sparkSession, path)
    assignToLists(newTargets, centroids, dim, idCol, vecCol)
      .write.mode("append").partitionBy("list_id").parquet(s"$path/lists")
  }

  /** Map-only nearest-list assignment via the shared centroid kernel — the
    * single implementation behind both the index build and the append, so
    * the two cannot disagree on where a vector lives.
    */
  private def assignToLists(targets: DataFrame, centroids: Array[Double],
                            dim: Int, idCol: String, vecCol: String): DataFrame = {
    val spark = targets.sparkSession
    val bc = graft.BroadcastLifecycle.track(spark.sparkContext.broadcast(centroids))
    val nL = if (dim == 0) 1 else centroids.length / dim
    val schema = StructType(Seq(
      StructField("target_id", LongType, nullable = false),
      StructField("tv", ArrayType(FloatType), nullable = true),
      StructField("list_id", IntegerType, nullable = false)))
    spark.createDataFrame(
      targets.select(col(idCol).cast("long"), col(vecCol)).rdd.mapPartitions { it =>
        val cs = bc.value
        val one = new Array[Int](1)
        it.map { r =>
          val v = floatArr(r, 1)
          nearestCentroids(v, cs, dim, nL, 1, one)
          Row(r.getLong(0), v, one(0))
        }
      }, schema)
  }

  private def readCentroids(spark: org.apache.spark.sql.SparkSession,
                            indexPath: String): (Array[Double], Int) = {
    val centroidRows = spark.read.parquet(s"$indexPath/centroids")
      .orderBy("list_id").collect()
    val nL = centroidRows.length
    val dim = if (nL == 0) 0 else centroidRows(0).getSeq[Double](1).length
    val centroids = new Array[Double](nL * dim)
    centroidRows.foreach { r =>
      val l = r.getInt(0)
      val v = r.getSeq[Double](1)
      var d = 0
      while (d < dim) { centroids(l * dim + d) = v(d); d += 1 }
    }
    (centroids, dim)
  }

  /** IVF maintenance signal: per-list occupancy of a disk index, ONE hash
    * aggregation over the lists layout (partition column only + count — the
    * scan reads no vector data thanks to column pruning). Appends assign
    * with the frozen build-time centroids ([[ivfAppendToIndex]]), so under
    * corpus drift the list-size distribution skews and partial-probe cost
    * degrades silently; this report is the signal to [[ivfRefitIndex]].
    * Output: (list_id, n_vectors) per non-empty list.
    */
  def ivfListStats(spark: org.apache.spark.sql.SparkSession,
                   path: String): DataFrame =
    spark.read.parquet(s"$path/lists")
      .groupBy("list_id").agg(count(lit(1)).as("n_vectors"))

  /** One-row occupancy summary: list count, vector total, min/max list
    * sizes, and the imbalance ratio max/mean — the number a maintenance
    * job alerts on (perfectly balanced lists have ratio 1; ratio ~= nLists
    * means one hot list absorbs everything and probes degrade to scans).
    */
  def ivfOccupancyReport(spark: org.apache.spark.sql.SparkSession,
                         path: String): DataFrame =
    ivfListStats(spark, path).agg(
      count(lit(1)).cast("long").as("n_nonempty_lists"),
      sum(col("n_vectors")).cast("long").as("n_vectors"),
      min(col("n_vectors")).cast("long").as("min_list"),
      max(col("n_vectors")).cast("long").as("max_list"),
      (max(col("n_vectors")).cast("double") /
        (sum(col("n_vectors")).cast("double") / count(lit(1)).cast("double")))
        .as("imbalance"))

  /** Re-fit the quantizer of a disk IVF index and re-map every stored
    * vector — the recovery path when [[ivfOccupancyReport]] shows heavy
    * drift skew. Reads the vectors back OUT OF THE INDEX (one scan of the
    * lists layout — the source corpus is not needed), refits centroids on
    * the same seeded bounded sample [[ivfWriteIndex]] uses, re-assigns with
    * the shared kernel, and swaps the finished index in whole (lists AND
    * centroids move together — a reader never sees new centroids with old
    * lists). Scores are independent of list membership, so an exhaustive
    * probe after refit stays bit-identical to brute force (q105's oracle);
    * partial probes change only through the new, better-balanced lists.
    * Swap atomicity contract: see [[graft.operators.PartitionCompaction]].
    */
  def ivfRefitIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                    nLists: Int = 64, seed: Long = 42L, maxIter: Int = 10,
                    maxFitRows: Int = 100000): Unit = {
    import org.apache.hadoop.fs.Path
    // the lists layout still physically holds tombstoned rows
    // ([[ivfDeleteFromIndex]]) until a vacuum; rebuild from the SURVIVORS
    // only, or the refit's generation swap (which drops the tombstones
    // dir) would silently resurrect deleted ids
    val fs0 = new Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val raw = spark.read.parquet(s"$path/lists")
    val live =
      if (fs0.exists(new Path(s"$path/tombstones")))
        raw.join(broadcast(spark.read.parquet(s"$path/tombstones")
          .select("target_id").distinct()), Seq("target_id"), "left_anti")
      else raw
    val vecs = live
      .select(col("target_id").as("vec_id"), col("tv").as("embedding"))
    val tmp = path + "__refit_tmp"
    ivfWriteIndex(vecs, tmp, nLists, seed, maxIter, maxFitRows)
    val fs = new Path(path).getFileSystem(spark.sessionState.newHadoopConf())
    graft.operators.PartitionCompaction.swapIntoPlace(
      fs, new Path(path), new Path(tmp), new Path(path + "__pre_refit"))
  }

  /** Rewrite the accumulated append files so every `list_id` partition of a
    * disk IVF index holds ONE data file again (N appends otherwise leave
    * N+1 files per list and probe listing cost grows per append). Centroids
    * are untouched and rows only move between files, so probes over the
    * compacted index are BIT-IDENTICAL to probes over the appended one
    * (q103's oracle). Swap atomicity contract: see
    * [[graft.operators.PartitionCompaction]].
    *
    * @return list data-file count (before, after)
    */
  def ivfCompactIndex(spark: org.apache.spark.sql.SparkSession,
                      path: String): (Long, Long) = {
    val nLists = spark.read.parquet(s"$path/centroids").count().toInt
    graft.operators.PartitionCompaction.compact(
      spark, s"$path/lists", "list_id", math.max(nLists, 1))
  }

  /** Tombstone DELETE on an [[ivfWriteIndex]] layout — `Pq.deleteFromIndex`
    * at float-IVF grain: one slim parquet append of the ids, no list
    * partition touched; [[ivfTopKIndexed]] anti-joins the set out BEFORE
    * ranking, so an exhaustive probe after a delete is bit-identical to
    * brute force over the surviving corpus (the q59 identity minus the
    * deleted ids). Idempotent re-deletes; [[ivfVacuumIndex]] settles.
    */
  def ivfDeleteFromIndex(deleteIds: org.apache.spark.sql.DataFrame,
                         path: String, idCol: String = "vec_id"): Unit =
    deleteIds.select(col(idCol).cast("long").as("target_id")).distinct()
      .coalesce(1)
      .write.mode("append").parquet(s"$path/tombstones")

  /** Physically remove tombstoned vectors: one anti-join rewrite of the
    * lists layout (one file per list — deletion and compaction settle
    * together), generation swap, tombstones cleared; probes bit-identical
    * pre/post.
    *
    * @return (n_rows_before, n_rows_after)
    */
  def ivfVacuumIndex(spark: org.apache.spark.sql.SparkSession,
                     path: String): (Long, Long) = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val lists = spark.read.parquet(s"$path/lists")
    // before/after counts OBSERVED on the rewrite pass itself (the
    // Dedup.vacuumLayout discipline, opt guide §1.2): one data pass
    // instead of count + rewrite + re-read count. Exactly-once only while
    // no task attempt is duplicated (see
    // [[graft.operators.VacuumCounts]]); speculation takes the exact path.
    val exactFallback = graft.operators.VacuumCounts.needExactCounts(spark)
    val obsBefore = org.apache.spark.sql.Observation()
    val obsAfter = org.apache.spark.sql.Observation()
    val counted =
      if (exactFallback) lists
      else lists.observe(obsBefore, count(lit(1)).as("n"))
    val antiJoined =
      if (fs.exists(new Path(s"$path/tombstones")))
        counted.join(spark.read.parquet(s"$path/tombstones"),
          Seq("target_id"), "left_anti")
      else counted
    val survivors =
      if (exactFallback) antiJoined
      else antiJoined.observe(obsAfter, count(lit(1)).as("n"))
    val nLists = spark.read.parquet(s"$path/centroids").count().toInt
    val tmp = s"$path/lists__vacuum_tmp"
    fs.delete(new Path(tmp), true)
    val rewrite = survivors.repartition(math.max(nLists, 1), col("list_id"))
    graft.plans.PlanDump.dump("ivf_vacuum_rewrite", rewrite)
    val nBefore = if (exactFallback) lists.count() else -1L
    rewrite.write.mode("overwrite").partitionBy("list_id").parquet(tmp)
    val nAfter =
      if (exactFallback) spark.read.parquet(tmp).count() else -1L
    graft.operators.PartitionCompaction.swapIntoPlace(
      fs, new Path(s"$path/lists"), new Path(tmp),
      new Path(s"$path/lists__pre_vacuum"))
    fs.delete(new Path(s"$path/tombstones"), true)
    if (exactFallback) (nBefore, nAfter)
    else (obsBefore.get("n").asInstanceOf[Long],
      obsAfter.get("n").asInstanceOf[Long])
  }

  /** Query a disk-materialized IVF index (see [[ivfWriteIndex]]): probe
    * lists per query via the shared centroid kernel, statically prune the
    * index scan to the union of probed lists, join on `list_id`, and score
    * with the primitive kernel. Bit-identical to [[ivfTopK]] on the same
    * fitted centroids (tombstoned ids, if any, vanish before ranking).
    */
  def ivfTopKIndexed(queries: DataFrame, indexPath: String, k: Int,
                     nProbe: Int = 8,
                     idCol: String = "vec_id", vecCol: String = "embedding",
                     excludeSelf: Boolean = false): DataFrame = {
    val spark = queries.sparkSession
    val (centroids, dim) = readCentroids(spark, indexPath)
    val nL = if (dim == 0) 0 else centroids.length / dim
    val bc = graft.BroadcastLifecycle.track(spark.sparkContext.broadcast(centroids))
    val nP = math.min(nProbe, math.max(nL, 1))

    val probedSchema = StructType(Seq(
      StructField("list_id", IntegerType, nullable = false),
      StructField("query_id", LongType, nullable = false),
      StructField("qv", ArrayType(FloatType), nullable = true)))
    val probed = spark.createDataFrame(
      queries.select(col(idCol).cast("long"), col(vecCol)).rdd.mapPartitions { it =>
        val cs = bc.value
        val probes = new Array[Int](math.max(nP, 1))
        it.flatMap { r =>
          val id = r.getLong(0)
          val v = floatArr(r, 1)
          val n = nearestCentroids(v, cs, dim, nL, nP, probes)
          (0 until n).iterator.map(i => Row(probes(i), id, v))
        }
      }, probedSchema)

    // static partition pruning: only the probed list directories are read.
    // The distinct-lists action runs the (map-only, query-side) probe kernel
    // once ahead of the join's own execution — re-running that kernel is far
    // cheaper than pinning `probed` in memory or scanning unprobed index
    // partitions, so this stays cache-free by design.
    val probedLists = probed.select("list_id").distinct().collect().map(_.getInt(0))
    val listsRaw = spark.read.parquet(s"$indexPath/lists")
      .filter(col("list_id").isin(probedLists.toIndexedSeq.map(Integer.valueOf): _*))
    // tombstoned ids (ivfDeleteFromIndex) vanish at probe time, before
    // ranking — same contract as Pq.probeIndex
    val tombPath = new org.apache.hadoop.fs.Path(s"$indexPath/tombstones")
    val lists =
      if (tombPath.getFileSystem(spark.sessionState.newHadoopConf())
        .exists(tombPath))
        listsRaw.join(
          org.apache.spark.sql.functions.broadcast(
            spark.read.parquet(s"$indexPath/tombstones")
              .select("target_id").distinct()),
          Seq("target_id"), "left_anti")
      else listsRaw

    val joined = probed.join(lists, "list_id")
      .filter(if (excludeSelf) col("query_id") =!= col("target_id") else lit(true))
    topKFromScoredPairs(scorePairs(joined, dim), k)
  }

  /** (query_id, qv, target_id, tv) pairs -> (query_id, target_id, cosine)
    * via a primitive mapPartitions kernel; the single scoring implementation
    * behind both distributed IVF paths. Vectors are treated as zero-padded
    * to the FITTED `dim` — norms run over each side's own min(dim, length),
    * the dot over the common prefix — exactly like the packed broadcast
    * kernel, so all three paths stay bit-identical on ragged inputs too.
    */
  private def scorePairs(joined: DataFrame, dim: Int): DataFrame = {
    val scoreSchema = StructType(Seq(
      StructField("query_id", LongType, nullable = false),
      StructField("target_id", LongType, nullable = false),
      StructField("cosine", DoubleType, nullable = false)))
    joined.sparkSession.createDataFrame(
      joined.select("query_id", "qv", "target_id", "tv").rdd.mapPartitions { it =>
        it.map { r =>
          val a = floatArr(r, 1)
          val b = floatArr(r, 3)
          val aLen = math.min(dim, a.length)
          val bLen = math.min(dim, b.length)
          var dot = 0.0; var na = 0.0; var nb = 0.0
          var d = 0
          val n = math.min(aLen, bLen)
          while (d < n) {
            dot += a(d).toDouble * b(d).toDouble
            d += 1
          }
          d = 0
          while (d < aLen) { na += a(d).toDouble * a(d).toDouble; d += 1 }
          d = 0
          while (d < bLen) { nb += b(d).toDouble * b(d).toDouble; d += 1 }
          val denom = math.sqrt(na) * math.sqrt(nb)
          Row(r.getLong(0), r.getLong(2), if (denom == 0.0) 0.0 else round9(dot / denom))
        }
      }, scoreSchema)
  }

  private def topKFromScoredPairs(scored: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("target_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "target_id", "cosine", "rank")
  }

  /** IVF top-k beyond broadcast scale: targets are assigned (map-only kernel)
    * to their nearest list, queries probe their `nProbe` lists, and scoring
    * happens after ONE shuffle join on `list_id` — at scale the target side
    * is written bucketed by `list_id` so the join co-locates without
    * re-shuffling targets. Assignment, probing and the cosine all run in
    * mapPartitions kernels over primitive arrays (no per-row UDF); only the
    * final cross-list top-k needs a window. Bit-identical to [[ivfTopK]]
    * (same centroid selection, same denominator, same ordering).
    */
  def ivfTopKBucketed(queries: DataFrame, targets: DataFrame, k: Int,
                      nLists: Int = 64, nProbe: Int = 8, seed: Long = 42L,
                      maxIter: Int = 10, maxFitRows: Int = 100000,
                      idCol: String = "vec_id", vecCol: String = "embedding",
                      excludeSelf: Boolean = false): DataFrame = {
    val (centroids, dim) = ivfFit(targets, nLists, seed, maxIter, maxFitRows, idCol, vecCol)
    val spark = queries.sparkSession
    val bc = graft.BroadcastLifecycle.track(spark.sparkContext.broadcast(centroids))
    val nL = if (dim == 0) 1 else centroids.length / dim
    val nP = math.min(nProbe, nL)

    def withLists(df: DataFrame, take: Int, outId: String, outVec: String): DataFrame = {
      val schema = StructType(Seq(
        StructField("list_id", IntegerType, nullable = false),
        StructField(outId, LongType, nullable = false),
        StructField(outVec, ArrayType(FloatType), nullable = true)))
      val rdd = df.select(col(idCol).cast("long"), col(vecCol)).rdd.mapPartitions { it =>
        val cs = bc.value
        val probes = new Array[Int](math.max(take, 1))
        it.flatMap { r =>
          val id = r.getLong(0)
          val v  = floatArr(r, 1)
          val nFilled = nearestCentroids(v, cs, dim, nL, take, probes)
          (0 until nFilled).iterator.map(i => Row(probes(i), id, v))
        }
      }
      spark.createDataFrame(rdd, schema)
    }

    val assigned = withLists(targets, 1, "target_id", "tv")
    val probed   = withLists(queries, nP, "query_id", "qv")

    val joined = probed.join(assigned, "list_id")
      .filter(if (excludeSelf) col("query_id") =!= col("target_id") else lit(true))
    topKFromScoredPairs(scorePairs(joined, dim), k)
  }

  /** SemDeDup-style semantic near-dup pairs: cluster the corpus with the IVF
    * quantizer, then generate candidate pairs ONLY within a cluster and
    * verify them with the exact cosine — the pruning that turns the O(n²)
    * all-pairs join into per-cluster work (Abbas et al., "SemDeDup", 2023:
    * prune duplicate pair search to k-means cluster membership).
    *
    * Every emitted pair satisfies `cosine >= minCosine` with the SAME
    * round-to-9 score as [[exactCosinePairs]] (shared kernel arithmetic), so
    * the reported set is a provable subset of the exact threshold join —
    * clustering only affects recall, never precision, exactly like the LSH
    * path. Plan shape: driver k-means fit on a bounded seeded sample (the
    * q53 fit), map-side single-nearest-list assignment, ONE self-join on
    * `list_id` with `id_a < id_b`, kernel scoring — the corpus is NEVER
    * broadcast (unlike [[exactCosinePairs]], whose packed-target bound this
    * path exists to escape). At 100 TB the assigned side is written bucketed
    * by `list_id` (the [[ivfTopKBucketed]] co-location recipe) so the
    * self-join needs no exchange, and per-cluster pair volume is governed by
    * the occupancy report ([[ivfOccupancyReport]]) + refit
    * ([[ivfRefitIndex]]) maintenance loop — a runaway hot cluster is a
    * visible, repairable condition, not a silent quadratic.
    */
  def clusteredCosinePairs(df: DataFrame, nLists: Int, minCosine: Double,
                           seed: Long = 42L, maxIter: Int = 10,
                           maxFitRows: Int = 100000,
                           idCol: String = "vec_id",
                           vecCol: String = "embedding"): DataFrame = {
    val (centroids, dim) = ivfFit(df, nLists, seed, maxIter, maxFitRows, idCol, vecCol)
    // both self-join sides consume the assignment: freeze it once (the
    // q155/Triangles shared-lineage discipline) instead of running the
    // centroid kernel twice; at 100 TB this is the bucketed-by-list_id write
    val assigned = assignToLists(df, centroids, dim, idCol, vecCol)
      .localCheckpoint()
    val a = assigned.select(col("list_id"), col("target_id").as("query_id"),
      col("tv").as("qv"))
    val b = assigned.select(col("list_id"), col("target_id"), col("tv"))
    val joined = a.join(b, "list_id").filter(col("query_id") < col("target_id"))
    scorePairs(joined, dim)
      .filter(col("cosine") >= minCosine)
      .select(col("query_id").as("id_a"), col("target_id").as("id_b"),
        col("cosine"))
  }

  /** Density-based clustering over the cosine neighbourhood graph
    * (DBSCAN, Ester et al. 1996, with ε expressed as a cosine floor) —
    * the dedup-aware clustering that separates DENSE duplicate regions
    * from sparse bridges, where plain transitive closure
    * ([[graft.data.Dedup.embeddingDupClusters]]) chains everything one
    * weak link connects:
    *
    *  - core point: ≥ `minPts` neighbours at cosine ≥ `minCosine`
    *    (self excluded, declared);
    *  - clusters: connected components of the CORE-CORE subgraph
    *    (labels = component-minimum core id — the house CC contract);
    *  - border point: non-core with ≥ 1 core neighbour — joins the
    *    cluster of its minimum-label core neighbour (declared
    *    deterministic tie-break; classic DBSCAN leaves this
    *    assignment-order-dependent);
    *  - noise: everything else, cluster −1.
    *
    * Plan shape: the pair list is the exact kernel's output (map-only
    * against the broadcast packed matrix), frozen once; degrees, the
    * core filter and the border attach are pair-graph-sized joins; the
    * closure is [[graft.data.Dedup.connectedComponents]] on the
    * core-core subgraph only.
    *
    * @return one row per input vector: `(idCol, cluster_id, is_core)`;
    *         noise rows carry cluster_id = −1
    */
  def dbscanCosine(df: DataFrame, minCosine: Double, minPts: Int,
                   idCol: String = "vec_id",
                   vecCol: String = "embedding"): DataFrame = {
    require(minPts >= 1, s"minPts must be >= 1, got $minPts")
    dbscanFromPairs(df,
      exactCosinePairs(df, minCosine, idCol, vecCol), minPts, idCol)
  }

  /** [[dbscanCosine]] for the regime where the corpus exceeds the packed
    * broadcast ceiling: the neighbourhood pair list comes from
    * [[clusteredCosinePairs]] (IVF-pruned candidates, every survivor
    * exact-cosine verified — the SemDeDup q164 generator, one shuffle on
    * `list_id`, nothing broadcast at corpus scale) instead of the exact
    * broadcast kernel. Same closure, same tie-breaks — a parameter
    * change, not a new algorithm.
    *
    * DECLARED semantics: the IVF pruning costs RECALL, never precision —
    * cross-list neighbour pairs are unseen, so degrees can only drop.
    * Structurally therefore: every core here is a core of the exact
    * variant, and every cluster here lies entirely inside one exact
    * cluster (edges only vanish, so components only split) — the two
    * invariants q403 verifies in-query. With nLists = 1 the pair list is
    * the exact list and the output is identical to [[dbscanCosine]].
    */
  def dbscanCosineClustered(df: DataFrame, minCosine: Double, minPts: Int,
                            nLists: Int, seed: Long = 42L,
                            maxIter: Int = 10,
                            idCol: String = "vec_id",
                            vecCol: String = "embedding"): DataFrame = {
    require(minPts >= 1, s"minPts must be >= 1, got $minPts")
    dbscanFromPairs(df,
      clusteredCosinePairs(df, nLists, minCosine, seed, maxIter,
        idCol = idCol, vecCol = vecCol), minPts, idCol)
  }

  /** The DBSCAN body shared by the broadcast and beyond-broadcast pair
    * sources: degrees, core filter, core-core closure, border attach. */
  private def dbscanFromPairs(df: DataFrame, rawPairs: DataFrame,
                              minPts: Int, idCol: String): DataFrame = {
    val pairs = rawPairs.select("id_a", "id_b").localCheckpoint()
    val sym = pairs.select(col("id_a").as("id"), col("id_b").as("nb"))
      .unionByName(pairs.select(col("id_b").as("id"), col("id_a").as("nb")))
    val cores = sym.groupBy("id")
      .agg(count(lit(1)).cast("long").as("__deg"))
      .filter(col("__deg") >= minPts.toLong)
      .select("id")
    val corePairs = pairs
      .join(cores.select(col("id").as("id_a")), "id_a")
      .join(cores.select(col("id").as("id_b")), "id_b")
      .select("id_a", "id_b")
    val comp = graft.data.Dedup
      .connectedComponents(cores, corePairs) // (id, cluster_id)
    val borderLbl = sym
      .join(comp.select(col("id").as("nb"),
        col("cluster_id").as("__nlbl")), "nb")
      .join(cores, Seq("id"), "left_anti")
      .groupBy("id").agg(min("__nlbl").as("__blbl"))
    df.select(col(idCol).cast("long").as(idCol))
      .join(comp.select(col("id").as(idCol),
        col("cluster_id").as("__clbl")), Seq(idCol), "left")
      .join(borderLbl.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__clbl"), col("__blbl"), lit(-1L)).cast("long")
          .as("cluster_id"),
        col("__clbl").isNotNull.as("is_core"))
  }
}
