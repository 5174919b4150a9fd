package graft.multimodal

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed in batched partition passes.
  *
  * The codecs are REAL pure-JVM implementations of container formats that
  * need no native libraries: 24-bit uncompressed BMP (bottom-up rows, 4-byte
  * row padding) for images, RIFF/PCM-16 WAV (chunk-walking parser) for
  * audio, and concatenated BMP frames (sizes read from each header) for
  * video. Everything around them — schema (binary + metadata struct),
  * column pruning before the kernel, per-partition batching — is the same
  * plumbing any production decoder (JPEG/FLAC/H.264 via a codec library)
  * would drop into: swap `decodeBmp` for the codec call and nothing else
  * changes.
  *
  * Payloads are synthesized from text columns (the container ships no real
  * media files), which makes every decoded statistic independently
  * replayable by the DuckDB oracle from the raw bytes — header parsing, row
  * padding, bottom-up ordering and sample widening are all on the checked
  * path.
  */
object BinaryMedia {

  // ===== BMP codec (24bpp, uncompressed, bottom-up, 4-byte row padding) ====

  /** Decoded image: top-down row-major BGR triplets. */
  final case class BmpImage(width: Int, height: Int, bgr: Array[Byte])

  private def le16(out: Array[Byte], off: Int, v: Int): Unit = {
    out(off) = (v & 0xff).toByte; out(off + 1) = ((v >> 8) & 0xff).toByte
  }
  private def le32(out: Array[Byte], off: Int, v: Int): Unit = {
    out(off) = (v & 0xff).toByte
    out(off + 1) = ((v >> 8) & 0xff).toByte
    out(off + 2) = ((v >> 16) & 0xff).toByte
    out(off + 3) = ((v >> 24) & 0xff).toByte
  }
  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def i32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  /** Encode top-down BGR pixel data as a standard bottom-up 24bpp BMP
    * (BITMAPFILEHEADER + BITMAPINFOHEADER, rows padded to 4 bytes).
    */
  def encodeBmp(width: Int, height: Int, bgr: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    require(bgr.length == width * height * 3,
      s"pixel buffer ${bgr.length} != ${width}x$height x3")
    val rowSize  = ((width * 3 + 3) / 4) * 4
    val dataSize = rowSize * height
    val out = new Array[Byte](54 + dataSize) // padding bytes stay 0
    out(0) = 'B'; out(1) = 'M'
    le32(out, 2, 54 + dataSize)
    le32(out, 10, 54)           // pixel data offset
    le32(out, 14, 40)           // BITMAPINFOHEADER size
    le32(out, 18, width)
    le32(out, 22, height)       // positive height = bottom-up rows
    le16(out, 26, 1)            // planes
    le16(out, 28, 24)           // bits per pixel
    le32(out, 34, dataSize)
    le32(out, 38, 2835); le32(out, 42, 2835) // 72 dpi
    var r = 0
    while (r < height) {
      // file row r holds logical (top-down) row height-1-r
      System.arraycopy(bgr, (height - 1 - r) * width * 3, out, 54 + r * rowSize, width * 3)
      r += 1
    }
    out
  }

  /** Parse a 24bpp uncompressed BMP back to top-down BGR pixels. Honors the
    * declared pixel-data offset (extra header bytes are fine), row padding,
    * and both bottom-up (positive height) and top-down (negative) layouts.
    */
  def decodeBmp(bytes: Array[Byte]): BmpImage = {
    require(bytes != null && bytes.length >= 54 &&
      bytes(0) == 'B' && bytes(1) == 'M', "not a BMP payload")
    val dataOffset = i32(bytes, 10)
    val width      = i32(bytes, 18)
    val rawHeight  = i32(bytes, 22)
    val topDown    = rawHeight < 0
    val height     = math.abs(rawHeight)
    // header-sanity before any allocation: a hostile/corrupt payload must
    // fail a clean require, not a NegativeArraySizeException or an OOM from
    // an absurd declared width*height (public codec entry point)
    require(width > 0 && rawHeight != Int.MinValue && height > 0,
      s"bad dimensions ${width}x$rawHeight")
    require(width.toLong * height * 3L <= Int.MaxValue,
      s"implausible pixel volume ${width}x$height")
    require(dataOffset >= 54 && dataOffset <= bytes.length,
      s"bad pixel-data offset $dataOffset")
    require(u16(bytes, 26) == 1, "bad plane count")
    require(u16(bytes, 28) == 24, s"only 24bpp supported, got ${u16(bytes, 28)}")
    require(i32(bytes, 30) == 0, "only uncompressed (BI_RGB) supported")
    val rowSize = ((width * 3 + 3) / 4) * 4
    require(bytes.length >= dataOffset + rowSize.toLong * height, "truncated pixel data")
    val bgr = new Array[Byte](width * height * 3)
    var r = 0
    while (r < height) {
      val logical = if (topDown) r else height - 1 - r
      System.arraycopy(bytes, dataOffset + r * rowSize, bgr, logical * width * 3, width * 3)
      r += 1
    }
    BmpImage(width, height, bgr)
  }

  /** Decode-or-quarantine triage — the ingest-time contract a production
    * media pipeline needs: a corrupt payload becomes an (is_valid, reason)
    * verdict ROW, never an exception that kills the 100 TB job's task. The
    * strict decoder's `require`s are the validity oracle; the catch turns
    * them into data. Map-side over the pruned (id, media) projection.
    */
  def validateBmp(media: DataFrame, idCol: String = "media_id",
                  binCol: String = "media"): DataFrame = {
    val check = udf { (bytes: Array[Byte]) =>
      try { val img = decodeBmp(bytes); (true, s"${img.width}x${img.height}") }
      catch { case e: IllegalArgumentException =>
        (false, Option(e.getMessage).getOrElse("decode failed").take(80))
      }
    }
    media.select(col(idCol), col(binCol))
      .withColumn("__v", check(col(binCol)))
      .select(col(idCol), col("__v._1").as("is_valid"),
        col("__v._2").as("reason"))
  }

  /** Nearest-neighbour resample (the classic integer mapping
    * src = floor(dst * srcDim / dstDim)).
    */
  def resizeNearest(img: BmpImage, outW: Int, outH: Int): BmpImage = {
    require(outW > 0 && outH > 0, s"bad target ${outW}x$outH")
    val out = new Array[Byte](outW * outH * 3)
    var y = 0
    while (y < outH) {
      val sy = y * img.height / outH
      var x = 0
      while (x < outW) {
        val sx = x * img.width / outW
        System.arraycopy(img.bgr, (sy * img.width + sx) * 3, out, (y * outW + x) * 3, 3)
        x += 1
      }
      y += 1
    }
    BmpImage(outW, outH, out)
  }

  // ===== WAV codec (RIFF, PCM 16-bit mono) ================================

  final case class WavAudio(sampleRate: Int, channels: Int, bitsPerSample: Int,
                            samples: Array[Short])

  /** Encode 16-bit mono PCM as a canonical 44-byte-header RIFF/WAVE file. */
  def encodeWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataSize = samples.length * 2
    val out = new Array[Byte](44 + dataSize)
    "RIFF".getBytes(StandardCharsets.US_ASCII).copyToArray(out, 0)
    le32(out, 4, 36 + dataSize)
    "WAVE".getBytes(StandardCharsets.US_ASCII).copyToArray(out, 8)
    "fmt ".getBytes(StandardCharsets.US_ASCII).copyToArray(out, 12)
    le32(out, 16, 16)               // fmt chunk size
    le16(out, 20, 1)                // PCM
    le16(out, 22, 1)                // mono
    le32(out, 24, sampleRate)
    le32(out, 28, sampleRate * 2)   // byte rate
    le16(out, 32, 2)                // block align
    le16(out, 34, 16)               // bits per sample
    "data".getBytes(StandardCharsets.US_ASCII).copyToArray(out, 36)
    le32(out, 40, dataSize)
    var i = 0
    while (i < samples.length) { le16(out, 44 + 2 * i, samples(i) & 0xffff); i += 1 }
    out
  }

  /** Chunk-walking RIFF parser: tolerates extra chunks in any order and odd
    * chunk sizes (RIFF pads to even), requires PCM 16-bit.
    */
  def decodeWav(bytes: Array[Byte]): WavAudio = {
    require(bytes != null && bytes.length >= 12 &&
      new String(bytes, 0, 4, StandardCharsets.US_ASCII) == "RIFF" &&
      new String(bytes, 8, 4, StandardCharsets.US_ASCII) == "WAVE", "not a WAV payload")
    var pos = 12
    var sampleRate = 0; var channels = 0; var bits = 0
    var samples: Array[Short] = null
    while (pos + 8 <= bytes.length) {
      val id   = new String(bytes, pos, 4, StandardCharsets.US_ASCII)
      val size = i32(bytes, pos + 4)
      require(size >= 0 && pos + 8 + size <= bytes.length, s"truncated chunk $id")
      id match {
        case "fmt " =>
          require(u16(bytes, pos + 8) == 1, "only PCM supported")
          channels   = u16(bytes, pos + 10)
          sampleRate = i32(bytes, pos + 12)
          bits       = u16(bytes, pos + 22)
          require(bits == 16, s"only 16-bit PCM supported, got $bits")
        case "data" =>
          val n = size / 2
          samples = new Array[Short](n)
          var i = 0
          while (i < n) { samples(i) = u16(bytes, pos + 8 + 2 * i).toShort; i += 1 }
        case _ => () // skip unknown chunks
      }
      pos += 8 + size + (size & 1) // odd sizes pad to even
    }
    require(sampleRate > 0 && samples != null, "missing fmt /data chunk")
    WavAudio(sampleRate, channels, bits, samples)
  }

  // ===== DataFrame operators ==============================================

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("format", StringType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true))), nullable = true)))

  /** Synthesize one real BMP per row from a text column: UTF-8 bytes become
    * BGR pixel data at a fixed `width`, zero-padded to fill the last row
    * (height = ceil(nBytes / (width*3)), min 1). Map-only, column-pruned.
    */
  def imageFromText(df: DataFrame, idCol: String, textCol: String,
                    width: Int = 16): DataFrame = {
    val spark = df.sparkSession
    val rdd = df.select(col(idCol).cast("long"), col(textCol)).rdd.mapPartitions { it =>
      it.map { r =>
        val id  = r.getLong(0)
        val b   = if (r.isNullAt(1)) Array.empty[Byte]
                  else r.getString(1).getBytes(StandardCharsets.UTF_8)
        val h   = math.max(1, (b.length + width * 3 - 1) / (width * 3))
        val bgr = java.util.Arrays.copyOf(b, width * h * 3)
        Row(id, encodeBmp(width, h, bgr), Row("image/bmp", width, h))
      }
    }
    spark.createDataFrame(rdd, mediaSchema)
  }

  /** Synthesize one real WAV per row: each UTF-8 byte b becomes the 16-bit
    * sample (b-128)*256; the sample rate varies by id (8000/12000/16000 Hz)
    * so header parsing is actually exercised per row.
    */
  def audioFromText(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    val rdd = df.select(col(idCol).cast("long"), col(textCol)).rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val b  = if (r.isNullAt(1)) Array.empty[Byte]
                 else r.getString(1).getBytes(StandardCharsets.UTF_8)
        val samples = new Array[Short](b.length)
        var i = 0
        while (i < b.length) { samples(i) = (((b(i) & 0xff) - 128) * 256).toShort; i += 1 }
        val sr = (8000 + (id % 3) * 4000).toInt
        Row(id, encodeWav(sr, samples), Row("audio/wav", null, null))
      }
    }
    spark.createDataFrame(rdd, mediaSchema)
  }

  /** Synthesize a "video" per row: the text bytes split into `nFrames`
    * near-equal slices, each encoded as a BMP frame, frames concatenated.
    * A real container would interleave headers the same way; the splitter
    * below re-derives frame boundaries from each BMP's declared file size.
    */
  def videoFromText(df: DataFrame, idCol: String, textCol: String,
                    nFrames: Int = 4, frameWidth: Int = 8): DataFrame = {
    require(nFrames > 0, s"nFrames must be positive, got $nFrames")
    val spark = df.sparkSession
    val rdd = df.select(col(idCol).cast("long"), col(textCol)).rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val b  = if (r.isNullAt(1)) Array.empty[Byte]
                 else r.getString(1).getBytes(StandardCharsets.UTF_8)
        val per = math.max(1, (b.length + nFrames - 1) / nFrames)
        val frames = (0 until nFrames).map { f =>
          val from  = math.min(f * per, b.length)
          val until = math.min(from + per, b.length)
          val slice = java.util.Arrays.copyOfRange(b, from, until)
          val h     = math.max(1, (slice.length + frameWidth * 3 - 1) / (frameWidth * 3))
          encodeBmp(frameWidth, h, java.util.Arrays.copyOf(slice, frameWidth * h * 3))
        }
        val total = frames.map(_.length).sum
        val out = new Array[Byte](total)
        var off = 0
        frames.foreach { f => System.arraycopy(f, 0, out, off, f.length); off += f.length }
        Row(id, out, Row("video/x-bmp-frames", frameWidth, nFrames))
      }
    }
    spark.createDataFrame(rdd, mediaSchema)
  }

  private val imageStatsSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("img_w", IntegerType, nullable = false),
    StructField("img_h", IntegerType, nullable = false),
    StructField("byte_sum", LongType, nullable = false),
    StructField("first_px", IntegerType, nullable = false),
    StructField("last_row_px", IntegerType, nullable = false)))

  /** Decode every BMP and report header + pixel statistics: dimensions from
    * the parsed header, the sum of all channel values, the first pixel's
    * blue channel, and the blue channel of the first pixel of the LAST
    * logical row — the probe that catches bottom-up/top-down mix-ups, which
    * leave `byte_sum` unchanged. Column-pruned map-only pass.
    */
  def imageStats(media: DataFrame): DataFrame = {
    val rdd = media.select("media_id", "media").rdd.mapPartitions { it =>
      it.map { r =>
        val img = decodeBmp(r.getAs[Array[Byte]](1))
        var sum = 0L
        var i = 0
        while (i < img.bgr.length) { sum += (img.bgr(i) & 0xff); i += 1 }
        val firstPx   = if (img.bgr.nonEmpty) img.bgr(0) & 0xff else 0
        val lastRowPx = if (img.height > 0) img.bgr((img.height - 1) * img.width * 3) & 0xff else 0
        Row(r.getLong(0), img.width, img.height, sum, firstPx, lastRowPx)
      }
    }
    media.sparkSession.createDataFrame(rdd, imageStatsSchema)
  }

  /** 64-bit difference hash (dHash) of a decoded image — the standard
    * perceptual fingerprint for image-corpus near-dedup
    * (https://en.wikipedia.org/wiki/Perceptual_hashing, the
    * 9x8-then-compare-neighbours recipe): resample to 9x8 (nearest
    * neighbour), integer grayscale (b+g+r)/3, and bit y*8+x is set when
    * gray(x,y) > gray(x+1,y). Pure integer arithmetic end to end, so the
    * hash is bit-stable and oracle-replayable from the raw bytes.
    */
  def dHash64(img: BmpImage): Long = {
    val small = resizeNearest(img, 9, 8)
    var hash = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        val pL = (y * 9 + x) * 3
        val gL = ((small.bgr(pL) & 0xff) + (small.bgr(pL + 1) & 0xff) +
                  (small.bgr(pL + 2) & 0xff)) / 3
        val gR = ((small.bgr(pL + 3) & 0xff) + (small.bgr(pL + 4) & 0xff) +
                  (small.bgr(pL + 5) & 0xff)) / 3
        if (gL > gR) hash |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    hash
  }

  /** Decode every BMP and fingerprint it: (media_id, sig) with the [[dHash64]]
    * signature — map-only, feeds [[graft.data.Dedup.sigPairs]] for hamming
    * pairing (image near-dup = the SimHash chunk-bucket machinery over a
    * perceptual hash instead of a token hash). A null payload yields a null
    * sig, which the pair join ignores.
    */
  def imageDHashes(media: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("sig", LongType, nullable = true)))
    val rdd = media.select("media_id", "media").rdd.mapPartitions { it =>
      it.map { r =>
        val sig = if (r.isNullAt(1)) null
                  else java.lang.Long.valueOf(dHash64(decodeBmp(r.getAs[Array[Byte]](1))))
        Row(r.getLong(0), sig)
      }
    }
    media.sparkSession.createDataFrame(rdd, schema)
  }

  private val audioStatsSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("n_samples", IntegerType, nullable = false),
    StructField("peak_abs", IntegerType, nullable = false),
    StructField("sum_abs", LongType, nullable = false)))

  /** Decode every WAV and report header fields (sample rate from the parsed
    * fmt chunk) plus PCM statistics (peak and total absolute amplitude).
    */
  def audioStats(media: DataFrame): DataFrame = {
    val rdd = media.select("media_id", "media").rdd.mapPartitions { it =>
      it.map { r =>
        val wav = decodeWav(r.getAs[Array[Byte]](1))
        var peak = 0
        var sum  = 0L
        var i = 0
        while (i < wav.samples.length) {
          val a = math.abs(wav.samples(i).toInt)
          if (a > peak) peak = a
          sum += a
          i += 1
        }
        Row(r.getLong(0), wav.sampleRate, wav.samples.length, peak, sum)
      }
    }
    media.sparkSession.createDataFrame(rdd, audioStatsSchema)
  }

  /** 63-bit energy-envelope fingerprint of decoded PCM audio — the audio
    * sibling of [[dHash64]]: samples bucket into 64 near-equal windows
    * (window of sample i = i*64/n, integer arithmetic), each window's mean
    * absolute amplitude is an integer (sum/count, floor division), and bit
    * w (0 <= w < 63) is set when energy(w) > energy(w+1). Like dHash, the
    * envelope SHAPE is captured, not absolute loudness — so a re-encoded or
    * slightly-edited clip lands within a few bits of the original. Pure
    * integer arithmetic end to end: bit-stable and oracle-replayable from
    * the raw bytes. Only bits 0..62 are used, so the value is always
    * non-negative — a SQL engine can rebuild it by summing powers of two
    * without signed-overflow tricks. Empty windows (n < 64) read as 0.
    */
  def audioEnergySig64(wav: WavAudio): Long = {
    val n = wav.samples.length
    val sums   = new Array[Long](64)
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      val w = ((i.toLong * 64L) / n).toInt
      sums(w) += math.abs(wav.samples(i).toInt)
      counts(w) += 1
      i += 1
    }
    var sig = 0L
    var w = 0
    while (w < 63) {
      val eL = if (counts(w) == 0) 0L else sums(w) / counts(w)
      val eR = if (counts(w + 1) == 0) 0L else sums(w + 1) / counts(w + 1)
      if (eL > eR) sig |= 1L << w
      w += 1
    }
    sig
  }

  /** Decode every WAV and fingerprint it: (id, sig) with the
    * [[audioEnergySig64]] signature — map-only, feeds
    * [[graft.data.Dedup.sigPairs]] for hamming pairing exactly like
    * [[imageDHashes]] does for images. A null payload yields a null sig.
    */
  def audioSigs(media: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("sig", LongType, nullable = true)))
    val rdd = media.select("media_id", "media").rdd.mapPartitions { it =>
      it.map { r =>
        val sig = if (r.isNullAt(1)) null
                  else java.lang.Long.valueOf(audioEnergySig64(decodeWav(r.getAs[Array[Byte]](1))))
        Row(r.getLong(0), sig)
      }
    }
    media.sparkSession.createDataFrame(rdd, schema)
  }

  /** Real resize: decode -> nearest-neighbour resample -> re-encode, with
    * the metadata struct updated to the new dimensions.
    */
  def resizeImages(media: DataFrame, outW: Int, outH: Int): DataFrame = {
    val resizeUdf = udf { (bytes: Array[Byte]) =>
      val img = resizeNearest(decodeBmp(bytes), outW, outH)
      encodeBmp(img.width, img.height, img.bgr)
    }
    media.withColumn("media", resizeUdf(col("media")))
      .withColumn("meta", struct(
        col("meta.format"),
        lit(outW).as("width"),
        lit(outH).as("height")))
  }

  /** Split concatenated BMP frames by walking each frame's declared file
    * size (bytes 2-5 of its header) — the container-parsing shape of real
    * video frame sampling — and keep every `every`-th frame.
    */
  def sampleFrames(media: DataFrame, every: Int = 1): DataFrame = {
    require(every > 0, s"every must be positive, got $every")
    val framesUdf = udf { (bytes: Array[Byte]) =>
      if (bytes == null) Seq.empty[Array[Byte]]
      else {
        val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
        var pos = 0
        var idx = 0
        while (pos + 6 <= bytes.length && bytes(pos) == 'B' && bytes(pos + 1) == 'M') {
          val size = i32(bytes, pos + 2)
          // a declared size smaller than a BMP header, or past the payload
          // end, means a corrupt container: stop rather than emit junk frames
          if (size < 54 || pos + size > bytes.length) { pos = bytes.length }
          else {
            if (idx % every == 0) out += java.util.Arrays.copyOfRange(bytes, pos, pos + size)
            pos += size
            idx += 1
          }
        }
        out.toSeq
      }
    }
    media.withColumn("frames", framesUdf(col("media")))
      .withColumn("n_frames", size(col("frames")))
  }

  private val frameStatsSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("total_frame_bytes", LongType, nullable = false),
    StructField("px_sum", LongType, nullable = false),
    StructField("last_frame_h", IntegerType, nullable = false)))

  /** Decode every sampled frame (the `frames` column [[sampleFrames]] adds)
    * and report per-video statistics: kept-frame count, total container bytes
    * of the kept frames (headers + padded rows — probes the frame splitter's
    * size walking), the summed channel values of all kept frames' decoded
    * pixels, and the parsed height of the LAST kept frame (probes that the
    * tail slice's ceil-division height survived the encode/split round trip).
    * Column-pruned map-only pass, same shape as [[imageStats]].
    */
  def frameStats(sampled: DataFrame): DataFrame = {
    val rdd = sampled.select("media_id", "frames").rdd.mapPartitions { it =>
      it.map { r =>
        val frames = r.getSeq[Array[Byte]](1)
        var total = 0L
        var px    = 0L
        var lastH = 0
        frames.foreach { fb =>
          val img = decodeBmp(fb)
          total += fb.length
          var i = 0
          while (i < img.bgr.length) { px += (img.bgr(i) & 0xff); i += 1 }
          lastH = img.height
        }
        Row(r.getLong(0), frames.length, total, px, lastH)
      }
    }
    sampled.sparkSession.createDataFrame(rdd, frameStatsSchema)
  }
}
