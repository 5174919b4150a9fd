package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed in batched partition passes.
  *
  * The container has no image/audio codecs, so the decode kernels below are
  * DETERMINISTIC STUBS (byte-level features standing in for pixel/sample
  * decoding). Everything around them — schema (binary + metadata struct +
  * array<float> features), per-partition batching, column pruning before the
  * kernel — is the real Spark plumbing a production decode would use; swap
  * `decodeBytes` for a real codec and nothing else changes.
  */
object BinaryMedia {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("format", StringType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true))), nullable = true)))

  /** Wrap any string column as an opaque media payload with metadata. */
  def attach(df: DataFrame, idCol: String, payloadCol: String,
             format: String = "application/octet-stream"): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      col(payloadCol).cast("binary").as("media"),
      struct(
        lit(format).as("format"),
        (length(col(payloadCol).cast("binary")) % 640).cast("int").as("width"),
        (length(col(payloadCol).cast("binary")) % 480).cast("int").as("height")).as("meta"))

  /** STUB decode: a real implementation would decode pixels/samples here.
    * Deterministic byte histogram (16 coarse bins, L1-normalized) as the
    * extracted feature vector — the batch shape, schema and null handling are
    * exactly what a real decoder kernel needs.
    */
  private def decodeBytes(bytes: Array[Byte]): Array[Float] = {
    val bins = new Array[Float](16)
    if (bytes == null || bytes.isEmpty) return bins
    var i = 0
    while (i < bytes.length) { bins((bytes(i) & 0xff) >> 4) += 1f; i += 1 }
    var b = 0
    while (b < 16) { bins(b) /= bytes.length; b += 1 }
    bins
  }

  private val featSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("features", ArrayType(FloatType, containsNull = false), nullable = false),
    StructField("n_bytes", IntegerType, nullable = false)))

  /** Feature extraction over media batches: column-pruned partition pass
    * (only media_id + media reach the kernel).
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val pruned = media.select("media_id", "media")
    val rdd = pruned.rdd.mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](1)
        Row(r.getLong(0), decodeBytes(bytes).toSeq, if (bytes == null) 0 else bytes.length)
      }
    }
    media.sparkSession.createDataFrame(rdd, featSchema)
  }

  /** STUB resize: real impl would resample pixels; here it truncates bytes to
    * `target` length (keeps the plumbing: binary in, binary out, meta update).
    */
  def resize(media: DataFrame, target: Int): DataFrame =
    media.withColumn("media", expr(s"substring(media, 1, $target)"))
      .withColumn("meta", struct(
        col("meta.format"),
        least(col("meta.width"), lit(target)).cast("int").as("width"),
        least(col("meta.height"), lit(target)).cast("int").as("height")))

  /** STUB frame sampling: every nth chunk of `chunk` bytes as a "frame". */
  def sampleFrames(media: DataFrame, chunk: Int, every: Int): DataFrame = {
    val frames = udf { (bytes: Array[Byte]) =>
      if (bytes == null) Seq.empty[Array[Byte]]
      else bytes.grouped(chunk).zipWithIndex
        .collect { case (f, i) if i % every == 0 => f }.toSeq
    }
    media.withColumn("frames", frames(col("media")))
      .withColumn("n_frames", size(col("frames")))
  }
}
