package graft.data

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bloom-filter SIDECAR index for a partitioned store: per partition, a
  * small bitset summarizing the key column — so a point lookup reads the
  * kilobyte sidecar first, keeps only partitions whose filter matches,
  * and scans just those (directory-level pruning on top of parquet's own
  * row-group stats; false positives cost an extra partition scan, false
  * negatives are impossible by construction — the q113/q183 sketch
  * guarantee applied to DATA LAYOUT).
  *
  * Build is one distributed pass over the store (k hash positions per
  * key, bit-OR folded per (partition, word) — integer-exact, mergeable);
  * the sidecar is itself a tiny parquet table next to the data.
  */
object BloomIndex {

  val Bits = 4096
  val Words: Int = Bits / 64
  val K = 3

  /** k deterministic bit positions (md5-derived, the CMS hash recipe). */
  private def positions(keyCol: String): Seq[org.apache.spark.sql.Column] =
    (0 until K).map { i =>
      expr(s"""CAST(CAST(conv(substring(md5(concat('$i', '|',
               CAST($keyCol AS STRING))), 1, 12), 16, 10) AS BIGINT)
               % $Bits AS INT)""")
    }

  /** Build the sidecar for `storeDf`'s `keyCol` grouped by `partCol`:
    * rows (partition value, word, bits) — `Words` rows per partition.
    */
  def build(storeDf: DataFrame, partCol: String, keyCol: String,
            sidecarPath: String): Unit = {
    val pos = positions(keyCol)
    storeDf
      .select(col(partCol).as("p"),
        explode(array(pos.map(_.cast("int")): _*)).as("bitpos"))
      .select(col("p"), (col("bitpos") / 64).cast("int").as("word"),
        expr("shiftleft(1L, bitpos % 64)").as("mask"))
      .groupBy("p", "word")
      .agg(bit_or(col("mask")).as("bits"))
      .write.mode("overwrite").parquet(sidecarPath)
  }

  /** Partitions that MAY contain at least one of `keys`: for each key all
    * K bits must be set. The sidecar is partitions·Words rows — collected
    * (bounded by the partition count, the store's own listing scale).
    */
  def candidatePartitions(spark: SparkSession, sidecarPath: String,
                          keys: Seq[Any]): Seq[Any] = {
    import spark.implicits._
    val sidecar = spark.read.parquet(sidecarPath)
    val probes = keys.map(k => k.toString).toDF("key")
    val pos = positions("key")
    val probeBits = probes
      .select(col("key"), explode(array(pos: _*)).as("bitpos"))
      .select(col("key"), (col("bitpos") / 64).cast("int").as("word"),
        expr("shiftleft(1L, bitpos % 64)").as("mask"))
    probeBits.join(sidecar, "word")
      .filter((col("bits").bitwiseAND(col("mask"))) === col("mask"))
      .groupBy("p", "key")
      .agg(count(lit(1)).cast("int").as("hits"))
      .filter(col("hits") === K)
      .select("p").distinct()
      .collect().map(_.get(0)).toSeq
  }

  /** Point lookup: prune partitions via the sidecar, then scan only the
    * survivors with an exact key filter. Returns (result, partitions
    * scanned) — the caller can assert scanned ≪ total.
    */
  def lookup(spark: SparkSession, storePath: String, sidecarPath: String,
             partCol: String, keyCol: String,
             keys: Seq[Any]): (DataFrame, Long) = {
    val cand = candidatePartitions(spark, sidecarPath, keys)
    val scan = spark.read.parquet(storePath)
      .filter(col(partCol).cast("string")
        .isin(cand.map(_.toString): _*))
      .filter(col(keyCol).isin(keys: _*))
    (scan, cand.length.toLong)
  }
}
