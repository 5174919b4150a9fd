package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming SimHash near-duplicate flagging — the streaming sibling of
  * [[graft.data.Dedup.simHashPairs]] (the streaming exact dedup is q61's
  * state-store `dropDuplicates`; this catches NEAR-duplicates arriving over
  * time, e.g. re-crawls with boilerplate edits).
  *
  * Shape: the map side computes the codegen'd 64-bit simhash and melts it
  * into its four 16-bit chunk keys (any pair at hamming <= 3 shares at least
  * one chunk — the batch operator's bucketing, reused verbatim, same kernel
  * expression). State lives per CHUNK BUCKET: a primitive `Array[Long]` of
  * the fingerprints seen in that bucket, so a new doc compares against
  * bucket-mates only — never the corpus — and the 16-bit keyspace bounds
  * mean bucket occupancy at ~n/65536 per chunk position. Each doc emits one
  * verdict per chunk; the per-doc `is_dup = max(matched)` reduce runs on the
  * sink side (a stateful-op -> append-sink -> batch-reduce chain, standard
  * Structured Streaming layering).
  *
  * Determinism contract: within a micro-batch each bucket processes its rows
  * in ascending id order, so a single availableNow batch reproduces the batch
  * operator's id-ordered star semantics exactly — a doc is flagged iff some
  * SMALLER-id doc shares a chunk at hamming <= maxHamming (q80 verifies the
  * equivalence in-query). Across micro-batches the order is arrival order,
  * the same contract as the streaming exact dedup.
  */
object StreamingNearDup {

  /** One verdict row per (doc, chunk): (doc id, matched an earlier
    * bucket-mate at hamming <= maxHamming).
    *
    * `maxPerBucket` bounds the per-bucket state for unbounded streams: after
    * each batch only the most recent `maxPerBucket` fingerprints survive
    * (FIFO eviction), turning the operator into a SLIDING near-dup window —
    * total state is then <= 4 * maxPerBucket * 8 bytes per occupied bucket,
    * a hard bound independent of stream length. The default keeps
    * everything (exact against the whole history, the batch-parity mode
    * q80 verifies).
    */
  def flagNearDups(docs: DataFrame, textCol: String, idCol: String,
                   maxHamming: Int = 3,
                   maxPerBucket: Int = Int.MaxValue): Dataset[(Long, Boolean)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val sigs = docs.select(col(idCol).cast("long").as("id"),
        graft.functions.ShingleExprs.simhash64(col(textCol)).as("sig"))
      .filter(col("sig").isNotNull)
    val chunkKeys = (0 until 4).map { c =>
      shiftright(col("sig"), c * 16).bitwiseAND(lit(0xffffL))
    }
    val melted = sigs
      .select(col("id"), col("sig"),
        posexplode(array(chunkKeys: _*)).as(Seq("chunk_idx", "ck")))
      // bucket identity = (chunk position, chunk value) packed into one long
      .select((col("chunk_idx").cast("long") * 65536L + col("ck")).as("bucket"),
        col("id"), col("sig"))
      .as[(Long, Long, Long)]

    melted.groupByKey(_._1)
      .flatMapGroupsWithState[Array[Long], (Long, Boolean)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (_, rows, state) =>
          val seen = if (state.exists) state.get else Array.empty[Long]
          // ascending id order within the batch (see determinism contract)
          val batch = rows.map(r => (r._2, r._3)).toArray
          java.util.Arrays.sort(batch, Ordering.by((p: (Long, Long)) => p._1))
          val buf = java.util.Arrays.copyOf(seen, seen.length + batch.length)
          var n = seen.length
          val out = new Array[(Long, Boolean)](batch.length)
          var i = 0
          while (i < batch.length) {
            val (id, sig) = batch(i)
            var matched = false
            var j = 0
            while (!matched && j < n) {
              matched = java.lang.Long.bitCount(buf(j) ^ sig) <= maxHamming
              j += 1
            }
            out(i) = (id, matched)
            buf(n) = sig
            n += 1
            i += 1
          }
          state.update(
            if (n <= maxPerBucket) buf
            else java.util.Arrays.copyOfRange(buf, n - maxPerBucket, n))
          out.iterator
      }
  }
}
