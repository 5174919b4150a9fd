package graft.functions

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.collection.mutable

/** Byte-pair encoding: the CountVectorizer-shaped split of a tokenizer —
  * **fit on the driver over the word-frequency table** (vocabulary-sized,
  * the same boundedness contract as q77's vocab fit: the corpus collapses
  * to distinct words + counts in one hash agg before anything leaves the
  * cluster), **apply distributed** (merge ranks broadcast; per-partition
  * memoized greedy encoding — repeated words encode once per partition).
  *
  * Determinism: merge selection is (max pair count, then lexicographically
  * smallest pair) — a TOTAL order, so the learned merge list is unique for
  * a given corpus; encoding applies the lowest-rank present pair
  * left-to-right, the standard greedy BPE apply. No end-of-word marker
  * (word-internal merges only — documented divergence from the GPT-2
  * variant, irrelevant to the roundtrip/compression contracts).
  */
object Bpe {

  final case class Model(merges: Seq[(String, String)]) {
    @transient lazy val ranks: Map[(String, String), Int] =
      merges.zipWithIndex.toMap

    /** Greedy encode: repeatedly merge the lowest-rank adjacent pair. */
    def encodeWord(w: String): List[String] = {
      var parts: List[String] = w.map(_.toString).toList
      var done = parts.lengthCompare(2) < 0
      while (!done) {
        var best = Int.MaxValue
        parts.zip(parts.tail).foreach { p =>
          val r = ranks.getOrElse(p, Int.MaxValue)
          if (r < best) best = r
        }
        if (best == Int.MaxValue) done = true
        else {
          val (l, r) = merges(best)
          val out = mutable.ListBuffer.empty[String]
          var rest = parts
          while (rest.nonEmpty) rest match {
            case a :: b :: tl if a == l && b == r =>
              out += (a + b); rest = tl
            case a :: tl => out += a; rest = tl
            case Nil => ()
          }
          parts = out.toList
          done = parts.lengthCompare(2) < 0
        }
      }
      parts
    }
  }

  /** Learn `nMerges` merges from (word, frequency) pairs. Driver-side by
    * design — the input is the already-collapsed vocabulary, never rows.
    */
  def fit(wordFreq: Seq[(String, Long)], nMerges: Int): Model = {
    var words: Seq[(List[String], Long)] =
      wordFreq.map { case (w, f) => (w.map(_.toString).toList, f) }
    val merges = mutable.ListBuffer.empty[(String, String)]
    var i = 0
    var exhausted = false
    while (i < nMerges && !exhausted) {
      val counts = mutable.Map.empty[(String, String), Long]
      words.foreach { case (parts, f) =>
        parts.zip(parts.tail).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + f
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        // total order: count desc, then pair asc — unique winner
        val best = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }._1
        merges += best
        words = words.map { case (parts, f) =>
          val out = mutable.ListBuffer.empty[String]
          var rest = parts
          while (rest.nonEmpty) rest match {
            case a :: b :: tl if a == best._1 && b == best._2 =>
              out += (a + b); rest = tl
            case a :: tl => out += a; rest = tl
            case Nil => ()
          }
          (out.toList, f)
        }
        i += 1
      }
    }
    Model(merges.toList)
  }

  /** Distributed corpus collapse for [[fit]]: distinct whitespace words +
    * counts (ONE hash agg). The collect is CAPPED — `minCount` drops the
    * hapax tail in the cluster and `maxVocab` bounds the driver transfer
    * via TakeOrdered (per-partition top-k + driver merge under the total
    * (count desc, word asc) order), so a 100 TB corpus with an unbounded
    * distinct-word spectrum can never flood the driver. Merge learning on
    * the (deterministically) truncated vocabulary is standard BPE
    * practice — rare words contribute no competitive pair counts.
    */
  def wordFrequencies(df: DataFrame, textCol: String,
                      minCount: Long = 1L,
                      maxVocab: Int = 1 << 20): Seq[(String, Long)] =
    df.select(explode(split(trim(col(textCol)), "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("f"))
      .filter(col("f") >= minCount)
      .orderBy(col("f").desc, col("w").asc)
      .limit(maxVocab)
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (w, f) => (-f, w) }

  /** Distributed apply: per row, encode every whitespace word and emit
    * `idCol, n_words, n_word_chars, n_bpe_tokens, roundtrip_violations`
    * (violations = words whose tokens do not concatenate back — the
    * lossless contract, expected 0). Map-only; ranks ride the closure
    * (vocabulary-sized); per-partition memo so repeated words pay once.
    */
  def encodeStats(df: DataFrame, idCol: String, textCol: String,
                  model: Model): DataFrame = {
    val spark = df.sparkSession
    // ship the merge table ONCE per executor as a broadcast, not once per
    // task in the closure — at 10⁵ merges × 10⁴ tasks that is the
    // difference between megabytes and gigabytes of task-launch traffic
    val bcModel = spark.sparkContext.broadcast(model)
    val out = df.select(col(idCol), col(textCol)).rdd.mapPartitions { it =>
      val m = bcModel.value
      val memo = mutable.Map.empty[String, List[String]]
      it.map { row =>
        val id = row.getLong(0)
        val words = Option(row.getString(1)).getOrElse("").trim
          .split("\\s+").filter(_.nonEmpty)
        var chars = 0L
        var toks = 0L
        var bad = 0L
        words.foreach { w =>
          val enc = memo.getOrElseUpdate(w, m.encodeWord(w))
          chars += w.length
          toks += enc.length
          if (enc.mkString != w) bad += 1
        }
        Row(id, words.length.toLong, chars, toks, bad)
      }
    }
    spark.createDataFrame(out, StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("n_words", LongType, nullable = false),
      StructField("n_word_chars", LongType, nullable = false),
      StructField("n_bpe_tokens", LongType, nullable = false),
      StructField("roundtrip_violations", LongType, nullable = false))))
  }
}
