package graft

import org.apache.spark.sql.functions._

import graft.data.Dedup
import graft.functions.ShingleExprs._

/** Round-4 additions: codegen shingle/minhash kernels and test-set
  * decontamination.
  */
class Round4Spec extends SparkSpec {
  import spark.implicits._

  test("shingle kernel is bit-identical to the declarative HOF form") {
    // edge cases the kernel's tokenizer must mirror exactly:
    // multi-space runs, leading/trailing spaces, fewer-than-k words,
    // exactly-k words, repeated shingles (dedup), empty-ish text
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "  leading and trailing  ",
      "one two",
      "a b c",
      "dup dup dup dup dup dup",
      "x",
      " ",
      "wide   gaps   between   words   here   now").toDF("text")
    val mismatches = texts.select(
        wordShingleHashes(col("text"), 3).as("kernel"),
        transform(Dedup.wordShingles(col("text"), 3), s => xxhash64(s)).as("declarative"))
      .filter(not(col("kernel") === col("declarative")))
      .count()
    assert(mismatches == 0)
  }

  test("minhash kernel equals 32x array_min(transform(xxhash64 mix))") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "another document with different words entirely",
      "short").toDF("text")
    val hs = texts.select(wordShingleHashes(col("text"), 3).as("hsh"))
    val declarative = (0 until 32).map { i =>
      array_min(transform(col("hsh"), h => xxhash64(h, lit(i))))
    }
    val mismatches = hs.select(
        minhashSignature(col("hsh"), 32).as("kernel"),
        array(declarative: _*).as("declarative"))
      .filter(not(col("kernel") === col("declarative")))
      .count()
    assert(mismatches == 0)
  }

  test("decontamination: containment, argmax tie-break, no-overlap rows") {
    val train = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"),   // superset of eval 100
      (1L, "alpha beta gamma delta unrelated tail"), // partial overlap
      (2L, "totally disjoint content right here now"),
      (3L, "alpha beta gamma delta epsilon zeta")    // also superset (= doc 0)
    ).toDF("doc_id", "text")
    val evalDocs = Seq(
      (100L, "alpha beta gamma delta epsilon zeta"),
      (101L, "alpha beta gamma delta epsilon zeta")  // identical: tie on containment
    ).toDF("doc_id", "text")
    val out = Dedup.decontaminate(train, evalDocs, "text", "doc_id",
        k = 3, threshold = 0.5)
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), if (r.isNullAt(2)) -1L else r.getLong(2), r.getBoolean(3))).toMap
    // k=3 shingles of eval: 4 shingles; train 0 contains all 4
    assert(out(0L) == (1.0, 100L, true))  // tie -> smallest eval_id
    assert(out(3L) == (1.0, 100L, true))
    // train 1 shares shingles "alpha beta gamma", "beta gamma delta" = 2/4
    assert(out(1L) == (0.5, 100L, true))
    assert(out(2L) == (0.0, -1L, false))  // no overlap: null eval, kept
    assert(out.size == 4)
  }

  test("decontamination works with non-numeric (hash-string) doc ids") {
    val train = Seq(
      ("sha:aa", "alpha beta gamma delta epsilon zeta"),
      ("sha:bb", "totally disjoint content right here now")
    ).toDF("doc_id", "text")
    val evalDocs = Seq(
      ("ev:zz", "alpha beta gamma delta epsilon zeta"),
      ("ev:aa", "alpha beta gamma delta epsilon zeta")  // tie -> smallest id
    ).toDF("doc_id", "text")
    val out = Dedup.decontaminate(train, evalDocs, "text", "doc_id",
        k = 3, threshold = 0.5)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), Option(r.getString(2)), r.getBoolean(3))).toMap
    assert(out("sha:aa") == (1.0, Some("ev:aa"), true))
    assert(out("sha:bb") == (0.0, None, false))
  }

  test("longSetExcept matches array_except against the same literal set") {
    val hot = Array(3L, 1L, 99L) // unsorted on purpose: API sorts defensively
    val rows = Seq(
      Seq(1L, 2L, 3L, 4L),
      Seq(99L, 99L, 5L),
      Seq.empty[Long]).toDF("xs")
    val mismatches = rows.select(
        longSetExcept(col("xs"), hot).as("kernel"),
        array_except(col("xs"), lit(Array(1L, 3L, 99L))).as("builtin"))
      .filter(not(col("kernel") === col("builtin"))).count()
    // note: array_except also dedups its left side; our rows keep distinct
    // inputs so the comparison is exact
    assert(mismatches == 0)
  }

  test("minhash kernel skips null elements like the declarative form") {
    val hs = Seq(Tuple1(Seq[java.lang.Long](5L, null, 7L))).toDF("hsh")
    val withNulls = hs.select(minhashSignature(col("hsh"), 4).as("kernel"))
      .head().getSeq[Long](0)
    val without = Seq(Tuple1(Seq(5L, 7L))).toDF("hsh")
      .select(minhashSignature(col("hsh"), 4).as("kernel"))
      .head().getSeq[Long](0)
    assert(withNulls == without)
  }

  test("corpus pipeline: disjoint stage labels, stage order, survivors") {
    import graft.data.{CorpusConfig, CorpusPipeline}
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta"),  // kept
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),  // exact dup of 0
      (2L, "alpha beta gamma delta epsilon zeta eta iota"),   // near dup of 0
      (3L, "too short"),                                      // quality (min)
      (4L, "eval match one two three four five six seven"),   // contaminated
      (5L, "completely different content that stays in place")
    ).toDF("doc_id", "text")
    val evalDocs = Seq((100L, "eval match one two three four five six seven"))
      .toDF("doc_id", "text")
    val res = CorpusPipeline.run(docs, CorpusConfig(
      minTokens = 3, maxTokens = 50,
      nearDedupThreshold = Some(0.5), shingleK = 3,
      evalDocs = Some(evalDocs), decontaminationThreshold = 0.9))
    val labels = res.labels.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(labels == Map(
      0L -> "kept", 1L -> "exact_dup", 2L -> "near_dup",
      3L -> "quality", 4L -> "contaminated", 5L -> "kept"))
    assert(res.kept.select("doc_id").collect().map(_.getLong(0)).toSet == Set(0L, 5L))
    val report = res.report.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(report == Map("kept" -> 2L, "exact_dup" -> 1L, "near_dup" -> 1L,
      "quality" -> 1L, "contaminated" -> 1L))
  }

  test("corpus pipeline: optional stages off leave only quality labels") {
    import graft.data.{CorpusConfig, CorpusPipeline}
    val docs = Seq(
      (0L, "a b c d e f"),
      (1L, "a b c d e f"),  // duplicate, but exactDedup off
      (2L, "x")             // quality
    ).toDF("doc_id", "text")
    val res = CorpusPipeline.run(docs, CorpusConfig(
      minTokens = 2, exactDedup = false, nearDedupThreshold = None))
    val labels = res.labels.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(labels == Map(0L -> "kept", 1L -> "kept", 2L -> "quality"))
  }

  test("jaccard postings suppress self-pairs from duplicate ids") {
    // two rows share id 7 with identical text: the old self-join's strict
    // id_a < id_b filter emitted nothing for them — the postings form must too
    val docs = Seq(
      (7L, "alpha beta gamma delta epsilon"),
      (7L, "alpha beta gamma delta epsilon"),
      (9L, "totally different words here now")
    ).toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardPairs(docs, "text", "doc_id",
      k = 3, threshold = 0.1).collect()
    assert(pairs.isEmpty)
  }

  test("corpus pipeline keeps the caller's column order in kept") {
    import graft.data.{CorpusConfig, CorpusPipeline}
    val docs = Seq((0L, "a b c d e", "x")).toDF("doc_id", "text", "extra")
    val res = CorpusPipeline.run(docs, CorpusConfig(minTokens = 1))
    assert(res.kept.columns.toSeq == Seq("doc_id", "text", "extra"))
  }

  test("corpus pipeline repetition bound rejects highly repetitive docs") {
    import graft.data.{CorpusConfig, CorpusPipeline}
    val docs = Seq(
      (0L, "spam spam spam spam spam spam spam spam spam spam"), // dup frac 7/8
      (1L, "eight different words with no repeats at all here")
    ).toDF("doc_id", "text")
    val res = CorpusPipeline.run(docs, CorpusConfig(
      maxDupNgramFrac = Some(0.5), nearDedupThreshold = None, exactDedup = false))
    val labels = res.labels.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(labels == Map(0L -> "quality", 1L -> "kept"))
  }

  test("embeddingNearDup closure resolves chains to a retained root") {
    // unit vectors at 0deg / 40deg / 80deg with threshold cos(45deg):
    // (1,2) and (2,3) are pairs, (1,3) is not — a chain
    def v(deg: Double) = Array(math.cos(math.toRadians(deg)).toFloat,
                               math.sin(math.toRadians(deg)).toFloat)
    val emb = Seq((1L, v(0)), (2L, v(40)), (3L, v(80))).toDF("vec_id", "embedding")
    val single = Dedup.embeddingNearDup(emb, minCosine = 0.7)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(single == Map(1L -> 1L, 2L -> 1L, 3L -> 2L)) // 3's rep is dropped
    val closed = Dedup.embeddingNearDup(emb, minCosine = 0.7, closure = true)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(closed == Map(1L -> (1L, false), 2L -> (1L, true), 3L -> (1L, true)))
  }

  test("decontamination scales down to empty eval corpus") {
    val train = Seq((0L, "some words here")).toDF("doc_id", "text")
    val evalDocs = train.filter(col("doc_id") < 0)
    val out = Dedup.decontaminate(train, evalDocs, "text", "doc_id", k = 3)
      .collect()
    assert(out.length == 1 && out(0).getDouble(1) == 0.0 && !out(0).getBoolean(3))
  }
}
