package graft

import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, QueryExecution, SparkPlan}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

import graft.data.Dedup

/** Round-15 regressions: the ledger scan-once discipline (the r14 judge's
  * q379 recompute finding — the delta text must be scanned exactly once
  * per ledger invocation, with probe, verify and both appends all reading
  * the frozen signed frame).
  */
class Round15Spec extends SparkSpec {
  import spark.implicits._

  /** Runs `body`, capturing every QueryExecution the session completes
    * (including the localCheckpoint materialization, which goes through
    * Dataset.withAction), and returns the captured (name, plan) list.
    * The listener bus is async; quiescence is detected by polling. */
  private def capturedPlans(body: => Unit): Seq[(String, SparkPlan)] = {
    val seen = new ConcurrentLinkedQueue[(String, SparkPlan)]()
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
                             durationNs: Long): Unit =
        seen.add((funcName, qe.executedPlan))
      override def onFailure(funcName: String, qe: QueryExecution,
                             exception: Exception): Unit =
        seen.add((funcName, qe.executedPlan))
    }
    spark.listenerManager.register(listener)
    try {
      body
      // drain the async listener bus: stable count over 3 consecutive polls
      var last = -1
      var stable = 0
      var rounds = 0
      while (stable < 3 && rounds < 100) {
        Thread.sleep(100)
        val n = seen.size
        if (n == last) stable += 1 else { stable = 0; last = n }
        rounds += 1
      }
    } finally spark.listenerManager.unregister(listener)
    seen.asScala.toSeq
  }

  private def deltaScans(plans: Seq[(String, SparkPlan)],
                         pathTag: String): Seq[(String, SparkPlan)] =
    plans.filter { case (_, plan) =>
      plan.collect {
        case f: FileSourceScanExec
          if f.relation.location.rootPaths.exists(_.toString.contains(pathTag))
          => f
      }.nonEmpty
    }

  private def writeDelta(rows: Seq[(Long, String)], tag: String): (String, DataFrame) = {
    val path = s"${System.getProperty("java.io.tmpdir")}/$tag"
    graft.operators.FsUtil.deleteRecursively(new java.io.File(path))
    rows.toDF("doc_id", "text").write.mode("overwrite").parquet(path)
    (path, spark.read.parquet(path))
  }

  test("minHashLedger scan-once: the delta parquet is scanned by exactly " +
      "one completed execution per ledger call — the localCheckpoint " +
      "freeze; probe, verify and both appends read the frozen frame") {
    val (basePath, base) = writeDelta(Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight")), "graft_r15_mh_base")
    val (dPath, delta) = writeDelta(Seq(
      (11L, "alpha beta gamma delta epsilon zeta eta theta"),
      (12L, "unrelated words entirely fresh content here now")),
      "graft_r15_mh_delta")
    val ledger = s"${System.getProperty("java.io.tmpdir")}/graft_r15_mh_ledger"
    graft.operators.FsUtil.deleteRecursively(new java.io.File(ledger))

    // first ingest (no prior ledger): still exactly one scan of the base
    val plansA = capturedPlans {
      Dedup.minHashLedger(base, ledger, k = 3, numHashes = 32,
        rowsPerBand = 4, threshold = 0.3)
    }
    val baseScans = deltaScans(plansA, "graft_r15_mh_base")
    assert(baseScans.size === 1,
      s"first ingest must scan the delta once, saw ${baseScans.size}: " +
        baseScans.map(_._1).mkString(", "))

    // second ingest (probe + verify + two appends): STILL exactly one scan
    val plansB = capturedPlans {
      val pairs = Dedup.minHashLedger(delta, ledger, k = 3, numHashes = 32,
        rowsPerBand = 4, threshold = 0.3)
      assert(pairs.filter(col("id_new") === 11L && col("id_old") === 1L)
        .count() === 1L, "twin pair must surface from the ledger probe")
    }
    val dScans = deltaScans(plansB, "graft_r15_mh_delta")
    assert(dScans.size === 1,
      s"probe+append must scan the delta once, saw ${dScans.size}: " +
        dScans.map(_._1).mkString(", "))
    Seq(basePath, dPath, ledger).foreach(p =>
      graft.operators.FsUtil.deleteRecursively(new java.io.File(p)))
  }

  test("simHashLedger scan-once: one delta scan per ledger call") {
    val (basePath, base) = writeDelta(Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight")), "graft_r15_sh_base")
    val (dPath, delta) = writeDelta(Seq(
      (21L, "alpha beta gamma delta epsilon zeta eta theta")),
      "graft_r15_sh_delta")
    val ledger = s"${System.getProperty("java.io.tmpdir")}/graft_r15_sh_ledger"
    graft.operators.FsUtil.deleteRecursively(new java.io.File(ledger))
    val plansA = capturedPlans {
      Dedup.simHashLedger(base, ledger, maxHamming = 3)
    }
    assert(deltaScans(plansA, "graft_r15_sh_base").size === 1)
    val plansB = capturedPlans {
      val pairs = Dedup.simHashLedger(delta, ledger, maxHamming = 3)
      assert(pairs.filter(col("id_new") === 21L && col("id_old") === 1L &&
        col("hamming") === 0).count() === 1L)
    }
    val dScans = deltaScans(plansB, "graft_r15_sh_delta")
    assert(dScans.size === 1,
      s"probe+append must scan the delta once, saw ${dScans.size}: " +
        dScans.map(_._1).mkString(", "))
    Seq(basePath, dPath, ledger).foreach(p =>
      graft.operators.FsUtil.deleteRecursively(new java.io.File(p)))
  }

  test("ledger compaction: probe bit-identical pre/post, one data file " +
      "per non-empty bucket partition, file count strictly reduced") {
    val a = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight")).toDF("doc_id", "text")
    // second ingest: same texts (identical band keys -> same bucket dirs)
    // and ids colliding mod 64 (same sbucket dirs) so every touched
    // partition directory holds files from BOTH ingests
    val b = Seq(
      (65L, "alpha beta gamma delta epsilon zeta eta theta"),
      (66L, "one two three four five six seven eight")).toDF("doc_id", "text")
    val probe = Seq(
      (11L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val ledger = s"${System.getProperty("java.io.tmpdir")}/graft_r15_compact"
    graft.operators.FsUtil.deleteRecursively(new java.io.File(ledger))
    Dedup.minHashLedger(a, ledger, k = 3, numHashes = 32, rowsPerBand = 4,
      threshold = 0.3)
    Dedup.minHashLedger(b, ledger, k = 3, numHashes = 32, rowsPerBand = 4,
      threshold = 0.3)
    val pre = Dedup.minHashLedgerPairs(probe, ledger, k = 3, numHashes = 32,
      rowsPerBand = 4, threshold = 0.3).localCheckpoint()
    val (bb, ba, sb, sa) = Dedup.compactMinHashLedger(spark, ledger)
    val post = Dedup.minHashLedgerPairs(probe, ledger, k = 3, numHashes = 32,
      rowsPerBand = 4, threshold = 0.3).localCheckpoint()
    assert(pre.exceptAll(post).isEmpty && post.exceptAll(pre).isEmpty,
      "compaction must not change any probe result")
    assert(pre.count() >= 2, "both probe docs find their ledger twin")
    val nBandBuckets = spark.read.parquet(s"$ledger/bands")
      .select("bucket").distinct().count()
    val nSigBuckets = spark.read.parquet(s"$ledger/sigs")
      .select("sbucket").distinct().count()
    assert(ba === nBandBuckets, s"one bands file per non-empty bucket: $ba")
    assert(sa === nSigBuckets, s"one sigs file per non-empty bucket: $sa")
    assert(ba < bb && sa < sb, s"files reduced: bands $bb->$ba, sigs $sb->$sa")
    graft.operators.FsUtil.deleteRecursively(new java.io.File(ledger))
  }

  test("scoreDocs hand values: observed pair at kn_q9, unseen pair " +
      "through the quantized backoff, OOV pair skipped but counted, " +
      "pairless doc preserved with zero counts") {
    import graft.functions.LmKneserNey
    // fit corpus: bigrams (a,b),(b,c),(b,a) each once; all words in vocab
    // λ(a)=0.75e9, λ(b)=0.75e9, pcont(any)=1e9 div 3=333333333
    // kn(a,b) = 250000000 + 750000000*333333333 div 1e9 = 499999999
    val fit = Seq((1L, "a b c"), (2L, "b a")).toDF("doc_id", "text")
    val table = LmKneserNey.bigramTable(fit, "text", vocabTopK = 100)
    val out = LmKneserNey.scoreDocs(
      Seq((10L, "a c"), (11L, "c a"), (12L, "a b"), (13L, "solo"))
        .toDF("doc_id", "text"),
      table, "text", "doc_id")
      .orderBy("doc_id").collect()
    def lp9(p: Long): Double =
      BigDecimal(math.log(p.toDouble / 1e9))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    // doc 10 "a c": zero OBSERVED bigrams, still scores via backoff
    // p = λ(a)·pcont(c) div 1e9 = 750000000*333333333 div 1e9 = 249999999
    val r10 = out(0)
    assert(r10.getLong(1) === 1L && r10.getLong(2) === 1L &&
      r10.getLong(3) === 0L)
    assert(r10.getDouble(4) === lp9(249999999L))
    // doc 11 "c a": c never appears as a w1 -> no λ -> OOV, no score
    val r11 = out(1)
    assert(r11.getLong(1) === 1L && r11.getLong(2) === 0L &&
      r11.getLong(3) === 1L)
    assert(r11.isNullAt(4) && r11.isNullAt(5))
    // doc 12 "a b": observed pair priced at kn_q9 = 499999999
    val r12 = out(2)
    assert(r12.getLong(2) === 1L && r12.getDouble(4) === lp9(499999999L))
    assert(r12.getDouble(5) === lp9(499999999L))
    // doc 13 single token: no pairs, preserved
    val r13 = out(3)
    assert(r13.getLong(1) === 0L && r13.getLong(2) === 0L &&
      r13.getLong(3) === 0L && r13.isNullAt(4))
  }

  test("dbscanCosineClustered with nLists = 1 is bit-identical to the " +
      "broadcast-kernel dbscanCosine (one list = the exact pair list)") {
    import graft.ann.Knn
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val exact = Knn.dbscanCosine(emb, minCosine = 0.35, minPts = 3)
    val one = Knn.dbscanCosineClustered(emb, minCosine = 0.35, minPts = 3,
      nLists = 1, seed = 7L, maxIter = 5)
    assert(exact.exceptAll(one).isEmpty && one.exceptAll(exact).isEmpty,
      "nLists=1 must reproduce the exact DBSCAN labels")
    assert(exact.count() === emb.count())
  }

  test("k-truss fixpoint: the bounded form under-peels a deep cascade, " +
      "peelToFixpoint converges (and raises on an exhausted maxRounds)") {
    import graft.operators.Truss
    // triangle strip T(1,2,3) T(2,3,4) T(3,4,5) T(4,5,6): at k=4 every
    // rung edge has support 1 and drops in round 1, which orphans the
    // spine (2,3),(3,4),(4,5) — a second round is needed to empty it
    val strip = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L),
      (3L, 5L), (4L, 5L), (4L, 6L), (5L, 6L)).toDF("src", "dst")
    val bounded = Truss.peel(strip, "src", "dst", k = 4, rounds = 1)
    assert(bounded.count() === 3L,
      "one bounded round must leave the orphaned spine (under-peel)")
    val fixed = Truss.peelToFixpoint(strip, "src", "dst", k = 4)
    assert(fixed.count() === 0L, "the fixpoint empties the strip")
    // a genuine 4-truss (K4) survives the fixpoint intact
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L)).toDF("src", "dst")
    val kept = Truss.peelToFixpoint(k4, "src", "dst", k = 4)
    assert(kept.count() === 6L &&
      kept.agg(min("support")).head().getLong(0) === 2L)
    // exhausted maxRounds raises loudly instead of under-peeling
    val ex = intercept[IllegalArgumentException] {
      Truss.peelToFixpoint(strip, "src", "dst", k = 4, maxRounds = 1)
    }
    assert(ex.getMessage.contains("did not converge"))
  }

  test("LmStore: KN table refit from merged batch counts is bit-identical " +
      "to the from-scan fit; a retried append double-counts (the declared " +
      "at-least-once contract)") {
    import graft.data.LmStore
    import graft.functions.LmKneserNey
    val docs = Seq((1L, "a b c a b"), (2L, "b a c"), (3L, "c c a b a"))
      .toDF("doc_id", "text")
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_r15_lmstore"
    graft.operators.FsUtil.deleteRecursively(new java.io.File(path))
    LmStore.appendBatch(docs.filter(col("doc_id") <= 1), "text", path,
      overwrite = true)
    LmStore.appendBatch(docs.filter(col("doc_id") > 1), "text", path)
    val fromStore = LmStore.fitKn(spark, path, vocabTopK = 100)
    val fromScan = LmKneserNey.bigramTable(docs, "text", vocabTopK = 100)
    assert(fromStore.exceptAll(fromScan).isEmpty &&
      fromScan.exceptAll(fromStore).isEmpty,
      "store refit must equal the from-scan table bit-for-bit")
    // retried append: counts double (at-least-once, documented loudly)
    val before = LmStore.mergedBigrams(spark, path)
      .agg(sum("c_bigram")).head().getLong(0)
    LmStore.appendBatch(docs.filter(col("doc_id") > 1), "text", path)
    val after = LmStore.mergedBigrams(spark, path)
      .agg(sum("c_bigram")).head().getLong(0)
    val batch2Mass = LmKneserNey.bigramCounts(
      docs.filter(col("doc_id") > 1), "text")
      .agg(sum("c_bigram")).head().getLong(0)
    assert(after === before + batch2Mass)
    graft.operators.FsUtil.deleteRecursively(new java.io.File(path))
  }

  test("LmStore trigram refit: fitKnTrigram from merged batch counts is " +
      "bit-identical to the from-scan trigramTable") {
    import graft.data.LmStore
    import graft.functions.LmKneserNey
    val docs = Seq((1L, "a b c a b d"), (2L, "b c a b"), (3L, "c a b c a"))
      .toDF("doc_id", "text")
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_r15_lmstore3"
    graft.operators.FsUtil.deleteRecursively(new java.io.File(path))
    LmStore.appendBatch(docs.filter(col("doc_id") <= 1), "text", path,
      overwrite = true)
    LmStore.appendBatch(docs.filter(col("doc_id") > 1), "text", path)
    val fromStore = LmStore.fitKnTrigram(spark, path, vocabTopK = 100)
    val fromScan = LmKneserNey.trigramTable(docs, "text", vocabTopK = 100)
    assert(fromStore.exceptAll(fromScan).isEmpty &&
      fromScan.exceptAll(fromStore).isEmpty)
    assert(fromScan.count() > 0)
    graft.operators.FsUtil.deleteRecursively(new java.io.File(path))
  }

  test("charEntropy hand values: 'aabb' gives ln 2 via two quantized " +
      "-0.346573590 terms; a constant string gives 0; a null text drops") {
    val out = graft.queries.TextQueries.charEntropy(
      Seq((1L, "aabb"), (2L, "xxxx"), (3L, null))
        .toDF("doc_id", "text"), "text", "doc_id")
      .orderBy("doc_id").collect()
    assert(out.length === 2)
    assert(out(0).getLong(1) === 4L && out(0).getLong(2) === 2L)
    // 0.5*ln(0.5) = -0.34657359027... -> -0.346573590 each, x2
    assert(out(0).getDouble(3) === 0.693147180)
    assert(out(1).getLong(2) === 1L && out(1).getDouble(3) === 0.0)
  }

  test("trigram KN hand values: 'a b c a b d' reproduces every quantized " +
      "piece and both interpolation replays") {
    import graft.functions.LmKneserNey
    // tc: (a,b,c) (b,c,a) (c,a,b) (a,b,d), each once
    // ctx(a,b) = (2, 2); cont(b,c)=1; mid(b)=(2,2); uni(c)=1; total=4
    // t1 = (4-3)e9 div 8 = 125e6; lam3 = 3*2e9 div 8 = 750e6
    // t2 = (4-3)e9 div 8 = 125e6; lam2 = 750e6; p1 = e9 div 4 = 250e6
    // p2 = 125e6 + 750e6*250e6 div 1e9 = 312500000
    // kn3 = 125e6 + 750e6*312.5e6 div 1e9 = 359375000
    val docs = Seq((1L, "a b c a b d")).toDF("doc_id", "text")
    val row = LmKneserNey.trigramTable(docs, "text", vocabTopK = 100)
      .filter(col("w1") === "a" && col("w2") === "b" && col("w3") === "c")
      .head()
    assert(row.getAs[Long]("c_trigram") === 1L)
    assert(row.getAs[Long]("c_ctx") === 2L)
    assert(row.getAs[Long]("n_follow_ctx") === 2L)
    assert(row.getAs[Long]("n1p_cont") === 1L)
    assert(row.getAs[Long]("n1p_mid") === 2L)
    assert(row.getAs[Long]("n_follow_mid") === 2L)
    assert(row.getAs[Long]("n1p_uni") === 1L)
    assert(row.getAs[Long]("t1_q9") === 125000000L)
    assert(row.getAs[Long]("lam3_q9") === 750000000L)
    assert(row.getAs[Long]("t2_q9") === 125000000L)
    assert(row.getAs[Long]("lam2_q9") === 750000000L)
    assert(row.getAs[Long]("p1_q9") === 250000000L)
    assert(row.getAs[Long]("p2_q9") === 312500000L)
    assert(row.getAs[Long]("kn3_q9") === 359375000L)
  }

  test("scoreDocsTrigram cascade hand values: observed kn3, context " +
      "backoff λ3·p2, zero-context rule p2, double backoff λ3·(λ2·p1), " +
      "OOV skipped") {
    import graft.functions.LmKneserNey
    val fit = Seq((1L, "a b c a b d")).toDF("doc_id", "text")
    val table = LmKneserNey.trigramTable(fit, "text", vocabTopK = 100)
    val out = LmKneserNey.scoreDocsTrigram(
      Seq((10L, "a b c"),   // observed: kn3(a,b,c) = 359375000
          (11L, "c a d"),   // ctx (c,a) observed, (a,d) unseen:
                            // λ3(c,a)=750e6, λ2(a)=750e6, p1(d)=250e6
                            // p2e = 187500000 -> p = 140625000
          (12L, "x b c"),   // ctx (x,b) unobserved, (b,c) observed:
                            // p = p2(b,c) = 312500000
          (13L, "x y z"))   // fully OOV triple
        .toDF("doc_id", "text"),
      table, "text", "doc_id").orderBy("doc_id").collect()
    def lp9(p: Long): Double =
      BigDecimal(math.log(p.toDouble / 1e9))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(0).getDouble(4) === lp9(359375000L))
    assert(out(1).getDouble(4) === lp9(140625000L))
    assert(out(2).getDouble(4) === lp9(312500000L))
    assert(out(3).getLong(2) === 0L && out(3).getLong(3) === 1L &&
      out(3).isNullAt(4))
  }
}
