package graft

import org.apache.spark.sql.functions._

object Round12Spec {
  /** All messages down a throwable's cause chain (Spark wraps raise_error
    * differently across execution paths). */
  def msgs(t: Throwable): Seq[String] =
    Option(t).toSeq.flatMap(x =>
      Option(x.getMessage).toSeq ++ msgs(x.getCause))
}

/** Round-12 regressions: loud exact-arithmetic bounds, store contracts on
  * degenerate batches, NULLS-LAST survivorship ties, capped BPE vocab
  * collect, and the Verify canonical-CSV diff aid. */
class Round12Spec extends SparkSpec {

  test("Contingency.chiSquare guard: n past the 1e8 exact-arithmetic " +
      "bound raises instead of silently NULL-overflowing") {
    val s = spark
    import s.implicits._
    // pre-aggregated cells keep the test cheap: n = 1.2e8 >= 1e8
    val cells = Seq(("x", "p", 60000000L), ("y", "q", 60000000L))
      .toDF("a", "b", "o")
    val e = intercept[Exception] {
      graft.data.Contingency.chiSquareFromCellsGrouped(cells, Nil).collect()
    }
    assert(Round12Spec.msgs(e).exists(_.contains("exact-arithmetic bound")))
  }

  test("Contingency.anovaOneWay: floor-division SSB underflow clamps to " +
      "zero (two identical groups => true SSB = 0)") {
    val s = spark
    import s.implicits._
    // each group {0,1}: t0 = floor(1/2) = 0; corr = floor(4/4) = 1 =>
    // raw ssb = -1, which the clamp must report as 0 (not a negative SS)
    val df = Seq(("a", 0L), ("a", 1L), ("b", 0L), ("b", 1L)).toDF("g", "v")
    val got = graft.data.Contingency.anovaOneWay(df, "g", "v")
      .collect().head
    assert(got.getAs[Long]("ssb") === 0L)
    assert(got.getAs[Long]("ssw") === 2L)
    assert(got.getAs[Long]("eta_sq_q9") === 0L)
  }

  test("GramStore.appendBatch: NULL vectors count into NEITHER the " +
      "moments nor n - store fit == scan fit on a null-bearing batch") {
    val s = spark
    import s.implicits._
    val clean = Seq(
      (0L, Array(1.0f, 2.0f)), (1L, Array(2.0f, 0.5f)),
      (2L, Array(0.25f, 1.5f)))
    val withNull = clean.map { case (id, v) => (id, Option(v)) } :+
      (3L, Option.empty[Array[Float]])
    val dirty = withNull.toDF("vec_id", "vec")
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_t_gramnull_" +
      s.sparkContext.applicationId + "_" + java.util.UUID.randomUUID()
    graft.ann.GramStore.appendBatch(dirty, "vec", 0L, path,
      overwrite = true)
    val (gram, sums, n) = graft.ann.GramStore.mergedMoments(s, path)
    assert(n === 3L, "null vector must not inflate the count row")
    val mStore = graft.ann.GramStore.fitPca(s, path, 2)
    val mScan = graft.ann.Pca.fit(clean.toDF("vec_id", "vec"), "vec", 2)
    assert(mStore.n === mScan.n && mStore.d === mScan.d)
    assert(java.util.Arrays.equals(mStore.eigenvalues, mScan.eigenvalues))
    assert(java.util.Arrays.equals(mStore.meanU, mScan.meanU))
    assert(gram.nonEmpty && sums.nonEmpty)
  }

  test("GramStore.mergedMoments: a merged cell past 2^63 raises loudly " +
      "instead of wrapping/nulling on the BIGINT downcast") {
    val s = spark
    import s.implicits._
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_t_gramovf_" +
      s.sparkContext.applicationId + "_" + java.util.UUID.randomUUID()
    // two stored partials whose sum exceeds Long.MaxValue
    Seq((0, 0, Long.MaxValue, 0L), (0, 0, Long.MaxValue, 1L),
      (-1, -1, 2L, 0L))
      .toDF("i", "j", "v", "batch")
      .write.partitionBy("batch").parquet(path)
    val e = intercept[Exception] {
      graft.ann.GramStore.mergedMoments(s, path)
    }
    assert(Round12Spec.msgs(e).exists(_.contains("overflows BIGINT")))
  }

  test("Survivorship Mode: NULL loses frequency ties (NULLS LAST) but " +
      "still wins when strictly more frequent") {
    val s = spark
    import s.implicits._
    import graft.data.Survivorship._
    val recs = Seq(
      // entity 1: null x2 vs "a" x2 -> tie; NULLS LAST => "a"
      (1L, Option.empty[String]), (1L, None), (1L, Some("a")),
      (1L, Some("a")),
      // entity 2: null x2 vs "b" x1 -> null strictly more frequent
      (2L, None), (2L, None), (2L, Some("b")))
      .toDF("k", "cat")
    val got = goldenRecord(recs, Seq("k"), Seq(Mode("cat")))
      .orderBy("k").select("k", "cat").collect()
    assert(got(0).getString(1) === "a", "tie must fall to the real value")
    assert(got(1).isNullAt(1), "strict majority NULL stays the mode")
  }

  test("Bpe.wordFrequencies: minCount drops the tail, maxVocab truncates " +
      "under the (count desc, word asc) total order") {
    val s = spark
    import s.implicits._
    val docs = Seq("b b b a a c", "a d", "e").toDF("text")
    // full spectrum: a3 b3 c1 d1 e1
    val all = graft.functions.Bpe.wordFrequencies(docs, "text")
    assert(all === Seq(("a", 3L), ("b", 3L), ("c", 1L), ("d", 1L),
      ("e", 1L)))
    assert(graft.functions.Bpe.wordFrequencies(docs, "text",
      minCount = 2L) === Seq(("a", 3L), ("b", 3L)))
    assert(graft.functions.Bpe.wordFrequencies(docs, "text",
      maxVocab = 3) === Seq(("a", 3L), ("b", 3L), ("c", 1L)),
      "cap keeps the first 3 of the total order")
  }

  test("Verify.dumpCanonicalCsv: columns sorted by name, rows sorted by " +
      "all columns - the driver's canonical compare form") {
    val s = spark
    import s.implicits._
    val df = Seq((2L, "x"), (1L, "y"), (1L, "a")).toDF("zz", "aa")
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_t_dump_" +
      s.sparkContext.applicationId + "_" + java.util.UUID.randomUUID()
    Verify.dumpCanonicalCsv(df, path)
    val lines = s.read.text(path).collect().map(_.getString(0)).toSeq
    assert(lines.head === "aa,zz", "header must be name-sorted")
    assert(lines.tail === Seq("a,1", "x,2", "y,1"),
      "rows must be value-sorted in canonical column order")
    // and the env/prop gate stays off by default
    assert(!Verify.dumpWanted)
    System.setProperty("graft.dump.csv", "1")
    try assert(Verify.dumpWanted)
    finally System.clearProperty("graft.dump.csv")
  }
}
