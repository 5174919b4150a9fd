package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.data.Dedup
import graft.functions.Winnowing
import graft.search.Bm25

/** Round-18 regressions: the four r17 ADVICE fixes — ledger deletes
  * raising on non-castable ids instead of silently no-op'ing, BM25
  * absent-only deletes not arming the tombstone correction path, the
  * signature ledger persisting its bucket-layout parameter, and the
  * widened vacuum-window documentation (covered by the existing vacuum
  * unit; no new behavior).
  */
class Round18Spec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String = {
    val p = s"${System.getProperty("java.io.tmpdir")}/graft_r18_$name"
    graft.operators.FsUtil.deleteRecursively(new java.io.File(p))
    p
  }
  private def rm(p: String): Unit =
    graft.operators.FsUtil.deleteRecursively(new java.io.File(p))
  private def rows(df: DataFrame) = df.collect().map(_.toSeq).toSet

  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")
    .select("doc_id", "text").filter(col("text").isNotNull)

  // ---- strict ids: a GDPR delete must fail loudly, never no-op ------

  test("ledger deletes raise on ids that cast to NULL (minhash, simhash, " +
      "winnowing) — a silent non-deletion is not an acceptable outcome") {
    val p = tmp("strictids")
    try {
      Dedup.minHashLedger(docs, p, k = 5, numHashes = 16, rowsPerBand = 4)
      val bad = Seq("not-a-number").toDF("doc_id")
      val eMin = intercept[Exception] { Dedup.minHashLedgerDelete(bad, p) }
      assert(Option(eMin.getMessage).exists(_.contains("not castable")) ||
        Option(eMin.getCause).exists(c =>
          Option(c.getMessage).exists(_.contains("not castable"))),
        s"unexpected: $eMin")
      val eSim = intercept[Exception] { Dedup.simHashLedgerDelete(bad, p) }
      assert(eSim != null)
      val eWin = intercept[Exception] { Winnowing.ledgerDelete(bad, p) }
      assert(eWin != null)
      // a NULL id is equally undeletable
      val nulls = Seq(Option.empty[java.lang.Long]).toDF("doc_id")
      intercept[Exception] { Dedup.minHashLedgerDelete(nulls, p) }
      // numeric-string ids still work (the cast succeeds row-for-row)
      Dedup.minHashLedgerDelete(Seq("7").toDF("doc_id"), p)
      val tomb = spark.read.parquet(s"$p/tombstones")
      assert(rows(tomb.select("id")) == Set(Seq(7L)),
        "valid numeric-string ids must still tombstone")
    } finally rm(p)
  }

  // ---- BM25: absent-only delete must not arm the correction path ----

  test("bm25 deleteFromIndex of only-absent ids appends nothing — no " +
      "tombstones dir, probes stay on the fast path") {
    val p = tmp("bm25absent")
    try {
      Bm25.writeIndex(docs.limit(50), p, nBuckets = 8)
      Bm25.deleteFromIndex(Seq(999999L, 888888L).toDF("doc_id"), p)
      assert(!new java.io.File(s"$p/tombstones").exists(),
        "an all-absent delete must not create the tombstones dir")
      // a real delete still lands
      val one = docs.limit(1).select("doc_id").as[Long].head()
      Bm25.deleteFromIndex(Seq(one).toDF("doc_id"), p)
      assert(new java.io.File(s"$p/tombstones").exists())
      assert(spark.read.parquet(s"$p/tombstones").count() == 1)
    } finally rm(p)
  }

  // ---- html numeric character references (r17 directive #5) ---------

  private def extractOne(html: String): String =
    graft.preprocess.HtmlText
      .extract(Seq((1L, html)).toDF("id", "html"), "html", "id",
        minLineChars = 1)
      .collect()(0).getAs[String]("text")

  test("html extract: numeric charrefs decode for printable ASCII — " +
      "decimal, hex either case, zero-padded; out-of-range stays literal") {
    assert(extractOne(
      "<p>&#72;&#101;&#x6C;&#X6C;&#111;&#033; &#x7E; &#8212; &#x1F600;</p>")
      == "Hello! ~ &#8212; &#x1F600;")
    // the previously-listed &#39; now rides the numeric tier
    assert(extractOne("<p>&#39;ok&#39;</p>") == "'ok'")
  }

  test("html extract: numeric tier is single-pass and ordered before the " +
      "amp fold — each form unescapes exactly one level") {
    // a decoded '&' never re-combines with following text into an entity
    assert(extractOne("<p>&#38;lt; stays</p>") == "&lt; stays")
    // an amp-escaped ref decodes one level to the literal ref text
    assert(extractOne("<p>&amp;#65; stays</p>") == "&#65; stays")
  }

  // ---- link extraction + reference resolution (crawl discovery) -----

  test("links: hrefs extracts anchors only — link tags, comment and " +
      "script hrefs never leak; both quote styles, order preserved") {
    import graft.functions.Links
    val html = "<a href=\"/a\">1</a><link href=\"/css\">" +
      "<!-- <a href=\"/hidden\">h</a> -->" +
      "<script>var s = '<a href=\"/js\">';</script>" +
      "<A HREF='/b'>2</A><a class=\"z\" href = \"/c\">3</a>"
    val out = Seq(html).toDF("h")
      .select(Links.hrefs(col("h")).as("hs"))
      .collect()(0).getSeq[String](0)
    assert(out == Seq("/a", "/b", "/c"))
  }

  test("links: resolve covers every declared case; dot segments collapse " +
      "at fixed depth and above-root ../ stays literal (declared)") {
    import graft.functions.Links
    val base = "https://ex.com/a/b/c.html"
    def res(r: String): String =
      Seq(r).toDF("r")
        .select(Links.resolve(lit(base), col("r")).as("u"))
        .collect()(0).getAs[String]("u")
    assert(res("") == base && res("#x") == base)
    assert(res("https://o.io/p") == "https://o.io/p")
    assert(res("//cdn.io/p") == "https://cdn.io/p")
    assert(res("/r/s") == "https://ex.com/r/s")
    assert(res("?k=v") == "https://ex.com/a/b/c.html?k=v")
    assert(res("d.html") == "https://ex.com/a/b/d.html")
    assert(res("./d.html") == "https://ex.com/a/b/d.html")
    assert(res("../d.html") == "https://ex.com/a/d.html")
    assert(res("../../d.html") == "https://ex.com/d.html")
    assert(res("../../../d.html") == "https://ex.com/../d.html")
    assert(res("x/../d.html") == "https://ex.com/a/b/d.html")
    assert(res("mailto:x@y.io") == null)
    assert(res("javascript:void(0)") == null)
    assert(res("tel:+123") == null)
  }

  // ---- robots.txt parsing (rule acquisition) ------------------------

  test("robots parse: star-group selection, multi-agent groups, group " +
      "split after rules, comments/CRLF/case, empty Disallow dropped, " +
      "Crawl-delay ignored") {
    import graft.functions.Robots
    val robots = Seq(
      ("a.example",
        "# hi\r\nUser-agent: bot1\nUser-agent: *\r\n" +
          "Crawl-delay: 7\nDISALLOW: /x  # note\nallow: /x/pub\n" +
          "Disallow:\n\nUser-agent: other\nDisallow: /y\n"),
      // the star group here holds ONLY /b: the second UA line follows a
      // rule line, so it opens a NEW group (RFC group semantics)
      ("b.example",
        "User-agent: zbot\nDisallow: /a\nUser-agent: *\nDisallow: /b\n"),
      // no star group at all -> no rules survive
      ("c.example", "User-agent: zbot\nDisallow: /c\n"))
      .toDF("host", "txt")
    val rules = Robots.parseRules(robots, "host", "txt")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getBoolean(2))).toSet
    assert(rules == Set(
      ("a.example", "/x", false),
      ("a.example", "/x/pub", true),
      ("b.example", "/b", false)))
  }

  // ---- streaming crawl cycle restart (r17 directive #3) -------------

  test("streaming seen-URL ledger: a checkpointed restart with no new " +
      "files appends nothing — ledger row count and per-cycle outputs " +
      "are stable across the third run") {
    import org.apache.spark.sql.streaming.Trigger
    val base = tmp("streamcrawl")
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(base, "data"))
    val ledger = s"$base/ledger"
    try {
      val schema = new org.apache.spark.sql.types.StructType()
        .add("doc_id", org.apache.spark.sql.types.LongType)
      def runOnce(): Unit = {
        val q = spark.readStream.schema(schema).parquet(s"$base/data")
          .writeStream
          .foreachBatch { (b: DataFrame, id: Long) =>
            val fr = b.select(
              concat(lit("https://ex/"), col("doc_id").cast("string"))
                .as("canonical_url"),
              lit("crawl").as("source"))
            Dedup.exactIncremental(fr, ledger,
                textCol = "canonical_url", idCol = "source")
              .filter(col("is_new"))
              .write.mode("overwrite").parquet(s"$base/out/b$id")
          }
          .option("checkpointLocation", s"$base/ckpt")
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      (1L to 20L).toDF("doc_id")
        .coalesce(1).write.mode("append").parquet(s"$base/data")
      runOnce()
      assert(spark.read.parquet(ledger).count() == 20)
      (1L to 30L).toDF("doc_id")
        .coalesce(1).write.mode("append").parquet(s"$base/data")
      runOnce()
      assert(spark.read.parquet(ledger).count() == 30,
        "day 2 must append exactly the 10 never-seen urls")
      assert(spark.read.parquet(s"$base/out/b1").count() == 10)
      runOnce() // restart, nothing new
      assert(spark.read.parquet(ledger).count() == 30,
        "a restart with no new files must append nothing")
      val b2 = new java.io.File(s"$base/out/b2")
      assert(!b2.exists() || spark.read.parquet(b2.toString).count() == 0,
        "a restart must not produce a third non-empty cycle")
    } finally rm(base)
  }

  // ---- exact ridge regression (r17 directive #2) --------------------

  test("ridge: hand-computed 3x3 fixture recovers the EXACT Cramer " +
      "rationals — det(A)=35, numerators (50,36,64), weights truncated") {
    import graft.ml.Ridge
    // rows (x1,x2,y) = (2,0,4),(0,2,6) with intercept, lambda=1:
    // A = X'X + I = [[3,2,2],[2,5,0],[2,0,5]], b = [10,8,12]
    val df = Seq((2L, 0L, 4L), (0L, 2L, 6L)).toDF("x1", "x2", "y")
    val m = Ridge.fit(df, Seq(lit(1L), col("x1"), col("x2")), col("y"), 1L)
    assert(m.detA == BigInt(35))
    assert(m.detAi.toSeq == Seq(BigInt(50), BigInt(36), BigInt(64)))
    // 50e6/35 = 1428571.42.., 36e6/35 = 1028571.42.., 64e6/35 = 1828571.42..
    assert(m.wQ6.toSeq == Seq(1428571L, 1028571L, 1828571L))
    val preds = df.withColumn("p",
      Ridge.scoreCol(Seq(lit(1L), col("x1"), col("x2")), m))
      .select("p").as[Long].collect().toSeq
    assert(preds == Seq(1428571L + 2 * 1028571L, 1428571L + 2 * 1828571L))
  }

  test("ridge: a negative weight quantizes by truncation toward zero " +
      "(the BigInt / DuckDB // shared semantics, NOT floor)") {
    import graft.ml.Ridge
    // single feature, no intercept: A = [Σx²+λ] = [8+2] = [10],
    // b = [Σxy] = [-15] → w = -1.5 exactly... use b=-17: w = -1.7
    val df = Seq((2L, -7L), (2L, -1L), (0L, 9L)).toDF("x", "y")
    val m = Ridge.fit(df, Seq(col("x")), col("y"), 2L)
    assert(m.detA == BigInt(10) && m.detAi.toSeq == Seq(BigInt(-16)))
    assert(m.wQ6.toSeq == Seq(-1600000L))
    val m2 = Ridge.fitFromMoments(Map((0, 0) -> BigInt(8)),
      Array(BigInt(-17)), 3L, 2L)
    assert(m2.wQ6.toSeq == Seq(-1700000L))
    val m3 = Ridge.fitFromMoments(Map((0, 0) -> BigInt(5)),
      Array(BigInt(-17)), 3L, 2L)
    // -17/7 = -2.428..: truncation gives -2428571, floor would -2428572
    assert(m3.wQ6.toSeq == Seq(-2428571L))
  }

  test("ridge store: refit from two appended batches is bit-identical " +
      "to fit-from-scan, and a resumed append stays mergeable") {
    import graft.ml.{Ridge, RidgeStore}
    val p = tmp("ridgestore")
    try {
      val df = Seq((1L, 2L, 0L, 4L), (2L, 0L, 2L, 6L), (3L, 1L, 1L, 5L),
        (4L, 3L, 2L, 9L)).toDF("id", "x1", "x2", "y")
      val feats = Seq(lit(1L), col("x1"), col("x2"))
      RidgeStore.appendBatch(df.filter(col("id") <= 2), feats, col("y"),
        0L, p, overwrite = true)
      RidgeStore.appendBatch(df.filter(col("id") > 2), feats, col("y"),
        1L, p)
      val mStore = RidgeStore.fit(spark, p, 1L)
      val mScan = Ridge.fit(df, feats, col("y"), 1L)
      assert(mStore.n == mScan.n && mStore.detA == mScan.detA)
      assert(mStore.detAi.toSeq == mScan.detAi.toSeq)
      assert(mStore.wQ6.toSeq == mScan.wQ6.toSeq)
      assert(mStore.gram == mScan.gram)
      assert(mStore.b.toSeq == mScan.b.toSeq)
    } finally rm(p)
  }

  // ---- signature ledger: bucket layout persisted and validated ------

  test("sigLedger persists nBuckets at create time and rejects a probe " +
      "or ingest with a different value (silent pair-miss prevented)") {
    val p = tmp("sigmeta")
    try {
      val sigs = docs.limit(40)
        .select(col("doc_id").as("id"), xxhash64(col("text")).as("sig"))
      Dedup.sigLedger(sigs, p, nBuckets = 16)
      val meta = spark.read.parquet(s"$p/meta")
      assert(meta.select("n_buckets").head.getInt(0) == 16)
      // mismatched probe and mismatched ingest both refuse
      val eProbe = intercept[IllegalArgumentException] {
        Dedup.sigLedgerPairs(sigs, p, nBuckets = 32)
      }
      assert(eProbe.getMessage.contains("nBuckets=16"))
      intercept[IllegalArgumentException] {
        Dedup.sigLedger(sigs, p, nBuckets = 32)
      }
      // matching calls proceed, and the cross-batch contract holds
      val shifted = sigs.withColumn("id", col("id") + 1000000L)
      val pairs = Dedup.sigLedgerPairs(shifted, p, nBuckets = 16)
      assert(pairs.filter(col("hamming") === 0).count() >= 40,
        "every shifted twin must rediscover its original at hamming 0")
    } finally rm(p)
  }
}
