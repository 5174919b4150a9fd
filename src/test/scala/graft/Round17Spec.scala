package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.data.Dedup
import graft.functions.Winnowing

/** Round-17 regressions: ledger erasure (r16 judge directive #1 — the
  * delete verb for the MinHash/SimHash/winnowing dedup ledgers, each
  * proved post-erase ≡ rebuild-on-survivors), and the four r16 ADVICE
  * fixes (refit paths consuming live tombstones instead of resurrecting
  * deleted ids; BM25 delete deriving dl from stored postings and
  * dropping absent ids; BM25 vacuum as one crash-idempotent generation
  * swap).
  */
class Round17Spec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String = {
    val p = s"${System.getProperty("java.io.tmpdir")}/graft_r17_$name"
    graft.operators.FsUtil.deleteRecursively(new java.io.File(p))
    p
  }
  private def rm(p: String): Unit =
    graft.operators.FsUtil.deleteRecursively(new java.io.File(p))
  private def rows(df: DataFrame) = df.collect().map(_.toSeq).toSet

  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")
    .select("doc_id", "text").filter(col("text").isNotNull)

  // ---- ledger erasure: post-erase probe ≡ rebuild on survivors -------

  test("winnowing ledger erase: tombstoned probe == probe of a ledger " +
      "rebuilt on the survivors; re-delete idempotent; vacuum clears " +
      "the bytes and preserves the probe") {
    val p = tmp("wnerase"); val p2 = tmp("wnerase_rebuild")
    try {
      val prior = docs.filter(col("doc_id") % 3 =!= 0)
      val delta = docs.filter(col("doc_id") % 3 === 0)
      val erased = prior.filter(col("doc_id") % 5 === 1)
      Winnowing.ledger(prior, p)
      Winnowing.ledgerDelete(erased, p)
      val pre = rows(Winnowing.ledgerPairs(delta, p))
      // identity gate: a ledger BUILT on the survivors probes identically
      Winnowing.ledger(prior.filter(col("doc_id") % 5 =!= 1), p2)
      assert(pre == rows(Winnowing.ledgerPairs(delta, p2)),
        "post-erase probe must equal rebuild-on-survivors")
      // idempotence: deleting the same ids again changes nothing
      Winnowing.ledgerDelete(erased, p)
      assert(rows(Winnowing.ledgerPairs(delta, p)) == pre)
      val (b, a) = Winnowing.vacuumLedger(spark, p)
      assert(a < b, "vacuum must shed the erased rows")
      assert(!new java.io.File(s"$p/tombstones").exists())
      assert(spark.read.parquet(s"$p/fps")
        .join(erased.select(col("doc_id").as("id")), Seq("id"),
          "left_semi").count() == 0,
        "no erased id may survive on disk after vacuum")
      assert(rows(Winnowing.ledgerPairs(delta, p)) == pre,
        "probe must be bit-identical across vacuum")
    } finally { rm(p); rm(p2) }
  }

  test("minhash ledger erase: post-erase probe == rebuild on survivors; " +
      "vacuum scrubs both layouts") {
    val p = tmp("mherase"); val p2 = tmp("mherase_rebuild")
    try {
      val erased = docs.filter(col("doc_id") % 5 === 1)
      Dedup.minHashLedger(docs, p, k = 5, numHashes = 32,
        rowsPerBand = 4, threshold = 0.5)
      Dedup.minHashLedgerDelete(erased, p)
      // twins of the full corpus: surviving docs must still pair with
      // their identical twin via history; erased history must not appear
      val twins = docs.withColumn("doc_id", col("doc_id") + 1000000L)
      val pre = rows(Dedup.minHashLedgerPairs(twins, p, k = 5,
        numHashes = 32, rowsPerBand = 4, threshold = 0.5))
      Dedup.minHashLedger(docs.filter(col("doc_id") % 5 =!= 1), p2,
        k = 5, numHashes = 32, rowsPerBand = 4, threshold = 0.5)
      assert(pre == rows(Dedup.minHashLedgerPairs(twins, p2, k = 5,
        numHashes = 32, rowsPerBand = 4, threshold = 0.5)),
        "post-erase probe must equal rebuild-on-survivors")
      val (bb, ba, sb, sa) = Dedup.vacuumMinHashLedger(spark, p)
      assert(ba < bb && sa < sb)
      assert(!new java.io.File(s"$p/tombstones").exists())
      val er = erased.select(col("doc_id").as("id"))
      assert(spark.read.parquet(s"$p/bands")
        .join(er, Seq("id"), "left_semi").count() == 0)
      assert(spark.read.parquet(s"$p/sigs")
        .join(er, Seq("id"), "left_semi").count() == 0)
      assert(rows(Dedup.minHashLedgerPairs(twins, p, k = 5,
        numHashes = 32, rowsPerBand = 4, threshold = 0.5)) == pre,
        "probe must be bit-identical across vacuum")
    } finally { rm(p); rm(p2) }
  }

  test("simhash ledger erase: post-erase probe == rebuild on survivors; " +
      "vacuum scrubs the chunks layout") {
    val p = tmp("sherase"); val p2 = tmp("sherase_rebuild")
    try {
      val erased = docs.filter(col("doc_id") % 5 === 1)
      Dedup.simHashLedger(docs, p, maxHamming = 3)
      Dedup.simHashLedgerDelete(erased, p)
      val twins = docs.withColumn("doc_id", col("doc_id") + 1000000L)
      val pre = rows(Dedup.simHashLedgerPairs(twins, p, maxHamming = 3))
      Dedup.simHashLedger(docs.filter(col("doc_id") % 5 =!= 1), p2,
        maxHamming = 3)
      assert(pre == rows(Dedup.simHashLedgerPairs(twins, p2,
        maxHamming = 3)),
        "post-erase probe must equal rebuild-on-survivors")
      val (cb, ca) = Dedup.vacuumSimHashLedger(spark, p)
      assert(ca < cb)
      assert(spark.read.parquet(s"$p/chunks")
        .join(erased.select(col("doc_id").as("id")), Seq("id"),
          "left_semi").count() == 0)
      assert(rows(Dedup.simHashLedgerPairs(twins, p,
        maxHamming = 3)) == pre)
    } finally { rm(p); rm(p2) }
  }

  // ---- html -> text extraction golden cases ---------------------------

  test("html extract: golden case exercises every rule (blocks, breaks, " +
      "tags, entities, collapse, both boilerplate rules)") {
    val html = "<html><head><title>T</title>" +
      "<style>p{x:1}</style><script>if(a<b){c()}</script></head><body>" +
      "<div><a href=\"/\">Home</a></div>" +
      "<p>Tom &amp; Jerry say &quot;hi&quot; &lt;3&nbsp;&#39;ok&#39;</p>" +
      "<!-- secret <p>hidden paragraph text</p> -->" +
      "<p>A   perfectly \t normal paragraph line here.</p>" +
      "<p>Copyright 2024 Nobody. All rights reserved.</p>" +
      "<footer>cookie policy</footer></body></html>"
    val out = graft.preprocess.HtmlText
      .extract(Seq((1L, html)).toDF("id", "html"), "html", "id")
      .collect()(0)
    assert(out.getAs[String]("text") ==
      "Tom & Jerry say \"hi\" <3 'ok'\n" +
        "A perfectly normal paragraph line here.")
    assert(out.getAs[Long]("n_lines_kept") == 2L)
    // dropped non-empty: "T" (short), "Home" (short), the copyright
    // line (pattern), the cookie footer (pattern); comment content and
    // script/style code must never surface
    assert(out.getAs[Long]("n_lines_dropped") == 4L)
  }

  test("html extract: amp unescapes LAST, so a double-escaped entity " +
      "unescapes exactly one level") {
    val html = "<p>write &amp;lt; for a literal less-than sign</p>"
    val out = graft.preprocess.HtmlText
      .extract(Seq((1L, html)).toDF("id", "html"), "html", "id")
      .collect()(0)
    assert(out.getAs[String]("text") ==
      "write &lt; for a literal less-than sign")
  }

  // ---- image dHash ledger (signature-grain sigLedger) -----------------

  test("image dhash ledger: cross-batch probe equals the direct sigPairs " +
      "relation restricted to cross-batch; retry re-append is idempotent " +
      "at probe time; erasure verb applies unchanged") {
    import graft.multimodal.BinaryMedia
    val p = tmp("imgledger")
    try {
      val d = docs.filter(col("doc_id") < 120)
      val a = d.filter(col("doc_id") % 2 === 0)
      val b = d.filter(col("doc_id") % 2 === 1)
      val sigsA = BinaryMedia.imageDHashes(
        BinaryMedia.imageFromText(a, "doc_id", "text", width = 16))
        .localCheckpoint()
      val sigsB = BinaryMedia.imageDHashes(
        BinaryMedia.imageFromText(b, "doc_id", "text", width = 16))
        .localCheckpoint()
      Dedup.sigLedger(sigsA, p)
      val probe = rows(Dedup.sigLedgerPairs(sigsB, p))
      // direct relation: all-pairs hamming over the union, restricted to
      // (new in B, old in A)
      val direct = Dedup.sigPairs(sigsA.unionByName(sigsB), maxHamming = 3)
        .collect().flatMap { r =>
          val (x, y, h) = (r.getLong(0), r.getLong(1), r.getInt(2))
          Seq((x, y, h), (y, x, h))
        }.filter { case (n, o, _) =>
          n % 2 == 1 && o % 2 == 0
        }.map { case (n, o, h) => Seq(n, o, h) }.toSet
      assert(probe.map(_.toSeq.toVector).map(v =>
        Seq(v(0), v(1), v(2))).toSet == direct,
        "ledger probe must equal the direct cross-batch relation")
      // retry: a crashed-and-retried append duplicates rows; the probe
      // dedupes on read, so the pair set is unchanged
      Dedup.sigLedger(sigsA, p)
      assert(rows(Dedup.sigLedgerPairs(sigsB, p)) == probe)
      // the text-ledger erasure verb operates on the same layout
      val erased = sigsA.select(col("id")).limit(5).localCheckpoint()
      Dedup.simHashLedgerDelete(erased, p, idCol = "id")
      val post = rows(Dedup.sigLedgerPairs(sigsB, p))
      val erasedIds = erased.as[Long].collect().toSet
      assert(!post.exists(r => erasedIds.contains(
        r(1).asInstanceOf[Long])),
        "erased image ids must not appear as historical sources")
    } finally { rm(p) }
  }

  // ---- url canonicalization golden cases ------------------------------

  test("url canonicalize: golden rules (case, default ports, fragment, " +
      "tracking params, param sort, empty path, foreign schemes)") {
    val cases = Seq(
      // scheme+host lowercase, :80 strip, utm_ drop, sort, frag strip,
      // path case preserved, 'B=2' < 'a=1' bytewise
      ("HTTP://Example.COM:80/Path/X?utm_source=a&B=2&a=1#frag",
        "http://example.com/Path/X?B=2&a=1"),
      // https default port strip + empty path -> "/"
      ("https://Example.com:443", "https://example.com/"),
      // non-default port survives; literal tracking key drops
      ("https://example.com:8443/p?gclid=1", "https://example.com:8443/p"),
      ("http://example.com:8080/p?z=1&y=2",
        "http://example.com:8080/p?y=2&z=1"),
      // all params tracking -> no '?'
      ("https://h.io/a?ref=x&utm_campaign=y", "https://h.io/a"),
      // non-http(s) scheme: port is meaningful and survives
      ("ftp://Files.example.com:21/x", "ftp://files.example.com:21/x"),
      // '&&' debris drops; values keep their case
      ("http://h.io/a?x=Mixed&&y=2", "http://h.io/a?x=Mixed&y=2"))
    val got = graft.functions.Urls
      .canonicalize(col("url"))
    val out = cases.map(_._1).toDF("url").select(got.as("c"))
      .as[String].collect().toSeq
    assert(out == cases.map(_._2),
      out.zip(cases).filter(p => p._1 != p._2._2).mkString("; "))
  }

  test("looksLikeUrl gates frontier hygiene") {
    val df = Seq("https://x.com/a", "not a url", "mailto:a@b.c", "://x")
      .toDF("url")
    assert(df.filter(graft.functions.Urls.looksLikeUrl(col("url")))
      .as[String].collect().toSeq == Seq("https://x.com/a"))
  }

  // ---- robots gate golden semantics -----------------------------------

  test("robots gate: longest match wins, allow beats disallow on ties, " +
      "no match => allowed with null rule") {
    val rules = Seq(
      ("h.io", "/a", false),
      ("h.io", "/a/b", true),
      ("h.io", "/c", false),
      ("h.io", "/c", true), // equal-length tie -> allow wins
      ("x.io", "/", false))
      .toDF("host", "prefix", "allow")
    val urls = Seq(
      "https://h.io/a/q", "https://h.io/a/b/q", "https://h.io/c/d",
      "https://h.io/zz", "https://x.io/anything", "https://y.io/free")
      .toDF("u")
    val got = graft.functions.Robots.gate(urls, "u", rules)
      .select("u", "allowed", "rule_prefix").collect()
      .map(r => r.getString(0) ->
        ((r.getBoolean(1), r.getAs[String]("rule_prefix")))).toMap
    assert(got("https://h.io/a/q") == ((false, "/a")))
    assert(got("https://h.io/a/b/q") == ((true, "/a/b")),
      "the longer allow must override the shorter disallow")
    assert(got("https://h.io/c/d") == ((true, "/c")),
      "equal-length tie must resolve to allow")
    assert(got("https://h.io/zz") == ((true, null)),
      "no matching rule => crawl by default")
    assert(got("https://x.io/anything") == ((false, "/")))
    assert(got("https://y.io/free") == ((true, null)))
  }

  // ---- refit must consume live tombstones (ADVICE medium) ------------

  test("pq refit with live tombstones: deleted ids stay deleted across " +
      "the generation swap (refit == writeIndex on survivors)") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 30)
    val p = tmp("pqrefit"); val p2 = tmp("pqrefit_fresh")
    try {
      graft.ann.Pq.writeIndex(emb, p, m = 4, subDim = 16, k = 16,
        iters = 2, nLists = 8)
      graft.ann.Pq.deleteFromIndex(emb.filter(col("vec_id") % 2 === 1), p)
      // legal maintenance op with the FULL corpus (still contains the
      // tombstoned ids) — must not resurrect them
      graft.ann.Pq.refitIndex(emb, p, iters = 2)
      val post = rows(graft.ann.Pq.probeIndex(q, p, nProbe = 8, k = 5))
      assert(post.nonEmpty)
      assert(!post.exists(r => r(1).asInstanceOf[Long] % 2 == 1),
        "refit must not resurrect tombstoned ids")
      graft.ann.Pq.writeIndex(emb.filter(col("vec_id") % 2 === 0), p2,
        m = 4, subDim = 16, k = 16, iters = 2, nLists = 8)
      assert(post == rows(graft.ann.Pq.probeIndex(q, p2, nProbe = 8,
        k = 5)), "refit generation must equal writeIndex(survivors)")
    } finally { rm(p); rm(p2) }
  }

  test("ivf refit with live tombstones: rebuild from the lists layout " +
      "anti-joins the tombstones (no resurrection)") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 20)
    val p = tmp("ivfrefit")
    try {
      graft.ann.Knn.ivfWriteIndex(emb, p, nLists = 8, seed = 7L,
        maxIter = 5)
      graft.ann.Knn.ivfDeleteFromIndex(
        emb.filter(col("vec_id") % 2 === 1), p)
      graft.ann.Knn.ivfRefitIndex(spark, p, nLists = 8, seed = 7L,
        maxIter = 5)
      val post = rows(graft.ann.Knn.ivfTopKIndexed(q, p, k = 5,
        nProbe = 8))
      val brute = rows(graft.ann.Knn.bruteForceTopK(q,
        emb.filter(col("vec_id") % 2 === 0), k = 5))
      assert(post == brute,
        "exhaustive post-refit probe must equal brute force on survivors")
    } finally { rm(p) }
  }

  // ---- BM25 delete/vacuum hardening (ADVICE lows) ---------------------

  test("bm25 delete of an absent id is a no-op: no tombstone row, no " +
      "stats skew") {
    val qs = docs.filter(col("doc_id") < 5)
      .select(col("doc_id").as("query_id"),
        array_join(slice(split(trim(col("text")), " "), 1, 4), " ")
          .as("query_text"))
    val p = tmp("bmabsent")
    try {
      graft.search.Bm25.writeIndex(docs, p, nBuckets = 16)
      val base = rows(graft.search.Bm25.topKIndexed(qs, p, k = 10))
      graft.search.Bm25.deleteFromIndex(
        Seq(99999999L).toDF("doc_id"), p)
      // since the r17 ADVICE fix an all-absent delete appends NOTHING —
      // not even the tombstones dir (Round18Spec locks that), so the
      // no-op surface here is simply "no dir, no score change"
      assert(!new java.io.File(s"$p/tombstones").exists(),
        "an absent id must not produce a tombstone row")
      assert(rows(graft.search.Bm25.topKIndexed(qs, p, k = 10)) == base,
        "deleting an absent id must not change any score")
    } finally { rm(p) }
  }

  test("bm25 vacuum is retry-idempotent: second vacuum is a no-op and " +
      "re-deleting a vacuumed id does not double-subtract stats") {
    val qs = docs.filter(col("doc_id") < 5)
      .select(col("doc_id").as("query_id"),
        array_join(slice(split(trim(col("text")), " "), 1, 4), " ")
          .as("query_text"))
    val p = tmp("bmvac")
    try {
      graft.search.Bm25.writeIndex(docs, p, nBuckets = 16)
      graft.search.Bm25.deleteFromIndex(
        docs.filter(col("doc_id") % 3 === 0), p)
      val pre = rows(graft.search.Bm25.topKIndexed(qs, p, k = 10))
      val (b1, a1) = graft.search.Bm25.vacuumIndex(spark, p)
      assert(a1 < b1)
      assert(!new java.io.File(s"$p/tombstones").exists())
      val (b2, a2) = graft.search.Bm25.vacuumIndex(spark, p)
      assert(b2 == a2 && b2 == a1, "retried vacuum must be a no-op")
      assert(rows(graft.search.Bm25.topKIndexed(qs, p, k = 10)) == pre)
      // re-delete of an id vacuumed away: postings hold no rows for it,
      // so it is dropped — and (r17 ADVICE fix) an all-absent delete
      // appends nothing, leaving no tombstones dir at all
      graft.search.Bm25.deleteFromIndex(
        docs.filter(col("doc_id") % 3 === 0), p)
      assert(!new java.io.File(s"$p/tombstones").exists())
      assert(rows(graft.search.Bm25.topKIndexed(qs, p, k = 10)) == pre,
        "re-deleting vacuumed ids must not skew n_docs/avgdl")
    } finally { rm(p) }
  }
}
