package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed inverted-index BM25 top-k lexical search — the lexical sibling
  * of the `graft.ann` embedding family (the two cover the retrieval side of a
  * training-data pipeline: ANN for dense, BM25 for sparse).
  *
  * Plan shape, designed for a huge corpus and a small query set:
  *  1. ONE wide scan of the corpus builds the per-(doc, term) frequency
  *     relation with map-side partial aggregation (`groupBy(doc, term)`), the
  *     classic inverted-index posting build.
  *  2. The query term set is tiny, so it BROADCASTS: postings are filtered to
  *     query terms map-side — everything downstream of the one posting-build
  *     shuffle touches only rows matching some query term, never the corpus.
  *  3. Document frequencies come from the already-filtered postings (df(t) of
  *     a retained term is unchanged by dropping other terms), so no second
  *     corpus-wide aggregation exists.
  *  4. Corpus size / average doc length ride in as a broadcast single-row
  *     cross join (Catalyst folds it into the stage); no driver collect.
  *  5. Per-(query, doc) score is one hash aggregation; top-k is a window over
  *     the scored pairs, which are |queries| x |docs with a hit| — not the
  *     corpus.
  *
  * Scoring is textbook Robertson/Sparck-Jones BM25
  * (https://en.wikipedia.org/wiki/Okapi_BM25):
  * idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5)), term saturation k1, length
  * normalization b. Scores round to 9 decimals for cross-engine comparison,
  * the same contract as the ANN cosine kernels.
  *
  * Tokenization is the corpus convention used across the dedup family
  * (space-separated, see `Dedup.wordShingles`): swap `tokenize` for a
  * language-aware analyzer at the call site if the corpus needs one.
  */
object Bm25 {

  private def tokenize(c: org.apache.spark.sql.Column) = split(trim(c), " ")

  /** BM25 top-k: for each row of `queries` (queryIdCol, queryTextCol), the
    * `k` best documents of `docs` (idCol, textCol) by BM25 score.
    * Output: (query_id, doc_id, score, rank) — rank 1 = best, ties broken by
    * doc_id for a total order.
    */
  def topK(docs: DataFrame, queries: DataFrame, k: Int = 10,
           k1: Double = 1.2, b: Double = 0.75,
           idCol: String = "doc_id", textCol: String = "text",
           queryIdCol: String = "query_id",
           queryTextCol: String = "query_text"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(k1 >= 0 && b >= 0 && b <= 1, s"invalid BM25 params k1=$k1 b=$b")

    val toks = tokenize(col(textCol))
    // posting build: one scan, one partial-aggregated shuffle on (doc, term).
    // dl (doc length) is constant per doc so it rides in the grouping key
    // without widening the aggregation state.
    val postings = docs
      .select(col(idCol).cast("long").as("doc_id"), toks.as("__ts"))
      .select(col("doc_id"), size(col("__ts")).as("dl"),
              explode(col("__ts")).as("term"))
      .filter(col("term") =!= "")
      .groupBy("doc_id", "dl", "term")
      .agg(count(lit(1)).cast("double").as("tf"))

    // distinct query terms: tiny by construction -> broadcast
    val queryTerms =
      queries
        .select(col(queryIdCol).cast("long").as("query_id"),
                explode(tokenize(col(queryTextCol))).as("term"))
        .filter(col("term") =!= "")
        .distinct()

    topKForTerms(docs, postings, queryTerms, k, k1, b, textCol)
  }

  /** Dirichlet-smoothed query-likelihood retrieval (Ponte–Croft 1998 /
    * Zhai–Lafferty 2001) — the OTHER classic lexical scorer beside BM25,
    * ranking documents by the smoothed language-model probability of the
    * query. Rank-equivalent decomposition (the standard one):
    *
    *   score(q, d) = Σ_{t ∈ q∩d} ln(1 + tf_{t,d}·|C| / (μ·cf_t))
    *               + |q| · ln(μ / (dl_d + μ))
    *
    * where cf_t is the COLLECTION term frequency (not df — the df/cf
    * distinction is what separates QL from BM25), |C| the exact LONG token
    * total, and |q| the distinct query-term count (declared: distinct
    * terms, the same tokenization contract as [[topK]]). Only documents
    * matching ≥ 1 query term are scored (the candidate-set convention; a
    * no-match document's score is pure length normalizer and never useful).
    * Same shapes as BM25: one posting build, broadcast term/cf relations,
    * one (query, doc) hash agg, query-partitioned top-k window; round-9
    * scores with (score desc, doc_id) total order.
    */
  def topKQueryLikelihood(docs: DataFrame, queries: DataFrame, k: Int = 10,
                          mu: Double = 2000.0,
                          idCol: String = "doc_id", textCol: String = "text",
                          queryIdCol: String = "query_id",
                          queryTextCol: String = "query_text"): DataFrame = {
    require(k > 0 && mu > 0, s"need k > 0 and mu > 0, got k=$k mu=$mu")
    val toks = tokenize(col(textCol))
    val postings = docs
      .select(col(idCol).cast("long").as("doc_id"), toks.as("__ts"))
      .select(col("doc_id"), size(col("__ts")).as("dl"),
              explode(col("__ts")).as("term"))
      .filter(col("term") =!= "")
      .groupBy("doc_id", "dl", "term")
      .agg(count(lit(1)).cast("double").as("tf"))
    val queryTerms = queries
      .select(col(queryIdCol).cast("long").as("query_id"),
              explode(tokenize(col(queryTextCol))).as("term"))
      .filter(col("term") =!= "")
      .distinct()
    val qlen = queryTerms.groupBy("query_id")
      .agg(count(lit(1)).cast("double").as("qlen"))
    // exact LONG collection size; cf per query term from the SAME posting
    // relation (hits-derived cf would undercount: cf is corpus-global)
    val stats = docs.select(size(tokenize(col(textCol))).cast("long").as("__dl"))
      .agg(coalesce(sum(col("__dl")), lit(0L)).cast("double").as("c_size"))
    val cf = postings.join(broadcast(queryTerms.select("term").distinct()),
        Seq("term"))
      .groupBy("term").agg(sum(col("tf")).as("cf"))
    val hits = postings.join(broadcast(queryTerms), "term")
    val matchTerm = log(lit(1.0) +
      col("tf") * col("c_size") / (lit(mu) * col("cf")))
    val scored = hits
      .join(broadcast(cf), "term")
      .crossJoin(broadcast(stats))
      .groupBy("query_id", "doc_id", "dl")
      .agg(sum(matchTerm).as("__m"))
      .join(broadcast(qlen), "query_id")
      .select(col("query_id"), col("doc_id"),
        round(col("__m") +
          col("qlen") * log(lit(mu) / (col("dl") + lit(mu))), 9).as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("score").desc, col("doc_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "doc_id", "score", "rank")
  }

  /** Score an explicit (query_id, term) relation against the corpus — the
    * shared tail of [[topK]] and the pseudo-relevance-feedback second pass
    * ([[topKExpanded]]), whose query is a TERM SET, not a text.
    */
  private def topKForTerms(docs: DataFrame, postings: DataFrame,
                           queryTerms: DataFrame, k: Int, k1: Double,
                           b: Double, textCol: String): DataFrame = {
    // map-side filter of the postings to query terms. The scoring tail reads
    // `hits` twice (df derivation + scoring) and AQE does not reuse the
    // posting-build exchange between the two consumers (the Dedup-family
    // measurement) — without materialization the CORPUS would be scanned and
    // shuffled twice. hits is query-bounded (sum of df(t) over query terms,
    // 4 narrow columns) and localCheckpoint spills to disk, so a stop-word
    // query degrades to disk I/O, never OOM. The indexed path doesn't need
    // this: its hits re-read is a pruned slice of the materialized index.
    val hits = postings.join(broadcast(queryTerms), "term").localCheckpoint()

    // corpus stats as a 1-row relation (no driver action)
    val stats = docs.select(size(tokenize(col(textCol))).as("__dl"))
      .agg(count(lit(1)).cast("double").as("n_docs"),
           avg(col("__dl")).as("avgdl"))

    scoreAndRank(hits, stats, k, k1, b)
  }

  /** RM3-style pseudo-relevance feedback ("RM3-lite"): run BM25, take each
    * query's top `fbDocs` hits, extract the `fbTerms` strongest expansion
    * terms (by EXACT integer feedback term frequency, original query terms
    * excluded, ties to the lexicographically smaller term), and re-run
    * BM25 over the UNION of original and expansion terms. The unweighted
    * union is the documented simplification of Lavrenko–Croft relevance
    * models (true RM3 mixes weighted distributions; the integer-weight
    * selection keeps every choice engine-replayable — the house
    * determinism trade, stated).
    *
    * Cost: the feedback pass adds one |Q|·fbDocs-bounded broadcast join
    * against the postings and re-uses the SAME posting relation for both
    * scoring passes — the corpus is tokenized once.
    */
  def topKExpanded(docs: DataFrame, queries: DataFrame, k: Int = 10,
                   fbDocs: Int = 3, fbTerms: Int = 5,
                   k1: Double = 1.2, b: Double = 0.75,
                   idCol: String = "doc_id", textCol: String = "text",
                   queryIdCol: String = "query_id",
                   queryTextCol: String = "query_text"): DataFrame = {
    require(fbDocs > 0 && fbTerms > 0,
      s"need fbDocs > 0 and fbTerms > 0, got fbDocs=$fbDocs fbTerms=$fbTerms")
    val toks = tokenize(col(textCol))
    val postings = docs
      .select(col(idCol).cast("long").as("doc_id"), toks.as("__ts"))
      .select(col("doc_id"), size(col("__ts")).as("dl"),
              explode(col("__ts")).as("term"))
      .filter(col("term") =!= "")
      .groupBy("doc_id", "dl", "term")
      .agg(count(lit(1)).cast("double").as("tf"))
      .localCheckpoint() // both passes + feedback read this one build
    val qTerms = queries
      .select(col(queryIdCol).cast("long").as("query_id"),
              explode(tokenize(col(queryTextCol))).as("term"))
      .filter(col("term") =!= "")
      .distinct()
    val feedback = topKForTerms(docs, postings, qTerms, fbDocs, k1, b,
        textCol)
      .select("query_id", "doc_id")
    val expansion = postings
      .join(broadcast(feedback), Seq("doc_id"))
      .groupBy("query_id", "term")
      .agg(sum(col("tf").cast("long")).as("w"))
      .join(qTerms, Seq("query_id", "term"), "left_anti")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("w").desc, col("term"))))
      .filter(col("rn") <= fbTerms)
      .select("query_id", "term")
    topKForTerms(docs, postings,
      qTerms.unionByName(expansion).distinct(), k, k1, b, textCol)
  }

  /** Shared scoring tail: `hits` carries (query_id, doc_id, term, tf, dl),
    * `stats` is a broadcastable single-row (n_docs, avgdl) relation. The df
    * table is derived from `hits` — correct because df(t) of a retained term
    * is unchanged by dropping other terms — and broadcast back.
    */
  private def scoreAndRank(hits: DataFrame, stats: DataFrame,
                           k: Int, k1: Double, b: Double): DataFrame = {
    val dfPerTerm = broadcast(
      hits.select("term", "doc_id").distinct()
        .groupBy("term").agg(count(lit(1)).cast("double").as("df")))

    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val sat = col("tf") * (lit(k1) + 1.0) /
      (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl")))

    val scored = hits
      .join(dfPerTerm, "term")
      .crossJoin(broadcast(stats))
      .groupBy("query_id", "doc_id")
      .agg(round(sum(idf * sat), 9).as("score"))

    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("doc_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "doc_id", "score", "rank")
  }

  /** Materialize the inverted index: postings written PARTITIONED BY a hash
    * bucket of the term, plus a one-row stats file. This is the 100 TB shape
    * — [[topK]] rebuilds postings from the corpus per call (two corpus
    * scans), which is right for one-shot jobs but wrong for a serving/reuse
    * pattern; here the corpus is scanned once at build time and every probe
    * afterwards reads ONLY the partitions its query terms hash into (static
    * partition pruning, the [[graft.ann.Knn.ivfWriteIndex]] recipe applied
    * to text). `nBuckets` bounds the listing fan-out: terms-per-query
    * partitions are touched per probe, each a hash-slice of the vocabulary.
    */
  def writeIndex(docs: DataFrame, path: String, nBuckets: Int = 64,
                 idCol: String = "doc_id", textCol: String = "text"): Unit = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    writePostings(docs, path, nBuckets, idCol, textCol, overwrite = true)
    // stats carry the exact LONG token total alongside the derived avgdl so
    // [[appendToIndex]] can recombine them EXACTLY: doc lengths are small
    // ints, so both the long sum and the double division (sum/n) are the
    // bit-identical operations a full rebuild performs — no running-mean
    // drift across appends
    val toks = tokenize(col(textCol))
    docs.select(size(toks).cast("long").as("__dl"))
      .agg(count(lit(1)).cast("double").as("n_docs"),
           // empty corpus: sum over zero rows is NULL — store 0 so
           // [[appendToIndex]]'s getLong on an empty-base index never NPEs
           coalesce(sum(col("__dl")), lit(0L)).as("sum_dl"))
      .withColumn("avgdl", col("sum_dl").cast("double") / col("n_docs"))
      .withColumn("n_buckets", lit(nBuckets))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/stats")
  }

  private def writePostings(docs: DataFrame, path: String, nBuckets: Int,
                            idCol: String, textCol: String,
                            overwrite: Boolean): Unit = {
    val toks = tokenize(col(textCol))
    docs
      .select(col(idCol).cast("long").as("doc_id"), toks.as("__ts"))
      .select(col("doc_id"), size(col("__ts")).as("dl"),
              explode(col("__ts")).as("term"))
      .filter(col("term") =!= "")
      .groupBy("doc_id", "dl", "term")
      .agg(count(lit(1)).cast("double").as("tf"))
      .withColumn("term_bucket", pmod(xxhash64(col("term")), lit(nBuckets)).cast("int"))
      .write.mode(if (overwrite) "overwrite" else "append")
      .partitionBy("term_bucket")
      .parquet(s"$path/postings")
  }

  /** Incrementally add `newDocs` to a [[writeIndex]]-materialized index — a
    * corpus delta costs one scan of the DELTA, never a 100 TB re-scan. New
    * postings land in the SAME `term_bucket` partition layout (parquet
    * append adds files inside existing partition directories, so
    * [[topKIndexed]]'s static bucket pruning is unchanged), and the one-row
    * stats are recombined exactly: n_docs adds, the long token totals add,
    * avgdl re-derives as sum/n — the same arithmetic a full rebuild runs, so
    * probes over build+append are BIT-IDENTICAL to a rebuild (q87's oracle).
    *
    * Contract: `newDocs` ids must be disjoint from the indexed corpus
    * (re-appending a doc would double its postings — dedup upstream). The
    * append is not atomic (postings commit, then stats): a failure in
    * between leaves the index inconsistent, and RE-RUNNING the append would
    * double the delta's postings — recover by rebuilding, or run appends
    * against a copied index directory and swap it in on success (immutable
    * index generations, the standard serving practice).
    */
  def appendToIndex(newDocs: DataFrame, path: String,
                    idCol: String = "doc_id", textCol: String = "text"): Unit = {
    val spark = newDocs.sparkSession
    val old = spark.read.parquet(s"$path/stats")
      .select("n_docs", "sum_dl", "n_buckets").head
    val (oldN, oldSum, nBuckets) = (old.getDouble(0), old.getLong(1), old.getInt(2))
    writePostings(newDocs, path, nBuckets, idCol, textCol, overwrite = false)
    val toks = tokenize(col(textCol))
    newDocs.select(size(toks).cast("long").as("__dl"))
      .agg(count(lit(1)).cast("double").as("n_docs"), sum(col("__dl")).as("sum_dl"))
      .select(
        (col("n_docs") + lit(oldN)).as("n_docs"),
        (coalesce(col("sum_dl"), lit(0L)) + lit(oldSum)).as("sum_dl"))
      .withColumn("avgdl", col("sum_dl").cast("double") / col("n_docs"))
      .withColumn("n_buckets", lit(nBuckets))
      // the old stats row is already on the driver (collected above), so
      // this overwrite never reads what it replaces
      .coalesce(1).write.mode("overwrite").parquet(s"$path/stats")
  }

  /** Rewrite the accumulated append files so every `term_bucket` partition
    * holds ONE posting file again (N appends otherwise leave N+1 files per
    * bucket and probe listing cost grows per append). Stats are untouched
    * and rows only move between files, so probes over the compacted index
    * are BIT-IDENTICAL to probes over the appended one (q102's oracle).
    * Swap atomicity contract: see [[graft.operators.PartitionCompaction]].
    *
    * @return posting data-file count (before, after)
    */
  def compactIndex(spark: org.apache.spark.sql.SparkSession,
                   path: String): (Long, Long) = {
    val nBuckets = spark.read.parquet(s"$path/stats").select("n_buckets").head().getInt(0)
    graft.operators.PartitionCompaction.compact(
      spark, s"$path/postings", "term_bucket", nBuckets)
  }

  /** BM25 top-k over a [[writeIndex]]-materialized index — bit-identical to
    * [[topK]] on the same corpus (same postings, same stats, same scoring
    * tail). The query term set is collected driver-side (queries are small by
    * contract — the same driver-bound fit pattern as the IVF centroids) so
    * the bucket filter is a LITERAL isin: it compiles to PartitionFilters on
    * the postings scan and never lists the other buckets' directories.
    */
  def topKIndexed(queries: DataFrame, indexPath: String, k: Int = 10,
                  k1: Double = 1.2, b: Double = 0.75,
                  queryIdCol: String = "query_id",
                  queryTextCol: String = "query_text"): DataFrame = {
    val spark = queries.sparkSession
    val statsRaw = spark.read.parquet(s"$indexPath/stats")
    val nBuckets = statsRaw.select("n_buckets").head().getInt(0)

    val queryTerms = queries
      .select(col(queryIdCol).cast("long").as("query_id"),
              explode(tokenize(col(queryTextCol))).as("term"))
      .filter(col("term") =!= "")
      .distinct()
    // bucket ids via the same Spark expression the writer used (no JVM-side
    // xxhash64 reimplementation to drift); the term set is query-sized
    val buckets = queryTerms
      .select(pmod(xxhash64(col("term")), lit(nBuckets)).cast("int").as("tb"))
      .distinct().collect().map(_.getInt(0)).toSeq

    val hitsRaw = spark.read.parquet(s"$indexPath/postings")
      .filter(col("term_bucket").isin(buckets: _*))
      .join(broadcast(queryTerms), "term")
      .select("query_id", "doc_id", "term", "tf", "dl")

    // tombstoned docs ([[deleteFromIndex]]) vanish BEFORE df/stat
    // computation, so a tombstoned probe scores EXACTLY as a rebuild on
    // the surviving corpus: df comes from the surviving hits, and the
    // collection stats are corrected with the same long-sum / double-
    // division arithmetic the rebuild would run (n' = n − |tomb| and
    // sum_dl' = sum_dl − Σdl(tomb) are exact; avgdl' = sum'/n')
    val tombPath = new org.apache.hadoop.fs.Path(s"$indexPath/tombstones")
    val (hits, stats) =
      if (tombPath.getFileSystem(spark.sessionState.newHadoopConf())
        .exists(tombPath)) {
        val tomb = spark.read.parquet(s"$indexPath/tombstones")
          .dropDuplicates("doc_id") // crashed-retry idempotence
        val t = tomb.agg(count(lit(1)).cast("double").as("nt"),
          coalesce(sum(col("dl")), lit(0L)).as("sdl")).head
        val (nt, sdl) = (t.getDouble(0), t.getLong(1))
        (hitsRaw.join(broadcast(tomb.select("doc_id")), Seq("doc_id"),
          "left_anti"),
          statsRaw.select((col("n_docs") - lit(nt)).as("n_docs"),
            ((col("sum_dl") - lit(sdl)).cast("double") /
              (col("n_docs") - lit(nt))).as("avgdl")))
      } else (hitsRaw, statsRaw.select(col("n_docs"), col("avgdl")))
    scoreAndRank(hits, stats, k, k1, b)
  }

  /** Tombstone DELETE on a [[writeIndex]] layout — the `Pq`/`Knn` verb at
    * BM25 grain, with the twist text search needs: correct deletion must
    * also shed the doc's contribution to the COLLECTION STATS (n_docs,
    * avgdl) and to every matched term's df, so the tombstone row carries
    * the doc's exact token length. The length comes from the STORED
    * postings (every posting row carries its doc's dl), never from
    * caller-passed text — so edited/stale text can't skew the correction,
    * and ids with no posting in the index are DROPPED (tombstoning an
    * absent id must not decrement n_docs/sum_dl for a row that
    * contributed nothing; this also makes re-delete-after-vacuum a no-op
    * instead of a permanent stats skew). One slim parquet append, no
    * posting partition rewritten; [[topKIndexed]] anti-joins the postings
    * AND corrects the stats before scoring, so a tombstoned probe is
    * bit-identical to a rebuild on the survivors. Re-deleting a
    * still-tombstoned doc is idempotent (dedup on read). Settle the
    * layout debt with [[vacuumIndex]]. Declared limitation: a doc indexed
    * with ZERO tokens has no posting rows, so it cannot be tombstoned —
    * its only stat contribution (n_docs += 1) persists until a rebuild.
    */
  def deleteFromIndex(deleteIds: DataFrame, path: String,
                      idCol: String = "doc_id"): Unit = {
    val spark = deleteIds.sparkSession
    val ids = deleteIds.select(col(idCol).cast("long").as("doc_id"))
      .distinct()
    // (doc_id, dl) is functionally dependent in the postings layout, so
    // max(dl) per id is exact; the semi-join keeps only ids actually
    // present. Slim 2-column scan — column pruning drops term/tf.
    val derived = spark.read.parquet(s"$path/postings")
      .join(broadcast(ids), Seq("doc_id"), "left_semi")
      .groupBy("doc_id").agg(max(col("dl")).cast("long").as("dl"))
      .localCheckpoint()
    // an all-absent delete derives ZERO rows: skip the append entirely,
    // or an empty tombstones dir would push every subsequent probe down
    // the correction path (tombstone scan + agg + anti-join) forever
    // until a vacuum, for no effect (ADVICE r17)
    if (!derived.isEmpty)
      derived.coalesce(1)
        .write.mode("append").parquet(s"$path/tombstones")
  }

  /** Physically remove tombstoned postings and fold the stat corrections
    * into the stored stats row: survivors and corrected stats are written
    * into ONE new index generation (postings + stats together, no
    * tombstones dir) and swapped into place with a single rename pair, so
    * there is no window where corrected stats coexist with live
    * tombstones. That makes the vacuum IDEMPOTENT across crash/retry: a
    * crash before the swap leaves the old generation fully intact (stats
    * + tombstones still consistent, re-run recomputes the same
    * generation); after the swap the new generation has no tombstones, so
    * a retried vacuum is a no-op and nothing double-subtracts. The
    * correction arithmetic is the same long-sum / double-division the
    * probe-time path runs, so probes are bit-identical pre/post.
    * Rewrite lands one file per term bucket — deletion and compaction
    * settle together. Swap atomicity contract: see
    * [[graft.operators.PartitionCompaction.swapIntoPlace]] — and note
    * the swap moves the WHOLE index path (postings + stats together, the
    * price of the no-double-fold guarantee), so during the non-atomic
    * rename window a concurrent reader sees no index at all, a WIDER
    * unavailability window than a postings-only swap. A serving index
    * that cannot tolerate it should vacuum a COPY and flip a generation
    * pointer (the immutable-generations practice [[appendToIndex]]
    * already documents) instead of vacuuming in place.
    *
    * @return (n_posting_rows_before, n_posting_rows_after)
    */
  def vacuumIndex(spark: org.apache.spark.sql.SparkSession,
                  path: String): (Long, Long) = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val postings = spark.read.parquet(s"$path/postings")
    if (!fs.exists(new Path(s"$path/tombstones"))) {
      val n = postings.count()
      return (n, n)
    }
    val tomb = spark.read.parquet(s"$path/tombstones")
      .dropDuplicates("doc_id").localCheckpoint()
    val t = tomb.agg(count(lit(1)).cast("double").as("nt"),
      coalesce(sum(col("dl")), lit(0L)).as("sdl")).head
    val (nt, sdl) = (t.getDouble(0), t.getLong(1))
    val old = spark.read.parquet(s"$path/stats")
      .select("n_docs", "sum_dl", "n_buckets").head
    val (oldN, oldSum, nBuckets) =
      (old.getDouble(0), old.getLong(1), old.getInt(2))
    val tmp = path + "__vacuum_tmp"
    fs.delete(new Path(tmp), true)
    // before/after posting counts OBSERVED on the rewrite pass itself
    // (Dedup.vacuumLayout discipline, opt guide §1.2): one data pass
    // instead of count + rewrite + re-read count. Exactly-once only while
    // no task attempt is duplicated (see
    // [[graft.operators.VacuumCounts]]); speculation takes the exact path.
    val exactFallback = graft.operators.VacuumCounts.needExactCounts(spark)
    val obsBefore = org.apache.spark.sql.Observation()
    val obsAfter = org.apache.spark.sql.Observation()
    val antiJoined =
      (if (exactFallback) postings
      else postings.observe(obsBefore, count(lit(1)).as("n")))
      .join(tomb.select("doc_id"), Seq("doc_id"), "left_anti")
    val rewrite =
      (if (exactFallback) antiJoined
      else antiJoined.observe(obsAfter, count(lit(1)).as("n")))
      .repartition(nBuckets, col("term_bucket"))
    graft.plans.PlanDump.dump("bm25_vacuum_rewrite", rewrite)
    val nBefore = if (exactFallback) postings.count() else -1L
    rewrite.write.mode("overwrite").partitionBy("term_bucket")
      .parquet(s"$tmp/postings")
    val nAfter =
      if (exactFallback) spark.read.parquet(s"$tmp/postings").count()
      else -1L
    val spark2 = spark
    import spark2.implicits._
    Seq((oldN - nt, oldSum - sdl))
      .toDF("n_docs", "sum_dl")
      .withColumn("avgdl", col("sum_dl").cast("double") / col("n_docs"))
      .withColumn("n_buckets", lit(nBuckets))
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/stats")
    graft.operators.PartitionCompaction.swapIntoPlace(
      fs, new Path(path), new Path(tmp), new Path(path + "__pre_vacuum"))
    if (exactFallback) (nBefore, nAfter)
    else (obsBefore.get("n").asInstanceOf[Long],
      obsAfter.get("n").asInstanceOf[Long])
  }
}
