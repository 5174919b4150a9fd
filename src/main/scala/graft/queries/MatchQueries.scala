package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Cols
import graft.idx.{CandidateSelection, CosSimIndexer, SniIndexer}

/** Entity-matching indexer operators (the engine's core), each with a fully
  * relational DuckDB oracle: TF-IDF cosine top-k re-derived in SQL from
  * unnested tokens, document frequencies and pair dot products. Scores are
  * rounded to 9 decimals on both sides before ranking/thresholding so float
  * summation order can't flip candidate sets.
  */
object MatchQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    graft.sources.Tables(s, dir, name)

  private def gtParts(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part").select(
      col("p_partkey").cast("long").as(Cols.Uid),
      col("p_name").as(Cols.Name),
      col("p_name").as(Cols.Preprocessed),
      col("p_brand").as(Cols.EntityId))

  private def nmParts(s: SparkSession, dir: String): DataFrame =
    gtParts(s, dir).filter(col(Cols.Uid) < 100)

  /** The q336/q338 frequent-key stop list: every phonetic key EXCEPT the
    * `nStop` hottest under the (count desc, key) total order — the IR
    * stopword rule, scale-invariant where an absolute block-size cap
    * silently empties once the corpus outgrows it. `gt` must carry a `bk`
    * key column; the result is key-domain-sized (≤ 26·7³ rows) and meant
    * for `broadcast(...)`. The top-nStop pick is a limit over the tiny
    * key-count frame (TakeOrdered — no global window).
    */
  private def phoneticKeptKeys(gt: DataFrame, nStop: Int): DataFrame = {
    val counts = gt.groupBy("bk").agg(count(lit(1)).as("n_gt"))
    val stop = counts.orderBy(col("n_gt").desc, col("bk")).limit(nStop)
      .select("bk")
    counts.join(broadcast(stop), Seq("bk"), "left_anti").select("bk")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // J1: broadcast top-k TF-IDF cosine similarity join (word 1-gram, binary)
    "q30_cossim_word_topk" -> { (s, dir) =>
      val idx = new CosSimIndexer(tokenizer = "words", ngram = 1, binary = true,
        numCandidates = 3, lowerBound = 0.5)
      idx.fit(gtParts(s, dir)).transform(nmParts(s, dir))
        .select(col(Cols.Uid), col(Cols.GtUid),
                col("score").as("cos_score"), col("rank"))
    },

    // J2: blocked variant — per-first-char GT sub-indexes, global idf/norms
    "q31_cossim_blocked" -> { (s, dir) =>
      val idx = new CosSimIndexer(tokenizer = "words", ngram = 1, binary = true,
        numCandidates = 3, lowerBound = 0.5, blockingFunc = Some("first"))
      idx.fit(gtParts(s, dir)).transform(nmParts(s, dir))
        .select(col(Cols.Uid), col(Cols.GtUid),
                col("score").as("cos_score"), col("rank"))
    },

    // J3: sorted-neighbourhood indexing over the distinct sorted name list
    "q32_sni_window" -> { (s, dir) =>
      val idx = new SniIndexer(window = 2, maxGtPerName = 10)
      idx.fit(gtParts(s, dir)).transform(nmParts(s, dir))
        .select(col(Cols.Uid), col(Cols.GtUid),
                col("score").as("sni_score"), col("rank").as("sni_rank"))
    },

    // Blocking-quality report — the record-linkage evaluation pair every
    // blocking survey grades on (reduction ratio + pairs completeness,
    // Christen 2012): how many candidate pairs does a first-2-chars
    // blocking key generate vs the full cross product, and what fraction of
    // TRUE matches survives the blocking. The names side is a
    // deterministically-noised copy of GT (first word dropped — the
    // missing-token noise the reference's noiser applies), so completeness
    // is a real measurement, not a tautology. One hash agg per side on the
    // key, a key-count product sum (DECIMAL(38,0), overflow-impossible),
    // and a uid-equi join for the true-match survival check — every piece
    // map/agg bounded, nothing materializes the pair space itself
    "q169_blocking_quality" -> { (s, dir) =>
      val d38 = "decimal(38,0)"
      def key(c: org.apache.spark.sql.Column) = lower(substring(trim(c), 1, 2))
      val gtK = t(s, dir, "part")
        .select(col("p_partkey").as("gt_uid"), key(col("p_name")).as("bk"))
      val nmK = t(s, dir, "part").filter(col("p_partkey") < 500)
        .select(col("p_partkey").as("uid"),
          key(regexp_replace(col("p_name"), "^[^ ]* ", "")).as("bk"))
      val cand = nmK.groupBy("bk").agg(count(lit(1)).as("n_nm"))
        .join(gtK.groupBy("bk").agg(count(lit(1)).as("n_gt_k")), "bk")
        .agg(coalesce(sum(expr(s"CAST(n_nm AS $d38) * n_gt_k")), lit(0))
          .cast(d38).as("cand_pairs"))
      val found = nmK.join(gtK, nmK("uid") === gtK("gt_uid"))
        .filter(nmK("bk") === gtK("bk"))
        .agg(count(lit(1)).cast("long").as("found_true"))
      val sizes = nmK.agg(count(lit(1)).cast("long").as("n_names"))
        .crossJoin(gtK.agg(count(lit(1)).cast("long").as("n_gt")))
      sizes.crossJoin(broadcast(cand)).crossJoin(broadcast(found))
        .select(col("n_names"), col("n_gt"),
          col("cand_pairs").cast("long").as("cand_pairs"),
          expr(s"CAST(((CAST(n_names AS $d38) * n_gt - cand_pairs) * 1000000) " +
               s"div (CAST(n_names AS $d38) * n_gt) AS BIGINT)")
            .as("reduction_ppm"),
          col("found_true"),
          expr(s"CAST((CAST(found_true AS $d38) * 1000000) div n_names AS BIGINT)")
            .as("completeness_ppm"))
    },

    // P2 + J7 made oracle-visible (q54's structural-verdict recipe): the
    // output-column contract of the full match transform. keepAllCols=false
    // must emit ONLY caller input columns + preprocessed + gt_*/score_*/
    // rank_*/best_*/*_score match outputs (feature and tokenization
    // intermediates never leak); keepAllCols=true must re-join the
    // vectorizer intermediates (tokens, ngram_tokens, tf, features). Each
    // contract term is a machine-checked violation count the oracle pins
    // to zero, anchored by the relational names count
    "q253_output_pruning_contract" -> { (s, dir) =>
      val sp = s
      import sp.implicits._
      import graft.{EmParams, EntityMatching}
      val part = t(s, dir, "part")
      val gtRaw = part.select(
        col("p_partkey").cast("long").as(Cols.Uid),
        col("p_name").as(Cols.Name),
        col("p_brand").as(Cols.EntityId))
      val nmRaw = gtRaw.filter(col(Cols.Uid) < 300)
      def indexers() = Seq(
        new CosSimIndexer(tokenizer = "words", ngram = 1, binary = true,
          numCandidates = 3, lowerBound = 0.5),
        new SniIndexer(window = 2, maxGtPerName = 10))
      val pruned = EntityMatching(EmParams(), indexers())
        .fit(gtRaw).transform(nmRaw)
      val full = EntityMatching(EmParams(keepAllCols = true), indexers())
        .fit(gtRaw).transform(nmRaw)
      val inputCols = nmRaw.columns.toSet
      val allowed = (c: String) => inputCols.contains(c) ||
        c == Cols.Preprocessed ||
        Seq("gt_", "score_", "rank_", "best_").exists(c.startsWith) ||
        c.endsWith("_score")
      val leaked = pruned.columns.count(!allowed(_)).toLong
      val inputMissing =
        inputCols.count(!pruned.columns.contains(_)).toLong
      val intermediates = Seq("tokens", "ngram_tokens", "tf", "features")
      val interMissingPruned =
        intermediates.count(pruned.columns.contains).toLong // must be 0
      val interMissingFull =
        intermediates.count(!full.columns.contains(_)).toLong // must be 0
      val nNames = pruned.select(Cols.Uid).distinct().count()
      Seq((nNames, inputMissing, leaked, interMissingPruned,
          interMissingFull))
        .toDF("n_names", "input_cols_missing", "leaked_cols",
          "intermediates_leaked_when_pruned",
          "intermediates_missing_when_kept")
    },

    // P6 made oracle-visible: RE-MATCHING a previously-matched frame. A
    // prior pass's outputs (score_i/rank_i/gt_*) on the incoming names
    // would silently collide with this pass's columns; the conflicting-col
    // drop must make transform(transform(nm)) ≡ transform(nm) exactly —
    // asserted as two-sided exceptAll violation counts the oracle pins to
    // zero, anchored by the relational names count
    "q261_rematch_idempotent" -> { (s, dir) =>
      val sp = s
      import sp.implicits._
      val cs = new CandidateSelection(Seq(
        new CosSimIndexer(tokenizer = "words", ngram = 1, binary = true,
          numCandidates = 3, lowerBound = 0.5),
        new SniIndexer(window = 2, maxGtPerName = 10)))
      val model = cs.fit(gtParts(s, dir))
      val proj = (df: DataFrame) => df.select(Cols.Uid, Cols.GtUid,
        Cols.score(0), Cols.rank(0), Cols.score(1), Cols.rank(1))
      val clean = model.transform(nmParts(s, dir)).localCheckpoint()
      // the re-match input is ONE stale row per name (a user re-running a
      // previously-matched table), carrying the prior pass's score_i/
      // rank_i/gt_* columns that must be dropped, not collided with
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(Cols.Uid)
        .orderBy(coalesce(col(Cols.GtUid), lit(Long.MinValue)))
      val stale = clean.withColumn("__rn",
          org.apache.spark.sql.functions.row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
      val again = model.transform(stale).localCheckpoint()
      val nNames = clean.select(Cols.Uid).distinct().count()
      val onlyClean = proj(clean).exceptAll(proj(again)).count()
      val onlyAgain = proj(again).exceptAll(proj(clean)).count()
      Seq((nNames, onlyClean, onlyAgain))
        .toDF("n_names", "only_in_clean", "only_in_rematch")
    },

    // F20 made oracle-visible: the SNI mapping-function hook with the
    // reference's canonical example — REVERSED names, so the sorted
    // neighbourhood groups by suffix (legal-form endings) instead of
    // prefix. Full relational oracle: DuckDB ranks the same distinct name
    // list by reverse(p_name) and replays the ±2 offset join
    "q262_sni_reversed" -> { (s, dir) =>
      val idx = new SniIndexer(window = 2, maxGtPerName = 10,
        mappingFunc = Some((x: String) => x.reverse))
      idx.fit(gtParts(s, dir)).transform(nmParts(s, dir))
        .select(col(Cols.Uid), col(Cols.GtUid),
          col("score").as("sni_score"), col("rank").as("sni_rank"))
    },

    // EDIT-DISTANCE SIMILARITY JOIN — fuzzy matching as a JOIN, not a
    // pair metric (q25 scores given pairs; this FINDS the pairs): all part
    // names within levenshtein 2, candidates from rarest-q-gram prefix
    // filtering (constant k·q+1 grams per string), exact verify on
    // candidates only. The oracle is the BRUTE-FORCE n² levenshtein join —
    // so the prefix filter's zero-false-negative guarantee is itself the
    // thing under test, row for row
    "q260_fuzzy_join" -> { (s, dir) =>
      val names = t(s, dir, "part").filter(col("p_partkey") < 2000)
        .select(col("p_partkey").as("id"), col("p_name"))
      graft.operators.FuzzyJoin
        .editDistanceSelfJoin(names, "id", "p_name", maxDist = 2)
    },

    // MODEL CALIBRATION REPORT over a deterministic scorer — the
    // reliability diagram + per-bin ECE terms an ML-ops gate reads before
    // trusting scores as probabilities: the cossim candidate score is the
    // "confidence", entity equality the outcome, and each 0.1-wide score
    // bin reports confidence vs observed accuracy ENTIRELY in integer ppm
    // (scores rounded to 9 decimals first, q30's float discipline) — the
    // oracle replays the scorer AND the calibration arithmetic
    "q259_calibration_bins" -> { (s, dir) =>
      val idx = new CosSimIndexer(tokenizer = "words", ngram = 1,
        binary = true, numCandidates = 3, lowerBound = 0.2)
      // names = deterministically NOISED gt copies at VARYING noise
      // levels (uid mod 3: intact / first word dropped / first two words
      // dropped — q169's noise family), so the score distribution spreads
      // across bins and the diagram has real shape
      // part names are two words: keep both / last only / first only —
      // one-token scores vary with the kept token's idf and the gt norm,
      // spreading mass across several bins
      val noise = expr(
        """CASE CAST(uid % 3 AS INT)
           WHEN 0 THEN p_name
           WHEN 1 THEN regexp_replace(p_name, '^[^ ]* ', '')
           ELSE regexp_replace(p_name, ' [^ ]*$', '') END""")
      val noised = t(s, dir, "part").filter(col("p_partkey") < 300)
        .select(col("p_partkey").cast("long").as("uid"), col("p_name"),
          col("p_brand"))
        .select(col("uid").as(Cols.Uid), noise.as(Cols.Name),
          noise.as(Cols.Preprocessed), col("p_brand").as(Cols.EntityId))
      val cands = idx.fit(gtParts(s, dir)).transform(noised)
      val gtEnt = gtParts(s, dir)
        .select(col(Cols.Uid).as(Cols.GtUid), col(Cols.EntityId).as("gt_ent"))
      val nmEnt = noised
        .select(col(Cols.Uid), col(Cols.EntityId).as("nm_ent"))
      cands
        .join(broadcast(gtEnt), Seq(Cols.GtUid))
        .join(broadcast(nmEnt), Seq(Cols.Uid))
        .withColumn("score_ppm",
          floor(round(col("score"), 9) * 1e6).cast("long"))
        .withColumn("bin",
          least(expr("score_ppm div 100000"), lit(9L)).cast("int"))
        .groupBy("bin")
        .agg(count(lit(1)).cast("long").as("n"),
          sum(when(col("gt_ent") === col("nm_ent"), 1L).otherwise(0L))
            .cast("long").as("n_pos"),
          sum("score_ppm").cast("long").as("__s"))
        .select(col("bin"), col("n"), col("n_pos"),
          expr("__s div n").cast("long").as("conf_ppm"),
          expr("(n_pos * 1000000) div n").cast("long").as("acc_ppm"))
        .withColumn("gap_ppm", abs(col("conf_ppm") - col("acc_ppm")))
    },

    // PHONETIC BLOCKING candidate generation — the third classic blocking
    // family beside the reference's first-k-chars blocks (q31/q169) and its
    // sorted neighbourhood (q32): equal simplified-soundex keys of the
    // name's last token (Phonetic.soundex4; "SMITH"≡"SMYTHE" survives the
    // spelling noise that defeats prefix blocks). Scale discipline is the
    // frequent-key STOP LIST — the IR stopword rule: the nStop HOTTEST
    // keys (count desc, key — a total order) are dropped BEFORE the
    // candidate join, so the hottest phonetic key ("J500" in a real-name
    // corpus) never dominates a 1000-executor stage. The rule is
    // deliberately RELATIVE, not an absolute row cap: an absolute cap
    // silently drops EVERY block once the corpus grows past it (observed
    // at the 10× KTime probe in round 12 — 0 candidates), where the
    // top-k rule degrades never. Per-key counts are a key-domain-sized
    // agg (≤ 26·7³ keys, ever); the kept-key list broadcasts; candidates
    // are one shuffle equi-join on the key; nothing is ever name × name.
    "q336_phonetic_block" -> { (s, dir) =>
      val gt = t(s, dir, "part").select(
          col("p_partkey").cast("long").as("gt_uid"),
          graft.functions.Phonetic.soundex4(
            element_at(split(trim(col("p_name")), " "), -1)).as("bk"))
        .filter(col("bk").isNotNull)
      val nm = t(s, dir, "part").filter(col("p_partkey") < 100)
        .select(col("p_partkey").cast("long").as("uid"),
          graft.functions.Phonetic.soundex4(element_at(split(trim(
            regexp_replace(col("p_name"), "^[^ ]* ", "")), " "), -1))
            .as("bk"))
        .filter(col("bk").isNotNull)
      nm.join(broadcast(phoneticKeptKeys(gt, nStop = 2)), "bk")
        .join(gt, "bk")
        .select(col("uid"), col("gt_uid"), col("bk"))
    },

    // FastSS EDIT-DISTANCE SELF-JOIN (Bocek et al. 2007): every pair of
    // vocabulary words within levenshtein ≤ 2, found WITHOUT any quadratic
    // comparison — each word emits its ≤-2-deletion variants (fan-out
    // 1 + L + L(L−1)/2, map-only), pairs sharing a variant are candidates
    // (the FastSS guarantee: ed(a,b) ≤ d ⟹ the d-deletion neighbourhoods
    // intersect), then ONE exact levenshtein per distinct candidate pair
    // removes false positives. The oracle is the quadratic ground truth
    // itself, so a green row PROVES the neighbourhood method exhaustive.
    // Domain = the distinct vocabulary (q329's collapse), so frames are
    // vocab-sized at any corpus size; short hot variant keys are bounded
    // by the length ≥ 3 floor (the df-cap discipline of q40 applies if a
    // real corpus needs a per-variant cap).
    "q337_fastss_edit_join" -> { (s, dir) =>
      val words = t(s, dir, "part")
        .select(explode(split(col("p_name"), " ")).as("w"))
        .filter(length(col("w")) >= 3).distinct()
      val L = length(col("w"))
      val d1 = transform(sequence(lit(1), L), i =>
        concat(col("w").substr(lit(1), i - 1), col("w").substr(i + 1, L)))
      val d2 = flatten(transform(sequence(lit(1), L - 1), i =>
        transform(sequence(i + 1, L), j =>
          concat(col("w").substr(lit(1), i - 1),
            col("w").substr(i + 1, j - i - 1), col("w").substr(j + 1, L)))))
      val variants = words.select(col("w"),
        explode(array_distinct(concat(array(col("w")), d1, d2))).as("v"))
      val cand = variants.as("a").join(variants.as("b"),
          col("a.v") === col("b.v") && col("a.w") < col("b.w"))
        .select(col("a.w").as("w_a"), col("b.w").as("w_b")).distinct()
      cand.withColumn("dist",
          levenshtein(col("w_a"), col("w_b")).cast("long"))
        .filter(col("dist") <= 2)
    },

    // MUTUAL-BEST 1:1 MATCHING — the exclusive-assignment post-step the
    // reference's best-match ranking (W1) deliberately omits (its argmax is
    // per-name, so many names may claim one GT): a pair survives iff each
    // side is the other's nearest candidate under (levenshtein, id) total
    // order — the first round of stable matching, parallel by construction
    // (two per-key argmax aggs over the same candidate frame + one
    // equi-join; no sequential greedy loop, no driver state). Candidates
    // come from the q336 phonetic blocks, so the pair space is
    // block-bounded, never nm × gt.
    "q338_mutual_best" -> { (s, dir) =>
      import graft.functions.Phonetic
      def lastTok(c: org.apache.spark.sql.Column) =
        element_at(split(trim(c), " "), -1)
      val gt = t(s, dir, "part").select(
        col("p_partkey").cast("long").as("gt_uid"),
        col("p_name").as("gt_name"),
        Phonetic.soundex4(lastTok(col("p_name"))).as("bk"))
      val nm = t(s, dir, "part").filter(col("p_partkey") < 500)
        .select(col("p_partkey").cast("long").as("uid"),
          regexp_replace(col("p_name"), "^[^ ]* ", "").as("name"))
        .withColumn("bk", Phonetic.soundex4(lastTok(col("name"))))
      // q336's stop list gates the pair space here too — the hottest
      // keys never reach the levenshtein join (without it this query's
      // 10× KTime probe went SUPER-linear: 10.8 s → 17.2 s)
      val kept = phoneticKeptKeys(gt.filter(col("bk").isNotNull),
        nStop = 2)
      val cand = nm.join(broadcast(kept), "bk").join(gt, "bk")
        .select(col("uid"), col("gt_uid"),
          levenshtein(col("name"), col("gt_name")).cast("long").as("d"))
      val bestNm = cand.groupBy("uid")
        .agg(min(struct(col("d"), col("gt_uid"))).as("b"))
        .select(col("uid"), col("b.gt_uid").as("gt_uid"), col("b.d").as("d"))
      val bestGt = cand.groupBy("gt_uid")
        .agg(min(struct(col("d"), col("uid"))).as("b"))
        .select(col("gt_uid"), col("b.uid").as("uid"))
      bestNm.join(bestGt, Seq("uid", "gt_uid"))
        .select(col("uid"), col("gt_uid"), col("d"))
    },

    // full candidate selection: cossim + SNI, merged, GT info, no-match keep
    "q33_candidate_selection" -> { (s, dir) =>
      val cs = new CandidateSelection(Seq(
        new CosSimIndexer(tokenizer = "words", ngram = 1, binary = true,
          numCandidates = 3, lowerBound = 0.5),
        new SniIndexer(window = 2, maxGtPerName = 10)))
      cs.fit(gtParts(s, dir)).transform(nmParts(s, dir))
        .select(Cols.Uid, Cols.Name, Cols.GtUid,
                Cols.score(0), Cols.rank(0), Cols.score(1), Cols.rank(1),
                Cols.gt(Cols.EntityId), Cols.gt(Cols.Name))
    })

  /** Shared SQL pieces: word 1-gram binary TF-IDF over GT = part,
    * names = part with partkey < 100.
    */
  private val tfidfCtes =
    """gt AS (SELECT p_partkey AS gt_uid, p_name, p_brand FROM part),
       nm AS (SELECT p_partkey AS uid, p_name FROM part WHERE p_partkey < 100),
       gt_tok AS (SELECT gt_uid, unnest(list_distinct(string_split(p_name, ' '))) AS tok FROM gt),
       dfreq AS (SELECT tok, count(*) AS df FROM gt_tok GROUP BY tok),
       total AS (SELECT count(*) AS n FROM gt),
       idf AS (SELECT tok, ln((n + 1.0) / (df + 1.0)) AS idf FROM dfreq, total),
       gt_w AS (SELECT gt_uid, tok, idf FROM gt_tok JOIN idf USING (tok)),
       gt_norm AS (SELECT gt_uid, sqrt(sum(idf * idf)) AS nrm FROM gt_w GROUP BY gt_uid),
       nm_tok AS (SELECT uid, unnest(list_distinct(string_split(p_name, ' '))) AS tok FROM nm),
       nm_w AS (SELECT uid, tok, idf FROM nm_tok JOIN idf USING (tok)),
       nm_norm AS (SELECT uid, sqrt(sum(idf * idf)) AS nrm FROM nm_w GROUP BY uid)"""

  private def cossimSql(blocked: Boolean): String = {
    val blockPred =
      if (blocked)
        """ AND EXISTS (SELECT 1 FROM nm x, gt y
             WHERE x.uid = d.uid AND y.gt_uid = d.gt_uid
               AND substr(x.p_name, 1, 1) = substr(y.p_name, 1, 1))"""
      else ""
    s"""WITH $tfidfCtes,
        dots AS (SELECT uid, gt_uid, sum(a.idf * b.idf) AS dot
                 FROM nm_w a JOIN gt_w b USING (tok) GROUP BY uid, gt_uid),
        scored AS (
          SELECT d.uid, d.gt_uid,
                 round(d.dot / (nn.nrm * gn.nrm), 9) AS cos_score
          FROM dots d JOIN nm_norm nn ON d.uid = nn.uid
                      JOIN gt_norm gn ON d.gt_uid = gn.gt_uid
          WHERE 1 = 1$blockPred),
        ranked AS (
          SELECT uid, gt_uid, cos_score,
                 CAST(row_number() OVER (PARTITION BY uid
                      ORDER BY cos_score DESC, gt_uid) AS INT) AS rank
          FROM scored)
        SELECT uid, gt_uid, cos_score, rank
        FROM ranked WHERE cos_score >= 0.5 AND rank <= 3"""
  }

  private val sniSql =
    """WITH gt0 AS (SELECT p_partkey AS gt_uid, p_name FROM part),
        gt AS (SELECT gt_uid, p_name FROM (
                 SELECT gt_uid, p_name,
                        row_number() OVER (PARTITION BY p_name ORDER BY gt_uid) AS rn
                 FROM gt0) WHERE rn <= 10),
        nm AS (SELECT p_partkey AS uid, p_name FROM part WHERE p_partkey < 100),
        all_names AS (SELECT DISTINCT p_name FROM (
          SELECT p_name FROM gt UNION ALL SELECT p_name FROM nm)),
        ranked AS (SELECT p_name, row_number() OVER (ORDER BY p_name) - 1 AS r
                   FROM all_names),
        gtr AS (SELECT gt_uid, r AS gt_r FROM gt JOIN ranked USING (p_name)),
        nmr AS (SELECT uid, r FROM nm JOIN ranked USING (p_name))
        SELECT uid, gt_uid,
               1.0 - abs(nmr.r - gtr.gt_r) / 3.0 AS sni_score,
               CAST(abs(nmr.r - gtr.gt_r) AS INT) AS sni_rank
        FROM nmr JOIN gtr ON abs(nmr.r - gtr.gt_r) <= 2"""

  /** The DuckDB replay of [[graft.functions.Phonetic.soundex4]] on the
    * last whitespace token of `e`. */
  private def lastTokSoundexSql(e: String): String =
    graft.functions.Phonetic.soundex4Sql(s"string_split(trim($e), ' ')[-1]")

  val oracleSql: Map[String, String] = Map(
    "q336_phonetic_block" -> {
      val gtk = lastTokSoundexSql("p_name")
      val nmk = lastTokSoundexSql("regexp_replace(p_name, '^[^ ]* ', '')")
      s"""WITH gt AS (SELECT p_partkey AS gt_uid, $gtk AS bk FROM part),
          kept AS (SELECT bk FROM (
                     SELECT bk, row_number() OVER (
                              ORDER BY count(*) DESC, bk) AS rk
                     FROM gt WHERE bk IS NOT NULL GROUP BY bk)
                   WHERE rk > 2),
          nm AS (SELECT p_partkey AS uid, $nmk AS bk
                 FROM part WHERE p_partkey < 100)
          SELECT CAST(uid AS BIGINT) AS uid, CAST(gt_uid AS BIGINT) AS gt_uid,
                 bk
          FROM nm JOIN kept USING (bk) JOIN gt USING (bk)
          WHERE nm.bk IS NOT NULL"""
    },
    // the QUADRATIC ground truth — deliberately simpler than the engine's
    // FastSS path, so a green row proves the deletion-neighbourhood method
    // finds every pair (vocab-sized domain keeps the oracle cheap)
    "q337_fastss_edit_join" ->
      """WITH w0 AS (SELECT DISTINCT unnest(string_split(p_name, ' ')) AS w
                     FROM part),
          w AS (SELECT w FROM w0 WHERE length(w) >= 3)
          SELECT a.w AS w_a, b.w AS w_b,
                 CAST(levenshtein(a.w, b.w) AS BIGINT) AS dist
          FROM w a JOIN w b ON a.w < b.w
          WHERE levenshtein(a.w, b.w) <= 2""",
    "q338_mutual_best" -> {
      val gtk = lastTokSoundexSql("p_name")
      val nmk = lastTokSoundexSql("name")
      s"""WITH gt AS (SELECT p_partkey AS gt_uid, p_name AS gt_name,
                             $gtk AS bk FROM part),
          kept AS (SELECT bk FROM (
                     SELECT bk, row_number() OVER (
                              ORDER BY count(*) DESC, bk) AS rk
                     FROM gt WHERE bk IS NOT NULL GROUP BY bk)
                   WHERE rk > 2),
          nm0 AS (SELECT p_partkey AS uid,
                         regexp_replace(p_name, '^[^ ]* ', '') AS name
                  FROM part WHERE p_partkey < 500),
          nm AS (SELECT uid, name, $nmk AS bk FROM nm0),
          cand AS (SELECT uid, gt_uid,
                          CAST(levenshtein(name, gt_name) AS BIGINT) AS d
                   FROM nm JOIN kept USING (bk) JOIN gt USING (bk)),
          bn AS (SELECT uid, gt_uid, d FROM (
                   SELECT *, row_number() OVER (PARTITION BY uid
                        ORDER BY d, gt_uid) AS rn FROM cand) WHERE rn = 1),
          bg AS (SELECT uid, gt_uid FROM (
                   SELECT *, row_number() OVER (PARTITION BY gt_uid
                        ORDER BY d, uid) AS rn FROM cand) WHERE rn = 1)
          SELECT CAST(uid AS BIGINT) AS uid,
                 CAST(gt_uid AS BIGINT) AS gt_uid, d
          FROM bn JOIN bg USING (uid, gt_uid)"""
    },
    "q261_rematch_idempotent" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_names,
                CAST(0 AS BIGINT) AS only_in_clean,
                CAST(0 AS BIGINT) AS only_in_rematch
         FROM part WHERE p_partkey < 100""",
    "q262_sni_reversed" ->
      """WITH gt0 AS (SELECT p_partkey AS gt_uid, p_name FROM part),
          gt AS (SELECT gt_uid, p_name FROM (
                   SELECT gt_uid, p_name,
                          row_number() OVER (PARTITION BY p_name ORDER BY gt_uid) AS rn
                   FROM gt0) WHERE rn <= 10),
          nm AS (SELECT p_partkey AS uid, p_name FROM part WHERE p_partkey < 100),
          all_names AS (SELECT DISTINCT p_name FROM (
            SELECT p_name FROM gt UNION ALL SELECT p_name FROM nm)),
          ranked AS (SELECT p_name,
                            row_number() OVER (ORDER BY reverse(p_name)) - 1 AS r
                     FROM all_names),
          gtr AS (SELECT gt_uid, r AS gt_r FROM gt JOIN ranked USING (p_name)),
          nmr AS (SELECT uid, r FROM nm JOIN ranked USING (p_name))
          SELECT uid, gt_uid,
                 1.0 - abs(nmr.r - gtr.gt_r) / 3.0 AS sni_score,
                 CAST(abs(nmr.r - gtr.gt_r) AS INT) AS sni_rank
          FROM nmr JOIN gtr ON abs(nmr.r - gtr.gt_r) <= 2""",
    "q260_fuzzy_join" ->
      """WITH nm AS (SELECT p_partkey AS id, p_name
                     FROM part WHERE p_partkey < 2000)
         SELECT a.id AS id_a, b.id AS id_b,
                CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist
         FROM nm a JOIN nm b ON a.id < b.id
         WHERE levenshtein(a.p_name, b.p_name) <= 2""",
    "q259_calibration_bins" ->
      s"""WITH gt AS (SELECT p_partkey AS gt_uid, p_name, p_brand FROM part),
          nm AS (SELECT p_partkey AS uid,
                        CASE CAST(p_partkey % 3 AS INT)
                        WHEN 0 THEN p_name
                        WHEN 1 THEN regexp_replace(p_name, '^[^ ]* ', '')
                        ELSE regexp_replace(p_name, ' [^ ]*$$', '')
                        END AS p_name,
                        p_brand
                 FROM part WHERE p_partkey < 300),
          gt_tok AS (SELECT gt_uid, unnest(list_distinct(string_split(p_name, ' '))) AS tok FROM gt),
          dfreq AS (SELECT tok, count(*) AS df FROM gt_tok GROUP BY tok),
          total AS (SELECT count(*) AS n FROM gt),
          idf AS (SELECT tok, ln((n + 1.0) / (df + 1.0)) AS idf FROM dfreq, total),
          gt_w AS (SELECT gt_uid, tok, idf FROM gt_tok JOIN idf USING (tok)),
          gt_norm AS (SELECT gt_uid, sqrt(sum(idf * idf)) AS nrm FROM gt_w GROUP BY gt_uid),
          nm_tok AS (SELECT uid, unnest(list_distinct(string_split(p_name, ' '))) AS tok FROM nm),
          nm_w AS (SELECT uid, tok, idf FROM nm_tok JOIN idf USING (tok)),
          nm_norm AS (SELECT uid, sqrt(sum(idf * idf)) AS nrm FROM nm_w GROUP BY uid),
          dots AS (SELECT uid, gt_uid, sum(a.idf * b.idf) AS dot
                   FROM nm_w a JOIN gt_w b USING (tok) GROUP BY uid, gt_uid),
          scored AS (
            SELECT d.uid, d.gt_uid,
                   round(d.dot / (nn.nrm * gn.nrm), 9) AS cos_score
            FROM dots d JOIN nm_norm nn ON d.uid = nn.uid
                        JOIN gt_norm gn ON d.gt_uid = gn.gt_uid),
          ranked AS (
            SELECT uid, gt_uid, cos_score,
                   CAST(row_number() OVER (PARTITION BY uid
                        ORDER BY cos_score DESC, gt_uid) AS INT) AS rank
            FROM scored),
          cand AS (
            SELECT uid, gt_uid, cos_score
            FROM ranked WHERE cos_score >= 0.2 AND rank <= 3),
          lab AS (
            SELECT c.uid, c.gt_uid,
                   CAST(floor(c.cos_score * 1000000) AS BIGINT) AS score_ppm,
                   CASE WHEN ne.p_brand = ge.p_brand THEN 1 ELSE 0 END
                     AS label
            FROM cand c
            JOIN nm ne ON ne.uid = c.uid
            JOIN gt ge ON ge.gt_uid = c.gt_uid),
          b AS (
            SELECT CAST(least(score_ppm // 100000, 9) AS INT) AS bin,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(label) AS BIGINT) AS n_pos,
                   CAST(sum(score_ppm) AS BIGINT) AS s
            FROM lab GROUP BY 1)
          SELECT bin, n, n_pos,
                 CAST(s // n AS BIGINT) AS conf_ppm,
                 CAST(n_pos * 1000000 // n AS BIGINT) AS acc_ppm,
                 CAST(abs(s // n - n_pos * 1000000 // n) AS BIGINT)
                   AS gap_ppm
          FROM b""",
    "q253_output_pruning_contract" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_names,
                CAST(0 AS BIGINT) AS input_cols_missing,
                CAST(0 AS BIGINT) AS leaked_cols,
                CAST(0 AS BIGINT) AS intermediates_leaked_when_pruned,
                CAST(0 AS BIGINT) AS intermediates_missing_when_kept
         FROM part WHERE p_partkey < 300""",
    "q30_cossim_word_topk" -> cossimSql(blocked = false),
    "q31_cossim_blocked"   -> cossimSql(blocked = true),
    "q32_sni_window"       -> sniSql,
    "q169_blocking_quality" ->
      """WITH gt AS (
           SELECT p_partkey AS gt_uid,
                  lower(substr(trim(p_name), 1, 2)) AS bk
           FROM part),
         nm AS (
           SELECT p_partkey AS uid,
                  lower(substr(trim(regexp_replace(p_name, '^[^ ]* ', '')),
                               1, 2)) AS bk
           FROM part WHERE p_partkey < 500),
         cand AS (
           SELECT CAST(coalesce(sum(CAST(a.n_nm AS HUGEINT) * b.n_gt_k), 0)
                       AS HUGEINT) AS cand_pairs
           FROM (SELECT bk, count(*) AS n_nm FROM nm GROUP BY bk) a
           JOIN (SELECT bk, count(*) AS n_gt_k FROM gt GROUP BY bk) b
             USING (bk)),
         found AS (
           SELECT CAST(count(*) AS BIGINT) AS found_true
           FROM nm JOIN gt ON nm.uid = gt.gt_uid AND nm.bk = gt.bk),
         sizes AS (
           SELECT (SELECT CAST(count(*) AS BIGINT) FROM nm) AS n_names,
                  (SELECT CAST(count(*) AS BIGINT) FROM gt) AS n_gt)
         SELECT n_names, n_gt,
                CAST(cand_pairs AS BIGINT) AS cand_pairs,
                CAST(((CAST(n_names AS HUGEINT) * n_gt - cand_pairs) * 1000000)
                     // (CAST(n_names AS HUGEINT) * n_gt) AS BIGINT)
                  AS reduction_ppm,
                found_true,
                CAST((CAST(found_true AS HUGEINT) * 1000000) // n_names
                     AS BIGINT) AS completeness_ppm
         FROM sizes CROSS JOIN cand CROSS JOIN found""",
    "q33_candidate_selection" ->
      s"""WITH $tfidfCtes,
          dots AS (SELECT uid, gt_uid, sum(a.idf * b.idf) AS dot
                   FROM nm_w a JOIN gt_w b USING (tok) GROUP BY uid, gt_uid),
          cossim AS (
            SELECT uid, gt_uid, cos_score AS score_0, rank AS rank_0 FROM (
              SELECT d.uid, d.gt_uid,
                     round(d.dot / (nn.nrm * gn.nrm), 9) AS cos_score,
                     CAST(row_number() OVER (PARTITION BY d.uid
                          ORDER BY round(d.dot / (nn.nrm * gn.nrm), 9) DESC, d.gt_uid) AS INT) AS rank
              FROM dots d JOIN nm_norm nn ON d.uid = nn.uid
                          JOIN gt_norm gn ON d.gt_uid = gn.gt_uid)
            WHERE cos_score >= 0.5 AND rank <= 3),
          sni_gt AS (SELECT gt_uid, p_name FROM (
                 SELECT gt_uid, p_name,
                        row_number() OVER (PARTITION BY p_name ORDER BY gt_uid) AS rn
                 FROM gt) WHERE rn <= 10),
          all_names AS (SELECT DISTINCT p_name FROM (
            SELECT p_name FROM sni_gt UNION ALL SELECT p_name FROM nm)),
          rankedn AS (SELECT p_name, row_number() OVER (ORDER BY p_name) - 1 AS r
                      FROM all_names),
          gtr AS (SELECT gt_uid, r AS gt_r FROM sni_gt JOIN rankedn USING (p_name)),
          nmr AS (SELECT uid, r FROM nm JOIN rankedn USING (p_name)),
          sni AS (SELECT uid, gt_uid,
                         1.0 - abs(nmr.r - gtr.gt_r) / 3.0 AS score_1,
                         CAST(abs(nmr.r - gtr.gt_r) AS INT) AS rank_1
                  FROM nmr JOIN gtr ON abs(nmr.r - gtr.gt_r) <= 2),
          merged AS (
            SELECT uid, gt_uid, max(score_0) AS score_0, max(rank_0) AS rank_0,
                   max(score_1) AS score_1, max(rank_1) AS rank_1
            FROM (
              SELECT uid, gt_uid, score_0, rank_0,
                     CAST(NULL AS DOUBLE) AS score_1, CAST(NULL AS INT) AS rank_1 FROM cossim
              UNION ALL
              SELECT uid, gt_uid, CAST(NULL AS DOUBLE), CAST(NULL AS INT), score_1, rank_1 FROM sni)
            GROUP BY uid, gt_uid),
          cands AS (
            SELECT m.*, g.p_brand AS gt_entity_id, g.p_name AS gt_name
            FROM merged m JOIN gt g USING (gt_uid))
          SELECT nm.uid, nm.p_name AS name, c.gt_uid,
                 c.score_0, c.rank_0, c.score_1, c.rank_1,
                 c.gt_entity_id, c.gt_name
          FROM nm LEFT JOIN cands c ON nm.uid = c.uid""")
}
