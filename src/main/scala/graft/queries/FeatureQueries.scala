package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Cols
import graft.agg.EntityAggregation
import graft.features.{PairFeatures, Vocabulary}
import graft.idx.CosSimIndexer

/** Pair-feature extraction, best-match window, and account aggregation
  * operators with DuckDB oracles.
  */
object FeatureQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    graft.sources.Tables(s, dir, name)

  /** Blocked name-pair set used for the pair-feature oracles: parts of the
    * same brand, left key < 100 to bound the pair count.
    */
  private def pairSet(s: SparkSession, dir: String): DataFrame = {
    val p = t(s, dir, "part").select("p_partkey", "p_name", "p_brand")
    val a = p.toDF(Cols.Uid, Cols.Preprocessed, "brand").filter(col(Cols.Uid) < 100)
    val b = p.toDF(Cols.GtUid, Cols.GtPreprocessed, "brand")
    a.join(b, "brand").filter(col(Cols.Uid) =!= col(Cols.GtUid))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Deterministic categorical encoder with an OOV bucket — the
    // StringIndexer replacement a training pipeline can REPLAY: ids by
    // (freq desc, value asc) with no hash-order ties, vocabulary capped at
    // 10 (the rest fall to the OOV id), min support 2. Fit = one hash agg +
    // GlobalRank over ≤ 10 rows; encode = broadcast left join, map-side
    // fallback. DuckDB replays the whole id assignment with a window
    "q194_category_encode" -> { (s, dir) =>
      import graft.features.CategoryEncoder
      val docs = t(s, dir, "documents").select("doc_id", "source")
      val mapping = CategoryEncoder.fit(docs, "source", maxSize = 10,
        minFreq = 2L)
      CategoryEncoder.encode(docs, "source", mapping, "source_id")
        .select("doc_id", "source", "source_id", "source_id_is_oov")
    },

    // the five fuzzy ratios made ORACLE-VISIBLE (previously unit-only — no
    // SQL analog exists for the algorithms themselves, so this is the q97
    // invariant recipe over their mathematical properties, all on the
    // library's rapidfuzz/100 scale): identity pairs score exactly 1 on
    // every ratio; a word-permuted name scores 1 on the order-insensitive
    // token_sort/token_set ratios and >= 0.95 on w_ratio (the WRatio
    // formula's 0.95 * max(token ratios) floor at equal lengths); a PREFIX
    // substring scores partial_ratio 1 (an exact window exists); every
    // ratio of a cross pair lies in [0,1]. The pair count is replayed
    // exactly by DuckDB from the same cyclic-neighbour arithmetic
    "q115_fuzzy_invariants" -> { (s, dir) =>
      val names = t(s, dir, "part").filter(col("p_partkey") <= 200)
        .select(col("p_partkey").cast("long").as(Cols.Uid),
                lower(col("p_name")).as(Cols.Preprocessed))
      // permuted twin: words reversed; contained twin: first two words
      val withTwins = names
        .withColumn("__perm",
          array_join(reverse(split(col(Cols.Preprocessed), " ")), " "))
        .withColumn("__sub",
          array_join(slice(split(col(Cols.Preprocessed), " "), 1, 2), " "))
      def feats(df: DataFrame) = PairFeatures.withStringFeatures(df)
      val self = feats(withTwins.withColumn(Cols.GtPreprocessed, col(Cols.Preprocessed)))
      val perm = feats(withTwins.withColumn(Cols.GtPreprocessed, col("__perm")))
      val sub  = feats(withTwins.withColumn(Cols.GtPreprocessed, col("__sub")))
      // cross pairs: each name against the next one cyclically
      val nextName = names.select(
        (((col(Cols.Uid) % 200) + 1)).as(Cols.Uid),
        col(Cols.Preprocessed).as(Cols.GtPreprocessed))
      val cross = feats(withTwins.join(nextName, Seq(Cols.Uid)))
      val ratios = Seq("ratio", "token_sort_ratio", "token_set_ratio",
        "partial_ratio", "w_ratio")
      val selfViol = self.filter(ratios.map(col(_) =!= 1.0).reduce(_ || _)).count()
      val permViol = perm.filter(
        col("token_sort_ratio") =!= 1.0 || col("token_set_ratio") =!= 1.0 ||
        col("w_ratio") < 0.95 - 1e-9).count()
      val subViol = sub.filter(col("partial_ratio") =!= 1.0).count()
      val rangeViol = cross.filter(
        ratios.map(r => col(r) < 0.0 || col(r) > 1.0).reduce(_ || _)).count()
      val nPairs = cross.count()
      val sp = s
      import sp.implicits._
      Seq((nPairs, selfViol == 0L, permViol == 0L, subViol == 0L, rangeViol == 0L))
        .toDF("n_cross_pairs", "self_is_1", "permutation_invariant",
          "substring_partial_1", "ratios_in_range")
    },

    // the regex/transliteration UDF tier (F1 strip-accents, F7/F8
    // abbreviation merges, F12 remove-legal-form, N1 abbr_match, N9 LEF
    // features, plus the named pipelines composing them) made
    // ORACLE-VISIBLE: the reference pins these with golden literal cases
    // (tests/unit/test_abbreviations.py, test_name_preprocessing.py,
    // test_features_lef.py); this query embeds those (input, expected)
    // literals, runs the REAL column surfaces over them, and emits one
    // (kind, n_cases, all_pass) row per surface — the oracle replays the
    // literal case counts and expects every verdict TRUE, so any regression
    // in the imperative string kernels turns a correctness row red
    "q156_regex_golden" -> { (s, dir) =>
      import graft.functions.{Abbreviations, LegalForms}
      import graft.preprocess.Preprocessor
      val sp = s
      import sp.implicits._
      val cases: Seq[(String, String, String, String)] = Seq(
        // F1 strip_accents_unicode
        ("strip_accents", "Tzu-Sun_BV.a;b,c_ä", "", "Tzu-Sun_BV.a;b,c_a"),
        ("strip_accents", "ąćęłńóśźżĄĆĘŁŃÓŚŹŻ", "", "acelnoszzACELNOSZZ"),
        ("strip_accents", "Café", "", "Cafe"),
        ("strip_accents", "Ångström ØRSTED", "", "Angstrom ORSTED"),
        ("strip_accents", "Москва", "", "Moskva"),
        // F7 merge_abbreviations (abbreviation_util.abbreviations_to_words)
        ("merge_abbr", "Fenerbahce S. K.", "", "Fenerbahce SK"),
        ("merge_abbr", "a.b.c. b.v.", "", "abc bv"),
        ("merge_abbr", "a b cde", "", "ab cde"),
        ("merge_abbr", "a. b. van den xyz b.v.", "", "ab van den xyz bv"),
        ("merge_abbr", "a.b.c.def", "", "abc def"),
        ("merge_abbr", "a.b.c. def", "", "abc def"),
        ("merge_abbr", "a b c.d.", "", "ab cd"),
        ("merge_abbr", "abc b.v", "", "abc bv"),
        ("merge_abbr", "abc b.b.v", "", "abc bbv"),
        ("merge_abbr", "abc b.b v.x", "", "abc bb vx"),
        ("merge_abbr", "abc b. b. v", "", "abc bbv"),
        ("merge_abbr", "abc b.v x", "", "abc bv x"),
        ("merge_abbr", "ING BANK B.V.", "", "ING BANK BV"),
        // F8 merge_legal_form_abbreviations
        ("merge_legal", "tzu sun b.v.", "", "tzu sun bv"),
        ("merge_legal", "bank x.y.", "", "bank x.y."),
        // full preprocess_name pipeline
        ("pipeline_name", "Tzu-Sun_BV.a;b,c_ä", "", "tzu sun bv a b c a"),
        ("pipeline_name", "Tzu-Sun_BV  morethan1space", "", "tzu sun bv morethan1space"),
        // full preprocess_merge_abbr pipeline
        ("pipeline_merge_abbr", "Tzu-Sun_B.V.a;b,c_ä", "", "tzu sun b v a b c a"),
        ("pipeline_merge_abbr", "Z. S. B. V.", "", "zsbv"),
        ("pipeline_merge_abbr", "Z Sun B V", "", "z sun bv"),
        ("pipeline_merge_abbr", "Z. Sun B.V.", "", "z sun bv"),
        ("pipeline_merge_abbr", "Z Sun B.V", "", "z sun bv"),
        // full preprocess_merge_legal_abbr pipeline
        ("pipeline_merge_legal", "Tzu-Sun B. V.", "", "tzu sun bv"),
        ("pipeline_merge_legal", "Tzu-Sun B.V", "", "tzu sun bv"),
        ("pipeline_merge_legal", "Tzu-Sun B V", "", "tzu sun bv"),
        ("pipeline_merge_legal", "Tzu-Sun BV.", "", "tzu sun bv"),
        ("pipeline_merge_legal", "J. Arnheim. N.V.", "", "j arnheim nv"),
        ("pipeline_merge_legal", "J.A. N. V.", "", "j a n v"),
        ("pipeline_merge_legal", "J.A. vof", "", "j a vof"),
        ("pipeline_merge_legal", "cris adamsky s.p.z.o.o.", "", "cris adamsky spzoo"),
        // F12 remove_legal_form
        ("remove_lef", "Tzu-Sun Ltd", "", "Tzu-Sun"),
        ("remove_lef", "Tzu-Sun GMBH", "", "Tzu-Sun"),
        ("remove_lef", "Ltd Tzu-Sun", "", "Tzu-Sun"),
        ("remove_lef", "Tzu Ltd Sun", "", "Tzu Sun"),
        ("remove_lef", "Tzu-Sun sp. z o.o.", "", "Tzu-Sun"),
        ("remove_lef", "Tzu-Sun sp. z.o.o.", "", "Tzu-Sun"),
        ("remove_lef", "Acme Widgets", "", "Acme Widgets"),
        // merge_& step
        ("merge_amp", "xyz & abc C&D", "", "xyz & abc CD"),
        ("merge_amp", "foobar S/A", "", "foobar SA"),
        // hyphen / punctuation steps
        ("strip_hyphens", "Tzu-Sun_BV.a;b,c_ä", "", "Tzu Sun BV.a;b,c ä"),
        ("strip_punct", "Tzu-Sun_BV:Chinese'Dutch.a;b,c_ä", "",
          "Tzu Sun BV Chinese Dutch a b c ä"),
        ("space_punct", "Tzu-Sun_BV:Chinese'Dutch.a;b,c_ä", "",
          "Tzu - Sun _ BV : Chinese ' Dutch . a ; b , c _ ä"),
        // abbreviation finders (abbreviation_util.find_abbr_*)
        ("abbr_initials", "38th International Conference on Very Large Databases, Turkey 2012", "", ""),
        ("abbr_initials", "VLDB 2012 Conf TR", "", "VLDB TR"),
        ("abbr_initials", "International V.L.D.B. Conference, 2013", "", "VLDB"),
        ("abbr_initials", "WarnerBros Entertainment", "", ""),
        ("abbr_initials", "PetroBras B.V.", "", "BV"),
        ("abbr_initials", "Petroleo Brasileiro B.V.", "", "BV"),
        ("abbr_pieces", "38th International Conference on Very Large Databases, Turkey 2012", "", ""),
        ("abbr_pieces", "VLDB 2012 Conf TR", "", ""),
        ("abbr_pieces", "International V.L.D.B. Conference, 2013", "", ""),
        ("abbr_pieces", "WarnerBros Entertainment", "", "WarnerBros"),
        ("abbr_pieces", "PetroBras B.V.", "", "PetroBras"),
        ("abbr_pieces", "Petroleo Brasileiro B.V.", "", ""),
        // N1 abbr_match over pairs
        ("abbr_match", "SK Industries", "Fenerbahce Spor Klubu", "true"),
        ("abbr_match", "PetroBras", "Petroleo Brasileiro B.V.", "true"),
        ("abbr_match", "XYZ", "completely different", "false"),
        // N9 LEF extraction + pair classification
        ("lef_extract", "Some Big Pharma B.V.", "", "bv"),
        ("lef_extract", "Some Big Pharma flobble.", "", ""),
        ("lef_extract", "Some Big Pharma NV", "", "nv"),
        ("lef_match", "Acme B.V.", "Acme B.V.", "identical"),
        ("lef_match", "Acme B.V.", "Acme", "lef2_missing"),
        ("lef_match", "Acme", "Acme B.V.", "lef1_missing"),
        ("lef_match", "Acme B.V.", "Acme N.V.", "no_match"),
        ("lef_match", "Acme B.V. N.V.", "Acme N.V.", "partial"),
        ("lef_match", "Acme", "Beta", "both_missing"))
      val df = cases.toDF("kind", "a", "b", "expected")
      val abbrInitialsUdf =
        udf((x: String) => Abbreviations.findAbbrMergedInitials(x).mkString(" "))
      val abbrPiecesUdf =
        udf((x: String) => Abbreviations.findAbbrMergedWordPieces(x).mkString(" "))
      val abbrMatchUdf =
        udf((x: String, y: String) => Abbreviations.abbrMatch(x, y).toString)
      val lefExtractUdf =
        udf((x: String) => LegalForms.extract(x).mkString(" "))
      val lefMatchUdf =
        udf((x: String, y: String) => LegalForms.matchClass(x, y))
      def step(name: String) = Preprocessor.functions(name)(col("a"))
      def pipe(name: String) =
        Preprocessor.expr(col("a"), Preprocessor.pipelines(name))
      val actual = when(col("kind") === "strip_accents", step("strip_accents_unicode"))
        .when(col("kind") === "merge_abbr", step("merge_abbreviations"))
        .when(col("kind") === "merge_legal", step("merge_legal_form_abbreviations"))
        .when(col("kind") === "pipeline_name", pipe("preprocess_name"))
        .when(col("kind") === "pipeline_merge_abbr", pipe("preprocess_merge_abbr"))
        .when(col("kind") === "pipeline_merge_legal", pipe("preprocess_merge_legal_abbr"))
        .when(col("kind") === "remove_lef", step("remove_legal_form"))
        .when(col("kind") === "merge_amp", step("merge_&"))
        .when(col("kind") === "strip_hyphens", step("strip_hyphens"))
        .when(col("kind") === "strip_punct", step("strip_punctuation"))
        .when(col("kind") === "space_punct", step("insert_space_around_punctuation"))
        .when(col("kind") === "abbr_initials", abbrInitialsUdf(col("a")))
        .when(col("kind") === "abbr_pieces", abbrPiecesUdf(col("a")))
        .when(col("kind") === "abbr_match", abbrMatchUdf(col("a"), col("b")))
        .when(col("kind") === "lef_extract", lefExtractUdf(col("a")))
        .when(col("kind") === "lef_match", lefMatchUdf(col("a"), col("b")))
      df.withColumn("actual", actual)
        .groupBy("kind")
        .agg(count(lit(1)).cast("long").as("n_cases"),
          (sum(when(col("actual") === col("expected"), 1L).otherwise(0L)) ===
            count(lit(1))).as("all_pass"))
    },

    // model persistence (S3) made ORACLE-VISIBLE: fit -> save -> load ->
    // transform on BOTH models; the loaded model must reproduce the fitted
    // model's candidates EXACTLY (set equality both ways), the property the
    // reference's persistence tests gate. The scored-name count replays
    "q116_persistence_roundtrip" -> { (s, dir) =>
      import graft.{EmParams, EntityMatching, Persistence}
      val gtRaw = t(s, dir, "part").select(
        col("p_partkey").cast("long").as(Cols.Uid),
        col("p_name").as(Cols.Name),
        col("p_brand").as(Cols.EntityId))
      val nm = gtRaw.filter(col(Cols.Uid) < 100)
      val model = EntityMatching(EmParams(), Seq(
        new CosSimIndexer(numCandidates = 3, lowerBound = 0.5))).fit(gtRaw)
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_q116_model"
      graft.operators.FsUtil.deleteRecursively(new java.io.File(path))
      Persistence.save(model, path)
      val loaded = Persistence.load(s, path)
      val cols = Seq(Cols.Uid, Cols.GtUid, Cols.score(0), Cols.rank(0))
      val a = model.transform(nm).select(cols.map(col): _*)
      val b = loaded.transform(nm).select(cols.map(col): _*)
      val mismatches = a.exceptAll(b).count() + b.exceptAll(a).count()
      val nNames = nm.count()
      val sp = s
      import sp.implicits._
      Seq((nNames, mismatches == 0L))
        .toDF("n_scored_names", "roundtrip_identical")
    },
    // N2/N4/N5/N6: SQL-expressible pair features (the UDF-based fuzzy ratios
    // are exercised in unit tests; jaro has an exact DuckDB counterpart)
    "q34_pair_features" -> { (s, dir) =>
      PairFeatures.withStringFeatures(pairSet(s, dir))
        .select(Cols.Uid, Cols.GtUid, "abs_len_diff", "len_ratio", "name_cut",
                "norm_ed", "norm_jaro", "n_overlap_words", "num_word_difference",
                "ratio_overlap_words")
    },

    // A4+N6: vocabulary fit (df-threshold word tiers) + the 6 tier hit/miss
    // pair features (features_vocabulary.py:36-165), both recomputed exactly
    // by the DuckDB oracle with list ops
    "q38_vocabulary_features" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), lower(col("text")).as("txt"))
      val vocab = Vocabulary.fit(docs, Seq("txt"),
        veryCommonThreshold = 0.1, commonThreshold = 0.01)
      val pairs = docs.toDF("id_a", "nm")
        .join(docs.toDF("id_b", "gnm"), col("id_a") + 1 === col("id_b"))
      vocab.withPairFeatures(pairs, "nm", "gnm")
        .select(Seq(col("id_a"), col("id_b")) ++
          vocab.featureNames.map(col): _*)
    },

    // N8 made oracle-visible: the extra-feature equality encoding
    // {match=1, mismatch=-1, null=0} the supervised layer appends for
    // carry-on columns like country (features_extra.py:28-60). Pairs from
    // the adjacent-partkey join, nulls injected deterministically on both
    // sides so all three branches fire; the oracle is the literal CASE
    "q263_equality_features" -> { (s, dir) =>
      import graft.features.PairFeatures
      val p = t(s, dir, "part")
        .select(col("p_partkey").as("id"),
          when(col("p_partkey") % 7 === 0, lit(null).cast("string"))
            .otherwise(col("p_brand")).as("brand"),
          when(col("p_partkey") % 11 === 0, lit(null).cast("string"))
            .otherwise(col("p_type")).as("container"))
      val pairs = p.toDF("id_a", "brand_a", "container_a")
        .join(p.toDF("id_b", "brand_b", "container_b"),
          col("id_a") + 1 === col("id_b"))
      pairs.select(col("id_a"), col("id_b"),
        PairFeatures.equalityFeature("brand_a", "brand_b")
          .cast("int").as("brand_match_feat"),
        PairFeatures.equalityFeature("container_a", "container_b")
          .cast("int").as("container_match_feat"))
    },

    // W1+P3: nm_score best-match ranking + top-n filter over cossim candidates
    "q35_best_match_topn" -> { (s, dir) =>
      val gt = t(s, dir, "part").select(
        col("p_partkey").cast("long").as(Cols.Uid), col("p_name").as(Cols.Preprocessed))
      val nm  = gt.filter(col(Cols.Uid) < 100)
      val idx = new CosSimIndexer(tokenizer = "words", ngram = 1, binary = true,
        numCandidates = 3, lowerBound = 0.5)
      val cands = idx.fit(gt).transform(nm)
      val w = Window.partitionBy(Cols.Uid).orderBy(col("score").desc, col(Cols.GtUid).desc)
      cands.withColumn(Cols.BestRank, row_number().over(w))
        .withColumn(Cols.BestMatch, col(Cols.BestRank) === 1 && col("score") > 0.0)
        .filter(col(Cols.BestRank) <= 2)
        .select(Cols.Uid, Cols.GtUid, "score", Cols.BestRank, Cols.BestMatch)
    },

    // A5: max_frequency_nm_score account aggregation (module path)
    "q36_agg_max_frequency" -> { (s, dir) =>
      val scored = t(s, dir, "lineitem").select(
        col("l_orderkey").as(Cols.Account),
        col("l_suppkey").cast("long").as(Cols.GtUid),
        col("l_quantity").as(Cols.Freq),
        (lit(1.0) - col("l_discount")).as(Cols.NmScore),
        lit("name").as(Cols.Preprocessed))
      EntityAggregation.aggregate(scored, "max_frequency_nm_score")
        .select(Cols.Account, Cols.GtUid, Cols.AggScore)
    },

    // A6: mean_score account aggregation (module path)
    "q37_agg_mean_score" -> { (s, dir) =>
      val scored = t(s, dir, "lineitem").select(
        col("l_orderkey").as(Cols.Account),
        col("l_suppkey").cast("long").as(Cols.GtUid),
        lit(1L).as(Cols.Freq),
        (col("l_extendedprice") * 0.00001).as(Cols.NmScore),
        lit("name").as(Cols.Preprocessed))
      EntityAggregation.aggregate(scored, "mean_score")
        .select(Cols.Account, Cols.GtUid, Cols.AggScore)
    })

  val oracleSql: Map[String, String] = Map(
    "q263_equality_features" ->
      """WITH p AS (
           SELECT p_partkey AS id,
                  CASE WHEN p_partkey % 7 = 0 THEN NULL ELSE p_brand END
                    AS brand,
                  CASE WHEN p_partkey % 11 = 0 THEN NULL ELSE p_type END
                    AS container
           FROM part)
         SELECT a.id AS id_a, b.id AS id_b,
                CAST(CASE WHEN a.brand IS NULL OR b.brand IS NULL THEN 0
                          WHEN a.brand = b.brand THEN 1 ELSE -1 END AS INT)
                  AS brand_match_feat,
                CAST(CASE WHEN a.container IS NULL OR b.container IS NULL
                          THEN 0
                          WHEN a.container = b.container THEN 1 ELSE -1 END
                     AS INT) AS container_match_feat
         FROM p a JOIN p b ON a.id + 1 = b.id""",
    "q194_category_encode" ->
      """WITH counts AS (
           SELECT source AS value, CAST(count(*) AS BIGINT) AS freq
           FROM documents WHERE source IS NOT NULL
           GROUP BY 1 HAVING count(*) >= 2),
         ranked AS (
           SELECT value,
                  CAST(row_number() OVER (ORDER BY freq DESC, value) - 1
                       AS INT) AS id
           FROM counts QUALIFY id < 10),
         k AS (SELECT CAST(count(*) AS INT) AS oov FROM ranked)
         SELECT d.doc_id, d.source,
                CAST(coalesce(r.id, k.oov) AS INT) AS source_id,
                coalesce(r.id, k.oov) = k.oov AS source_id_is_oov
         FROM documents d
         LEFT JOIN ranked r ON r.value = d.source
         CROSS JOIN k""",
    "q156_regex_golden" ->
      """SELECT kind, CAST(n_cases AS BIGINT) AS n_cases, TRUE AS all_pass
         FROM (VALUES
           ('strip_accents', 5), ('merge_abbr', 13), ('merge_legal', 2),
           ('pipeline_name', 2), ('pipeline_merge_abbr', 5),
           ('pipeline_merge_legal', 8), ('remove_lef', 7), ('merge_amp', 2),
           ('strip_hyphens', 1), ('strip_punct', 1), ('space_punct', 1),
           ('abbr_initials', 6), ('abbr_pieces', 6), ('abbr_match', 3),
           ('lef_extract', 3), ('lef_match', 6)) AS t(kind, n_cases)""",
    "q115_fuzzy_invariants" ->
      """WITH names AS (SELECT p_partkey AS uid FROM part WHERE p_partkey <= 200),
         nxt AS (SELECT (uid % 200) + 1 AS uid FROM names)
         SELECT CAST(count(*) AS BIGINT) AS n_cross_pairs,
                true AS self_is_1,
                true AS permutation_invariant,
                true AS substring_partial_1,
                true AS ratios_in_range
         FROM names JOIN nxt USING (uid)""",
    "q116_persistence_roundtrip" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_scored_names,
                true AS roundtrip_identical
         FROM part WHERE p_partkey < 100""",
    "q38_vocabulary_features" ->
      """WITH corpus AS (SELECT DISTINCT lower(text) AS txt FROM documents WHERE text IS NOT NULL),
         nn AS (SELECT count(*) AS n FROM corpus),
         wd AS (SELECT txt, unnest(list_distinct(regexp_extract_all(txt, '\w\w+'))) AS w FROM corpus),
         dfc AS (SELECT w, count(*) AS df FROM wd GROUP BY w),
         vc AS (SELECT coalesce(list(w), CAST([] AS VARCHAR[])) AS ws FROM dfc, nn WHERE df >= 0.1 * nn.n),
         cm AS (SELECT coalesce(list(w), CAST([] AS VARCHAR[])) AS ws FROM dfc, nn WHERE df >= 0.01 * nn.n AND df < 0.1 * nn.n),
         vocab AS (SELECT coalesce(list(w), CAST([] AS VARCHAR[])) AS ws FROM dfc, nn WHERE df >= 0.01 * nn.n),
         pairs AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                  list_distinct(regexp_extract_all(lower(a.text), '\w\w+')) AS la,
                  list_distinct(regexp_extract_all(lower(b.text), '\w\w+')) AS lb
           FROM documents a JOIN documents b ON a.doc_id + 1 = b.doc_id),
         hm AS (
           SELECT id_a, id_b,
                  list_distinct(list_intersect(la, lb)) AS hits,
                  list_filter(list_distinct(list_concat(la, lb)),
                              x -> NOT list_contains(list_intersect(la, lb), x)) AS misses
           FROM pairs)
         SELECT id_a, id_b,
           CAST(len(list_intersect(hits, vc.ws)) AS INT) AS very_common_hit,
           CAST(len(list_intersect(hits, cm.ws)) AS INT) AS common_hit,
           CAST(len(hits) - len(list_intersect(hits, vocab.ws)) AS INT) AS rare_hit,
           CAST(len(list_intersect(misses, vc.ws)) AS INT) AS very_common_miss,
           CAST(len(list_intersect(misses, cm.ws)) AS INT) AS common_miss,
           CAST(len(misses) - len(list_intersect(misses, vocab.ws)) AS INT) AS rare_miss
         FROM hm, vc, cm, vocab""",
    "q34_pair_features" ->
      """WITH a AS (SELECT p_partkey AS uid, p_name AS nm, p_brand FROM part WHERE p_partkey < 100),
         b AS (SELECT p_partkey AS gt_uid, p_name AS gnm, p_brand FROM part)
         SELECT uid, gt_uid,
           CAST(abs(length(nm) - length(gnm)) AS INT) AS abs_len_diff,
           CAST(least(length(nm), length(gnm)) AS DOUBLE)
             / CAST(greatest(greatest(length(nm), length(gnm)), 1) AS DOUBLE) AS len_ratio,
           CAST(starts_with(nm, gnm) OR starts_with(gnm, nm) AS INT) AS name_cut,
           1.0 - CAST(levenshtein(nm, gnm) AS DOUBLE)
             / CAST(greatest(greatest(length(nm), length(gnm)), 1) AS DOUBLE) AS norm_ed,
           jaro_similarity(nm, gnm) AS norm_jaro,
           CAST(len(list_distinct(list_intersect(string_split(nm, ' '), string_split(gnm, ' ')))) AS INT) AS n_overlap_words,
           CAST(abs(len(string_split(nm, ' ')) - len(string_split(gnm, ' '))) AS INT) AS num_word_difference,
           CAST(len(list_distinct(list_intersect(string_split(nm, ' '), string_split(gnm, ' ')))) AS DOUBLE)
             / CAST(greatest(len(list_distinct(list_concat(string_split(nm, ' '), string_split(gnm, ' ')))), 1) AS DOUBLE) AS ratio_overlap_words
         FROM a JOIN b USING (p_brand) WHERE uid <> gt_uid""",
    "q35_best_match_topn" -> {
      val cossim = MatchQueries.oracleSql("q30_cossim_word_topk")
      s"""WITH cands AS ($cossim)
          SELECT uid, gt_uid, cos_score AS score, best_rank,
                 (best_rank = 1 AND cos_score > 0.0) AS best_match
          FROM (
            SELECT uid, gt_uid, cos_score,
                   CAST(row_number() OVER (PARTITION BY uid
                        ORDER BY cos_score DESC, gt_uid DESC) AS INT) AS best_rank
            FROM cands)
          WHERE best_rank <= 2"""
    },
    "q36_agg_max_frequency" ->
      """WITH weighted AS (
           SELECT l_orderkey AS account, l_suppkey AS gt_uid,
                  sum(CAST(l_quantity * (1.0 - l_discount) AS DECIMAL(38,12))) AS w_score,
                  sum(CAST(l_quantity AS DECIMAL(38,12))) AS w_freq
           FROM lineitem GROUP BY 1, 2),
         scored AS (
           SELECT account, gt_uid,
                  CAST(w_score AS DOUBLE)
                    / CAST(sum(w_freq) OVER (PARTITION BY account) AS DOUBLE) AS agg_score
           FROM weighted)
         SELECT account, gt_uid, agg_score FROM (
           SELECT s.account, s.gt_uid, s.agg_score,
                  row_number() OVER (PARTITION BY s.account
                       ORDER BY w.w_score DESC, s.gt_uid) AS rn
           FROM scored s JOIN weighted w
             ON s.account = w.account AND s.gt_uid = w.gt_uid) WHERE rn = 1""",
    "q37_agg_mean_score" ->
      """WITH scored AS (
           SELECT l_orderkey AS account, l_suppkey AS gt_uid,
                  CAST(sum(CAST(l_extendedprice * 0.00001 AS DECIMAL(38,12))) AS DOUBLE)
                    / CAST(count(*) AS DOUBLE) AS agg_score
           FROM lineitem GROUP BY 1, 2)
         SELECT account, gt_uid, agg_score FROM (
           SELECT account, gt_uid, agg_score,
                  row_number() OVER (PARTITION BY account
                       ORDER BY agg_score DESC, gt_uid) AS rn
           FROM scored) WHERE rn = 1""")
}
