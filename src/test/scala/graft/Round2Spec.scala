package graft

import org.apache.spark.sql.functions._

import graft.data.Dedup
import graft.features.{Vocabulary, VocabularyModel}
import graft.idx.{NaiveIndexer, SniIndexer}
import graft.ml.TrainData
import graft.operators.TopN

/** Round-2 additions: tie-aware top-n, capped jaccard consistency,
  * stratified split, SNI mapping hook, naive indexer, vocabulary features,
  * facade output contract.
  */
class Round2Spec extends SparkSpec {
  import spark.implicits._

  // ---- take_topn_per_group methods -----------------------------------------

  private lazy val tied = Seq(
    // group 1: scores 9, 8, 8, 7 — ties straddle the n=2 cut
    (1, 10, 9.0), (1, 11, 8.0), (1, 12, 8.0), (1, 13, 7.0),
    // group 2: all distinct
    (2, 20, 5.0), (2, 21, 4.0), (2, 22, 3.0)
  ).toDF("g", "id", "s")

  private def picked(method: String, n: Int = 2): Set[Int] =
    TopN.takeTopNPerGroup(tied, n, Seq("g"), Seq(col("s").desc), method)
      .select("id").collect().map(_.getInt(0)).toSet

  test("topn methods: exactly / at_least / dense_rank / at_most tie semantics") {
    assert(picked("at_least") == Set(10, 11, 12, 20, 21))          // rank: ties at cut kept
    assert(picked("at_least_n_different_order_values") == Set(10, 11, 12, 20, 21)) // 2 distinct values
    assert(picked("at_most") == Set(10, 20, 21))                   // tie group crossing cut dropped
    assert(picked("exactly").size == 4)                            // always exactly n per group
    intercept[IllegalArgumentException](picked("bogus"))
  }

  // ---- capped jaccard consistency ------------------------------------------

  test("capped jaccard: pair reported iff jaccard over the capped shingle set >= threshold") {
    // shingle "a b c" (k=3 over 'a b c') appears in ALL docs -> hot with cap=2
    val docs = Seq(
      (0L, "a b c x y z"), (1L, "a b c x y w"), (2L, "a b c q r s"),
      (3L, "a b c q r t")
    ).toDF("doc_id", "text")
    val capped = Dedup.ngramJaccardPairs(docs, "text", "doc_id",
      k = 3, threshold = 0.4, maxDocsPerShingle = 2)
    // recompute the expected effective-set jaccard by hand: shingles per doc
    def shingles(t: String): Set[String] =
      t.split(" ").sliding(3).map(_.mkString(" ")).toSet
    val all = Seq(0L -> "a b c x y z", 1L -> "a b c x y w", 2L -> "a b c q r s", 3L -> "a b c q r t").toMap
    val hot = all.values.flatMap(shingles).groupBy(identity).collect { case (s, o) if o.size > 2 => s }.toSet
    def eff(id: Long): Set[String] = shingles(all(id)) -- hot
    val expected = (for {
      a <- all.keys; b <- all.keys if a < b
      j = eff(a).intersect(eff(b)).size.toDouble / eff(a).union(eff(b)).size.toDouble
      if j >= 0.4
    } yield (a, b)).toSet
    val got = capped.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected)
    // and the reported jaccard is the effective-set jaccard
    capped.collect().foreach { r =>
      val (a, b, j) = (r.getLong(0), r.getLong(1), r.getAs[Double]("jaccard"))
      val e = eff(a).intersect(eff(b)).size.toDouble / eff(a).union(eff(b)).size.toDouble
      assert(math.abs(j - e) < 1e-12)
    }
  }

  // ---- stratified grouped split --------------------------------------------

  test("stratified grouped split: groups intact, exact per-stratum test counts") {
    val rows = (1 to 400).map { g =>
      val stratum = if (g % 4 == 0) "rare" else "common"
      (g, stratum, g * 10)
    }.toDF("grp", "y", "v")
      // two rows per group, same stratum
      .unionByName(Seq.tabulate(400)(i => (i + 1, if ((i + 1) % 4 == 0) "rare" else "common", 0))
        .toDF("grp", "y", "v"))
    val (train, test) = TrainData.stratifiedGroupedSplit(rows, "grp", Seq("y"), testFraction = 0.25)
    assert(train.count() + test.count() == 800)
    val trainG = train.select("grp").distinct().as[Int].collect().toSet
    val testG  = test.select("grp").distinct().as[Int].collect().toSet
    assert(trainG.intersect(testG).isEmpty)
    // exact counts: floor(0.25 * 100) rare groups, floor(0.25 * 300) common
    assert(testG.count(_ % 4 == 0) == 25)
    assert(testG.count(_ % 4 != 0) == 75)
  }

  // ---- SNI mapping hook ----------------------------------------------------

  test("sni mappingFunc: reversal produces suffix neighbours") {
    val gt = Seq((1L, "alpha corp"), (2L, "beta corp"), (3L, "gamma inc"))
      .toDF("uid", "preprocessed")
    val names = Seq((10L, "delta corp")).toDF("uid", "preprocessed")
    // plain SNI sorts by prefix: "delta corp" neighbours are by 'd...'
    val plain = new SniIndexer(window = 1).fit(gt).transform(names)
      .select("gt_uid").as[Long].collect().toSet
    // reversed sort groups by suffix: all "* corp" names become adjacent
    val rev = new SniIndexer(window = 1, mappingFunc = Some((s: String) => s.reverse))
      .fit(gt).transform(names)
      .select("gt_uid").as[Long].collect().toSet
    assert(rev.contains(1L) || rev.contains(2L)) // a corp-suffix neighbour
    assert(rev != plain || plain.subsetOf(Set(1L, 2L)))
    // suffix ordering: reversed "proc atled" sits between the two corp names
    assert(!rev.contains(3L) || rev.size > 1)
  }

  // ---- naive indexer -------------------------------------------------------

  test("naive indexer pairs every name with every gt row, dense gt rank") {
    val gt = Seq((5L, "x"), (7L, "y"), (9L, "z")).toDF("uid", "preprocessed")
    val names = Seq((1L, "a"), (2L, "b")).toDF("uid", "preprocessed")
    val out = new NaiveIndexer().fit(gt).transform(names)
    assert(out.count() == 6)
    val ranks = out.filter(col("uid") === 1L).orderBy("gt_uid")
      .select("rank").as[Int].collect().toSeq
    assert(ranks == Seq(1, 2, 3))
    assert(out.select("score").distinct().as[Double].collect().toSeq == Seq(1.0))
  }

  // ---- vocabulary features -------------------------------------------------

  test("vocabulary fit tiers by document frequency; pair features count tier hits/misses") {
    // 10 docs: "acme" in all 10 (very common at 0.5), "corp" in 5 (common at
    // 0.3 threshold? no — common at 0.3*10=3 <= 5), "zeta" once (rare)
    val names = (1 to 10).map { i =>
      val extra = if (i <= 5) " corp" else ""
      val rare  = if (i == 1) " zeta" else ""
      (i.toLong, s"acme$extra$rare holdings$i")
    }.toDF("uid", "preprocessed")
    val vocab = Vocabulary.fit(names, Seq("preprocessed"),
      veryCommonThreshold = 0.9, commonThreshold = 0.3)
    assert(vocab.veryCommon == Set("acme"))
    assert(vocab.common == Set("corp"))
    val pairs = Seq(("acme corp zeta", "acme corp lambda"), ("acme corp", "beta inc"))
      .toDF("preprocessed", "gt_preprocessed")
    val out = vocab.withPairFeatures(pairs)
      .select(VocabularyModel.featureNames.map(col): _*).collect()
    // pair 1: hits = {acme, corp}; misses = {zeta, lambda} (both rare)
    assert(out(0).getInt(0) == 1 && out(0).getInt(1) == 1 && out(0).getInt(2) == 0)
    assert(out(0).getInt(3) == 0 && out(0).getInt(4) == 0 && out(0).getInt(5) == 2)
    // pair 2: no hits; misses = {acme(vc), corp(c), beta, inc}
    assert(out(1).getInt(0) == 0 && out(1).getInt(1) == 0)
    assert(out(1).getInt(3) == 1 && out(1).getInt(4) == 1 && out(1).getInt(5) == 2)
  }

  // ---- facade output contract ----------------------------------------------

  test("facade transform output carries only input cols + match outputs") {
    val parts = spark.read.parquet(s"$sf/part.parquet")
      .select(col("p_partkey").as("id"), col("p_name").as("company"),
              col("p_brand").as("brand"))
    val matcher = EntityMatching(
      EmParams(nameCol = "company", entityIdCol = "brand", uidCol = "id"),
      indexers = Seq(new graft.idx.CosSimIndexer(numCandidates = 3, lowerBound = 0.2)))
    val model = matcher.fit(parts)
    model.fitClassifier(parts.limit(80))
    val out = model.transform(parts.limit(10))
    val expected = Set(
      Cols.Uid, Cols.Name, Cols.EntityId, Cols.Preprocessed,
      Cols.GtUid, Cols.gt(Cols.EntityId), Cols.gt(Cols.Name), Cols.gt(Cols.Preprocessed),
      Cols.score(0), Cols.rank(0), Cols.NmScore, Cols.BestRank, Cols.BestMatch)
    assert(out.columns.toSet == expected,
      s"leaked: ${out.columns.toSet -- expected}; missing: ${expected -- out.columns.toSet}")
    // keepAllCols returns the intermediates too
    val matcherAll = EntityMatching(
      EmParams(nameCol = "company", entityIdCol = "brand", uidCol = "id", keepAllCols = true),
      indexers = Seq(new graft.idx.CosSimIndexer(numCandidates = 3, lowerBound = 0.2)))
    val outAll = matcherAll.fit(parts).transform(parts.limit(10))
    assert(outAll.columns.toSet.contains(Cols.score(0)))
  }

  test("duplicate uid raises when checkUid is on") {
    val dup = Seq((1L, "a corp"), (1L, "b inc")).toDF("id", "company")
    val matcher = EntityMatching(
      EmParams(nameCol = "company", uidCol = "id", checkUid = true),
      indexers = Seq(new graft.idx.CosSimIndexer(numCandidates = 2, lowerBound = 0.2)))
    intercept[IllegalArgumentException](matcher.fit(dup))
  }
}
