package graft

import org.apache.spark.sql.functions._

import graft.idx.{CosSimIndexer, SniIndexer}
import graft.operators.AutoRepartition

/** Round-3 additions: conflicting-column drop (P6), training-flow assembly
  * (window widening + negative split + narrowing + no-candidate re-add),
  * keep_all_cols intermediates (J7), AutoRepartition sizing.
  */
class Round3Spec extends SparkSpec {
  import spark.implicits._

  private lazy val parts = spark.read.parquet(s"$sf/part.parquet")
    .select(col("p_partkey").cast("long").as(Cols.Uid),
            col("p_name").as(Cols.Name),
            col("p_brand").as(Cols.EntityId))

  private def matcher = EntityMatching(EmParams(), Seq(
    new CosSimIndexer(tokenizer = "words", ngram = 1, binary = true,
      numCandidates = 3, lowerBound = 0.5),
    new SniIndexer(window = 2, maxGtPerName = 10)))

  // ---- P6: conflicting-column drop -----------------------------------------

  test("re-transform of a previous transform output round-trips (P6)") {
    val model = matcher.fit(parts)
    val names = parts.filter(col(Cols.Uid) < 50)
    val once = model.transform(names)
    assert(once.columns.count(_ == Cols.GtUid) == 1)
    // feeding the full output back in must not collide on score/rank/gt_*
    val twice = model.transform(once)
    assert(twice.columns.count(_ == Cols.GtUid) == 1)
    assert(twice.columns.sorted.toSeq == once.columns.sorted.toSeq)
    val a = once.select(Cols.Uid, Cols.GtUid, Cols.rank(0)).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    val b = twice.select(Cols.Uid, Cols.GtUid, Cols.rank(0)).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    assert(a == b)
  }

  // ---- window widening -----------------------------------------------------

  test("widen adds one candidate step to cossim and one offset to SNI") {
    val gt = parts
    val nm = parts.filter(col(Cols.Uid) < 40)
    val prep = graft.preprocess.Preprocessor(gt, "preprocess_merge_abbr",
      Cols.Name, Cols.Preprocessed)
    val nmPrep = graft.preprocess.Preprocessor(nm, "preprocess_merge_abbr",
      Cols.Name, Cols.Preprocessed)

    val cos = new CosSimIndexer(tokenizer = "words", ngram = 1, binary = true,
      numCandidates = 2, lowerBound = 0.1).fit(prep)
    val base = cos.transform(nmPrep)
    val wide = cos.widen.transform(nmPrep)
    assert(base.agg(max("rank")).head.getInt(0) <= 2)
    assert(wide.agg(max("rank")).head.getInt(0) == 3)
    // widened top-2 prefix is the fitted top-2 (same scores, same order)
    val basePairs = base.select(Cols.Uid, Cols.GtUid).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val widePrefix = wide.filter(col("rank") <= 2).select(Cols.Uid, Cols.GtUid)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(basePairs == widePrefix)

    val sni = new SniIndexer(window = 2).fit(prep)
    assert(sni.transform(nmPrep).agg(max("rank")).head.getInt(0) <= 2)
    assert(sni.widen.transform(nmPrep).agg(max("rank")).head.getInt(0) == 3)
  }

  // ---- training-pair assembly ----------------------------------------------

  test("createTrainingPairs: negative re-rank matches q48 semantics end-to-end") {
    val model = matcher.fit(parts)
    val nm = parts.filter(col(Cols.Uid) < 120)
    val pairs = model.createTrainingPairs(nm,
      createNegativeSampleFraction = 0.5, seed = 7)

    // independently recompute what the widened candidates were
    val names = matcher.normalize(nm)
    val widened = model.candidateModel.widened.transform(
      names.withColumn("positive_set", lit(true)))  // flag value irrelevant here
    case class Cand(gtUid: Long, r0: Option[Int], r1: Option[Int], correct: Boolean)
    val origByUid = widened.filter(col(Cols.GtUid).isNotNull)
      .select(col(Cols.Uid), col(Cols.GtUid), col(Cols.rank(0)), col(Cols.rank(1)),
        (col(Cols.EntityId) === col(Cols.gt(Cols.EntityId))).as("correct"))
      .collect()
      .map(r => (r.getLong(0), Cand(r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getInt(2)),
        if (r.isNullAt(3)) None else Some(r.getInt(3)),
        r.getBoolean(4))))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap

    val got = pairs.filter(col(Cols.GtUid).isNotNull)
      .select(col(Cols.Uid), col(Cols.GtUid), col(Cols.rank(0)), col(Cols.rank(1)),
        col("positive_set"), col("correct"))
      .collect()
    val posUids = got.filter(_.getBoolean(4)).map(_.getLong(0)).toSet

    got.groupBy(_.getLong(0)).foreach { case (uid, rows) =>
      val orig = origByUid(uid)
      if (posUids.contains(uid)) {
        // positive side: original (widened) ranks survive only inside the
        // fitted windows; values are untouched
        rows.foreach { r =>
          val o = orig.find(_.gtUid == r.getLong(1)).get
          val r0 = if (r.isNullAt(2)) None else Some(r.getInt(2))
          val r1 = if (r.isNullAt(3)) None else Some(r.getInt(3))
          assert(r0 == o.r0.filter(_ <= 3))
          assert(r1 == o.r1.filter(_ <= 2))
        }
      } else {
        // negative side: correct pairs removed; cossim ranks renumbered by
        // original order then capped at 3; SNI ranks conditionally shifted
        // toward 0 (only when the removed correct pair was non-exact, present
        // and left no same-rank survivor), capped at 2
        assert(rows.forall(!_.getBoolean(5)))
        val survivors = orig.filter(!_.correct)
        val renumber = survivors.filter(_.r0.isDefined).sortBy(_.r0.get)
          .zipWithIndex.map { case (c, i) => c.gtUid -> (i + 1) }.toMap
        val pcRanks = orig.filter(_.correct).flatMap(_.r1)
        val pcOpt = if (pcRanks.isEmpty) None else Some(pcRanks.max)
        val survivorAtPc = pcOpt.exists(p => survivors.exists(_.r1.contains(p)))
        val doShift = pcOpt.exists(_ != 0) && !survivorAtPc
        def shiftSni(x: Int): Int =
          if (doShift && x > pcOpt.get) x - 1 else x
        rows.foreach { r =>
          val o = survivors.find(_.gtUid == r.getLong(1)).get
          val expected0 = renumber.get(o.gtUid).filter(_ <= 3)
          val expected1 = o.r1.map(shiftSni).filter(_ <= 2)
          val r0 = if (r.isNullAt(2)) None else Some(r.getInt(2))
          val r1 = if (r.isNullAt(3)) None else Some(r.getInt(3))
          assert(r0 == expected0, s"uid=$uid gt=${o.gtUid}")
          assert(r1 == expected1, s"uid=$uid gt=${o.gtUid}")
        }
        // merge semantics: every surviving original with an in-window rank
        // in ANY indexer is present
        val keptGts = rows.map(_.getLong(1)).toSet
        survivors.foreach { o =>
          val kept0 = renumber.get(o.gtUid).exists(_ <= 3)
          val kept1 = o.r1.map(shiftSni).exists(_ <= 2)
          assert(keptGts.contains(o.gtUid) == (kept0 || kept1), s"uid=$uid gt=${o.gtUid}")
        }
      }
    }

    // every input name survives (no-candidate re-add)
    assert(pairs.select(Cols.Uid).distinct().count() == nm.count())
    val noCand = pairs.filter(col("no_candidate"))
    assert(noCand.filter(col(Cols.GtUid).isNotNull).count() == 0)
  }

  test("dropDuplicateCandidates and dropSamenameNomatch options") {
    val model = matcher.fit(parts)
    val nm = parts.filter(col(Cols.Uid) < 120)
    val dedup = model.createTrainingPairs(nm, dropDuplicateCandidates = true)
    // at most one candidate per (uid, gt name), and the correct pair wins
    val perName = dedup.filter(col(Cols.GtUid).isNotNull)
      .groupBy(Cols.Uid, Cols.GtPreprocessed).count()
    assert(perName.filter(col("count") > 1).count() == 0)
    val base = model.createTrainingPairs(nm)
    val hadCorrect = base.filter(col("correct"))
      .select(Cols.Uid, Cols.GtPreprocessed).distinct()
    val keptCorrect = dedup.filter(col("correct"))
      .select(Cols.Uid, Cols.GtPreprocessed).distinct()
    assert(hadCorrect.exceptAll(keptCorrect).count() == 0)

    val noSame = model.createTrainingPairs(nm, dropSamenameNomatch = true)
    assert(noSame.filter(col(Cols.Preprocessed) === col(Cols.GtPreprocessed)
      && !col("correct")).count() == 0)
    // every input name still survives (no-candidate re-add backstops drops)
    assert(noSame.select(Cols.Uid).distinct().count() == nm.count())
  }

  test("fitClassifier trains on the assembled flow with negatives") {
    val model = matcher.fit(parts)
    model.fitClassifier(parts.filter(col(Cols.Uid) < 150),
      createNegativeSampleFraction = 0.4, nTrainIds = 20, seed = 3)
    val out = model.transform(parts.filter(col(Cols.Uid) < 20))
    assert(out.columns.contains(Cols.NmScore))
    assert(out.filter(col(Cols.BestMatch)).count() > 0)
  }

  test("entity-id downsample keeps whole entities (P7)") {
    val model = matcher.fit(parts)
    val pairs = model.createTrainingPairs(parts, nTrainIds = 5)
    val ents = pairs.select(Cols.EntityId).distinct().count()
    assert(ents == 5)
    // all rows of a surviving entity are kept: uid count == input rows of
    // those entities
    val kept = pairs.select(Cols.EntityId).distinct()
    val expectedNames = parts.join(kept, Seq(Cols.EntityId), "left_semi").count()
    assert(pairs.select(Cols.Uid).distinct().count() == expectedNames)
  }

  // ---- J7 keep_all_cols intermediates --------------------------------------

  test("keepAllCols output exposes vectorizer intermediates (J7)") {
    val m = EntityMatching(EmParams(keepAllCols = true), Seq(
      new CosSimIndexer(numCandidates = 3, lowerBound = 0.2)))
    val out = m.fit(parts).transform(parts.filter(col(Cols.Uid) < 10))
    Seq("tokens", "ngram_tokens", "tf", "features").foreach { c =>
      assert(out.columns.contains(c), s"missing intermediate $c")
    }
    assert(out.filter(col("features").isNull).count() == 0)
  }

  // ---- aggregation group-cols fidelity -------------------------------------

  test("aggregation groups by entity_id and positive_set when present") {
    val scored = Seq(
      // one account, two entities, one positive_set half each: 4 groups of 1
      ("a1", "e1", true,  10L, 1.0, 0.9, "nm"),
      ("a1", "e1", false, 11L, 1.0, 0.8, "nm"),
      ("a1", "e2", true,  12L, 1.0, 0.7, "nm"),
      ("a1", "e2", false, 13L, 1.0, 0.6, "nm")
    ).toDF("account", Cols.EntityId, "positive_set", Cols.GtUid,
      Cols.Freq, Cols.NmScore, Cols.Preprocessed)
    val out = graft.agg.EntityAggregation.aggregate(scored)
    assert(out.count() == 4) // one best row per (account, entity, half)
    val bare = graft.agg.EntityAggregation.aggregate(
      scored.drop(Cols.EntityId, "positive_set"))
    assert(bare.count() == 1) // plain per-account argmax otherwise
  }

  test("addSupervisedModel / addAggregationLayer post-fit hooks") {
    val gt = parts
    val m1 = matcher.fit(gt)
    m1.fitClassifier(parts.filter(col(Cols.Uid) < 100))
    // attach m1's trained model to a freshly fitted matcher
    val m2 = matcher.fit(gt).addSupervisedModel(m1.supervised.get)
    val out = m2.transform(parts.filter(col(Cols.Uid) < 10))
    assert(out.columns.contains(Cols.NmScore))
    // aggregation enabled post-fit
    val names = parts.filter(col(Cols.Uid) < 10)
      .withColumn(Cols.Account, lit("a1")).withColumn(Cols.Freq, lit(1L))
      .drop(Cols.EntityId)
    val agg = m2.addAggregationLayer("mean_score").transform(names)
    assert(agg.columns.contains(Cols.AggScore) && agg.count() == 1)
  }

  test("aggregation blacklist is preprocessed like the names") {
    val m = EntityMatching(
      EmParams(aggregationMethod = Some("mean_score"),
        // raw, un-normalized entry; preprocessing lowercases it
        aggregationBlacklist = Seq(" SHELL  COMPANY ")),
      Seq(new CosSimIndexer(numCandidates = 3, lowerBound = 0.2)))
    val gt = Seq((1L, "shell company", "e1"), (2L, "acme metals", "e2"))
      .toDF(Cols.Uid, Cols.Name, Cols.EntityId)
    val names = Seq((10L, "shell company", "a1", 1L), (11L, "acme metals", "a1", 1L))
      .toDF(Cols.Uid, Cols.Name, Cols.Account, Cols.Freq)
    val out = m.fit(gt).transform(names)
    // the blacklisted name cannot win its account's aggregation
    val winners = out.select(Cols.GtUid).collect().map(_.getLong(0)).toSet
    assert(winners == Set(2L))
  }

  // ---- AutoRepartition -----------------------------------------------------

  test("auto-repartition sizes partitions by approximate count") {
    val df = spark.range(10000).toDF("id")
    val (out, est) = AutoRepartition(df, Some(1000))
    assert(est > 9000 && est < 11000)
    assert(out.rdd.getNumPartitions == (est / 1000).toInt)
    val (same, negOne) = AutoRepartition(df, None)
    assert(negOne == -1L && (same eq df))
  }
}
