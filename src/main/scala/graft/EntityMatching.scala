package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.agg.EntityAggregation
import graft.idx.{CandidateSelection, CandidateSelectionModel, CosSimIndexer, CosSimIndexerModel, NameIndexer, SniIndexer, SniIndexerModel}
import graft.ml.{SupervisedLayer, SupervisedModel, TrainData}
import graft.operators.{AutoRepartition, GlobalRank}
import graft.preprocess.Preprocessor

/** User-facing entity-matching facade, mirroring the reference pipeline
  * (/root/reference/emm/pipeline/spark_entity_matching.py:56-560):
  * preprocess -> candidate selection -> optional supervised scoring ->
  * optional account aggregation.
  *
  * Column mapping: user columns are renamed to the internal vocabulary at the
  * API edge (emm/helper/util.py:34-60); a uid is generated (and frozen with a
  * localCheckpoint, like spark_utils.py:115-141) when absent, and a
  * user-supplied uid is verified unique (spark_utils.py:133-141) when
  * `checkUid` is on.
  */
final case class EmParams(
    preprocessPipeline: String = "preprocess_merge_abbr",
    nameCol: String = "name",
    entityIdCol: String = "entity_id",
    uidCol: String = "uid",
    accountCol: String = "account",
    freqCol: String = "counterparty_account_count_distinct",
    carryOnCols: Seq[String] = Nil,
    withNoMatches: Boolean = true,
    supervisedOn: Boolean = false,
    aggregationMethod: Option[String] = None,
    aggregationBlacklist: Seq[String] = Nil,
    keepAllCols: Boolean = false,
    checkUid: Boolean = false,
    partitionSize: Option[Int] = None)

object EntityMatching {

  /** Default indexer set, mirroring emm/parameters.py:34-47: word 1-gram
    * cossim top-10; char 2-gram cossim top-10 with first-char blocking;
    * SNI window 3.
    */
  def defaultIndexers: Seq[NameIndexer] = Seq(
    new CosSimIndexer(tokenizer = "words", ngram = 1, binary = true,
      numCandidates = 10, lowerBound = 0.2),
    new CosSimIndexer(tokenizer = "characters", ngram = 2, binary = false,
      numCandidates = 10, lowerBound = 0.2, blockingFunc = Some("first")),
    new SniIndexer(window = 3))

  def apply(params: EmParams = EmParams(),
            indexers: Seq[NameIndexer] = defaultIndexers): EntityMatcher =
    new EntityMatcher(params, indexers)
}

final class EntityMatcher(val params: EmParams, val indexers: Seq[NameIndexer]) {

  /** Rename user columns to the internal vocabulary, add uid if missing
    * (verify uniqueness when present and checkUid is on), optionally
    * auto-repartition to `partitionSize` rows/partition, add `preprocessed`.
    */
  private[graft] def normalize(raw: DataFrame): DataFrame = {
    var df = raw
    if (params.nameCol != Cols.Name) df = df.withColumnRenamed(params.nameCol, Cols.Name)
    if (df.columns.contains(params.entityIdCol) && params.entityIdCol != Cols.EntityId)
      df = df.withColumnRenamed(params.entityIdCol, Cols.EntityId)
    if (df.columns.contains(params.uidCol) && params.uidCol != Cols.Uid)
      df = df.withColumnRenamed(params.uidCol, Cols.Uid)
    if (!df.columns.contains(Cols.Uid))
      // monotonically_increasing_id is plan-dependent; freeze it
      df = df.withColumn(Cols.Uid, monotonically_increasing_id()).localCheckpoint()
    else if (params.checkUid) {
      // spark_utils.py:133-141: a non-unique uid silently corrupts the
      // candidate merge — fail fast instead
      val nDup = df.groupBy(Cols.Uid).count().filter(col("count") > 1).count()
      if (nDup > 0)
        throw new IllegalArgumentException(
          s"uid column '${params.uidCol}' is not unique: $nDup duplicated values")
    }
    df = AutoRepartition(df, params.partitionSize)._1
    Preprocessor(df, params.preprocessPipeline, Cols.Name, Cols.Preprocessed)
  }

  def fit(groundTruth: DataFrame): EntityMatchingModel = {
    val gt = normalize(groundTruth)
    val cs = new CandidateSelection(indexers, params.carryOnCols, params.withNoMatches).fit(gt)
    new EntityMatchingModel(this, gt, cs)
  }
}

final class EntityMatchingModel(
    val matcher: EntityMatcher,
    val gt: DataFrame,
    val candidateModel: CandidateSelectionModel,
    var supervised: Option[SupervisedModel] = None) {

  private def params = matcher.params

  private var aggregationOverride: Option[String] = None

  /** Release the broadcast state this model pinned on the executors — the
    * reference's `unpersist_broadcast` / per-stage `_unpersist`
    * (spark_entity_matching.py:197,682-690). A long-lived session that fits
    * repeatedly (services, bench drivers) calls this between generations;
    * without it the packed GT blocks of every old model linger until
    * GC-driven ContextCleaner passes get them. The model must not be used
    * after release.
    */
  def release(): Unit = candidateModel.release()

  /** Attach a pre-trained supervised model post-fit
    * (add_supervised_model, spark_entity_matching.py:595-626) — e.g. one
    * loaded from another pipeline's persistence dir.
    */
  def addSupervisedModel(sm: SupervisedModel): this.type = {
    supervised = Some(sm); this
  }

  /** Enable (or switch) account aggregation post-fit
    * (add_aggregation_layer, spark_entity_matching.py:655-680) without
    * rebuilding the matcher.
    */
  def addAggregationLayer(method: String = "max_frequency_nm_score"): this.type = {
    aggregationOverride = Some(method); this
  }

  /** The aggregation actually in effect (post-fit override wins); this is
    * what persistence must record.
    */
  def effectiveAggregationMethod: Option[String] =
    aggregationOverride.orElse(params.aggregationMethod)

  /** Output-column contract (spark_entity_matching.py:318-334): unless
    * keepAllCols, the result carries only the caller's input columns,
    * `preprocessed`, and the match outputs — gt_* / score_* / rank_* /
    * best_* prefixed columns plus *_score (nm_score, agg_score). Feature and
    * tokenization intermediates never leak to the caller.
    */
  private def pruneOutput(matched: DataFrame, inputCols: Seq[String]): DataFrame = {
    if (params.keepAllCols) return matched
    val keepPrefixes = Seq("gt_", "score_", "rank_", "best_")
    val keep = matched.columns.filter { c =>
      inputCols.contains(c) || c == Cols.Preprocessed ||
        keepPrefixes.exists(c.startsWith) || c.endsWith("_score")
    }
    matched.select(keep.toIndexedSeq.map(col): _*)
  }

  /** keep_all_cols intermediate re-join (spark_cos_sim_matcher.py:255-256):
    * when the caller asked to keep everything, the first cossim indexer's
    * vectorizer intermediates (tokens, n-grams, tf, normalized features) are
    * joined back onto the output by uid. They are recomputed map-side from
    * the names projection rather than carried through candidate
    * generation — the indexer kernel consumes vectors on the fly and keeping
    * them alive through the merge shuffles would widen every stage.
    */
  private def withIntermediates(scored: DataFrame, names: DataFrame): DataFrame =
    candidateModel.models.collectFirst { case m: CosSimIndexerModel => m } match {
      case Some(m) =>
        val inter = m.tfidf.transform(names).select(
          col(Cols.Uid), col("tokens"), col("ngram_tokens"), col("tf"), col("features"))
        scored.join(inter, Seq(Cols.Uid), "left")
      case None => scored
    }

  /** Full match query: names -> candidates [-> nm_score/best_match]
    * [-> account aggregation].
    */
  def transform(namesRaw: DataFrame, topN: Int = -1): DataFrame = {
    val names = matcher.normalize(namesRaw)
    val cands = candidateModel.transform(names)
    val scored = supervised match {
      case Some(m) => m.transform(cands)
      case None    => cands
    }
    val pruned =
      if (params.keepAllCols) withIntermediates(scored, names)
      else pruneOutput(scored, names.columns.toSeq)
    val limited =
      if (topN > 0 && pruned.columns.contains(Cols.BestRank))
        pruned.filter(col(Cols.BestRank) <= topN && col(Cols.GtUid).isNotNull)
      else pruned
    aggregationOverride.orElse(params.aggregationMethod) match {
      case Some(method) if limited.columns.contains(params.accountCol) =>
        EntityAggregation.aggregate(limited, method,
          params.accountCol, params.freqCol,
          if (limited.columns.contains(Cols.NmScore)) Cols.NmScore else Cols.score(0),
          blacklist = preprocessedBlacklist)
      case _ => limited
    }
  }

  /** The aggregation blacklist run through the SAME preprocessing pipeline
    * as the names (base_entity_aggregation.py:166-167), so user-supplied raw
    * names match the `preprocessed` column they filter. Tiny literal list —
    * computed once per model, lazily.
    */
  private lazy val preprocessedBlacklist: Seq[String] =
    if (params.aggregationBlacklist.isEmpty) Nil
    else {
      val spark = gt.sparkSession
      import spark.implicits._
      Preprocessor(
        params.aggregationBlacklist.toDF(Cols.Name),
        params.preprocessPipeline, Cols.Name, Cols.Preprocessed)
        .select(Cols.Preprocessed).collect().map(_.getString(0)).toSeq
    }

  /** Assemble the supervised training-pair set with the reference's full
    * training flow (spark_entity_matching.py:376-411 +
    * prepare_name_pairs.py:85-163):
    *
    *  1. optional entity-id downsample (never row-level: sampling by id
    *     avoids signal leakage, spark_entity_matching.py:381-391) — the first
    *     `nTrainIds` entities in seeded-hash order;
    *  2. seeded positive/negative entity split: exactly
    *     floor((1-fraction)*|entities|) entities form the positive set
    *     (prepare_name_pairs.py:100-108, deterministic hash order replacing
    *     the reference's rng.choice);
    *  3. candidate generation through indexers WIDENED one step
    *     (spark_entity_matching.py:397-404), so the negative re-rank can
    *     narrow back without starving the window edge;
    *  4. labeling (correct / no_candidate, prepare_name_pairs.py:96) and
    *     negative re-rank + both-sides narrowing to the fitted windows
    *     ([[TrainData.negativeRerank]] with maxRanks);
    *  5. re-adding names whose candidates were ALL dropped as no_candidate
    *     rows (prepare_name_pairs.py:149-163).
    */
  def createTrainingPairs(trainNames: DataFrame,
                          createNegativeSampleFraction: Double = 0.0,
                          nTrainIds: Int = -1,
                          seed: Int = 42,
                          dropDuplicateCandidates: Boolean = false,
                          dropSamenameNomatch: Boolean = false): DataFrame = {
    var names = matcher.normalize(trainNames)
    if (nTrainIds > 0) {
      val keep = names.select(col(Cols.EntityId)).distinct()
        .orderBy(xxhash64(col(Cols.EntityId), lit(seed)), col(Cols.EntityId))
        .limit(nTrainIds)
      names = names.join(broadcast(keep), Seq(Cols.EntityId), "left_semi")
    }
    val negativeOn = createNegativeSampleFraction > 0
    names =
      if (!negativeOn) names.withColumn("positive_set", lit(true))
      else {
        // hash-ordered split of the DISTINCT entity table via GlobalRank
        // (distributed sort + zipWithIndex) — no single-partition global
        // window and no forced broadcast, so entity cardinality has no
        // driver/executor-memory ceiling (the reference's `isin(pos_ids)`
        // bound, prepare_name_pairs.py:100-108, is exactly that ceiling).
        // The id table is frozen once: `total` and the rank pipeline would
        // otherwise each re-run normalize+distinct. NOTE this makes the
        // negative-sampling path eager (the count + zipWithIndex run jobs
        // at call time) — acceptable because training-pair construction is
        // always materialized by its caller, and the former lazy global
        // window was the single-partition bottleneck this replaces.
        val ids = names.select(col(Cols.EntityId)).distinct().localCheckpoint()
        val total = ids.count()
        // same arithmetic as the former SQL floor(lit(1-frac) * count):
        // double multiply then floor, so the split point is bit-identical
        val nPos = math.floor((1.0 - createNegativeSampleFraction) * total).toLong
        val flags = GlobalRank.withGlobalRank(
            ids.withColumn("__h", xxhash64(col(Cols.EntityId), lit(seed))),
            "__r", Seq("__h", Cols.EntityId))
          .select(col(Cols.EntityId), (col("__r") < nPos).as("positive_set"))
        // left join + false default: a null entity_id never equi-joins, and
        // the reference's `isin(pos_ids)` puts null-entity names in the
        // negative set rather than dropping them. No broadcast hint — AQE
        // broadcasts when the id table is small and shuffles when it isn't.
        names.join(flags, Seq(Cols.EntityId), "left")
          .withColumn("positive_set", coalesce(col("positive_set"), lit(false)))
      }
    val cs = if (negativeOn) candidateModel.widened else candidateModel
    var labeled = TrainData.label(cs.transform(names))
    if (dropDuplicateCandidates) {
      // one candidate per (uid, gt name), preferring the correct pair
      // (prepare_name_pairs.py:115-125; string-similarity models otherwise
      // learn that perfect matches lose to near-perfect ones). Deterministic
      // tie-break by gt_uid where the reference relies on sort order.
      val w = Window.partitionBy(col(Cols.Uid), col(Cols.GtPreprocessed))
        .orderBy(col("correct").desc, col(Cols.GtUid))
      labeled = labeled.withColumn("__dd", row_number().over(w))
        .filter(col("__dd") === 1).drop("__dd")
    }
    if (dropSamenameNomatch)
      // drop identical-name pairs that are not matches (franchises etc.,
      // prepare_name_pairs.py:127-134); no-candidate rows pass through
      labeled = labeled.filter(col(Cols.GtUid).isNull ||
        !(col(Cols.Preprocessed) === col(Cols.GtPreprocessed) && !col("correct")))
    val assembled =
      if (!negativeOn) labeled
      else {
        val cosRankCols = candidateModel.models.zipWithIndex.collect {
          case (_: CosSimIndexerModel, i) => Cols.rank(i)
        }
        val sniPairs = candidateModel.models.zipWithIndex.collect {
          case (m: SniIndexerModel, i) => Cols.rank(i) -> m.indexer.window
        }
        val maxRanks = candidateModel.models.zipWithIndex.collect {
          case (m: CosSimIndexerModel, i) => Cols.rank(i) -> m.indexer.numCandidates
          case (m: SniIndexerModel, i)    => Cols.rank(i) -> m.indexer.window
        }.toMap
        TrainData.negativeRerank(labeled, cosRankCols,
          sniRankCols = sniPairs.map(_._1), sniWindows = sniPairs.toMap,
          maxRanks = maxRanks)
      }
    // no-candidate re-add: names whose pairs were all dropped come back as
    // explicit no-candidate rows so the training distribution keeps them.
    // `assembled` feeds BOTH the union and the anti-join's uid set; without a
    // materialization the full widened candidate-generation pipeline (cossim
    // kernel + SNI joins + merge) executes twice per action. The training-pair
    // set is sample-bounded, so one localCheckpoint (the same freeze the uid
    // generator and SNI rank relation use) is cheaper than the second run.
    val frozen = assembled.localCheckpoint()
    val missing = names
      .join(frozen.select(col(Cols.Uid)).distinct(), Seq(Cols.Uid), "left_anti")
      .withColumn("correct", lit(false))
      .withColumn("no_candidate", lit(true))
    frozen.unionByName(missing, allowMissingColumns = true)
  }

  /** Train the supervised layer from positive names-to-match that carry an
    * entity_id, via [[createTrainingPairs]] (negative sampling, window
    * widening and no-candidate re-add included when
    * `createNegativeSampleFraction` > 0). Stays fully distributed, unlike the
    * reference's driver-side pandas hop. Carry-on columns present on both
    * sides (e.g. country) become extra equality features
    * (features_extra.py:28-60).
    */
  def fitClassifier(trainNames: DataFrame,
                    createNegativeSampleFraction: Double = 0.0,
                    nTrainIds: Int = -1,
                    seed: Int = 42): this.type = {
    val pairs = createTrainingPairs(trainNames, createNegativeSampleFraction,
      nTrainIds, seed)
    val scoreCols = candidateModel.models.indices.map(Cols.score)
    val extraCols = params.carryOnCols.filter(c =>
      pairs.columns.contains(c) && pairs.columns.contains(Cols.gt(c)))
    val layer = new SupervisedLayer(scoreCols, extraFeatureCols = extraCols)
    supervised = Some(layer.fit(pairs))
    this
  }
}
