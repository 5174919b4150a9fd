package graft.data

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-corpus preparation: quality filter -> exact dedup ->
  * near dedup -> test-set decontamination -> corpus mixing, the standard
  * stage order of an LLM data pipeline (cheap row-local filters first, the
  * pairwise stages over the shrinking survivor set, the re-weighting
  * sampler last so its rates act on the clean corpus).
  *
  * Every stage only examines the SURVIVORS of the previous stages, and each
  * dropped doc carries the FIRST stage that rejected it, so the labels frame
  * is a complete, disjoint audit of the input. The near-dup stage defaults to
  * single-pass star semantics (drop any doc with a smaller-id above-threshold
  * neighbour, whether or not that neighbour itself survives — the same
  * documented compromise as [[Dedup.embeddingNearDup]]; chains a~b, b~c drop
  * both b and c); `nearDedupTransitive` switches it to connected-components
  * cluster semantics (keep exactly one doc per transitive cluster).
  *
  * Doc ids must be non-null (a null id cannot be deduplicated or audited —
  * such rows are rejected at the quality stage rather than silently lost).
  *
  * Each pairwise stage's DROP-ID SET — a narrow frame, a small fraction of
  * the corpus — is materialized with `localCheckpoint` when
  * `materializeDropSets` is on (default): the set feeds both the survivor
  * anti-join and the labels union, and the stages chain on each other, so
  * without a freeze every downstream action re-runs the full pairwise
  * pipeline per consumer. The tradeoff: `run` becomes eager (one job per
  * frozen set), and local checkpoints live on executors without reliable
  * storage — an executor loss invalidates the result frames. On a
  * fault-prone cluster turn it off and persist intermediates externally
  * (write stage outputs to storage), or accept the recomputation.
  */
final case class CorpusConfig(
    textCol: String = "text",
    idCol: String = "doc_id",
    minTokens: Int = 0,
    maxTokens: Int = Int.MaxValue,
    /** Optional Gopher-style repetition bound: quality-reject docs whose
      * duplicate-`repetitionNgram`-gram fraction exceeds this.
      */
    maxDupNgramFrac: Option[Double] = None,
    repetitionNgram: Int = 3,
    exactDedup: Boolean = true,
    nearDedupThreshold: Option[Double] = Some(0.8),
    /** Star semantics (default, single-pass: drop any doc with a smaller-id
      * above-threshold neighbour) vs transitive-closure semantics
      * ([[Dedup.duplicateClusters]]: connected components, keep exactly the
      * cluster-minimum — the GPT-3/The Pile recipe). They genuinely differ:
      * in a component {2,3,4} with edges (2,4),(3,4) only, star keeps 2 AND 3
      * (3 has no smaller neighbour), transitive keeps only 2.
      */
    nearDedupTransitive: Boolean = false,
    shingleK: Int = 5,
    maxDocsPerShingle: Int = 1000,
    evalDocs: Option[DataFrame] = None,
    decontaminationThreshold: Double = 0.8,
    /** Optional final MIXING stage: deterministic stratified downsampling of
      * the survivors ("keep 50% of en, 10% of fr, default 5%" — the
      * source/language re-weighting every pretraining corpus ends with),
      * [[Sampling.stratifiedHashSample]]'s map-only hash predicate applied
      * after every dedup stage so sampling rates act on the CLEAN corpus.
      * Docs sampled away carry the disjoint `sampled_out` audit label.
      */
    mixStrataCol: Option[String] = None,
    mixRates: Map[String, Double] = Map.empty,
    mixDefaultRate: Double = 1.0,
    mixSalt: String = "graft",
    materializeDropSets: Boolean = true)

final case class CorpusResult(
    /** Input rows that survived every stage, original schema. */
    kept: DataFrame,
    /** (id, drop_stage) for EVERY input row; 'kept' for survivors. */
    labels: DataFrame,
    /** drop_stage -> row count. */
    report: DataFrame)

object CorpusPipeline {

  def run(docs: DataFrame, cfg: CorpusConfig = CorpusConfig()): CorpusResult = {
    val id = col(cfg.idCol)
    val text = col(cfg.textCol)
    val nTokens = size(split(trim(text), "\\s+"))
    def freeze(df: DataFrame): DataFrame =
      if (cfg.materializeDropSets) df.localCheckpoint() else df

    // stage 1: row-local quality bounds (token count window + optional
    // repetition bound); null text and null ids are quality rejects, not
    // silent label gaps
    val repetitionDrop = cfg.maxDupNgramFrac match {
      case None => lit(false)
      case Some(maxFrac) =>
        import graft.functions.ShingleExprs.wordShingleHashes
        val total = greatest(nTokens - lit(cfg.repetitionNgram - 1), lit(1))
        val distinctN = size(wordShingleHashes(text, cfg.repetitionNgram))
        (lit(1.0) - distinctN.cast("double") / total.cast("double")) > maxFrac
    }
    val qualityDrop = id.isNull || nTokens.isNull ||
      nTokens < cfg.minTokens || nTokens > cfg.maxTokens || repetitionDrop
    val qualityOk = docs.filter(!qualityDrop)
    val qualityDrops = docs.filter(qualityDrop)
      .select(id, lit("quality").as("drop_stage"))

    // stage 2: exact dedup — [[Dedup.exact]]'s smallest-id-per-text rule;
    // the groupBy(text) shuffle runs once inside the frozen drop-id set,
    // survivors derive from a cheap anti-join against it
    val (exactOk, exactDrops) =
      if (!cfg.exactDedup) (qualityOk, None)
      else {
        val canon = Dedup.exact(qualityOk, cfg.textCol, cfg.idCol)
          .select(col(cfg.textCol), col("canonical_id"))
        val dropIds = freeze(
          qualityOk.join(canon, Seq(cfg.textCol))
            .filter(id =!= col("canonical_id"))
            .select(id))
        (qualityOk.join(dropIds, Seq(cfg.idCol), "left_anti"),
         Some(dropIds.select(id, lit("exact_dup").as("drop_stage"))))
      }

    // stage 3: near dedup — star drop (see class doc); pairs have
    // id_a < id_b, so dropping every id_b removes all non-minimal star
    // members
    val (nearOk, nearDrops) = cfg.nearDedupThreshold match {
      case None => (exactOk, None)
      case Some(thr) =>
        val dupIds = freeze(
          if (cfg.nearDedupTransitive)
            Dedup.duplicateClusters(exactOk, cfg.textCol, cfg.idCol,
                k = cfg.shingleK, threshold = thr,
                maxDocsPerShingle = cfg.maxDocsPerShingle)
              .filter(col("is_dup")).select(id)
          else
            Dedup.ngramJaccardPairs(exactOk, cfg.textCol, cfg.idCol,
                k = cfg.shingleK, threshold = thr,
                maxDocsPerShingle = cfg.maxDocsPerShingle)
              .select(col("id_b").as(cfg.idCol)).distinct())
        (exactOk.join(dupIds, Seq(cfg.idCol), "left_anti"),
         Some(dupIds.select(id, lit("near_dup").as("drop_stage"))))
    }

    // stage 4: decontamination against the eval corpus
    val (kept, contamDrops) = cfg.evalDocs match {
      case None => (nearOk, None)
      case Some(ev) =>
        val contaminated = freeze(
          Dedup.decontaminate(nearOk, ev, cfg.textCol, cfg.idCol,
              k = cfg.shingleK, threshold = cfg.decontaminationThreshold)
            .filter(col("is_contaminated"))
            .select(col("train_id").as(cfg.idCol)))
        (nearOk.join(contaminated, Seq(cfg.idCol), "left_anti"),
         Some(contaminated.select(id, lit("contaminated").as("drop_stage"))))
    }

    // stage 5: corpus mixing — stratified hash downsampling of the
    // survivors. The predicate is a pure row expression, but the drop-id
    // set still freezes like the other stages': it feeds the labels frame,
    // and without a freeze every labels/report action would re-execute the
    // whole survivor lineage (corpus scan + the anti-join chain) once more
    val (mixedKept, mixDrops) = cfg.mixStrataCol match {
      case None => (kept, None)
      case Some(sc) =>
        val keep = Sampling.stratifiedKeepExpr(id, col(sc), cfg.mixRates,
          cfg.mixDefaultRate, cfg.mixSalt)
        val dropIds = freeze(kept.filter(!keep).select(id))
        (kept.filter(keep),
         Some(dropIds.select(id, lit("sampled_out").as("drop_stage"))))
    }

    val dropLabels =
      (Seq(qualityDrops) ++ exactDrops ++ nearDrops ++ contamDrops ++ mixDrops)
        .reduce(_ unionByName _)
    val labels = docs.select(id)
      .join(dropLabels, Seq(cfg.idCol), "left")
      .withColumn("drop_stage", coalesce(col("drop_stage"), lit("kept")))
    val report = labels.groupBy("drop_stage").agg(count(lit(1)).as("n"))
    // using-column joins moved textCol/idCol to the front; restore the
    // caller's column order so `kept` really is "original schema"
    val keptOrdered = mixedKept.select(docs.columns.toIndexedSeq.map(col): _*)
    CorpusResult(keptOrdered, labels, report)
  }
}
