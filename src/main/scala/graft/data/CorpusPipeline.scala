package graft.data

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-corpus preparation: quality filter -> exact dedup ->
  * near dedup -> test-set decontamination, the standard stage order of an
  * LLM data pipeline (cheap row-local filters first, the pairwise stages
  * over the shrinking survivor set after).
  *
  * Every stage only examines the SURVIVORS of the previous stages — a
  * near-duplicate of a quality-rejected doc is judged against the retained
  * corpus only, and decontamination runs over what would actually be
  * trained on. Each dropped doc carries the FIRST stage that rejected it,
  * so the labels frame is a complete, disjoint audit of the input.
  */
final case class CorpusConfig(
    textCol: String = "text",
    idCol: String = "doc_id",
    minTokens: Int = 0,
    maxTokens: Int = Int.MaxValue,
    exactDedup: Boolean = true,
    nearDedupThreshold: Option[Double] = Some(0.8),
    shingleK: Int = 5,
    maxDocsPerShingle: Int = 1000,
    evalDocs: Option[DataFrame] = None,
    decontaminationThreshold: Double = 0.8)

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

    // stage 1: row-local quality bounds (token count window); null text is
    // a quality reject, not a silent label gap
    val qualityDrop =
      nTokens.isNull || nTokens < cfg.minTokens || nTokens > cfg.maxTokens
    val qualityOk = docs.filter(!qualityDrop)
    val qualityDrops = docs.filter(qualityDrop)
      .select(id, lit("quality").as("drop_stage"))

    // stage 2: exact dedup — smallest id per identical text is canonical
    val (exactOk, exactDrops) =
      if (!cfg.exactDedup) (qualityOk, None)
      else {
        val canon = qualityOk.groupBy(text)
          .agg(min(id).as("__canonical"))
        val joined = qualityOk.join(canon, Seq(cfg.textCol))
        (joined.filter(id === col("__canonical")).drop("__canonical"),
         Some(joined.filter(id =!= col("__canonical"))
           .select(id, lit("exact_dup").as("drop_stage"))))
      }

    // stage 3: near dedup — star drop: any surviving smaller-id neighbour
    // above the jaccard threshold rejects the doc (pairs have id_a < id_b).
    // The drop-id set is FROZEN (localCheckpoint): it feeds both the survivor
    // anti-join and the labels union, and without the freeze each consumer
    // re-runs the whole pairwise pipeline. Freezing only the NARROW id set
    // (dropped ids, a small fraction of the corpus) keeps the memory cost
    // bounded while the cheap row-local stages are simply recomputed.
    val (nearOk, nearDrops) = cfg.nearDedupThreshold match {
      case None => (exactOk, None)
      case Some(thr) =>
        val dupIds = Dedup.ngramJaccardPairs(exactOk, cfg.textCol, cfg.idCol,
            k = cfg.shingleK, threshold = thr,
            maxDocsPerShingle = cfg.maxDocsPerShingle)
          .select(col("id_b").as(cfg.idCol)).distinct()
          .localCheckpoint()
        (exactOk.join(dupIds, Seq(cfg.idCol), "left_anti"),
         Some(dupIds.select(id, lit("near_dup").as("drop_stage"))))
    }

    // stage 4: decontamination against the eval corpus (drop-id set frozen
    // for the same reason)
    val (kept, contamDrops) = cfg.evalDocs match {
      case None => (nearOk, None)
      case Some(ev) =>
        val contaminated = Dedup.decontaminate(nearOk, ev, cfg.textCol, cfg.idCol,
            k = cfg.shingleK, threshold = cfg.decontaminationThreshold)
          .filter(col("is_contaminated"))
          .select(col("train_id").as(cfg.idCol))
          .localCheckpoint()
        (nearOk.join(contaminated, Seq(cfg.idCol), "left_anti"),
         Some(contaminated.select(id, lit("contaminated").as("drop_stage"))))
    }

    val dropLabels = (Seq(qualityDrops) ++ exactDrops ++ nearDrops ++ contamDrops)
      .reduce(_ unionByName _)
    val labels = docs.select(id)
      .join(dropLabels, Seq(cfg.idCol), "left")
      .withColumn("drop_stage", coalesce(col("drop_stage"), lit("kept")))
    val report = labels.groupBy("drop_stage").agg(count(lit(1)).as("n"))
    CorpusResult(kept, labels, report)
  }
}
