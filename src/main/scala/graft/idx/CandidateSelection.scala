package graft.idx

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Cols

/** Common shape of a candidate-generating indexer: fit on ground truth, then
  * map names(uid, preprocessed) to candidate pairs (uid, gt_uid, score, rank).
  */
trait NameIndexer  { def fit(gt: DataFrame): NameIndexerModel }
trait NameIndexerModel extends Serializable {
  def transform(names: DataFrame): DataFrame

  /** A copy of this fitted model with its candidate window widened by one
    * step (ref base_indexer.py:59-96: cossim num_candidates +1, SNI window
    * +1 offset each side), used for training negative-sample creation and
    * narrowed back by the re-rank. Identity for windowless indexers.
    */
  def widen: NameIndexerModel = this

  /** Release executor-side state held by this model (broadcast GT blocks) —
    * the reference's per-stage `_unpersist`
    * (spark_entity_matching.py:682-690). After release the model must not be
    * transformed again. No-op for models without broadcast state.
    */
  def release(): Unit = ()
}

/** Candidate selection: run all indexers, merge their pair sets, attach GT
  * info, and keep no-candidate names.
  *
  * Semantics of the reference's candidate-selection stage
  * (/root/reference/emm/indexing/spark_candidate_selection.py:200-325):
  * per-indexer frames renamed to score_i/rank_i → unionByName with missing
  * columns → groupBy(uid, gt_uid).agg(max score_i, max rank_i) (dedup-merge of
  * pairs found by several indexers) → inner join GT info (gt_ prefixed cols)
  * → left-outer join back onto names so no-candidate rows survive.
  *
  * Scale notes: the merge is one shuffle on (uid, gt_uid) with map-side
  * partial aggregation; the GT-info join shuffles on gt_uid (AQE may broadcast
  * a small GT); the final join shuffles on uid, co-locating all candidates of
  * a name for the downstream rank-feature windows — the reference forces this
  * with an explicit repartition, for us the shuffle itself provides it.
  */
final class CandidateSelectionModel(
    val models: Seq[NameIndexerModel],
    val gt: DataFrame,
    val gtCarryOnCols: Seq[String] = Nil,
    val withNoMatches: Boolean = true) extends Serializable {

  /** Columns that a previous transform/scoring pass may have left on the
    * incoming frame and that would silently collide with this pass's outputs
    * (ref spark_candidate_selection.py:260-263 drops score_i/rank_i/gt_*; we
    * also drop the supervised/aggregation outputs so a full pipeline output
    * can be re-matched as-is).
    */
  private def conflictingCols(columns: Seq[String]): Seq[String] =
    columns.filter { c =>
      c.matches("^(score|rank)_\\d+$") || c.startsWith("gt_") ||
        c == Cols.NmScore || c == Cols.BestRank || c == Cols.BestMatch ||
        c == Cols.AggScore
    }

  /** Model with every indexer's window widened one step (training candidate
    * generation, ref spark_entity_matching.py:397-404); the fitted per-indexer
    * state (TF-IDF broadcast, SNI ranks) is shared, not re-fit.
    */
  def widened: CandidateSelectionModel =
    new CandidateSelectionModel(models.map(_.widen), gt, gtCarryOnCols, withNoMatches)

  /** Release every indexer's broadcast state (reference `_unpersist` parity).
    * Widened copies share the fitted state, so they die with the original.
    */
  def release(): Unit = models.foreach(_.release())

  def transform(namesRaw: DataFrame): DataFrame = {
    val names = namesRaw.drop(conflictingCols(namesRaw.columns.toSeq): _*)
    val perIndexer = models.zipWithIndex.map { case (m, i) =>
      m.transform(names)
        .withColumnRenamed("score", Cols.score(i))
        .withColumnRenamed("rank", Cols.rank(i))
    }
    val unioned = perIndexer.reduce(_.unionByName(_, allowMissingColumns = true))
    val aggCols = models.indices.flatMap { i =>
      Seq(max(col(Cols.score(i))).as(Cols.score(i)),
          max(col(Cols.rank(i))).as(Cols.rank(i)))
    }
    val merged = unioned
      .groupBy(Cols.Uid, Cols.GtUid)
      .agg(aggCols.head, aggCols.tail: _*)

    // attach gt info with gt_-prefixed names
    val gtInfoCols = (Seq(Cols.EntityId, Cols.Name, Cols.Preprocessed) ++ gtCarryOnCols)
      .filter(gt.columns.contains)
    val gtInfo = gt.select(
      (col(Cols.Uid).cast("long").as(Cols.GtUid) +:
        gtInfoCols.map(c => col(c).as(Cols.gt(c)))): _*)
    val withGt = merged.join(gtInfo, Seq(Cols.GtUid), "inner")

    val joinType = if (withNoMatches) "left_outer" else "inner"
    names.join(withGt, Seq(Cols.Uid), joinType)
  }
}

final class CandidateSelection(
    val indexers: Seq[NameIndexer],
    val gtCarryOnCols: Seq[String] = Nil,
    val withNoMatches: Boolean = true) {

  def fit(gt: DataFrame): CandidateSelectionModel =
    new CandidateSelectionModel(indexers.map(_.fit(gt)), gt, gtCarryOnCols, withNoMatches)
}
