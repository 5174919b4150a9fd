package graft.idx

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Cols
import graft.operators.GlobalRank

/** Naive all-pairs indexer, pluggable into [[CandidateSelection]].
  *
  * Semantics of the reference's NaiveIndexer
  * (/root/reference/emm/indexing/pandas_naive_indexer.py:30-67): every name is
  * paired with every GT row; score = 1, rank = dense rank of gt_uid ascending
  * within each name. Like the reference says: for small datasets / testing,
  * not for production — the output is |names| x |GT|.
  *
  * Scale shape: the gt_uid dense rank is identical for every name, so it is
  * computed ONCE on the GT side (distributed sort + zipWithIndex) instead of a
  * per-uid window over the cross product; the cross join then just fans out
  * pre-ranked GT rows.
  */
final class NaiveIndexer(
    val uidCol: String = Cols.Uid,
    val gtUidCol: String = Cols.GtUid) extends NameIndexer with Serializable {

  def fit(gt: DataFrame): NaiveIndexerModel = {
    val gtRanked = GlobalRank.withGlobalRank(
        gt.select(col(uidCol).cast("long").as(gtUidCol)).distinct(),
        "rank0", Seq(gtUidCol))
    new NaiveIndexerModel(this, gtRanked)
  }
}

final class NaiveIndexerModel(val indexer: NaiveIndexer, val gtRanked: DataFrame)
    extends NameIndexerModel {

  def transform(names: DataFrame): DataFrame =
    names.select(col(indexer.uidCol).cast("long"))
      .crossJoin(gtRanked)
      .select(
        col(indexer.uidCol), col(indexer.gtUidCol),
        lit(1.0).as("score"),
        (col("rank0") + 1).cast("int").as("rank"))
}
