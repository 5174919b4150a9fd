package graft.idx

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Cols
import graft.operators.GlobalRank

/** Sorted Neighbourhood Indexing.
  *
  * Semantics of the reference's SNI indexer
  * (/root/reference/emm/indexing/spark_sni.py:210-265): build the
  * alphabetically sorted list of all distinct names (GT ∪ names-to-match),
  * assign each name its dense global rank, and pair every name with the GT
  * names at rank offsets -w..w; score = 1 - |offset|/(w+1).
  *
  * Scale notes: the global rank uses distributed sort + RDD zipWithIndex (no
  * single-partition window); the band join is unrolled into 2w+1 equi-joins on
  * the rank (shuffle-on-rank, each a 1:1 join) exactly like the reference, so
  * it scales linearly with w and never materializes a range-join blowup.
  *
  * GT names are capped at `maxGtPerName` rows per identical name with a
  * deterministic ordering (reference uses F.rand() — we order by uid so the
  * result is reproducible; spark_indexing_utils.py:158-196).
  */
final class SniIndexer(
    val window: Int = 3,
    val maxGtPerName: Int = 10,
    val uidCol: String = Cols.Uid,
    val gtUidCol: String = Cols.GtUid,
    val inputCol: String = Cols.Preprocessed) extends NameIndexer with Serializable {

  def fit(gt: DataFrame): SniIndexerModel = {
    val w = Window.partitionBy(inputCol).orderBy(col(gtUidCol))
    val deduped = gt
      .select(col(uidCol).cast("long").as(gtUidCol), col(inputCol))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= maxGtPerName)
      .drop("__rn")
    new SniIndexerModel(this, deduped)
  }
}

final class SniIndexerModel(val indexer: SniIndexer, val gt: DataFrame) extends NameIndexerModel {

  /** names(uid, preprocessed) -> (uid, gt_uid, score, rank).
    * rank = |offset| (0 is an exact name hit).
    */
  def transform(names: DataFrame): DataFrame = {
    val in  = indexer.inputCol
    val w   = indexer.window
    val nm  = names.select(col(indexer.uidCol).cast("long"), col(in))

    val allNames = gt.select(col(in)).union(nm.select(col(in))).distinct()
    val ranked   = GlobalRank.withGlobalRank(allNames, "r", Seq(in)).select(in, "r")

    val gtRanked = gt.join(ranked, in).select(col(indexer.gtUidCol), col("r").as("gt_r"), col(in).as("gt_nm"))
    val nmRanked = nm.join(ranked, in).select(col(indexer.uidCol), col("r"))

    val joined = (-w to w).map { off =>
      nmRanked.join(gtRanked, nmRanked("r") + off === gtRanked("gt_r"))
        .select(
          col(indexer.uidCol), col(indexer.gtUidCol),
          lit(1.0 - math.abs(off).toDouble / (w + 1.0)).as("score"),
          lit(math.abs(off)).as("rank"))
    }
    joined.reduce(_ union _)
  }
}
