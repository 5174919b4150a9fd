package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Cols
import graft.idx.{CosSimIndexerModel, PackedGt}

/** Streaming-compatible variants of the matching operators.
  *
  * The reference's `streaming=True` flag switches the cos-sim matcher from
  * mapPartitions to a per-row UDF so the transform stays expressible on a
  * streaming DataFrame (no repartition/count actions) —
  * /root/reference/emm/indexing/spark_cos_sim_matcher.py:295-297,634-643.
  * Same here: the broadcast GT index is the stream-static side; the per-row
  * UDF emits the candidate array, then posexplode (stream-safe) flattens it.
  */
object StreamingMatch {

  private val candType = ArrayType(StructType(Seq(
    StructField("gt_uid", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false))), containsNull = false)

  /** Per-row top-k match usable on streaming DataFrames.
    * Input must already carry the vectorized `features` and `block` columns
    * (TfidfModel.transform + blockCol are projection-only, stream-safe).
    */
  def transformStreaming(model: CosSimIndexerModel, names: DataFrame): DataFrame = {
    val bc   = model.gtBc
    val k    = model.indexer.numCandidates
    val lb   = model.indexer.lowerBound
    val prec = model.indexer.scorePrecision

    val matchOne = udf { (vec: org.apache.spark.ml.linalg.Vector, block: String) =>
      bc.value.get(block) match {
        case None => Seq.empty[(Long, Double)]
        case Some(gt: PackedGt) =>
          val sv = vec match {
            case s: org.apache.spark.ml.linalg.SparseVector => s
            case d => d.toSparse
          }
          val scores  = new scala.collection.mutable.HashMap[Int, Double]()
          var i = 0
          while (i < sv.indices.length) {
            val t = sv.indices(i); val q = sv.values(i)
            if (q != 0.0 && t < gt.nTerms) {
              var p = gt.indptr(t)
              while (p < gt.indptr(t + 1)) {
                val g = gt.indices(p)
                scores.update(g, scores.getOrElse(g, 0.0) + q * gt.data(p))
                p += 1
              }
            }
            i += 1
          }
          scores.iterator.map { case (g, s) =>
            (gt.gtUids(g), BigDecimal(s).setScale(prec, BigDecimal.RoundingMode.HALF_UP).toDouble)
          }.filter(_._2 >= lb).toSeq
            .sortBy { case (u, s) => (-s, u) }
            .take(k)
      }
    }

    val vectorized = model.indexer.blockCol(model.tfidf.transform(names))
    vectorized
      .withColumn("candidates", matchOne(col("features"), col("block")))
      .select(col(model.indexer.uidCol), posexplode(col("candidates")).as(Seq("pos", "cand")))
      .select(col(model.indexer.uidCol),
              col("cand._1").as(Cols.GtUid),
              col("cand._2").as("score"),
              (col("pos") + 1).cast("int").as("rank"))
  }
}
