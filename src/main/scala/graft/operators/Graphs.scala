package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared graph-construction entry points for the graph/iterative operator
  * tier (PageRank q125, Triangles q138, LabelProp q148, KCore q150).
  */
object Graphs {

  /** Co-purchase edge list over parts: (src, dst) for every ordered pair of
    * distinct parts sharing an order — one self-equi-join on the order key,
    * both directions emitted, duplicate edges kept (each graph operator
    * dedupes or weights per its own semantics, exactly as its oracle
    * replays). The join shuffles on l_orderkey only; nothing is broadcast —
    * at 100 TB both sides are the same large relation and the basket-size
    * cap lives with the caller that needs one (q146's maxDf discipline).
    */
  def coPurchaseEdges(lineitem: DataFrame): DataFrame = {
    val li = lineitem.select("l_orderkey", "l_partkey")
    val a = li.toDF("o", "src")
    val b = li.toDF("o", "dst")
    a.join(b, "o").filter(col("src") =!= col("dst")).select("src", "dst")
  }
}
