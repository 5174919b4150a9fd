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

  /** Newman modularity of a GIVEN node partition (Newman & Girvan 2004)
    * — "is this labeling a real community structure": Q = Σ_c [m_c/m −
    * (D_c/2m)²] over the undirected simple graph (self-loops dropped,
    * duplicate/reverse edges collapsed). The partition comes from the
    * caller — an attribute (brand, language), a LabelProp result, a
    * cluster assignment — and must label every endpoint (caller
    * contract; unlabeled nodes would silently shrink the graph, so the
    * kernel counts and emits them loudly as `n_unlabeled`).
    *
    * Exact arithmetic: 4m²·Q = 4m·Σm_c − ΣD_c² in DECIMAL(38,0), emitted
    * as the sign-split exact ×10⁶ floor — no doubles. Cost: one edge
    * canonicalization + one degree agg + two label joins + label-sized
    * aggregation; nothing iterative, nothing broadcast by hint.
    *
    * @param labels (nodeCol, lblCol) one row per node
    * @return one row: `n_nodes, n_edges, n_communities, intra_edges,
    *         n_unlabeled, q_x1e6`
    */
  def modularity(edges: DataFrame, srcCol: String, dstCol: String,
                 labels: DataFrame, nodeCol: String,
                 lblCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val canon = edges
      .filter(col(srcCol) =!= col(dstCol) &&
        col(srcCol).isNotNull && col(dstCol).isNotNull)
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .distinct()
    val lbl = labels.select(col(nodeCol).as("__n"), col(lblCol).as("__l"))
    val withLbl = canon
      .join(lbl.select(col("__n").as("u"), col("__l").as("lu")), Seq("u"),
        "left")
      .join(lbl.select(col("__n").as("v"), col("__l").as("lv")), Seq("v"),
        "left")
    val deg = canon.select(col("u").as("n"))
      .unionAll(canon.select(col("v").as("n")))
      .groupBy("n").agg(count(lit(1)).cast("long").as("d"))
    val perLbl = deg.join(lbl, col("n") === col("__n"), "left")
      .groupBy("__l").agg(sum("d").cast("long").as("dc"),
        count(lit(1)).cast("long").as("nn"))
    val gStats = withLbl.agg(
      count(lit(1)).cast("long").as("n_edges"),
      sum(when(col("lu").isNull || col("lv").isNull, 1L).otherwise(0L))
        .cast("long").as("__bad_edges"),
      sum(when(col("lu").isNotNull && col("lu") === col("lv"), 1L)
        .otherwise(0L)).cast("long").as("intra_edges"))
    val lblStats = perLbl.agg(
      sum(when(col("__l").isNotNull, 1L).otherwise(0L)).cast("long")
        .as("n_communities"),
      coalesce(sum(when(col("__l").isNull, col("nn")).otherwise(0L)),
        lit(0L)).cast("long").as("n_unlabeled"),
      sum(when(col("__l").isNotNull,
        col("dc").cast(d38) * col("dc")).otherwise(lit(0).cast(d38)))
        .cast(d38).as("__sum_dc2"))
    val nNodes = deg.agg(count(lit(1)).cast("long").as("n_nodes"))
    gStats.crossJoin(broadcast(lblStats)).crossJoin(broadcast(nNodes))
      .withColumn("__num",
        expr(s"""CAST(CAST(4 AS $d38) * n_edges * intra_edges - __sum_dc2
                 AS $d38)"""))
      .withColumn("q_x1e6",
        when(col("n_edges") > 0,
          (when(col("__num") >= 0, lit(1L)).otherwise(lit(-1L))) *
            expr(s"""CAST(abs(__num) * 1000000
                     div (CAST(4 AS $d38) * n_edges * n_edges)
                     AS BIGINT)"""))
          .otherwise(lit(null).cast("long")))
      .select("n_nodes", "n_edges", "n_communities", "intra_edges",
        "n_unlabeled", "q_x1e6")
  }
}
