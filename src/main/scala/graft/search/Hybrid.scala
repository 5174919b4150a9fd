package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid lexical + dense retrieval via reciprocal-rank fusion.
  *
  * RRF (Cormack/Clarke/Buettcher, SIGIR'09) combines ranked lists without
  * score calibration: fused(q, d) = Σ_lists 1 / (k + rank_list(q, d)), with
  * the damping constant k (=60 in the paper and every production default)
  * keeping deep-tail ranks from dominating. It is the standard fusion for
  * BM25 + embedding top-k because the two scores live on incomparable
  * scales — ranks are scale-free.
  *
  * Scale shape: both inputs are already per-query top-k lists (bounded at
  * k·|queries| rows no matter the corpus size), so the fusion is one
  * (query, doc) equi-join of two small relations plus one bounded window —
  * the corpus-sized work happened inside the retrievers, which carry their
  * own 100 TB paths (Bm25 disk index, Knn IVF). Fused output is
  * deterministic: double arithmetic is fixed-order (two coalesced terms),
  * ties break on doc id.
  */
object Hybrid {

  /** Fuse two per-query ranked lists on `1/(k + rank)`. Docs present in one
    * list only contribute that list's term (the other is 0) — the standard
    * RRF treatment of non-overlapping candidates.
    *
    * Inputs must carry `queryCol`, `docCol` and an integer `rankCol`
    * (1-based, dense per query — the retrievers' row_number output).
    */
  def rrfFuse(a: DataFrame, b: DataFrame, queryCol: String, docCol: String,
      rankCol: String, k: Int = 60, topK: Int = 10): DataFrame = {
    require(k > 0, s"rrf damping k must be positive, got $k")
    def term(df: DataFrame, out: String) = df.select(
      col(queryCol), col(docCol),
      (lit(1.0) / (lit(k) + col(rankCol))).as(out))
    val fused = term(a, "__ra")
      .join(term(b, "__rb"), Seq(queryCol, docCol), "full_outer")
      .withColumn("rrf_score",
        coalesce(col("__ra"), lit(0.0)) + coalesce(col("__rb"), lit(0.0)))
    val w = Window.partitionBy(queryCol)
      .orderBy(col("rrf_score").desc, col(docCol))
    fused.withColumn("rrf_rank", row_number().over(w))
      .filter(col("rrf_rank") <= topK)
      .select(col(queryCol), col(docCol), col("rrf_score"), col("rrf_rank"))
  }
}
