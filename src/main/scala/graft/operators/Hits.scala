package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HITS (Kleinberg 1999) hubs-and-authorities in exact integer fixed
  * point — [[PageRank]]'s bipartite-affinity sibling for DIRECTED graphs
  * (broad buyers ↔ broadly-bought parts; crawler seed pages ↔ authority
  * domains). Each synchronous step is the mutual recursion
  *
  *   auth'(v) = Σ_{u→v} hub(u)     hub'(u) = Σ_{u→v} auth(v)
  *
  * followed by L1 (sum) normalization back to total mass n·Scale:
  *
  *   x(v) = x_raw(v) · (n·Scale) div Σ x_raw
  *
  * — integer sums are order-independent and the normalization an exact
  * DECIMAL(38,0) integer quotient (positive dividend), so the result is
  * bit-identical on any partitioning and replayable by DuckDB as unrolled
  * CTEs (the q125 PageRank / q327 Bradley–Terry discipline; the textbook
  * L2 normalization needs sqrt on a per-node scale and is deliberately
  * traded for L1, declared semantics). Truncation leaks ≤ 1 fp unit per
  * node per step — identical in both engines.
  *
  * Scale shape: the distinct edge list is frozen ONCE (localCheckpoint —
  * iterations must not re-derive it); per iteration one join (scores onto
  * edges) + one partial-aggregated shuffle per direction, plus a scalar
  * total broadcast back. On a real cluster, bucket the frozen edges by
  * src/dst so only the (node, score) pairs move per iteration.
  *
  * Overflow bound: raw sums ≤ n²·Scale and the normalization dividend
  * ≤ n³·Scale² must fit DECIMAL(38,0) → n < 10⁸ nodes, checked at fit
  * time (fails loudly; beyond it shard the graph).
  */
object Hits {

  val Scale = 1000000L

  private val D38 = "decimal(38,0)"

  /** Hub/authority scores after `iterations` synchronous steps over the
    * distinct edge set. Output: `(node LONG, hub_fp LONG, auth_fp LONG)`
    * — scores in millionths, L1-normalized to total mass n·Scale each
    * step. Nodes with no in-edges get auth 0, no out-edges hub 0.
    */
  def fixedPoint(edges: DataFrame, srcCol: String, dstCol: String,
                 iterations: Int = 2): DataFrame = {
    require(iterations >= 1 && iterations <= 50,
      s"iterations must be in [1, 50], got $iterations")
    val e = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct().localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().localCheckpoint()
    val n = nodes.count()
    require(n > 0, "Hits: empty graph")
    require(n < 100000000L,
      s"$n nodes overflow the DECIMAL(38,0) normalization (bound 1e8); " +
        "shard the graph")

    // x_raw → x: L1-normalize to total mass n·Scale as an exact integer
    // quotient; absent nodes (no edge in that direction) score 0
    def normalized(raw: DataFrame, outCol: String): DataFrame = {
      val total = raw.agg(sum(col("raw").cast(D38)).cast(D38).as("tot"))
      nodes.join(raw, Seq("node"), "left")
        .crossJoin(broadcast(total))
        .select(col("node"),
          expr(s"""CAST(CASE WHEN tot > 0 THEN
                   CAST(coalesce(raw, CAST(0 AS $D38)) AS $D38) *
                   CAST($n AS $D38) * $Scale div tot
                   ELSE 0 END AS BIGINT)""")
            .as(outCol))
    }

    var hubs = nodes.withColumn("hub_fp", lit(Scale))
    var auths: DataFrame = null
    for (_ <- 1 to iterations) {
      val aRaw = e.join(hubs, col("src") === col("node"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("hub_fp").cast(D38)).cast(D38).as("raw"))
      auths = normalized(aRaw, "auth_fp").localCheckpoint()
      val hRaw = e.join(auths, col("dst") === col("node"))
        .groupBy(col("src").as("node"))
        .agg(sum(col("auth_fp").cast(D38)).cast(D38).as("raw"))
      hubs = normalized(hRaw, "hub_fp").localCheckpoint()
    }
    hubs.join(auths, Seq("node"))
  }
}
