package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition (Seidman 1983): the maximal subgraph in which every
  * node has degree >= k — the standard density screen for graph-shaped
  * training data (drop barely-connected entities before embedding / LPA).
  *
  * Synchronous peel: each round drops every node whose degree AMONG
  * SURVIVORS is < k; the fixpoint is the k-core. Peeling is monotone (the
  * alive set only shrinks) and the update is a pure integer-degree
  * threshold, so every round is bit-replayable on any partitioning and the
  * converged result is SQL-oracle-checkable by unrolling AT LEAST as many
  * rounds as the operator needed — extra unrolled rounds are no-ops at the
  * fixpoint, which is what makes a fixed-depth SQL replay of a data-
  * dependent iteration count sound.
  *
  * Plan per round (`broadcastAlive = true`, the default): the alive set
  * (vertex-sized, orders of magnitude smaller than the edge set) is
  * explicitly BROADCAST against both edge endpoints — two map-only
  * semi-joins — and the degree aggregation lands on the hash partitioning
  * the edge set was given ONCE up front (`repartition(col("s"))` before
  * the freeze), so a round never shuffles the edges at all; `PlanShapeSpec`
  * locks this (zero ShuffleExchange in a peel round). The edge set is
  * frozen once by CACHING the repartitioned relation — InMemoryRelation
  * preserves the cached plan's hash partitioning across rounds, which a
  * localCheckpoint's LogicalRDD does not — while the per-round alive set
  * is still localCheckpoint-frozen (the connectedComponents lesson,
  * Dedup.scala). The edge cache lives only for the duration of the call:
  * the node-sized result is localCheckpoint-materialized and the 2·|E|
  * relation unpersisted in a `finally` before return (Triangles.count
  * discipline), so the CacheManager is empty when decompose returns.
  * The per-round driver `count()` is one
  * long — the same bounded convergence probe connectedComponents uses.
  * For graphs whose VERTEX set itself exceeds executor memory (≳10⁹
  * nodes), pass `broadcastAlive = false`: the rounds become plain shuffle
  * semi-joins on s then d — the edges do re-shuffle per round, the price
  * of an alive set too big to ship.
  */
object KCore {

  /** One peel round: survivors' degrees restricted to `alive`, thresholded
    * at k. Exposed for the plan-shape lock; `decompose` iterates it.
    */
  private[graft] def peelRound(e: DataFrame, alive: DataFrame, k: Int,
                               broadcastAlive: Boolean): DataFrame = {
    val hint: DataFrame => DataFrame =
      if (broadcastAlive) broadcast else identity
    e.join(hint(alive.select(col("node").as("s"))), "s")
      .join(hint(alive.select(col("node").as("d"))), "d")
      .groupBy(col("s").as("node"))
      .agg(count(lit(1)).as("__deg"))
      .filter(col("__deg") >= k)
      .select("node")
  }

  /** Returns every original node with `in_core` (survived the peel to the
    * k-core) and `core_deg` (its degree inside the final core; NULL when
    * peeled). `edges` is read as undirected; self-loops and duplicate edges
    * collapse. Fails loudly if the peel has not converged in `maxRounds`
    * (result would not be the k-core) — at that point rerun with a larger
    * bound, mirroring connectedComponents' contract.
    */
  def decompose(edges: DataFrame, srcCol: String, dstCol: String,
                k: Int, maxRounds: Int = 8,
                broadcastAlive: Boolean = true): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(maxRounds >= 1, s"need at least one round, got $maxRounds")
    val und = edges
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull &&
        col(srcCol) =!= col(dstCol))
      .select(col(srcCol).as("s"), col(dstCol).as("d"))
    // one-time edge layout: hash-partitioned on s so every round's degree
    // aggregation (groupBy s) is exchange-free under the broadcast joins;
    // cached (not localCheckpointed) because InMemoryRelation is what
    // carries the partitioning to every later round's plan
    val e = und.unionByName(und.select(col("d").as("s"), col("s").as("d")))
      .distinct()
      .repartition(col("s"))
      .persist()
    // Everything below reads `e`; the result is materialized (node-sized
    // localCheckpoint) before the finally releases the 2·|E| cache — the
    // Triangles.count discipline, so no decompose() call pins edge-scale
    // executor memory past its own return.
    try {
      val nodes = e.select(col("s").as("node")).distinct().localCheckpoint()

      var alive = nodes
      var prev = alive.count()
      var converged = false
      var round = 0
      while (!converged && round < maxRounds) {
        alive = peelRound(e, alive, k, broadcastAlive).localCheckpoint()
        val cur = alive.count()
        converged = cur == prev
        prev = cur
        round += 1
      }
      require(converged,
        s"k-core peel did not converge within $maxRounds rounds " +
          s"($prev nodes still alive) — rerun with a larger maxRounds")

      val hint: DataFrame => DataFrame =
        if (broadcastAlive) broadcast else identity
      val coreDeg = e
        .join(hint(alive.select(col("node").as("s"))), "s")
        .join(hint(alive.select(col("node").as("d"))), "d")
        .groupBy(col("s").as("node"))
        .agg(count(lit(1)).cast("long").as("core_deg"))
      nodes.join(coreDeg, Seq("node"), "left")
        .select(col("node"), col("core_deg").isNotNull.as("in_core"),
          col("core_deg"))
        .localCheckpoint()
    } finally {
      e.unpersist()
    }
  }
}
