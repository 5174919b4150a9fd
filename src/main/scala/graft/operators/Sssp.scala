package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-hop shortest paths (BFS layers) from a seed set — the
  * reachability/proximity operator of the graph tier ("how many hops is
  * this part from a promoted part", crawl-frontier depth, blast-radius
  * analysis).
  *
  * Synchronous min-plus relaxation: per round, one join of the frontier's
  * distances onto the frozen edge list + one partial-aggregated min — the
  * PageRank/LabelProp per-round budget, state localCheckpoint-frozen so
  * round k+1 never replays rounds 1..k. Distances are integers, min is
  * order-independent, so the result is bit-identical on any partitioning
  * and the oracle replays the EXACT unrolled rounds as chained CTEs (the
  * q125 recipe). A fixed round budget is the contract (not convergence):
  * nodes farther than `rounds` hops report NULL — the caller picks the
  * radius the analysis needs, and the oracle unrolls the same number.
  */
object Sssp {

  /** (node, dist) for every node of `edges`; dist = hop count from the
    * nearest seed within `rounds`, NULL beyond the radius. `seeds` carries
    * one `node` column; seeds not present in the graph are ignored.
    */
  def hopDistances(edges: DataFrame, seeds: DataFrame,
                   rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 50,
      s"rounds must be in [1, 50], got $rounds")
    val e = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct().localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    var dist = nodes
      .join(seeds.select(col("node").cast("long").as("node"))
          .distinct().withColumn("dist", lit(0L)),
        Seq("node"), "left")
      .localCheckpoint()
    for (_ <- 1 to rounds) {
      // shuffle_hash: hash-build the node-sized settled side, stream the
      // edges unsorted (the PageRank iteration discipline — see
      // PageRank.scala for the build-size assumption and scale probe)
      val relax = e
        .join(dist.filter(col("dist").isNotNull)
          .select(col("node").as("src"), col("dist"))
          .hint("shuffle_hash"), "src")
        .select(col("dst").as("node"), (col("dist") + 1L).as("cand"))
        .groupBy("node").agg(min("cand").as("cand"))
      val updated = dist.join(relax, Seq("node"), "left")
        .select(col("node"),
          least(coalesce(col("dist"), col("cand")),
                coalesce(col("cand"), col("dist"))).as("dist"))
      graft.plans.PlanDump.dump("sssp_round", updated)
      dist = updated.localCheckpoint()
    }
    dist
  }
}
