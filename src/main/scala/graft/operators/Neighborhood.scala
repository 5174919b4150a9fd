package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-radius neighborhood function — per node, HOW MANY nodes sit at
  * shortest-path distance d for d = 1..radius — and with it harmonic
  * centrality restricted to that radius (Σ 1/d over reached nodes, the
  * Boldi–Vigna closeness surrogate a corpus-graph audit ranks hub
  * documents / bridge entities by). [[Sssp]] answers "how far is
  * everything from ONE seed set"; this answers "how much sits NEAR every
  * node".
  *
  * Scale shape (the q125/q218 iterative discipline): the distinct edge
  * list and its expandable subset are frozen ONCE (localCheckpoint); each
  * round is one equi-join of the current frontier onto the capped edge
  * set + one distinct + one left-anti against the reached set — all
  * hash-partitioned on the pair key, no windows, no driver collect.
  * All-pairs-within-radius is inherently |N_r| rows, so expansion beyond
  * hop 1 goes ONLY through bridge nodes of degree ≤ `degCap` (the
  * q258/q146 hub discipline — a hub's hop-2 fanout is quadratic and its
  * count contribution is better measured by hop-1 degree); the capped-
  * graph semantics are DECLARED and the oracle replays the identical cap.
  *
  * Determinism: counts are exact integers on the capped graph; harmonic
  * weights are the exact integer quotients 10⁶ div d, so any engine
  * replays the sum bit-for-bit (callers combine as Σ cnt_d·(10⁶ div d)).
  */
object Neighborhood {

  /** Long-format neighborhood function: one row per (node, dist) with the
    * exact count of distinct nodes first reached at that distance,
    * 1 ≤ dist ≤ radius. Hop 1 is the true (uncapped) neighbor count;
    * hops ≥ 2 expand only through degree-≤-`degCap` bridges.
    */
  def function(edges: DataFrame, srcCol: String, dstCol: String,
               radius: Int, degCap: Long): DataFrame = {
    require(radius >= 1 && radius <= 6,
      s"radius must be in [1, 6], got $radius")
    val e = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull &&
        col("src") =!= col("dst"))
      .distinct().localCheckpoint()
    val deg = e.groupBy("src").agg(count(lit(1)).cast("long").as("deg"))
    // edges expandable THROUGH: their source is a degree-capped bridge
    val capped = e.join(deg.filter(col("deg") <= degCap), "src")
      .select(col("src").as("w"), col("dst").as("v"))
      .localCheckpoint()

    var reached = e.select(col("src").as("u"), col("dst").as("x"),
      lit(1).as("dist")).localCheckpoint()
    var frontier = reached
    for (d <- 2 to radius) {
      // no shuffle_hash hint here: the frontier is PAIR-sized (unlike the
      // node-sized state of PageRank/Sssp/LabelProp), so a forced hash
      // build could blow a task at scale
      val expand = frontier.join(capped, frontier("x") === capped("w"))
        .select(col("u"), col("v").as("x"))
        .filter(col("u") =!= col("x"))
        .distinct()
        .join(reached.select("u", "x"), Seq("u", "x"), "left_anti")
        .withColumn("dist", lit(d))
      graft.plans.PlanDump.dump("neighborhood_round", expand)
      val next = expand.localCheckpoint()
      reached = reached.unionByName(next)
      frontier = next
    }
    reached.groupBy(col("u").as("node"), col("dist"))
      .agg(count(lit(1)).cast("long").as("cnt"))
  }
}
