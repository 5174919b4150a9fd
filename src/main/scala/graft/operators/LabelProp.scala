package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semi-supervised label propagation (Zhu & Ghahramani 2002 / the community
  * LPA of Raghavan et al. 2007, seeded variant): a small labeled seed set
  * spreads over a similarity/co-occurrence graph — the cheap way to label a
  * 100 TB corpus when only a sliver has ground truth.
  *
  * Synchronous, fully deterministic update: each round every non-seed node
  * takes the label with the most labeled neighbours, ties broken by the
  * lexicographically smallest label; seeds never change. Integer vote
  * counts + total tie order make every round bit-replayable on any
  * partitioning (the PageRank q125 argument), so the whole fixed number of
  * rounds is SQL-oracle-checkable.
  *
  * Plan per round: one edge-labels equi-join, one (node, label) partial
  * aggregation, one per-node top-1 min(struct) aggregate over the
  * label-vote relation (bounded by the label vocabulary, never the
  * corpus). Labels are frozen
  * with localCheckpoint each round — without it the lineage doubles per
  * round and replays every prior join (the connectedComponents lesson,
  * Dedup.scala).
  */
object LabelProp {

  /** Returns (node, label, is_seed) after `iterations` synchronous rounds.
    * `edges` is read as undirected (both orientations are added, self-loops
    * and duplicates collapse); nodes never touching a labeled node keep a
    * NULL label.
    */
  def propagate(edges: DataFrame, srcCol: String, dstCol: String,
                seeds: DataFrame, nodeCol: String, labelCol: String,
                iterations: Int): DataFrame = {
    require(iterations >= 1, s"need at least one round, got $iterations")
    val und = edges
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull &&
        col(srcCol) =!= col(dstCol))
      .select(col(srcCol).as("s"), col(dstCol).as("d"))
    val e = und.unionByName(und.select(col("d").as("s"), col("s").as("d")))
      .distinct()
      .localCheckpoint()

    val nodes = e.select(col("s").as("node")).distinct()
    val seedLabels = seeds.select(col(nodeCol).as("node"),
      col(labelCol).as("seed_label"))
      .filter(col("seed_label").isNotNull)

    var labels = nodes.join(seedLabels, Seq("node"), "left")
      .select(col("node"), col("seed_label").as("label"),
        col("seed_label").isNotNull.as("is_seed"))
      .localCheckpoint()

    for (_ <- 1 to iterations) {
      // shuffle_hash: hash-build the node-sized labeled side, stream the
      // edge relation unsorted (the PageRank iteration discipline — see
      // PageRank.scala for the build-size assumption and scale probe)
      val votes = e
        .join(labels.filter(col("label").isNotNull)
          .select(col("node").as("s"), col("label").as("vote"))
          .hint("shuffle_hash"), "s")
        .groupBy(col("d").as("node"), col("vote"))
        .agg(count(lit(1)).as("n"))
      // top-1 as min(struct(-n, vote)) — same pick as the old row_number
      // window over (n desc, vote asc) but a declarative aggregate with
      // MAP-SIDE partials, no per-round exchange+sort of the vote
      // relation (opt guide §2.3/§4; the r19 Louvain argmax discipline)
      val winner = votes.groupBy("node")
        .agg(min(struct((-col("n")).as("__nn"), col("vote"))).as("__b"))
        .select(col("node"), col("__b.vote").as("winner"))
      val updated = labels.join(winner, Seq("node"), "left")
        .select(col("node"),
          when(col("is_seed"), col("label"))
            .otherwise(coalesce(col("winner"), col("label"))).as("label"),
          col("is_seed"))
      graft.plans.PlanDump.dump("labelprop_round", updated)
      labels = updated.localCheckpoint()
    }
    labels
  }
}
