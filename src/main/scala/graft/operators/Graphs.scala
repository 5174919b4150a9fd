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

  /** Deterministic hash-pseudo-random walk corpus — DeepWalk's data-prep
    * step (Perozzi–Al-Rfou–Skiena 2014) made REPLAYABLE: one walk of `len`
    * hops per start node over the canonical undirected graph, where the
    * hop at step t from node n is the neighbour minimizing
    * md5(start:t:n:neighbour) (ties to the smaller neighbour id). The md5
    * ordering is a portable stand-in for the uniform random choice — what
    * a training pipeline needs from a walk corpus is coverage plus
    * DETERMINISM (re-runs, engine parity, resumable sharding), not
    * cryptographic randomness, and a keyed-hash argmin delivers exactly
    * the q66 seeded-sampler discipline at graph grain.
    *
    * Shape: `len` bounded rounds (the k-truss/KCore round contract), each
    * one join on the current node + one per-start argmin hash agg;
    * per-round localCheckpoint truncates the iterative lineage (house
    * idiom). Starts that are not graph nodes emit only their step-0 row
    * (documented; the walk has nowhere to go).
    *
    * @return (start, step 0..len, node) — step 0 is the start itself
    */
  def hashWalks(edges: DataFrame, srcCol: String, dstCol: String,
                starts: DataFrame, startCol: String, len: Int): DataFrame =
    hashWalksCanon(canonEdges(edges, srcCol, dstCol), starts, startCol, len)

  /** Canonical undirected simple edge set (u < v, self-loops and NULL
    * endpoints dropped, duplicates collapsed) — the shared first step of
    * every walk-tier kernel. Exposed package-private so a query composing
    * several kernels over the SAME edge frame (q442: walks → pairs →
    * negatives) can derive it once, freeze it, and pass it to the
    * canon-grain entry points instead of paying the derivation (for the
    * co-purchase graph, a lineitem self-join + pair distinct) per kernel
    * (opt guide §1.2 — don't compute the same thing twice).
    */
  private[graft] def canonEdges(edges: DataFrame, srcCol: String,
                                dstCol: String): DataFrame =
    edges
      .filter(col(srcCol) =!= col(dstCol) &&
        col(srcCol).isNotNull && col(dstCol).isNotNull)
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .distinct()

  /** [[hashWalks]] body over an already-canonical (u, v) edge set. */
  private[graft] def hashWalksCanon(canon: DataFrame, starts: DataFrame,
                                    startCol: String, len: Int): DataFrame = {
    require(len >= 1 && len <= 16, s"len must be in [1, 16], got $len")
    // adjacency CACHED on the hop join key: without this every hop's
    // localCheckpoint action re-derives the whole edge pipeline (for the
    // co-purchase graph that is a lineitem self-join + distinct PER HOP),
    // and the InMemoryRelation's preserved hash partitioning means a hop
    // join never exchanges the edge side (the KCore lesson) — only the
    // walk-frontier (one row per start) moves. Released in the finally:
    // every per-hop frame is already localCheckpoint-materialized, so
    // nothing downstream re-reads the cache.
    val dirs = canon.select(col("u").as("node"), col("v").as("nbr"))
      .unionAll(canon.select(col("v").as("node"), col("u").as("nbr")))
      .repartition(canon.sparkSession.sessionState.conf.numShufflePartitions,
        col("node")).persist()
    try {
      var cur = starts
        .select(col(startCol).cast("long").as("start")).distinct()
        .withColumn("node", col("start"))
      var out = cur.localCheckpoint().withColumn("step", lit(0))
      cur = out.select("start", "node")
      var t = 1
      while (t <= len) {
        // shuffle_hash build on the start-sized frontier: the cached
        // adjacency streams unsorted and unshuffled
        val hop = dirs.join(cur.hint("shuffle_hash"), Seq("node"))
          .withColumn("__h", md5(concat_ws(":",
            col("start"), lit(t), col("node"), col("nbr"))))
          .groupBy("start")
          .agg(min(struct(col("__h"), col("nbr"))).as("__m"))
          .select(col("start"), col("__m.nbr").as("node"))
        graft.plans.PlanDump.dump("hashwalks_hop", hop)
        cur = hop.localCheckpoint()
        out = out.unionByName(cur.withColumn("step", lit(t)))
        t += 1
      }
      out.select(col("start"), col("step").cast("int").as("step"),
        col("node"))
    } finally {
      dirs.unpersist()
    }
  }

  /** Skip-gram training pairs over a walk corpus — the second half of the
    * DeepWalk data-prep (the [[hashWalks]] output is the "sentences", this
    * is the (center, context) pair emission word2vec-style trainers
    * consume): within each walk, every ordered position pair at distance
    * 1..window becomes a pair, aggregated to exact integer counts across
    * the corpus. Revisits are kept as-is (a walk returning to a node
    * legitimately emits (v, v) pairs — the standard convention; the
    * trainer's subsampling is its own concern).
    *
    * Shape: one self-join per walk key on a bounded |step-diff| band (walk
    * length is a declared small constant, so the fan-out per walk is
    * ≤ len·2·window) + one hash agg with map-side partials. Replayable
    * relationally — with [[hashWalks]]' deterministic corpus the whole
    * pipeline is engine-exact end to end.
    */
  def skipGramPairs(walks: DataFrame, window: Int): DataFrame = {
    require(window >= 1 && window <= 16,
      s"window must be in [1, 16], got $window")
    val a = walks.select(col("start"), col("step").as("si"),
      col("node").as("center"))
    val b = walks.select(col("start"), col("step").as("sj"),
      col("node").as("context"))
    a.join(b, Seq("start"))
      .filter(col("si") =!= col("sj") &&
        abs(col("si") - col("sj")) <= window)
      .groupBy("center", "context")
      .agg(count(lit(1)).cast("long").as("n_pairs"))
  }

  /** Deterministic skip-gram NEGATIVE sampler — the third and final piece
    * of the DeepWalk/word2vec data prep ([[hashWalks]] → sentences,
    * [[skipGramPairs]] → positives, this → the negatives SGNS training
    * consumes): `nNeg` degree-proportional draws per distinct (center,
    * context) pair, replayable bit-for-bit in any engine.
    *
    * The draw trick that keeps it EXACT: sampling a node proportionally
    * to degree ≡ sampling UNIFORMLY over the 2m DIRECTED EDGE SLOTS and
    * taking the slot's destination (each node is a destination exactly
    * deg(node) times). So the weighted draw needs no float weights, no
    * alias table and no interval join — slot index = first 48 md5 bits
    * of (salt, center, context, j) mod 2m (the q66/q143 seeded-draw
    * convention; 48 bits are exact in both engines), and the assignment
    * is ONE EQUI-JOIN against the globally-ranked directed edge list
    * ([[GlobalRank]], the distributed zipWithIndex — never a
    * single-partition window). The α = 3/4 unigram damping of the
    * original paper needs float pow, which no exact replay can carry —
    * α = 1 (plain degree) is the declared variant.
    *
    * A draw can hit the pair's own context (or center) — standard SGNS
    * resamples; a deterministic operator cannot without data-dependent
    * round counts, so collisions are KEPT and FLAGGED (`is_collision`),
    * the trainer's documented drop/keep choice. Draw space must fit the
    * 48-bit key: loud require at 2m > 2^48 (≈ 2.8 · 10¹⁴ directed slots
    * — beyond any declared graph here).
    *
    * @return (center, context, neg_idx 0-based, negative, is_collision)
    */
  def negativeSamples(pairs: DataFrame, edges: DataFrame, srcCol: String,
                      dstCol: String, nNeg: Int,
                      salt: String = "ns|"): DataFrame =
    negativeSamplesCanon(pairs, canonEdges(edges, srcCol, dstCol), nNeg,
      salt)

  /** [[negativeSamples]] body over an already-canonical (u, v) edge set —
    * lets q442 reuse the frozen canon its walk chain already derived
    * instead of re-running the lineitem self-join + distinct. */
  private[graft] def negativeSamplesCanon(pairs: DataFrame,
                                          canon: DataFrame, nNeg: Int,
                                          salt: String = "ns|"): DataFrame = {
    require(nNeg >= 1 && nNeg <= 16, s"nNeg must be in [1, 16], got $nNeg")
    val dirs = canon.select(col("u").as("n"), col("v").as("nbr"))
      .unionAll(canon.select(col("v").as("n"), col("u").as("nbr")))
    val slots = GlobalRank
      .withGlobalRank(dirs, "slot", Seq("n", "nbr"))
      .select(col("slot"), col("nbr").as("negative"))
      .localCheckpoint() // two consumers: the count and the draw join
    val total = slots.count()
    require(total > 0, "negativeSamples: empty graph")
    require(total <= (1L << 48),
      s"negativeSamples: $total directed slots exceed the 48-bit draw space")
    pairs.select(col("center"), col("context")).distinct()
      .select(col("center"), col("context"),
        explode(sequence(lit(0), lit(nNeg - 1))).as("neg_idx"))
      .withColumn("slot",
        conv(substring(md5(concat(lit(salt), concat_ws(":",
          col("center"), col("context"), col("neg_idx")))), 1, 12),
          16, 10).cast("long") % total)
      .join(slots, Seq("slot"))
      .select(col("center"), col("context"),
        col("neg_idx").cast("int").as("neg_idx"), col("negative"),
        (col("negative") === col("context")).as("is_collision"))
  }

  /** ONE synchronous Louvain local-move sweep (Blondel et al. 2008 phase-1
    * step, the move rule distributed-Louvain implementations apply per
    * round): every node i in community a evaluates, against the CURRENT
    * partition, the exact modularity gain of moving to each neighbouring
    * community c —
    *
    *   ΔQ(i→c)·2m² = 2m·(k_ic − k_ia) − d_i·(Σtot_c − Σtot_a + d_i)
    *
    * (k_ic = i's edges into c, Σtot_c = degree mass of c; the −d_i term is
    * i's own removal from a) — and adopts the strictly-positive best, ties
    * to the smallest community label, else stays. All moves apply
    * SIMULTANEOUSLY off the old partition (the synchronous semantics every
    * engine-parallel Louvain uses; a full Louvain loops this to a plateau —
    * callers iterate, this kernel is one bounded round, the k-truss/KCore
    * round contract). Synchronous sweeps can oscillate on adversarial
    * graphs, so the q417 surface reports EXACT Q before and after rather
    * than asserting improvement.
    *
    * Exact arithmetic end to end: gains in DECIMAL(38,0) (2m·k products
    * overflow BIGINT long before the declared N guards elsewhere), the
    * argmax a (gain desc, label asc) min(struct) aggregate — map-side
    * partials, no sort. Shape: one edge canonicalization feeding directions,
    * degrees, and neighbour-community counts (shared subtree), label-sized
    * Σtot aggregation broadcast back, one node-grain argmax.
    *
    * @return one row per graph node: `n, lbl_old, lbl_new`
    */
  def louvainMove(edges: DataFrame, srcCol: String, dstCol: String,
                  labels: DataFrame, nodeCol: String,
                  lblCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val canon = edges
      .filter(col(srcCol) =!= col(dstCol) &&
        col(srcCol).isNotNull && col(dstCol).isNotNull)
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .distinct()
      .localCheckpoint() // m, degrees, directions all read this freeze
    val m = canon.count()
    val lbl = labels.select(col(nodeCol).as("n"), col(lblCol).as("lbl"))
    val dir = canon.select(col("u").as("n"), col("v").as("nbr"))
      .unionAll(canon.select(col("v").as("n"), col("u").as("nbr")))
    val deg = dir.groupBy("n").agg(count(lit(1)).cast("long").as("d"))
    // every graph node must be labeled — the q394 caller contract, loud
    val nodeLbl = deg.join(lbl, Seq("n"), "left")
      .withColumn("lbl",
        when(col("lbl").isNull, raise_error(concat(
          lit("louvainMove: unlabeled graph node "), col("n"))))
          .otherwise(col("lbl")))
    val sigmaTot = nodeLbl.groupBy("lbl")
      .agg(sum("d").cast("long").as("stot"))
    // k_ic: i's edge count into each neighbouring community
    val kic = dir
      .join(lbl.select(col("n").as("nbr"), col("lbl").as("c")), Seq("nbr"))
      .groupBy("n", "c").agg(count(lit(1)).cast("long").as("k"))
    val base = nodeLbl // (n, d, lbl=a)
      .join(kic.select(col("n"), col("c").as("lbl"),
        col("k").as("k_ia")), Seq("n", "lbl"), "left")
      .withColumn("k_ia", coalesce(col("k_ia"), lit(0L)))
      .join(broadcast(sigmaTot.select(col("lbl"),
        col("stot").as("stot_a"))), Seq("lbl"))
    val cand = base
      .join(kic, Seq("n"))
      .filter(col("c") =!= col("lbl"))
      .join(broadcast(sigmaTot.select(col("lbl").as("c"),
        col("stot").as("stot_c"))), Seq("c"))
      .withColumn("gain2m2", expr(
        s"""CAST(2 AS $d38) * $m * (k - k_ia) -
            CAST(d AS $d38) * (stot_c - stot_a + d)"""))
      .filter(col("gain2m2") > 0)
    // argmax(gain desc, c asc) as min(struct(-gain, c)) — a declarative
    // aggregate with MAP-SIDE partials instead of the row_number window's
    // exchange + per-partition SORT of the full candidate relation (opt
    // guide §2.3/§4; same pick: min -gain = max gain, ties to smallest c)
    val best = cand.groupBy("n")
      .agg(min(struct((-col("gain2m2")).as("__ng"), col("c"))).as("__b"))
      .select(col("n"), col("__b.c").as("lbl_best"))
    nodeLbl.select(col("n"), col("lbl").as("lbl_old"))
      .join(best, Seq("n"), "left")
      .select(col("n"), col("lbl_old"),
        coalesce(col("lbl_best"), col("lbl_old")).as("lbl_new"))
  }

  /** Per-community CONDUCTANCE (Kannan–Vempala–Vetta 2004) — the
    * community-grain quality readout beside [[modularity]]'s one global
    * Q: φ(c) = cut(c) / min(vol(c), 2m − vol(c)) over the undirected
    * simple graph, the "how leaky is this community" number a curation
    * pipeline reads per cluster before trusting it as a stratum.
    * Emitted as the exact ×10⁶ integer floor (cut and vol are exact
    * longs; NULL when the denominator is 0 — a community covering the
    * whole graph, or one with no volume). Every graph node must be
    * labeled (the louvainMove loud contract).
    *
    * Shape: one canonicalization + two label joins on the edge list +
    * one degree agg + one label-grain agg — nothing iterative, label
    * relation never broadcast by hint (labels are node-sized).
    *
    * @return one row per community: `lbl, n_nodes, vol, cut_w, phi_x1e6`
    */
  def conductance(edges: DataFrame, srcCol: String, dstCol: String,
                  labels: DataFrame, nodeCol: String,
                  lblCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val canon = edges
      .filter(col(srcCol) =!= col(dstCol) &&
        col(srcCol).isNotNull && col(dstCol).isNotNull)
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .distinct()
      .localCheckpoint() // degrees, both label joins and 2m read this
    val lbl = labels.select(col(nodeCol).as("n"), col(lblCol).as("lbl"))
    val deg = canon.select(col("u").as("n"))
      .unionAll(canon.select(col("v").as("n")))
      .groupBy("n").agg(count(lit(1)).cast("long").as("d"))
    val nodeLbl = deg.join(lbl, Seq("n"), "left")
      .withColumn("lbl",
        when(col("lbl").isNull, raise_error(concat(
          lit("conductance: unlabeled graph node "), col("n"))))
          .otherwise(col("lbl")))
    val vol = nodeLbl.groupBy("lbl")
      .agg(sum("d").cast("long").as("vol"),
        count(lit(1)).cast("long").as("n_nodes"))
    val withLbl = canon
      .join(lbl.select(col("n").as("u"), col("lbl").as("lu")), Seq("u"))
      .join(lbl.select(col("n").as("v"), col("lbl").as("lv")), Seq("v"))
      .filter(col("lu") =!= col("lv"))
    // a cut edge counts against BOTH its communities
    val cut = withLbl.select(col("lu").as("lbl"))
      .unionAll(withLbl.select(col("lv").as("lbl")))
      .groupBy("lbl").agg(count(lit(1)).cast("long").as("cut_w"))
    val twoM = deg.agg(coalesce(sum("d"), lit(0L)).cast("long").as("m2"))
    vol.join(cut, Seq("lbl"), "left")
      .withColumn("cut_w", coalesce(col("cut_w"), lit(0L)))
      .crossJoin(broadcast(twoM))
      .withColumn("__den", least(col("vol"), col("m2") - col("vol")))
      .withColumn("phi_x1e6",
        when(col("__den") > 0,
          expr(s"CAST(CAST(cut_w AS $d38) * 1000000 div __den AS BIGINT)"))
          .otherwise(lit(null).cast("long")))
      .select("lbl", "n_nodes", "vol", "cut_w", "phi_x1e6")
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
