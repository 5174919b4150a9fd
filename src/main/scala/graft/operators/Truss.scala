package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded k-truss peel — the cohesion filter one notch above
  * [[Triangles]]: keep edges supported by at least k−2 triangles, where
  * support is recomputed after each peel (removing a weak edge can
  * orphan its neighbours' triangles). The full k-truss iterates to a
  * fixpoint; this operator runs a DECLARED bounded number of peel
  * rounds — the [[PageRank]]/[[Hits]] unrolled-iteration discipline, so
  * the oracle replays each round as an unrolled CTE and the cost is
  * rounds × one triangle enumeration instead of data-dependent.
  *
  * Each round enumerates triangles by (degree, id) orientation — the
  * [[Triangles]] O(√m) wedge cap, so a hot vertex cannot explode the
  * join — maps every triangle back to its three canonical (u < v) edges,
  * folds per-edge support in one hash aggregation, and drops edges below
  * k−2. The surviving edge set is frozen (localCheckpoint) per round:
  * round r+1's plan starts from R rows, not from a 3r-join lineage.
  *
  * Output: surviving canonical edges after `rounds` peels with their
  * support in the FINAL surviving subgraph.
  */
object Truss {

  def peel(edges: DataFrame, srcCol: String, dstCol: String,
           k: Int, rounds: Int): DataFrame = {
    require(k >= 3, s"k-truss needs k >= 3, got $k")
    require(rounds >= 1 && rounds <= 16,
      s"declared bounded peel: 1 <= rounds <= 16, got $rounds")
    var e = canonical(edges, srcCol, dstCol)
    for (_ <- 1 to rounds) e = peelRound(e, k)
    withSupport(e)
  }

  /** [[peel]] iterated to the TRUE k-truss fixpoint: rounds continue
    * until a peel drops no edge (the exact-truss use case; the bounded
    * form stays the declared, oracle-replayable one — a peel cascade can
    * run arbitrarily deep, so the fixpoint round count is data-dependent
    * by nature). Fails LOUDLY when `maxRounds` is exhausted with edges
    * still dropping — the [[KCore]] convergence contract, never a silent
    * under-peel. Each round is the same O(√m)-oriented enumeration +
    * hash-agg fold, frozen per round, plus one count action for the
    * convergence test (a row count of the just-frozen frame — no extra
    * lineage replay).
    */
  def peelToFixpoint(edges: DataFrame, srcCol: String, dstCol: String,
                     k: Int, maxRounds: Int = 32): DataFrame = {
    require(k >= 3, s"k-truss needs k >= 3, got $k")
    require(maxRounds >= 1, s"need at least one round, got $maxRounds")
    var e = canonical(edges, srcCol, dstCol)
    var prev = e.count()
    var converged = prev == 0L
    var round = 0
    while (!converged && round < maxRounds) {
      e = peelRound(e, k)
      val n = e.count()
      converged = n == prev || n == 0L
      prev = n
      round += 1
    }
    require(converged,
      s"k-truss peel did not converge within $maxRounds rounds " +
        s"($prev edges still alive) — rerun with a larger maxRounds")
    withSupport(e)
  }

  /** Simple canonical (u < v) edge set, frozen. */
  private def canonical(edges: DataFrame, srcCol: String,
                        dstCol: String): DataFrame =
    edges
      .filter(col(srcCol) =!= col(dstCol) &&
        col(srcCol).isNotNull && col(dstCol).isNotNull)
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .distinct()
      .localCheckpoint()

  /** One peel round: recompute support, drop edges below k−2, freeze. */
  private def peelRound(e: DataFrame, k: Int): DataFrame =
    e.join(support(e), Seq("u", "v"), "left")
      .filter(coalesce(col("support"), lit(0L)) >= (k - 2).toLong)
      .select("u", "v")
      .localCheckpoint()

  /** Final surviving edges with their support in the final subgraph. */
  private def withSupport(e: DataFrame): DataFrame =
    e.join(support(e), Seq("u", "v"), "left")
      .select(col("u"), col("v"),
        coalesce(col("support"), lit(0L)).as("support"))

  /** Per-edge triangle support of a canonical (u < v) simple edge set:
    * degree-oriented wedge join (each triangle enumerated exactly once),
    * the three member edges re-canonicalized, one hash-agg fold. */
  private def support(canon: DataFrame): DataFrame = {
    val deg = canon.select(col("u").as("n"))
      .unionAll(canon.select(col("v").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
    val withDeg = canon
      .join(deg.select(col("n").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("n").as("v"), col("d").as("dv")), "v")
    val oriented = withDeg.select(
      when(struct(col("du"), col("u")) < struct(col("dv"), col("v")),
        struct(col("u").as("s"), col("v").as("t")))
        .otherwise(struct(col("v").as("s"), col("u").as("t"))).as("e"))
      .select(col("e.s").as("s"), col("e.t").as("t"))
    val tri = oriented.select(col("s"), col("t").as("b"))
      .join(oriented.select(col("s"), col("t").as("c")), "s")
      .filter(col("b") =!= col("c"))
      .join(oriented.select(col("s").as("b"), col("t").as("c")),
        Seq("b", "c"))
      .select(col("s"), col("b"), col("c"))
    tri.select(least(col("s"), col("b")).as("u"),
        greatest(col("s"), col("b")).as("v"))
      .unionAll(tri.select(least(col("s"), col("c")).as("u"),
        greatest(col("s"), col("c")).as("v")))
      .unionAll(tri.select(least(col("b"), col("c")).as("u"),
        greatest(col("b"), col("c")).as("v")))
      .groupBy("u", "v")
      .agg(count(lit(1)).cast("long").as("support"))
  }
}
