package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-center coreset selection by farthest-point traversal (Gonzalez 1985,
  * the 2-approximation to the k-center objective) — the DIVERSITY sampler
  * of a curation pipeline: "give me k maximally-spread examples" for eval
  * sets, labeling budgets, or seed sets, where the hash samplers (q66…)
  * give coverage by mass, not by geometry. Greedy rule: start from the
  * smallest id (deterministic anchor), then repeatedly take the point
  * farthest from the chosen set, ties to the smallest id; after k picks the
  * reported cover radius = max over the corpus of distance-to-nearest-
  * center, the classic coreset quality certificate (every point is within
  * that radius of some center, and no (k)-center solution can beat half
  * of it).
  *
  * Exact-replay discipline (the q412 family): vectors quantize once via
  * floor(x·10⁶ + 0.5), distances are exact BIGINT squared-L2 folds against
  * LITERAL center vectors (no join, no UDF), and each round's pick is a
  * TakeOrdered(1) on (dist desc, id) — never a full sort. The driver loop
  * runs k − 1 bounded rounds over a localCheckpoint-frozen quantized frame
  * (scan the source once), holding only k·dim longs — so the DuckDB oracle
  * replays the whole traversal as k chained CTEs, bit for bit.
  *
  * At 100 TB: each round is one map-only distance pass + one top-1
  * reduction — k passes total, the same shape FAISS-style k-center
  * implementations use; for very large k switch to the sampled variant
  * (fit on a bounded sample, the `Knn.ivfFit` argument) — this kernel is
  * the exact, verifiable tier.
  */
object Coreset {

  /** @return k rows: (center_rank 1-based, vec_id, d_sel = the squared
    *         distance that made the pick, NULL for the anchor,
    *         cover_radius = the post-selection max min-distance, repeated).
    */
  def kCenters(df: DataFrame, k: Int, scale: Double = 1e6,
               idCol: String = "vec_id",
               vecCol: String = "embedding"): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    val qv = transform(col(vecCol),
      x => floor(x.cast("double") * lit(scale) + lit(0.5)).cast("long"))
    val base = df
      .select(col(idCol).cast("long").as("vec_id"), qv.as("v"))
      .filter(col("v").isNotNull)
      .localCheckpoint()
    val first = base.orderBy("vec_id").limit(1).collect()
    require(first.nonEmpty, "kCenters needs a non-empty input")
    var centers =
      Vector((first(0).getLong(0), first(0).getSeq[Long](1).toArray,
        Option.empty[Long]))
    def dmin = {
      val ds = centers.map { case (_, cv, _) => Pq.distToLit(col("v"), cv) }
      if (ds.length == 1) ds.head else least(ds: _*)
    }
    var r = 1
    while (r < k) {
      val pick = base
        .filter(!col("vec_id").isin(centers.map(_._1): _*))
        .withColumn("dmin", dmin)
        .orderBy(col("dmin").desc, col("vec_id")).limit(1)
        .collect()
      require(pick.nonEmpty,
        s"kCenters: corpus exhausted after ${centers.length} picks, k=$k")
      centers = centers :+ ((pick(0).getLong(0),
        pick(0).getSeq[Long](1).toArray, Some(pick(0).getLong(2))))
      r += 1
    }
    val radius = base.withColumn("dmin", dmin)
      .agg(max("dmin")).collect()(0).getLong(0)
    val s = df.sparkSession
    import s.implicits._
    centers.zipWithIndex.map { case ((id, _, dSel), i) =>
      (i + 1, id, dSel, radius)
    }.toDF("center_rank", "vec_id", "d_sel", "cover_radius")
  }
}
