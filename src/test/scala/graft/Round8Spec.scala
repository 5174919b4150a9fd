package graft

import org.apache.spark.sql.functions._

import graft.idx.CosSimIndexer

/** Round-8 units: the de-bottlenecked negative-split (GlobalRank instead of
  * a single-partition global window + forced broadcast) at 10x the entity
  * counts the query suite uses.
  */
class Round8Spec extends SparkSpec {
  import spark.implicits._

  test("negative split: GlobalRank path is exact and deterministic at 10x entity count") {
    // 3000 entities x 2 names — an order of magnitude over the q48/q50
    // fixtures; the former Window.orderBy(...) plan put all of it in ONE
    // partition and force-broadcast the flag table
    val names = spark.range(6000).select(
      col("id").as(Cols.Uid),
      concat(lit("name "), (col("id") / 2).cast("long").cast("string")).as(Cols.Name),
      (col("id") / 2).cast("long").cast("string").as(Cols.EntityId))
    val model = EntityMatching(EmParams(), Seq(
      new CosSimIndexer(numCandidates = 1, lowerBound = 0.9))).fit(
      names.select(col(Cols.EntityId).cast("long").as(Cols.Uid), col(Cols.Name),
                   col(Cols.EntityId)).distinct())
    val frac = 0.25
    val pairs = model.createTrainingPairs(names, createNegativeSampleFraction = frac)
    val posEntities = pairs.filter(col("positive_set"))
      .select(Cols.EntityId).distinct().count()
    val negEntities = pairs.filter(!col("positive_set"))
      .select(Cols.EntityId).distinct().count()
    assert(posEntities == math.floor((1.0 - frac) * 3000).toLong,
      s"expected floor(0.75*3000)=2250 positive entities, got $posEntities")
    assert(posEntities + negEntities == 3000)
    // the hash split is a pure function of (entity_id, seed): re-running
    // yields the identical partition of entities
    val again = model.createTrainingPairs(names, createNegativeSampleFraction = frac)
    val a = pairs.filter(col("positive_set")).select(Cols.EntityId).distinct()
    val b = again.filter(col("positive_set")).select(Cols.EntityId).distinct()
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }
}
