package graft

import org.apache.spark.sql.functions._

/** Round-13 units: the DECIMAL-through overflow fix for the rank-test
  * audit surfaces. Each test constructs a dataset whose `b2_q9` /
  * `w2_den` / `v72` value exceeds Long.MaxValue (the regime where the
  * old BIGINT casts silently NULLed in non-ANSI Spark while DuckDB's
  * cast errored) and pins the exact digit-string the DECIMAL(38,0) path
  * must emit.
  */
class Round13Spec extends SparkSpec {

  test("kruskalWallisFromCounts past Long.Max: two perfectly separated " +
      "2e6-count groups keep exact b2_q9/w2_den digits and H = N-1") {
    val s = spark
    import s.implicits._
    // N = 4e6 (< the 1e7 guard) but the per-group b2 term is 8e27 and
    // W2 = 1.6e19 - both far past 2^63 ~ 9.2e18
    val cells = Seq(("A", 1L, 2000000L), ("B", 2L, 2000000L))
      .toDF("g", "v", "c")
    val got = graft.data.RankTests.kruskalWallisFromCounts(cells)
      .collect().head
    assert(got.getAs[Long]("n_total") === 4000000L)
    // doubled midranks 2000001 / 6000001, dev = -/+ 4e12 per group:
    // W2 = 2 * 2e6 * (2e6)^2 = 1.6e19
    assert(got.getAs[String]("w2_den") === "16000000000000000000")
    // b2_q9 = 2 * ((4e12)^2 * 1e9 div 2e6) = 1.6e28
    assert(got.getAs[String]("b2_q9") ===
      "16000000000000000000000000000")
    // perfect separation: H = N-1 exactly -> (N-1)*1e6 ppm
    assert(got.getAs[Long]("h_ppm") === 3999999000000L)
  }

  test("kruskalWallisFromCountsGrouped past Long.Max: the big segment " +
      "matches the ungrouped kernel digit for digit") {
    val s = spark
    import s.implicits._
    val cells = Seq(
      ("big", "A", 1L, 2000000L), ("big", "B", 2L, 2000000L),
      ("small", "A", 1L, 1L), ("small", "B", 2L, 2L))
      .toDF("seg", "g", "v", "c")
    val got = graft.data.RankTests
      .kruskalWallisFromCountsGrouped(cells, Seq("seg"))
      .collect().map(r => r.getAs[String]("seg") -> r).toMap
    assert(got("big").getAs[String]("b2_q9") ===
      "16000000000000000000000000000")
    assert(got("big").getAs[Long]("h_ppm") === 3999999000000L)
    // the small segment still agrees with the ungrouped run
    val small = graft.data.RankTests.kruskalWallisFromCounts(
      cells.filter(col("seg") === "small").drop("seg")).collect().head
    assert(got("small").getAs[Long]("h_ppm") ===
      small.getAs[Long]("h_ppm"))
  }

  test("jonckheereFromCounts past Long.Max: n = 2e6 puts v72 at 1.2e19 " +
      "and the exact z2 replays in BigInt") {
    val s = spark
    import s.implicits._
    // two separated 1e6 groups: v72 = n^2(2n+3) - 2*ng^2(2ng+3) > 2^63
    val cells = Seq((1L, 1L, 1000000L), (2L, 2L, 1000000L))
      .toDF("g", "v", "c")
    val got = graft.data.RankTests.jonckheereFromCounts(cells)
      .collect().head
    val n = BigInt(2000000); val ng = BigInt(1000000)
    val v72 = n * n * (2 * n + 3) - 2 * (ng * ng * (2 * ng + 3))
    assert(v72 > BigInt(Long.MaxValue))
    assert(got.getAs[String]("v72") === v72.toString)
    val j2 = BigInt(got.getAs[Long]("j2"))
    val eJ2 = BigInt(got.getAs[Long]("e_j2"))
    assert(j2 === 2 * ng * ng)      // every cross pair a strict <
    assert(eJ2 === ng * ng)
    val z2 = (j2 - eJ2) * (j2 - eJ2) * 18 * 1000000 / v72
    assert(BigInt(got.getAs[Long]("z2_ppm")) === z2)
    assert(got.getAs[Boolean]("trend_up"))
  }

  test("runs-test click flag: NULL event_type counts as non-click " +
      "(the oracle's CASE WHEN semantics), not as a NULL flag") {
    val s = spark
    import s.implicits._
    // u1: click, NULL, click -> flags 1,0,1 -> 3 runs (the bare ===
    // would NULL the middle flag and report a 2-run sequence)
    val ev = Seq(
      ("u1", 1L, 1L, Some("click")),
      ("u1", 2L, 2L, None),
      ("u1", 3L, 3L, Some("click")))
      .toDF("user_id", "ts", "event_id", "event_type")
    val flagged = ev.select(col("user_id"), col("ts"), col("event_id"),
      coalesce(col("event_type") === "click", lit(false)).as("is_click"))
    val got = graft.data.SeriesStats
      .runsTest(flagged, Seq("user_id"), Seq("ts", "event_id"),
        "is_click")
      .collect().head
    assert(got.getAs[Long]("n") === 3L)
    assert(got.getAs[Long]("n1") === 2L)
    assert(got.getAs[Long]("n0") === 1L)
    assert(got.getAs[Long]("runs") === 3L)
  }
}
