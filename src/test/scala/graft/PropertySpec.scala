package graft

import org.apache.spark.sql.functions._
import scala.util.Random

/** Property-based invariants over SEEDED random inputs — every trial uses
  * a deterministic scala.util.Random stream, so a failure reproduces
  * bit-for-bit. Two kinds of property:
  *
  *  - BRUTE-FORCE mini-oracles: the distributed kernel's answer on a
  *    tiny random input must equal an independent O(n²)/O(n³) BigInt
  *    reimplementation of the DEFINITION (Pettitt from the literal pair
  *    sum, Hoeffding from the literal per-point bivariate ranks). These
  *    catch formula errors the hand-value units can't (hand values only
  *    pin the cases someone thought of).
  *  - STRUCTURAL invariants: grouped ≡ ungrouped, partition identities,
  *    bounds the statistic must satisfy by construction.
  */
class PropertySpec extends SparkSpec {

  private val trials = 8

  test("property: pettitt K/t*/U equal a brute-force BigInt pair sum " +
      "on random series") {
    val s = spark
    import s.implicits._
    val rng = new Random(4242L)
    for (trial <- 1 to trials) {
      val n = 3 + rng.nextInt(14)
      val xs = Vector.fill(n)(rng.nextInt(6).toLong)
      val df = xs.zipWithIndex
        .map { case (x, i) => ("s", (i + 1).toLong, x) }
        .toDF("sid", "t", "x")
      val got = graft.data.SeriesStats.pettitt(df, Seq("sid"), "t", "x")
        .collect().head
      // brute force: U_t = sum_{i<=t, j>t} sgn(x_i - x_j), t = 1..n-1
      val us = (1 to n - 1).map { t =>
        (for (i <- 0 until t; j <- t until n)
          yield (xs(i) compare xs(j)).sign.toLong).sum
      }
      val k = us.map(math.abs).max
      val tStar = us.indexWhere(u => math.abs(u) == k) + 1
      assert(got.getAs[Long]("k_stat") === k, s"trial $trial xs=$xs")
      assert(got.getAs[Long]("t_star") === tStar.toLong,
        s"trial $trial xs=$xs")
      assert(got.getAs[Long]("u_star") === us(tStar - 1),
        s"trial $trial xs=$xs")
    }
  }

  test("property: hoeffding audit sums equal a brute-force per-point " +
      "reimplementation of the definition on random joint data") {
    val s = spark
    import s.implicits._
    val rng = new Random(1337L)
    for (trial <- 1 to trials) {
      val n = 5 + rng.nextInt(8)
      val pts = Vector.fill(n)((rng.nextInt(4).toLong, rng.nextInt(4).toLong))
      val cells = pts.groupBy(identity).toSeq
        .map { case ((x, y), g) => (x, y, g.size.toLong) }
        .toDF("x", "y", "c")
      val got = graft.data.RankTests.hoeffdingFromCells(cells)
        .collect().head
      // per-point quadrupled bivariate rank and doubled midranks
      def cmp(a: Long, b: Long) = a compare b
      val q4 = pts.map { case (xi, yi) =>
        pts.map { case (xj, yj) =>
          val (cx, cy) = (cmp(xj, xi), cmp(yj, yi))
          if (cx < 0 && cy < 0) 4L
          else if ((cx == 0 && cy < 0) || (cx < 0 && cy == 0)) 2L
          else if (cx == 0 && cy == 0) 1L
          else 0L
        }.sum - 1L // remove the self [=,=] term
      }
      def r2s(proj: Vector[Long]) = proj.map { v =>
        2L * proj.count(_ < v) + proj.count(_ == v) + 1L
      }
      val r2 = r2s(pts.map(_._1)); val s2 = r2s(pts.map(_._2))
      val d1 = pts.indices.map(i => BigInt(q4(i)) * (q4(i) - 4)).sum
      val d2 = pts.indices.map(i => BigInt(r2(i) - 2) * (r2(i) - 4) *
        (s2(i) - 2) * (s2(i) - 4)).sum
      val d3 = pts.indices.map(i => BigInt(r2(i) - 4) * (s2(i) - 4) *
        q4(i)).sum
      assert(BigInt(got.getAs[String]("d1_16")) === d1,
        s"trial $trial pts=$pts")
      assert(BigInt(got.getAs[String]("d2_16")) === d2,
        s"trial $trial pts=$pts")
      assert(BigInt(got.getAs[String]("d3_16")) === d3,
        s"trial $trial pts=$pts")
      // replay d_x1e9 from the audit sums
      val nn = BigInt(n)
      val num = ((nn - 2) * (nn - 3) * d1 + d2 - 2 * (nn - 2) * d3) * 30
      val den = 16 * nn * (nn - 1) * (nn - 2) * (nn - 3) * (nn - 4)
      val exp = (if (num >= 0) 1 else -1) * (num.abs * BigInt(10).pow(9) / den)
      assert(BigInt(got.getAs[Long]("d_x1e9")) === exp,
        s"trial $trial pts=$pts")
    }
  }

  test("property: kruskal-wallis grouped equals ungrouped per segment " +
      "and cliffs delta partition identity holds on random cells") {
    val s = spark
    import s.implicits._
    val rng = new Random(99L)
    for (trial <- 1 to trials) {
      val cells = for {
        seg <- Seq("s1", "s2")
        g <- Seq("A", "B", "C")
        v <- 1L to (2 + rng.nextInt(4)).toLong
      } yield (seg, g, v, (1 + rng.nextInt(5)).toLong)
      val df = cells.toDF("seg", "g", "v", "c")
      val grouped = graft.data.RankTests
        .kruskalWallisFromCountsGrouped(df, Seq("seg"))
        .collect().map(r => r.getAs[String]("seg") -> r).toMap
      for (seg <- Seq("s1", "s2")) {
        val solo = graft.data.RankTests.kruskalWallisFromCounts(
          df.filter(col("seg") === seg).drop("seg")).collect().head
        assert(grouped(seg).getAs[String]("b2_q9") ===
          solo.getAs[String]("b2_q9"), s"trial $trial seg=$seg")
        assert(grouped(seg).getAs[Long]("h_ppm") ===
          solo.getAs[Long]("h_ppm"), s"trial $trial seg=$seg")
      }
      val dom = (1L to 6L).map(v =>
        (v, rng.nextInt(4).toLong, rng.nextInt(4).toLong))
        .toDF("v", "ca", "cb")
      val cd = graft.data.RankTests.cliffsDeltaFromCounts(dom)
        .collect().head
      assert(cd.getAs[Boolean]("identity_ok"), s"trial $trial")
    }
  }

  test("property: systematic sample never exceeds m, pick indices are " +
      "distinct increasing, and GlobalCumsum's last value is the total") {
    val s = spark
    import s.implicits._
    val rng = new Random(7L)
    for (trial <- 1 to trials) {
      val n = 5 + rng.nextInt(20)
      val rows = (1 to n).map(i => (f"k$i%03d", (rng.nextInt(9) + 1).toLong))
      val df = rows.toDF("k", "w")
      val m = 1 + rng.nextInt(n)
      val got = graft.data.Sampling.systematicWeighted(df, "k", "w", m)
        .orderBy("cum_w").collect()
      assert(got.length <= m, s"trial $trial")
      val picks = got.map(_.getAs[Long]("pick_k"))
      assert(picks.distinct.length === picks.length, s"trial $trial")
      assert(picks.sorted.sameElements(picks), s"trial $trial")
      val cum = graft.operators.GlobalCumsum
        .withCumsum(df, "cw", "w", Seq("k"))
        .agg(max("cw")).collect().head.getLong(0)
      assert(cum === rows.map(_._2).sum, s"trial $trial")
    }
  }

  test("property: trimmed/winsorized means lie in [v_lo, v_hi] and " +
      "equidepth boundaries are the smallest values satisfying the " +
      "quantile rule") {
    val s = spark
    import s.implicits._
    val rng = new Random(5151L)
    for (trial <- 1 to trials) {
      val cells = (1L to (3 + rng.nextInt(6)).toLong)
        .map(v => ("g", v * (if (rng.nextBoolean()) 1 else -1),
          (1 + rng.nextInt(5)).toLong))
        .groupBy(_._2).map { case (v, g) => ("g", v, g.map(_._3).sum) }
        .toSeq.toDF("k", "v", "c")
      val tm = graft.data.RankStats
        .trimmedMeansFromCounts(cells, Seq("k"), 150).collect().head
      val lo = tm.getAs[Long]("v_lo") * 1000000L
      val hi = tm.getAs[Long]("v_hi") * 1000000L
      val t = tm.getAs[Long]("trimmed_mean_x1e6")
      val w = tm.getAs[Long]("winsor_mean_x1e6")
      assert(t >= lo - 1 && t <= hi, s"trial $trial")
      assert(w >= lo - 1 && w <= hi, s"trial $trial")
      // equidepth: replay the rule per emitted boundary
      val raw = cells.collect().map(r => r.getLong(1) -> r.getLong(2))
        .sortBy(_._1)
      val n = raw.map(_._2).sum
      val b = 2 + rng.nextInt(6)
      val bounds = graft.data.RankStats
        .equidepthBoundaries(cells, Seq("k"), b).collect()
        .map(r => r.getAs[Long]("bucket") -> r.getAs[Long]("boundary"))
      assert(bounds.length === b - 1, s"trial $trial")
      for ((bk, bv) <- bounds) {
        def cumUpTo(v: Long) = raw.takeWhile(_._1 <= v).map(_._2).sum
        assert(cumUpTo(bv) * b >= bk * n, s"trial $trial b=$bk")
        val prev = raw.map(_._1).filter(_ < bv)
        if (prev.nonEmpty)
          assert(cumUpTo(prev.max) * b < bk * n, s"trial $trial b=$bk")
      }
    }
  }

  test("property: grouped cuped equals ungrouped per segment on random " +
      "unit frames") {
    val s = spark
    import s.implicits._
    val rng = new Random(31337L)
    for (trial <- 1 to trials) {
      val rows = for {
        seg <- Seq("a", "b")
        i <- 1 to 4 + rng.nextInt(6)
      } yield (seg, rng.nextBoolean(), rng.nextInt(100).toLong,
        rng.nextInt(100).toLong)
      val df = rows.toDF("seg", "treat", "x", "y")
      val grouped = graft.ml.Cuped
        .estimateGrouped(df, Seq("seg"), "treat", "x", "y")
        .collect().map(r => r.getAs[String]("seg") -> r).toMap
      for (seg <- Seq("a", "b")) {
        val solo = graft.ml.Cuped.estimate(
          df.filter(col("seg") === seg).drop("seg"), "treat", "x", "y")
          .collect().head
        for (c <- Seq("theta_q9", "diff_x1e6", "adj_x1e6")) {
          val a = if (grouped(seg).isNullAt(grouped(seg).fieldIndex(c)))
            None else Some(grouped(seg).getAs[Long](c))
          val b = if (solo.isNullAt(solo.fieldIndex(c))) None
            else Some(solo.getAs[Long](c))
          assert(a === b, s"trial $trial seg=$seg col=$c")
        }
      }
    }
  }
}
