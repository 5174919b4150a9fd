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

  // ---- round-14 brute-force mini-oracles --------------------------------

  /** Doubled pooled midranks of `v` within `all`. */
  private def r2of(all: Seq[Long])(v: Long): Long =
    2L * all.count(_ < v) + all.count(_ == v) + 1L

  private def toCells(a: Seq[Long], b: Seq[Long]) = {
    val s = spark
    import s.implicits._
    (a.map((_, 1L, 0L)) ++ b.map((_, 0L, 1L)))
      .groupBy(_._1).toSeq
      .map { case (v, g) => (v, g.map(_._2).sum, g.map(_._3).sum) }
      .toDF("v", "ca", "cb")
  }

  test("property: brunner-munzel p/W^2 equal a brute-force BigInt " +
      "placement reimplementation on random two-sample data") {
    val rng = new Random(98765L)
    for (trial <- 1 to trials) {
      val na = 3 + rng.nextInt(8); val nb = 3 + rng.nextInt(8)
      val a = Vector.fill(na)(rng.nextInt(5).toLong)
      val b = Vector.fill(nb)(rng.nextInt(5).toLong)
      val got = graft.data.RankTests.brunnerMunzelFromCounts(toCells(a, b))
        .collect().head
      val pooled = a ++ b
      val r2p = r2of(pooled) _
      val sb2 = BigInt(b.map(r2p).sum)
      val pq6 = (sb2 - BigInt(nb) * (nb + 1)) * 1000000 /
        (BigInt(2) * na * nb)
      assert(BigInt(got.getAs[Long]("p_q6")) === pq6, s"trial $trial")
      // doubled placements per observation
      val p2a = a.map(v => r2p(v) - r2of(a)(v))
      val p2b = b.map(v => r2p(v) - r2of(b)(v))
      def aTerm(ps: Seq[Long], n: Int) =
        BigInt(n) * ps.map(p => BigInt(p) * p).sum -
          BigInt(ps.sum) * ps.sum
      val aa = aTerm(p2a, na); val ab = aTerm(p2b, nb)
      val d = BigInt(na) * b.map(r2p).sum - BigInt(nb) * a.map(r2p).sum
      val den = BigInt(na + nb) *
        (aa * nb * nb * (nb - 1) + ab * na * na * (na - 1))
      if (den > 0) {
        val w2 = d * d * (na - 1) * (nb - 1) * 1000000 / den
        assert(BigInt(got.getAs[Long]("w2_ppm")) === w2,
          s"trial $trial a=$a b=$b")
      } else assert(got.isNullAt(got.fieldIndex("w2_ppm")), s"trial $trial")
    }
  }

  test("property: cvm T equals a brute-force per-observation " +
      "reimplementation of Anderson's statistic on random data") {
    val rng = new Random(24680L)
    for (trial <- 1 to trials) {
      val na = 2 + rng.nextInt(8); val nb = 2 + rng.nextInt(8)
      val a = Vector.fill(na)(rng.nextInt(5).toLong)
      val b = Vector.fill(nb)(rng.nextInt(5).toLong)
      val got = graft.data.RankTests.cvmFromCounts(toCells(a, b))
        .collect().head
      val pooled = a ++ b
      val r2p = r2of(pooled) _
      // per observation, own-sample positions 1..n over the SORTED sample
      def s3(xs: Vector[Long]): BigInt = {
        val sorted = xs.sorted
        BigInt(3) * sorted.zipWithIndex.map { case (v, i0) =>
          val m = BigInt(r2p(v)) - 2L * (i0 + 1)
          m * m
        }.sum
      }
      val num = BigInt(na) * s3(a) + BigInt(nb) * s3(b) -
        BigInt(2) * na * nb * (BigInt(4) * na * nb - 1)
      val den = BigInt(12) * na * nb * (na + nb)
      val want = num.sign * ((num.abs * 1000000) / den)
      assert(BigInt(got.getAs[Long]("t_x1e6")) === want,
        s"trial $trial a=$a b=$b")
    }
  }

  test("property: hodges-lehmann lower/upper medians equal the sorted " +
      "brute-force cross-difference list") {
    val rng = new Random(112358L)
    for (trial <- 1 to trials) {
      val na = 1 + rng.nextInt(7); val nb = 1 + rng.nextInt(7)
      val a = Vector.fill(na)(rng.nextInt(9).toLong)
      val b = Vector.fill(nb)(rng.nextInt(9).toLong)
      val got = graft.data.RankTests.hodgesLehmannFromCounts(toCells(a, b))
        .collect().head
      val diffs = (for (x <- a; y <- b) yield y - x).sorted
      val m = diffs.length
      val lo = diffs((m + 1) / 2 - 1)
      val up = diffs(m / 2)
      assert(got.getAs[Long]("m_pairs") === m.toLong, s"trial $trial")
      assert(got.getAs[Long]("d_lo") === lo, s"trial $trial a=$a b=$b")
      assert(got.getAs[Long]("d_up") === up, s"trial $trial a=$a b=$b")
    }
  }

  test("property: signed-rank W2+/z^2 equal a brute-force midrank " +
      "reimplementation on random paired differences") {
    val s = spark
    import s.implicits._
    val rng = new Random(777L)
    for (trial <- 1 to trials) {
      val n = 4 + rng.nextInt(10)
      val ds = Vector.fill(n)((rng.nextInt(9) - 4).toLong)
      val cells = ds.groupBy(identity).toSeq
        .map { case (d, g) => (d, g.size.toLong) }.toDF("d", "c")
      val got = graft.data.RankTests.signedRankFromCounts(cells)
        .collect().head
      val nz = ds.filter(_ != 0L)
      val ads = nz.map(math.abs)
      val r2p = r2of(ads) _
      val w2p = BigInt(nz.filter(_ > 0).map(d => r2p(math.abs(d))).sum)
      val nn = nz.length
      if (nn == 0) assert(got.getAs[Long]("n_nonzero") === 0L)
      else {
        assert(got.getAs[Long]("w2_plus") === w2p.toLong, s"trial $trial")
        val e2 = BigInt(nn) * (nn + 1) / 2
        val tie3 = ads.distinct.map { v =>
          val t = BigInt(ads.count(_ == v)); t * t * t - t
        }.sum
        val den = BigInt(2) * nn * (nn + 1) * (2 * nn + 1) - tie3
        if (den > 0) {
          val z2 = (w2p - e2) * (w2p - e2) * 12 * 1000000 / den
          assert(BigInt(got.getAs[Long]("z2_ppm")) === z2,
            s"trial $trial ds=$ds")
        }
      }
    }
  }

  test("property: wasserstein and energy distance equal brute-force " +
      "pairwise reimplementations, and W1 >= 0 = iff identical") {
    val rng = new Random(31415L)
    for (trial <- 1 to trials) {
      val na = 2 + rng.nextInt(8); val nb = 2 + rng.nextInt(8)
      val a = Vector.fill(na)(rng.nextInt(12).toLong)
      val b = Vector.fill(nb)(rng.nextInt(12).toLong)
      val cells = toCells(a, b)
      val w = graft.data.RankStats.wassersteinFromCounts(cells)
        .collect().head
      // brute: integrate |F_a - F_b| over the union domain
      val dom = (a ++ b).distinct.sorted
      val wNum = dom.zip(dom.drop(1)).map { case (v, nxt) =>
        val ca = BigInt(a.count(_ <= v)) * nb
        val cb = BigInt(b.count(_ <= v)) * na
        (ca - cb).abs * (nxt - v)
      }.sum
      val wWant = wNum * 1000000 / (BigInt(na) * nb)
      assert(BigInt(w.getAs[Long]("w1_x1e6")) === wWant,
        s"trial $trial a=$a b=$b")
      val e = graft.data.RankStats.energyDistanceFromCounts(cells)
        .collect().head
      def pd(xs: Seq[Long], ys: Seq[Long]) =
        (for (x <- xs; y <- ys) yield BigInt((x - y).abs)).sum
      val num = BigInt(2) * pd(a, b) * na * nb -
        pd(a, a) * nb * nb - pd(b, b) * na * na
      val eWant = num * 1000000 / (BigInt(na) * na * nb * nb)
      assert(BigInt(e.getAs[Long]("e2_x1e6")) === eWant,
        s"trial $trial a=$a b=$b")
    }
  }

  test("property: conover z^2 equals a brute-force cross-multiplied " +
      "deviation-rank reimplementation on random data") {
    val rng = new Random(2718L)
    for (trial <- 1 to trials) {
      val na = 3 + rng.nextInt(7); val nb = 3 + rng.nextInt(7)
      val a = Vector.fill(na)(rng.nextInt(7).toLong)
      val b = Vector.fill(nb)(rng.nextInt(7).toLong)
      val got = graft.data.RankTests.conoverScaleFromCounts(toCells(a, b))
        .collect().head
      val sa = a.sum; val sb = b.sum
      // common-scale deviations |v*n_g - S_g| * n_other as BigInt
      val wa = a.map(v => BigInt((v * na - sa).abs) * nb)
      val wb = b.map(v => BigInt((v * nb - sb).abs) * na)
      val pooledW = wa ++ wb
      def r2w(w: BigInt): Long =
        2L * pooledW.count(_ < w) + pooledW.count(_ == w) + 1L
      val t4 = wa.map(w => BigInt(r2w(w)) * r2w(w)).sum
      val sa4 = pooledW.map(w => BigInt(r2w(w)) * r2w(w)).sum
      val sa8 = pooledW.map { w =>
        val r = BigInt(r2w(w)); r * r * r * r
      }.sum
      val n = na + nb
      val num = BigInt(n) * t4 - BigInt(na) * sa4
      val den = BigInt(na) * nb * (BigInt(n) * sa8 - sa4 * sa4)
      if (den > 0) {
        val z2 = num * num * (n - 1) * 1000000 / den
        assert(BigInt(got.getAs[Long]("z2_ppm")) === z2,
          s"trial $trial a=$a b=$b")
      } else assert(got.isNullAt(got.fieldIndex("z2_ppm")), s"trial $trial")
    }
  }

  test("property: dixonQ and quartileShape grouped runs equal per-group " +
      "solo runs") {
    val s = spark
    import s.implicits._
    val rng = new Random(1618L)
    for (trial <- 1 to trials) {
      val segs = Seq("x", "y", "z")
      val data = segs.flatMap { g =>
        Vector.fill(3 + rng.nextInt(9))((g, rng.nextInt(20).toLong))
      }
      val cells = data.groupBy(identity).toSeq
        .map { case ((g, v), rows) => (g, v, rows.size.toLong) }
        .toDF("g", "v", "c")
      val dAll = graft.data.RankStats.dixonQFromCounts(cells, Seq("g"))
        .collect().map(r => r.getAs[String]("g") -> r).toMap
      val qAll = graft.data.RankStats
        .quartileShapeFromCounts(cells, Seq("g"))
        .collect().map(r => r.getAs[String]("g") -> r).toMap
      for (g <- segs) {
        val solo = cells.filter(col("g") === g)
        val d1 = graft.data.RankStats.dixonQFromCounts(solo, Seq("g"))
          .collect().head
        val q1 = graft.data.RankStats
          .quartileShapeFromCounts(solo, Seq("g")).collect().head
        for (c <- Seq("n", "v_min", "v_max", "q_lo_ppm", "q_hi_ppm")) {
          val x = dAll(g);
          assert(x.isNullAt(x.fieldIndex(c)) === d1.isNullAt(d1.fieldIndex(c)))
          if (!d1.isNullAt(d1.fieldIndex(c)))
            assert(x.getAs[Long](c) === d1.getAs[Long](c),
              s"trial $trial g=$g dixon $c")
        }
        for (c <- Seq("n", "q1", "q2", "q3", "bowley_skew_ppm", "qcd_ppm")) {
          val x = qAll(g)
          assert(x.isNullAt(x.fieldIndex(c)) === q1.isNullAt(q1.fieldIndex(c)))
          if (!q1.isNullAt(q1.fieldIndex(c)))
            assert(x.getAs[Long](c) === q1.getAs[Long](c),
              s"trial $trial g=$g quartile $c")
        }
      }
    }
  }
}
