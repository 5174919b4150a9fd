package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{GlobalRank, TopN}

/** Core relational operators from SURVEY.md §2 (joins, aggregations, windows,
  * set ops), each as a (SparkSession, sfDir) => DataFrame with a DuckDB oracle.
  *
  * Oracle-parity rules used throughout:
  *  - float aggregates go through DECIMAL casts (exact, order-independent),
  *    final cast back to double;
  *  - row-level double arithmetic is fine (identical IEEE ops both engines);
  *  - avoid round() on doubles (engines differ on ties);
  *  - every computed column is aliased identically in Spark and SQL;
  *  - window orderings are total (explicit key tiebreaks).
  */
object CoreQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    graft.sources.Tables(s, dir, name)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A1-style hash aggregation with decimal-exact sums (lineitem pricing summary)
    "q01_agg_pricing" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity")).cast("double").as("sum_qty"),
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast("decimal(38,6)")).cast("double").as("revenue"),
          count(lit(1)).cast("long").as("n_rows"))
    },

    // J4-style inner equi-join enriching facts with dimension info
    "q02_join_gt_info" -> { (s, dir) =>
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .select(o("o_orderkey"), o("o_totalprice"), c("c_name"), c("c_mktsegment"))
    },

    // J5-style left-outer join preserving no-match rows
    "q03_left_join_nomatch" -> { (s, dir) =>
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
        .select(c("c_custkey"), c("c_name"), o("o_orderkey"))
    },

    // left-semi join (EXISTS)
    "q04_semi_join" -> { (s, dir) =>
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").filter(col("o_totalprice") > 100000.0)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
    },

    // J9-style left-anti join (NOT EXISTS)
    "q05_anti_join" -> { (s, dir) =>
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").filter(col("o_totalprice") > 150000.0)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    },

    // J8 cross join (naive indexer analog; both sides tiny dims)
    "q06_cross_join" -> { (s, dir) =>
      t(s, dir, "region").crossJoin(t(s, dir, "nation"))
        .select("r_name", "n_name")
    },

    // U1+A1: unionByName(allowMissing) of two candidate sets + dedup-merge by max
    "q07_union_merge_max" -> { (s, dir) =>
      val o = t(s, dir, "orders")
      val c1 = o.filter(col("o_orderstatus") === "O")
        .select(col("o_custkey").as("uid"), col("o_orderkey").as("gt_uid"),
                col("o_totalprice").as("score_0"))
      val c2 = o.filter(col("o_totalprice") > 50000.0)
        .select(col("o_custkey").as("uid"), col("o_orderkey").as("gt_uid"),
                (col("o_totalprice") * 0.5).as("score_1"))
      c1.unionByName(c2, allowMissingColumns = true)
        .groupBy("uid", "gt_uid")
        .agg(max(col("score_0")).as("score_0"), max(col("score_1")).as("score_1"))
    },

    // W1: best-match ranking window (row_number desc + tiebreak)
    "q08_best_match_window" -> { (s, dir) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").desc)
      t(s, dir, "orders")
        .withColumn("best_rank", row_number().over(w))
        .withColumn("best_match", col("best_rank") === 1 && col("o_totalprice") > 0.0)
        .select("o_custkey", "o_orderkey", "best_rank", "best_match")
    },

    // W2: top-n per group with deterministic ordering
    "q09_topn_per_group" -> { (s, dir) =>
      val w = Window.partitionBy("l_suppkey")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      t(s, dir, "lineitem")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice", "rn")
    },

    // W4/W5: rank + distance-to-extremes + lag/lead diff features per group
    "q10_rank_diff_features" -> { (s, dir) =>
      val grp  = Window.partitionBy("l_orderkey")
      val ord  = grp.orderBy(col("l_extendedprice").desc, col("l_linenumber"))
      t(s, dir, "lineitem")
        .withColumn("score_rank", row_number().over(ord))
        .withColumn("dist_to_max", max(col("l_extendedprice")).over(grp) - col("l_extendedprice"))
        .withColumn("dist_to_min", col("l_extendedprice") - min(col("l_extendedprice")).over(grp))
        .withColumn("ptp", max(col("l_extendedprice")).over(grp) - min(col("l_extendedprice")).over(grp))
        .withColumn("diff_to_next", col("l_extendedprice") - lead("l_extendedprice", 1).over(ord))
        .withColumn("diff_to_prev", lag("l_extendedprice", 1).over(ord) - col("l_extendedprice"))
        .select("l_orderkey", "l_linenumber", "l_extendedprice", "score_rank",
                "dist_to_max", "dist_to_min", "ptp", "diff_to_next", "diff_to_prev")
    },

    // J3/O1: sorted-neighbourhood indexing — distributed global rank
    // (sort + zipWithIndex, not a single-partition window) + band self-join
    // unrolled into 2w equi-joins like the reference
    "q11_sni_pairs" -> { (s, dir) =>
      val w = 3
      val ranked = GlobalRank.withGlobalRank(
        t(s, dir, "part").select("p_partkey", "p_name"),
        "r", Seq("p_name", "p_partkey")).select("p_partkey", "p_name", "r")
      val left  = ranked.select(col("p_partkey").as("uid"), col("r"))
      val right = ranked.select(col("p_partkey").as("gt_uid"), col("r").as("gt_r"))
      val shifted = (-w to w).filter(_ != 0).map { off =>
        left.join(right, left("r") + off === right("gt_r"))
          .select(col("uid"), col("gt_uid"),
                  (lit(1.0) - lit(math.abs(off).toDouble) / (w + 1.0)).as("sni_score"))
      }
      shifted.reduce(_ union _)
    },

    // A5: account aggregation (max_frequency_nm_score semantics):
    // freq-weighted mean score per (account, gt), then argmax row per account
    "q12_account_agg" -> { (s, dir) =>
      val scores = t(s, dir, "lineitem").select(
        col("l_orderkey").as("account"), col("l_suppkey").as("gt_uid"),
        col("l_quantity").as("freq"), col("l_extendedprice").as("score"))
      val grouped = scores.groupBy("account", "gt_uid").agg(
        (sum((col("freq") * col("score")).cast("decimal(38,6)")).cast("double") /
         sum(col("freq").cast("decimal(38,6)")).cast("double")).as("agg_score"))
      val w = Window.partitionBy("account").orderBy(col("agg_score").desc, col("gt_uid"))
      grouped.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select("account", "gt_uid", "agg_score")
    },

    // A9/S5: duplicate-uid check
    "q13_dup_uid_check" -> { (s, dir) =>
      t(s, dir, "events").groupBy("user_id")
        .agg(count(lit(1)).cast("long").as("n"))
        .filter(col("n") > 1)
    },

    // streaming-analog batch: event-time hourly tumbling window aggregation
    "q14_events_hourly" -> { (s, dir) =>
      t(s, dir, "events")
        .groupBy(unix_timestamp(date_trunc("hour", col("ts"))).as("hour_epoch"),
                 col("event_type"))
        .agg(count(lit(1)).cast("long").as("n"),
             sum(col("value").cast("decimal(38,6)")).cast("double").as("total_value"))
    },

    // backward-inclusive AS-OF join (union + one keyed window, no range
    // join): every event carries the most recent prior-or-equal "big event"
    // (value >= 200) of its type. Oracle: DuckDB's NATIVE ASOF LEFT JOIN —
    // an independent implementation of the whole operator semantics
    "q83_asof_join" -> { (s, dir) =>
      val ev = t(s, dir, "events").select(
        col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"), col("value"))
      val big = ev.groupBy("event_type", "ts_us")
        .agg(max(col("value")).as("big_value"))
        .filter(col("big_value") >= 200.0)
        .withColumn("big_ts_us", col("ts_us"))
      graft.operators.AsofJoin.backward(ev, big, Seq("event_type"),
        "ts_us", "ts_us", Seq("big_ts_us", "big_value"))
    },

    // gap-based sessionization (30-min inactivity closes a session): lag ->
    // new-session flag -> running sum, all inside ONE shuffle+sort on
    // user_id (both windows share the partitioning/ordering, so Catalyst
    // plans a single exchange and sort), then a per-session hash agg
    "q84_sessionize" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val ev = t(s, dir, "events").select(
        col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"))
      val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      val gap = col("ts_us") - lag(col("ts_us"), 1).over(w)
      val newSession = when(gap.isNull || gap > 1800L * 1000000L, 1).otherwise(0)
      ev.withColumn("session_idx",
          sum(newSession).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("long"))
        .groupBy("user_id", "session_idx")
        .agg(count(lit(1)).cast("long").as("n_events"),
             min(col("ts_us")).as("start_us"),
             max(col("ts_us")).as("end_us"))
    },

    // the forward variant: every event carries the NEXT big event of its
    // type at-or-after its timestamp; DuckDB ASOF with <= is the oracle
    "q86_asof_forward" -> { (s, dir) =>
      val ev = t(s, dir, "events").select(
        col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"), col("value"))
      val big = ev.groupBy("event_type", "ts_us")
        .agg(max(col("value")).as("big_value"))
        .filter(col("big_value") >= 200.0)
        .withColumn("big_ts_us", col("ts_us"))
      graft.operators.AsofJoin.forward(ev, big, Seq("event_type"),
        "ts_us", "ts_us", Seq("big_ts_us", "big_value"))
    },

    // rolling event-time window features ("events/value in the preceding
    // hour, per user") — the feature-engineering primitive for fraud/abuse
    // signals over a 100 TB event log. RANGE frame keyed on the event time:
    // one shuffle on user_id + one sort, the same plan budget as q84's
    // sessionization; the frame is computed incrementally per partition,
    // never a per-row rescan. DECIMAL sum keeps the rolling total exact and
    // order-independent
    "q92_rolling_window" -> { (s, dir) =>
      val ev = t(s, dir, "events").select(
        col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"), col("value"))
      val w = Window.partitionBy("user_id").orderBy(col("ts_us"))
        .rangeBetween(-3600L * 1000000L, 0L)
      ev.withColumn("n_prev_hour", count(lit(1)).over(w).cast("long"))
        .withColumn("sum_prev_hour",
          sum(col("value").cast("decimal(38,6)")).over(w).cast("double"))
    },

    // multi-granularity corpus report in ONE pass: ROLLUP(lang, source)
    // computes per-(lang, source), per-lang and grand totals in a single
    // partial-aggregated shuffle (Expand + one hash agg — no N-pass union).
    // Subtotal rows are labeled '<all>' via grouping() — NOT a bare
    // coalesce, which would conflate a subtotal with a genuine NULL data
    // stratum (those render '<null>')
    // APPROX-PERCENTILE ACCURACY GATE — the 100 TB escape hatch
    // (percentile_approx) made oracle-visible: Spark's GK-style sketch
    // promises an answer whose RANK is within n/accuracy of the target,
    // so the gate computes the approx median in-query, measures its exact
    // rank window [count(<ap), count(≤ap)] relationally, and emits the
    // integer cross-multiplied verdict r_lt·1000 ≤ 501·n ∧ r_le·1000 ≥
    // 499·n — the sketch VALUE never appears in the output (it is
    // engine-specific; its GUARANTEE is not). Beside it, the exact
    // rank-⌈n/2⌉ order statistic from the collapsed value domain — the
    // pair a drift dashboard shows. Binned-domain sibling for
    // row-sized domains: q251's HistStore path
    "q300_approx_percentile_gate" -> { (s, dir) =>
      val acc = 1000
      val ev = t(s, dir, "events").filter(col("value").isNotNull)
        .select(expr("CAST(floor(value * 1000000) AS BIGINT)").as("v"))
      val ap = ev.agg(
        percentile_approx(col("v"), lit(0.5), lit(acc)).as("ap"),
        count(lit(1)).cast("long").as("n"))
      val dom = ev.groupBy("v").agg(count(lit(1)).cast("long").as("c"))
      val w = Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val med = dom.withColumn("cum", sum("c").over(w).cast("long"))
        .crossJoin(broadcast(ap.select(col("n").as("__n"))))
        .filter(col("cum") * 2 >= col("__n"))
        .agg(min("v").cast("long").as("p50_exact_micro"))
      val ranks = ev.crossJoin(broadcast(ap))
        .agg(sum(when(col("v") < col("ap"), 1L).otherwise(0L)).cast("long")
            .as("r_lt"),
          sum(when(col("v") <= col("ap"), 1L).otherwise(0L)).cast("long")
            .as("r_le"),
          max("n").cast("long").as("n"))
      ranks.crossJoin(broadcast(med))
        .select(col("n"), col("p50_exact_micro"),
          (col("r_lt") * 1000L <= col("n") * 501L &&
           col("r_le") * 1000L >= col("n") * 499L).as("rank_ok"))
    },

    // LOCAL CLUSTERING COEFFICIENT — q138's oriented triangle kernel made
    // per-vertex: each triangle (s, b, c) is materialized ONCE (degree-id
    // orientation, O(√m) fan-out bound) and credits its three corners via
    // one explode — per-vertex credit costs 3 rows/triangle, never a wedge
    // re-enumeration. Coefficient = 2·tri/(d·(d−1)) as exact integer ppm.
    // Node-sized output; the community-structure signal per entity that
    // q138's single global count cannot localize
    "q288_local_clustering" -> { (s, dir) =>
      val edges = graft.operators.Graphs.coPurchaseEdges(t(s, dir, "lineitem"))
      graft.operators.Triangles.perVertex(edges, "src", "dst")
    },

    // JOIN-KEY SKEW AUDIT — the pre-join report that decides salting/AQE
    // knobs BEFORE the shuffle: Gini concentration of rows-per-key plus
    // the hottest key's share, all exact integer ppm. The sorted-rank sum
    // Σ i·xᵢ is computed on the COLLAPSED frequency-of-frequency domain
    // (a block of m keys sharing count c contributes c·(m·prevN +
    // m(m+1)/2)) — the rank-stat trick again, so the ordered pass runs
    // over |distinct counts| rows, never |keys|, at any scale
    "q289_key_skew_gini" -> { (s, dir) =>
      graft.data.Profile.keySkewGini(t(s, dir, "events"), "user_id")
    },

    // DIFFERENCE-IN-DIFFERENCES — the quasi-experimental estimator for
    // rollouts without randomization: (treated post − treated pre) −
    // (control post − control pre) cancels both the group level and the
    // common time trend. Arms by q283's md5 user hash, periods by the same
    // date cut; all sums exact DECIMAL micro-units, the four cell means and
    // the DID contrast are exact-then-cast doubles with an identical op
    // sequence on both engines
    "q290_diff_in_diff" -> { (s, dir) =>
      val d38 = "decimal(38,0)"
      val cut = lit("2024-01-15").cast("date")
      val cells = t(s, dir, "events").filter(col("value").isNotNull)
        .select(col("user_id"), to_date(col("ts")).as("day"),
          expr("CAST(floor(value * 1000000) AS BIGINT)").as("v"))
        .withColumn("arm", expr(
          """CAST(conv(substring(md5(CAST(concat('arm|',
             CAST(user_id AS STRING)) AS BINARY)), 1, 12), 16, 10)
             AS BIGINT) % 2"""))
        .withColumn("post", when(col("day") > cut, 1L).otherwise(0L))
        .groupBy("arm", "post")
        .agg(count(lit(1)).cast("long").as("n_events"),
          sum(col("v").cast(d38)).cast(d38).as("sv"))
        .withColumn("mean_u",
          col("sv").cast("double") / col("n_events").cast("double"))
      cells.agg(
        sum("n_events").cast("long").as("n_events"),
        max(when(col("arm") === 0L && col("post") === 0L, col("mean_u")))
          .as("ctl_pre_u"),
        max(when(col("arm") === 0L && col("post") === 1L, col("mean_u")))
          .as("ctl_post_u"),
        max(when(col("arm") === 1L && col("post") === 0L, col("mean_u")))
          .as("trt_pre_u"),
        max(when(col("arm") === 1L && col("post") === 1L, col("mean_u")))
          .as("trt_post_u"))
        .withColumn("did_u",
          (col("trt_post_u") - col("trt_pre_u")) -
          (col("ctl_post_u") - col("ctl_pre_u")))
    },

    // CMS JOIN-SIZE ESTIMATE — q166's join pre-flight without touching the
    // join: |A ⋈ B| = Σₖ cA(k)·cB(k) estimated by the CMS inner product
    // (min over hash rows of the bucket-count dot product; Cormode &
    // Muthukrishnan 2005). Each side is read ONCE into a 4×256 integer
    // table; the estimate NEVER underestimates (collision cross-terms are
    // non-negative). The exact join count here is the oracle-visible gate —
    // at 100 TB you run ONLY the sketch, which is the point
    "q293_join_size_cms" -> { (s, dir) =>
      val o = t(s, dir, "orders").select(col("o_orderkey").as("k"))
      val l = t(s, dir, "lineitem").select(col("l_orderkey").as("k"))
      val est = graft.data.CmsStore.joinSizeEstimate(
        graft.data.CmsStore.countersFor(o, "k"),
        graft.data.CmsStore.countersFor(l, "k"))
      val exact = o.join(l, "k")
        .agg(count(lit(1)).cast("long").as("exact_rows"))
      est.crossJoin(exact) // 1×1
        .select(col("exact_rows"), col("est_rows"),
          (col("est_rows") >= col("exact_rows")).as("bound_ok"),
          expr("""CAST((CAST(est_rows AS DECIMAL(38,0)) - exact_rows)
                  * 1000000 div exact_rows AS BIGINT)""").as("overshoot_ppm"))
    },

    // ISOTONIC CALIBRATION (pool-adjacent-violators) — the monotone score→
    // probability map q259's reliability diagram motivates: the PAV fit at
    // bin i equals max_{j≤i} min_{k≥i} avg(y over bins j..k) (the minimax
    // characterization — Barlow et al. 1972), which needs NO iterative
    // pooling loop: prefix sums over the bin domain give every interval
    // average, a per-j suffix-min window gives the inner min, one grouped
    // max gives the fit. Everything past the first aggregation runs on the
    // COLLAPSED bin domain (≤ 50 rows at any corpus size) — the interval
    // square is bins², never rows². Interval averages are exact-integer
    // ratios cast to double with an identical op sequence on both engines
    "q294_isotonic_calibration" -> { (s, dir) =>
      val bins = t(s, dir, "events").filter(col("value").isNotNull)
        .select(expr("CAST(floor(value / 10) AS BIGINT)").as("b"),
          when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
        .groupBy("b")
        .agg(count(lit(1)).cast("long").as("n"),
          sum("y").cast("long").as("n_pos"))
      graft.data.Calibration.pavFit(bins)
    },

    // SEGMENT-WISE ISOTONIC CALIBRATION — q294's PAV fit per cohort in ONE
    // plan (per-language / per-surface calibration is the production
    // shape: a global monotone map miscalibrates every segment whose base
    // rate differs): all windows and the interval join partition by the
    // segment, so segments scale parallelism and each pays only its own
    // bins² square
    "q301_isotonic_by_segment" -> { (s, dir) =>
      val bins = t(s, dir, "events").filter(col("value").isNotNull)
        .select((col("user_id") % 3).cast("long").as("cohort"),
          expr("CAST(floor(value / 10) AS BIGINT)").as("b"),
          when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
        .groupBy("cohort", "b")
        .agg(count(lit(1)).cast("long").as("n"),
          sum("y").cast("long").as("n_pos"))
      graft.data.Calibration.pavFitGrouped(bins, Seq("cohort"))
    },

    // RATIO-METRIC CI BY THE DELTA METHOD — the closed-form the bootstrap
    // (q244) approximates: for R = Σx/Σy over per-user totals (revenue per
    // event — the archetypal ratio metric where per-user events are the
    // denominator), Var(R) ≈ (s_xx − 2R·s_xy + R²·s_yy) / (n·ȳ²) with
    // centered second moments. ALL moments are exact DECIMAL integers in
    // micro-units; R, se and the ±1.96 CI are exact-then-cast doubles with
    // one fixed op sequence — a statistic a 100 TB pipeline computes in ONE
    // aggregation, no resampling passes
    "q303_ratio_delta_ci" -> { (s, dir) =>
      val d38 = "decimal(38,0)"
      val per = t(s, dir, "events")
        .groupBy("user_id")
        .agg(sum(when(col("event_type") === "purchase" &&
              col("value").isNotNull,
            expr("CAST(floor(value * 1000000) AS BIGINT)")).otherwise(0L))
            .cast("long").as("x"),
          count(lit(1)).cast("long").as("y"))
      val mom = per.agg(count(lit(1)).cast("long").as("n"),
        sum(col("x").cast(d38)).cast(d38).as("sx"),
        sum(col("y").cast(d38)).cast(d38).as("sy"),
        sum(col("x").cast(d38) * col("x")).cast(d38).as("sxx"),
        sum(col("x").cast(d38) * col("y")).cast(d38).as("sxy"),
        sum(col("y").cast(d38) * col("y")).cast(d38).as("syy"))
      // centered moments via n·Σab − Σa·Σb (q283's integer identity)
      val r = col("sx").cast("double") / col("sy").cast("double")
      val cxx = (col("n").cast(d38) * col("sxx") -
        col("sx").cast(d38) * col("sx")).cast("double")
      val cxy = (col("n").cast(d38) * col("sxy") -
        col("sx").cast(d38) * col("sy")).cast("double")
      val cyy = (col("n").cast(d38) * col("syy") -
        col("sy").cast(d38) * col("sy")).cast("double")
      val nD = col("n").cast("double")
      val meanY = col("sy").cast("double") / nD
      // Var(R) = (cxx − 2R·cxy + R²·cyy) / (n²(n−1)) / ȳ² ; se = √Var
      val se = sqrt(
        ((cxx - lit(2.0) * r * cxy + r * r * cyy) /
          (nD * nD * (nD - lit(1.0)))) / (meanY * meanY))
      mom.select(col("n").as("n_users"), r.as("ratio_u"),
        se.as("se_u"),
        (r - lit(1.96) * se).as("ci_lo_u"),
        (r + lit(1.96) * se).as("ci_hi_u"))
    },

    // KAPLAN–MEIER SURVIVAL CURVES — grouped product-limit estimation over
    // per-user observation spans: duration = days between a user's first
    // and last event, "event" = the user converted (purchased), otherwise
    // right-censored at last sight. Subjects collapse to the per-cohort
    // event-time domain in one hash agg; every ordered pass partitions by
    // cohort (Survival.scala's scale contract). Hashed surface = the
    // exact integer columns (counts + q9 hazard increments + Nelson–Aalen
    // running sum); the libm-double KM product is BANDED against the
    // exact cumulative hazard with the Weierstrass bounds the kernel
    // documents (1 − H ≤ Π(1−hᵢ) ≤ exp(−H)) instead of being hashed
    "q305_kaplan_meier" -> { (s, dir) =>
      val subj = t(s, dir, "events")
        .groupBy("user_id")
        .agg(expr("""CAST((unix_micros(max(ts)) - unix_micros(min(ts)))
                     div 3600000000 AS BIGINT)""").as("dur_hours"),
          max(when(col("event_type") === "purchase", 1).otherwise(0))
            .cast("int").as("converted"))
        .withColumn("cohort", (col("user_id") % 3).cast("long"))
      val km = graft.data.Survival.kaplanMeier(subj, Seq("cohort"),
        "dur_hours", "converted")
      // H is floor-truncated q9 (≤ true H by < steps·1e-9): 1e-6 slack on
      // the lower bound covers any calendar-bounded step count
      val h = col("cum_haz_q9").cast("double") / lit(1e9)
      km.select(col("cohort"), col("t"), col("n_risk"), col("d_events"),
        col("n_censored"), col("haz_q9"), col("cum_haz_q9"),
        (col("survival") >= lit(1.0) - h - lit(1e-6) &&
          col("survival") <= exp(-h) + lit(1e-9)).as("surv_ok"))
    },

    // JACKKNIFE RATIO CI — the third leg of the ratio-metric inference
    // triangle (q244 bootstrap, q303 delta method, THIS delete-one-group
    // jackknife): 32 hash buckets of users, leave-one-out ratios,
    // SE = √((B−1)/B · Σ(r_i − r̄)²). One aggregation to the bucket
    // frame; everything after is 32 rows. Hashed surface = the exact
    // integer sums + the cross-multiplied integer q9 ratio; the sqrt/
    // libm-adjacent SE and CI are BANDED with verdict booleans (SE within
    // the √B·range bound; CI brackets the point estimate), never hashed
    "q328_jackknife_ratio_ci" -> { (s, dir) =>
      val per = t(s, dir, "events")
        .groupBy((col("user_id") % 32).cast("long").as("bucket"))
        .agg(sum(when(col("event_type") === "purchase" &&
            col("value").isNotNull,
          expr("CAST(floor(value * 1000000) AS BIGINT)")).otherwise(0L))
          .cast("long").as("sx"),
          count(lit(1)).cast("long").as("sy"))
      val wAll = Window.partitionBy()
      val loo = per
        .withColumn("__tx", sum("sx").over(wAll).cast("long"))
        .withColumn("__ty", sum("sy").over(wAll).cast("long"))
        .withColumn("__b", count(lit(1)).over(wAll).cast("long"))
        // leave-one-out ratios in NATURAL units as plain doubles — they
        // only feed the banded SE/CI, never the hashed columns
        .withColumn("r_i",
          (col("__tx") - col("sx")).cast("double") /
            (col("__ty") - col("sy")).cast("double") / lit(1000000.0))
      val agg = loo
        .withColumn("__rbar", sum("r_i").over(wAll) / col("__b"))
        .withColumn("__d2",
          (col("r_i") - col("__rbar")) * (col("r_i") - col("__rbar")))
        .agg(max("__b").cast("long").as("n_buckets"),
          max("__tx").cast("long").as("sum_micros"),
          max("__ty").cast("long").as("n_events"),
          sum("__d2").as("__ss"),
          min("r_i").as("__rmin"),
          max("r_i").as("__rmax"))
      val se = sqrt((col("n_buckets") - 1).cast("double") /
        col("n_buckets").cast("double") * col("__ss"))
      val ratio = col("sum_micros").cast("double") /
        col("n_events").cast("double") / lit(1000000.0)
      agg.select(col("n_buckets"), col("sum_micros"), col("n_events"),
        // exact q9 point estimate: (Σx_micros / 10⁶) / Σy in q9 units
        // = Σx_micros·10³ div Σy — positive-dividend integer division
        expr("""CAST(CAST(sum_micros AS DECIMAL(38,0)) * 1000
                div n_events AS BIGINT)""").as("ratio_q9"),
        // Σd² ≤ B·range² ⇒ SE ≤ √B·range (+slack for the double sums)
        (!isnan(se) && se >= lit(0.0) &&
          se <= sqrt(col("n_buckets").cast("double")) *
            (col("__rmax") - col("__rmin")) + lit(1e-9)).as("se_ok"),
        (ratio - lit(1.96) * se <= ratio &&
          ratio <= ratio + lit(1.96) * se).as("ci_ok"))
    },

    // HILL TAIL-INDEX ESTIMATOR — how heavy is the term-frequency tail
    // (the Zipf exponent a curation pipeline checks before trusting
    // frequency-based filters): α̂ = k / Σ_{i≤k} ln(f_(i)/f_(k+1)) over
    // the top-k order statistics of the vocabulary frequency spectrum.
    // The corpus collapses to the vocabulary once; the top-(k+1) rows
    // come from TakeOrderedAndProject (per-partition top-(k+1) + driver
    // merge — the q166/q210 precedent), NEVER a 1-partition global rank
    // window over the vocab; ln terms are 9-dp-quantized before the
    // DECIMAL sum (q79's precedent)
    "q329_hill_tail" -> { (s, dir) =>
      val k = 20 // the synthetic vocabulary has 31 distinct terms
      val freqs = t(s, dir, "documents")
        .select(explode(split(trim(col("text")), "\\s+")).as("term"))
        .filter(col("term") =!= "")
        .groupBy("term").agg(count(lit(1)).cast("long").as("f"))
      // top k+1 under the TOTAL order (f desc, term asc) → TakeOrdered;
      // the (k+1)-th row (the threshold) is the MINIMUM of that set under
      // the same order, picked with min_by on a 21-row frame
      val topK1 = freqs.orderBy(col("f").desc, col("term").asc).limit(k + 1)
      val thresh = topK1
        .agg(max_by(struct(col("f"), col("term")),
          struct((-col("f")).as("nf"), col("term"))).as("m"))
        .select(col("m.f").as("f_k1"), col("m.term").as("t_k1"))
      topK1
        .crossJoin(broadcast(thresh))
        // strictly before the threshold row in the total order = rank ≤ k
        .filter(col("f") > col("f_k1") ||
          (col("f") === col("f_k1") && col("term") < col("t_k1")))
        .withColumn("__t",
          round(log(col("f").cast("double") / col("f_k1").cast("double")),
            9).cast("decimal(20,9)"))
        .agg(count(lit(1)).cast("long").as("k_used"),
          max("f_k1").cast("long").as("f_threshold"),
          sum("__t").cast("decimal(20,9)").as("__lnsum"))
        .select(col("k_used"), col("f_threshold"),
          round(col("k_used").cast("double") /
            col("__lnsum").cast("double"), 6).cast("decimal(28,6)")
            .as("hill_alpha"))
    },

    // EWMA CONTROL CHART — the memory-ful sibling of q178's CUSUM: per
    // event type, the daily count series smoothed by the FLOOR-QUANTIZED
    // micro-unit recursion ewma_u' = ⌊0.3·x_u + 0.7·ewma_u⌋ (floor of
    // integer-valued doubles is IEEE-exact in every engine — round() is
    // NOT: Spark's BigDecimal HALF_UP vs DuckDB's float path diverge on
    // halfway values, caught by this query's own sf0.01 gate), alert when
    // |x_u − ewma_u| > 3σ·10⁶ with σ from exact integer moments. The
    // series lives on the calendar-bounded daily frame; the fold is an
    // in-row HOF over a collected per-type array (≤31 elements), never a
    // driver loop
    "q322_ewma_control" -> { (s, dir) =>
      val daily = t(s, dir, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).cast("long").as("x"))
      val sig = daily.groupBy("event_type")
        .agg(count(lit(1)).cast("long").as("nd"),
          sum(col("x").cast("decimal(38,0)")).cast("decimal(38,0)").as("s1"),
          sum((col("x").cast("decimal(38,0)") * col("x")))
            .cast("decimal(38,0)").as("s2"))
        .withColumn("sigma",
          sqrt((col("nd").cast("decimal(38,0)") * col("s2") -
            col("s1") * col("s1")).cast("double") /
            (col("nd").cast("double") * (col("nd") - 1).cast("double"))))
        .select("event_type", "sigma")
      daily.groupBy("event_type")
        .agg(sort_array(collect_list(struct(col("day"), col("x"))))
          .as("__days"))
        .select(col("event_type"), expr(
          """explode(transform(sequence(1, size(__days)), t ->
               named_struct(
                 'day', element_at(__days, t).day,
                 'x', element_at(__days, t).x,
                 'ewma_u', aggregate(slice(__days, 2, t - 1),
                   element_at(__days, 1).x * 1000000L,
                   (acc, e) -> CAST(floor(0.3D * (e.x * 1000000L) +
                     0.7D * acc) AS BIGINT)))))""")
          .as("s"))
        .select(col("event_type"), col("s.day").as("day"),
          col("s.x").as("x"), col("s.ewma_u").as("ewma_u"))
        .join(broadcast(sig), "event_type")
        .withColumn("alert",
          abs(col("x") * lit(1000000L) - col("ewma_u")).cast("double") >
            lit(3.0) * col("sigma") * lit(1000000.0))
        .drop("sigma")
    },

    // SPRT SEQUENTIAL MONITOR — Wald's sequential probability ratio test
    // as a PURE INTEGER random walk: the ln-likelihood increments for
    // H0: p=0.10 vs H1: p=0.15 are Scala-precomputed micro-unit literals
    // embedded in BOTH engines (no transcendentals in-plan at all), the
    // walk is a cumulative sum partitioned by cohort over a total event
    // order, and the verdict is the first boundary crossing
    // (A = ln((1−β)/α), B = ln(β/(1−α)) at α = β = 0.05, micro-units)
    "q323_sprt_monitor" -> { (s, dir) =>
      val (p0, p1, alpha, beta) = (0.10, 0.15, 0.05, 0.05)
      val cPos = math.round(math.log(p1 / p0) * 1e6)            // x = 1
      val cNeg = math.round(math.log((1 - p1) / (1 - p0)) * 1e6) // x = 0
      val upper = math.round(math.log((1 - beta) / alpha) * 1e6)
      val lower = math.round(math.log(beta / (1 - alpha)) * 1e6)
      val w = Window.partitionBy("cohort").orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val walk = t(s, dir, "events")
        .select((col("user_id") % 4).cast("long").as("cohort"),
          unix_micros(col("ts")).as("ts_us"), col("event_id"),
          when(col("event_type") === "purchase", lit(cPos))
            .otherwise(lit(cNeg)).as("step"))
        .withColumn("llr_u", sum("step").over(w).cast("long"))
        .withColumn("rn", count(lit(1)).over(w).cast("long"))
      walk.filter(col("llr_u") >= upper || col("llr_u") <= lower)
        .groupBy("cohort")
        .agg(min("rn").cast("long").as("n_at_decision"),
          min_by(col("llr_u"), col("rn")).cast("long").as("llr_u_at"))
        .withColumn("decision",
          when(col("llr_u_at") >= upper, lit("accept_h1"))
            .otherwise(lit("accept_h0")))
    },

    // HILBERT vs Z-ORDER LAYOUT — the locality upgrade to q240: the same
    // occupied 64×64 grid ranked by both curves, and the layout verdict
    // is the TOTAL Manhattan step length along each visiting order
    // (Hilbert's adjacent-rank guarantee ⇒ tighter shard bounding boxes).
    // The index is `order` unrolled per-round projections (full codegen,
    // no UDF); the oracle replays the IDENTICAL round arithmetic from the
    // same generator (Hilbert.sqlSteps). Windows run over the ≤4096-cell
    // frame, never the raw relation
    "q321_hilbert_layout" -> { (s, dir) =>
      val morton = (0 until 6).map { k =>
        s"(((x >> $k) & 1) << ${2 * k}) + (((y >> $k) & 1) << ${2 * k + 1})"
      }.mkString(" + ")
      val pts = t(s, dir, "orders").select(
        (col("o_orderkey") * 37 % 64).cast("long").as("x"),
        (col("o_custkey") * 73 % 64).cast("long").as("y"))
        .distinct()
        .withColumn("z", expr(s"CAST($morton AS BIGINT)"))
      val withH = graft.data.Hilbert.withIndex(pts, "x", "y", 6, "h")
      val wH = Window.orderBy("h")
      val wZ = Window.orderBy("z")
      withH
        .withColumn("dh", abs(col("x") - lag("x", 1).over(wH)) +
          abs(col("y") - lag("y", 1).over(wH)))
        .withColumn("dz", abs(col("x") - lag("x", 1).over(wZ)) +
          abs(col("y") - lag("y", 1).over(wZ)))
        .agg(count(lit(1)).cast("long").as("n_cells"),
          sum("dh").cast("long").as("hilbert_step_total"),
          sum("dz").cast("long").as("zorder_step_total"))
        .withColumn("hilbert_no_worse",
          col("hilbert_step_total") <= col("zorder_step_total"))
    },

    // LOG-RANK TEST — does q305's survival differ between two user groups
    // (even vs odd ids): O−E and the hypergeometric variance accumulate
    // over the JOINT collapsed time axis (calendar-bounded hours), exact
    // integer risk/death counts, E/V increments and the final χ² as exact
    // cross-multiplied integer q9/ppm quotients — zero doubles end to end.
    // The survival family's significance test
    "q312_logrank" -> { (s, dir) =>
      val subj = t(s, dir, "events")
        .groupBy("user_id")
        .agg(expr("""CAST((unix_micros(max(ts)) - unix_micros(min(ts)))
                     div 3600000000 AS BIGINT)""").as("dur_hours"),
          max(when(col("event_type") === "purchase", 1).otherwise(0))
            .cast("int").as("converted"))
        .withColumn("grp", (col("user_id") % 2).cast("int"))
      graft.data.Survival.logRank(subj, "grp", "dur_hours", "converted")
    },

    // MCNEMAR'S PAIRED TEST — did per-user purchase behavior change
    // between the first and second half of the month: only the discordant
    // pair counts matter, so the statistic is EXACT integer ppm (b−c)²·10⁶
    // div (b+c) (+ Edwards continuity correction). One agg over per-user
    // flags — the paired sibling of the q306 independence test
    "q313_mcnemar" -> { (s, dir) =>
      val per = t(s, dir, "events")
        .groupBy("user_id")
        .agg(
          max(when(col("event_type") === "purchase" &&
            dayofmonth(col("ts")) <= 15, 1).otherwise(0)).as("first_half"),
          max(when(col("event_type") === "purchase" &&
            dayofmonth(col("ts")) > 15, 1).otherwise(0)).as("second_half"))
      graft.data.Contingency.mcnemar(per, "first_half", "second_half")
    },

    // CHI-SQUARED INDEPENDENCE TEST — nation × market segment association
    // from exact contingency counts: the categorical drift/association
    // audit a feature pipeline runs before trusting a segmentation. Raw
    // rows collapse to |A|·|B| cells once; margins are windows over cells;
    // the χ² terms keep integer numerators and cross into doubles only for
    // IEEE-exact square-and-divide (Contingency.scala's discipline)
    "q306_chi_square" -> { (s, dir) =>
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val j = c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      graft.data.Contingency.chiSquare(j, "n_name", "c_mktsegment")
    },

    // ONE-WAY ANOVA FROM EXACT MOMENTS — does account balance differ by
    // market segment: F statistic and η² from per-group (n, Σx, Σx²) in
    // exact integer cents (the q249 sub-unit discipline), ONE aggregation
    // over the raw data no matter the scale, group count = parallelism
    "q307_anova_oneway" -> { (s, dir) =>
      val c = t(s, dir, "customer").select(col("c_mktsegment"),
        expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("bal_cents"))
      graft.data.Contingency.anovaOneWay(c, "c_mktsegment", "bal_cents")
    },

    // COCHRAN–MANTEL–HAENSZEL STRATIFIED TEST — does user parity (the
    // "exposure") associate with purchasing AFTER controlling for the
    // user cohort stratum: the confounder-adjusted sibling of q306's
    // marginal chi² and the arbitrary-stratum generalization of q312's
    // log-rank (CMH over time strata). Subjects collapse to the |strata|
    // frame in ONE hash agg; E/V/R/S increments and the final χ²/pooled
    // odds ratio are exact cross-multiplied integer q9/ppm quotients —
    // zero doubles end to end (Contingency.cmh's logRank discipline)
    "q340_cmh_stratified" -> { (s, dir) =>
      val per = t(s, dir, "events")
        .groupBy("user_id")
        .agg(max(when(col("event_type") === "purchase", 1).otherwise(0))
          .cast("int").as("outcome"))
        .withColumn("exposure", (col("user_id") % 2).cast("int"))
        .withColumn("stratum", expr("CAST((user_id div 2) % 5 AS BIGINT)"))
      graft.data.Contingency.cmh(per, "stratum", "exposure", "outcome")
    },

    // COCHRAN'S Q TEST — did per-user purchase propensity differ across
    // the three thirds of the month (k = 3 paired binary conditions,
    // subjects as their own controls — the k-ary generalization of
    // q313's McNemar): Q is RATIONAL in the counts, so the statistic is
    // an exact integer ppm quotient with a Cauchy–Schwarz-nonnegative
    // dividend. One per-user collapse + ONE global aggregation
    "q343_cochran_q" -> { (s, dir) =>
      val per = t(s, dir, "events")
        .groupBy("user_id")
        .agg(
          max(when(col("event_type") === "purchase" &&
            dayofmonth(col("ts")) <= 10, 1).otherwise(0)).as("c1"),
          max(when(col("event_type") === "purchase" &&
            dayofmonth(col("ts")) > 10 &&
            dayofmonth(col("ts")) <= 20, 1).otherwise(0)).as("c2"),
          max(when(col("event_type") === "purchase" &&
            dayofmonth(col("ts")) > 20, 1).otherwise(0)).as("c3"))
      graft.data.Agreement.cochranQ(per,
        Seq(col("c1"), col("c2"), col("c3")))
    },

    // SEGMENT-WISE MANN–WHITNEY U — q277's grouped layout for the OTHER
    // rank statistic: one tie-corrected U per language, cumulative pass
    // partitioned by segment (parallelism scales with segments, per-task
    // state with the per-segment value domain). Same samples as q277:
    // even- vs odd-numbered sources
    "q296_mwu_by_segment" -> { (s, dir) =>
      val isEven = expr("CAST(substring(source, 4) AS INT) % 2 = 0")
      val counts = t(s, dir, "documents")
        .groupBy(col("lang"), col("n_chars").as("v"))
        .agg(sum(when(isEven, 1L).otherwise(0L)).cast("long").as("ca"),
          sum(when(!isEven, 1L).otherwise(0L)).cast("long").as("cb"))
      graft.data.RankStats.mannWhitneyFromCountsGrouped(counts, "v", Seq("lang"))
    },

    // METRIC PARITY AUDIT — the fairness-style segment report an ML-ops
    // gate reads before shipping a model or metric change: each segment's
    // rate vs the global rate as exact integer ppm gaps (never "roughly
    // equal" doubles). Segments here are deterministic user cohorts; the
    // shape generalizes to any protected attribute column
    "q284_metric_parity" -> { (s, dir) =>
      val ev = t(s, dir, "events")
        .select((col("user_id") % 5).cast("long").as("cohort"),
          when(col("event_type") === "purchase", 1L).otherwise(0L)
            .as("is_p"))
      val glob = ev.agg(
        expr("CAST(sum(is_p) * 1000000 div count(1) AS BIGINT)")
          .as("global_rate_ppm"))
      ev.groupBy("cohort")
        .agg(count(lit(1)).cast("long").as("n_events"),
          sum("is_p").cast("long").as("n_purchases"))
        .withColumn("rate_ppm",
          expr("CAST(n_purchases * 1000000 div n_events AS BIGINT)"))
        .crossJoin(broadcast(glob))
        .withColumn("gap_ppm",
          abs(col("rate_ppm") - col("global_rate_ppm")))
    },

    // CUPED VARIANCE REDUCTION — the experimentation upgrade every mature
    // A/B platform runs (Deng et al., WSDM 2013): adjust each user's
    // post-period metric by their PRE-period covariate, ŷ = y − θ(x − x̄),
    // with θ = cov(x,y)/var(x) pooled. Shrinks variance by ρ² without
    // biasing the treatment contrast. All moments exact DECIMAL integers
    // (micro-units), θ/ρ²/means are exact-then-cast doubles with an
    // identical op sequence on both engines; arms by q198's md5 hash
    "q283_cuped" -> { (s, dir) =>
      val d38 = "decimal(38,0)"
      val cut = lit("2024-01-15").cast("date")
      val per = t(s, dir, "events").filter(col("value").isNotNull)
        .select(col("user_id"), to_date(col("ts")).as("day"),
          expr("CAST(floor(value * 1000000) AS BIGINT)").as("v"))
        .groupBy("user_id")
        .agg(sum(when(col("day") <= cut, col("v")).otherwise(0L))
            .cast("long").as("x"),
          sum(when(col("day") > cut, col("v")).otherwise(0L))
            .cast("long").as("y"))
        .withColumn("arm", expr(
          """CAST(conv(substring(md5(CAST(concat('arm|',
             CAST(user_id AS STRING)) AS BINARY)), 1, 12), 16, 10)
             AS BIGINT) % 2"""))
      val mom = per.agg(count(lit(1)).cast("long").as("n"),
        sum(col("x").cast(d38)).cast(d38).as("sx"),
        sum(col("y").cast(d38)).cast(d38).as("sy"),
        sum(col("x").cast(d38) * col("x")).cast(d38).as("sxx"),
        sum(col("x").cast(d38) * col("y")).cast(d38).as("sxy"),
        sum(col("y").cast(d38) * col("y")).cast(d38).as("syy"))
      val num = (col("n").cast(d38) * col("sxy") -
        col("sx").cast(d38) * col("sy")).cast("double")
      val denx = (col("n").cast(d38) * col("sxx") -
        col("sx").cast(d38) * col("sx")).cast("double")
      val deny = (col("n").cast(d38) * col("syy") -
        col("sy").cast(d38) * col("sy")).cast("double")
      per.groupBy("arm")
        .agg(count(lit(1)).cast("long").as("n_users"),
          sum(col("x").cast(d38)).cast(d38).as("sxa"),
          sum(col("y").cast(d38)).cast(d38).as("sya"))
        .crossJoin(broadcast(mom))
        .select(col("arm"), col("n_users"),
          (col("sya").cast("double") / col("n_users").cast("double"))
            .as("mean_y_u"),
          ((col("sya").cast("double") / col("n_users").cast("double")) -
            (num / denx) *
            ((col("sxa").cast("double") / col("n_users").cast("double")) -
             (col("sx").cast("double") / col("n").cast("double"))))
            .as("mean_y_cuped_u"),
          (num / denx).as("theta"),
          (num * num / (denx * deny)).as("rho2"))
    },

    // SCD2 DIMENSION LOOKUP — the warehouse join q137 builds intervals
    // for: each fact row takes the dimension version VALID AT ITS TIME.
    // The lookup IS a backward as-of join on version start (no range join,
    // q83's 1-shuffle/1-sort plan) — intervals partition time, so latest
    // valid_from ≤ fact_ts is exactly the containing version. Same-instant
    // state flaps collapse to the last writer per (user, ts) first
    // (arg_max), keeping the version table deterministic. Oracle replays
    // with an explicit [valid_from, valid_to) range join
    "q282_scd2_lookup" -> { (s, dir) =>
      val ev = t(s, dir, "events").select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"), col("event_type"))
      val perTs = ev.groupBy("user_id", "ts_us")
        .agg(max_by(col("event_type"), col("event_id")).as("state"))
      val w = Window.partitionBy("user_id").orderBy("ts_us")
      val versions = perTs
        .withColumn("__prev", lag("state", 1).over(w))
        .filter(col("__prev").isNull || col("__prev") =!= col("state"))
        .select(col("user_id"), col("ts_us").as("valid_from"), col("state"))
      val facts = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("ts_us"))
      graft.operators.AsofJoin.backward(facts, versions,
          keys = Seq("user_id"), leftTs = "ts_us", rightTs = "valid_from",
          payload = Seq("state"), suffix = "_dim")
        .select("user_id", "event_id", "ts_us", "state_dim")
    },

    // TOP-K CHURN — leaderboard stability week over week ("who entered /
    // left the top-20"): deterministic weekly top-20 by (count desc, id),
    // consecutive weeks full-outer-joined on membership, entry/exit/stay
    // counts per transition. The ranking-DIFF analytics none of the
    // static top-k queries cover; one shuffle for the weekly counts, then
    // everything is k-sized
    "q278_topk_churn" -> { (s, dir) =>
      val ev = t(s, dir, "events")
        .withColumn("wk", expr(
          "datediff(to_date(ts), DATE '2024-01-01') div 7"))
        .filter(col("wk").between(0, 3))
      val cnt = ev.groupBy("wk", "user_id")
        .agg(count(lit(1)).cast("long").as("n"))
      val w = Window.partitionBy("wk")
        .orderBy(col("n").desc, col("user_id"))
      val top = cnt.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 20)
        .select(col("wk"), col("user_id")).localCheckpoint()
      (0L to 2L).map { k =>
        val a = top.filter(col("wk") === k).select("user_id")
        val b = top.filter(col("wk") === k + 1).select("user_id")
        val entries = b.exceptAll(a).count()
        val exits = a.exceptAll(b).count()
        val nB = b.count()
        val sp = s
        import sp.implicits._
        Seq((k, nB, entries, exits, nB - entries))
          .toDF("week_from", "n_top", "n_entries", "n_exits", "n_stayed")
      }.reduce(_.unionByName(_))
    },

    // SEGMENT-WISE KS — drift per SEGMENT in one pass ("has the length
    // distribution shifted per language"): the grouped rank-stat kernel
    // runs the cumulative pass partitioned by lang, one statistic per
    // group, never serializing all segments through one task. Samples:
    // even- vs odd-numbered sources within each language
    "q277_ks_by_segment" -> { (s, dir) =>
      val isEven = expr("CAST(substring(source, 4) AS INT) % 2 = 0")
      val counts = t(s, dir, "documents")
        .groupBy(col("lang"), col("n_chars").as("v"))
        .agg(sum(when(isEven, 1L).otherwise(0L)).cast("long").as("ca"),
          sum(when(!isEven, 1L).otherwise(0L)).cast("long").as("cb"))
      graft.data.RankStats.ksFromCountsGrouped(counts, "v", Seq("lang"))
    },

    // INTERVAL UNION COVERAGE — total covered time per key after merging
    // overlapping intervals (the "how long was the user actually active"
    // metric a naive sum(duration) double-counts): each event opens a
    // 5-minute interval; islands form where a start exceeds the running
    // max of prior ends (one partitioned window), then island extents
    // aggregate. Exact integer seconds; same plan family as q84/q137 but
    // the UNION-length semantics neither covers
    "q275_interval_union" -> { (s, dir) =>
      val span = 300L
      val ev = t(s, dir, "events")
        .select(col("user_id").cast("long").as("user_id"),
          col("event_id").cast("long").as("event_id"),
          unix_micros(col("ts")).as("st"))
        .withColumn("st", expr("st div 1000000"))
        .withColumn("en", col("st") + span)
      // event_id tiebreak: a deterministic total row order keeps every
      // windowed intermediate identical between engines even on equal
      // (st, en) rows
      val w = Window.partitionBy("user_id")
        .orderBy(col("st"), col("en"), col("event_id"))
      val wPrev = w.rowsBetween(Window.unboundedPreceding, -1)
      val islands = ev
        .withColumn("prev_max_en", max("en").over(wPrev))
        .withColumn("new_island",
          when(col("prev_max_en").isNull ||
            col("st") > col("prev_max_en"), 1L).otherwise(0L))
        .withColumn("island", sum("new_island").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      islands.groupBy("user_id", "island")
        .agg(min("st").as("i_st"), max("en").as("i_en"),
          count(lit(1)).cast("long").as("i_n"))
        .groupBy("user_id")
        .agg(sum("i_n").cast("long").as("n_events"),
          count(lit(1)).cast("long").as("n_islands"),
          sum(col("i_en") - col("i_st")).cast("long").as("covered_sec"))
    },

    // TEXT HYGIENE SCREEN — the encoding-damage gate a C4/CCNet-style
    // cleaning pipeline runs before tokenization: control characters and
    // U+FFFD replacement chars (the mojibake fingerprint) flagged per
    // source. The fixture corpus is clean, so damage is injected
    // deterministically by doc id (q229's corrupt-fixture recipe) — both
    // engines build and screen the identical corrupted column
    "q276_text_hygiene" -> { (s, dir) =>
      val docs = t(s, dir, "documents").select(col("doc_id"), col("source"),
        col("text"))
        .withColumn("t",
          when(col("doc_id") % 17 === 0, concat(col("text"), lit("\u0007")))
            .when(col("doc_id") % 19 === 0,
              concat(col("text"), lit("\uFFFD")))
            .otherwise(col("text")))
      docs.groupBy("source")
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum(when(col("t").rlike("[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]"), 1L)
            .otherwise(0L)).cast("long").as("n_ctrl"),
          sum(when(col("t").contains("\uFFFD"), 1L).otherwise(0L))
            .cast("long").as("n_replacement"))
        .withColumn("n_clean",
          col("n_docs") - col("n_ctrl") - col("n_replacement"))
    },

    // ONE-PASS CORRELATION MATRIX — all pairwise Pearson coefficients of k
    // numeric columns from a SINGLE aggregation (k + k(k+1)/2 sums), never
    // k² scans: the feature-screening step before any model fit. Values
    // are integer-scaled first (cents / ppm units) so every moment is an
    // exact DECIMAL integer both engines reproduce; the k² output rows are
    // one closing double each. Lineitem quantity/price/discount
    "q272_corr_matrix" -> { (s, dir) =>
      val d38 = "decimal(38,0)"
      val li = t(s, dir, "lineitem").select(
        col("l_quantity").cast("long").as("x0"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("x1"),
        expr("CAST(round(l_discount * 100) AS BIGINT)").as("x2"))
      val cols = Seq("x0", "x1", "x2")
      val aggs = Seq(count(lit(1)).cast("long").as("n")) ++
        cols.map(c => sum(col(c).cast(d38)).cast(d38).as(s"s_$c")) ++
        (for (i <- cols.indices; j <- i until cols.size) yield
          sum(col(cols(i)).cast(d38) * col(cols(j))).cast(d38)
            .as(s"p_${cols(i)}_${cols(j)}"))
      val m = li.agg(aggs.head, aggs.tail: _*).localCheckpoint()
      def corr(a: String, b: String) = {
        val (lo, hi) = if (a <= b) (a, b) else (b, a)
        ((col("n").cast(d38) * col(s"p_${lo}_$hi") -
          col(s"s_$a").cast(d38) * col(s"s_$b")).cast("double") /
         sqrt((col("n").cast(d38) * col(s"p_${a}_$a") -
               col(s"s_$a").cast(d38) * col(s"s_$a")).cast("double") *
              (col("n").cast(d38) * col(s"p_${b}_$b") -
               col(s"s_$b").cast(d38) * col(s"s_$b")).cast("double")))
      }
      val pairs = for (i <- cols.indices; j <- i + 1 until cols.size)
        yield (cols(i), cols(j))
      pairs.map { case (a, b) =>
        m.select(lit(a).as("col_a"), lit(b).as("col_b"),
          col("n"), corr(a, b).as("pearson"))
      }.reduce(_.unionByName(_))
    },

    // GROUP-WISE OLS — per-group slope/intercept in closed form from the
    // same exact integer moments (the parametric companion of q192's
    // Theil–Sen): does value trend with hour-of-day per event type. One
    // hash agg; two closing doubles per group
    "q273_group_ols" -> { (s, dir) =>
      val d38 = "decimal(38,0)"
      val ev = t(s, dir, "events").filter(col("value").isNotNull)
        .select(col("event_type"),
          hour(col("ts")).cast("long").as("x"),
          expr("CAST(floor(value * 1000000) AS BIGINT)").as("y"))
      ev.groupBy("event_type")
        .agg(count(lit(1)).cast("long").as("n"),
          sum(col("x").cast(d38)).cast(d38).as("sx"),
          sum(col("y").cast(d38)).cast(d38).as("sy"),
          sum(col("x").cast(d38) * col("x")).cast(d38).as("sxx"),
          sum(col("x").cast(d38) * col("y")).cast(d38).as("sxy"))
        .select(col("event_type"), col("n"),
          ((col("n").cast(d38) * col("sxy") -
            col("sx").cast(d38) * col("sy")).cast("double") /
           (col("n").cast(d38) * col("sxx") -
            col("sx").cast(d38) * col("sx")).cast("double")).as("slope_u"),
          ((col("sy").cast(d38) * col("sxx") -
            col("sx").cast(d38) * col("sxy")).cast("double") /
           (col("n").cast(d38) * col("sxx") -
            col("sx").cast(d38) * col("sx")).cast("double"))
            .as("intercept_u"))
    },

    // ROLLING-ORIGIN FORECAST BACKTEST — the ML-ops gate for a forecasting
    // job: score the seasonal-naive forecast (value 7 days earlier, the
    // baseline every real model must beat) against actuals across every
    // origin at once. Calendar-correct via a day−7 equi-join (lag(7) over
    // row order would silently slip on missing days); sMAPE terms in exact
    // integer ppm (|f−a|·2e6 div (f+a), both ≥ 1 by construction), per-type
    // mean by integer div. Two hash aggs + one self-join on the tiny daily
    // relation
    "q270_forecast_backtest" -> { (s, dir) =>
      val daily = t(s, dir, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).cast("long").as("n"))
      val fc = daily.select(col("event_type"),
        date_add(col("day"), 7).as("day"), col("n").as("f"))
      daily.join(fc, Seq("event_type", "day"))
        .withColumn("term_ppm",
          expr("CAST(abs(n - f) * 2000000 div (n + f) AS BIGINT)"))
        .groupBy("event_type")
        .agg(count(lit(1)).cast("long").as("n_days"),
          sum(col("n")).cast("long").as("sum_actual"),
          sum(abs(col("n") - col("f"))).cast("long").as("sum_abs_err"),
          expr("CAST(sum(term_ppm) div count(1) AS BIGINT)").as("smape_ppm"))
    },

    // CUBE completes the multi-granularity family (q93 ROLLUP is the
    // hierarchy path; CUBE adds the (·, source) cross-slices a drill-down
    // dashboard needs): all four grouping sets in ONE Expand + hash agg
    // pass, grouping() flags disambiguating real NULLs from totals exactly
    // as q93 does. DuckDB replays with native CUBE
    "q268_cube_stats" -> { (s, dir) =>
      t(s, dir, "documents")
        .cube("lang", "source")
        .agg(count(lit(1)).cast("long").as("n_docs"),
             sum(col("n_chars").cast("long")).cast("long").as("total_chars"),
             grouping(col("lang")).cast("int").as("__gl"),
             grouping(col("source")).cast("int").as("__gs"))
        .select(
          when(col("__gl") === 1, lit("<all>"))
            .otherwise(coalesce(col("lang"), lit("<null>"))).as("lang"),
          when(col("__gs") === 1, lit("<all>"))
            .otherwise(coalesce(col("source"), lit("<null>"))).as("source"),
          col("n_docs"), col("total_chars"))
    },

    // The analytic-window trio a feature pipeline leans on for rank-based
    // normalization: percent_rank, cume_dist and ntile(4) per language over
    // document length — all three are pure integer-derived ratios
    // (rank−1)/(n−1), cum/n, bucketed row_number, so the doubles are
    // bit-identical in any engine. One shuffle + one sort for all three
    // functions (they share the window)
    "q269_analytic_trio" -> { (s, dir) =>
      val w = Window.partitionBy("lang").orderBy(col("n_chars"), col("doc_id"))
      t(s, dir, "documents").select(col("doc_id"), col("lang"),
          col("n_chars"))
        .withColumn("pr", percent_rank().over(w))
        .withColumn("cd", cume_dist().over(w))
        .withColumn("quartile", ntile(4).over(w).cast("int"))
    },

    "q93_rollup_stats" -> { (s, dir) =>
      t(s, dir, "documents")
        .rollup("lang", "source")
        .agg(count(lit(1)).cast("long").as("n_docs"),
             sum(col("n_chars").cast("long")).cast("long").as("total_chars"),
             grouping(col("lang")).cast("int").as("__gl"),
             grouping(col("source")).cast("int").as("__gs"))
        .select(
          when(col("__gl") === 1, lit("<all>"))
            .otherwise(coalesce(col("lang"), lit("<null>"))).as("lang"),
          when(col("__gs") === 1, lit("<all>"))
            .otherwise(coalesce(col("source"), lit("<null>"))).as("source"),
          col("n_docs"), col("total_chars"))
    },

    // funnel analysis ("clicks converting to a purchase within 1 h") —
    // event-sequence analytics COMPOSED from the forward as-of join: for
    // each click, the next purchase of the same user at-or-after it, then a
    // per-user conversion aggregate. Same one-shuffle/one-sort budget as the
    // as-of operator itself; no range join, no per-user collect. The oracle
    // is an INDEPENDENT shape (min-over-range LEFT JOIN + group), so it
    // cross-checks the as-of semantics too
    "q96_funnel" -> { (s, dir) =>
      val ev = t(s, dir, "events").select(col("event_id"), col("user_id"),
        col("event_type"), unix_micros(col("ts")).as("ts_us"))
      val clicks = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts_us")
      val purchases = ev.filter(col("event_type") === "purchase")
        .groupBy("user_id", "ts_us").agg(count(lit(1)).as("__c"))
        .withColumn("purchase_ts", col("ts_us")).drop("__c")
      val joined = graft.operators.AsofJoin.forward(clicks, purchases,
        Seq("user_id"), "ts_us", "ts_us", Seq("purchase_ts"))
      joined.groupBy("user_id")
        .agg(count(lit(1)).cast("long").as("n_clicks"),
             sum(when(col("purchase_ts_asof").isNotNull &&
                      col("purchase_ts_asof") - col("ts_us") <= 3600L * 1000000L,
                 1).otherwise(0)).cast("long").as("n_converted"))
    },

    // per-group top-k via the PARTIAL-AGGREGATING typed Aggregator (the
    // scale alternative to q09's window: only k rows per (map partition,
    // group) reach the shuffle instead of sorting whole groups after it).
    // Same fixture and total order as q09, so the window oracle locks the
    // aggregator's insert/merge/tie-break logic row-for-row. The composite
    // id orderkey*8+linenumber is order-isomorphic to (orderkey,
    // linenumber) — linenumber is 1..7 — and decodes back exactly
    "q118_topk_agg" -> { (s, dir) =>
      val li = t(s, dir, "lineitem").select(col("l_suppkey"),
        (col("l_orderkey") * 8 + col("l_linenumber")).cast("long").as("__id"),
        col("l_extendedprice").as("__v"))
      li.groupBy("l_suppkey")
        .agg(graft.operators.TopKAgg.topK(3)(col("__v"), col("__id")).as("top"))
        .select(col("l_suppkey"), posexplode(col("top")).as(Seq("pos", "e")))
        .select(col("l_suppkey"),
          expr("e.id div 8").as("l_orderkey"),
          (col("e.id") % 8).cast("int").as("l_linenumber"),
          col("e.value").as("l_extendedprice"),
          (col("pos") + 1).cast("int").as("rn"))
    },

    // as-of join with MATCH TOLERANCE (pandas merge_asof's `tolerance`):
    // q83's backward join, but a match staler than 1 hour reports null
    // instead of a stale carry — the "state must be fresh" variant every
    // event-enrichment pipeline needs. Oracle: DuckDB native ASOF with the
    // same bound applied to the matched row
    "q112_asof_tolerance" -> { (s, dir) =>
      val ev = t(s, dir, "events").select(
        col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"), col("value"))
      val big = ev.groupBy("event_type", "ts_us")
        .agg(max(col("value")).as("big_value"))
        .filter(col("big_value") >= 200.0)
        .withColumn("big_ts_us", col("ts_us"))
      graft.operators.AsofJoin.backward(ev, big, Seq("event_type"),
        "ts_us", "ts_us", Seq("big_ts_us", "big_value"),
        tolerance = Some(3600L * 1000000L))
    },

    // salted skew join: hot users (>= 70 events) scatter over 8 salts, the
    // per-user dimension replicates per salt, cold keys ride salt 0 — the
    // manual hot-key remedy for shuffles AQE cannot rewrite. Oracle = the
    // PLAIN inner join: salting is proven row-identical, only the task
    // distribution changes
    "q108_salted_join" -> { (s, dir) =>
      val ev = t(s, dir, "events").select("event_id", "user_id", "value")
      val dim = ev.groupBy("user_id")
        .agg(count(lit(1)).cast("long").as("user_events"))
      graft.operators.SkewJoin.saltedJoin(ev, dim, "user_id",
          nSalts = 8, hotThreshold = 70L)
        .select("user_id", "event_id", "value", "user_events")
    },

    // Bloom-filter pre-filtered semi join: a ~2 KB key sketch of the
    // filtered dim drops ~90% of the fact rows MAP-SIDE, before the join's
    // exchange; the exact semi join that follows removes the false
    // positives, so the oracle is the PLAIN semi join — bloom filtering is
    // proven row-identical, only the shuffled volume changes. The manual
    // form of AQE's runtime bloom-filter rewrite, for plans it cannot touch
    "q123_bloom_join" -> { (s, dir) =>
      val fact = t(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
      val dim = t(s, dir, "orders").filter(col("o_totalprice") > 450000.0)
        .select(col("o_orderkey").as("l_orderkey"))
      graft.operators.BloomJoin.bloomSemiJoin(fact, dim, "l_orderkey",
        expectedItems = 20000L, fpp = 0.01)
    },

    // PageRank over the part co-purchase graph (parts sharing an order,
    // both directions), 5 synchronous steps in exact ppm integer fixed
    // point: integer sums are order-independent and integer division exact,
    // so the distributed result is bit-identical on any partitioning and
    // DuckDB replays all five iterations as unrolled CTEs — the graph
    // operator made hash-oracle-visible, which the float form cannot be
    "q125_pagerank" -> { (s, dir) =>
      val edges = graft.operators.Graphs.coPurchaseEdges(t(s, dir, "lineitem"))
      graft.operators.PageRank.fixedPointRanks(edges, "src", "dst",
          iterations = 5)
        .select(col("node").as("part_key"), col("rank_fp"))
    },

    // PERSONALIZED PAGERANK (random walk with restart) — q125's restart
    // mass concentrated on a seed set, so ranks measure proximity TO THE
    // SEEDS ("parts bought alongside this group"): the recsys/relevance-
    // propagation operator. Same exact ppm integer fixed point, same
    // unrolled-CTE oracle discipline; unreachable nodes hold rank 0
    // exactly, the seed flag rides the frozen node relation
    "q430_personalized_pagerank" -> { (s, dir) =>
      val edges = graft.operators.Graphs.coPurchaseEdges(t(s, dir, "lineitem"))
      val seeds = t(s, dir, "part")
        .filter(col("p_partkey") % 100 === 0).select("p_partkey")
      graft.operators.PageRank.personalizedRanks(edges, "src", "dst",
          seeds, "p_partkey", iterations = 5)
        .select(col("node").as("part_key"), col("rank_fp"))
    },

    // CHECKPOINT/RESUME contract for the iterative tier — the
    // preemption-recovery guarantee a 100 TB graph job needs on spot
    // capacity: 3 iterations, state frozen (the stand-in for a parquet
    // checkpoint), then 2 more resumed from it — and because every step is
    // integer arithmetic there is NO float drift to re-converge, so the
    // oracle is q125's straight 5-iteration unroll, bit-for-bit
    "q203_pagerank_resume" -> { (s, dir) =>
      val edges = graft.operators.Graphs.coPurchaseEdges(t(s, dir, "lineitem"))
      val mid = graft.operators.PageRank.fixedPointRanks(edges, "src", "dst",
        iterations = 3).localCheckpoint()
      graft.operators.PageRank.fixedPointRanks(edges, "src", "dst",
          iterations = 2, initRanks = Some(mid))
        .select(col("node").as("part_key"), col("rank_fp"))
    },

    // Linear-interpolation imputation (lerp gap fill) — q134's step fill
    // upgraded: a missing day's value is interpolated between its nearest
    // observed neighbours, exactly — value = prev + (Δv · days_since) div
    // gap_days, all integers (both engines truncate toward zero). Gaps are
    // simulated by dropping day%3==0 observations; the grid is per-type
    // min..max of the OBSERVED days, so interior nulls always have both
    // neighbours. Two ignoreNulls windows over the calendar-bounded grid
    "q204_lerp_impute" -> { (s, dir) =>
      val observed = t(s, dir, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(expr("CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT)")
          .as("sum_u"))
        .filter(dayofmonth(col("day")) % 3 =!= 0)
      val grid = observed.groupBy("event_type")
        .agg(min("day").as("d0"), max("day").as("d1"))
        .select(col("event_type"),
          explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
      val joined = grid.join(observed, Seq("event_type", "day"), "left")
        .withColumn("vday", when(col("sum_u").isNotNull, col("day")))
      val prevW = Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val nextW = Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      joined
        .withColumn("prev_u", last(col("sum_u"), ignoreNulls = true).over(prevW))
        .withColumn("prev_d", last(col("vday"), ignoreNulls = true).over(prevW))
        .withColumn("next_u", first(col("sum_u"), ignoreNulls = true).over(nextW))
        .withColumn("next_d", first(col("vday"), ignoreNulls = true).over(nextW))
        .select(col("event_type"), col("day"),
          col("sum_u").isNull.as("is_imputed"),
          when(col("sum_u").isNotNull, col("sum_u")).otherwise(expr(
            """prev_u + ((next_u - prev_u) * datediff(day, prev_d))
               div datediff(next_d, prev_d)""")).cast("long").as("value_u"))
    },

    // semi-structured JSON extraction from the event props column — the
    // row-level payload-parsing op every event pipeline needs; stays inside
    // whole-stage codegen (get_json_object is a native expression, no UDF)
    "q98_json_extract" -> { (s, dir) =>
      t(s, dir, "events").select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
    },

    // point-in-interval join via bin replication: events inside the 30-min
    // windows opened by big events of their type. binWidth = window length
    // → each interval replicates to ≤ 2 bins and the join is equi on
    // (event_type, bin) — never the per-key quadratic a plain range join
    // degrades to. Oracle = the plain range join (row-identical by
    // construction; only the join shape differs)
    "q127_interval_join" -> { (s, dir) =>
      val ev = t(s, dir, "events").select(col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"), col("value"))
      val iv = ev.groupBy("event_type", "ts_us")
        .agg(max(col("value")).as("big_value"))
        .filter(col("big_value") >= 200.0)
        .select(col("event_type"), col("ts_us").as("win_start_us"),
          (col("ts_us") + 1800L * 1000000L).as("win_end_us"))
      graft.operators.IntervalJoin.binned(
          ev.select("event_id", "event_type", "ts_us"), iv,
          Seq("event_type"), "ts_us", "win_start_us", "win_end_us",
          binWidth = 1800L * 1000000L)
        .select("event_id", "event_type", "ts_us", "win_start_us", "win_end_us")
    },

    // one-pass column profiling over orders: null counts, exact
    // cardinality, numeric/string bounds for four columns from ONE scan
    // (multi-distinct via a single Expand) — the table-drop data-quality
    // report, fully SQL-replayable
    "q126_profile" -> { (s, dir) =>
      graft.data.Profile.profile(t(s, dir, "orders"),
        Seq("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"))
    },

    // Snapshot profile drift — q126's profiler run on two table drops and
    // diffed per column with integer-exact deltas and a machine-checked
    // drift flag: the "did today's crawl change shape" promotion gate. The
    // 'after' snapshot deliberately drifts (lang nulled for web-sourced
    // docs) so the null-rate flag actually fires on the fixture. Two
    // one-pass profiles + a column-count-sized join
    "q175_profile_drift" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      val before = docs.filter(col("doc_id") % 2 === 0)
      val after = docs.filter(col("doc_id") % 2 =!= 0)
        .withColumn("lang",
          when(col("source") === "web", lit(null).cast("string"))
            .otherwise(col("lang")))
      graft.data.Profile.driftReport(before, after,
        Seq("lang", "source", "n_chars"))
    },

    // CDC snapshot apply (MERGE INTO): a derived delta — price upserts for
    // keys %7, deletes for %13 (higher version, so it beats a same-key
    // upsert), brand-new keys for %97 — merges into the orders snapshot in
    // ONE union + ONE partial-aggregating max_by hash agg; no join, no
    // second pass for unmatched base rows. Latest version wins; the oracle
    // replays the union + row_number form
    "q131_merge_upsert" -> { (s, dir) =>
      val base = t(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
      val o = t(s, dir, "orders")
      val upserts = o.filter(col("o_orderkey") % 7 === 0)
        .select(col("o_orderkey"), col("o_custkey"),
          (col("o_totalprice") * 1.1).as("o_totalprice"),
          lit("U").as("o_orderstatus"), lit(1L).as("version"),
          lit("upsert").as("op"))
      val deletes = o.filter(col("o_orderkey") % 13 === 0)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("o_orderstatus"), lit(2L).as("version"), lit("delete").as("op"))
      val inserts = o.filter(col("o_orderkey") % 97 === 0)
        .select((col("o_orderkey") + 100000000L).as("o_orderkey"),
          col("o_custkey"), lit(1000.0).as("o_totalprice"),
          lit("N").as("o_orderstatus"), lit(1L).as("version"),
          lit("upsert").as("op"))
      graft.operators.Merge.applyChanges(base,
        upserts.unionByName(deletes).unionByName(inserts),
        keys = Seq("o_orderkey"), versionCol = "version", opCol = "op")
    },

    // snapshot diff: the same derived "next day" snapshot (modified %7,
    // dropped %13, inserted %97) diffed against the base — one null-safe
    // full-outer join emitting only the added/removed/changed rows with old
    // and new payload side by side; the audit/reconciliation op for any
    // incrementally-maintained table
    "q132_snapshot_diff" -> { (s, dir) =>
      val oldSnap = t(s, dir, "orders")
        .select("o_orderkey", "o_totalprice", "o_orderstatus")
      val o = t(s, dir, "orders")
      val newSnap = o.filter(col("o_orderkey") % 13 =!= 0)
        .select(col("o_orderkey"),
          when(col("o_orderkey") % 7 === 0, col("o_totalprice") * 1.1)
            .otherwise(col("o_totalprice")).as("o_totalprice"),
          when(col("o_orderkey") % 7 === 0, lit("U"))
            .otherwise(col("o_orderstatus")).as("o_orderstatus"))
        .unionByName(o.filter(col("o_orderkey") % 97 === 0)
          .select((col("o_orderkey") + 100000000L).as("o_orderkey"),
            lit(1000.0).as("o_totalprice"), lit("N").as("o_orderstatus")))
      graft.operators.Merge.diff(oldSnap, newSnap, keys = Seq("o_orderkey"))
    },

    // OHLC bar downsampling: events → one 15-min bar per event_type with
    // open/high/low/close/volume. ONE hash agg, no window: open/close are
    // min_by/max_by over the total (ts, event_id) order — the time-series
    // resampling op, partial-aggregating and shuffle-minimal at any scale
    // (the window form would sort whole buckets just to read two endpoints)
    "q133_ohlc_bars" -> { (s, dir) =>
      val ev = t(s, dir, "events").select(col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"), col("value"))
      ev.withColumn("bucket", expr("ts_us div 900000000"))
        .groupBy("event_type", "bucket")
        .agg(
          min_by(col("value"), struct(col("ts_us"), col("event_id"))).as("open"),
          max_by(col("value"), struct(col("ts_us"), col("event_id"))).as("close"),
          max(col("value")).as("high"),
          min(col("value")).as("low"),
          count(lit(1)).cast("long").as("n_events"),
          sum(col("value").cast("decimal(38,6)")).cast("double").as("volume"))
    },

    // time-grid gap fill (resample + forward fill): a daily grid per user
    // over the user's own active span, each grid point carrying the most
    // recent observation at-or-before it — COMPOSED from sequence/explode
    // (grid synthesis) + the backward as-of join, so the fill inherits the
    // operator's 1-shuffle/1-sort plan instead of a per-key range join.
    // Oracle: DuckDB generate_series + native ASOF LEFT JOIN
    "q134_gapfill" -> { (s, dir) =>
      val ev = t(s, dir, "events").select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"), col("value"))
      val obs = ev.groupBy("user_id", "ts_us")
        .agg(max_by(col("value"), col("event_id")).as("value"))
        .withColumn("obs_ts", col("ts_us"))
      val grid = ev.groupBy("user_id")
        .agg(min(col("ts_us")).as("t0"), max(col("ts_us")).as("t1"))
        .select(col("user_id"),
          explode(sequence(expr("t0 div 86400000000"),
                           expr("t1 div 86400000000"))).as("d"))
        .select(col("user_id"), (col("d") * 86400000000L).as("grid_ts"))
      graft.operators.AsofJoin.backward(grid, obs, Seq("user_id"),
        "grid_ts", "ts_us", Seq("value", "obs_ts"))
    },

    // retention cohort matrix: users bucketed by first-active day, distinct
    // actives per (cohort, day offset). distinct (user, day) then a per-user
    // window min then one small agg — the window reuses the user_id exchange
    // instead of a groupBy+join round trip carrying the whole activity table
    "q136_retention_cohorts" -> { (s, dir) =>
      val active = t(s, dir, "events")
        .select(col("user_id"), to_date(col("ts")).as("day"))
        .distinct()
      active
        .withColumn("cohort_day",
          min(col("day")).over(Window.partitionBy("user_id")))
        .groupBy(col("cohort_day"),
          datediff(col("day"), col("cohort_day")).as("day_offset"))
        .agg(count(lit(1)).cast("long").as("n_users"))
    },

    // SCD Type-2 interval build: collapse consecutive same-state events per
    // user, then each surviving row's validity is [its ts, next change ts)
    // (open current interval = NULL). lag-collapse and lead-validity are two
    // windows over the SAME (user_id; ts, event_id) exchange+sort — filter
    // preserves partitioning AND order, so the second window adds neither
    "q137_scd2_intervals" -> { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
      t(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("ts_us"), col("event_type").as("state"))
        .withColumn("__prev", lag(col("state"), 1).over(w))
        .filter(col("__prev").isNull || col("__prev") =!= col("state"))
        .select(col("user_id"), col("state"), col("ts_us").as("valid_from"),
          lead(col("ts_us"), 1).over(
            Window.partitionBy("user_id")
              .orderBy(col("ts_us"), col("event_id"))).as("valid_to"))
    },

    // exact triangle count over the part co-purchase graph (the q125 edge
    // set) — degree-oriented wedge join, each triangle counted once
    "q138_triangle_count" -> { (s, dir) =>
      val edges = graft.operators.Graphs.coPurchaseEdges(t(s, dir, "lineitem"))
      graft.operators.Triangles.count(edges, "src", "dst")
    },

    // bounded event-sequence builder (next-event-prediction training rows):
    // per-user first-20 event-type sequence in (ts, id) order plus the full
    // count. The row_number cap runs BEFORE collect_list, so per-group state
    // is bounded at 20 regardless of user fan-out; rn/cnt windows and the
    // final groupBy all share the one user_id exchange
    "q141_event_sequences" -> { (s, dir) =>
      val wOrd = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
      t(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("ts_us"), col("event_type"))
        .withColumn("__rn", row_number().over(wOrd))
        .withColumn("__cnt", count(lit(1)).over(Window.partitionBy("user_id")))
        .filter(col("__rn") <= 20)
        .groupBy("user_id")
        .agg(
          max(col("__cnt")).cast("long").as("n_events"),
          count(lit(1)).cast("int").as("seq_len"),
          array_join(transform(
            array_sort(collect_list(
              struct(col("ts_us"), col("event_id"), col("event_type")))),
            x => x.getField("event_type")), ">").as("seq"))
    },

    // trailing 7-day distinct actives (WAU per day): each distinct
    // (user, day) replicates to the <= 7 days it contributes to, then ONE
    // distinct-count per day — replication factor is the window length, a
    // constant, vs the per-day range self-join that rescans the activity
    // table once per day. The q128 sketch store is the approximate sibling;
    // this is the exact one
    "q142_trailing_actives" -> { (s, dir) =>
      val active = t(s, dir, "events")
        .select(col("user_id"), to_date(col("ts")).as("day"))
        .distinct()
      val span = active.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      active
        .select(col("user_id"), col("day"),
          explode(sequence(lit(0), lit(6))).as("off"))
        .select(col("user_id"), date_add(col("day"), col("off")).as("day"))
        .crossJoin(broadcast(span))
        .filter(col("day") >= col("d0") && col("day") <= col("d1"))
        .groupBy("day")
        .agg(count_distinct(col("user_id")).cast("long").as("wau_7d"))
    },

    // PSI drift report: first-half-of-month event values as the baseline,
    // second half as current — decile bins from baseline exact percentiles,
    // per-bin counts/proportions/PSI contribution (the week-over-week data
    // drift gate). quantile_cont parity + the BM25 ln/round convention
    "q144_psi_drift" -> { (s, dir) =>
      graft.data.Drift.psiReport(
        t(s, dir, "events").select(col("value"), col("ts")),
        "value", isBaseline = to_date(col("ts")) <= lit("2024-01-15").cast("date"),
        nBins = 10)
        .select("bin", "n_base", "n_curr", "p_base", "p_curr", "psi_contrib")
    },

    // item-item similarity from co-purchase baskets (recommender candidate
    // generation): each part is a sparse integer vector over orders
    // (weight = quantity), similarity via the SparseSim inverted-index
    // kernel — same one-shuffle-per-stage shape as q135, maxDf capping
    // oversized baskets instead of hot shingles
    "q146_item_similarity" -> { (s, dir) =>
      val posts = t(s, dir, "lineitem")
        .groupBy(col("l_partkey").as("item"), col("l_orderkey").as("basket"))
        .agg(sum(floor(col("l_quantity")).cast("long")).as("qty"))
      graft.search.SparseSim.cosinePairsFromPostings(
          posts, "item", "basket", "qty", maxDf = 100, minCos = 0.15,
          outIdA = "item_a", outIdB = "item_b")
        .withColumn("cos", round(col("cos"), 9))
    },

    // seeded label propagation over the co-purchase graph: 20% of parts
    // carry their brand as ground truth, three synchronous vote rounds
    // spread it — integer votes + (count desc, label asc) tie order make
    // every round bit-replayable, so the oracle unrolls all three
    "q148_label_propagation" -> { (s, dir) =>
      val edges = graft.operators.Graphs.coPurchaseEdges(t(s, dir, "lineitem"))
      val seeds = t(s, dir, "part")
        .filter(col("p_partkey") % 5 === 0)
        .select(col("p_partkey").as("node"), col("p_brand").as("lbl"))
      graft.operators.LabelProp.propagate(edges, "src", "dst",
        seeds, "node", "lbl", iterations = 3)
    },

    // first-order Markov transition model over per-user event streams
    // (user-journey analytics / next-event prior): ONE user-keyed window
    // pairs each event with its successor (lead), one (src,dst) partial agg
    // counts transitions, per-src totals re-aggregated from the transition
    // table itself (edge-type-bounded, never a second event scan), and the
    // probability lands in exact ppm integer fixed point — the q125
    // convention — so the oracle replays bit-for-bit with no float division
    "q149_markov_transitions" -> { (s, dir) =>
      val wOrd = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
      val trans = t(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("ts_us"), col("event_type"))
        .withColumn("dst", lead(col("event_type"), 1).over(wOrd))
        .filter(col("dst").isNotNull)
        .groupBy(col("event_type").as("src"), col("dst"))
        .agg(count(lit(1)).as("n"))
      val tot = trans.groupBy("src").agg(sum(col("n")).as("tot"))
      trans.join(broadcast(tot), "src")
        .select(col("src"), col("dst"), col("n").cast("long").as("n"),
          expr("(n * CAST(1000000 AS BIGINT)) div tot").as("p_ppm"))
    },

    // k-core of the co-purchase graph (k=80 peels a real cascade on this
    // data: ~7% of parts fall out over ~6 synchronous rounds at both sf0.01
    // and sf0.1). The operator peels to the FIXPOINT and requires
    // convergence; the oracle unrolls 12 rounds — extra rounds are no-ops
    // at the fixpoint, which is what makes a fixed-depth SQL replay of a
    // data-dependent iteration count sound (see KCore's scaladoc)
    "q150_kcore" -> { (s, dir) =>
      val edges = graft.operators.Graphs.coPurchaseEdges(t(s, dir, "lineitem"))
      graft.operators.KCore.decompose(edges, "src", "dst", k = 80,
        maxRounds = 12)
    },

    // per-group linear trend (closed-form OLS slope of value over day index):
    // value scaled to exact micro-units, every moment summed in DECIMAL(38,0)
    // — associative, so ONE map-side-combining hash agg per event_type is the
    // whole plan — and the slope emitted in ppm fixed point with the sign
    // split out (integer division of positives only: Spark's `div` truncates
    // toward zero while DuckDB's `//` floors, so negatives never reach it;
    // the denominator n·Σx²−(Σx)² is a variance, nonnegative by construction)
    "q152_group_trend" -> { (s, dir) =>
      val d38 = "decimal(38,0)"
      val ev = t(s, dir, "events")
        .filter(col("value").isNotNull)
        .select(col("event_type"),
          datediff(to_date(col("ts")), lit("2024-01-01").cast("date"))
            .cast("long").as("x"),
          expr("CAST(floor(value * 1000000) AS BIGINT)").as("y_u"))
      ev.groupBy("event_type")
        .agg(count(lit(1)).cast("long").as("n"),
          sum(col("x")).cast(d38).as("sx"),
          sum(col("y_u").cast(d38)).as("sy"),
          sum((col("x") * col("y_u")).cast(d38)).as("sxy"),
          sum((col("x") * col("x")).cast(d38)).as("sxx"))
        .select(col("event_type"), col("n"),
          expr(s"CAST(n AS $d38) * sxy - sx * sy").as("num"),
          expr(s"CAST(n AS $d38) * sxx - sx * sx").as("den"))
        .select(col("event_type"), col("n"),
          when(col("den") === 0, lit(null).cast("long")).otherwise(
            expr(s"CAST(CASE WHEN num < 0 THEN -1 ELSE 1 END AS BIGINT) * " +
                 s"CAST((abs(num) * CAST(1000000 AS $d38)) div den AS BIGINT)"))
            .as("slope_ppm"))
    },

    // seasonal baseline anomaly screen: per (event_type, hour-of-day) the
    // first half of the month defines the baseline mean, current rows are
    // flagged when value exceeds 2x that mean — compared by integer
    // cross-multiplication (value_u·n_base > 2·sum_base_u, operands widened
    // to DECIMAL(38,0) so the product cannot wrap), so no division
    // ever happens and the report is bit-exact. The baseline table is
    // bounded by |event_type|·24, hence broadcast back onto the current
    // scan: one hash agg + one broadcast join + one hash agg, no skew path
    "q153_seasonal_baseline" -> { (s, dir) =>
      val ev = t(s, dir, "events")
        .filter(col("value").isNotNull)
        .select(col("event_type"), hour(col("ts")).as("hr"),
          expr("CAST(floor(value * 1000000) AS BIGINT)").as("value_u"),
          (to_date(col("ts")) <= lit("2024-01-15").cast("date")).as("is_base"))
      val base = ev.filter(col("is_base"))
        .groupBy("event_type", "hr")
        .agg(count(lit(1)).cast("long").as("n_base"),
          sum(col("value_u")).cast("long").as("sum_base_u"))
      ev.filter(!col("is_base"))
        .join(broadcast(base), Seq("event_type", "hr"), "left")
        .groupBy("event_type", "hr")
        .agg(max(coalesce(col("n_base"), lit(0L))).as("n_base"),
          max(coalesce(col("sum_base_u"), lit(0L))).as("sum_base_u"),
          count(lit(1)).cast("long").as("n_curr"),
          sum(when(col("n_base").isNotNull &&
                   col("value_u").cast("decimal(38,0)") * col("n_base") >
                     lit(2L).cast("decimal(38,0)") * col("sum_base_u"),
                   1L).otherwise(0L)).cast("long").as("n_anom"))
    },

    // Per-stratum winsorization report — the value-CLIPPING complement of
    // q109's row-dropping band filter and q129's outlier flags: clip each
    // stratum's values into [floor(p01), ceil(p99)] and report how much
    // mass moved. Integer bounds (floor/ceil of the exact interpolated
    // percentiles) keep the winsorized sum in exact integer arithmetic —
    // no double accumulation, no rounding fudge. Plan: one grouped exact-
    // percentile agg broadcast back (q109's budget), clipping map-side,
    // one final hash agg; winsorizeBounds(exact = false) swaps in at 100 TB
    "q170_winsorize" -> { (s, dir) =>
      val docs = t(s, dir, "documents").select("lang", "n_chars")
      val bounds = graft.data.Outliers.winsorizeBounds(docs, "n_chars",
        "lang", pLo = 0.01, pHi = 0.99)
      docs.join(broadcast(bounds), "lang")
        .groupBy("lang")
        .agg(count(lit(1)).cast("long").as("n"),
          max("lo").as("lo"), max("hi").as("hi"),
          sum(when(col("n_chars") < col("lo"), 1L).otherwise(0L))
            .cast("long").as("n_clip_lo"),
          sum(when(col("n_chars") > col("hi"), 1L).otherwise(0L))
            .cast("long").as("n_clip_hi"),
          sum(col("n_chars")).cast("long").as("sum_orig"),
          sum(greatest(col("lo"), least(col("hi"), col("n_chars"))))
            .cast("long").as("sum_winsorized"))
    },

    // Temporal train/feature split with a LEAKAGE AUDIT — the ML-ops gate
    // for time-split training data: label rows (events after the cutoff)
    // take their per-user feature (latest pre-cutoff value) via the
    // backward as-of join against ONLY the pre-cutoff slice, and the query
    // emits machine-checked verdicts that no feature observation leaks from
    // the future (feature_ts < cutoff AND feature_ts <= label_ts, vacuously
    // true for never-seen users). Composes q83's as-of operator — inherits
    // its 1-shuffle/1-sort plan — and the oracle replays it with DuckDB's
    // native ASOF JOIN plus the same literal verdicts
    "q172_temporal_split_audit" -> { (s, dir) =>
      val cutoff = lit("2024-01-20 00:00:00").cast("timestamp")
      val ev = t(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      // collapse the feature side to one row per (user, ts) — equal-ts right
      // rows would otherwise make the as-of pick nondeterministic (the q86
      // oracle's pre-aggregation discipline)
      val pre = ev.filter(col("ts") < cutoff)
        .groupBy("user_id", "ts").agg(max("value").as("value"))
      val post = ev.filter(col("ts") >= cutoff)
      val feat = graft.operators.AsofJoin.backward(post, pre,
        keys = Seq("user_id"), leftTs = "ts", rightTs = "ts",
        payload = Seq("value", "ts"), suffix = "_feat")
      feat.select(col("event_id"), col("user_id"),
          col("value_feat"), unix_micros(col("ts_feat")).as("feat_ts_us"),
          (col("ts_feat").isNull || col("ts_feat") < cutoff).as("no_future_feature"),
          (col("ts_feat").isNull || col("ts_feat") <= col("ts")).as("feature_precedes_label"))
    },

    // Right-to-be-forgotten erasure with an independent audit — the
    // GDPR/CCPA batch cycle: a deterministic ~2% deletion list (md5-mod,
    // q151's replayable hash) scrubbed from two stores (the raw event log
    // and the derived per-user profile), each scrub proven by RE-SCANNING
    // the scrubbed output for surviving keys — n_remaining_matching is a
    // machine-checked zero, not an assumption. Broadcast key list: scrub
    // and audit are both map-side against each store's scan
    "q174_erasure_audit" -> { (s, dir) =>
      import graft.data.Erasure
      val ev = t(s, dir, "events")
      val del = ev.select("user_id").distinct()
        .filter(pmod(conv(substring(md5(concat(lit("del|"),
            col("user_id").cast("string")).cast("binary")), 1, 12), 16, 10)
          .cast("long"), lit(50L)) === 0L)
      val profile = ev.groupBy("user_id")
        .agg(count(lit(1)).cast("long").as("n_events"))
      Erasure.auditRow("events", ev, "user_id", del)
        .unionByName(Erasure.auditRow("user_profile", profile, "user_id", del))
    },

    // Fan-out-capped join — q166's enforcement twin: attach at most 3
    // lineitems per order, selected by the deterministic (shipdate,
    // linenumber) order, so the join's output is bounded by |left| * cap no
    // matter how hot a key gets; the kept row's rank rides along. The
    // truncation audit (CappedJoin.overflowReport) is exercised in the unit
    // suite; here the full row-level oracle replays the rank window + join
    "q171_capped_join" -> { (s, dir) =>
      val orders = t(s, dir, "orders")
        .select(col("o_orderkey").as("l_orderkey"), col("o_custkey"))
      val li = t(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_shipdate", "l_quantity")
      // (l_orderkey, l_linenumber) is NOT unique in this synthetic table:
      // the order lists every output column, so any remaining tie is between
      // rows identical in every emitted value — deterministic output either way
      graft.operators.CappedJoin.cappedJoin(orders, li,
          keys = Seq("l_orderkey"),
          orderBy = Seq(col("l_shipdate").asc, col("l_linenumber").asc,
            col("l_quantity").asc),
          maxPerKey = 3)
        .select(col("l_orderkey"), col("o_custkey"), col("join_rank"),
          col("l_linenumber"), col("l_quantity"))
    },

    // Join pre-flight cardinality + skew diagnostics — the governance report
    // a 100 TB pipeline runs BEFORE an unfamiliar self-join: per-key counts
    // in one hash agg, estimated output rows = Σ c(k)² (exact for the
    // lineitem co-purchase self-join every graph query here builds on), the
    // top-10 hot keys by fan-out, and a skew ratio — so a quadratic key is a
    // report row, not a dead executor. All products in DECIMAL(38,0) (q152's
    // overflow-impossible discipline), top-10 via orderBy+limit (TakeOrdered:
    // k rows per partition reach the driver merge, never a 1-partition
    // window), totals attached as a broadcast 1-row join
    "q166_join_preflight" -> { (s, dir) =>
      val d38 = "decimal(38,0)"
      val perKey = t(s, dir, "lineitem").groupBy("l_partkey")
        .agg(count(lit(1)).cast("long").as("key_rows"))
        .withColumn("est_pairs",
          expr(s"CAST(key_rows AS $d38) * CAST(key_rows AS $d38)").cast(d38))
      val summary = perKey.agg(
        count(lit(1)).cast("long").as("n_keys"),
        sum("key_rows").cast("long").as("n_rows"),
        sum("est_pairs").cast(d38).as("est_join_rows"),
        max("key_rows").cast("long").as("max_key_rows"))
      val top = perKey.orderBy(col("est_pairs").desc, col("l_partkey")).limit(10)
      val w = Window.orderBy(col("est_pairs").desc, col("l_partkey"))
      top.withColumn("rank", row_number().over(w).cast("int"))
        .crossJoin(broadcast(summary))
        .select(col("rank"), col("l_partkey"), col("key_rows"),
          col("est_pairs").cast("long").as("est_pairs"),
          col("n_keys"), col("n_rows"),
          col("est_join_rows").cast("long").as("est_join_rows"),
          expr(s"CAST((CAST(max_key_rows AS $d38) * 1000 * n_keys) div n_rows AS BIGINT)")
            .as("skew_x1000"),
          (col("est_join_rows") >
            lit(10L).cast(d38) * col("n_rows").cast(d38)).as("quadratic_flag"))
    },

    // Time-decayed engagement score — the recency-weighted activity signal a
    // ranking/retention pipeline keeps per user. Exact power-of-two decay:
    // half-life = 1 day, weight = 2^(20 - age_days), ages beyond the 20-day
    // window contribute nothing (the cutoff is explicit, not an epsilon
    // tail), so every weight is an integer and the DECIMAL(38,0) sum is
    // exact and order/partitioning-independent — no double pow(), no float
    // drift. One project + one hash agg; map-side partials do all the work
    "q176_decay_score" -> { (s, dir) =>
      val d38 = "decimal(38,0)"
      t(s, dir, "events")
        .filter(col("value").isNotNull)
        .select(col("user_id"),
          datediff(lit("2024-01-31").cast("date"), to_date(col("ts")))
            .cast("int").as("age"),
          expr("CAST(floor(value * 1000000) AS BIGINT)").as("value_u"))
        .filter(col("age").between(0, 20))
        .groupBy("user_id")
        .agg(count(lit(1)).cast("long").as("n_events"),
          sum(col("value_u")).cast("long").as("sum_u"),
          sum(col("value_u").cast(d38) *
              expr(s"CAST(shiftleft(CAST(1 AS BIGINT), 20 - age) AS $d38)"))
            .cast("long").as("decayed_x2p20"))
    },

    // CUSUM level-shift detection over the per-type daily event series — the
    // changepoint screen a pipeline runs on ingest volumes before trusting a
    // week of data. Deviations are scaled by n_days (cnt*n_days - total) so
    // the running sum needs NO division and stays in exact integer
    // arithmetic; the changepoint is the argmax of |cusum| with an
    // earliest-day tiebreak (row_number over a total order). Day counts per
    // type are calendar-bounded, so every window sorts ~31 rows per type
    // after one data-sized hash agg — never a data-sized sort
    "q178_cusum_changepoint" -> { (s, dir) =>
      val daily = t(s, dir, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).cast("long").as("cnt"))
      val tot = Window.partitionBy("event_type")
      val run = Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val scored = daily
        .withColumn("n_days", count(lit(1)).over(tot).cast("long"))
        .withColumn("total", sum(col("cnt")).over(tot).cast("long"))
        .withColumn("cusum",
          sum(col("cnt") * col("n_days") - col("total")).over(run).cast("long"))
      val pick = Window.partitionBy("event_type")
        .orderBy(abs(col("cusum")).desc, col("day").asc)
      scored.withColumn("rn", row_number().over(pick))
        .filter(col("rn") === 1)
        .select(col("event_type"), col("n_days"), col("total"),
          col("day").as("cp_day"), col("cusum").as("cusum_at_cp"),
          abs(col("cusum")).cast("long").as("max_abs_cusum"))
    },

    // Degree assortativity of the co-purchase graph — "do popular items
    // co-occur with popular items": the Pearson correlation of endpoint
    // degrees over the distinct edge set. The moments (Σx, Σxy, Σx², m) are
    // EXACT integers (DECIMAL(38,0) products), and the final r is one
    // deterministic double expression over them — both engines compute the
    // identical nearest-double of identical integers, then identical IEEE
    // ops. Plan: one distinct self-join edge list (frozen once), a
    // node-sized degree agg joined to both endpoints, one scalar agg
    "q182_degree_assortativity" -> { (s, dir) =>
      val d38 = "decimal(38,0)"
      val edges = graft.operators.Graphs.coPurchaseEdges(t(s, dir, "lineitem"))
        .distinct().localCheckpoint()
      val deg = edges.groupBy(col("src").as("node"))
        .agg(count(lit(1)).cast("long").as("deg"))
      val e = edges
        .join(deg.select(col("node").as("src"), col("deg").as("dx")), "src")
        .join(deg.select(col("node").as("dst"), col("deg").as("dy")), "dst")
      e.agg(
          count(lit(1)).cast("long").as("n_edges"),
          sum(col("dx")).cast("long").as("sum_x"),
          sum(col("dy")).cast("long").as("sum_y"),
          sum(col("dx").cast(d38) * col("dy")).cast("long").as("sum_xy"),
          sum(col("dx").cast(d38) * col("dx")).cast("long").as("sum_x2"),
          sum(col("dy").cast(d38) * col("dy")).cast("long").as("sum_y2"))
        .select(col("n_edges"), col("sum_x"), col("sum_y"), col("sum_xy"),
          col("sum_x2"), col("sum_y2"),
          ((col("n_edges").cast(d38) * col("sum_xy") -
            col("sum_x").cast(d38) * col("sum_y")).cast("double") /
           sqrt((col("n_edges").cast(d38) * col("sum_x2") -
                 col("sum_x").cast(d38) * col("sum_x")).cast("double") *
                (col("n_edges").cast(d38) * col("sum_y2") -
                 col("sum_y").cast(d38) * col("sum_y")).cast("double")))
            .as("assortativity"))
    },

    // Exact weighted median per group — the robust center a metrics pipeline
    // wants when rows carry multiplicity (quantity-weighted price): the
    // smallest value whose running weight doubles past the total
    // (2·cum >= total — cross-multiplied, no division). Integer-exact:
    // cents + floored quantities. One row-sized hash agg collapses to the
    // (group, value) domain FIRST, so the window sorts the value domain,
    // not the data; at 100 TB the HistStore bins answer the same question
    // in one scan
    "q184_weighted_median" -> { (s, dir) =>
      val li = t(s, dir, "lineitem").select(col("l_returnflag"),
        expr("CAST(floor(l_extendedprice * 100) AS BIGINT)").as("price_c"),
        expr("CAST(floor(l_quantity) AS BIGINT)").as("w"))
      val grouped = li.groupBy("l_returnflag", "price_c")
        .agg(sum(col("w")).cast("long").as("w"))
      val tot = Window.partitionBy("l_returnflag")
      val run = Window.partitionBy("l_returnflag").orderBy("price_c")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grouped
        .withColumn("total_w", sum(col("w")).over(tot).cast("long"))
        .withColumn("cum_w", sum(col("w")).over(run).cast("long"))
        .filter(col("cum_w") * 2 >= col("total_w"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("l_returnflag").orderBy("price_c")))
        .filter(col("rn") === 1)
        .select(col("l_returnflag"), col("total_w"),
          col("price_c").as("weighted_median_cents"),
          col("cum_w").as("cum_w_at_median"))
    },

    // Percentile-rank normalization per stratum — the scale-free feature
    // transform (cume_dist as an exact integer): each document's length
    // mapped to its tie-inclusive rank fraction within its language, in ppm.
    // The RANGE frame makes ties share a value (peers count together), so
    // the output is a total function of the data, not of sort order. One
    // window per stratum; at 100 TB the same ppm ranks come from the
    // HistStore bins without a sort
    "q185_rank_normalize" -> { (s, dir) =>
      val w = Window.partitionBy("lang").orderBy("n_chars")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = Window.partitionBy("lang")
      t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .withColumn("cnt_le", count(lit(1)).over(w).cast("long"))
        .withColumn("n", count(lit(1)).over(tot).cast("long"))
        .select(col("doc_id"), col("lang"), col("n_chars"),
          expr("CAST((cnt_le * 1000000) div n AS BIGINT)").as("pct_ppm"))
    },

    // Out-of-orderness audit for WATERMARK SIZING — the report that turns
    // "withWatermark(how much?)" from a guess into a measurement: per user
    // (the stream's key), arrival order is the event_id sequence, and a
    // row's lateness is how far the running event-time high-water mark has
    // already passed it. Aggregated per event type: how many rows arrive
    // out of order, how many would be dropped by a 60 s watermark, and the
    // max lateness a lossless watermark would need. Exact epoch-µs integers;
    // one per-user window + one hash agg
    "q186_lateness_audit" -> { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("ts_us"))
        .withColumn("late_us", max(col("ts_us")).over(w) - col("ts_us"))
        .groupBy("event_type")
        .agg(count(lit(1)).cast("long").as("n_events"),
          sum(when(col("late_us") > 0L, 1L).otherwise(0L))
            .cast("long").as("n_out_of_order"),
          sum(when(col("late_us") > 60L * 1000000L, 1L).otherwise(0L))
            .cast("long").as("n_late_60s"),
          max("late_us").cast("long").as("max_late_us"))
    },

    // Score-decile lift/gains report — the model-triage table an ML-ops
    // pipeline prints before trusting a ranker: decile the score with
    // q180's deterministic integer-floored quantile boundaries (NOT a
    // global-sort ntile — boundaries broadcast, assignment map-side), then
    // per-decile positive rate and lift vs the base rate, every ratio an
    // exact integer division over DECIMAL(38,0) products
    "q189_lift_report" -> { (s, dir) =>
      import graft.data.RangeShard
      val d38 = "decimal(38,0)"
      val li = t(s, dir, "lineitem")
        .select(col("l_extendedprice").as("score"),
          (col("l_returnflag") === "R").as("y"))
      val assigned = RangeShard.assign(li, "score",
          RangeShard.boundaries(li, "score", 10))
        .withColumnRenamed("shard", "decile")
      val per = assigned.groupBy("decile")
        .agg(count(lit(1)).cast("long").as("n"),
          sum(when(col("y"), 1L).otherwise(0L)).cast("long").as("n_pos"))
      val tot = per.agg(sum("n").cast("long").as("tot_n"),
        sum("n_pos").cast("long").as("tot_pos"))
      per.crossJoin(broadcast(tot))
        .select(col("decile"), col("n"), col("n_pos"),
          expr(s"CAST((CAST(n_pos AS $d38) * 1000000) div n AS BIGINT)")
            .as("pos_rate_ppm"),
          expr(s"""CAST((CAST(n_pos AS $d38) * tot_n * 1000)
                   div (CAST(n AS $d38) * tot_pos) AS BIGINT)""")
            .as("lift_x1000"))
    },

    // Benford first-digit audit — the data-forensics screen for fabricated
    // or truncated numeric feeds: observed first-digit distribution of the
    // order totals vs the Benford expectation (log10(1+1/d), ppm literals),
    // deviation flagged past 2%. First digit via integer-string slicing
    // (identical in both engines), never log10 on a boundary double. One
    // digit-sized hash agg + a broadcast 1-row total
    "q190_benford_audit" -> { (s, dir) =>
      val d38 = "decimal(38,0)"
      val per = t(s, dir, "orders")
        .select(expr("""CAST(substring(CAST(CAST(floor(o_totalprice) AS BIGINT)
                        AS STRING), 1, 1) AS INT)""").as("digit"))
        .groupBy("digit").agg(count(lit(1)).cast("long").as("n"))
      val tot = per.agg(sum("n").cast("long").as("tot"))
      per.crossJoin(broadcast(tot))
        .withColumn("ppm",
          expr(s"CAST((CAST(n AS $d38) * 1000000) div tot AS BIGINT)"))
        .withColumn("benford_ppm", expr(
          """CASE digit WHEN 1 THEN 301029 WHEN 2 THEN 176091
             WHEN 3 THEN 124938 WHEN 4 THEN 96910 WHEN 5 THEN 79181
             WHEN 6 THEN 66946 WHEN 7 THEN 57991 WHEN 8 THEN 51152
             ELSE 45757 END""").cast("long"))
        .select(col("digit"), col("n"), col("ppm"), col("benford_ppm"),
          abs(col("ppm") - col("benford_ppm")).cast("long").as("dev_ppm"),
          (abs(col("ppm") - col("benford_ppm")) > 20000L).as("flag"))
    },

    // Deterministic online bootstrap (Owen/Oza-style, hash-seeded) — CI
    // bands for a mean WITHOUT resampling passes: every row gets a
    // Poisson(1)-approximating integer weight per replicate from
    // md5(event_id|r) thresholds, so the 32 replicate means are one
    // 32×-fanout project + two hash aggs, exactly replayable by any engine.
    // No rand(), no collect, no per-replicate job; at 100 TB the fan-out is
    // the technique's documented cost (vs 32 full resample scans)
    "q191_hash_bootstrap" -> { (s, dir) =>
      val d38 = "decimal(38,0)"
      val ev = t(s, dir, "events").filter(col("value").isNotNull)
        .select(col("event_id"), col("event_type"),
          expr("CAST(floor(value * 1000000) AS BIGINT)").as("value_u"))
      val base = ev.groupBy("event_type")
        .agg(count(lit(1)).cast("long").as("n"),
          expr(s"CAST(CAST(sum(value_u) AS $d38) div count(1) AS BIGINT)")
            .as("mean_u"))
      val reps = ev.crossJoin(
          broadcast(s.range(32).select(col("id").cast("int").as("r"))))
        .withColumn("m", expr(
          """CAST(conv(substring(md5(CAST(concat(CAST(event_id AS STRING),
             '|', CAST(r AS STRING)) AS BINARY)), 1, 12), 16, 10)
             AS BIGINT) % 10000"""))
        .withColumn("w", when(col("m") < 3679, 0L).when(col("m") < 7358, 1L)
          .when(col("m") < 9197, 2L).otherwise(3L))
      reps.groupBy("event_type", "r")
        .agg(expr(
          s"CAST(CAST(sum(w * value_u) AS $d38) div nullif(sum(w), 0) AS BIGINT)")
          .as("mean_r_u"))
        .groupBy("event_type")
        .agg(count(lit(1)).cast("long").as("n_replicates"),
          min("mean_r_u").cast("long").as("boot_lo_u"),
          max("mean_r_u").cast("long").as("boot_hi_u"))
        .join(broadcast(base), "event_type")
        .select("event_type", "n", "mean_u", "n_replicates",
          "boot_lo_u", "boot_hi_u")
    },

    // Theil–Sen robust trend — q152's OLS twin with a 50% breakdown point:
    // the exact median of all pairwise daily slopes, each slope an integer
    // (Δcnt·1e6 div Δdays; both engines truncate toward zero, verified).
    // The pair space is per-type CALENDAR-bounded (≤ 31 days → ≤ 465
    // slopes), so the self-join is a bounded fan-out, never data-sized;
    // median selection is q184's division-free cross-multiplied pick
    "q192_theilsen_trend" -> { (s, dir) =>
      val daily = t(s, dir, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).cast("long").as("cnt"))
        .localCheckpoint()
      val a = daily.toDF("event_type", "day_a", "cnt_a")
      val b = daily.toDF("event_type", "day_b", "cnt_b")
      val g = a.join(b, "event_type").filter(col("day_a") < col("day_b"))
        .select(col("event_type"), expr(
          "CAST(((cnt_b - cnt_a) * 1000000) div datediff(day_b, day_a) AS BIGINT)")
          .as("slope_u"))
        .groupBy("event_type", "slope_u")
        .agg(count(lit(1)).cast("long").as("w"))
      val tot = Window.partitionBy("event_type")
      val run = Window.partitionBy("event_type").orderBy("slope_u")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      g.withColumn("total_w", sum("w").over(tot).cast("long"))
        .withColumn("cum_w", sum("w").over(run).cast("long"))
        .filter(col("cum_w") * 2 >= col("total_w"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("event_type").orderBy("slope_u")))
        .filter(col("rn") === 1)
        .select(col("event_type"), col("total_w").as("n_pairs"),
          col("slope_u").as("theilsen_slope_u"))
    },

    // Three-step STRICT-SEQUENCE funnel (view → click → purchase, each step
    // within 1 h of the previous) — q96's two-step conversion generalized by
    // CHAINING the forward as-of: step 3 runs from the matched CLICK time,
    // not the view time, so the sequence order is enforced, not just
    // co-occurrence. Two 1-shuffle/1-sort as-of joins over pre-collapsed
    // step tables + one hash agg; no per-user collect_list, no sort of the
    // raw stream
    "q196_funnel3" -> { (s, dir) =>
      val hour = 3600L * 1000000L
      val ev = t(s, dir, "events").select(col("event_id"), col("user_id"),
        col("event_type"), unix_micros(col("ts")).as("ts_us"))
      val views = ev.filter(col("event_type") === "view")
        .select("event_id", "user_id", "ts_us")
      def stepTable(kind: String, outTs: String) =
        ev.filter(col("event_type") === kind)
          .groupBy("user_id", "ts_us").agg(count(lit(1)).as("__c"))
          .withColumn(outTs, col("ts_us")).drop("__c")
      val s1 = graft.operators.AsofJoin.forward(views,
          stepTable("click", "click_ts"),
          Seq("user_id"), "ts_us", "ts_us", Seq("click_ts"))
        .withColumn("step2", col("click_ts_asof").isNotNull &&
          col("click_ts_asof") - col("ts_us") <= hour)
      val s2in = s1.filter(col("step2"))
        .select(col("event_id"), col("user_id"),
          col("click_ts_asof").as("cts"))
      val s3 = graft.operators.AsofJoin.forward(s2in,
        stepTable("purchase", "purchase_ts"),
        Seq("user_id"), "cts", "ts_us", Seq("purchase_ts"))
      val agg1 = s1.groupBy("user_id")
        .agg(count(lit(1)).cast("long").as("n_views"),
          sum(when(col("step2"), 1L).otherwise(0L)).cast("long").as("n_step2"))
      val agg2 = s3.groupBy("user_id")
        .agg(sum(when(col("purchase_ts_asof").isNotNull &&
            col("purchase_ts_asof") - col("cts") <= hour, 1L).otherwise(0L))
          .cast("long").as("n_step3"))
      agg1.join(agg2, Seq("user_id"), "left")
        .select(col("user_id"), col("n_views"), col("n_step2"),
          coalesce(col("n_step3"), lit(0L)).as("n_step3"))
    },

    // 2-D Pareto front (skyline) — "cheapest part for its size class":
    // non-dominated points under (minimize price, maximize size), WITHOUT
    // the naive O(n²) dominance join: collapse to the price domain (max
    // size per price, one hash agg), prefix-max over strictly lower prices,
    // then a point is on the front iff it is its price's best AND beats
    // every cheaper price's best. The only ordered pass runs on the
    // COLLAPSED value domain (q184's discipline) — a global skyline
    // genuinely needs one global order, but over distinct prices, not rows
    "q197_pareto_front" -> { (s, dir) =>
      val parts = t(s, dir, "part").select(col("p_partkey"), col("p_size"),
        expr("CAST(floor(p_retailprice * 100) AS BIGINT)").as("price_c"))
      val perPrice = parts.groupBy("price_c").agg(max("p_size").as("m"))
      val w = Window.orderBy("price_c")
        .rowsBetween(Window.unboundedPreceding, -1)
      val cum = perPrice.withColumn("cummax_prev", max("m").over(w))
      parts.join(broadcast(cum), "price_c")
        .select(col("p_partkey"), col("price_c"), col("p_size"),
          (col("p_size") === col("m") &&
           (col("cummax_prev").isNull || col("cummax_prev") < col("p_size")))
            .as("on_front"))
    },

    // Bot/abuse screen — the trust-and-safety triage over behavioral
    // cadence: per user, inter-event gaps (one lag window over a total
    // order), the exact floored median gap, total span, and an events-per-
    // hour rate in integer thousandths (cross-multiplied, NULL for
    // single-event users) — then a replayable is_suspect verdict on
    // (median gap, volume). One window + one hash agg; every number an
    // integer the oracle recomputes
    "q205_bot_screen" -> { (s, dir) =>
      val d38 = "decimal(38,0)"
      val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      t(s, dir, "events")
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"))
        .withColumn("gap_us", col("ts_us") - lag(col("ts_us"), 1).over(w))
        .groupBy("user_id")
        .agg(count(lit(1)).cast("long").as("n_events"),
          floor(percentile(col("gap_us"), lit(0.5))).cast("long")
            .as("median_gap_us"),
          (max("ts_us") - min("ts_us")).cast("long").as("span_us"))
        .withColumn("rate_per_hour_x1000", expr(
          s"""CAST((CAST(n_events AS $d38) * 3600000000 * 1000)
              div nullif(span_us, 0) AS BIGINT)"""))
        .withColumn("is_suspect",
          col("median_gap_us") < 6L * 3600L * 1000000L && col("n_events") >= 50L)
    },

    // Transition-latency report (view → next click per user, the UX
    // funnel-latency distribution): forward as-of attaches the next click,
    // latencies grouped by day with exact floored p50/p90 — the
    // percentile discipline of q170 over the as-of plan of q96. One as-of
    // + one hash agg over day-bounded groups
    "q206_transition_latency" -> { (s, dir) =>
      val ev = t(s, dir, "events").select(col("event_id"), col("user_id"),
        col("event_type"), col("ts"), unix_micros(col("ts")).as("ts_us"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("event_id"), col("user_id"), col("ts_us"),
          to_date(col("ts")).as("day"))
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy("user_id", "ts_us").agg(count(lit(1)).as("__c"))
        .withColumn("click_ts", col("ts_us")).drop("__c")
      graft.operators.AsofJoin.forward(views, clicks,
          Seq("user_id"), "ts_us", "ts_us", Seq("click_ts"))
        .filter(col("click_ts_asof").isNotNull)
        .withColumn("lat_us", col("click_ts_asof") - col("ts_us"))
        .groupBy("day")
        .agg(count(lit(1)).cast("long").as("n_transitions"),
          floor(percentile(col("lat_us"), lit(0.5))).cast("long").as("p50_us"),
          floor(percentile(col("lat_us"), lit(0.9))).cast("long").as("p90_us"),
          max("lat_us").cast("long").as("max_us"))
    },

    // Linear (equal-credit) attribution — the marketing-science complement
    // of q96/q196's first-touch funnels: every click in the 24 h window
    // before a purchase shares the conversion credit equally, credit_ppm =
    // 1e6 div n_clicks (integer, sums to ≤ 1e6 per conversion with the
    // truncation remainder explicit, never float-split). Per-user
    // equi-join + window containment — per-key fan-out bounded by a user's
    // own activity; the q127 binned interval join is the swap-in when a
    // single key's history is unbounded
    "q209_linear_attribution" -> { (s, dir) =>
      val window = 24L * 3600L * 1000000L
      val ev = t(s, dir, "events").select(col("event_id"), col("user_id"),
        col("event_type"), unix_micros(col("ts")).as("ts_us"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"),
          col("ts_us").as("cts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"),
          col("ts_us").as("pts"))
      val w = Window.partitionBy("purchase_id")
      purchases.join(clicks, Seq("user_id"))
        .filter(col("cts") < col("pts") && col("cts") >= col("pts") - window)
        .withColumn("n_clicks", count(lit(1)).over(w).cast("long"))
        .select(col("user_id"), col("purchase_id"), col("click_id"),
          col("n_clicks"),
          expr("CAST(1000000 div n_clicks AS BIGINT)").as("credit_ppm"))
    },

    // SLO error-budget BURN RATE — the SRE-analytics report: daily error
    // rate vs a 25% SLO, instantaneous and 7-day-rolling burn in integer
    // thousandths (burn > 1000 ⟹ budget burning faster than allotted —
    // the multiwindow alert rule), everything cross-multiplied, no float
    // division. The rolling window runs over the day-collapsed frame
    // (calendar-bounded — ≤ days rows, never data-sized)
    "q214_slo_burn" -> { (s, dir) =>
      val d38 = "decimal(38,0)"
      val daily = t(s, dir, "events")
        .groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).cast("long").as("n_events"),
          sum(when(col("event_type") === "error", 1L).otherwise(0L))
            .cast("long").as("n_errors"))
      val w7 = Window.orderBy("day").rowsBetween(-6, 0)
      daily
        .withColumn("n7_events", sum("n_events").over(w7).cast("long"))
        .withColumn("n7_errors", sum("n_errors").over(w7).cast("long"))
        .select(col("day"), col("n_events"), col("n_errors"),
          expr(s"CAST((CAST(n_errors AS $d38) * 1000000) div n_events AS BIGINT)")
            .as("err_ppm"),
          expr(s"""CAST((CAST(n_errors AS $d38) * 1000000 * 1000)
                   div (CAST(n_events AS $d38) * 250000) AS BIGINT)""")
            .as("burn_x1000"),
          expr(s"""CAST((CAST(n7_errors AS $d38) * 1000000 * 1000)
                   div (CAST(n7_events AS $d38) * 250000) AS BIGINT)""")
            .as("burn_7d_x1000"))
        .withColumn("alert", col("burn_7d_x1000") > 1000L)
    },

    // TIME-DECAY attribution — q209's equal split replaced by recency
    // weighting: a click's weight halves per hour of distance from the
    // purchase (2^(23−age_hours), q176's exact power-of-two discipline),
    // credit_ppm = w·1e6 div Σw per conversion. Completes the attribution
    // family (first/last touch = as-of, linear = q209, decay = this);
    // same bounded per-user join, integer arithmetic end to end
    "q224_decay_attribution" -> { (s, dir) =>
      val d38 = "decimal(38,0)"
      val window = 24L * 3600L * 1000000L
      val ev = t(s, dir, "events").select(col("event_id"), col("user_id"),
        col("event_type"), unix_micros(col("ts")).as("ts_us"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"),
          col("ts_us").as("cts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"),
          col("ts_us").as("pts"))
      val w = Window.partitionBy("purchase_id")
      purchases.join(clicks, Seq("user_id"))
        .filter(col("cts") < col("pts") && col("cts") >= col("pts") - window)
        .withColumn("age_h", expr("(pts - cts) div 3600000000"))
        .withColumn("wgt", expr("shiftleft(CAST(1 AS BIGINT), 23 - age_h)"))
        .withColumn("sum_w", sum("wgt").over(w).cast("long"))
        .select(col("user_id"), col("purchase_id"), col("click_id"),
          col("age_h").cast("long").as("age_h"),
          expr(s"CAST((CAST(wgt AS $d38) * 1000000) div sum_w AS BIGINT)")
            .as("credit_ppm"))
    },

    // QUANTILE NORMALIZATION across sources — the cross-distribution
    // feature transform (bioinformatics/ranking-feature standard): each
    // row's value maps to the GLOBAL value at its source-relative rank, so
    // every source's distribution lands on the global one exactly. All
    // heavy lifting happens on COLLAPSED value domains: per-(source,
    // value) tie-inclusive rank ppm, global-domain rank ppm, then the
    // first-crossing lookup (min global value with g_pct ≥ s_pct) as a
    // domain×domain broadcast join — rows only ever see one broadcast
    // dictionary join. Integer ppm throughout
    "q223_quantile_normalize" -> { (s, dir) =>
      val d38 = "decimal(38,0)"
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("n_chars"))
      val srcDom = docs.groupBy("source", "n_chars")
        .agg(count(lit(1)).cast("long").as("c"))
      val wsrc = Window.partitionBy("source").orderBy("n_chars")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val srcPct = srcDom
        .withColumn("cum", sum("c").over(wsrc).cast("long"))
        .withColumn("n", sum("c").over(Window.partitionBy("source")).cast("long"))
        .select(col("source"), col("n_chars"),
          expr(s"CAST((CAST(cum AS $d38) * 1000000) div n AS BIGINT)")
            .as("s_pct"))
      val gDom = docs.groupBy("n_chars").agg(count(lit(1)).cast("long").as("c"))
      val wg = Window.orderBy("n_chars")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val gPct = gDom.withColumn("cum", sum("c").over(wg).cast("long"))
        .crossJoin(broadcast(docs.agg(count(lit(1)).cast("long").as("gn"))))
        .select(col("n_chars").as("g_value"),
          expr(s"CAST((CAST(cum AS $d38) * 1000000) div gn AS BIGINT)")
            .as("g_pct"))
      val mapped = srcPct
        .join(broadcast(gPct), col("g_pct") >= col("s_pct"))
        .groupBy("source", "n_chars", "s_pct")
        .agg(min("g_value").cast("long").as("normalized"))
      docs.join(broadcast(mapped), Seq("source", "n_chars"))
        .select("doc_id", "source", "n_chars", "s_pct", "normalized")
    },

    // EXACT two-sample Kolmogorov–Smirnov statistic — the distribution-
    // comparison test PSI's fixed bins can only approximate: D =
    // max |F_a − F_b| over the MERGED value domain, computed entirely in
    // integers by cross-multiplication (|cumA·nB − cumB·nA|, denominator
    // nA·nB attached at the end) — no empirical-CDF doubles, no binning
    // loss. The one ordered pass runs over the collapsed value domain
    // (q184's discipline); compares click vs error value distributions
    "q245_ks_test" -> { (s, dir) =>
      val ev = t(s, dir, "events").filter(col("value").isNotNull &&
          col("event_type").isin("click", "error"))
        .select(col("event_type"),
          expr("CAST(floor(value * 1000000) AS BIGINT)").as("v"))
      val dom = ev.groupBy("v")
        .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
            .cast("long").as("ca"),
          sum(when(col("event_type") === "error", 1L).otherwise(0L))
            .cast("long").as("cb"))
      graft.data.RankStats.ksFromCounts(dom, "v")
    },

    // FINANCIAL RECONCILIATION — the books-balancing audit: each order's
    // header total vs the DECIMAL-exact recomputation from its lines
    // (Σ extendedprice·(1−discount)·(1+tax)), differences in exact cents,
    // bucketed into match / within-1% / discrepant counts plus the worst
    // absolute gap. The synthetic data's headers are independent of lines,
    // so the discrepancy path is genuinely exercised; every number is an
    // integer both engines reproduce. One join + two hash aggs
    "q249_order_reconciliation" -> { (s, dir) =>
      // prices are exact cents and discount/tax exact hundredths, so the
      // whole reconciliation runs in INTEGER 1e-4-cent units:
      // line ×1e4 = cents · (100−d₁₀₀) · (100+t₁₀₀) — no decimal-precision
      // rules to diverge between engines (round, not floor: the true
      // values are integral so *100 never lands on a tie)
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey").as("o_orderkey"), expr(
          """CAST(round(l_extendedprice * 100) AS BIGINT) *
             (100 - CAST(round(l_discount * 100) AS BIGINT)) *
             (100 + CAST(round(l_tax * 100) AS BIGINT))""").as("line_x1e4"))
        .groupBy("o_orderkey")
        .agg(sum(col("line_x1e4").cast("decimal(38,0)")).cast("long")
          .as("lines_x1e4"))
      t(s, dir, "orders").select(col("o_orderkey"), col("o_totalprice"))
        .join(li, Seq("o_orderkey"), "left")
        .select(col("o_orderkey"),
          (expr("CAST(round(o_totalprice * 100) AS BIGINT)") * 10000L)
            .as("header_x1e4"),
          coalesce(col("lines_x1e4"), lit(0L)).as("lines_x1e4"))
        .withColumn("diff_x1e4", abs(col("header_x1e4") - col("lines_x1e4")))
        .agg(count(lit(1)).cast("long").as("n_orders"),
          sum(when(col("diff_x1e4") === 0L, 1L).otherwise(0L))
            .cast("long").as("n_exact_match"),
          sum(when(col("diff_x1e4") > 0L &&
              col("diff_x1e4") * 100L <= col("header_x1e4"), 1L)
            .otherwise(0L)).cast("long").as("n_within_1pct"),
          sum(when(col("diff_x1e4") * 100L > col("header_x1e4"), 1L)
            .otherwise(0L)).cast("long").as("n_discrepant"),
          max("diff_x1e4").cast("long").as("max_diff_x1e4"))
    },

    // EXACT Kendall τ-b — the pair-concordance rank statistic, computed
    // WITHOUT the O(rows²) pair space OR a domain² join: collapse to the
    // JOINT value domain (x, y, count), then concordant/discordant mass
    // falls out of two partitioned prefix-sum windows over the Dx×Dy grid
    // (cumulative y-marginals of everything left of each x) — bounded by
    // the product of value cardinalities, not corpus size and not |joint|².
    // Tie corrections (n1, n2) from the marginal domains; everything
    // integer until the single closing double. Completes the rank family:
    // Spearman q247, U q246, KS q245
    "q248_kendall_tau" -> { (s, dir) =>
      val d38 = "decimal(38,0)"
      val docs = t(s, dir, "documents")
        .select(col("n_chars").as("x"),
          size(split(trim(col("text")), " ")).cast("long").as("y"))
      val joint = docs.groupBy("x", "y")
        .agg(count(lit(1)).cast("long").as("c")).localCheckpoint()
      // Concordant/discordant mass WITHOUT the joint×joint x1<x2 join:
      // on the Dx×Dy grid, M(x,y) = Σ_{x'<x} c(x',y) (per-y prefix over
      // x) is the cumulative y-marginal of everything strictly left of x,
      // and G_lt(x,y) = Σ_{y'<y} M(x,y') (per-x prefix over y) counts the
      // rows dominated by (x,y) — so conc = Σ c·G_lt and, with the
      // mirrored suffix, disc = Σ c·G_gt. Two PARTITIONED windows over a
      // value-domain-sized grid replace a |joint|²/2 pair join; every
      // intermediate ≤ n rows fits a long, the products sum in DECIMAL.
      val xDom = joint.select("x").distinct()
      val yDom = joint.select("y").distinct()
      val wM = Window.partitionBy("y").orderBy("x")
        .rowsBetween(Window.unboundedPreceding, -1)
      val wLt = Window.partitionBy("x").orderBy("y")
        .rowsBetween(Window.unboundedPreceding, -1)
      val wGt = Window.partitionBy("x").orderBy("y")
        .rowsBetween(1, Window.unboundedFollowing)
      val cd = xDom.crossJoin(yDom)
        .join(joint, Seq("x", "y"), "left")
        .withColumn("c0", coalesce(col("c"), lit(0L)))
        .withColumn("m", coalesce(sum("c0").over(wM), lit(0L)))
        .withColumn("g_lt", coalesce(sum("m").over(wLt), lit(0L)))
        .withColumn("g_gt", coalesce(sum("m").over(wGt), lit(0L)))
        .filter(col("c0") > 0L)
        .agg(sum(col("c0").cast(d38) * col("g_lt")).cast(d38).as("conc"),
          sum(col("c0").cast(d38) * col("g_gt")).cast(d38).as("disc"))
      def tiePairs(c: String): org.apache.spark.sql.Column =
        expr(s"CAST(sum(CAST($c AS DECIMAL(38,0)) * ($c - 1)) div 2 AS DECIMAL(38,0))")
      val nx = docs.groupBy("x").agg(count(lit(1)).cast("long").as("cx"))
        .agg(tiePairs("cx").as("n1"), sum("cx").cast("long").as("n"))
      val ny = docs.groupBy("y").agg(count(lit(1)).cast("long").as("cy"))
        .agg(tiePairs("cy").as("n2"))
      cd.crossJoin(broadcast(nx)).crossJoin(broadcast(ny))
        .withColumn("n0", expr(s"CAST(CAST(n AS $d38) * (n - 1) div 2 AS $d38)"))
        .select(col("n"),
          col("conc").cast("long").as("concordant"),
          col("disc").cast("long").as("discordant"),
          col("n1").cast("long").as("tie_pairs_x"),
          col("n2").cast("long").as("tie_pairs_y"),
          ((col("conc") - col("disc")).cast("double") /
           sqrt((col("n0") - col("n1")).cast("double") *
                (col("n0") - col("n2")).cast("double"))).as("kendall_tau_b"))
    },

    // EXACT tie-corrected SPEARMAN correlation — monotonic association
    // without Pearson's linearity assumption: each variable is replaced by
    // its DOUBLED tie-averaged rank (q246's integer trick, one collapsed-
    // domain pass per variable), then q182's exact integer moments give
    // Pearson-on-ranks — which IS tie-corrected Spearman — with one
    // deterministic double at the end. Here: does document length (chars)
    // track token count (an intentionally near-1 sanity pair with real
    // tie mass)
    "q247_spearman" -> { (s, dir) =>
      val d38 = "decimal(38,0)"
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("n_chars").as("x"),
          size(split(trim(col("text")), " ")).cast("long").as("y"))
        .localCheckpoint()
      def ranks(valCol: String, outCol: String): DataFrame = {
        val dom = docs.groupBy(valCol)
          .agg(count(lit(1)).cast("long").as("cnt"))
        val w = Window.orderBy(valCol)
          .rowsBetween(Window.unboundedPreceding, -1)
        dom.withColumn(outCol,
          lit(2L) * coalesce(sum("cnt").over(w), lit(0L)) + col("cnt") + 1L)
          .select(col(valCol), col(outCol))
      }
      val ranked = docs
        .join(broadcast(ranks("x", "rx")), "x")
        .join(broadcast(ranks("y", "ry")), "y")
      ranked.agg(
          count(lit(1)).cast("long").as("n"),
          sum("rx").cast("long").as("sx"),
          sum("ry").cast("long").as("sy"),
          sum(col("rx").cast(d38) * col("ry")).cast(d38).as("sxy"),
          sum(col("rx").cast(d38) * col("rx")).cast(d38).as("sxx"),
          sum(col("ry").cast(d38) * col("ry")).cast(d38).as("syy"))
        .select(col("n"), col("sx"), col("sy"),
          col("sxy").cast("long").as("sxy"),
          col("sxx").cast("long").as("sxx"),
          col("syy").cast("long").as("syy"),
          ((col("n").cast(d38) * col("sxy") -
            col("sx").cast(d38) * col("sy")).cast("double") /
           sqrt((col("n").cast(d38) * col("sxx") -
                 col("sx").cast(d38) * col("sx")).cast("double") *
                (col("n").cast(d38) * col("syy") -
                 col("sy").cast(d38) * col("sy")).cast("double")))
            .as("spearman_rho"))
    },

    // EXACT Mann–Whitney U (rank-sum) — q245's nonparametric companion for
    // "is one group's distribution shifted": tie-averaged ranks stay
    // integers by working in DOUBLED ranks (2·avg_rank = 2·cum_before +
    // tie_count + 1), so U is exact with full tie correction. Emits both
    // arms' 2U plus the identity verdict 2U_a + 2U_b = 2·n_a·n_b — a
    // self-check both engines replay. Same collapsed-domain single
    // ordered pass as q245
    "q246_mannwhitney_u" -> { (s, dir) =>
      val ev = t(s, dir, "events").filter(col("value").isNotNull &&
          col("event_type").isin("click", "error"))
        .select(col("event_type"),
          expr("CAST(floor(value * 1000000) AS BIGINT)").as("v"))
      val dom = ev.groupBy("v")
        .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
            .cast("long").as("ca"),
          sum(when(col("event_type") === "error", 1L).otherwise(0L))
            .cast("long").as("cb"))
      graft.data.RankStats.mannWhitneyFromCounts(dom, "v")
    },

    // LINK PREDICTION via the Resource-Allocation index — the graph-ML
    // training-signal generator (predict absent edges): for every
    // NON-adjacent pair, RA(u,v) = Σ_{w ∈ N(u)∩N(v)} 1/deg(w), kept exact
    // as Σ 1e6 div deg(w) integer ppm (RA beats Adamic-Adar here because
    // inverse-degree needs no cross-engine ln). Bridges are capped at
    // deg ≤ 50 (q146's hub discipline — a hub's common-neighbor fanout is
    // quadratic and its RA contribution negligible); candidate pairs come
    // from one self-join on the bridge vertex, existing edges anti-joined
    // away, global top-50 by (score, pair) via TakeOrdered — never a
    // 1-partition window
    "q258_link_prediction" -> { (s, dir) =>
      val edges = graft.operators.Graphs
        .coPurchaseEdges(t(s, dir, "lineitem"))
        .select(least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b"))
        .distinct().localCheckpoint()
      val nbrs = edges.select(col("a").as("w"), col("b").as("x"))
        .unionByName(edges.select(col("b").as("w"), col("a").as("x")))
      val deg = nbrs.groupBy("w").agg(count(lit(1)).cast("long").as("deg"))
      val bridge = nbrs.join(deg.filter(col("deg") <= 50L), "w")
      val cand = bridge.select(col("w"), col("x").as("u"), col("deg"))
        .join(bridge.select(col("w"), col("x").as("v")), "w")
        .filter(col("u") < col("v"))
        .groupBy("u", "v")
        .agg(count(lit(1)).cast("long").as("n_common"),
          sum(expr("1000000 div deg")).cast("long").as("ra_ppm"))
      cand.join(edges.toDF("u", "v"), Seq("u", "v"), "left_anti")
        .orderBy(col("ra_ppm").desc, col("u"), col("v")).limit(50)
        .select(col("u").as("src"), col("v").as("dst"), col("n_common"),
          col("ra_ppm"))
    },

    // HISTSTORE-BACKED KS — q245's 100 TB form: the two samples live as
    // fixed-bin per-day HistStore partials (built here as write + append,
    // the store's mergeability contract), a date-pruned |days|·|bins| fold
    // produces the two-sample bin counts, and the SAME RankStats kernel
    // computes D over ≤ 20 bins — the global value-domain window is gone;
    // the statistic is exact to the declared 25.0 bin width
    "q251_ks_binned_store" -> { (s, dir) =>
      import graft.data.{HistStore, RankStats}
      val ev = t(s, dir, "events").select(col("ts"), col("event_type"),
        col("value"))
      val nonce = java.util.UUID.randomUUID().toString
      val cut = lit("2024-01-15").cast("date")
      def store(typ: String): String = {
        val path = s"${System.getProperty("java.io.tmpdir")}/graft_q251_" +
          s"${typ}_${s.sparkContext.applicationId}_$nonce"
        val g = ev.filter(col("event_type") === typ)
        HistStore.writeDaily(g.filter(to_date(col("ts")) <= cut),
          "ts", "value", path, lo = 0.0, width = 25.0, nBins = 20)
        HistStore.appendDaily(g.filter(to_date(col("ts")) > cut),
          "ts", "value", path, lo = 0.0, width = 25.0, nBins = 20)
        path
      }
      RankStats.ksFromCounts(RankStats.countsFromStores(s,
        store("click"), store("error"),
        from = "2024-01-05", to = "2024-01-25"), "bin")
    },

    // HISTSTORE-BACKED MANN–WHITNEY U — q246's 100 TB form over the same
    // two stores: doubled-rank U from date-pruned bin-count folds, ties
    // collapsing whole bins (exact to bin width), identity verdict intact
    "q252_mwu_binned_store" -> { (s, dir) =>
      import graft.data.{HistStore, RankStats}
      val ev = t(s, dir, "events").select(col("ts"), col("event_type"),
        col("value"))
      val nonce = java.util.UUID.randomUUID().toString
      def store(typ: String): String = {
        val path = s"${System.getProperty("java.io.tmpdir")}/graft_q252_" +
          s"${typ}_${s.sparkContext.applicationId}_$nonce"
        HistStore.writeDaily(ev.filter(col("event_type") === typ),
          "ts", "value", path, lo = 0.0, width = 25.0, nBins = 20)
        path
      }
      RankStats.mannWhitneyFromCounts(RankStats.countsFromStores(s,
        store("click"), store("error"),
        from = "2024-01-05", to = "2024-01-25"), "bin")
    },

    // IVM with RETRACTIONS — the piece q241 (insert-only joins) and q147
    // (append-only partials) both leave open: a deletion batch retracts
    // from a subtractable aggregate view (count, integer sum) as NEGATIVE
    // partials, and base + inserts − deletes must equal the direct
    // recompute over the surviving rows exactly — integer partials make
    // the subtraction lossless, which double sums could never promise.
    // Three group-sized partial aggs, one fold; no history rescan
    "q242_ivm_retract" -> { (s, dir) =>
      val ev = t(s, dir, "events").filter(col("value").isNotNull)
        .select(col("event_id"), col("event_type"),
          expr("CAST(floor(value * 1000000) AS BIGINT)").as("v"))
      val base = ev.filter(col("event_id") % 5 =!= 0)
      val ins = ev.filter(col("event_id") % 5 === 0)
      val del = base.filter(col("event_id") % 7 === 0)
      def part(df: DataFrame, sign: Long): DataFrame =
        df.groupBy("event_type")
          .agg((count(lit(1)) * sign).cast("long").as("dn"),
            (sum("v") * sign).cast("long").as("dv"))
      part(base, 1L).unionByName(part(ins, 1L)).unionByName(part(del, -1L))
        .groupBy("event_type")
        .agg(sum("dn").cast("long").as("n"),
          sum("dv").cast("long").as("sum_v"))
    },

    // INCREMENTAL VIEW MAINTENANCE for a join — the delta algebra that
    // keeps a materialized join view current WITHOUT re-joining history:
    // for insert batches ΔA, ΔB the view grows by exactly
    // ΔA⋈B_old ∪ A_old⋈ΔB ∪ ΔA⋈ΔB, and the union with the old view must
    // reproduce the full recompute bit-for-bit — the invariant this query
    // emits and the oracle replays as the plain join. Per batch only
    // delta-sized join inputs touch the shuffle; history joins history
    // exactly once, ever
    "q241_ivm_join" -> { (s, dir) =>
      val orders = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val cust = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"))
      val aOld = orders.filter(col("o_orderkey") % 4 =!= 0)
      val dA = orders.filter(col("o_orderkey") % 4 === 0)
      val bOld = cust.filter(col("c_custkey") % 5 =!= 0)
      val dB = cust.filter(col("c_custkey") % 5 === 0)
      def j(a: DataFrame, b: DataFrame): DataFrame =
        a.join(b, col("o_custkey") === col("c_custkey"))
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
            col("c_mktsegment"))
      j(aOld, bOld)
        .unionByName(j(dA, bOld))
        .unionByName(j(aOld, dB))
        .unionByName(j(dA, dB))
    },

    // Z-ORDER (Morton) clustering layout — the lakehouse locality
    // technique: interleave the bits of two columns into one sort key, so
    // range-sharding on IT keeps BOTH columns' ranges tight per shard and
    // a predicate on EITHER column prunes. The manifest carries per-shard
    // min/max of x AND y, and the verdicts check a fixed rectangle
    // predicate (x<100 ∧ y<100) can skip shards on either bound — which a
    // single-column sort could never promise for the second column. The
    // 10-bit interleave is an unrolled integer expression both engines
    // evaluate identically; sharding reuses q180's deterministic
    // boundaries
    "q240_zorder_layout" -> { (s, dir) =>
      val morton = (0 until 10).map { k =>
        s"(((x >> $k) & 1) << ${2 * k}) + (((y >> $k) & 1) << ${2 * k + 1})"
      }.mkString(" + ")
      val pts = t(s, dir, "orders")
        .select(col("o_orderkey").as("id"),
          (col("o_orderkey") * 37 % 500).as("x"),
          (col("o_custkey") * 73 % 500).as("y"))
        .withColumn("z", expr(s"CAST($morton AS BIGINT)"))
      val assigned = graft.data.RangeShard.assign(pts, "z",
        graft.data.RangeShard.boundaries(pts, "z", 16))
      assigned.groupBy("shard")
        .agg(count(lit(1)).cast("long").as("n"),
          min("x").cast("long").as("min_x"), max("x").cast("long").as("max_x"),
          min("y").cast("long").as("min_y"), max("y").cast("long").as("max_y"))
        .withColumn("skip_for_x_lt_100", col("min_x") >= 100L)
        .withColumn("skip_for_y_lt_100", col("min_y") >= 100L)
    },

    // Week-over-week change — the dashboard deltas: weekly volumes per
    // type, each week's change vs the previous week in signed ppm
    // (cross-multiplied integer division — both engines truncate toward
    // zero, q192's verified contract — NULL for the first week). One hash
    // agg + a lag over the week-collapsed frame
    "q237_wow_change" -> { (s, dir) =>
      val d38 = "decimal(38,0)"
      val weekly = t(s, dir, "events")
        .groupBy(col("event_type"),
          date_trunc("week", to_date(col("ts"))).cast("date").as("week"))
        .agg(count(lit(1)).cast("long").as("n"))
      val w = Window.partitionBy("event_type").orderBy("week")
      weekly.withColumn("prev_n", lag(col("n"), 1).over(w))
        .select(col("event_type"), col("week"), col("n"),
          col("prev_n").cast("long").as("prev_n"),
          expr(s"""CAST((CAST(n - prev_n AS $d38) * 1000000)
                   div nullif(prev_n, 0) AS BIGINT)""").as("wow_change_ppm"))
    },

    // GRID-BUCKETED SPATIAL JOIN — the scalable proximity-join recipe
    // (geohash/S2 cells reduced to their essence): points land in unit
    // grid cells, each point replicates into its 3×3 neighborhood (a hard
    // 9× fan-out), candidates meet in a cell-keyed equi-join, and the
    // exact distance predicate filters — never an all-pairs cross join.
    // Points are synthesized from order keys (integer coordinates so the
    // squared distance is exact); the oracle replays the whole cell
    // pipeline. The q127 binned-interval discipline in two dimensions
    "q235_spatial_grid_join" -> { (s, dir) =>
      val pts = t(s, dir, "orders")
        .filter(col("o_orderkey") <= 3000)
        .select(col("o_orderkey").as("id"),
          (col("o_orderkey") * 37 % 500).as("x"),
          (col("o_custkey") * 73 % 500).as("y"))
        .localCheckpoint()
      val cellSize = 10L
      val withCell = pts
        .withColumn("cx", expr(s"x div $cellSize"))
        .withColumn("cy", expr(s"y div $cellSize"))
      val probes = withCell.select(col("id").as("id_b"),
          col("x").as("xb"), col("y").as("yb"),
          explode(expr("array(-1, 0, 1)")).as("dx"),
          col("cx"), col("cy"))
        .select(col("id_b"), col("xb"), col("yb"),
          (col("cx") + col("dx")).as("cx"),
          explode(expr("array(-1, 0, 1)")).as("dy"), col("cy"))
        .select(col("id_b"), col("xb"), col("yb"), col("cx"),
          (col("cy") + col("dy")).as("cy"))
      // each qualifying pair meets EXACTLY once: the left point's single
      // cell matches exactly one of the right point's 9 distinct probe
      // cells, and id < id_b keeps one orientation — no dedup needed
      withCell.join(probes, Seq("cx", "cy"))
        .filter(col("id") < col("id_b"))
        .withColumn("d2",
          (col("x") - col("xb")) * (col("x") - col("xb")) +
          (col("y") - col("yb")) * (col("y") - col("yb")))
        .filter(col("d2") <= 100L)
        .select(col("id").as("id_a"), col("id_b"),
          col("d2").cast("long").as("d2"))
    },

    // GROWTH metrics — the DAU/WAU dashboard row: per day, distinct active
    // users, trailing-7-day actives (exact — the bounded day-range join,
    // q195's exact-side recipe), RETURNING users (active today ∧ active in
    // the prior 7 days, the retention numerator), and the DAU/WAU
    // stickiness ratio in integer thousandths. Day-range joins are
    // calendar-bounded (≤ 7 days replicated), every number exact
    "q233_growth_metrics" -> { (s, dir) =>
      val d38 = "decimal(38,0)"
      val ud = t(s, dir, "events")
        .select(to_date(col("ts")).as("day"), col("user_id"))
        .distinct().localCheckpoint()
      val days = ud.select("day").distinct()
      val dau = ud.groupBy("day")
        .agg(countDistinct("user_id").cast("long").as("dau"))
      val wau = days.join(ud.toDF("d2", "user_id"),
          col("d2").between(date_sub(col("day"), 6), col("day")))
        .groupBy("day")
        .agg(countDistinct("user_id").cast("long").as("wau"))
      val ret = ud.join(ud.toDF("d2", "u2"),
          col("u2") === col("user_id") &&
          col("d2").between(date_sub(col("day"), 7), date_sub(col("day"), 1)),
          "left_semi")
        .groupBy("day")
        .agg(countDistinct("user_id").cast("long").as("returning"))
      dau.join(wau, "day").join(ret, Seq("day"), "left")
        .select(col("day"), col("dau"), col("wau"),
          coalesce(col("returning"), lit(0L)).as("returning"),
          expr(s"""CAST((CAST(coalesce(returning, 0) AS $d38) * 1000000)
                   div dau AS BIGINT)""").as("returning_ppm"),
          expr(s"CAST((CAST(dau AS $d38) * 1000) div wau AS BIGINT)")
            .as("stickiness_x1000"))
    },

    // Rate-limit WHAT-IF audit — "how many events would a 10-per-minute
    // per-user throttle have dropped": per event, the count of the user's
    // events in the trailing 60 s via a RANGE frame over event-time
    // microseconds (tie rows are peers — deterministic), throttled when
    // the window exceeds the quota. The abuse-ops sizing companion to
    // q205's cadence screen; one range-frame window + one hash agg
    "q222_rate_limit_audit" -> { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy("ts_us")
        .rangeBetween(-60L * 1000000L, 0L)
      t(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("ts_us"))
        .withColumn("n_in_window", count(lit(1)).over(w).cast("long"))
        .groupBy("event_type")
        .agg(count(lit(1)).cast("long").as("n_events"),
          sum(when(col("n_in_window") > 10L, 1L).otherwise(0L))
            .cast("long").as("n_throttled"),
          max("n_in_window").cast("long").as("max_burst"))
    },

    // Bounded-hop shortest paths over the co-purchase graph — BFS layers
    // from the "promoted parts" seed set (partkey % 100 = 0): proximity /
    // blast-radius analysis, the graph tier's reachability member. Fixed
    // 4-round budget (the contract — NULL beyond the radius), integer min
    // relaxation ⟹ bit-identical on any partitioning; the oracle unrolls
    // the exact 4 rounds as chained CTEs (the q125 recipe)
    "q218_sssp_hops" -> { (s, dir) =>
      val edges = graft.operators.Graphs.coPurchaseEdges(t(s, dir, "lineitem"))
      val seeds = t(s, dir, "part")
        .filter(col("p_partkey") % 100 === 0)
        .select(col("p_partkey").as("node"))
      graft.operators.Sssp.hopDistances(edges, seeds, rounds = 4)
    },

    // Item-to-item RECOMMENDATIONS — the end-product composition of the
    // graph tier: each customer's top-3 unseen parts scored by summed
    // co-purchase multiplicity over their purchase history ("customers who
    // bought X also bought"). Seen set frozen once (it feeds the scoring
    // join AND the unseen anti-join), candidate fan-out bounded by
    // history × co-degree (q146's maxDf cap is the production guard for
    // hot items), top-3 via a per-customer window over the already-
    // aggregated candidate table
    "q219_recommendations" -> { (s, dir) =>
      val li = t(s, dir, "lineitem").select("l_orderkey", "l_partkey")
      val ords = t(s, dir, "orders")
        .select(col("o_orderkey").as("l_orderkey"), col("o_custkey"))
      val seen = li.join(ords, "l_orderkey")
        .select(col("o_custkey"), col("l_partkey")).distinct().localCheckpoint()
      // the production hot-item guard, IN the query: only each item's
      // top-20 co-items (by multiplicity, id tiebreak) enter the scoring
      // join, so candidate fan-out is a hard history×20 — without the cap
      // the dense co-purchase graph makes the join quadratic-ish in order
      // size (measured: 28.6 s → 8.8 s at sf0.1)
      val wAll = graft.operators.Graphs.coPurchaseEdges(li)
        .groupBy("src", "dst").agg(count(lit(1)).cast("long").as("co_n"))
      val cw = Window.partitionBy("src")
        .orderBy(col("co_n").desc, col("dst"))
      val w = wAll.withColumn("__r", row_number().over(cw))
        .filter(col("__r") <= 20).drop("__r")
      val scored = seen.join(w, seen("l_partkey") === w("src"))
        .groupBy(col("o_custkey"), col("dst").as("rec_part"))
        .agg(sum("co_n").cast("long").as("score"))
      val unseen = scored.join(seen.toDF("o_custkey", "rec_part"),
        Seq("o_custkey", "rec_part"), "left_anti")
      val rw = Window.partitionBy("o_custkey")
        .orderBy(col("score").desc, col("rec_part"))
      unseen.withColumn("rec_rank", row_number().over(rw).cast("int"))
        .filter(col("rec_rank") <= 3)
    },

    // Top user journeys — q149's first-order transitions extended to
    // PATHS: the 20 most common within-user event-type trigrams, the
    // product-analytics "sankey" feed. Two lead windows over the per-user
    // total order (one shared sort), a shrinking trigram hash agg, and
    // TakeOrdered for the top slice — k rows to the driver merge, never a
    // global sort of the path space
    "q217_top_paths" -> { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      val tri = t(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("ts_us"))
        .withColumn("e2", lead(col("event_type"), 1).over(w))
        .withColumn("e3", lead(col("event_type"), 2).over(w))
        .filter(col("e2").isNotNull && col("e3").isNotNull)
        .groupBy(col("event_type").as("step1"), col("e2").as("step2"),
          col("e3").as("step3"))
        .agg(count(lit(1)).cast("long").as("n_paths"))
      tri.orderBy(col("n_paths").desc, col("step1"), col("step2"),
          col("step3")).limit(20)
        .withColumn("path_rank", row_number().over(
          Window.orderBy(col("n_paths").desc, col("step1"), col("step2"),
            col("step3"))).cast("int"))
    },

    // ORDERED FUNNEL (view → click → purchase): per-user chained earliest
    // times — t2 is the earliest click STRICTLY AFTER that user's earliest
    // view, t3 the earliest purchase strictly after t2 (the sequential
    // semantics a conditional-min groupBy gets wrong). Distinct from q96,
    // which is per-CLICK as-of conversion inside a 1 h window — this is
    // the per-USER multi-stage reach count. Each stage is one
    // user-keyed agg + one user-keyed join, so all three shuffles share the
    // key and stage frames are user-dimension-sized, never event-sized; the
    // final surface collapses to ONE row of exact counts + ppm conversions
    // (cross-multiplied div — no float ratio on the hashed frame).
    "q331_funnel" -> { (s, dir) =>
      val ev = t(s, dir, "events").select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
      val s1 = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts_us").as("t1"))
      val s2 = ev.filter(col("event_type") === "click").join(s1, "user_id")
        .filter(col("ts_us") > col("t1"))
        .groupBy("user_id").agg(min("ts_us").as("t2"))
      val s3 = ev.filter(col("event_type") === "purchase").join(s2, "user_id")
        .filter(col("ts_us") > col("t2"))
        .groupBy("user_id").agg(min("ts_us").as("t3"))
      val n1 = s1.agg(count(lit(1)).cast("long").as("n_view"))
      val n2 = s2.agg(count(lit(1)).cast("long").as("n_click"))
      val n3 = s3.agg(count(lit(1)).cast("long").as("n_purchase"))
      // exact µs lag sums over fully-converted users pin the CHAINED mins
      // themselves (the counts alone can't distinguish a wrong t2/t3)
      val lags = s3.join(s2, "user_id").join(s1, "user_id").agg(
        sum(col("t2") - col("t1")).cast("long").as("sum_lag12_us"),
        sum(col("t3") - col("t2")).cast("long").as("sum_lag23_us"))
      n1.crossJoin(n2).crossJoin(n3).crossJoin(lags).select(
        col("n_view"), col("n_click"), col("n_purchase"),
        col("sum_lag12_us"), col("sum_lag23_us"),
        expr("""CAST(CASE WHEN n_view = 0 THEN NULL
                ELSE (n_click * 1000000) div n_view END AS BIGINT)""")
          .as("conv12_ppm"),
        expr("""CAST(CASE WHEN n_click = 0 THEN NULL
                ELSE (n_purchase * 1000000) div n_click END AS BIGINT)""")
          .as("conv23_ppm"),
        expr("""CAST(CASE WHEN n_view = 0 THEN NULL
                ELSE (n_purchase * 1000000) div n_view END AS BIGINT)""")
          .as("conv13_ppm"))
    },

    // WEEKLY COHORT RETENTION MATRIX: cohort = the user's first active
    // epoch-week (integer div of epoch-micros — no calendar/timezone rules
    // on the hashed surface), offset = active week − cohort week, cell =
    // distinct active users. The event stream collapses to distinct
    // (user, week) FIRST (the only event-sized shuffle); everything after is
    // user-dimension-sized, and the weeks×weeks matrix joins its cohort
    // sizes broadcast. retention_ppm is an exact integer quotient.
    "q332_cohort_retention" -> { (s, dir) =>
      val act = t(s, dir, "events")
        .select(col("user_id"),
          expr("unix_micros(ts) div 604800000000").cast("long").as("week"))
        .distinct()
      val first = act.groupBy("user_id").agg(min("week").as("cohort_w"))
      val size = first.groupBy("cohort_w")
        .agg(count(lit(1)).cast("long").as("n_cohort"))
      act.join(first, "user_id")
        .select(col("cohort_w"),
          (col("week") - col("cohort_w")).cast("long").as("offset_w"))
        .groupBy("cohort_w", "offset_w")
        .agg(count(lit(1)).cast("long").as("n_active"))
        .join(broadcast(size), "cohort_w")
        .select(col("cohort_w").cast("long").as("cohort_w"), col("offset_w"),
          col("n_active"), col("n_cohort"),
          expr("CAST((n_active * 1000000) div n_cohort AS BIGINT)")
            .as("retention_ppm"))
    },

    // MARKOV TRANSITION MATRIX over per-user event sequences: one lead
    // window on the per-user total order (ts, event_id — explicit tiebreak
    // keeps lead deterministic under timestamp ties), a charset²-bounded
    // pair hash agg, and row-normalized probabilities as exact integer ppm
    // against broadcast per-prev totals. One event-sized sort+shuffle total.
    "q333_markov_transitions" -> { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      val pairs = t(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("ts_us"))
        .select(col("event_type").as("prev"),
          lead(col("event_type"), 1).over(w).as("nxt"))
        .filter(col("nxt").isNotNull)
      val counts = pairs.groupBy("prev", "nxt")
        .agg(count(lit(1)).cast("long").as("n"))
      val tot = counts.groupBy("prev").agg(sum("n").cast("long").as("n_prev"))
      counts.join(broadcast(tot), "prev")
        .select(col("prev"), col("nxt"), col("n"), col("n_prev"),
          expr("CAST((n * 1000000) div n_prev AS BIGINT)").as("p_ppm"))
    },

    // W2 complete: the reference's tie-aware top-n methods
    // (spark_indexing_utils.py:158-196) — rank (at_least), dense_rank
    // (at_least_n_different_order_values), running count (at_most); ties on
    // l_quantity make the three genuinely differ. row_number (exactly) is
    // covered by q09.
    "q51_topn_methods" -> { (s, dir) =>
      val li = t(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity")
      Seq("at_least" -> "at_least",
          "at_least_n_different_order_values" -> "dense",
          "at_most" -> "at_most").map { case (m, tag) =>
        TopN.takeTopNPerGroup(li, n = 2, groupCols = Seq("l_orderkey"),
            orderBy = Seq(col("l_quantity").desc), method = m, rankCol = "grp_rank")
          .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
                  col("grp_rank").cast("long").as("grp_rank"), lit(tag).as("method"))
      }.reduce(_ union _)
    })

  /** q125's oracle: the five fixed-point steps unrolled as chained CTEs —
    * generated so the Spark operator and the SQL stay iteration-for-
    * iteration identical (same ppm constants, same integer division).
    */
  // seeded LPA replay: synchronous rounds unrolled as generated CTEs (the
  // pagerank recipe); winner = row_number over (votes desc, label asc)
  private val labelPropSql: String = {
    val rounds = (1 to 3).map { i =>
      s"""v$i AS (
            SELECT e.d AS node, lb.label AS vote, count(*) AS n
            FROM e JOIN l${i - 1} lb ON lb.node = e.s
            WHERE lb.label IS NOT NULL GROUP BY e.d, lb.label),
          w$i AS (
            SELECT node, vote AS winner FROM (
              SELECT node, vote,
                     row_number() OVER (PARTITION BY node
                          ORDER BY n DESC, vote) AS rn
              FROM v$i) WHERE rn = 1),
          l$i AS (
            SELECT l.node,
                   CASE WHEN l.is_seed THEN l.label
                        ELSE coalesce(w.winner, l.label) END AS label,
                   l.is_seed
            FROM l${i - 1} l LEFT JOIN w$i w ON w.node = l.node)"""
    }.mkString(",\n")
    s"""WITH pairs AS (
          SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
          FROM lineitem a JOIN lineitem b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
        e AS (SELECT src AS s, dst AS d FROM pairs),
        nodes AS (SELECT DISTINCT s AS node FROM e),
        seeds AS (SELECT p_partkey AS node, p_brand AS seed_label
                  FROM part WHERE p_partkey % 5 = 0),
        l0 AS (
          SELECT n.node, s.seed_label AS label,
                 s.seed_label IS NOT NULL AS is_seed
          FROM nodes n LEFT JOIN seeds s ON s.node = n.node),
        $rounds
        SELECT node, label, is_seed FROM l3"""
  }

  /** q150's oracle: the synchronous peel unrolled as generated CTEs (the
    * q125/q148 recipe). 12 rounds >= the observed 6-round convergence; at
    * the fixpoint each further round reproduces the same alive set, so the
    * unroll depth only needs to be an upper bound.
    */
  private val kcoreSql: String = {
    val rounds = (1 to 12).map { i =>
      s"""a$i AS MATERIALIZED (
            SELECT e.s AS node FROM e
            JOIN a${i - 1} x ON x.node = e.s
            JOIN a${i - 1} y ON y.node = e.d
            GROUP BY e.s HAVING count(*) >= 80)"""
    }.mkString(",\n")
    s"""WITH e AS MATERIALIZED (
          SELECT DISTINCT a.l_partkey AS s, b.l_partkey AS d
          FROM lineitem a JOIN lineitem b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
        nodes AS MATERIALIZED (SELECT DISTINCT s AS node FROM e),
        a0 AS (SELECT node FROM nodes),
        $rounds,
        deg AS (
          SELECT e.s AS node, CAST(count(*) AS BIGINT) AS core_deg
          FROM e
          JOIN a12 x ON x.node = e.s
          JOIN a12 y ON y.node = e.d
          GROUP BY e.s)
        SELECT n.node, d.node IS NOT NULL AS in_core, d.core_deg
        FROM nodes n LEFT JOIN deg d ON d.node = n.node"""
  }

  /** q218's oracle: the four synchronous relaxation rounds unrolled as
    * chained CTEs — iteration-for-iteration identical to
    * [[graft.operators.Sssp.hopDistances]] (the q125 recipe).
    */
  private val ssspSql: String = {
    val rounds = (1 to 4).map { i =>
      s"""r$i AS (
            SELECT e.dst AS node, min(d.dist + 1) AS cand
            FROM e JOIN d${i - 1} d ON d.node = e.src
            WHERE d.dist IS NOT NULL GROUP BY 1),
          d$i AS (
            SELECT d.node,
                   least(coalesce(d.dist, r.cand), coalesce(r.cand, d.dist))
                     AS dist
            FROM d${i - 1} d LEFT JOIN r$i r ON r.node = d.node)"""
    }.mkString(",\n")
    s"""WITH e AS (
          SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
          FROM lineitem a JOIN lineitem b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
        nodes AS (SELECT DISTINCT src AS node FROM e
                  UNION SELECT DISTINCT dst FROM e),
        d0 AS (
          SELECT node, CASE WHEN node % 100 = 0 THEN CAST(0 AS BIGINT) END
                 AS dist
          FROM nodes),
        $rounds
        SELECT node, CAST(dist AS BIGINT) AS dist FROM d4"""
  }

  /** q240's oracle — the SAME unrolled 10-bit interleave and the q180
    * quantile-cut recipe, generated so Spark and SQL cannot drift.
    */
  private val zorderSql: String = {
    val morton = (0 until 10).map { k =>
      s"(((x >> $k) & 1) << ${2 * k}) + (((y >> $k) & 1) << ${2 * k + 1})"
    }.mkString(" + ")
    val qs = (1 until 16).map(i => s"${i.toDouble / 16}").mkString(", ")
    s"""WITH pts AS (
          SELECT o_orderkey AS id,
                 (o_orderkey * 37) % 500 AS x,
                 (o_custkey * 73) % 500 AS y
          FROM orders),
        pz AS (SELECT *, CAST($morton AS BIGINT) AS z FROM pts),
        b AS (SELECT quantile_cont(z, [$qs]) AS qs FROM pz),
        a AS (
          SELECT pz.x, pz.y,
                 CAST(len(list_filter(b.qs, q -> z > floor(q))) AS INT)
                   AS shard
          FROM pz, b)
        SELECT shard, CAST(count(*) AS BIGINT) AS n,
               CAST(min(x) AS BIGINT) AS min_x,
               CAST(max(x) AS BIGINT) AS max_x,
               CAST(min(y) AS BIGINT) AS min_y,
               CAST(max(y) AS BIGINT) AS max_y,
               min(x) >= 100 AS skip_for_x_lt_100,
               min(y) >= 100 AS skip_for_y_lt_100
        FROM a GROUP BY shard"""
  }

  private val pagerankSql: String = {
    val iters = (1 to 5).map { i =>
      s"""inc$i AS (
            SELECT e.dst AS node, sum(r.rank_fp // e.outdeg) AS inc
            FROM e JOIN r${i - 1} r ON r.node = e.src GROUP BY e.dst),
          r$i AS (
            SELECT n.node,
                   CAST(150000 + (850000 * coalesce(i.inc, 0)) // 1000000
                        AS BIGINT) AS rank_fp
            FROM nodes n LEFT JOIN inc$i i ON n.node = i.node)"""
    }.mkString(",\n")
    s"""WITH pairs AS (
          SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
          FROM lineitem a JOIN lineitem b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
        deg AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg
                FROM pairs GROUP BY src),
        e AS (SELECT p.src, p.dst, d.outdeg FROM pairs p JOIN deg d USING (src)),
        nodes AS (SELECT DISTINCT src AS node FROM pairs
                  UNION SELECT DISTINCT dst FROM pairs),
        r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank_fp FROM nodes),
        $iters
        SELECT node AS part_key, rank_fp FROM r5"""
  }

  /** q430: the q125 unrolled replay with the restart mass gated by the
    * seed flag.
    */
  private val pprSql: String = {
    val iters = (1 to 5).map { i =>
      s"""inc$i AS (
            SELECT e.dst AS node, sum(r.rank_fp // e.outdeg) AS inc
            FROM e JOIN r${i - 1} r ON r.node = e.src GROUP BY e.dst),
          r$i AS (
            SELECT n.node,
                   CAST(n.is_seed * 150000 +
                        (850000 * coalesce(i.inc, 0)) // 1000000
                        AS BIGINT) AS rank_fp
            FROM nodes n LEFT JOIN inc$i i ON n.node = i.node)"""
    }.mkString(",\n")
    s"""WITH pairs AS (
          SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
          FROM lineitem a JOIN lineitem b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
        deg AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg
                FROM pairs GROUP BY src),
        e AS (SELECT p.src, p.dst, d.outdeg FROM pairs p JOIN deg d USING (src)),
        sd AS (SELECT DISTINCT p_partkey AS node FROM part
               WHERE p_partkey % 100 = 0),
        nodes AS (SELECT nn.node,
                         CASE WHEN sd.node IS NULL THEN 0 ELSE 1 END AS is_seed
                  FROM (SELECT DISTINCT src AS node FROM pairs
                        UNION SELECT DISTINCT dst FROM pairs) nn
                  LEFT JOIN sd ON sd.node = nn.node),
        r0 AS (SELECT node, CAST(is_seed * 1000000 AS BIGINT) AS rank_fp
               FROM nodes),
        $iters
        SELECT node AS part_key, rank_fp FROM r5"""
  }

  val oracleSql: Map[String, String] = Map(
    "q430_personalized_pagerank" -> pprSql,
    "q217_top_paths" ->
      """WITH ev AS (
           SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
           FROM events),
         tri AS (
           SELECT event_type AS step1,
                  lead(event_type, 1) OVER (PARTITION BY user_id
                    ORDER BY ts_us, event_id) AS step2,
                  lead(event_type, 2) OVER (PARTITION BY user_id
                    ORDER BY ts_us, event_id) AS step3
           FROM ev),
         agg AS (
           SELECT step1, step2, step3, CAST(count(*) AS BIGINT) AS n_paths
           FROM tri WHERE step2 IS NOT NULL AND step3 IS NOT NULL
           GROUP BY 1, 2, 3)
         SELECT step1, step2, step3, n_paths,
                CAST(row_number() OVER (ORDER BY n_paths DESC, step1, step2,
                     step3) AS INT) AS path_rank
         FROM agg QUALIFY path_rank <= 20""",
    "q214_slo_burn" ->
      """WITH daily AS (
           SELECT CAST(ts AS DATE) AS day,
                  CAST(count(*) AS BIGINT) AS n_events,
                  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                       AS BIGINT) AS n_errors
           FROM events GROUP BY 1),
         r AS (
           SELECT day, n_events, n_errors,
                  CAST(sum(n_events) OVER (ORDER BY day
                       ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)
                    AS n7_events,
                  CAST(sum(n_errors) OVER (ORDER BY day
                       ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)
                    AS n7_errors
           FROM daily)
         SELECT day, n_events, n_errors,
                CAST((CAST(n_errors AS HUGEINT) * 1000000) // n_events
                     AS BIGINT) AS err_ppm,
                CAST((CAST(n_errors AS HUGEINT) * 1000000 * 1000) //
                     (CAST(n_events AS HUGEINT) * 250000) AS BIGINT)
                  AS burn_x1000,
                CAST((CAST(n7_errors AS HUGEINT) * 1000000 * 1000) //
                     (CAST(n7_events AS HUGEINT) * 250000) AS BIGINT)
                  AS burn_7d_x1000,
                (CAST(n7_errors AS HUGEINT) * 1000000 * 1000) //
                  (CAST(n7_events AS HUGEINT) * 250000) > 1000 AS alert
         FROM r""",
    "q209_linear_attribution" ->
      """WITH ev AS (
           SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us
           FROM events),
         c AS (SELECT user_id, event_id AS click_id, ts_us AS cts FROM ev
               WHERE event_type = 'click'),
         p AS (SELECT user_id, event_id AS purchase_id, ts_us AS pts FROM ev
               WHERE event_type = 'purchase'),
         j AS (
           SELECT p.user_id, p.purchase_id, c.click_id
           FROM p JOIN c ON c.user_id = p.user_id
             AND c.cts < p.pts AND c.cts >= p.pts - 86400000000)
         SELECT user_id, purchase_id, click_id,
                CAST(count(*) OVER (PARTITION BY purchase_id) AS BIGINT)
                  AS n_clicks,
                CAST(1000000 // (count(*) OVER (PARTITION BY purchase_id))
                     AS BIGINT) AS credit_ppm
         FROM j""",
    "q205_bot_screen" ->
      """WITH ev AS (
           SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events),
         g AS (
           SELECT user_id,
                  ts_us - lag(ts_us) OVER (PARTITION BY user_id
                    ORDER BY ts_us, event_id) AS gap_us,
                  ts_us
           FROM ev),
         a AS (
           SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
                  CAST(floor(quantile_cont(gap_us, 0.5)) AS BIGINT)
                    AS median_gap_us,
                  CAST(max(ts_us) - min(ts_us) AS BIGINT) AS span_us
           FROM g GROUP BY 1)
         SELECT user_id, n_events, median_gap_us, span_us,
                CAST((CAST(n_events AS HUGEINT) * 3600000000 * 1000) //
                     nullif(span_us, 0) AS BIGINT) AS rate_per_hour_x1000,
                (median_gap_us < 21600000000 AND n_events >= 50)
                  AS is_suspect
         FROM a""",
    "q206_transition_latency" ->
      """WITH ev AS (
           SELECT event_id, user_id, event_type, ts, epoch_us(ts) AS ts_us
           FROM events),
         v AS (SELECT event_id, user_id, ts_us, CAST(ts AS DATE) AS day
               FROM ev WHERE event_type = 'view'),
         c AS (SELECT DISTINCT user_id, ts_us AS cts FROM ev
               WHERE event_type = 'click'),
         j AS (
           SELECT v.day, min(c.cts) - v.ts_us AS lat_us
           FROM v JOIN c ON c.user_id = v.user_id AND c.cts >= v.ts_us
           GROUP BY v.day, v.event_id, v.ts_us)
         SELECT day, CAST(count(*) AS BIGINT) AS n_transitions,
                CAST(floor(quantile_cont(lat_us, 0.5)) AS BIGINT) AS p50_us,
                CAST(floor(quantile_cont(lat_us, 0.9)) AS BIGINT) AS p90_us,
                CAST(max(lat_us) AS BIGINT) AS max_us
         FROM j GROUP BY day""",
    "q197_pareto_front" ->
      """WITH parts AS (
           SELECT p_partkey, p_size,
                  CAST(floor(p_retailprice * 100) AS BIGINT) AS price_c
           FROM part),
         pp AS (SELECT price_c, max(p_size) AS m FROM parts GROUP BY 1),
         cm AS (
           SELECT price_c, m,
                  max(m) OVER (ORDER BY price_c
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    AS cummax_prev
           FROM pp)
         SELECT p.p_partkey, p.price_c, p.p_size,
                (p.p_size = c.m AND
                 (c.cummax_prev IS NULL OR c.cummax_prev < p.p_size))
                  AS on_front
         FROM parts p JOIN cm c USING (price_c)""",
    "q196_funnel3" ->
      """WITH ev AS (
           SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us
           FROM events),
         v AS (SELECT event_id, user_id, ts_us FROM ev
               WHERE event_type = 'view'),
         c AS (SELECT DISTINCT user_id, ts_us AS cts FROM ev
               WHERE event_type = 'click'),
         p AS (SELECT DISTINCT user_id, ts_us AS pts FROM ev
               WHERE event_type = 'purchase'),
         s1 AS (
           SELECT v.user_id, v.event_id, v.ts_us, min(c.cts) AS next_c
           FROM v LEFT JOIN c
             ON c.user_id = v.user_id AND c.cts >= v.ts_us
           GROUP BY 1, 2, 3),
         s1f AS (
           SELECT *, (next_c IS NOT NULL AND next_c - ts_us <= 3600000000)
                  AS step2
           FROM s1),
         s2 AS (
           SELECT f.user_id, f.event_id, f.next_c AS cts, min(p.pts) AS next_p
           FROM s1f f LEFT JOIN p
             ON p.user_id = f.user_id AND p.pts >= f.next_c
           WHERE f.step2
           GROUP BY 1, 2, 3),
         a1 AS (
           SELECT user_id, CAST(count(*) AS BIGINT) AS n_views,
                  CAST(sum(CASE WHEN step2 THEN 1 ELSE 0 END) AS BIGINT)
                    AS n_step2
           FROM s1f GROUP BY 1),
         a2 AS (
           SELECT user_id,
                  CAST(sum(CASE WHEN next_p IS NOT NULL
                                 AND next_p - cts <= 3600000000
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_step3
           FROM s2 GROUP BY 1)
         SELECT a1.user_id, a1.n_views, a1.n_step2,
                CAST(coalesce(a2.n_step3, 0) AS BIGINT) AS n_step3
         FROM a1 LEFT JOIN a2 USING (user_id)""",
    "q191_hash_bootstrap" ->
      """WITH ev AS (
           SELECT event_id, event_type,
                  CAST(floor(value * 1000000) AS BIGINT) AS value_u
           FROM events WHERE value IS NOT NULL),
         base AS (
           SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                  CAST(CAST(sum(value_u) AS HUGEINT) // count(*) AS BIGINT)
                    AS mean_u
           FROM ev GROUP BY 1),
         reps AS (
           SELECT event_type, t.r,
                  CAST(concat('0x', substr(md5(concat(
                       CAST(event_id AS VARCHAR), '|', CAST(t.r AS VARCHAR))),
                       1, 12)) AS UBIGINT) % 10000 AS m,
                  value_u
           FROM ev, range(32) t(r)),
         wts AS (
           SELECT event_type, r, value_u,
                  CASE WHEN m < 3679 THEN 0 WHEN m < 7358 THEN 1
                       WHEN m < 9197 THEN 2 ELSE 3 END AS w
           FROM reps),
         means AS (
           SELECT event_type, r,
                  CAST(CAST(sum(w * value_u) AS HUGEINT) //
                       nullif(sum(w), 0) AS BIGINT) AS mean_r_u
           FROM wts GROUP BY 1, 2),
         boot AS (
           SELECT event_type, CAST(count(*) AS BIGINT) AS n_replicates,
                  CAST(min(mean_r_u) AS BIGINT) AS boot_lo_u,
                  CAST(max(mean_r_u) AS BIGINT) AS boot_hi_u
           FROM means GROUP BY 1)
         SELECT b.event_type, base.n, base.mean_u, b.n_replicates,
                b.boot_lo_u, b.boot_hi_u
         FROM boot b JOIN base USING (event_type)""",
    "q192_theilsen_trend" ->
      """WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day,
                  CAST(count(*) AS BIGINT) AS cnt
           FROM events GROUP BY 1, 2),
         g AS (
           SELECT a.event_type,
                  CAST(((b.cnt - a.cnt) * 1000000) //
                       date_diff('day', a.day, b.day) AS BIGINT) AS slope_u,
                  CAST(count(*) AS BIGINT) AS w
           FROM daily a JOIN daily b
             ON a.event_type = b.event_type AND a.day < b.day
           GROUP BY 1, 2),
         sc AS (
           SELECT event_type, slope_u,
                  CAST(sum(w) OVER (PARTITION BY event_type) AS BIGINT)
                    AS total_w,
                  CAST(sum(w) OVER (PARTITION BY event_type ORDER BY slope_u
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_w
           FROM g)
         SELECT event_type, total_w AS n_pairs, slope_u AS theilsen_slope_u
         FROM (SELECT *, row_number() OVER (PARTITION BY event_type
                 ORDER BY slope_u) AS rn
               FROM sc WHERE cum_w * 2 >= total_w)
         WHERE rn = 1""",
    "q189_lift_report" ->
      """WITH b AS (
           SELECT quantile_cont(l_extendedprice,
                  [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS qs
           FROM lineitem),
         a AS (
           SELECT (l_returnflag = 'R') AS y,
                  CAST(len(list_filter(b.qs,
                       q -> l_extendedprice > floor(q))) AS INT) AS decile
           FROM lineitem, b),
         per AS (
           SELECT decile, CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS n_pos
           FROM a GROUP BY 1),
         tot AS (
           SELECT CAST(sum(n) AS BIGINT) AS tot_n,
                  CAST(sum(n_pos) AS BIGINT) AS tot_pos
           FROM per)
         SELECT decile, n, n_pos,
                CAST((CAST(n_pos AS HUGEINT) * 1000000) // n AS BIGINT)
                  AS pos_rate_ppm,
                CAST((CAST(n_pos AS HUGEINT) * tot_n * 1000) //
                     (CAST(n AS HUGEINT) * tot_pos) AS BIGINT) AS lift_x1000
         FROM per CROSS JOIN tot""",
    "q190_benford_audit" ->
      """WITH per AS (
           SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
                      AS VARCHAR), 1, 1) AS INT) AS digit,
                  CAST(count(*) AS BIGINT) AS n
           FROM orders GROUP BY 1),
         tot AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM per),
         j AS (
           SELECT digit, n,
                  CAST((CAST(n AS HUGEINT) * 1000000) // tot AS BIGINT) AS ppm,
                  CAST(CASE digit WHEN 1 THEN 301029 WHEN 2 THEN 176091
                       WHEN 3 THEN 124938 WHEN 4 THEN 96910 WHEN 5 THEN 79181
                       WHEN 6 THEN 66946 WHEN 7 THEN 57991 WHEN 8 THEN 51152
                       ELSE 45757 END AS BIGINT) AS benford_ppm
           FROM per CROSS JOIN tot)
         SELECT digit, n, ppm, benford_ppm,
                CAST(abs(ppm - benford_ppm) AS BIGINT) AS dev_ppm,
                abs(ppm - benford_ppm) > 20000 AS flag
         FROM j""",
    "q185_rank_normalize" ->
      """SELECT doc_id, lang, n_chars,
                CAST((CAST(count(*) OVER (PARTITION BY lang ORDER BY n_chars
                      RANGE UNBOUNDED PRECEDING) AS BIGINT) * 1000000) //
                     (count(*) OVER (PARTITION BY lang)) AS BIGINT) AS pct_ppm
         FROM documents""",
    "q186_lateness_audit" ->
      """WITH ev AS (
           SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
           FROM events),
         l AS (
           SELECT event_type,
                  max(ts_us) OVER (PARTITION BY user_id ORDER BY event_id
                    ROWS UNBOUNDED PRECEDING) - ts_us AS late_us
           FROM ev)
         SELECT event_type,
                CAST(count(*) AS BIGINT) AS n_events,
                CAST(sum(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_out_of_order,
                CAST(sum(CASE WHEN late_us > 60000000 THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_late_60s,
                CAST(max(late_us) AS BIGINT) AS max_late_us
         FROM l GROUP BY event_type""",
    "q182_degree_assortativity" ->
      """WITH pairs AS (
           SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
           FROM lineitem a JOIN lineitem b
             ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
         deg AS (
           SELECT src AS node, CAST(count(*) AS BIGINT) AS deg
           FROM pairs GROUP BY 1),
         e AS (
           SELECT dx.deg AS dx, dy.deg AS dy
           FROM pairs p
           JOIN deg dx ON dx.node = p.src
           JOIN deg dy ON dy.node = p.dst),
         m AS (
           SELECT CAST(count(*) AS BIGINT) AS n_edges,
                  CAST(sum(dx) AS BIGINT) AS sum_x,
                  CAST(sum(dy) AS BIGINT) AS sum_y,
                  CAST(sum(CAST(dx AS HUGEINT) * dy) AS BIGINT) AS sum_xy,
                  CAST(sum(CAST(dx AS HUGEINT) * dx) AS BIGINT) AS sum_x2,
                  CAST(sum(CAST(dy AS HUGEINT) * dy) AS BIGINT) AS sum_y2
           FROM e)
         SELECT n_edges, sum_x, sum_y, sum_xy, sum_x2, sum_y2,
                CAST(CAST(n_edges AS HUGEINT) * sum_xy -
                     CAST(sum_x AS HUGEINT) * sum_y AS DOUBLE) /
                sqrt(CAST(CAST(n_edges AS HUGEINT) * sum_x2 -
                          CAST(sum_x AS HUGEINT) * sum_x AS DOUBLE) *
                     CAST(CAST(n_edges AS HUGEINT) * sum_y2 -
                          CAST(sum_y AS HUGEINT) * sum_y AS DOUBLE))
                  AS assortativity
         FROM m""",
    "q184_weighted_median" ->
      """WITH g AS (
           SELECT l_returnflag,
                  CAST(floor(l_extendedprice * 100) AS BIGINT) AS price_c,
                  CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS w
           FROM lineitem GROUP BY 1, 2),
         sc AS (
           SELECT l_returnflag, price_c,
                  CAST(sum(w) OVER (PARTITION BY l_returnflag) AS BIGINT)
                    AS total_w,
                  CAST(sum(w) OVER (PARTITION BY l_returnflag ORDER BY price_c
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_w
           FROM g)
         SELECT l_returnflag, total_w,
                price_c AS weighted_median_cents, cum_w AS cum_w_at_median
         FROM (SELECT *, row_number() OVER (PARTITION BY l_returnflag
                 ORDER BY price_c) AS rn
               FROM sc WHERE cum_w * 2 >= total_w)
         WHERE rn = 1""",
    "q176_decay_score" ->
      """SELECT user_id,
                CAST(count(*) AS BIGINT) AS n_events,
                CAST(sum(value_u) AS BIGINT) AS sum_u,
                CAST(sum(CAST(value_u AS HUGEINT) *
                         (CAST(1 AS BIGINT) << (20 - age))) AS BIGINT)
                  AS decayed_x2p20
         FROM (SELECT user_id,
                      date_diff('day', CAST(ts AS DATE), DATE '2024-01-31')
                        AS age,
                      CAST(floor(value * 1000000) AS BIGINT) AS value_u
               FROM events WHERE value IS NOT NULL)
         WHERE age BETWEEN 0 AND 20
         GROUP BY user_id""",
    "q178_cusum_changepoint" ->
      """WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day,
                  CAST(count(*) AS BIGINT) AS cnt
           FROM events GROUP BY 1, 2),
         tot AS (
           SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
                  CAST(sum(cnt) AS BIGINT) AS total
           FROM daily GROUP BY 1),
         scored AS (
           SELECT d.event_type, d.day, t.n_days, t.total,
                  CAST(sum(d.cnt * t.n_days - t.total) OVER (
                       PARTITION BY d.event_type ORDER BY d.day
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cusum
           FROM daily d JOIN tot t USING (event_type))
         SELECT event_type, n_days, total, day AS cp_day,
                cusum AS cusum_at_cp, CAST(abs(cusum) AS BIGINT) AS max_abs_cusum
         FROM (SELECT *, row_number() OVER (PARTITION BY event_type
                 ORDER BY abs(cusum) DESC, day) AS rn FROM scored)
         WHERE rn = 1""",
    "q149_markov_transitions" ->
      """WITH ev AS (
           SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type
           FROM events),
         p AS (SELECT event_type AS src,
                      lead(event_type) OVER (PARTITION BY user_id
                        ORDER BY ts_us, event_id) AS dst
               FROM ev),
         tr AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS n
                FROM p WHERE dst IS NOT NULL GROUP BY 1, 2),
         tot AS (SELECT src, sum(n) AS tot FROM tr GROUP BY 1)
         SELECT t.src, t.dst, t.n,
                CAST((t.n * 1000000) // o.tot AS BIGINT) AS p_ppm
         FROM tr t JOIN tot o ON o.src = t.src""",
    "q152_group_trend" ->
      """WITH ev AS (
           SELECT event_type,
                  CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                       AS BIGINT) AS x,
                  CAST(floor(value * 1000000) AS BIGINT) AS y_u
           FROM events WHERE value IS NOT NULL),
         a AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                      CAST(sum(x) AS HUGEINT) AS sx,
                      CAST(sum(y_u) AS HUGEINT) AS sy,
                      CAST(sum(x * y_u) AS HUGEINT) AS sxy,
                      CAST(sum(x * x) AS HUGEINT) AS sxx
               FROM ev GROUP BY 1),
         d AS (SELECT event_type, n, n * sxy - sx * sy AS num,
                      n * sxx - sx * sx AS den
               FROM a)
         SELECT event_type, n,
                CASE WHEN den = 0 THEN NULL
                     ELSE CAST(CASE WHEN num < 0 THEN -1 ELSE 1 END *
                               ((abs(num) * 1000000) // den) AS BIGINT)
                END AS slope_ppm
         FROM d""",
    "q153_seasonal_baseline" ->
      """WITH ev AS (
           SELECT event_type, CAST(extract(hour FROM ts) AS INT) AS hr,
                  CAST(floor(value * 1000000) AS BIGINT) AS value_u,
                  (CAST(ts AS DATE) <= DATE '2024-01-15') AS is_base
           FROM events WHERE value IS NOT NULL),
         b AS (SELECT event_type, hr, CAST(count(*) AS BIGINT) AS n_base,
                      CAST(sum(value_u) AS BIGINT) AS sum_base_u
               FROM ev WHERE is_base GROUP BY 1, 2)
         SELECT e.event_type, e.hr,
                CAST(max(coalesce(b.n_base, 0)) AS BIGINT) AS n_base,
                CAST(max(coalesce(b.sum_base_u, 0)) AS BIGINT) AS sum_base_u,
                CAST(count(*) AS BIGINT) AS n_curr,
                CAST(sum(CASE WHEN b.n_base IS NOT NULL
                               AND CAST(e.value_u AS HUGEINT) * b.n_base >
                                   2 * CAST(b.sum_base_u AS HUGEINT)
                          THEN 1 ELSE 0 END) AS BIGINT) AS n_anom
         FROM ev e LEFT JOIN b ON b.event_type = e.event_type AND b.hr = e.hr
         WHERE NOT e.is_base
         GROUP BY 1, 2""",
    "q174_erasure_audit" ->
      """WITH del AS (
           SELECT DISTINCT user_id FROM events
           WHERE CAST(concat('0x', substr(md5('del|' ||
                 CAST(user_id AS VARCHAR)), 1, 12)) AS UBIGINT) % 50 = 0),
         ev AS (SELECT user_id FROM events),
         prof AS (SELECT user_id FROM events GROUP BY user_id)
         SELECT 'events' AS store,
                (SELECT CAST(count(*) AS BIGINT) FROM ev) AS n_before,
                (SELECT CAST(count(*) AS BIGINT) FROM ev
                 WHERE user_id IN (SELECT user_id FROM del)) AS n_deleted,
                (SELECT CAST(count(*) AS BIGINT) FROM ev
                 WHERE user_id NOT IN (SELECT user_id FROM del)) AS n_after,
                CAST(0 AS BIGINT) AS n_remaining_matching
         UNION ALL
         SELECT 'user_profile',
                (SELECT CAST(count(*) AS BIGINT) FROM prof),
                (SELECT CAST(count(*) AS BIGINT) FROM prof
                 WHERE user_id IN (SELECT user_id FROM del)),
                (SELECT CAST(count(*) AS BIGINT) FROM prof
                 WHERE user_id NOT IN (SELECT user_id FROM del)),
                CAST(0 AS BIGINT)""",
    "q171_capped_join" ->
      """SELECT l.l_orderkey, o.o_custkey,
                CAST(l.rk AS INT) AS join_rank,
                l.l_linenumber, l.l_quantity
         FROM (
           SELECT l_orderkey, l_linenumber, l_quantity,
                  row_number() OVER (PARTITION BY l_orderkey
                    ORDER BY l_shipdate, l_linenumber, l_quantity) AS rk
           FROM lineitem QUALIFY rk <= 3) l
         JOIN orders o ON o.o_orderkey = l.l_orderkey""",
    "q170_winsorize" ->
      """WITH b AS (
           SELECT lang,
                  CAST(floor(quantile_cont(n_chars, 0.01)) AS BIGINT) AS lo,
                  CAST(ceil(quantile_cont(n_chars, 0.99)) AS BIGINT) AS hi
           FROM documents GROUP BY lang)
         SELECT d.lang,
                CAST(count(*) AS BIGINT) AS n,
                CAST(max(b.lo) AS BIGINT) AS lo,
                CAST(max(b.hi) AS BIGINT) AS hi,
                CAST(sum(CASE WHEN d.n_chars < b.lo THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_clip_lo,
                CAST(sum(CASE WHEN d.n_chars > b.hi THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_clip_hi,
                CAST(sum(d.n_chars) AS BIGINT) AS sum_orig,
                CAST(sum(greatest(b.lo, least(b.hi, d.n_chars)))
                     AS BIGINT) AS sum_winsorized
         FROM documents d JOIN b USING (lang)
         GROUP BY d.lang""",
    "q172_temporal_split_audit" ->
      """WITH ev AS (
           SELECT event_id, user_id, ts, value FROM events),
         pre AS (
           SELECT user_id, ts, max(value) AS value
           FROM ev WHERE ts < TIMESTAMP '2024-01-20 00:00:00'
           GROUP BY 1, 2),
         post AS (
           SELECT * FROM ev WHERE ts >= TIMESTAMP '2024-01-20 00:00:00')
         SELECT p.event_id, p.user_id,
                r.value AS value_feat,
                epoch_us(r.ts) AS feat_ts_us,
                (r.ts IS NULL OR r.ts < TIMESTAMP '2024-01-20 00:00:00')
                  AS no_future_feature,
                (r.ts IS NULL OR r.ts <= p.ts) AS feature_precedes_label
         FROM post p ASOF LEFT JOIN pre r
           ON p.user_id = r.user_id AND p.ts >= r.ts""",
    "q166_join_preflight" ->
      """WITH perkey AS (
           SELECT l_partkey, CAST(count(*) AS BIGINT) AS key_rows,
                  CAST(count(*) AS HUGEINT) * count(*) AS est_pairs
           FROM lineitem GROUP BY 1),
         summary AS (
           SELECT CAST(count(*) AS BIGINT) AS n_keys,
                  CAST(sum(key_rows) AS BIGINT) AS n_rows,
                  CAST(sum(est_pairs) AS HUGEINT) AS est_join_rows,
                  CAST(max(key_rows) AS BIGINT) AS max_key_rows
           FROM perkey),
         top AS (
           SELECT *, CAST(row_number() OVER (
                    ORDER BY est_pairs DESC, l_partkey) AS INT) AS rank
           FROM perkey QUALIFY rank <= 10)
         SELECT rank, l_partkey, key_rows,
                CAST(est_pairs AS BIGINT) AS est_pairs,
                n_keys, n_rows,
                CAST(est_join_rows AS BIGINT) AS est_join_rows,
                CAST((CAST(max_key_rows AS HUGEINT) * 1000 * n_keys) // n_rows
                     AS BIGINT) AS skew_x1000,
                est_join_rows > 10 * CAST(n_rows AS HUGEINT) AS quadratic_flag
         FROM top CROSS JOIN summary""",
    "q150_kcore" -> kcoreSql,
    "q125_pagerank" -> pagerankSql,
    "q218_sssp_hops" -> ssspSql,
    "q240_zorder_layout" -> zorderSql,
    "q249_order_reconciliation" ->
      """WITH li AS (
           SELECT l_orderkey AS o_orderkey,
                  CAST(sum(CAST(round(l_extendedprice * 100) AS HUGEINT) *
                       (100 - CAST(round(l_discount * 100) AS BIGINT)) *
                       (100 + CAST(round(l_tax * 100) AS BIGINT)))
                       AS BIGINT) AS lines_x1e4
           FROM lineitem GROUP BY 1),
         j AS (
           SELECT o.o_orderkey,
                  CAST(round(o.o_totalprice * 100) AS BIGINT) * 10000
                    AS header_x1e4,
                  CAST(coalesce(li.lines_x1e4, 0) AS BIGINT) AS lines_x1e4
           FROM orders o LEFT JOIN li USING (o_orderkey)),
         d AS (
           SELECT *, abs(header_x1e4 - lines_x1e4) AS diff_x1e4 FROM j)
         SELECT CAST(count(*) AS BIGINT) AS n_orders,
                CAST(sum(CASE WHEN diff_x1e4 = 0 THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_exact_match,
                CAST(sum(CASE WHEN diff_x1e4 > 0 AND
                     diff_x1e4 * 100 <= header_x1e4 THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_within_1pct,
                CAST(sum(CASE WHEN diff_x1e4 * 100 > header_x1e4
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_discrepant,
                CAST(max(diff_x1e4) AS BIGINT) AS max_diff_x1e4
         FROM d""",
    "q248_kendall_tau" ->
      """WITH docs AS (
           SELECT n_chars AS x,
                  CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS y
           FROM documents),
         joint AS (
           SELECT x, y, CAST(count(*) AS BIGINT) AS c
           FROM docs GROUP BY 1, 2),
         cd AS (
           SELECT CAST(sum(CASE WHEN a.y < b.y
                       THEN CAST(a.c AS HUGEINT) * b.c ELSE 0 END)
                       AS HUGEINT) AS conc,
                  CAST(sum(CASE WHEN a.y > b.y
                       THEN CAST(a.c AS HUGEINT) * b.c ELSE 0 END)
                       AS HUGEINT) AS disc
           FROM joint a JOIN joint b ON a.x < b.x),
         mx AS (
           SELECT CAST(sum(CAST(cx AS HUGEINT) * (cx - 1)) // 2 AS HUGEINT)
                    AS n1,
                  CAST(sum(cx) AS BIGINT) AS n
           FROM (SELECT count(*) AS cx FROM docs GROUP BY x)),
         my AS (
           SELECT CAST(sum(CAST(cy AS HUGEINT) * (cy - 1)) // 2 AS HUGEINT)
                    AS n2
           FROM (SELECT count(*) AS cy FROM docs GROUP BY y))
         SELECT mx.n,
                CAST(cd.conc AS BIGINT) AS concordant,
                CAST(cd.disc AS BIGINT) AS discordant,
                CAST(mx.n1 AS BIGINT) AS tie_pairs_x,
                CAST(my.n2 AS BIGINT) AS tie_pairs_y,
                CAST(cd.conc - cd.disc AS DOUBLE) /
                sqrt(CAST(CAST(mx.n AS HUGEINT) * (mx.n - 1) // 2 - mx.n1
                          AS DOUBLE) *
                     CAST(CAST(mx.n AS HUGEINT) * (mx.n - 1) // 2 - my.n2
                          AS DOUBLE)) AS kendall_tau_b
         FROM cd, mx, my""",
    "q247_spearman" ->
      """WITH docs AS (
           SELECT doc_id, n_chars AS x,
                  CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS y
           FROM documents),
         rxd AS (
           SELECT x, 2 * coalesce(sum(cnt) OVER (ORDER BY x
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  + cnt + 1 AS rx
           FROM (SELECT x, CAST(count(*) AS BIGINT) AS cnt
                 FROM docs GROUP BY x)),
         ryd AS (
           SELECT y, 2 * coalesce(sum(cnt) OVER (ORDER BY y
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  + cnt + 1 AS ry
           FROM (SELECT y, CAST(count(*) AS BIGINT) AS cnt
                 FROM docs GROUP BY y)),
         r AS (
           SELECT rx, ry FROM docs
           JOIN rxd USING (x) JOIN ryd USING (y)),
         m AS (
           SELECT CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(rx) AS BIGINT) AS sx,
                  CAST(sum(ry) AS BIGINT) AS sy,
                  CAST(sum(CAST(rx AS HUGEINT) * ry) AS BIGINT) AS sxy,
                  CAST(sum(CAST(rx AS HUGEINT) * rx) AS BIGINT) AS sxx,
                  CAST(sum(CAST(ry AS HUGEINT) * ry) AS BIGINT) AS syy
           FROM r)
         SELECT n, sx, sy, sxy, sxx, syy,
                CAST(CAST(n AS HUGEINT) * sxy -
                     CAST(sx AS HUGEINT) * sy AS DOUBLE) /
                sqrt(CAST(CAST(n AS HUGEINT) * sxx -
                          CAST(sx AS HUGEINT) * sx AS DOUBLE) *
                     CAST(CAST(n AS HUGEINT) * syy -
                          CAST(sy AS HUGEINT) * sy AS DOUBLE)) AS spearman_rho
         FROM m""",
    "q246_mannwhitney_u" ->
      """WITH ev AS (
           SELECT event_type, CAST(floor(value * 1000000) AS BIGINT) AS v
           FROM events
           WHERE value IS NOT NULL AND event_type IN ('click', 'error')),
         dom AS (
           SELECT v,
                  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                       AS BIGINT) AS ca,
                  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                       AS BIGINT) AS cb
           FROM ev GROUP BY v),
         r AS (
           SELECT ca, cb,
                  2 * coalesce(sum(ca + cb) OVER (ORDER BY v
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    + (ca + cb) + 1 AS r2
           FROM dom),
         m AS (
           SELECT CAST(sum(ca) AS BIGINT) AS n_a,
                  CAST(sum(cb) AS BIGINT) AS n_b,
                  CAST(sum(CAST(ca AS HUGEINT) * r2) AS HUGEINT) AS r2a,
                  CAST(sum(CAST(cb AS HUGEINT) * r2) AS HUGEINT) AS r2b
           FROM r)
         SELECT n_a, n_b,
                CAST(r2a - CAST(n_a AS HUGEINT) * (n_a + 1) AS BIGINT) AS u2_a,
                CAST(r2b - CAST(n_b AS HUGEINT) * (n_b + 1) AS BIGINT) AS u2_b,
                (r2a - CAST(n_a AS HUGEINT) * (n_a + 1)) +
                (r2b - CAST(n_b AS HUGEINT) * (n_b + 1)) =
                  2 * CAST(n_a AS HUGEINT) * n_b AS identity_ok
         FROM m""",
    "q245_ks_test" ->
      """WITH ev AS (
           SELECT event_type, CAST(floor(value * 1000000) AS BIGINT) AS v
           FROM events
           WHERE value IS NOT NULL AND event_type IN ('click', 'error')),
         dom AS (
           SELECT v,
                  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                       AS BIGINT) AS ca,
                  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                       AS BIGINT) AS cb
           FROM ev GROUP BY v),
         c AS (
           SELECT CAST(sum(ca) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                       AS BIGINT) AS cuma,
                  CAST(sum(cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                       AS BIGINT) AS cumb,
                  CAST(sum(ca) OVER () AS BIGINT) AS na,
                  CAST(sum(cb) OVER () AS BIGINT) AS nb
           FROM dom)
         SELECT max(na) AS n_a, max(nb) AS n_b,
                CAST(max(abs(CAST(cuma AS HUGEINT) * nb -
                             CAST(cumb AS HUGEINT) * na)) AS BIGINT) AS d_num,
                CAST((max(abs(CAST(cuma AS HUGEINT) * nb -
                              CAST(cumb AS HUGEINT) * na)) * 1000000) //
                     (CAST(max(na) AS HUGEINT) * max(nb)) AS BIGINT) AS d_ppm
         FROM c""",
    "q300_approx_percentile_gate" ->
      """WITH ev AS (
           SELECT CAST(floor(value * 1000000) AS BIGINT) AS v
           FROM events WHERE value IS NOT NULL),
         dom AS (SELECT v, CAST(count(*) AS BIGINT) AS c
                 FROM ev GROUP BY 1),
         cum AS (
           SELECT v, CAST(sum(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS cum
           FROM dom),
         nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM ev),
         med AS (
           SELECT CAST(min(v) AS BIGINT) AS p50_exact_micro
           FROM cum, nn WHERE cum * 2 >= nn.n)
         SELECT nn.n, med.p50_exact_micro, true AS rank_ok
         FROM nn, med""",
    "q288_local_clustering" ->
      """WITH pairs AS (
           SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
           FROM lineitem a JOIN lineitem b
             ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
         e AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
               FROM pairs),
         deg AS (SELECT n, CAST(count(*) AS BIGINT) AS d FROM (
                   SELECT u AS n FROM e UNION ALL SELECT v FROM e)
                 GROUP BY n),
         tri AS (SELECT e1.u AS x, e1.v AS y, e2.v AS z
                 FROM e e1 JOIN e e2 ON e2.u = e1.u AND e2.v > e1.v
                 JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v),
         cr AS (SELECT n, CAST(count(*) AS BIGINT) AS n_triangles FROM (
                  SELECT x AS n FROM tri UNION ALL SELECT y FROM tri
                  UNION ALL SELECT z FROM tri)
                GROUP BY n)
         SELECT deg.n, deg.d AS degree,
                coalesce(cr.n_triangles, 0) AS n_triangles,
                CASE WHEN deg.d >= 2
                     THEN CAST(coalesce(cr.n_triangles, 0) * 2000000
                          // (deg.d * (deg.d - 1)) AS BIGINT)
                     ELSE CAST(0 AS BIGINT) END AS coeff_ppm
         FROM deg LEFT JOIN cr USING (n)""",
    "q289_key_skew_gini" ->
      """WITH pk AS (SELECT user_id, count(*) AS c FROM events GROUP BY 1),
         fof AS (SELECT c, CAST(count(*) AS BIGINT) AS m FROM pk GROUP BY 1),
         cum AS (
           SELECT c, m,
                  coalesce(CAST(sum(m) OVER (ORDER BY c
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    AS BIGINT), 0) AS prev_n
           FROM fof),
         agg AS (
           SELECT CAST(sum(m) AS BIGINT) AS n_keys,
                  CAST(sum(CAST(c AS HUGEINT) * m) AS HUGEINT) AS s,
                  CAST(sum(CAST(c AS HUGEINT) *
                       (CAST(m AS HUGEINT) * prev_n +
                        (CAST(m AS HUGEINT) * (m + 1)) // 2)) AS HUGEINT)
                    AS s1,
                  CAST(max(c) AS BIGINT) AS max_c
           FROM cum)
         SELECT n_keys, CAST(s AS BIGINT) AS n_rows, max_c,
                CAST((2 * s1 - (CAST(n_keys AS HUGEINT) + 1) * s) * 1000000
                     // (CAST(n_keys AS HUGEINT) * s) AS BIGINT) AS gini_ppm,
                CAST(CAST(max_c AS HUGEINT) * 1000000 // s AS BIGINT)
                  AS top1_share_ppm
         FROM agg""",
    "q290_diff_in_diff" ->
      """WITH ev AS (
           SELECT CAST(concat('0x', substr(md5(concat('arm|',
                    CAST(user_id AS VARCHAR))), 1, 12)) AS UBIGINT) % 2
                    AS arm,
                  CASE WHEN CAST(ts AS DATE) > DATE '2024-01-15'
                       THEN 1 ELSE 0 END AS post,
                  CAST(floor(value * 1000000) AS BIGINT) AS v
           FROM events WHERE value IS NOT NULL),
         cells AS (
           SELECT arm, post, CAST(count(*) AS BIGINT) AS n_events,
                  CAST(sum(CAST(v AS HUGEINT)) AS DOUBLE) /
                  CAST(count(*) AS DOUBLE) AS mean_u
           FROM ev GROUP BY 1, 2)
         SELECT CAST(sum(n_events) AS BIGINT) AS n_events,
                max(CASE WHEN arm = 0 AND post = 0 THEN mean_u END)
                  AS ctl_pre_u,
                max(CASE WHEN arm = 0 AND post = 1 THEN mean_u END)
                  AS ctl_post_u,
                max(CASE WHEN arm = 1 AND post = 0 THEN mean_u END)
                  AS trt_pre_u,
                max(CASE WHEN arm = 1 AND post = 1 THEN mean_u END)
                  AS trt_post_u,
                (max(CASE WHEN arm = 1 AND post = 1 THEN mean_u END) -
                 max(CASE WHEN arm = 1 AND post = 0 THEN mean_u END)) -
                (max(CASE WHEN arm = 0 AND post = 1 THEN mean_u END) -
                 max(CASE WHEN arm = 0 AND post = 0 THEN mean_u END))
                  AS did_u
         FROM cells""",
    "q293_join_size_cms" ->
      """WITH o AS (SELECT o_orderkey AS k FROM orders),
         l AS (SELECT l_orderkey AS k FROM lineitem),
         ca AS (
           SELECT r.i AS row_i,
                  CAST(CAST(concat('0x', substr(md5(concat(r.i, '|',
                    CAST(k AS VARCHAR))), 1, 12)) AS UBIGINT) % 256 AS INT)
                    AS col_j,
                  CAST(count(*) AS BIGINT) AS cnt
           FROM o, range(4) r(i) GROUP BY 1, 2),
         cb AS (
           SELECT r.i AS row_i,
                  CAST(CAST(concat('0x', substr(md5(concat(r.i, '|',
                    CAST(k AS VARCHAR))), 1, 12)) AS UBIGINT) % 256 AS INT)
                    AS col_j,
                  CAST(count(*) AS BIGINT) AS cnt
           FROM l, range(4) r(i) GROUP BY 1, 2),
         dots AS (
           SELECT ca.row_i,
                  CAST(sum(CAST(ca.cnt AS HUGEINT) * cb.cnt) AS HUGEINT)
                    AS dot
           FROM ca JOIN cb USING (row_i, col_j) GROUP BY 1),
         est AS (SELECT CAST(min(dot) AS BIGINT) AS est_rows FROM dots),
         ex AS (SELECT CAST(count(*) AS BIGINT) AS exact_rows
                FROM o JOIN l USING (k))
         SELECT ex.exact_rows, est.est_rows,
                est.est_rows >= ex.exact_rows AS bound_ok,
                CAST((CAST(est.est_rows AS HUGEINT) - ex.exact_rows)
                     * 1000000 // ex.exact_rows AS BIGINT) AS overshoot_ppm
         FROM ex, est""",
    "q294_isotonic_calibration" ->
      """WITH ev AS (
           SELECT CAST(floor(value / 10) AS BIGINT) AS b,
                  CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
           FROM events WHERE value IS NOT NULL),
         bins AS (
           SELECT b, CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(y) AS BIGINT) AS n_pos
           FROM ev GROUP BY 1),
         pre AS (
           SELECT b, n, n_pos,
                  CAST(sum(n) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING)
                    AS BIGINT) AS pn,
                  CAST(sum(n_pos) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING)
                    AS BIGINT) AS pp
           FROM bins),
         a AS (
           SELECT j.b AS jb, k.b AS kb,
                  CAST(k.pp - j.pp + j.n_pos AS DOUBLE) /
                  CAST(k.pn - j.pn + j.n AS DOUBLE) AS avg_jk
           FROM pre j JOIN pre k ON j.b <= k.b),
         sm AS (
           SELECT jb, kb,
                  min(avg_jk) OVER (PARTITION BY jb ORDER BY kb DESC
                    ROWS UNBOUNDED PRECEDING) AS m
           FROM a),
         f AS (SELECT kb AS b, max(m) AS iso_fit FROM sm GROUP BY 1)
         SELECT bins.b AS bin, bins.n, bins.n_pos,
                CAST(bins.n_pos * 1000000 // bins.n AS BIGINT) AS rate_ppm,
                f.iso_fit
         FROM bins JOIN f USING (b)""",
    "q301_isotonic_by_segment" ->
      """WITH ev AS (
           SELECT CAST(user_id % 3 AS BIGINT) AS cohort,
                  CAST(floor(value / 10) AS BIGINT) AS b,
                  CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
           FROM events WHERE value IS NOT NULL),
         bins AS (
           SELECT cohort, b, CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(y) AS BIGINT) AS n_pos
           FROM ev GROUP BY 1, 2),
         pre AS (
           SELECT cohort, b, n, n_pos,
                  CAST(sum(n) OVER (PARTITION BY cohort ORDER BY b
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS pn,
                  CAST(sum(n_pos) OVER (PARTITION BY cohort ORDER BY b
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS pp
           FROM bins),
         a AS (
           SELECT j.cohort, j.b AS jb, k.b AS kb,
                  CAST(k.pp - j.pp + j.n_pos AS DOUBLE) /
                  CAST(k.pn - j.pn + j.n AS DOUBLE) AS avg_jk
           FROM pre j JOIN pre k ON j.cohort = k.cohort AND j.b <= k.b),
         sm AS (
           SELECT cohort, jb, kb,
                  min(avg_jk) OVER (PARTITION BY cohort, jb ORDER BY kb DESC
                    ROWS UNBOUNDED PRECEDING) AS m
           FROM a),
         f AS (SELECT cohort, kb AS b, max(m) AS iso_fit
               FROM sm GROUP BY 1, 2)
         SELECT bins.cohort, bins.b AS bin, bins.n, bins.n_pos,
                CAST(bins.n_pos * 1000000 // bins.n AS BIGINT) AS rate_ppm,
                f.iso_fit
         FROM bins JOIN f USING (cohort, b)""",
    "q303_ratio_delta_ci" ->
      """WITH per AS (
           SELECT user_id,
                  CAST(sum(CASE WHEN event_type = 'purchase'
                       AND value IS NOT NULL
                       THEN CAST(floor(value * 1000000) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS x,
                  CAST(count(*) AS BIGINT) AS y
           FROM events GROUP BY 1),
         m AS (
           SELECT CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
                  CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
                  CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
                  CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
                  CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
           FROM per)
         SELECT n AS n_users,
                CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE) AS ratio_u,
                sqrt(((CAST(n * sxx - sx * sx AS DOUBLE) -
                       2.0 * (CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE)) *
                         CAST(n * sxy - sx * sy AS DOUBLE) +
                       (CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE)) *
                         (CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE)) *
                         CAST(n * syy - sy * sy AS DOUBLE)) /
                      (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) *
                       (CAST(n AS DOUBLE) - 1.0))) /
                     ((CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) *
                      (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)))) AS se_u,
                CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE) - 1.96 *
                sqrt(((CAST(n * sxx - sx * sx AS DOUBLE) -
                       2.0 * (CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE)) *
                         CAST(n * sxy - sx * sy AS DOUBLE) +
                       (CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE)) *
                         (CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE)) *
                         CAST(n * syy - sy * sy AS DOUBLE)) /
                      (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) *
                       (CAST(n AS DOUBLE) - 1.0))) /
                     ((CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) *
                      (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)))) AS ci_lo_u,
                CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE) + 1.96 *
                sqrt(((CAST(n * sxx - sx * sx AS DOUBLE) -
                       2.0 * (CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE)) *
                         CAST(n * sxy - sx * sy AS DOUBLE) +
                       (CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE)) *
                         (CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE)) *
                         CAST(n * syy - sy * sy AS DOUBLE)) /
                      (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) *
                       (CAST(n AS DOUBLE) - 1.0))) /
                     ((CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) *
                      (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)))) AS ci_hi_u
         FROM m""",
    "q328_jackknife_ratio_ci" ->
      """WITH per AS (
           SELECT user_id % 32 AS bucket,
                  CAST(sum(CASE WHEN event_type = 'purchase'
                        AND value IS NOT NULL
                       THEN CAST(floor(value * 1000000) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS sx,
                  CAST(count(*) AS BIGINT) AS sy
           FROM events GROUP BY 1),
         tot AS (
           SELECT CAST(count(*) AS BIGINT) AS n_buckets,
                  CAST(sum(sx) AS BIGINT) AS sum_micros,
                  CAST(sum(sy) AS BIGINT) AS n_events
           FROM per)
         SELECT n_buckets, sum_micros, n_events,
                CAST(CAST(sum_micros AS HUGEINT) * 1000 // n_events
                     AS BIGINT) AS ratio_q9,
                TRUE AS se_ok, TRUE AS ci_ok
         FROM tot""",
    "q329_hill_tail" ->
      """WITH w AS (
           SELECT unnest(list_filter(regexp_split_to_array(trim(text),
             '\s+'), x -> x <> '')) AS term
           FROM documents),
         f AS (SELECT term, CAST(count(*) AS BIGINT) AS f
               FROM w GROUP BY 1),
         r AS (SELECT *, row_number() OVER (ORDER BY f DESC, term ASC)
                    AS rk FROM f),
         th AS (SELECT f AS f_k1 FROM r WHERE rk = 21),
         t2 AS (
           SELECT CAST(round(ln(CAST(r.f AS DOUBLE) /
                    CAST(th.f_k1 AS DOUBLE)), 9) AS DECIMAL(20,9)) AS t,
                  th.f_k1
           FROM r, th WHERE rk <= 20)
         SELECT CAST(count(*) AS BIGINT) AS k_used,
                CAST(max(f_k1) AS BIGINT) AS f_threshold,
                CAST(round(CAST(count(*) AS DOUBLE) /
                  CAST(sum(t) AS DOUBLE), 6) AS DECIMAL(28,6))
                  AS hill_alpha
         FROM t2""",
    "q331_funnel" ->
      """WITH ev AS (
           SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
         s1 AS (SELECT user_id, min(ts_us) AS t1 FROM ev
                WHERE event_type = 'view' GROUP BY 1),
         s2 AS (SELECT e.user_id, min(e.ts_us) AS t2
                FROM ev e JOIN s1 ON e.user_id = s1.user_id
                WHERE e.event_type = 'click' AND e.ts_us > s1.t1 GROUP BY 1),
         s3 AS (SELECT e.user_id, min(e.ts_us) AS t3
                FROM ev e JOIN s2 ON e.user_id = s2.user_id
                WHERE e.event_type = 'purchase' AND e.ts_us > s2.t2
                GROUP BY 1),
         c AS (SELECT (SELECT count(*) FROM s1) AS n1,
                      (SELECT count(*) FROM s2) AS n2,
                      (SELECT count(*) FROM s3) AS n3),
         l AS (SELECT sum(s2.t2 - s1.t1) AS lag12,
                      sum(s3.t3 - s2.t2) AS lag23
               FROM s3 JOIN s2 ON s3.user_id = s2.user_id
                       JOIN s1 ON s3.user_id = s1.user_id)
         SELECT CAST(n1 AS BIGINT) AS n_view,
                CAST(n2 AS BIGINT) AS n_click,
                CAST(n3 AS BIGINT) AS n_purchase,
                CAST(lag12 AS BIGINT) AS sum_lag12_us,
                CAST(lag23 AS BIGINT) AS sum_lag23_us,
                CAST(CASE WHEN n1 = 0 THEN NULL
                     ELSE (n2 * 1000000) // n1 END AS BIGINT) AS conv12_ppm,
                CAST(CASE WHEN n2 = 0 THEN NULL
                     ELSE (n3 * 1000000) // n2 END AS BIGINT) AS conv23_ppm,
                CAST(CASE WHEN n1 = 0 THEN NULL
                     ELSE (n3 * 1000000) // n1 END AS BIGINT) AS conv13_ppm
         FROM c, l""",
    "q332_cohort_retention" ->
      """WITH act AS (
           SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS week
           FROM events),
         f AS (SELECT user_id, min(week) AS cohort_w FROM act GROUP BY 1),
         sz AS (SELECT cohort_w, CAST(count(*) AS BIGINT) AS n_cohort
                FROM f GROUP BY 1),
         r AS (SELECT f.cohort_w, act.week - f.cohort_w AS offset_w,
                      CAST(count(*) AS BIGINT) AS n_active
               FROM act JOIN f ON act.user_id = f.user_id GROUP BY 1, 2)
         SELECT CAST(r.cohort_w AS BIGINT) AS cohort_w,
                CAST(offset_w AS BIGINT) AS offset_w, n_active, n_cohort,
                CAST((n_active * 1000000) // n_cohort AS BIGINT)
                  AS retention_ppm
         FROM r JOIN sz ON r.cohort_w = sz.cohort_w""",
    "q333_markov_transitions" ->
      """WITH ev AS (
           SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
           FROM events),
         p AS (
           SELECT event_type AS prev,
                  lead(event_type, 1) OVER (PARTITION BY user_id
                    ORDER BY ts_us, event_id) AS nxt
           FROM ev),
         c AS (SELECT prev, nxt, CAST(count(*) AS BIGINT) AS n
               FROM p WHERE nxt IS NOT NULL GROUP BY 1, 2),
         t AS (SELECT prev, CAST(sum(n) AS BIGINT) AS n_prev
               FROM c GROUP BY 1)
         SELECT c.prev, c.nxt, n, n_prev,
                CAST((n * 1000000) // n_prev AS BIGINT) AS p_ppm
         FROM c JOIN t ON c.prev = t.prev""",
    "q322_ewma_control" ->
      """WITH RECURSIVE daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day,
                  CAST(count(*) AS BIGINT) AS x
           FROM events GROUP BY 1, 2),
         sig AS (
           SELECT event_type,
                  sqrt(CAST(CAST(count(*) AS HUGEINT) *
                         sum(CAST(x AS HUGEINT) * x) -
                         sum(CAST(x AS HUGEINT)) * sum(CAST(x AS HUGEINT))
                       AS DOUBLE) /
                       (CAST(count(*) AS DOUBLE) * (count(*) - 1)))
                    AS sigma
           FROM daily GROUP BY 1),
         d AS (
           SELECT *, row_number() OVER (PARTITION BY event_type
                       ORDER BY day) AS rn
           FROM daily),
         r AS (
           SELECT event_type, day, x, rn,
                  CAST(x * 1000000 AS BIGINT) AS ewma_u
           FROM d WHERE rn = 1
           UNION ALL
           SELECT d.event_type, d.day, d.x, d.rn,
                  CAST(floor(0.3 * CAST(d.x * 1000000 AS DOUBLE) +
                       0.7 * CAST(r.ewma_u AS DOUBLE)) AS BIGINT)
           FROM d JOIN r ON d.event_type = r.event_type
                        AND d.rn = r.rn + 1)
         SELECT r.event_type, r.day, r.x, r.ewma_u,
                CAST(abs(r.x * 1000000 - r.ewma_u) AS DOUBLE) >
                  3.0 * sig.sigma * 1000000.0 AS alert
         FROM r JOIN sig USING (event_type)""",
    "q323_sprt_monitor" -> {
      val (p0, p1, alpha, beta) = (0.10, 0.15, 0.05, 0.05)
      val cPos = math.round(math.log(p1 / p0) * 1e6)
      val cNeg = math.round(math.log((1 - p1) / (1 - p0)) * 1e6)
      val upper = math.round(math.log((1 - beta) / alpha) * 1e6)
      val lower = math.round(math.log(beta / (1 - alpha)) * 1e6)
      s"""WITH walk AS (
           SELECT user_id % 4 AS cohort, epoch_us(ts) AS ts_us, event_id,
                  CASE WHEN event_type = 'purchase' THEN $cPos
                       ELSE $cNeg END AS step
           FROM events),
         c AS (
           SELECT cohort,
                  CAST(sum(step) OVER w AS BIGINT) AS llr_u,
                  CAST(count(*) OVER w AS BIGINT) AS rn
           FROM walk
           WINDOW w AS (PARTITION BY cohort ORDER BY ts_us, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         f AS (SELECT * FROM c WHERE llr_u >= $upper OR llr_u <= $lower)
         SELECT cohort, CAST(min(rn) AS BIGINT) AS n_at_decision,
                CAST(arg_min(llr_u, rn) AS BIGINT) AS llr_u_at,
                CASE WHEN arg_min(llr_u, rn) >= $upper THEN 'accept_h1'
                     ELSE 'accept_h0' END AS decision
         FROM f GROUP BY cohort"""
    },
    "q321_hilbert_layout" -> {
      val morton = (0 until 6).map { k =>
        s"(((x >> $k) & 1) << ${2 * k}) + (((y >> $k) & 1) << ${2 * k + 1})"
      }.mkString(" + ")
      val (ctes, fin) = graft.data.Hilbert.sqlSteps("pts", Seq("ox", "oy", "z"), 6)
      s"""WITH pts0 AS (
           SELECT DISTINCT CAST(o_orderkey * 37 % 64 AS BIGINT) AS x,
                  CAST(o_custkey * 73 % 64 AS BIGINT) AS y
           FROM orders),
         pts AS (
           SELECT x, y, x AS ox, y AS oy, CAST($morton AS BIGINT) AS z
           FROM pts0),
         $ctes
         f AS (SELECT ox AS x, oy AS y, z, d AS h FROM $fin),
         st AS (
           SELECT *,
                  abs(x - lag(x) OVER (ORDER BY h)) +
                  abs(y - lag(y) OVER (ORDER BY h)) AS dh,
                  abs(x - lag(x) OVER (ORDER BY z)) +
                  abs(y - lag(y) OVER (ORDER BY z)) AS dz
           FROM f)
         SELECT CAST(count(*) AS BIGINT) AS n_cells,
                CAST(sum(dh) AS BIGINT) AS hilbert_step_total,
                CAST(sum(dz) AS BIGINT) AS zorder_step_total,
                sum(dh) <= sum(dz) AS hilbert_no_worse
         FROM st"""
    },
    "q312_logrank" ->
      """WITH subj AS (
           SELECT user_id % 2 AS grp,
                  CAST((epoch_us(max(ts)) - epoch_us(min(ts))) //
                       3600000000 AS BIGINT) AS t0,
                  max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS ev
           FROM events GROUP BY user_id),
         pert AS (
           SELECT t0 AS t,
                  CAST(sum(CASE WHEN grp = 1 THEN ev ELSE 0 END) AS BIGINT)
                    AS da,
                  CAST(sum(CASE WHEN grp = 1 THEN 1 - ev ELSE 0 END)
                    AS BIGINT) AS ca,
                  CAST(sum(CASE WHEN grp <> 1 THEN ev ELSE 0 END) AS BIGINT)
                    AS db,
                  CAST(sum(CASE WHEN grp <> 1 THEN 1 - ev ELSE 0 END)
                    AS BIGINT) AS cb
           FROM subj GROUP BY t0),
         r AS (
           SELECT *,
                  sum(da + ca) OVER () - COALESCE(sum(da + ca) OVER (
                    ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                    AND 1 PRECEDING), 0) AS na,
                  sum(db + cb) OVER () - COALESCE(sum(db + cb) OVER (
                    ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                    AND 1 PRECEDING), 0) AS nb
           FROM pert),
         f AS (
           SELECT *, CAST(na + nb AS HUGEINT) AS nt,
                  CAST(da + db AS HUGEINT) AS dt
           FROM r WHERE da + db > 0),
         terms AS (
           SELECT da,
                  CAST(dt * na * 1000000000 // nt AS BIGINT) AS e_q9,
                  CASE WHEN nt > 1 THEN
                    CAST(dt * na * nb * (nt - dt) * 1000000000
                         // (nt * nt * (nt - 1)) AS BIGINT)
                  ELSE 0 END AS v_q9
           FROM f),
         agg AS (
           SELECT CAST(sum(da) AS BIGINT) AS o_a,
                  CAST(sum(e_q9) AS BIGINT) AS e_a_q9,
                  CAST(sum(v_q9) AS BIGINT) AS v_q9
           FROM terms)
         SELECT o_a, e_a_q9, v_q9,
                CASE WHEN v_q9 > 0 THEN
                  CAST((CAST(o_a AS HUGEINT) * 1000000000 - e_a_q9) *
                       (CAST(o_a AS HUGEINT) * 1000000000 - e_a_q9)
                       // (CAST(v_q9 AS HUGEINT) * 1000) AS BIGINT)
                END AS chi2_ppm
         FROM agg""",
    "q313_mcnemar" ->
      """WITH per AS (
           SELECT user_id,
                  max(CASE WHEN event_type = 'purchase'
                       AND day(ts) <= 15 THEN 1 ELSE 0 END) AS f1,
                  max(CASE WHEN event_type = 'purchase'
                       AND day(ts) > 15 THEN 1 ELSE 0 END) AS f2
           FROM events GROUP BY user_id),
         agg AS (
           SELECT CAST(count(*) AS BIGINT) AS n_pairs,
                  CAST(sum(CASE WHEN f1 = 1 AND f2 = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS b,
                  CAST(sum(CASE WHEN f1 = 0 AND f2 = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS c
           FROM per)
         SELECT n_pairs, b, c,
                CAST(CASE WHEN b + c > 0 THEN
                  CAST(b - c AS HUGEINT) * (b - c) * 1000000 // (b + c)
                  ELSE 0 END AS BIGINT) AS mcnemar_ppm,
                CAST(CASE WHEN b + c > 0 THEN
                  CAST(greatest(abs(b - c) - 1, 0) AS HUGEINT) *
                  greatest(abs(b - c) - 1, 0) * 1000000 // (b + c)
                  ELSE 0 END AS BIGINT) AS mcnemar_cc_ppm
         FROM agg""",
    "q340_cmh_stratified" ->
      """WITH per AS (
           SELECT user_id,
                  max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS y
           FROM events GROUP BY user_id),
         cells AS (
           SELECT (user_id // 2) % 5 AS stratum,
                  CAST(sum(CASE WHEN user_id % 2 = 1 AND y = 1
                       THEN 1 ELSE 0 END) AS BIGINT) AS a,
                  CAST(sum(CASE WHEN user_id % 2 = 1 AND y = 0
                       THEN 1 ELSE 0 END) AS BIGINT) AS b,
                  CAST(sum(CASE WHEN user_id % 2 = 0 AND y = 1
                       THEN 1 ELSE 0 END) AS BIGINT) AS c,
                  CAST(sum(CASE WHEN user_id % 2 = 0 AND y = 0
                       THEN 1 ELSE 0 END) AS BIGINT) AS d
           FROM per GROUP BY 1),
         inc AS (
           SELECT *, a + b + c + d AS n,
                  CAST(CAST(a + b AS HUGEINT) * (a + c) * 1000000000 // n
                       AS BIGINT) AS e_q9,
                  CASE WHEN n > 1 THEN
                    CAST(CAST(a + b AS HUGEINT) * (c + d) * (a + c) *
                         (b + d) * 1000000000
                         // (CAST(n AS HUGEINT) * n * (n - 1)) AS BIGINT)
                  ELSE 0 END AS v_q9,
                  CAST(CAST(a AS HUGEINT) * d * 1000000000 // n AS BIGINT)
                    AS r_q9,
                  CAST(CAST(b AS HUGEINT) * c * 1000000000 // n AS BIGINT)
                    AS s_q9
           FROM cells),
         agg AS (
           SELECT CAST(count(*) AS BIGINT) AS k_strata,
                  CAST(sum(a) AS BIGINT) AS sum_a,
                  CAST(sum(e_q9) AS BIGINT) AS e_sum_q9,
                  CAST(sum(v_q9) AS BIGINT) AS v_sum_q9,
                  CAST(sum(r_q9) AS BIGINT) AS r_sum_q9,
                  CAST(sum(s_q9) AS BIGINT) AS s_sum_q9
           FROM inc)
         SELECT k_strata, sum_a, e_sum_q9, v_sum_q9, r_sum_q9, s_sum_q9,
                CASE WHEN v_sum_q9 > 0 THEN
                  CAST((CAST(sum_a AS HUGEINT) * 1000000000 - e_sum_q9) *
                       (CAST(sum_a AS HUGEINT) * 1000000000 - e_sum_q9)
                       // (CAST(v_sum_q9 AS HUGEINT) * 1000) AS BIGINT)
                END AS chi2_ppm,
                CASE WHEN s_sum_q9 > 0 THEN
                  CAST(CAST(r_sum_q9 AS HUGEINT) * 1000000000 // s_sum_q9
                       AS BIGINT)
                END AS or_mh_q9
         FROM agg""",
    "q343_cochran_q" ->
      """WITH per AS (
           SELECT user_id,
                  max(CASE WHEN event_type = 'purchase' AND day(ts) <= 10
                       THEN 1 ELSE 0 END) AS c1,
                  max(CASE WHEN event_type = 'purchase' AND day(ts) > 10
                       AND day(ts) <= 20 THEN 1 ELSE 0 END) AS c2,
                  max(CASE WHEN event_type = 'purchase' AND day(ts) > 20
                       THEN 1 ELSE 0 END) AS c3
           FROM events GROUP BY user_id),
         r AS (SELECT c1 + c2 + c3 AS rr, c1, c2, c3 FROM per),
         agg AS (
           SELECT CAST(count(*) AS BIGINT) AS n_subjects,
                  CAST(sum(rr) AS BIGINT) AS t_total,
                  CAST(sum(CAST(rr AS HUGEINT) * rr) AS BIGINT) AS sum_r2,
                  CAST(sum(c1) AS HUGEINT) AS s1,
                  CAST(sum(c2) AS HUGEINT) AS s2,
                  CAST(sum(c3) AS HUGEINT) AS s3
           FROM r)
         SELECT n_subjects, CAST(3 AS BIGINT) AS k_conditions, t_total,
                sum_r2,
                CAST(s1 * s1 + s2 * s2 + s3 * s3 AS BIGINT) AS sum_c2,
                CASE WHEN 3 * t_total - sum_r2 > 0 THEN
                  CAST(2 * (3 * (s1 * s1 + s2 * s2 + s3 * s3) -
                       CAST(t_total AS HUGEINT) * t_total) * 1000000
                       // (3 * CAST(t_total AS HUGEINT) - sum_r2)
                       AS BIGINT)
                END AS q_ppm
         FROM agg""",
    "q305_kaplan_meier" ->
      """WITH subj AS (
           SELECT user_id % 3 AS cohort,
                  CAST((epoch_us(max(ts)) - epoch_us(min(ts))) //
                       3600000000 AS BIGINT) AS t0,
                  max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS ev
           FROM events GROUP BY user_id),
         pert AS (
           SELECT cohort, t0 AS t, CAST(sum(ev) AS BIGINT) AS d_events,
                  CAST(sum(1 - ev) AS BIGINT) AS n_censored
           FROM subj GROUP BY cohort, t0),
         r AS (
           SELECT *,
                  sum(d_events + n_censored) OVER (PARTITION BY cohort) -
                  COALESCE(sum(d_events + n_censored) OVER (
                    PARTITION BY cohort ORDER BY t
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS n_risk
           FROM pert),
         f AS (SELECT * FROM r WHERE d_events > 0),
         s AS (
           SELECT *,
                  CAST(CAST(d_events AS HUGEINT) * 1000000000 // n_risk
                       AS BIGINT) AS haz_q9
           FROM f)
         SELECT cohort, t, CAST(n_risk AS BIGINT) AS n_risk, d_events,
                n_censored, haz_q9,
                CAST(sum(haz_q9) OVER w AS BIGINT) AS cum_haz_q9,
                TRUE AS surv_ok
         FROM s
         WINDOW w AS (PARTITION BY cohort ORDER BY t
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""",
    "q306_chi_square" ->
      """WITH j AS (
           SELECT n_name AS a, c_mktsegment AS b
           FROM customer JOIN nation ON c_nationkey = n_nationkey),
         cells AS (
           SELECT a, b, CAST(count(*) AS BIGINT) AS o FROM j GROUP BY a, b),
         m AS (
           SELECT *,
                  CAST(sum(o) OVER (PARTITION BY a) AS BIGINT) AS r,
                  CAST(sum(o) OVER (PARTITION BY b) AS BIGINT) AS c,
                  CAST(sum(o) OVER () AS BIGINT) AS n
           FROM cells),
         t2 AS (
           SELECT *,
                  CASE WHEN r > 0 AND c > 0 THEN
                    CAST((CAST(o AS HUGEINT) * n - CAST(r AS HUGEINT) * c) *
                         (CAST(o AS HUGEINT) * n - CAST(r AS HUGEINT) * c) *
                         1000000
                         // (CAST(n AS HUGEINT) * r * c) AS BIGINT)
                  ELSE 0 END AS term_ppm
           FROM m),
         agg AS (
           SELECT CAST(max(n) AS BIGINT) AS n,
                  CAST(count(DISTINCT a) FILTER (WHERE r > 0) AS BIGINT)
                    AS a_levels,
                  CAST(count(DISTINCT b) FILTER (WHERE c > 0) AS BIGINT)
                    AS b_levels,
                  CAST(sum(term_ppm) AS BIGINT) AS chi2_ppm
           FROM t2)
         SELECT n, a_levels, b_levels,
                CAST((a_levels - 1) * (b_levels - 1) AS BIGINT) AS dof,
                chi2_ppm,
                CASE WHEN n * (least(a_levels, b_levels) - 1) > 0 THEN
                  CAST(floor(sqrt(CAST(chi2_ppm AS DOUBLE) /
                    CAST(n * (least(a_levels, b_levels) - 1) AS DOUBLE) /
                    1000000.0) * 1000000000.0) AS BIGINT)
                END AS cramers_v_q9
         FROM agg""",
    "q307_anova_oneway" ->
      """WITH x AS (
           SELECT c_mktsegment AS g,
                  CAST(round(c_acctbal * 100) AS BIGINT) AS v
           FROM customer),
         grp AS (
           SELECT g, CAST(count(*) AS BIGINT) AS ng,
                  CAST(sum(CAST(v AS HUGEINT)) AS HUGEINT) AS s1,
                  CAST(sum(CAST(v AS HUGEINT) * v) AS HUGEINT) AS s2
           FROM x GROUP BY g),
         pg AS (
           SELECT *, (s1 * s1) // ng AS t0
           FROM grp),
         agg AS (
           SELECT CAST(sum(ng) AS BIGINT) AS n_total,
                  CAST(count(*) AS BIGINT) AS k_groups,
                  CAST(sum(s1) AS HUGEINT) AS gs1,
                  CAST(sum(s2) AS HUGEINT) AS gs2,
                  CAST(sum(t0) AS HUGEINT) AS bg
           FROM pg),
         ss AS (
           SELECT n_total, k_groups,
                  greatest(CAST(bg - (gs1 * gs1) // n_total AS BIGINT), 0)
                    AS ssb,
                  CAST(gs2 - bg AS BIGINT) AS ssw
           FROM agg)
         SELECT n_total, k_groups, ssb, ssw,
                CASE WHEN k_groups > 1 AND ssw > 0 THEN
                  CAST(CAST(ssb AS HUGEINT) * (n_total - k_groups) *
                       1000000
                       // (CAST(ssw AS HUGEINT) * (k_groups - 1))
                       AS BIGINT) END AS f_ppm,
                CASE WHEN ssb + ssw > 0 THEN
                  CAST(CAST(ssb AS HUGEINT) * 1000000000
                       // (CAST(ssb AS HUGEINT) + ssw) AS BIGINT)
                END AS eta_sq_q9
         FROM ss""",
    "q296_mwu_by_segment" ->
      """WITH dom AS (
           SELECT lang, n_chars AS v,
                  CAST(sum(CASE WHEN CAST(substring(source, 4) AS INT)
                       % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
                  CAST(sum(CASE WHEN CAST(substring(source, 4) AS INT)
                       % 2 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS cb
           FROM documents GROUP BY 1, 2),
         r AS (
           SELECT lang, ca, cb,
                  2 * coalesce(sum(ca + cb) OVER (PARTITION BY lang
                      ORDER BY v
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    + (ca + cb) + 1 AS r2
           FROM dom),
         m AS (
           SELECT lang,
                  CAST(sum(ca) AS BIGINT) AS n_a,
                  CAST(sum(cb) AS BIGINT) AS n_b,
                  CAST(sum(CAST(ca AS HUGEINT) * r2) AS HUGEINT) AS r2a,
                  CAST(sum(CAST(cb AS HUGEINT) * r2) AS HUGEINT) AS r2b
           FROM r GROUP BY lang)
         SELECT lang, n_a, n_b,
                CAST(r2a - CAST(n_a AS HUGEINT) * (n_a + 1) AS BIGINT)
                  AS u2_a,
                CAST(r2b - CAST(n_b AS HUGEINT) * (n_b + 1) AS BIGINT)
                  AS u2_b,
                (r2a - CAST(n_a AS HUGEINT) * (n_a + 1)) +
                (r2b - CAST(n_b AS HUGEINT) * (n_b + 1)) =
                  2 * CAST(n_a AS HUGEINT) * n_b AS identity_ok
         FROM m""",
    "q284_metric_parity" ->
      """WITH ev AS (
           SELECT user_id % 5 AS cohort,
                  CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                    AS is_p
           FROM events),
         g AS (SELECT CAST(sum(is_p) * 1000000 // count(*) AS BIGINT)
                 AS global_rate_ppm
               FROM ev),
         c AS (SELECT cohort, CAST(count(*) AS BIGINT) AS n_events,
                      CAST(sum(is_p) AS BIGINT) AS n_purchases
               FROM ev GROUP BY cohort)
         SELECT c.cohort, c.n_events, c.n_purchases,
                CAST(c.n_purchases * 1000000 // c.n_events AS BIGINT)
                  AS rate_ppm,
                g.global_rate_ppm,
                abs(CAST(c.n_purchases * 1000000 // c.n_events AS BIGINT)
                    - g.global_rate_ppm) AS gap_ppm
         FROM c, g""",
    "q283_cuped" ->
      """WITH per AS (
           SELECT user_id,
                  CAST(sum(CASE WHEN CAST(ts AS DATE) <= DATE '2024-01-15'
                       THEN CAST(floor(value * 1000000) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS x,
                  CAST(sum(CASE WHEN CAST(ts AS DATE) > DATE '2024-01-15'
                       THEN CAST(floor(value * 1000000) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS y,
                  CAST(concat('0x', substr(md5(concat('arm|',
                       CAST(user_id AS VARCHAR))), 1, 12)) AS UBIGINT) % 2
                    AS arm
           FROM events WHERE value IS NOT NULL
           GROUP BY user_id),
         mom AS (
           SELECT CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
                  CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
                  CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
                  CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
                  CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
           FROM per),
         arms AS (
           SELECT arm, CAST(count(*) AS BIGINT) AS n_users,
                  CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS sxa,
                  CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sya
           FROM per GROUP BY arm)
         SELECT CAST(a.arm AS BIGINT) AS arm, a.n_users,
                CAST(a.sya AS DOUBLE) / CAST(a.n_users AS DOUBLE)
                  AS mean_y_u,
                (CAST(a.sya AS DOUBLE) / CAST(a.n_users AS DOUBLE)) -
                (CAST(m.n * m.sxy - m.sx * m.sy AS DOUBLE) /
                 CAST(m.n * m.sxx - m.sx * m.sx AS DOUBLE)) *
                ((CAST(a.sxa AS DOUBLE) / CAST(a.n_users AS DOUBLE)) -
                 (CAST(m.sx AS DOUBLE) / CAST(m.n AS DOUBLE)))
                  AS mean_y_cuped_u,
                CAST(m.n * m.sxy - m.sx * m.sy AS DOUBLE) /
                CAST(m.n * m.sxx - m.sx * m.sx AS DOUBLE) AS theta,
                CAST(m.n * m.sxy - m.sx * m.sy AS DOUBLE) *
                CAST(m.n * m.sxy - m.sx * m.sy AS DOUBLE) /
                (CAST(m.n * m.sxx - m.sx * m.sx AS DOUBLE) *
                 CAST(m.n * m.syy - m.sy * m.sy AS DOUBLE)) AS rho2
         FROM arms a, mom m""",
    "q282_scd2_lookup" ->
      """WITH pt AS (
           SELECT user_id, epoch_us(ts) AS ts_us,
                  arg_max(event_type, event_id) AS state
           FROM events GROUP BY 1, 2),
         ch AS (
           SELECT user_id, ts_us, state,
                  lag(state) OVER (PARTITION BY user_id ORDER BY ts_us)
                    AS prev
           FROM pt),
         iv AS (
           SELECT user_id, ts_us AS valid_from, state,
                  lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us)
                    AS valid_to
           FROM ch WHERE prev IS NULL OR prev <> state),
         f AS (
           SELECT user_id, event_id, epoch_us(ts) AS ts_us
           FROM events WHERE event_type = 'purchase')
         SELECT f.user_id, f.event_id, f.ts_us, iv.state AS state_dim
         FROM f LEFT JOIN iv
           ON iv.user_id = f.user_id AND iv.valid_from <= f.ts_us
          AND (iv.valid_to IS NULL OR f.ts_us < iv.valid_to)""",
    "q278_topk_churn" ->
      """WITH ev AS (
           SELECT user_id,
                  (CAST(ts AS DATE) - DATE '2024-01-01') // 7 AS wk
           FROM events
           WHERE (CAST(ts AS DATE) - DATE '2024-01-01') // 7 BETWEEN 0 AND 3),
         cnt AS (
           SELECT wk, user_id, CAST(count(*) AS BIGINT) AS n
           FROM ev GROUP BY 1, 2),
         top AS (
           SELECT wk, user_id FROM (
             SELECT wk, user_id,
                    row_number() OVER (PARTITION BY wk
                      ORDER BY n DESC, user_id) AS rn
             FROM cnt) WHERE rn <= 20),
         pairs AS (SELECT unnest([0, 1, 2]) AS week_from)
         SELECT p.week_from,
                (SELECT CAST(count(*) AS BIGINT) FROM top b
                 WHERE b.wk = p.week_from + 1) AS n_top,
                (SELECT CAST(count(*) AS BIGINT) FROM top b
                 WHERE b.wk = p.week_from + 1
                   AND b.user_id NOT IN (SELECT user_id FROM top a
                                         WHERE a.wk = p.week_from))
                  AS n_entries,
                (SELECT CAST(count(*) AS BIGINT) FROM top a
                 WHERE a.wk = p.week_from
                   AND a.user_id NOT IN (SELECT user_id FROM top b
                                         WHERE b.wk = p.week_from + 1))
                  AS n_exits,
                (SELECT CAST(count(*) AS BIGINT) FROM top b
                 WHERE b.wk = p.week_from + 1
                   AND b.user_id IN (SELECT user_id FROM top a
                                     WHERE a.wk = p.week_from)) AS n_stayed
         FROM pairs p""",
    "q277_ks_by_segment" ->
      """WITH dom AS (
           SELECT lang, n_chars AS v,
                  CAST(sum(CASE WHEN CAST(substring(source, 4) AS INT)
                       % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
                  CAST(sum(CASE WHEN CAST(substring(source, 4) AS INT)
                       % 2 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS cb
           FROM documents GROUP BY 1, 2),
         c AS (
           SELECT lang,
                  CAST(sum(ca) OVER (PARTITION BY lang ORDER BY v
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cuma,
                  CAST(sum(cb) OVER (PARTITION BY lang ORDER BY v
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumb,
                  CAST(sum(ca) OVER (PARTITION BY lang) AS BIGINT) AS na,
                  CAST(sum(cb) OVER (PARTITION BY lang) AS BIGINT) AS nb
           FROM dom)
         SELECT lang, max(na) AS n_a, max(nb) AS n_b,
                CAST(max(abs(CAST(cuma AS HUGEINT) * nb -
                             CAST(cumb AS HUGEINT) * na)) AS BIGINT)
                  AS d_num,
                CAST(CASE WHEN max(na) > 0 AND max(nb) > 0 THEN
                     (max(abs(CAST(cuma AS HUGEINT) * nb -
                              CAST(cumb AS HUGEINT) * na)) * 1000000) //
                     (CAST(max(na) AS HUGEINT) * max(nb)) END AS BIGINT)
                  AS d_ppm
         FROM c GROUP BY lang""",
    "q275_interval_union" ->
      """WITH ev AS (
           SELECT user_id, event_id,
                  epoch_us(ts) // 1000000 AS st,
                  epoch_us(ts) // 1000000 + 300 AS en
           FROM events),
         w AS (
           SELECT user_id, event_id, st, en,
                  max(en) OVER (PARTITION BY user_id
                    ORDER BY st, en, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    AS pme
           FROM ev),
         i AS (
           SELECT user_id, st, en,
                  CAST(sum(CASE WHEN pme IS NULL OR st > pme
                           THEN 1 ELSE 0 END)
                    OVER (PARTITION BY user_id ORDER BY st, en, event_id
                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS island
           FROM w),
         g AS (
           SELECT user_id, island, min(st) AS i_st, max(en) AS i_en,
                  CAST(count(*) AS BIGINT) AS i_n
           FROM i GROUP BY 1, 2)
         SELECT user_id,
                CAST(sum(i_n) AS BIGINT) AS n_events,
                CAST(count(*) AS BIGINT) AS n_islands,
                CAST(sum(i_en - i_st) AS BIGINT) AS covered_sec
         FROM g GROUP BY user_id""",
    "q276_text_hygiene" ->
      """WITH d AS (
           SELECT source,
                  CASE WHEN doc_id % 17 = 0 THEN text || chr(7)
                       WHEN doc_id % 19 = 0 THEN text || chr(65533)
                       ELSE text END AS t
           FROM documents)
         SELECT source,
                CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(CASE WHEN regexp_matches(t,
                     '[\x00-\x08\x0B\x0C\x0E-\x1F]') THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_ctrl,
                CAST(sum(CASE WHEN contains(t, chr(65533))
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_replacement,
                CAST(count(*)
                     - sum(CASE WHEN regexp_matches(t,
                         '[\x00-\x08\x0B\x0C\x0E-\x1F]') THEN 1 ELSE 0 END)
                     - sum(CASE WHEN contains(t, chr(65533))
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_clean
         FROM d GROUP BY source""",
    "q272_corr_matrix" ->
      """WITH li AS (
           SELECT CAST(l_quantity AS BIGINT) AS x0,
                  CAST(round(l_extendedprice * 100) AS BIGINT) AS x1,
                  CAST(round(l_discount * 100) AS BIGINT) AS x2
           FROM lineitem),
         m AS (
           SELECT CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(CAST(x0 AS HUGEINT)) AS HUGEINT) AS s_x0,
                  CAST(sum(CAST(x1 AS HUGEINT)) AS HUGEINT) AS s_x1,
                  CAST(sum(CAST(x2 AS HUGEINT)) AS HUGEINT) AS s_x2,
                  CAST(sum(CAST(x0 AS HUGEINT) * x0) AS HUGEINT) AS p00,
                  CAST(sum(CAST(x0 AS HUGEINT) * x1) AS HUGEINT) AS p01,
                  CAST(sum(CAST(x0 AS HUGEINT) * x2) AS HUGEINT) AS p02,
                  CAST(sum(CAST(x1 AS HUGEINT) * x1) AS HUGEINT) AS p11,
                  CAST(sum(CAST(x1 AS HUGEINT) * x2) AS HUGEINT) AS p12,
                  CAST(sum(CAST(x2 AS HUGEINT) * x2) AS HUGEINT) AS p22
           FROM li)
         SELECT 'x0' AS col_a, 'x1' AS col_b, n,
                CAST(n * p01 - s_x0 * s_x1 AS DOUBLE) /
                sqrt(CAST(n * p00 - s_x0 * s_x0 AS DOUBLE) *
                     CAST(n * p11 - s_x1 * s_x1 AS DOUBLE)) AS pearson
         FROM m
         UNION ALL
         SELECT 'x0', 'x2', n,
                CAST(n * p02 - s_x0 * s_x2 AS DOUBLE) /
                sqrt(CAST(n * p00 - s_x0 * s_x0 AS DOUBLE) *
                     CAST(n * p22 - s_x2 * s_x2 AS DOUBLE))
         FROM m
         UNION ALL
         SELECT 'x1', 'x2', n,
                CAST(n * p12 - s_x1 * s_x2 AS DOUBLE) /
                sqrt(CAST(n * p11 - s_x1 * s_x1 AS DOUBLE) *
                     CAST(n * p22 - s_x2 * s_x2 AS DOUBLE))
         FROM m""",
    "q273_group_ols" ->
      """WITH ev AS (
           SELECT event_type,
                  CAST(extract(hour FROM ts) AS BIGINT) AS x,
                  CAST(floor(value * 1000000) AS BIGINT) AS y
           FROM events WHERE value IS NOT NULL),
         m AS (
           SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
                  CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
                  CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
                  CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
           FROM ev GROUP BY event_type)
         SELECT event_type, n,
                CAST(n * sxy - sx * sy AS DOUBLE) /
                CAST(n * sxx - sx * sx AS DOUBLE) AS slope_u,
                CAST(sy * sxx - sx * sxy AS DOUBLE) /
                CAST(n * sxx - sx * sx AS DOUBLE) AS intercept_u
         FROM m""",
    "q270_forecast_backtest" ->
      """WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day,
                  CAST(count(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
         fc AS (
           SELECT event_type, day + 7 AS day, n AS f FROM daily),
         j AS (
           SELECT d.event_type, d.n, fc.f,
                  CAST(abs(d.n - fc.f) * 2000000 // (d.n + fc.f) AS BIGINT)
                    AS term_ppm
           FROM daily d JOIN fc USING (event_type, day))
         SELECT event_type,
                CAST(count(*) AS BIGINT) AS n_days,
                CAST(sum(n) AS BIGINT) AS sum_actual,
                CAST(sum(abs(n - f)) AS BIGINT) AS sum_abs_err,
                CAST(sum(term_ppm) // count(*) AS BIGINT) AS smape_ppm
         FROM j GROUP BY event_type""",
    "q268_cube_stats" ->
      """SELECT CASE WHEN GROUPING(lang) = 1 THEN '<all>'
                     ELSE coalesce(lang, '<null>') END AS lang,
                CASE WHEN GROUPING(source) = 1 THEN '<all>'
                     ELSE coalesce(source, '<null>') END AS source,
                CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(n_chars) AS BIGINT) AS total_chars
         FROM documents GROUP BY CUBE(lang, source)""",
    "q269_analytic_trio" ->
      """SELECT doc_id, lang, n_chars,
                percent_rank() OVER w AS pr,
                cume_dist() OVER w AS cd,
                CAST(ntile(4) OVER w AS INT) AS quartile
         FROM documents
         WINDOW w AS (PARTITION BY lang ORDER BY n_chars, doc_id)""",
    "q258_link_prediction" ->
      """WITH e AS (
           SELECT DISTINCT least(a.l_partkey, b.l_partkey) AS a,
                  greatest(a.l_partkey, b.l_partkey) AS b
           FROM lineitem a JOIN lineitem b
             ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
         nbrs AS (
           SELECT a AS w, b AS x FROM e
           UNION ALL SELECT b AS w, a AS x FROM e),
         deg AS (
           SELECT w, CAST(count(*) AS BIGINT) AS deg
           FROM nbrs GROUP BY w HAVING count(*) <= 50),
         br AS (SELECT n.w, n.x, d.deg FROM nbrs n JOIN deg d USING (w)),
         cand AS (
           SELECT p.x AS u, q.x AS v,
                  CAST(count(*) AS BIGINT) AS n_common,
                  CAST(sum(1000000 // p.deg) AS BIGINT) AS ra_ppm
           FROM br p JOIN br q ON p.w = q.w AND p.x < q.x
           GROUP BY 1, 2),
         nonadj AS (
           SELECT c.* FROM cand c
           WHERE NOT EXISTS (SELECT 1 FROM e
                             WHERE e.a = c.u AND e.b = c.v))
         SELECT u AS src, v AS dst, n_common, ra_ppm
         FROM nonadj ORDER BY ra_ppm DESC, u, v LIMIT 50""",
    // q251/q252: the binned stores replay as a relational re-bin of the
    // date-filtered events — DuckDB recomputes the same ≤20-bin two-sample
    // counts and the same integer statistics over them
    "q251_ks_binned_store" ->
      """WITH ev AS (
           SELECT event_type,
                  CAST(least(greatest(floor(value / 25.0), 0), 19) AS INT)
                    AS bin
           FROM events
           WHERE value IS NOT NULL AND event_type IN ('click', 'error')
             AND CAST(ts AS DATE) BETWEEN DATE '2024-01-05'
                                      AND DATE '2024-01-25'),
         dom AS (
           SELECT bin,
                  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                       AS BIGINT) AS ca,
                  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                       AS BIGINT) AS cb
           FROM ev GROUP BY bin),
         c AS (
           SELECT CAST(sum(ca) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING)
                       AS BIGINT) AS cuma,
                  CAST(sum(cb) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING)
                       AS BIGINT) AS cumb,
                  CAST(sum(ca) OVER () AS BIGINT) AS na,
                  CAST(sum(cb) OVER () AS BIGINT) AS nb
           FROM dom)
         SELECT max(na) AS n_a, max(nb) AS n_b,
                CAST(max(abs(CAST(cuma AS HUGEINT) * nb -
                             CAST(cumb AS HUGEINT) * na)) AS BIGINT) AS d_num,
                CAST((max(abs(CAST(cuma AS HUGEINT) * nb -
                              CAST(cumb AS HUGEINT) * na)) * 1000000) //
                     (CAST(max(na) AS HUGEINT) * max(nb)) AS BIGINT) AS d_ppm
         FROM c""",
    "q252_mwu_binned_store" ->
      """WITH ev AS (
           SELECT event_type,
                  CAST(least(greatest(floor(value / 25.0), 0), 19) AS INT)
                    AS bin
           FROM events
           WHERE value IS NOT NULL AND event_type IN ('click', 'error')
             AND CAST(ts AS DATE) BETWEEN DATE '2024-01-05'
                                      AND DATE '2024-01-25'),
         dom AS (
           SELECT bin,
                  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                       AS BIGINT) AS ca,
                  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                       AS BIGINT) AS cb
           FROM ev GROUP BY bin),
         r AS (
           SELECT ca, cb,
                  2 * coalesce(sum(ca + cb) OVER (ORDER BY bin
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    + (ca + cb) + 1 AS r2
           FROM dom),
         m AS (
           SELECT CAST(sum(ca) AS BIGINT) AS n_a,
                  CAST(sum(cb) AS BIGINT) AS n_b,
                  CAST(sum(CAST(ca AS HUGEINT) * r2) AS HUGEINT) AS r2a,
                  CAST(sum(CAST(cb AS HUGEINT) * r2) AS HUGEINT) AS r2b
           FROM r)
         SELECT n_a, n_b,
                CAST(r2a - CAST(n_a AS HUGEINT) * (n_a + 1) AS BIGINT) AS u2_a,
                CAST(r2b - CAST(n_b AS HUGEINT) * (n_b + 1) AS BIGINT) AS u2_b,
                (r2a - CAST(n_a AS HUGEINT) * (n_a + 1)) +
                (r2b - CAST(n_b AS HUGEINT) * (n_b + 1)) =
                  2 * CAST(n_a AS HUGEINT) * n_b AS identity_ok
         FROM m""",
    // the retraction contract: base + inserts - deletes == direct agg
    // over the survivors
    "q242_ivm_retract" ->
      """SELECT event_type,
                CAST(count(*) AS BIGINT) AS n,
                CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT)
                  AS sum_v
         FROM events
         WHERE value IS NOT NULL
           AND (event_id % 5 = 0 OR event_id % 7 <> 0)
         GROUP BY event_type""",
    // the IVM contract: incremental union == the plain full join
    "q241_ivm_join" ->
      """SELECT o.o_orderkey, o.o_custkey, o.o_totalprice, c.c_mktsegment
         FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey""",
    "q224_decay_attribution" ->
      """WITH ev AS (
           SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us
           FROM events),
         c AS (SELECT user_id, event_id AS click_id, ts_us AS cts FROM ev
               WHERE event_type = 'click'),
         p AS (SELECT user_id, event_id AS purchase_id, ts_us AS pts FROM ev
               WHERE event_type = 'purchase'),
         j AS (
           SELECT p.user_id, p.purchase_id, c.click_id,
                  (p.pts - c.cts) // 3600000000 AS age_h
           FROM p JOIN c ON c.user_id = p.user_id
             AND c.cts < p.pts AND c.cts >= p.pts - 86400000000),
         wgt AS (
           SELECT *, (CAST(1 AS BIGINT) << (23 - CAST(age_h AS INT))) AS w
           FROM j)
         SELECT user_id, purchase_id, click_id,
                CAST(age_h AS BIGINT) AS age_h,
                CAST((CAST(w AS HUGEINT) * 1000000) //
                     (sum(w) OVER (PARTITION BY purchase_id)) AS BIGINT)
                  AS credit_ppm
         FROM wgt""",
    "q237_wow_change" ->
      """WITH weekly AS (
           SELECT event_type,
                  CAST(date_trunc('week', CAST(ts AS DATE)) AS DATE) AS week,
                  CAST(count(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2)
         SELECT event_type, week, n,
                CAST(lag(n) OVER (PARTITION BY event_type ORDER BY week)
                     AS BIGINT) AS prev_n,
                CAST((CAST(n - lag(n) OVER (PARTITION BY event_type
                      ORDER BY week) AS HUGEINT) * 1000000) //
                     nullif(lag(n) OVER (PARTITION BY event_type
                      ORDER BY week), 0) AS BIGINT) AS wow_change_ppm
         FROM weekly""",
    // proves the grid pipeline == brute force: the oracle IS the cross
    // join with the exact distance predicate
    "q235_spatial_grid_join" ->
      """WITH pts AS (
           SELECT o_orderkey AS id,
                  (o_orderkey * 37) % 500 AS x,
                  (o_custkey * 73) % 500 AS y
           FROM orders WHERE o_orderkey <= 3000)
         SELECT a.id AS id_a, b.id AS id_b,
                CAST((a.x - b.x) * (a.x - b.x) +
                     (a.y - b.y) * (a.y - b.y) AS BIGINT) AS d2
         FROM pts a JOIN pts b ON a.id < b.id
         WHERE (a.x - b.x) * (a.x - b.x) +
               (a.y - b.y) * (a.y - b.y) <= 100""",
    "q233_growth_metrics" ->
      """WITH ud AS (
           SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
         days AS (SELECT DISTINCT day FROM ud),
         dau AS (
           SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS dau
           FROM ud GROUP BY 1),
         wau AS (
           SELECT d.day, CAST(count(DISTINCT u.user_id) AS BIGINT) AS wau
           FROM days d JOIN ud u ON u.day BETWEEN d.day - 6 AND d.day
           GROUP BY 1),
         ret AS (
           SELECT a.day, CAST(count(DISTINCT a.user_id) AS BIGINT)
                  AS returning
           FROM ud a
           WHERE EXISTS (SELECT 1 FROM ud b WHERE b.user_id = a.user_id
                         AND b.day BETWEEN a.day - 7 AND a.day - 1)
           GROUP BY 1)
         SELECT d.day, d.dau, w.wau,
                CAST(coalesce(r.returning, 0) AS BIGINT) AS returning,
                CAST((CAST(coalesce(r.returning, 0) AS HUGEINT) * 1000000)
                     // d.dau AS BIGINT) AS returning_ppm,
                CAST((CAST(d.dau AS HUGEINT) * 1000) // w.wau AS BIGINT)
                  AS stickiness_x1000
         FROM dau d JOIN wau w USING (day) LEFT JOIN ret r USING (day)""",
    "q223_quantile_normalize" ->
      """WITH srcdom AS (
           SELECT source, n_chars, CAST(count(*) AS BIGINT) AS c
           FROM documents GROUP BY 1, 2),
         srcpct AS (
           SELECT source, n_chars,
                  CAST((CAST(sum(c) OVER (PARTITION BY source ORDER BY n_chars
                       ROWS UNBOUNDED PRECEDING) AS HUGEINT) * 1000000) //
                       (sum(c) OVER (PARTITION BY source)) AS BIGINT) AS s_pct
           FROM srcdom),
         gdom AS (
           SELECT n_chars, CAST(count(*) AS BIGINT) AS c
           FROM documents GROUP BY 1),
         gn AS (SELECT CAST(count(*) AS BIGINT) AS gn FROM documents),
         gpct AS (
           SELECT n_chars AS g_value,
                  CAST((CAST(sum(c) OVER (ORDER BY n_chars
                       ROWS UNBOUNDED PRECEDING) AS HUGEINT) * 1000000) //
                       gn.gn AS BIGINT) AS g_pct
           FROM gdom CROSS JOIN gn),
         mapped AS (
           SELECT s.source, s.n_chars, s.s_pct,
                  CAST(min(g.g_value) AS BIGINT) AS normalized
           FROM srcpct s JOIN gpct g ON g.g_pct >= s.s_pct
           GROUP BY 1, 2, 3)
         SELECT d.doc_id, d.source, d.n_chars, m.s_pct, m.normalized
         FROM documents d JOIN mapped m USING (source, n_chars)""",
    "q222_rate_limit_audit" ->
      """WITH ev AS (
           SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
         win AS (
           SELECT event_type,
                  CAST(count(*) OVER (PARTITION BY user_id ORDER BY ts_us
                       RANGE BETWEEN 60000000 PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS n_in_window
           FROM ev)
         SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
                CAST(sum(CASE WHEN n_in_window > 10 THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_throttled,
                CAST(max(n_in_window) AS BIGINT) AS max_burst
         FROM win GROUP BY event_type""",
    "q219_recommendations" ->
      """WITH seen AS (
           SELECT DISTINCT o.o_custkey, l.l_partkey
           FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey),
         wall AS (
           SELECT a.l_partkey AS src, b.l_partkey AS dst,
                  CAST(count(*) AS BIGINT) AS co_n
           FROM lineitem a JOIN lineitem b
             ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
           GROUP BY 1, 2),
         w AS (
           SELECT src, dst, co_n FROM (
             SELECT *, row_number() OVER (PARTITION BY src
                  ORDER BY co_n DESC, dst) AS r
             FROM wall) WHERE r <= 20),
         scored AS (
           SELECT s.o_custkey, w.dst AS rec_part,
                  CAST(sum(w.co_n) AS BIGINT) AS score
           FROM seen s JOIN w ON w.src = s.l_partkey
           GROUP BY 1, 2),
         unseen AS (
           SELECT sc.* FROM scored sc
           ANTI JOIN seen s
             ON s.o_custkey = sc.o_custkey AND s.l_partkey = sc.rec_part)
         SELECT o_custkey, rec_part, score, CAST(rn AS INT) AS rec_rank
         FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
                 ORDER BY score DESC, rec_part) AS rn
               FROM unseen)
         WHERE rn <= 3""",
    // resume-from-checkpoint must reproduce the straight run bit-for-bit
    "q203_pagerank_resume" -> pagerankSql,
    "q204_lerp_impute" ->
      """WITH obs0 AS (
           SELECT event_type, CAST(ts AS DATE) AS day,
                  CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT)
                    AS sum_u
           FROM events GROUP BY 1, 2),
         obs AS (SELECT * FROM obs0 WHERE extract(day FROM day) % 3 <> 0),
         grid AS (
           SELECT event_type, unnest(generate_series(min(day), max(day),
                  INTERVAL 1 DAY))::DATE AS day
           FROM obs GROUP BY event_type),
         j AS (
           SELECT g.event_type, g.day, o.sum_u,
                  CASE WHEN o.sum_u IS NOT NULL THEN g.day END AS vday
           FROM grid g LEFT JOIN obs o USING (event_type, day)),
         w AS (
           SELECT event_type, day, sum_u,
                  last_value(sum_u IGNORE NULLS) OVER (
                    PARTITION BY event_type ORDER BY day
                    ROWS UNBOUNDED PRECEDING) AS prev_u,
                  last_value(vday IGNORE NULLS) OVER (
                    PARTITION BY event_type ORDER BY day
                    ROWS UNBOUNDED PRECEDING) AS prev_d,
                  first_value(sum_u IGNORE NULLS) OVER (
                    PARTITION BY event_type ORDER BY day
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                    AS next_u,
                  first_value(vday IGNORE NULLS) OVER (
                    PARTITION BY event_type ORDER BY day
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                    AS next_d
           FROM j)
         SELECT event_type, day, sum_u IS NULL AS is_imputed,
                CAST(CASE WHEN sum_u IS NOT NULL THEN sum_u
                     ELSE prev_u + ((next_u - prev_u) *
                          date_diff('day', prev_d, day)) //
                          date_diff('day', prev_d, next_d)
                     END AS BIGINT) AS value_u
         FROM w""",
    "q148_label_propagation" -> labelPropSql,
    // floor() on both sides: Spark cast-to-long truncates while DuckDB's
    // CAST rounds; explicit floor removes the dependence on quantities
    // happening to be integral
    "q146_item_similarity" ->
      """WITH posts AS (
           SELECT l_partkey AS id, l_orderkey AS term,
                  CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS cnt
           FROM lineitem GROUP BY 1, 2),
         kept AS (SELECT * FROM posts WHERE term NOT IN (
                    SELECT term FROM posts GROUP BY term HAVING count(*) > 100)),
         norms AS (SELECT id, sum(cnt * cnt) AS norm2 FROM kept GROUP BY id),
         dots AS (
           SELECT a.id AS item_a, b.id AS item_b, sum(a.cnt * b.cnt) AS dot
           FROM kept a JOIN kept b ON a.term = b.term AND a.id < b.id
           GROUP BY 1, 2),
         scored AS (
           SELECT item_a, item_b, CAST(dot AS BIGINT) AS dot,
                  CAST(dot AS DOUBLE) /
                    sqrt(CAST(na.norm2 AS DOUBLE) * CAST(nb.norm2 AS DOUBLE)) AS c
           FROM dots
           JOIN norms na ON na.id = item_a
           JOIN norms nb ON nb.id = item_b)
         SELECT item_a, item_b, dot, round(c, 9) AS cos
         FROM scored WHERE c >= 0.15""",
    "q144_psi_drift" ->
      """WITH src AS (
           SELECT value, (CAST(ts AS DATE) <= DATE '2024-01-15') AS is_base
           FROM events WHERE value IS NOT NULL),
         e AS (SELECT quantile_cont(value,
                 [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS edges
               FROM src WHERE is_base),
         b AS (SELECT CAST(len(list_filter(e.edges, x -> s.value > x)) AS INT)
                 AS bin, s.is_base
               FROM src s, e),
         c AS (SELECT bin,
                 CAST(sum(CASE WHEN is_base THEN 1 ELSE 0 END) AS BIGINT) AS n_base,
                 CAST(sum(CASE WHEN is_base THEN 0 ELSE 1 END) AS BIGINT) AS n_curr
               FROM b GROUP BY bin),
         t AS (SELECT CAST(sum(CASE WHEN is_base THEN 1 ELSE 0 END) AS DOUBLE) AS tb,
                      CAST(sum(CASE WHEN is_base THEN 0 ELSE 1 END) AS DOUBLE) AS tc
               FROM src)
         SELECT bin, n_base, n_curr,
                CAST(n_base AS DOUBLE) / tb AS p_base,
                CAST(n_curr AS DOUBLE) / tc AS p_curr,
                CASE WHEN n_base > 0 AND n_curr > 0
                     THEN round((CAST(n_base AS DOUBLE) / tb
                               - CAST(n_curr AS DOUBLE) / tc)
                          * ln((CAST(n_base AS DOUBLE) / tb)
                             / (CAST(n_curr AS DOUBLE) / tc)), 9)
                END AS psi_contrib
         FROM c, t""",
    "q141_event_sequences" ->
      """WITH ev AS (
           SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type
           FROM events),
         r AS (SELECT *, row_number() OVER (
                 PARTITION BY user_id ORDER BY ts_us, event_id) AS rn,
                 count(*) OVER (PARTITION BY user_id) AS cnt
               FROM ev)
         SELECT user_id, CAST(max(cnt) AS BIGINT) AS n_events,
                CAST(count(*) AS INT) AS seq_len,
                array_to_string(list(event_type ORDER BY ts_us, event_id), '>')
                  AS seq
         FROM r WHERE rn <= 20 GROUP BY user_id""",
    "q142_trailing_actives" ->
      """WITH active AS (
           SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
         span AS (SELECT min(day) AS d0, max(day) AS d1 FROM active),
         rep AS (SELECT user_id, day + CAST(o.o AS INT) AS day
                 FROM active, (SELECT unnest(range(0, 7)) AS o) o)
         SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS wau_7d
         FROM rep, span WHERE day BETWEEN d0 AND d1 GROUP BY 1""",
    "q136_retention_cohorts" ->
      """WITH active AS (
           SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
         c AS (SELECT user_id, day,
                 min(day) OVER (PARTITION BY user_id) AS cohort_day
               FROM active)
         SELECT cohort_day,
                CAST(date_diff('day', cohort_day, day) AS INT) AS day_offset,
                CAST(count(*) AS BIGINT) AS n_users
         FROM c GROUP BY 1, 2""",
    "q137_scd2_intervals" ->
      """WITH ev AS (
           SELECT user_id, event_id, epoch_us(ts) AS ts_us,
                  event_type AS state
           FROM events),
         l AS (SELECT *, lag(state) OVER (
                 PARTITION BY user_id ORDER BY ts_us, event_id) AS prev
               FROM ev),
         c AS (SELECT user_id, event_id, ts_us, state FROM l
               WHERE prev IS NULL OR prev <> state)
         SELECT user_id, state, CAST(ts_us AS BIGINT) AS valid_from,
                CAST(lead(ts_us) OVER (
                  PARTITION BY user_id ORDER BY ts_us, event_id) AS BIGINT)
                  AS valid_to
         FROM c""",
    // orientation replayed for n_wedges (sum of C(outdeg,2) over the
    // (degree,id)-oriented graph); triangles counted orientation-free on
    // u<v canonical edges (x<y<z triple join) — same count by symmetry
    "q138_triangle_count" ->
      """WITH pairs AS (
           SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
           FROM lineitem a JOIN lineitem b
             ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
         e AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
               FROM pairs),
         deg AS (SELECT n, CAST(count(*) AS BIGINT) AS d FROM (
                   SELECT u AS n FROM e UNION ALL SELECT v FROM e)
                 GROUP BY n),
         o AS (SELECT CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.u ELSE e.v END AS s
               FROM e JOIN deg du ON du.n = e.u JOIN deg dv ON dv.n = e.v),
         od AS (SELECT s, count(*) AS c FROM o GROUP BY s),
         tri AS (SELECT count(*) AS c
                 FROM e e1 JOIN e e2 ON e2.u = e1.u AND e2.v > e1.v
                 JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v)
         SELECT CAST(tri.c AS BIGINT) AS n_triangles,
                CAST(coalesce((SELECT sum(c * (c - 1) // 2) FROM od), 0)
                  AS BIGINT) AS n_wedges,
                CAST((SELECT count(*) FROM e) AS BIGINT) AS n_edges,
                CAST((SELECT count(*) FROM deg) AS BIGINT) AS n_nodes
         FROM tri""",
    "q127_interval_join" ->
      """WITH ev AS (
           SELECT event_id, event_type, epoch_us(ts) AS ts_us, value
           FROM events),
         iv AS (
           SELECT event_type, ts_us AS win_start_us,
                  ts_us + 1800000000 AS win_end_us
           FROM ev GROUP BY event_type, ts_us HAVING max(value) >= 200.0)
         SELECT e.event_id, e.event_type, e.ts_us, i.win_start_us, i.win_end_us
         FROM ev e JOIN iv i USING (event_type)
         WHERE e.ts_us >= i.win_start_us AND e.ts_us <= i.win_end_us""",
    "q126_profile" ->
      """SELECT 'o_orderkey' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
                CAST(count(*) - count(o_orderkey) AS BIGINT) AS n_null,
                CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
                CAST(min(o_orderkey) AS DOUBLE) AS min_num,
                CAST(max(o_orderkey) AS DOUBLE) AS max_num,
                CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
         FROM orders
         UNION ALL
         SELECT 'o_custkey', CAST(count(*) AS BIGINT),
                CAST(count(*) - count(o_custkey) AS BIGINT),
                CAST(count(DISTINCT o_custkey) AS BIGINT),
                CAST(min(o_custkey) AS DOUBLE), CAST(max(o_custkey) AS DOUBLE),
                CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
         FROM orders
         UNION ALL
         SELECT 'o_totalprice', CAST(count(*) AS BIGINT),
                CAST(count(*) - count(o_totalprice) AS BIGINT),
                CAST(count(DISTINCT o_totalprice) AS BIGINT),
                min(o_totalprice), max(o_totalprice),
                CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
         FROM orders
         UNION ALL
         SELECT 'o_orderstatus', CAST(count(*) AS BIGINT),
                CAST(count(*) - count(o_orderstatus) AS BIGINT),
                CAST(count(DISTINCT o_orderstatus) AS BIGINT),
                CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
                min(o_orderstatus), max(o_orderstatus)
         FROM orders""",
    "q175_profile_drift" ->
      """WITH bef AS (
           SELECT lang, source, n_chars FROM documents WHERE doc_id % 2 = 0),
         aft AS (
           SELECT CASE WHEN source = 'web' THEN NULL ELSE lang END AS lang,
                  source, n_chars
           FROM documents WHERE doc_id % 2 <> 0),
         pa AS (
           SELECT 'lang' AS col_name, count(*) AS rows_a,
                  count(*) - count(lang) AS null_a,
                  count(DISTINCT lang) AS nd_a,
                  CAST(NULL AS DOUBLE) AS min_num_a,
                  CAST(NULL AS DOUBLE) AS max_num_a,
                  min(lang) AS min_str_a, max(lang) AS max_str_a FROM bef
           UNION ALL
           SELECT 'source', count(*), count(*) - count(source),
                  count(DISTINCT source), NULL, NULL,
                  min(source), max(source) FROM bef
           UNION ALL
           SELECT 'n_chars', count(*), count(*) - count(n_chars),
                  count(DISTINCT n_chars),
                  CAST(min(n_chars) AS DOUBLE), CAST(max(n_chars) AS DOUBLE),
                  NULL, NULL FROM bef),
         pb AS (
           SELECT 'lang' AS col_name, count(*) AS rows_b,
                  count(*) - count(lang) AS null_b,
                  count(DISTINCT lang) AS nd_b,
                  CAST(NULL AS DOUBLE) AS min_num_b,
                  CAST(NULL AS DOUBLE) AS max_num_b,
                  min(lang) AS min_str_b, max(lang) AS max_str_b FROM aft
           UNION ALL
           SELECT 'source', count(*), count(*) - count(source),
                  count(DISTINCT source), NULL, NULL,
                  min(source), max(source) FROM aft
           UNION ALL
           SELECT 'n_chars', count(*), count(*) - count(n_chars),
                  count(DISTINCT n_chars),
                  CAST(min(n_chars) AS DOUBLE), CAST(max(n_chars) AS DOUBLE),
                  NULL, NULL FROM aft),
         d AS (
           SELECT col_name,
                  CAST(rows_a AS BIGINT) AS rows_a,
                  CAST(rows_b AS BIGINT) AS rows_b,
                  CAST(CASE WHEN rows_a = 0 THEN 0
                       ELSE (CAST(null_a AS HUGEINT) * 1000000) // rows_a
                       END AS BIGINT) AS null_ppm_a,
                  CAST(CASE WHEN rows_b = 0 THEN 0
                       ELSE (CAST(null_b AS HUGEINT) * 1000000) // rows_b
                       END AS BIGINT) AS null_ppm_b,
                  CAST(nd_a AS BIGINT) AS nd_a,
                  CAST(nd_b AS BIGINT) AS nd_b,
                  CASE WHEN nd_a = 0 THEN NULL
                       ELSE CAST((CAST(nd_b AS HUGEINT) * 1000) // nd_a AS BIGINT)
                       END AS distinct_ratio_x1000,
                  (min_num_a IS DISTINCT FROM min_num_b OR
                   max_num_a IS DISTINCT FROM max_num_b OR
                   min_str_a IS DISTINCT FROM min_str_b OR
                   max_str_a IS DISTINCT FROM max_str_b) AS bounds_changed
           FROM pa JOIN pb USING (col_name))
         SELECT *,
                (abs(null_ppm_a - null_ppm_b) > 10000 OR
                 CASE WHEN distinct_ratio_x1000 IS NULL THEN true
                      ELSE distinct_ratio_x1000 < 500 OR
                           distinct_ratio_x1000 > 2000 END OR
                 bounds_changed) AS drift_flag
         FROM d""",
    "q123_bloom_join" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_orderkey = l_orderkey
                         AND o_totalprice > 450000.0)""",
    "q108_salted_join" ->
      """WITH dim AS (
           SELECT user_id, CAST(count(*) AS BIGINT) AS user_events
           FROM events GROUP BY user_id)
         SELECT e.user_id, e.event_id, e.value, d.user_events
         FROM events e JOIN dim d USING (user_id)""",
    "q01_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(sum(l_quantity) AS DOUBLE) AS sum_qty,
         CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
         CAST(count(*) AS BIGINT) AS n_rows
         FROM lineitem GROUP BY 1, 2""",
    "q02_join_gt_info" ->
      """SELECT o_orderkey, o_totalprice, c_name, c_mktsegment
         FROM orders JOIN customer ON o_custkey = c_custkey""",
    "q03_left_join_nomatch" ->
      """SELECT c_custkey, c_name, o_orderkey
         FROM customer LEFT JOIN orders ON c_custkey = o_custkey""",
    "q04_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey AND o_totalprice > 100000.0)""",
    "q05_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey AND o_totalprice > 150000.0)""",
    "q06_cross_join" ->
      """SELECT r_name, n_name FROM region CROSS JOIN nation""",
    "q07_union_merge_max" ->
      """SELECT uid, gt_uid, max(score_0) AS score_0, max(score_1) AS score_1 FROM (
           SELECT o_custkey AS uid, o_orderkey AS gt_uid,
                  o_totalprice AS score_0, CAST(NULL AS DOUBLE) AS score_1
           FROM orders WHERE o_orderstatus = 'O'
           UNION ALL
           SELECT o_custkey, o_orderkey, CAST(NULL AS DOUBLE), o_totalprice * 0.5
           FROM orders WHERE o_totalprice > 50000.0
         ) GROUP BY 1, 2""",
    "q08_best_match_window" ->
      """SELECT o_custkey, o_orderkey,
         CAST(row_number() OVER (PARTITION BY o_custkey
              ORDER BY o_totalprice DESC, o_orderkey DESC) AS INT) AS best_rank,
         (row_number() OVER (PARTITION BY o_custkey
              ORDER BY o_totalprice DESC, o_orderkey DESC) = 1
          AND o_totalprice > 0.0) AS best_match
         FROM orders""",
    "q09_topn_per_group" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice, rn FROM (
           SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
                  CAST(row_number() OVER (PARTITION BY l_suppkey
                       ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS INT) AS rn
           FROM lineitem) WHERE rn <= 3""",
    "q10_rank_diff_features" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice,
         CAST(row_number() OVER (PARTITION BY l_orderkey
              ORDER BY l_extendedprice DESC, l_linenumber) AS INT) AS score_rank,
         max(l_extendedprice) OVER (PARTITION BY l_orderkey) - l_extendedprice AS dist_to_max,
         l_extendedprice - min(l_extendedprice) OVER (PARTITION BY l_orderkey) AS dist_to_min,
         max(l_extendedprice) OVER (PARTITION BY l_orderkey)
           - min(l_extendedprice) OVER (PARTITION BY l_orderkey) AS ptp,
         l_extendedprice - lead(l_extendedprice, 1) OVER (PARTITION BY l_orderkey
              ORDER BY l_extendedprice DESC, l_linenumber) AS diff_to_next,
         lag(l_extendedprice, 1) OVER (PARTITION BY l_orderkey
              ORDER BY l_extendedprice DESC, l_linenumber) - l_extendedprice AS diff_to_prev
         FROM lineitem""",
    "q11_sni_pairs" ->
      """WITH ranked AS (
           SELECT p_partkey,
                  row_number() OVER (ORDER BY p_name, p_partkey) - 1 AS r
           FROM part)
         SELECT a.p_partkey AS uid, b.p_partkey AS gt_uid,
                1.0 - abs(a.r - b.r) / 4.0 AS sni_score
         FROM ranked a JOIN ranked b
           ON abs(a.r - b.r) <= 3 AND a.r <> b.r""",
    "q12_account_agg" ->
      """WITH grouped AS (
           SELECT l_orderkey AS account, l_suppkey AS gt_uid,
                  CAST(sum(CAST(l_quantity * l_extendedprice AS DECIMAL(38,6))) AS DOUBLE)
                  / CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS agg_score
           FROM lineitem GROUP BY 1, 2)
         SELECT account, gt_uid, agg_score FROM (
           SELECT account, gt_uid, agg_score,
                  row_number() OVER (PARTITION BY account
                       ORDER BY agg_score DESC, gt_uid) AS rn
           FROM grouped) WHERE rn = 1""",
    "q13_dup_uid_check" ->
      """SELECT user_id, CAST(count(*) AS BIGINT) AS n
         FROM events GROUP BY user_id HAVING count(*) > 1""",
    "q14_events_hourly" ->
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch, event_type,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
         FROM events GROUP BY 1, 2""",
    "q86_asof_forward" ->
      """WITH ev AS (
           SELECT event_id, event_type, epoch_us(ts) AS ts_us, value
           FROM events),
         big AS (
           SELECT event_type, ts_us, ts_us AS big_ts_us,
                  max(value) AS big_value
           FROM ev GROUP BY event_type, ts_us HAVING max(value) >= 200.0)
         SELECT e.event_id, e.event_type, e.ts_us, e.value,
                b.big_ts_us AS big_ts_us_asof, b.big_value AS big_value_asof
         FROM ev e ASOF LEFT JOIN big b
           ON e.event_type = b.event_type AND e.ts_us <= b.ts_us""",
    "q84_sessionize" ->
      """WITH ev AS (
           SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events),
         g AS (
           SELECT event_id, user_id, ts_us,
                  CASE WHEN ts_us - lag(ts_us) OVER w IS NULL
                         OR ts_us - lag(ts_us) OVER w > 1800000000
                       THEN 1 ELSE 0 END AS ns
           FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
         s AS (
           SELECT user_id, ts_us,
                  sum(ns) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
           FROM g)
         SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
                CAST(count(*) AS BIGINT) AS n_events,
                CAST(min(ts_us) AS BIGINT) AS start_us,
                CAST(max(ts_us) AS BIGINT) AS end_us
         FROM s GROUP BY 1, 2""",
    "q118_topk_agg" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice, rn FROM (
           SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
                  CAST(row_number() OVER (PARTITION BY l_suppkey
                       ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS INT) AS rn
           FROM lineitem) WHERE rn <= 3""",
    "q112_asof_tolerance" ->
      """WITH ev AS (
           SELECT event_id, event_type, epoch_us(ts) AS ts_us, value
           FROM events),
         big AS (
           SELECT event_type, ts_us, ts_us AS big_ts_us,
                  max(value) AS big_value
           FROM ev GROUP BY event_type, ts_us HAVING max(value) >= 200.0)
         SELECT e.event_id, e.event_type, e.ts_us, e.value,
                CASE WHEN e.ts_us - b.ts_us <= 3600000000
                     THEN b.big_ts_us END AS big_ts_us_asof,
                CASE WHEN e.ts_us - b.ts_us <= 3600000000
                     THEN b.big_value END AS big_value_asof
         FROM ev e ASOF LEFT JOIN big b
           ON e.event_type = b.event_type AND e.ts_us >= b.ts_us""",
    "q83_asof_join" ->
      """WITH ev AS (
           SELECT event_id, event_type, epoch_us(ts) AS ts_us, value
           FROM events),
         big AS (
           SELECT event_type, ts_us, ts_us AS big_ts_us,
                  max(value) AS big_value
           FROM ev GROUP BY event_type, ts_us HAVING max(value) >= 200.0)
         SELECT e.event_id, e.event_type, e.ts_us, e.value,
                b.big_ts_us AS big_ts_us_asof, b.big_value AS big_value_asof
         FROM ev e ASOF LEFT JOIN big b
           ON e.event_type = b.event_type AND e.ts_us >= b.ts_us""",
    "q96_funnel" ->
      """WITH ev AS (
           SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us
           FROM events),
         clicks AS (
           SELECT event_id, user_id, ts_us FROM ev WHERE event_type = 'click'),
         p AS (
           SELECT DISTINCT user_id, ts_us AS pts FROM ev
           WHERE event_type = 'purchase'),
         conv AS (
           SELECT c.user_id, c.event_id, c.ts_us, min(p.pts) AS next_p
           FROM clicks c LEFT JOIN p
             ON p.user_id = c.user_id AND p.pts >= c.ts_us
           GROUP BY 1, 2, 3)
         SELECT user_id, CAST(count(*) AS BIGINT) AS n_clicks,
                CAST(sum(CASE WHEN next_p IS NOT NULL
                               AND next_p - ts_us <= 3600000000
                              THEN 1 ELSE 0 END) AS BIGINT) AS n_converted
         FROM conv GROUP BY user_id""",
    "q98_json_extract" ->
      """SELECT event_id,
                CAST(json_extract_string(props, '$.k') AS INT) AS k
         FROM events""",
    "q92_rolling_window" ->
      """SELECT event_id, user_id, ts_us, value,
                CAST(count(*) OVER w AS BIGINT) AS n_prev_hour,
                CAST(sum(CAST(value AS DECIMAL(38,6))) OVER w AS DOUBLE) AS sum_prev_hour
         FROM (SELECT event_id, user_id, epoch_us(ts) AS ts_us, value FROM events)
         WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
                      RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)""",
    "q93_rollup_stats" ->
      """SELECT CASE WHEN GROUPING(lang) = 1 THEN '<all>'
                     ELSE coalesce(lang, '<null>') END AS lang,
                CASE WHEN GROUPING(source) = 1 THEN '<all>'
                     ELSE coalesce(source, '<null>') END AS source,
                CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(CAST(n_chars AS BIGINT)) AS BIGINT) AS total_chars
         FROM documents GROUP BY ROLLUP (lang, source)""",
    "q131_merge_upsert" ->
      """WITH base AS (
           SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus,
                  CAST(-1 AS BIGINT) AS version, 'upsert' AS op FROM orders),
         changes AS (
           SELECT o_orderkey, o_custkey,
                  o_totalprice * CAST(1.1 AS DOUBLE) AS o_totalprice,
                  'U' AS o_orderstatus, CAST(1 AS BIGINT) AS version,
                  'upsert' AS op
           FROM orders WHERE o_orderkey % 7 = 0
           UNION ALL
           SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus,
                  CAST(2 AS BIGINT), 'delete'
           FROM orders WHERE o_orderkey % 13 = 0
           UNION ALL
           SELECT o_orderkey + 100000000, o_custkey, CAST(1000.0 AS DOUBLE),
                  'N', CAST(1 AS BIGINT), 'upsert'
           FROM orders WHERE o_orderkey % 97 = 0),
         u AS (SELECT * FROM base UNION ALL SELECT * FROM changes),
         w AS (SELECT *, row_number() OVER (PARTITION BY o_orderkey
                         ORDER BY version DESC) AS rn FROM u)
         SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
         FROM w WHERE rn = 1 AND op <> 'delete'""",
    "q132_snapshot_diff" ->
      """WITH oldsnap AS (
           SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders),
         newsnap AS (
           SELECT o_orderkey,
                  CASE WHEN o_orderkey % 7 = 0
                       THEN o_totalprice * CAST(1.1 AS DOUBLE)
                       ELSE o_totalprice END AS o_totalprice,
                  CASE WHEN o_orderkey % 7 = 0 THEN 'U'
                       ELSE o_orderstatus END AS o_orderstatus
           FROM orders WHERE o_orderkey % 13 <> 0
           UNION ALL
           SELECT o_orderkey + 100000000, CAST(1000.0 AS DOUBLE), 'N'
           FROM orders WHERE o_orderkey % 97 = 0)
         SELECT * FROM (
           SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
                  CASE WHEN o.o_orderkey IS NULL THEN 'added'
                       WHEN n.o_orderkey IS NULL THEN 'removed'
                       WHEN NOT (o.o_totalprice IS NOT DISTINCT FROM n.o_totalprice
                                 AND o.o_orderstatus IS NOT DISTINCT FROM n.o_orderstatus)
                       THEN 'changed' ELSE 'unchanged' END AS change_type,
                  o.o_totalprice AS old_o_totalprice,
                  n.o_totalprice AS new_o_totalprice,
                  o.o_orderstatus AS old_o_orderstatus,
                  n.o_orderstatus AS new_o_orderstatus
           FROM oldsnap o FULL OUTER JOIN newsnap n
             ON o.o_orderkey IS NOT DISTINCT FROM n.o_orderkey)
         WHERE change_type <> 'unchanged'""",
    "q133_ohlc_bars" ->
      """WITH ev AS (
           SELECT event_id, event_type, epoch_us(ts) AS ts_us, value
           FROM events),
         b AS (SELECT *, ts_us // 900000000 AS bucket FROM ev),
         r AS (SELECT event_type, bucket, value,
                 row_number() OVER (PARTITION BY event_type, bucket
                      ORDER BY ts_us, event_id) AS rn_a,
                 row_number() OVER (PARTITION BY event_type, bucket
                      ORDER BY ts_us DESC, event_id DESC) AS rn_d
               FROM b)
         SELECT event_type, CAST(bucket AS BIGINT) AS bucket,
                max(CASE WHEN rn_a = 1 THEN value END) AS open,
                max(CASE WHEN rn_d = 1 THEN value END) AS close,
                max(value) AS high, min(value) AS low,
                CAST(count(*) AS BIGINT) AS n_events,
                CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS volume
         FROM r GROUP BY 1, 2""",
    "q134_gapfill" ->
      """WITH ev AS (
           SELECT event_id, user_id, epoch_us(ts) AS ts_us, value
           FROM events),
         obs AS (
           SELECT user_id, ts_us, ts_us AS obs_ts,
                  arg_max(value, event_id) AS value
           FROM ev GROUP BY user_id, ts_us),
         span AS (
           SELECT user_id, min(ts_us) // 86400000000 AS d0,
                  max(ts_us) // 86400000000 AS d1
           FROM ev GROUP BY user_id),
         grid AS (
           SELECT user_id,
                  unnest(generate_series(d0, d1)) * 86400000000 AS grid_ts
           FROM span)
         SELECT g.user_id, g.grid_ts,
                o.value AS value_asof, o.obs_ts AS obs_ts_asof
         FROM grid g ASOF LEFT JOIN obs o
           ON g.user_id = o.user_id AND g.grid_ts >= o.ts_us""",
    "q51_topn_methods" ->
      """WITH li AS (SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem)
         SELECT l_orderkey, l_linenumber, l_quantity,
                CAST(rank() OVER w1 AS BIGINT) AS grp_rank, 'at_least' AS method
         FROM li WINDOW w1 AS (PARTITION BY l_orderkey ORDER BY l_quantity DESC)
         QUALIFY grp_rank <= 2
         UNION ALL
         SELECT l_orderkey, l_linenumber, l_quantity,
                CAST(dense_rank() OVER w2 AS BIGINT) AS grp_rank, 'dense' AS method
         FROM li WINDOW w2 AS (PARTITION BY l_orderkey ORDER BY l_quantity DESC)
         QUALIFY grp_rank <= 2
         UNION ALL
         SELECT l_orderkey, l_linenumber, l_quantity,
                CAST(count(*) OVER w3 AS BIGINT) AS grp_rank, 'at_most' AS method
         FROM li WINDOW w3 AS (PARTITION BY l_orderkey ORDER BY l_quantity DESC)
         QUALIFY grp_rank <= 2""")
}
