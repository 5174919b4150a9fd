package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Cols, EmParams, EntityMatching}
import graft.idx.{CosSimIndexer, SniIndexer}
import graft.ml.{Cuped, Ridge, RidgeStore, Thresholds, TrainData}

/** Training-support operators: threshold curves (M4), grouped train/test
  * split (M3), negative-sample re-ranking (M5), and the assembled supervised
  * training-pair flow (widened windows + negative split + no-candidate
  * re-add, q54).
  */
object MlQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    graft.sources.Tables(s, dir, name)

  /** q467/q468 fixture: the q188 hashing-trick features (signed md5
    * buckets 0 and 1) computed MAP-ONLY as array-HOF sums per document —
    * no explode, no shuffle — with byte length as the regression target.
    * Identical arithmetic in [[ridgeFeatsSql]]. */
  private def ridgeFeats(docs: DataFrame): DataFrame = {
    def hx(b: Int): Column = aggregate(
      filter(split(trim(col("text")), " "), t => t =!= ""),
      lit(0L),
      (acc, tok) => {
        val h = conv(substring(md5(tok.cast("binary")), 1, 12), 16, 10)
          .cast("long")
        acc + when(pmod(h, lit(8L)) === lit(b.toLong),
          when(pmod(shiftright(h, 3), lit(2L)) === 0, lit(1L))
            .otherwise(lit(-1L)))
          .otherwise(lit(0L))
      })
    docs.filter(col("text").isNotNull)
      .select(col("doc_id"), hx(0).as("x1"), hx(1).as("x2"),
        octet_length(col("text")).cast("long").as("y"))
  }

  /** The intercept-carrying feature vector both ridge queries fit on. */
  private def ridgeFeatCols: Seq[Column] =
    Seq(lit(1L), col("x1"), col("x2"))

  /** The q101 fixture + operator, shared VERBATIM by the correctness entry
    * and its bench override (the override must measure exactly what the
    * oracle verified): deterministic noised positive + two cyclic-neighbour
    * negatives per part name, GBT trained in-query on the even-uid half,
    * held-out odd half scored.
    */
  /** The shared supervised fixture (q101 + q157): deterministic noised
    * positive + two cyclic-neighbour negatives per part name.
    */
  private def supervisedPairs(s: SparkSession, dir: String): DataFrame = {
    val noiseUdf = udf((n: String, seed: Long) => TrainData.noise(n, seed))
    val base = t(s, dir, "part").filter(col("p_partkey") <= 150)
      .select(col("p_partkey").cast("long").as(Cols.Uid),
              lower(col("p_name")).as("gt_name"))
    val noised = base.select(col(Cols.Uid),
      noiseUdf(col("gt_name"), col(Cols.Uid)).as(Cols.Preprocessed))
    val gtFor = (k: Int) => base.select(
      (((col(Cols.Uid) + lit(k) - 1) % 150) + 1).as(Cols.Uid),
      col(Cols.Uid).as(Cols.GtUid), col("gt_name").as(Cols.GtPreprocessed))
    noised.join(
      gtFor(0).withColumn("correct", lit(true))
        .unionByName(gtFor(1).withColumn("correct", lit(false)))
        .unionByName(gtFor(7).withColumn("correct", lit(false))),
      Seq(Cols.Uid))
  }

  private def newLayer() = new graft.ml.SupervisedLayer(scoreCols = Nil,
    withRankFeatures = false, maxIter = 10, maxDepth = 3, seed = 0L)

  /** Mann-Whitney AUC over a scored fixture set — metric code on a
    * fixture-bounded frame (<= 225 rows), broadcast one side.
    */
  private def mannWhitneyAuc(scored: DataFrame): Double = {
    val pos = scored.filter(col("correct")).select(col(Cols.NmScore).as("sp"))
    val neg = scored.filter(!col("correct")).select(col(Cols.NmScore).as("sn"))
    pos.crossJoin(broadcast(neg))
      .agg(avg(when(col("sp") > col("sn"), 1.0)
        .when(col("sp") === col("sn"), 0.5).otherwise(0.0)).as("auc"))
      .head().getDouble(0)
  }

  private def q101Scored(s: SparkSession, dir: String): DataFrame = {
    val pairs = supervisedPairs(s, dir)
    val model = newLayer().fit(pairs.filter(col(Cols.Uid) % 2 === 0))
    model.transform(pairs.filter(col(Cols.Uid) % 2 === 1))
      .select(col(Cols.Uid), col("correct"), col(Cols.NmScore),
              col(Cols.BestRank), col(Cols.BestMatch))
  }

  /** Labeled candidate frame synthesized from orders: uid = customer,
    * gt_uid = order, rank from a deterministic window.
    */
  private def labeledPairs(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(s, dir, "orders").select(
      col("o_custkey").as(Cols.Uid),
      col("o_orderkey").as(Cols.GtUid),
      (col("o_orderstatus") === "F").as("correct"),
      (col("o_custkey") % 2 === 0).as("positive_set"),
      row_number().over(w).as(Cols.rank(0)))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // PCA FIT + PROJECT, MACHINE-CHECKED — fit is one distributed pass
    // (Gram's exact-integer d² partials + a d-sized sum agg) with a
    // driver-side Jacobi eigendecomposition of the d×d covariance (d²
    // doubles — the only driver math, never row data); project is map-only
    // codegen'd HOF dot products against literal loadings. The oracle-
    // visible surface is the operator's CONTRACT, each clause machine-
    // checked in-query: loadings orthonormal, eigenvalues sorted, each
    // component's distributed projected variance ≡ its eigenvalue, and the
    // Eckart–Young identity (mean reconstruction error ≡ the dropped
    // eigenvalue mass) — all within 1e-6 relative, anchored by the
    // relational vector count
    "q309_pca_project" -> { (s, dir) =>
      val sp = s
      import sp.implicits._
      import graft.ann.Pca
      val vecs = t(s, dir, "embeddings")
      val k = 4
      val model = Pca.fit(vecs, "embedding", k)
      val proj = Pca.project(vecs, "embedding", model, "scores")
        .select(posexplode(col("scores")).as(Seq("j", "p")))
      // per-component variance from moments vs the eigenvalue; the dropped
      // mass check needs per-row total norm too — one more map-only column
      val projStats = proj.groupBy("j")
        .agg(count(lit(1)).cast("double").as("nj"),
          sum("p").as("s1"), sum(col("p") * col("p")).as("s2"))
        .withColumn("var_j",
          col("s2") / col("nj") - col("s1") * col("s1") /
            (col("nj") * col("nj")))
        .collect().map(r => r.getInt(0) -> r.getAs[Double]("var_j")).toMap
      val varViolations = (0 until k).count { j =>
        math.abs(projStats(j) - model.eigenvalues(j)) >
          1e-6 * math.max(model.trace, 1.0)
      }.toLong
      // Eckart–Young: mean ||x−μ||² − Σ_j scoreⱼ² over rows ≡ Σ_{j>k} λⱼ
      val withTot = Pca.project(vecs, "embedding", model, "scores")
        .select(
          aggregate(
            transform(col("embedding"), (x, i) =>
              floor(x.cast("double") * lit(1e6)) -
                element_at(typedLit(model.meanU.toSeq), (i + 1).cast("int"))),
            lit(0.0), (acc, c) => acc + c * c).as("tot2"),
          aggregate(col("scores"), lit(0.0),
            (acc, c) => acc + c * c).as("cap2"))
        .agg(count(lit(1)).cast("double").as("n"),
          sum(col("tot2") - col("cap2")).as("err"))
        .collect().head
      val meanErr = withTot.getAs[Double]("err") / withTot.getAs[Double]("n")
      val dropped = model.trace - model.eigenvalues.sum
      val reconOk = math.abs(meanErr - dropped) <=
        1e-6 * math.max(model.trace, 1.0)
      val eigsSorted = model.eigenvalues.sliding(2)
        .forall(w => w.length < 2 || w(0) >= w(1))
      Seq((model.n, model.d.toLong, model.k.toLong,
          model.orthonormalDefect < 1e-9, eigsSorted, varViolations,
          reconOk))
        .toDF("n_vectors", "d", "k", "orthonormal_ok", "eigs_sorted_ok",
          "var_match_violations", "recon_identity_ok")
    },

    // FELLEGI–SUNTER LINKAGE WEIGHTS — the classical probabilistic
    // record-linkage model beside the library's supervised matcher:
    // m/u probabilities per comparison feature from labeled blocked
    // pairs. Hashed surface = the exact integer counts and ppm rates; the
    // libm ln weights are BANDED against the exact integer cross-ratios
    // with verdict booleans (exp(w)·den ≈ num — the q97 invariant-oracle
    // pattern), never hashed. Deterministic hash-agreement features make
    // the estimation surface exact: f_mod97/f_mod13 are discriminative
    // (m = 1 — the disagreement weight exercises the NULL guard),
    // f_parity is designed uninformative (w ≈ 0)
    "q330_fellegi_sunter" -> { (s, dir) =>
      val o = t(s, dir, "orders").filter(col("o_orderkey") % 20 === 0)
        .select(col("o_orderkey"), col("o_custkey"))
      val c = t(s, dir, "customer").select(col("c_custkey"))
      val pairs = o.join(c, col("o_custkey") % 50 === col("c_custkey") % 50)
        .select(
          (col("o_custkey") === col("c_custkey")).cast("int").as("lbl"),
          (col("o_custkey") % 97 === col("c_custkey") % 97).cast("int")
            .as("f_mod97"),
          (col("o_custkey") % 13 === col("c_custkey") % 13).cast("int")
            .as("f_mod13"),
          ((col("o_custkey") + col("c_custkey")) % 2 === 0).cast("int")
            .as("f_parity"))
      val fs = graft.ml.FellegiSunter.weights(pairs, "lbl",
        Seq("f_mod97", "f_mod13", "f_parity"))
      // w = ln(num/den) from exact integers: exp(w)·den sits within libm
      // slack of num, and w is NULL exactly when the ratio is degenerate
      val d38 = "decimal(38,0)"
      val numA = (col("n_agree_match").cast(d38) * col("n_unmatch"))
        .cast("double")
      val denA = (col("n_match").cast(d38) * col("n_agree_unmatch"))
        .cast("double")
      val numD = ((col("n_match") - col("n_agree_match")).cast(d38) *
        col("n_unmatch")).cast("double")
      val denD = (col("n_match").cast(d38) *
        (col("n_unmatch") - col("n_agree_unmatch"))).cast("double")
      fs.select(col("feature"), col("n_match"), col("n_unmatch"),
        col("n_agree_match"), col("n_agree_unmatch"),
        col("m_ppm"), col("u_ppm"),
        when(col("n_agree_match") > 0 && col("n_agree_unmatch") > 0,
          col("w_agree").isNotNull &&
            abs(exp(col("w_agree")) * denA - numA) <= lit(1e-9) * numA)
          .otherwise(col("w_agree").isNull).as("w_agree_ok"),
        when(col("n_match") - col("n_agree_match") > 0 &&
            col("n_unmatch") - col("n_agree_unmatch") > 0,
          col("w_disagree").isNotNull &&
            abs(exp(col("w_disagree")) * denD - numD) <= lit(1e-9) * numD)
          .otherwise(col("w_disagree").isNull).as("w_disagree_ok"))
    },

    // BRADLEY–TERRY PREFERENCE AGGREGATION — latent strength ratings from
    // pairwise wins (the RLHF preference-data consistency model): within
    // each user's event stream, consecutive different-type events form a
    // comparison won by the higher-value one; Hunter's MM iteration runs
    // UNROLLED with micro-unit floor quantization before every cross-row
    // sum (the IPF/EWMA discipline — exact integers between single IEEE
    // divisions). Pair frame ≤|types|², iterations item-frame-sized
    "q327_bradley_terry" -> { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      val ev = t(s, dir, "events").filter(col("value").isNotNull)
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("ts_us"), col("event_id"),
          expr("CAST(floor(value * 1000000) AS BIGINT)").as("v"))
      val pairs = ev
        .withColumn("pt", lag("event_type", 1).over(w))
        .withColumn("pv", lag("v", 1).over(w))
        .filter(col("pt").isNotNull && col("pt") =!= col("event_type") &&
          col("v") =!= col("pv"))
        .select(
          when(col("v") > col("pv"), col("event_type")).otherwise(col("pt"))
            .as("a"),
          when(col("v") > col("pv"), col("pt")).otherwise(col("event_type"))
            .as("b"))
        .groupBy("a", "b").agg(count(lit(1)).cast("long").as("wins"))
      graft.ml.BradleyTerry.fit(pairs, iters = 3)
    },

    // PCA FROM THE MOMENT STORE — the mergeable-store family extended to
    // MODEL FITTING: Gram/mean/count partials persisted per ingest batch
    // (two appends here), merged by pure integer addition at read time,
    // model refit from kilobyte partials with NO corpus rescan. The
    // moments are linear in the data, so fit-from-store is bit-identical
    // EXACT RIDGE FIT — the replayable linear quality scorer (r17 judge
    // directive #2): (X'X + λI)w = X'y over the q188 hashed features with
    // byte length as target, moments as ONE integer hash agg (map-side
    // partial, single driver row), the 3×3 solve by Cramer with Bareiss
    // determinants over BigInt. Weights are exact rationals det(A_i)/det(A)
    // quantized ×10⁶ by truncation toward zero — BigInt `/` and DuckDB
    // HUGEINT `//` share that semantics, so the oracle replays the
    // RECOVERED WEIGHTS to the last digit (not a banded check), plus every
    // raw moment
    "q467_ridge_exact_fit" -> { (s, dir) =>
      val sp = s
      import sp.implicits._
      val f = ridgeFeats(t(s, dir, "documents"))
      val m = Ridge.fit(f, ridgeFeatCols, col("y"), lambda = 10L)
      Seq((m.n, m.lambda, m.m(0, 1).toLong, m.m(0, 2).toLong,
        m.m(1, 1).toLong, m.m(1, 2).toLong, m.m(2, 2).toLong,
        m.b(0).toLong, m.b(1).toLong, m.b(2).toLong,
        m.wQ6(0), m.wQ6(1), m.wQ6(2)))
        .toDF("n", "lambda", "s1", "s2", "m11", "m12", "m22",
          "b0", "b1", "b2", "w0_q6", "w1_q6", "w2_q6")
    },

    // RIDGE FROM THE MOMENT STORE + MAP-ONLY APPLY — the q325 store⇒refit
    // contract at the supervised tier: two ingest batches append kilobyte
    // moment partials, the refit merges them by integer SUM and must be
    // BIT-IDENTICAL to fit-from-scan (machine-checked across det, every
    // Cramer numerator, every quantized weight); scoring is one integer
    // dot product with the quantized weights per document — map-only,
    // engine-replayed row by row
    "q468_ridge_store_apply" -> { (s, dir) =>
      val f = ridgeFeats(t(s, dir, "documents"))
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_q468_" +
        s.sparkContext.applicationId + "_" + java.util.UUID.randomUUID()
      RidgeStore.appendBatch(f.filter(col("doc_id") % 2 === 0),
        ridgeFeatCols, col("y"), 0L, path, overwrite = true)
      RidgeStore.appendBatch(f.filter(col("doc_id") % 2 === 1),
        ridgeFeatCols, col("y"), 1L, path)
      val mStore = RidgeStore.fit(s, path, lambda = 10L)
      val mScan = Ridge.fit(f, ridgeFeatCols, col("y"), lambda = 10L)
      val identical = mStore.n == mScan.n && mStore.detA == mScan.detA &&
        mStore.detAi.sameElements(mScan.detAi) &&
        mStore.wQ6.sameElements(mScan.wQ6) &&
        mStore.gram == mScan.gram && mStore.b.sameElements(mScan.b)
      graft.operators.FsUtil.deleteRecursively(new java.io.File(path))
      f.withColumn("pred_q6", Ridge.scoreCol(ridgeFeatCols, mStore))
        .withColumn("store_scan_identical", lit(identical))
        .select("doc_id", "x1", "x2", "y", "pred_q6",
          "store_scan_identical")
    },

    // to fit-from-scan — machine-checked across every loading, eigenvalue
    // and mean (the strongest store contract in the repo: exact, not
    // approximate)
    "q325_pca_from_store" -> { (s, dir) =>
      val sp = s
      import sp.implicits._
      import graft.ann.{GramStore, Pca}
      val vecs = t(s, dir, "embeddings")
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_q325_" +
        s.sparkContext.applicationId + "_" + java.util.UUID.randomUUID()
      GramStore.appendBatch(vecs.filter(col("vec_id") % 2 === 0),
        "embedding", 0L, path, overwrite = true)
      GramStore.appendBatch(vecs.filter(col("vec_id") % 2 === 1),
        "embedding", 1L, path)
      val mStore = GramStore.fitPca(s, path, 4)
      val mScan = Pca.fit(vecs, "embedding", 4)
      val identical = mStore.d == mScan.d && mStore.n == mScan.n &&
        java.util.Arrays.equals(mStore.eigenvalues, mScan.eigenvalues) &&
        java.util.Arrays.equals(mStore.meanU, mScan.meanU) &&
        mStore.components.length == mScan.components.length &&
        mStore.components.zip(mScan.components)
          .forall { case (a, b) => java.util.Arrays.equals(a, b) }
      Seq((mScan.n, mScan.d.toLong, 4L, 2L, identical))
        .toDF("n_vectors", "d", "k", "n_batches", "store_scan_identical")
    },

    // MONOTONE-WOE BINNING — the credit-scoring composition: PAV (q294's
    // kernel) merges raw value buckets into maximal monotone-rate
    // segments, then each segment gets its weight of evidence (q311's
    // kernel over pre-aggregated counts). By construction the segment
    // rates are nondecreasing, so the WOE sequence must be too — checked
    // on the EXACT odds_q9 surface (ln is monotone, so WOE order ≡ odds
    // order). Hashed surface = exact integers only; the libm woe/iv
    // doubles are banded like q311's (the kernel's own doc contract).
    // Two kernels, one plan, cell-frame-sized throughout
    "q324_monotone_woe" -> { (s, dir) =>
      val bins = t(s, dir, "events").filter(col("value").isNotNull)
        .select(expr("CAST(floor(value / 10) AS BIGINT)").as("b"),
          when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
        .groupBy("b")
        .agg(count(lit(1)).cast("long").as("n"),
          sum("y").cast("long").as("n_pos"))
      val fit = graft.data.Calibration.pavFit(bins)
      val merged = fit.groupBy(col("iso_fit"))
        .agg(min("bin").cast("long").as("bin_lo"),
          max("bin").cast("long").as("bin_hi"),
          sum("n_pos").cast("long").as("n_pos"),
          (sum("n") - sum("n_pos")).cast("long").as("n_neg"))
      val woe = graft.data.Contingency.woeIvFromCounts(merged)
        .drop("iso_fit")
      val wOrd = Window.orderBy("bin_lo")
      val lo = log(col("odds_q9").cast("double") / lit(1e9))
      val hi = log((col("odds_q9") + 1).cast("double") / lit(1e9))
      woe
        .withColumn("woe_monotone",
          coalesce(col("odds_q9") >= lag("odds_q9", 1).over(wOrd),
            lit(true)))
        .select(col("bin_lo"), col("bin_hi"), col("n_pos"), col("n_neg"),
          col("odds_q9"),
          when(col("odds_q9").isNotNull,
            col("woe") >= lo - lit(1e-9) && col("woe") <= hi + lit(1e-9))
            .otherwise(col("woe").isNull).as("woe_ok"),
          (col("iv").isNotNull && col("iv") >= lit(-1e-12) &&
            !isnan(col("iv"))).as("iv_ok"),
          col("woe_monotone"))
    },

    // QINI UPLIFT DECILES — the uplift-model evaluation table: rank eval
    // subjects by a train-half per-segment uplift score (exact integer
    // ppm), then per decile (explicit rank formula, no ntile engine-lore)
    // report treated/control counts and the cumulative cross-multiplied
    // uplift — "target the top k%, gain how much". All counts integer,
    // the only windows are the rank and a TEN-row cumulative pass
    "q318_qini_uplift" -> { (s, dir) =>
      val users = t(s, dir, "events")
        .groupBy("user_id")
        .agg(max(when(col("event_type") === "purchase", 1).otherwise(0))
          .cast("int").as("resp"))
        .withColumn("d", expr("CAST(user_id % 2 AS INT)"))
        .withColumn("seg", expr("CAST(user_id % 5 AS BIGINT)"))
        .withColumn("half", expr("CAST((user_id div 2) % 2 AS INT)"))
      val score = users.filter(col("half") === 0)
        .groupBy("seg")
        .agg(sum(when(col("d") === 1, col("resp")).otherwise(0))
            .cast("long").as("rt"),
          sum(when(col("d") === 1, 1).otherwise(0)).cast("long").as("nt"),
          sum(when(col("d") === 0, col("resp")).otherwise(0))
            .cast("long").as("rc"),
          sum(when(col("d") === 0, 1).otherwise(0)).cast("long").as("nc"))
        .filter(col("nt") > 0 && col("nc") > 0)
        .select(col("seg"),
          expr("""CAST((CAST(rt AS DECIMAL(38,0)) * nc -
                        CAST(rc AS DECIMAL(38,0)) * nt) * 1000000
                  div (CAST(nt AS DECIMAL(38,0)) * nc) AS BIGINT)""")
            .as("score"))
      val eval = users.filter(col("half") === 1)
        .join(broadcast(score), "seg")
      graft.ml.Uplift.qiniDeciles(eval, "user_id", "score", "d", "resp")
    },

    // SPLIT-CONFORMAL PREDICTION INTERVALS — distribution-free ±q̂ bands
    // around a point predictor: q̂ = the ⌈(n+1)(1−α)⌉-th smallest
    // calibration residual (exact order statistic off the COLLAPSED
    // residual domain), test coverage as exact integer ppm. The predictor
    // here is the per-segment train-split mean in truncated micros —
    // conformal wraps ANY predictor; the machinery under test is the
    // calibration. User-grouped splits (train/calib/test by user_id % 4)
    "q315_conformal_intervals" -> { (s, dir) =>
      val ev = t(s, dir, "events").filter(col("value").isNotNull)
        .select(col("event_type"),
          (col("user_id") % 4).cast("int").as("split"),
          expr("CAST(floor(value * 1000000) AS BIGINT)").as("y_u"))
      val m = ev.filter(col("split") <= 1)
        .groupBy("event_type")
        .agg(expr("""CAST((sum(CAST(y_u AS DECIMAL(38,0))) -
               sum(CAST(y_u AS DECIMAL(38,0))) % count(*)) div count(*)
               AS BIGINT)""").as("pred_u"))
      val scored = ev.filter(col("split") >= 2)
        .join(broadcast(m), "event_type")
      graft.ml.Conformal.calibrate(scored, "split", "y_u", "pred_u",
        calibVal = 2, testVal = 3, alphaPpm = 100000L)
    },

    // OUT-OF-FOLD TARGET ENCODING — the leakage-safe categorical encoder:
    // each fold's encoding comes from all OTHER folds' rows, exact
    // truncated integer division of exact sums; the cell-frame table IS
    // the oracle surface (|cats|·|folds| rows at any corpus size)
    "q316_target_encode_oof" -> { (s, dir) =>
      val ev = t(s, dir, "events").filter(col("value").isNotNull)
        .select(col("event_type"),
          (col("user_id") % 3).cast("long").as("fold"),
          expr("CAST(floor(value * 1000000) AS BIGINT)").as("y_u"))
      graft.features.TargetEncoder.encodingTable(ev, "event_type", "fold",
        "y_u")
    },

    // CROSS-FITTED DOUBLE-ML TREATMENT EFFECT — partialling-out with
    // out-of-fold per-segment mean nuisances (the TargetEncoder as the
    // conditional-mean model): θ̂ = Σỹ·d̃ / Σd̃² over exact integer
    // residual products, one truncating division at the end. Synthetic
    // design: treatment = user parity, confounder = 6-hour bucket,
    // cross-fit folds orthogonal to treatment
    "q317_dml_ate" -> { (s, dir) =>
      val ev = t(s, dir, "events").filter(col("value").isNotNull)
        .select(expr("CAST(hour(ts) div 6 AS BIGINT)").as("seg"),
          expr("CAST(user_id % 2 AS INT)").as("d"),
          expr("CAST((user_id div 2) % 2 AS INT)").as("fold"),
          expr("CAST(floor(value * 1000000) AS BIGINT)").as("y_u"))
      graft.ml.DoubleML.ate(ev, "fold", "seg", "d", "y_u")
    },

    // WOE / INFORMATION-VALUE FEATURE SCREEN — the credit-scoring sibling
    // of q297's Gini gain: per-bucket weight of evidence for the q297
    // value-bucket feature against the purchase label. Hashed surface =
    // the exact integer counts + odds_q9 (cross-multiplied integer
    // parts-per-billion); the libm ln-derived woe/iv are BANDED against
    // odds_q9 with verdict booleans (the q97 invariant-oracle pattern),
    // never hashed — the kernel's own doc contract
    "q311_woe_iv" -> { (s, dir) =>
      val ev = t(s, dir, "events").filter(col("value").isNotNull)
        .select(
          when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"),
          expr("CAST(least(floor(value / 50), 9) AS BIGINT)").as("vb"))
      val w = graft.data.Contingency.woeIv(ev, "y", "vb")
      // woe = ln(odds) with odds ∈ [odds_q9, odds_q9+1)/1e9 (floor): band
      // woe inside the ln image of that interval (+libm slack); iv is a
      // sum of nonnegative terms — pin sign and finiteness
      val lo = log(col("odds_q9").cast("double") / lit(1e9))
      val hi = log((col("odds_q9") + 1).cast("double") / lit(1e9))
      w.select(col("bucket"), col("n_pos"), col("n_neg"), col("odds_q9"),
        when(col("odds_q9").isNotNull,
          col("woe") >= lo - lit(1e-9) && col("woe") <= hi + lit(1e-9))
          .otherwise(col("woe").isNull).as("woe_ok"),
        (col("iv").isNotNull && col("iv") >= lit(-1e-12) &&
          !isnan(col("iv"))).as("iv_ok"))
    },

    // GINI-GAIN FEATURE SCREEN — CART's split criterion as a feature-
    // importance report (which candidate features carry signal about the
    // label, BEFORE training anything): gain = Gini(label) − Σ_f (n_f/n)·
    // Gini(label|f). Gini impurity instead of entropy ON PURPOSE — it is
    // rational in the counts (q177's diversity trick), so the only doubles
    // are per-feature-value terms s_f/n_f summed via an ORDERED cumulative
    // window (deterministic fold order on the ≤10-value collapsed domain;
    // a bare sum() of doubles has engine-defined order). All four features
    // stack into ONE pass + one shuffle via explode, never four scans
    "q297_gini_gain" -> { (s, dir) =>
      val d38 = "decimal(38,0)"
      val ev = t(s, dir, "events").filter(col("value").isNotNull)
        .select(
          when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"),
          expr("CAST(hour(ts) div 6 AS BIGINT)").as("f_hour4"),
          expr("CAST(datediff(to_date(ts), DATE'1970-01-01') % 7 AS BIGINT)")
            .as("f_dow"),
          (col("user_id") % 5).cast("long").as("f_cohort"),
          expr("CAST(least(floor(value / 50), 9) AS BIGINT)").as("f_vbucket"))
      val feats = Seq("f_hour4", "f_dow", "f_cohort", "f_vbucket")
      val stacked = ev.select(col("y"), explode(array(feats.map(f =>
          struct(lit(f).as("feature"), col(f).as("fv"))): _*)).as("x"))
        .select(col("x.feature").as("feature"), col("x.fv").as("fv"),
          col("y"))
      val cells = stacked.groupBy("feature", "fv")
        .agg(count(lit(1)).cast("long").as("n_f"),
          sum("y").cast("long").as("n_f1"))
        .withColumn("n_f0", col("n_f") - col("n_f1"))
        // Σ_c n_fc² / n_f — the un-normalized per-value purity mass
        .withColumn("term",
          (col("n_f1").cast(d38) * col("n_f1") +
           col("n_f0").cast(d38) * col("n_f0")).cast("double") /
            col("n_f").cast("double"))
      val wq = Window.partitionBy("feature").orderBy("fv")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val perFeat = cells.withColumn("cum", sum("term").over(wq))
        .groupBy("feature")
        .agg(sum("n_f").cast("long").as("n"),
          count(lit(1)).cast("long").as("n_values"),
          max("cum").as("__t")) // terms > 0 ⇒ running sum peaks at the end
      val parent = ev.agg(count(lit(1)).cast("long").as("__n"),
          sum("y").cast("long").as("__p"))
        .select(expr(s"""1.0 - CAST(CAST(__p AS $d38) * __p +
                 CAST(__n - __p AS $d38) * (__n - __p) AS DOUBLE) /
                 CAST(CAST(__n AS $d38) * __n AS DOUBLE)""")
          .as("parent_impurity"))
      perFeat.crossJoin(broadcast(parent))
        .select(col("feature"), col("n"), col("n_values"),
          col("parent_impurity"),
          (lit(1.0) - col("__t") / col("n").cast("double"))
            .as("child_impurity"),
          (col("parent_impurity") -
            (lit(1.0) - col("__t") / col("n").cast("double")))
            .as("gini_gain"))
    },

    // M4: threshold-decision curves, distributed (no driver collect)
    "q47_threshold_curves" -> { (s, dir) =>
      val scored = t(s, dir, "lineitem").select(
        (lit(1.0) - col("l_discount")).as("s"),
        (col("l_returnflag") === "R").as("y"))
      Thresholds.curves(scored, "s", "y", steps = 20)
    },

    // M5: negative-sample candidate re-ranking (window re-rank, no driver hop)
    "q48_negative_rerank" -> { (s, dir) =>
      TrainData.negativeRerank(labeledPairs(s, dir), cosRankCols = Seq(Cols.rank(0)))
        .select(Cols.Uid, Cols.GtUid, "correct", "positive_set", Cols.rank(0))
    },

    // M3: deterministic grouped split — every group fully on one side
    // (hash functions differ across engines -> verified structurally: the
    // oracle recomputes the group-disjointness invariant, not the hash)
    "q49_grouped_split_sizes" -> { (s, dir) =>
      val (train, test) = TrainData.groupedSplit(
        t(s, dir, "orders"), "o_custkey", testFraction = 0.25)
      val trainGroups = train.select(col("o_custkey")).distinct()
      val testGroups  = test.select(col("o_custkey")).distinct()
      // invariant surface: total rows preserved, no group on both sides
      val overlap = trainGroups.join(testGroups, "o_custkey").count()
      val total   = train.count() + test.count()
      val sp = s
      import sp.implicits._
      Seq((total, overlap)).toDF("total_rows", "overlapping_groups")
    },

    // M3 three-way: train/val/test with whole-group assignment. The q49
    // invariant surface — total rows preserved, all three pairwise group
    // overlaps zero, and every group in exactly one part
    // grouped k-fold CV assignment: fold = 48 md5 bits of the group key mod
    // 5 — map-only, disjoint/exhaustive by construction, and (unlike the
    // xxhash64 splits) the oracle replays the EXACT per-fold membership,
    // not just invariants: a stronger gate than q122's
    "q151_kfold" -> { (s, dir) =>
      TrainData.kFold(t(s, dir, "orders"), "o_custkey", k = 5, salt = "kf")
        .groupBy("fold")
        .agg(count(lit(1)).cast("long").as("n_rows"),
          count_distinct(col("o_custkey")).cast("long").as("n_groups"))
    },

    "q122_grouped_split3" -> { (s, dir) =>
      val orders = t(s, dir, "orders")
      val (train, valid, test) = TrainData.groupedSplit3(
        orders, "o_custkey", valFraction = 0.15, testFraction = 0.15)
      def groups(df: DataFrame) = df.select("o_custkey").distinct()
      val overlap =
        groups(train).join(groups(valid), "o_custkey").count() +
        groups(train).join(groups(test), "o_custkey").count() +
        groups(valid).join(groups(test), "o_custkey").count()
      val total = train.count() + valid.count() + test.count()
      val nGroups = groups(train).count() + groups(valid).count() + groups(test).count()
      val sp = s
      import sp.implicits._
      Seq((total, nGroups, overlap))
        .toDF("total_rows", "total_groups", "overlapping_groups")
    },

    // M3 stratified: per-stratum test-group counts are EXACTLY
    // floor(fraction * stratum size) — the oracle recomputes stratum sizes
    // (min of each group's concatenated strata values) and the expected test
    // total in SQL; group disjointness and row preservation as in q49
    "q50_stratified_split" -> { (s, dir) =>
      val orders = t(s, dir, "orders")
      val (train, test) = TrainData.stratifiedGroupedSplit(
        orders, "o_custkey", Seq("o_orderpriority"), testFraction = 0.25)
      val trainGroups = train.select("o_custkey").distinct()
      val testGroups  = test.select("o_custkey").distinct()
      val overlap = trainGroups.join(testGroups, "o_custkey").count()
      val total   = train.count() + test.count()
      // per-stratum violation count: |test groups| != floor(0.25 * |groups|)
      val strata = orders.groupBy("o_custkey")
        .agg(min(col("o_orderpriority").cast("string")).as("stratum"))
      val expected = strata.groupBy("stratum")
        .agg(floor(lit(0.25) * count(lit(1))).as("expected_test"))
      val actual = strata.join(testGroups, Seq("o_custkey"), "left_semi")
        .groupBy("stratum").agg(count(lit(1)).as("actual_test"))
      val violations = expected.join(actual, Seq("stratum"), "left_outer")
        .filter(coalesce(col("actual_test"), lit(0L)) =!= col("expected_test"))
        .count()
      val sp = s
      import sp.implicits._
      Seq((total, overlap, violations))
        .toDF("total_rows", "overlapping_groups", "stratum_violations")
    },

    // supervised layer made ORACLE-VISIBLE (the q97 invariant recipe): a
    // deterministic synthetic labeled pair set — every part name noised by
    // the seeded noiser as the positive candidate, two other part names as
    // negatives — trains the GBT IN-QUERY on the even-uid half and scores
    // the held-out odd-uid half. The emitted row is metric verdicts the
    // DuckDB oracle replays (the reference gates this exact property with
    // metric assertions in tests/integration/test_training_classifier.py):
    // held-out Mann-Whitney AUC >= 0.95, best-match accuracy >= 0.9, scores
    // inside [0,1], exactly one best_rank=1 row per scored name. Thresholds
    // are ROBUST bands (the fixture is separable by construction — noised
    // names share almost all tokens with their source, other part names
    // don't), not tight score hashes: GBT probabilities are not a
    // cross-engine-reproducible surface, separability metrics are.
    "q101_supervised_invariants" -> { (s, dir) =>
      val scored = q101Scored(s, dir).localCheckpoint()
      // Mann-Whitney AUC without a global window: mean over (pos, neg) score
      // pairs of [s_pos > s_neg] + 0.5*[==]. The cross join is METRIC code
      // on the fixture-bounded scored set (75 pos x 150 neg), broadcast one
      // side — never a data-scale operation.
      val auc = mannWhitneyAuc(scored)
      val nTest = scored.select(Cols.Uid).distinct().count()
      val bestCorrect = scored.filter(col(Cols.BestMatch) && col("correct")).count()
      val outOfRange = scored.filter(col(Cols.NmScore) < 0.0 || col(Cols.NmScore) > 1.0).count()
      val bestRows = scored.filter(col(Cols.BestRank) === 1).count()
      val sp = s
      import sp.implicits._
      Seq((nTest, auc >= 0.95, bestCorrect.toDouble >= 0.9 * nTest,
           outOfRange == 0L, bestRows == nTest))
        .toDF("n_test_names", "auc_ge_095", "best_match_acc_ge_090",
          "scores_in_unit_interval", "one_best_per_name")
    },

    // the CROSS-VALIDATION protocol itself made oracle-visible (the
    // reference trains fold-wise via StratifiedGroupKFold,
    // base_supervised_model.py:201-266): q151's md5-mod fold assignment
    // over the q101 fixture, then for EACH fold the GBT is trained
    // in-query on the other k-1 folds and scored on the held-out fold —
    // one verdict row per fold. The oracle replays the exact per-fold
    // test-name membership (same md5 arithmetic, the q151 property) and
    // expects every fold's AUC/accuracy band to hold; bands are the q101
    // ROBUST-band rationale (separable-by-construction fixture, GBT
    // probabilities are not a cross-engine surface, separability is)
    "q157_cv_supervised" -> { (s, dir) =>
      val folded = TrainData.kFold(supervisedPairs(s, dir), Cols.Uid, k = 3,
        salt = "cv").localCheckpoint()
      val sp = s
      import sp.implicits._
      (0 until 3).map { f =>
        val model = newLayer().fit(folded.filter(col("fold") =!= f))
        val scored = model.transform(folded.filter(col("fold") === f))
          .select(col(Cols.Uid), col("correct"), col(Cols.NmScore),
            col(Cols.BestRank), col(Cols.BestMatch))
          .localCheckpoint()
        val auc = mannWhitneyAuc(scored)
        val nTest = scored.select(Cols.Uid).distinct().count()
        val bestCorrect =
          scored.filter(col(Cols.BestMatch) && col("correct")).count()
        (f, nTest, auc >= 0.95, bestCorrect.toDouble >= 0.9 * nTest)
      }.toDF("fold", "n_test_names", "auc_ge_095", "best_match_acc_ge_090")
    },

    // full training-pair assembly (EntityMatchingModel.createTrainingPairs):
    // entity split + widened candidate gen + negative re-rank narrowing +
    // no-candidate re-add. Oracle surface: every input name survives, the
    // positive entity set is exactly floor((1-f)*|entities|), and the four
    // structural violation counts are zero (negative correct pairs removed,
    // ranks narrowed back inside the fitted windows, no_candidate rows
    // carry no gt, matched rows keep at least one indexer rank)
    "q54_training_pairs" -> { (s, dir) =>
      val part = t(s, dir, "part")
      val gtRaw = part.select(
        col("p_partkey").cast("long").as(Cols.Uid),
        col("p_name").as(Cols.Name),
        col("p_brand").as(Cols.EntityId))
      val nmRaw = gtRaw.filter(col(Cols.Uid) < 300)
      val model = EntityMatching(EmParams(), Seq(
          new CosSimIndexer(tokenizer = "words", ngram = 1, binary = true,
            numCandidates = 3, lowerBound = 0.5),
          new SniIndexer(window = 2, maxGtPerName = 10)))
        .fit(gtRaw)
      val pairs = model.createTrainingPairs(nmRaw,
        createNegativeSampleFraction = 0.5, seed = 42)
      val sp = s
      import sp.implicits._
      val nNames = pairs.select(Cols.Uid).distinct().count()
      val nPosEntities = pairs.filter(col("positive_set"))
        .select(Cols.EntityId).distinct().count()
      val negCorrect = pairs.filter(!col("positive_set") && col("correct")).count()
      val overWindow = pairs.filter(col(Cols.rank(0)) > 3 || col(Cols.rank(1)) > 2).count()
      val noCandViol = pairs.filter(col("no_candidate") && col(Cols.GtUid).isNotNull).count()
      val allNullViol = pairs.filter(col(Cols.GtUid).isNotNull &&
        col(Cols.rank(0)).isNull && col(Cols.rank(1)).isNull).count()
      Seq((nNames, nPosEntities, negCorrect, overWindow, noCandViol, allNullViol))
        .toDF("n_names", "n_pos_entities", "neg_correct_violations",
          "over_window_violations", "no_candidate_violations",
          "all_null_rank_violations")
    },

    // P7 made oracle-visible (q54's structural-verdict recipe): the
    // whole-ENTITY training downsample. nTrainIds keeps exactly n entities
    // chosen by deterministic hash order — and keeps them WHOLE: every
    // input name of a kept entity survives, no name of a dropped entity
    // does. The expected set is recomputed in-query from the same
    // (xxhash64(entity, seed), entity) order and each membership term is a
    // violation count the oracle pins to zero
    "q254_training_downsample" -> { (s, dir) =>
      val sp = s
      import sp.implicits._
      import graft.{EmParams, EntityMatching}
      val part = t(s, dir, "part")
      val gtRaw = part.select(
        col("p_partkey").cast("long").as(Cols.Uid),
        col("p_name").as(Cols.Name),
        col("p_brand").as(Cols.EntityId))
      val nmRaw = gtRaw.filter(col(Cols.Uid) < 500)
      val model = EntityMatching(EmParams(), Seq(
          new CosSimIndexer(tokenizer = "words", ngram = 1, binary = true,
            numCandidates = 3, lowerBound = 0.5),
          new SniIndexer(window = 2, maxGtPerName = 10)))
        .fit(gtRaw)
      val pairs = model.createTrainingPairs(nmRaw, nTrainIds = 10, seed = 42)
        .localCheckpoint()
      val expected = nmRaw.select(col(Cols.EntityId)).distinct()
        .orderBy(xxhash64(col(Cols.EntityId), lit(42)), col(Cols.EntityId))
        .limit(10)
      val kept = pairs.select(col(Cols.EntityId)).distinct()
      val nKept = kept.count()
      val unexpected = kept.join(expected, Seq(Cols.EntityId), "left_anti")
        .count()
      // whole-entity: every input name of an expected entity is in pairs
      val missingNames = nmRaw
        .join(expected, Seq(Cols.EntityId), "left_semi")
        .join(pairs.select(col(Cols.Uid)).distinct(), Seq(Cols.Uid),
          "left_anti")
        .count()
      Seq((nKept, unexpected, missingNames))
        .toDF("n_entities_kept", "unexpected_entities",
          "missing_names_of_kept_entities")
    },

    // CLUSTERING EVALUATION by pair counting — the metric gate a dedup /
    // entity-resolution run is graded on: pairwise precision/recall/F1 and
    // adjusted Rand, all from the (cluster × gold) contingency table in
    // exact integers (ARI's one closing division is the only double, the
    // q248 discipline). Predicted = exact-name clusters (min-id canonical,
    // q21's semantics), gold = brand classes — both fully replayable
    "q264_cluster_eval" -> { (s, dir) =>
      val p = t(s, dir, "part")
        .select(col("p_partkey").cast("long").as("id"),
          col("p_name"), col("p_brand"))
      val clusters = p.groupBy("p_name")
        .agg(min("id").cast("long").as("cluster_id"))
      graft.ml.ClusterEval.pairwiseReport(p.join(clusters, "p_name"),
        "cluster_id", "p_brand")
    },

    // Coverage-guaranteed eval split — the stratified test-set builder
    // that promises "every (lang, source) cell is represented": each
    // cell's md5-min document is guaranteed in, then the budget (100) is
    // topped up by global hash rank over the rest via orderBy+limit
    // (TakeOrdered — k rows to the driver merge, never a 1-partition
    // window over the corpus). Fully deterministic, so the whole
    // membership is replayable row-for-row
    "q210_coverage_split" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("source"))
        .withColumn("h", md5(concat(lit("cov|"), col("doc_id").cast("string"))))
      val wc = Window.partitionBy("lang", "source").orderBy("h", "doc_id")
      val marked = docs.withColumn("cell_rn", row_number().over(wc))
        .withColumn("is_cell_guarantee", col("cell_rn") === 1)
        .localCheckpoint()
      val fill = math.max(0L,
        100L - marked.filter(col("is_cell_guarantee")).count()).toInt
      val fills = marked.filter(!col("is_cell_guarantee"))
        .orderBy("h", "doc_id").limit(fill)
        .select(col("doc_id"), lit(true).as("is_fill"))
      marked.join(fills, Seq("doc_id"), "left")
        .select(col("doc_id"), col("lang"), col("source"),
          col("is_cell_guarantee"),
          (col("is_cell_guarantee") || coalesce(col("is_fill"), lit(false)))
            .as("in_eval"))
    },

    // A/B readout with BOOTSTRAP CIs — q198's point estimates upgraded to
    // the practical significance call without t-test distributional
    // assumptions: per arm, 32 hash-seeded Poisson-weight replicate means
    // (q191's deterministic online bootstrap), the arm's [min, max]
    // replicate band, and the ci_overlap verdict — bands that do NOT
    // overlap are the "ship it" signal. Everything integer, everything
    // replayable
    "q244_ab_bootstrap_ci" -> { (s, dir) =>
      val d38 = "decimal(38,0)"
      val ev = t(s, dir, "events").filter(col("value").isNotNull)
        .select(col("event_id"), col("user_id"),
          expr("CAST(floor(value * 1000000) AS BIGINT)").as("value_u"))
        .withColumn("arm", expr(
          """CAST(conv(substring(md5(CAST(concat('arm|',
             CAST(user_id AS STRING)) AS BINARY)), 1, 12), 16, 10)
             AS BIGINT) % 2"""))
      val reps = ev.crossJoin(
          broadcast(s.range(32).select(col("id").cast("int").as("r"))))
        .withColumn("m", expr(
          """CAST(conv(substring(md5(CAST(concat(CAST(event_id AS STRING),
             '|', CAST(r AS STRING)) AS BINARY)), 1, 12), 16, 10)
             AS BIGINT) % 10000"""))
        .withColumn("w", when(col("m") < 3679, 0L).when(col("m") < 7358, 1L)
          .when(col("m") < 9197, 2L).otherwise(3L))
      val bands = reps.groupBy("arm", "r")
        .agg(expr(
          s"CAST(CAST(sum(w * value_u) AS $d38) div nullif(sum(w), 0) AS BIGINT)")
          .as("mean_r_u"))
        .groupBy("arm")
        .agg(min("mean_r_u").cast("long").as("lo_u"),
          max("mean_r_u").cast("long").as("hi_u"))
      val a0 = bands.filter(col("arm") === 0)
        .select(col("lo_u").as("lo0"), col("hi_u").as("hi0"))
      val a1 = bands.filter(col("arm") === 1)
        .select(col("lo_u").as("lo1"), col("hi_u").as("hi1"))
      a0.crossJoin(a1).select(col("lo0"), col("hi0"), col("lo1"), col("hi1"),
        (col("lo0") <= col("hi1") && col("lo1") <= col("hi0"))
          .as("ci_overlap"))
    },

    // A/B experiment integrity + readout — hash assignment (md5, the
    // replayable randomizer), a sample-ratio-mismatch gate in exact integers
    // ((n0-n1)² ≤ z²·n with z = 4 — the cross-multiplied binomial bound, no
    // sqrt, no chi-square doubles), and per-arm metric means. Assignment is
    // USER-level (all of a user's events share the arm — the unit of
    // randomization), means are event-level. Two hash aggs + a 1-row cross
    "q198_ab_srm_gate" -> { (s, dir) =>
      val d38 = "decimal(38,0)"
      val ev = t(s, dir, "events").filter(col("value").isNotNull)
        .select(col("user_id"),
          expr("CAST(floor(value * 1000000) AS BIGINT)").as("value_u"))
        .withColumn("arm", expr(
          """CAST(conv(substring(md5(CAST(concat('arm|',
             CAST(user_id AS STRING)) AS BINARY)), 1, 12), 16, 10)
             AS BIGINT) % 2"""))
      val u = ev.select("user_id", "arm").distinct().agg(
        sum(when(col("arm") === 0, 1L).otherwise(0L)).cast("long").as("n_arm0"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).cast("long").as("n_arm1"))
      val m = ev.agg(
        expr(s"""CAST(CAST(sum(CASE WHEN arm = 0 THEN value_u ELSE 0 END)
                 AS $d38) div nullif(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END),
                 0) AS BIGINT)""").as("mean0_u"),
        expr(s"""CAST(CAST(sum(CASE WHEN arm = 1 THEN value_u ELSE 0 END)
                 AS $d38) div nullif(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END),
                 0) AS BIGINT)""").as("mean1_u"))
      u.crossJoin(m).select(
        (col("n_arm0") + col("n_arm1")).as("n_users"),
        col("n_arm0"), col("n_arm1"),
        ((col("n_arm0") - col("n_arm1")) * (col("n_arm0") - col("n_arm1")) <=
          lit(16L) * (col("n_arm0") + col("n_arm1"))).as("srm_ok"),
        col("mean0_u"), col("mean1_u"),
        (col("mean1_u") - col("mean0_u")).as("diff_u"))
    },

    // Inter-annotator agreement (Cohen's kappa) per language — the label-
    // quality gate a supervised-data pipeline runs before trusting a
    // labeling pass. The two "annotators" here are deterministic quality
    // rules (char-length vs token-count thresholds) so the oracle replays
    // them exactly; the kappa arithmetic is the operator under test: all
    // ppm-scaled integer math, products in DECIMAL(38,0), division via
    // sign-split abs-div so Spark's truncation and DuckDB's agree on
    // negative kappas, NULL when pe = 1 (degenerate: both raters constant).
    // One map-side project + one hash agg per language
    "q179_annotator_kappa" -> { (s, dir) =>
      val d38 = "decimal(38,0)"
      t(s, dir, "documents").filter(col("text").isNotNull)
        .select(col("lang"),
          (col("n_chars") >= 300).as("ra"),
          (size(split(trim(col("text")), " ")) >= 40).as("rb"))
        .groupBy("lang")
        .agg(count(lit(1)).cast("long").as("n"),
          sum(when(col("ra"), 1L).otherwise(0L)).cast("long").as("a_yes"),
          sum(when(col("rb"), 1L).otherwise(0L)).cast("long").as("b_yes"),
          sum(when(col("ra") === col("rb"), 1L).otherwise(0L))
            .cast("long").as("n_agree"))
        .withColumn("po_ppm",
          expr(s"CAST((CAST(n_agree AS $d38) * 1000000) div n AS BIGINT)"))
        .withColumn("pe_ppm",
          expr(s"""CAST(((CAST(a_yes AS $d38) * b_yes +
                          CAST(n - a_yes AS $d38) * (n - b_yes)) * 1000000)
                   div (CAST(n AS $d38) * n) AS BIGINT)"""))
        .withColumn("kappa_x1e6",
          when(col("pe_ppm") === 1000000L, lit(null).cast("long"))
            .otherwise(
              when(col("po_ppm") >= col("pe_ppm"), 1L).otherwise(-1L) *
              expr(s"""CAST((abs(CAST(po_ppm AS $d38) - pe_ppm) * 1000000)
                       div (1000000 - pe_ppm) AS BIGINT)""")))
    },

    // FLEISS' KAPPA — q179's agreement gate generalized past two raters:
    // a THREE-rater panel (deterministic length-threshold rules with
    // rater-specific offsets, so the oracle replays them exactly) labels
    // every document into 4 length categories; the operator under test is
    // Agreement.fleissKappa's all-integer P̄o/P̄e/κ arithmetic (exact
    // cross-multiplied quotients, q179's sign-split division — rational
    // in the counts, zero doubles). Annotations collapse to per-(doc,
    // category) cells in one hash agg, then to the doc frame, then one row
    "q339_fleiss_kappa" -> { (s, dir) =>
      val ann = t(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"),
          explode(array(lit(0), lit(1), lit(2))).as("rater"))
        .select(col("doc_id"),
          expr("CAST(least((n_chars + 37 * rater) div 150, 3) AS BIGINT)")
            .as("category"))
      graft.data.Agreement.fleissKappa(ann, "doc_id", "category")
    },

    // KRIPPENDORFF'S ALPHA (nominal) — q339's panel with the realism
    // Fleiss forbids: a RAGGED panel (each rater skips the docs where
    // (doc_id + rater) % 4 = 0, so items carry 2 or 3 ratings). The
    // kernel quantizes each item's disagreement quotient once (q9 floor,
    // the logRank increment discipline), keeps D_e exact, and emits the
    // sign-split α ×1e6 — the agreement gate that still works when
    // annotators don't all label everything
    "q345_krippendorff_alpha" -> { (s, dir) =>
      val ann = t(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"),
          explode(array(lit(0), lit(1), lit(2))).as("rater"))
        .filter((col("doc_id") + col("rater")) % 4 =!= 0)
        .select(col("doc_id"),
          expr("CAST(least((n_chars + 37 * rater) div 150, 3) AS BIGINT)")
            .as("category"))
      graft.data.Agreement.krippendorffAlpha(ann, "doc_id", "category")
    },

    // LINEARLY-WEIGHTED COHEN'S KAPPA — q179's two-rater gate for
    // ORDINAL labels, where "off by one bucket" must cost less than "off
    // by three": observed/expected weighted disagreement are exact
    // integer sums over the k² cell/margin grid (w_ij = |i−j|), κ_w the
    // sign-split exact quotient (Agreement.weightedKappa). Raters = the
    // char-length vs token-count bucket rules
    "q346_weighted_kappa" -> { (s, dir) =>
      val d = t(s, dir, "documents").select(
        expr("CAST(least(n_chars div 150, 3) AS BIGINT)").as("ra"),
        expr("""CAST(least(size(split(trim(text), ' ')) div 25, 3)
                AS BIGINT)""").as("rb"))
      graft.data.Agreement.weightedKappa(d, "ra", "rb")
    },

    // CUPED VARIANCE-REDUCED A/B READOUT — the experimentation estimate a
    // data platform publishes for every pipeline change: per-user
    // pre-period value (covariate) vs post-period value (outcome), arms
    // split by the deterministic user_id parity, θ/Δ/Δ_adj as exact
    // multi-limb integer quotients both engines replay. One hash agg over
    // users, one scalar agg — no windows, no joins
    "q368_cuped" -> { (s, dir) =>
      val cut = lit("2024-01-15").cast("date")
      val perUser = t(s, dir, "events")
        .filter(col("value").isNotNull)
        .groupBy(col("user_id"))
        .agg(
          sum(when(to_date(col("ts")) <= cut,
            expr("CAST(floor(value * 1000000) AS BIGINT)"))
            .otherwise(0L)).cast("long").as("x"),
          sum(when(to_date(col("ts")) > cut,
            expr("CAST(floor(value * 1000000) AS BIGINT)"))
            .otherwise(0L)).cast("long").as("y"))
        .withColumn("treat", col("user_id") % 2 === 0)
      Cuped.estimate(perUser, "treat", "x", "y")
    },

    // GROUPED CUPED — one θ and one adjusted lift PER EVENT TYPE (the
    // heterogeneous-treatment-effect readout: which surface moved?):
    // units are (type, user) cells, every moment one grouped hash agg
    "q369_cuped_by_type" -> { (s, dir) =>
      val cut = lit("2024-01-15").cast("date")
      val perUnit = t(s, dir, "events")
        .filter(col("value").isNotNull)
        .groupBy(col("event_type"), col("user_id"))
        .agg(
          sum(when(to_date(col("ts")) <= cut,
            expr("CAST(floor(value * 1000000) AS BIGINT)"))
            .otherwise(0L)).cast("long").as("x"),
          sum(when(to_date(col("ts")) > cut,
            expr("CAST(floor(value * 1000000) AS BIGINT)"))
            .otherwise(0L)).cast("long").as("y"))
        .withColumn("treat", col("user_id") % 2 === 0)
      Cuped.estimateGrouped(perUnit, Seq("event_type"), "treat", "x", "y")
    },

    // EXACT SHAPLEY CHANNEL ATTRIBUTION — which pre-purchase touch
    // channels deserve conversion credit, by the one axiomatically fair
    // split (q224's decay rule is a heuristic; this is the Shapley
    // value): v(S) = converted users whose prior-touch set ⊆ S over the
    // 4 declared channels, every φ an exact rational with denominator
    // 4! = 24 — users collapse to 16 mask counts in ONE hash agg, the
    // rest is 16-row subset-containment joins, efficiency identity as a
    // verdict
    "q392_shapley_attribution" -> { (s, dir) =>
      val ev = t(s, dir, "events")
      val fp = ev.filter(col("event_type") === "purchase")
        .groupBy("user_id").agg(min("ts").as("__pts"))
      val mk = ev.join(fp, "user_id")
        .filter(col("ts") < col("__pts") &&
          col("event_type").isin("click", "error", "signup", "view"))
        .groupBy("user_id")
        .agg((max(when(col("event_type") === "click", 1).otherwise(0)) +
          max(when(col("event_type") === "error", 1).otherwise(0)) * 2 +
          max(when(col("event_type") === "signup", 1).otherwise(0)) * 4 +
          max(when(col("event_type") === "view", 1).otherwise(0)) * 8)
          .as("mask"))
      val masks = fp.join(mk, Seq("user_id"), "left")
        .na.fill(0, Seq("mask"))
      graft.ml.Shapley.channelAttribution(masks.select("mask"),
        Seq("click", "error", "signup", "view"))
    },

    // EMPIRICAL-BAYES SMOOTHED PER-USER CLICK RATE — the MAP/additive
    // smoothing every CTR-style feature needs before it can be trusted
    // for low-traffic users: shrunk = (a + M·p₀)/(n + M) toward the
    // global rate p₀ = A/N with DECLARED prior strength M = 1000,
    // replayed as one exact cross-multiplied q6 floor. The shrunk floor
    // always lies between the raw and global floors (monotone floors of
    // an exact betweenness) — emitted as a replayed verdict. Totals
    // frame is one row, broadcast back; no windows over the user grain
    "q374_smoothed_rates" -> { (s, dir) =>
      val per = t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).cast("long").as("n_u"),
          sum(when(col("event_type") === "click", 1L).otherwise(0L))
            .cast("long").as("a_u"))
      val tot = per.agg(sum("n_u").cast("long").as("nn"),
        sum("a_u").cast("long").as("aa"))
      val d38 = "decimal(38,0)"
      per.crossJoin(broadcast(tot))
        .withColumn("raw_ppm",
          expr(s"CAST(CAST(a_u AS $d38) * 1000000 div n_u AS BIGINT)"))
        .withColumn("global_ppm",
          expr(s"CAST(CAST(aa AS $d38) * 1000000 div nn AS BIGINT)"))
        .withColumn("shrunk_ppm",
          expr(s"""CAST((CAST(a_u AS $d38) * nn + CAST(1000 AS $d38) * aa)
                   * 1000000 div ((CAST(n_u AS $d38) + 1000) * nn)
                   AS BIGINT)"""))
        .withColumn("pulled_toward_global",
          col("shrunk_ppm") >= least(col("raw_ppm"), col("global_ppm")) &&
            col("shrunk_ppm") <= greatest(col("raw_ppm"),
              col("global_ppm")))
        .select("user_id", "n_u", "a_u", "raw_ppm", "global_ppm",
          "shrunk_ppm", "pulled_toward_global")
    })

  /** BENCH-path production configurations: the correctness q50/q54 entries
    * run invariant count() probes (overlap joins, per-stratum recounts) over
    * the result — oracle code; the bench measures the operators themselves.
    */
  val benchOverrides: Map[String, (SparkSession, String) => DataFrame] = Map(
    // production form of q101: train + score (the operator, the SAME
    // q101Scored the oracle verified); the AUC cross join and verdict
    // counts are oracle code and stay in Verify
    "q101_supervised_invariants" -> { (s, dir) => q101Scored(s, dir) },
    "q50_stratified_split" -> { (s, dir) =>
      val (train, test) = TrainData.stratifiedGroupedSplit(
        t(s, dir, "orders"), "o_custkey", Seq("o_orderpriority"), testFraction = 0.25)
      train.withColumn("is_test", lit(false))
        .unionByName(test.withColumn("is_test", lit(true)))
    },
    "q54_training_pairs" -> { (s, dir) =>
      val part = t(s, dir, "part")
      val gtRaw = part.select(
        col("p_partkey").cast("long").as(Cols.Uid),
        col("p_name").as(Cols.Name),
        col("p_brand").as(Cols.EntityId))
      val nmRaw = gtRaw.filter(col(Cols.Uid) < 300)
      EntityMatching(EmParams(), Seq(
          new CosSimIndexer(tokenizer = "words", ngram = 1, binary = true,
            numCandidates = 3, lowerBound = 0.5),
          new SniIndexer(window = 2, maxGtPerName = 10)))
        .fit(gtRaw)
        .createTrainingPairs(nmRaw, createNegativeSampleFraction = 0.5, seed = 42)
    })

  /** q467/q468 feature replay — same arithmetic as [[ridgeFeats]]: the
    * q188 signed-md5-bucket sums as list HOFs, strlen target. */
  private lazy val ridgeFeatsSql: String = {
    def hx(b: Int): String =
      s"""CAST(coalesce(list_sum(list_transform(
           list_filter(string_split(trim(text), ' '), t -> t <> ''),
           t -> CASE WHEN CAST(concat('0x', substr(md5(t), 1, 12))
                          AS UBIGINT) % 8 = $b
                     THEN CASE WHEN (CAST(concat('0x', substr(md5(t), 1, 12))
                                          AS UBIGINT) // 8) % 2 = 0
                               THEN 1 ELSE -1 END
                     ELSE 0 END)), 0) AS BIGINT)"""
    s"""SELECT doc_id, ${hx(0)} AS x1, ${hx(1)} AS x2,
         CAST(strlen(text) AS BIGINT) AS y
       FROM documents WHERE text IS NOT NULL"""
  }

  /** Moments + Cramer dets in HUGEINT (λ = 10), shared by both ridge
    * oracles. Truncating `//` matches the Scala BigInt quantization. */
  private lazy val ridgeDetsSql: String =
    s"""WITH f AS MATERIALIZED ($ridgeFeatsSql),
       mo AS (
         SELECT CAST(count(*) AS HUGEINT) AS n,
                CAST(sum(x1) AS HUGEINT) AS s1,
                CAST(sum(x2) AS HUGEINT) AS s2,
                CAST(sum(x1 * x1) AS HUGEINT) AS m11,
                CAST(sum(x1 * x2) AS HUGEINT) AS m12,
                CAST(sum(x2 * x2) AS HUGEINT) AS m22,
                CAST(sum(y) AS HUGEINT) AS b0,
                CAST(sum(x1 * y) AS HUGEINT) AS b1,
                CAST(sum(x2 * y) AS HUGEINT) AS b2
         FROM f),
       aa AS (
         SELECT *, n + 10 AS a11, s1 AS a12, s2 AS a13,
                m11 + 10 AS a22, m12 AS a23, m22 + 10 AS a33
         FROM mo),
       dets AS (
         SELECT *,
           a11*(a22*a33 - a23*a23) - a12*(a12*a33 - a23*a13)
             + a13*(a12*a23 - a22*a13) AS detA,
           b0*(a22*a33 - a23*a23) - a12*(b1*a33 - a23*b2)
             + a13*(b1*a23 - a22*b2) AS det0,
           a11*(b1*a33 - a23*b2) - b0*(a12*a33 - a23*a13)
             + a13*(a12*b2 - b1*a13) AS det1,
           a11*(a22*b2 - a23*b1) - a12*(a12*b2 - b1*a13)
             + b0*(a12*a23 - a22*a13) AS det2
         FROM aa),
       w AS (
         SELECT *, det0 * 1000000 // detA AS w0,
                det1 * 1000000 // detA AS w1,
                det2 * 1000000 // detA AS w2
         FROM dets)"""

  val oracleSql: Map[String, String] = Map(
    "q467_ridge_exact_fit" ->
      s"""$ridgeDetsSql
         SELECT CAST(n AS BIGINT) AS n, CAST(10 AS BIGINT) AS lambda,
                CAST(s1 AS BIGINT) AS s1, CAST(s2 AS BIGINT) AS s2,
                CAST(m11 AS BIGINT) AS m11, CAST(m12 AS BIGINT) AS m12,
                CAST(m22 AS BIGINT) AS m22, CAST(b0 AS BIGINT) AS b0,
                CAST(b1 AS BIGINT) AS b1, CAST(b2 AS BIGINT) AS b2,
                CAST(w0 AS BIGINT) AS w0_q6, CAST(w1 AS BIGINT) AS w1_q6,
                CAST(w2 AS BIGINT) AS w2_q6
         FROM w""",
    "q468_ridge_store_apply" ->
      s"""$ridgeDetsSql
         SELECT f.doc_id, f.x1, f.x2, f.y,
                CAST(w.w0 + w.w1 * f.x1 + w.w2 * f.x2 AS BIGINT)
                  AS pred_q6,
                TRUE AS store_scan_identical
         FROM f CROSS JOIN w""",
    "q392_shapley_attribution" ->
      """WITH fp AS (SELECT user_id, min(ts) AS pts FROM events
                     WHERE event_type = 'purchase' GROUP BY 1),
         mk AS (SELECT e.user_id,
                  CAST(max(CASE WHEN e.event_type = 'click' THEN 1
                           ELSE 0 END) +
                       2 * max(CASE WHEN e.event_type = 'error' THEN 1
                               ELSE 0 END) +
                       4 * max(CASE WHEN e.event_type = 'signup' THEN 1
                               ELSE 0 END) +
                       8 * max(CASE WHEN e.event_type = 'view' THEN 1
                               ELSE 0 END) AS INT) AS mask
                FROM events e JOIN fp ON fp.user_id = e.user_id
                WHERE e.ts < fp.pts AND e.event_type IN
                  ('click', 'error', 'signup', 'view')
                GROUP BY 1),
         masks AS (SELECT fp.user_id, coalesce(mk.mask, 0) AS mask
                   FROM fp LEFT JOIN mk USING (user_id)),
         conv AS (SELECT mask AS m, CAST(count(*) AS BIGINT) AS cnt
                  FROM masks GROUP BY 1),
         subsets AS (SELECT CAST(x AS INT) AS s FROM range(0, 16) t(x)),
         v AS (SELECT s, CAST(coalesce(sum(cnt), 0) AS BIGINT) AS v
               FROM subsets LEFT JOIN conv ON (m & s) = m GROUP BY s),
         chan(channel, bit) AS (VALUES ('click', 1), ('error', 2),
                                       ('signup', 4), ('view', 8)),
         terms AS (SELECT c.channel,
                     (CASE bit_count(vl.s) WHEN 0 THEN 6 WHEN 1 THEN 2
                           WHEN 2 THEN 2 ELSE 6 END) *
                       (vh.v - vl.v) AS term
                   FROM chan c
                   JOIN v vl ON (vl.s & c.bit) = 0
                   JOIN v vh ON vh.s = (vl.s | c.bit)),
         pt AS (SELECT channel, CAST(sum(term) AS BIGINT) AS shap_xnfact
                FROM terms GROUP BY 1),
         tot AS (SELECT (SELECT v FROM v WHERE s = 15) AS vn,
                        (SELECT v FROM v WHERE s = 0) AS v0,
                        CAST(sum(shap_xnfact) AS BIGINT) AS total
                 FROM pt)
         SELECT channel, shap_xnfact,
           CASE WHEN vn - v0 > 0 THEN
             CAST(CAST(shap_xnfact AS HUGEINT) * 1000000
                  // (24 * (vn - v0)) AS BIGINT)
           END AS share_ppm,
           total = 24 * (vn - v0) AS efficiency_ok
         FROM pt, tot""",
    "q374_smoothed_rates" ->
      """WITH per AS (
           SELECT user_id, CAST(count(*) AS BIGINT) AS n_u,
                  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0
                       END) AS BIGINT) AS a_u
           FROM events GROUP BY 1),
         tot AS (
           SELECT CAST(sum(n_u) AS BIGINT) AS nn,
                  CAST(sum(a_u) AS BIGINT) AS aa
           FROM per),
         j AS (SELECT * FROM per CROSS JOIN tot),
         f AS (
           SELECT user_id, n_u, a_u,
                  CAST((CAST(a_u AS HUGEINT) * 1000000) // n_u AS BIGINT)
                    AS raw_ppm,
                  CAST((CAST(aa AS HUGEINT) * 1000000) // nn AS BIGINT)
                    AS global_ppm,
                  CAST(((CAST(a_u AS HUGEINT) * nn +
                         CAST(1000 AS HUGEINT) * aa) * 1000000) //
                       ((CAST(n_u AS HUGEINT) + 1000) * nn) AS BIGINT)
                    AS shrunk_ppm
           FROM j)
         SELECT *,
                shrunk_ppm >= least(raw_ppm, global_ppm) AND
                shrunk_ppm <= greatest(raw_ppm, global_ppm)
                  AS pulled_toward_global
         FROM f""",
    "q369_cuped_by_type" ->
      """WITH pu AS (
           SELECT event_type, user_id,
                  CAST(sum(CASE WHEN CAST(ts AS DATE) <= DATE '2024-01-15'
                       THEN CAST(floor(value * 1000000) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS x,
                  CAST(sum(CASE WHEN CAST(ts AS DATE) > DATE '2024-01-15'
                       THEN CAST(floor(value * 1000000) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS y,
                  user_id % 2 = 0 AS treat
           FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
         agg AS (
           SELECT event_type,
                  CAST(count(*) AS BIGINT) AS n_units,
                  CAST(sum(CASE WHEN treat THEN 1 ELSE 0 END) AS BIGINT)
                    AS n_t,
                  CAST(sum(CASE WHEN treat THEN 0 ELSE 1 END) AS BIGINT)
                    AS n_c,
                  CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
                  CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
                  CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
                  CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
                  CAST(sum(CASE WHEN treat THEN CAST(x AS HUGEINT)
                       ELSE 0 END) AS HUGEINT) AS sxt,
                  CAST(sum(CASE WHEN treat THEN CAST(y AS HUGEINT)
                       ELSE 0 END) AS HUGEINT) AS syt
           FROM pu GROUP BY 1),
         cv AS (
           SELECT *, n_units * sxy - sx * sy AS c,
                  n_units * sxx - sx * sx AS v
           FROM agg),
         th AS (
           SELECT *,
                  CASE WHEN v > 0 THEN abs(c) // v ELSE 0 END AS q0,
                  CASE WHEN v > 0 THEN abs(c) - (abs(c) // v) * v
                    ELSE 0 END AS r0
           FROM cv),
         th2 AS (
           SELECT *,
                  CASE WHEN v > 0 THEN (r0 * 100000) // v ELSE 0 END
                    AS q1,
                  CASE WHEN v > 0 THEN
                    ((r0 * 100000 - ((r0 * 100000) // v) * v) * 10000)
                    // v
                  ELSE 0 END AS q2
           FROM th),
         th3 AS (
           SELECT *,
                  (CASE WHEN c >= 0 THEN 1 ELSE -1 END) *
                  (q0 * 1000000000 + q1 * 10000 + q2) AS theta_q9
           FROM th2),
         dd AS (
           SELECT *,
                  syt * n_c - (sy - syt) * n_t AS dyn,
                  sxt * n_c - (sx - sxt) * n_t AS dxn,
                  CASE WHEN n_t > 0 AND n_c > 0 THEN
                    CAST(n_t AS HUGEINT) * n_c ELSE 1 END AS den
           FROM th3),
         d2 AS (
           SELECT *, abs(dyn) // den AS qd,
                  dyn * 1000000000 - theta_q9 * dxn AS a,
                  den * 1000000000 AS den9
           FROM dd),
         d3 AS (SELECT *, abs(a) // den9 AS qa FROM d2)
         SELECT event_type, n_units, n_t, n_c,
                CAST(theta_q9 AS BIGINT) AS theta_q9,
                CASE WHEN n_t > 0 AND n_c > 0 THEN
                  (CASE WHEN dyn >= 0 THEN 1 ELSE -1 END) *
                  CAST(qd * 1000000 +
                       ((abs(dyn) - qd * den) * 1000000) // den AS BIGINT)
                ELSE NULL END AS diff_x1e6,
                CASE WHEN n_t > 0 AND n_c > 0 THEN
                  (CASE WHEN a >= 0 THEN 1 ELSE -1 END) *
                  CAST(qa * 1000000 +
                       ((abs(a) - qa * den9) * 1000000) // den9 AS BIGINT)
                ELSE NULL END AS adj_x1e6
         FROM d3""",
    "q368_cuped" ->
      """WITH pu AS (
           SELECT user_id,
                  CAST(sum(CASE WHEN CAST(ts AS DATE) <= DATE '2024-01-15'
                       THEN CAST(floor(value * 1000000) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS x,
                  CAST(sum(CASE WHEN CAST(ts AS DATE) > DATE '2024-01-15'
                       THEN CAST(floor(value * 1000000) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS y,
                  user_id % 2 = 0 AS treat
           FROM events WHERE value IS NOT NULL GROUP BY user_id),
         agg AS (
           SELECT CAST(count(*) AS BIGINT) AS n_units,
                  CAST(sum(CASE WHEN treat THEN 1 ELSE 0 END) AS BIGINT)
                    AS n_t,
                  CAST(sum(CASE WHEN treat THEN 0 ELSE 1 END) AS BIGINT)
                    AS n_c,
                  CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
                  CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
                  CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
                  CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
                  CAST(sum(CASE WHEN treat THEN CAST(x AS HUGEINT)
                       ELSE 0 END) AS HUGEINT) AS sxt,
                  CAST(sum(CASE WHEN treat THEN CAST(y AS HUGEINT)
                       ELSE 0 END) AS HUGEINT) AS syt
           FROM pu),
         cv AS (
           SELECT *, n_units * sxy - sx * sy AS c,
                  n_units * sxx - sx * sx AS v
           FROM agg),
         th AS (
           SELECT *,
                  CASE WHEN v > 0 THEN abs(c) // v ELSE 0 END AS q0,
                  CASE WHEN v > 0 THEN abs(c) - (abs(c) // v) * v
                    ELSE 0 END AS r0
           FROM cv),
         th2 AS (
           SELECT *,
                  CASE WHEN v > 0 THEN (r0 * 100000) // v ELSE 0 END
                    AS q1,
                  CASE WHEN v > 0 THEN
                    ((r0 * 100000 - ((r0 * 100000) // v) * v) * 10000)
                    // v
                  ELSE 0 END AS q2
           FROM th),
         th3 AS (
           SELECT *,
                  (CASE WHEN c >= 0 THEN 1 ELSE -1 END) *
                  (q0 * 1000000000 + q1 * 10000 + q2) AS theta_q9
           FROM th2),
         dd AS (
           SELECT *,
                  syt * n_c - (sy - syt) * n_t AS dyn,
                  sxt * n_c - (sx - sxt) * n_t AS dxn,
                  CASE WHEN n_t > 0 AND n_c > 0 THEN
                    CAST(n_t AS HUGEINT) * n_c ELSE 1 END AS den
           FROM th3),
         d2 AS (
           SELECT *, abs(dyn) // den AS qd,
                  dyn * 1000000000 - theta_q9 * dxn AS a,
                  den * 1000000000 AS den9
           FROM dd),
         d3 AS (SELECT *, abs(a) // den9 AS qa FROM d2)
         SELECT n_units, n_t, n_c,
                CAST(theta_q9 AS BIGINT) AS theta_q9,
                CASE WHEN n_t > 0 AND n_c > 0 THEN
                  (CASE WHEN dyn >= 0 THEN 1 ELSE -1 END) *
                  CAST(qd * 1000000 +
                       ((abs(dyn) - qd * den) * 1000000) // den AS BIGINT)
                ELSE NULL END AS diff_x1e6,
                CASE WHEN n_t > 0 AND n_c > 0 THEN
                  (CASE WHEN a >= 0 THEN 1 ELSE -1 END) *
                  CAST(qa * 1000000 +
                       ((abs(a) - qa * den9) * 1000000) // den9 AS BIGINT)
                ELSE NULL END AS adj_x1e6
         FROM d3""",
    "q330_fellegi_sunter" ->
      """WITH pairs AS (
           SELECT CASE WHEN o_custkey = c_custkey THEN 1 ELSE 0 END
                    AS lbl,
                  CASE WHEN o_custkey % 97 = c_custkey % 97 THEN 1 ELSE 0
                    END AS f_mod97,
                  CASE WHEN o_custkey % 13 = c_custkey % 13 THEN 1 ELSE 0
                    END AS f_mod13,
                  CASE WHEN (o_custkey + c_custkey) % 2 = 0 THEN 1 ELSE 0
                    END AS f_parity
           FROM (SELECT o_orderkey, o_custkey FROM orders
                 WHERE o_orderkey % 20 = 0) o
           JOIN customer ON o_custkey % 50 = c_custkey % 50),
         stacked AS (
           SELECT 'f_mod97' AS feature, f_mod97 AS agree, lbl FROM pairs
           UNION ALL
           SELECT 'f_mod13', f_mod13, lbl FROM pairs
           UNION ALL
           SELECT 'f_parity', f_parity, lbl FROM pairs),
         agg AS (
           SELECT feature,
                  CAST(sum(CASE WHEN lbl = 1 AND agree = 1 THEN 1 ELSE 0
                    END) AS BIGINT) AS am,
                  CAST(sum(CASE WHEN lbl = 1 THEN 1 ELSE 0 END) AS BIGINT)
                    AS nm,
                  CAST(sum(CASE WHEN lbl = 0 AND agree = 1 THEN 1 ELSE 0
                    END) AS BIGINT) AS au,
                  CAST(sum(CASE WHEN lbl = 0 THEN 1 ELSE 0 END) AS BIGINT)
                    AS nu
           FROM stacked GROUP BY feature)
         SELECT feature, nm AS n_match, nu AS n_unmatch,
                am AS n_agree_match, au AS n_agree_unmatch,
                CAST(CAST(am AS HUGEINT) * 1000000 // nm AS BIGINT)
                  AS m_ppm,
                CAST(CAST(au AS HUGEINT) * 1000000 // nu AS BIGINT)
                  AS u_ppm,
                TRUE AS w_agree_ok, TRUE AS w_disagree_ok
         FROM agg""",
    "q327_bradley_terry" -> {
      val iter = (i: Int) => {
        val prev = s"r${i - 1}"
        s"""d$i AS (
           SELECT g.a AS item,
                  CAST(sum(CAST(floor(CAST(g.n_ab AS DOUBLE) * 1000000000
                    / (CAST(ra.rating_micro AS DOUBLE) +
                       CAST(rb.rating_micro AS DOUBLE))) AS BIGINT))
                    AS BIGINT) AS denom
           FROM games g
           JOIN $prev ra ON g.a = ra.item
           JOIN $prev rb ON g.b = rb.item
           GROUP BY g.a),
         u$i AS (
           SELECT r.item, r.wins,
                  CASE WHEN d.denom > 0 THEN
                    CAST(floor(CAST(r.wins AS DOUBLE) * 1000000000
                      * 1000000 / CAST(d.denom AS DOUBLE)) AS BIGINT)
                  ELSE 1000000 END AS raw
           FROM $prev r LEFT JOIN d$i d USING (item)),
         r$i AS (
           SELECT item, wins,
                  CAST(floor(CAST(raw AS DOUBLE) * 1000000 /
                    (sum(raw) OVER () / count(*) OVER ())) AS BIGINT)
                    AS rating_micro
           FROM u$i),"""
      }
      s"""WITH ev AS (
           SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id,
                  CAST(floor(value * 1000000) AS BIGINT) AS v
           FROM events WHERE value IS NOT NULL),
         lagd AS (
           SELECT *, lag(event_type) OVER w AS pt, lag(v) OVER w AS pv
           FROM ev
           WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
         dir AS (
           SELECT CASE WHEN v > pv THEN event_type ELSE pt END AS a,
                  CASE WHEN v > pv THEN pt ELSE event_type END AS b
           FROM lagd
           WHERE pt IS NOT NULL AND pt <> event_type AND v <> pv),
         dpairs AS (
           SELECT a, b, CAST(count(*) AS BIGINT) AS wins
           FROM dir GROUP BY 1, 2),
         games AS (
           SELECT a, b, CAST(sum(w) AS BIGINT) AS n_ab
           FROM (SELECT a, b, wins AS w FROM dpairs
                 UNION ALL SELECT b, a, wins FROM dpairs)
           GROUP BY 1, 2),
         wt AS (SELECT a AS item, CAST(sum(wins) AS BIGINT) AS wins
                FROM dpairs GROUP BY 1),
         r0 AS (
           SELECT i.item, COALESCE(wt.wins, 0) AS wins,
                  CAST(1000000 AS BIGINT) AS rating_micro
           FROM (SELECT DISTINCT a AS item FROM games) i
           LEFT JOIN wt USING (item)),
         ${iter(1)}
         ${iter(2)}
         ${iter(3)}
         gt AS (SELECT a AS item, CAST(sum(n_ab) AS BIGINT) AS games
                FROM games GROUP BY 1)
         SELECT r3.item, r3.wins, gt.games, r3.rating_micro,
                CAST(row_number() OVER (ORDER BY r3.rating_micro DESC,
                  r3.item ASC) AS BIGINT) AS rank
         FROM r3 JOIN gt USING (item)"""
    },
    "q325_pca_from_store" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_vectors,
                CAST(64 AS BIGINT) AS d, CAST(4 AS BIGINT) AS k,
                CAST(2 AS BIGINT) AS n_batches,
                TRUE AS store_scan_identical
         FROM embeddings""",
    "q324_monotone_woe" ->
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
         f AS (SELECT kb AS b, max(m) AS iso_fit FROM sm GROUP BY 1),
         pb AS (SELECT bins.b, bins.n, bins.n_pos, f.iso_fit
                FROM bins JOIN f USING (b)),
         merged AS (
           SELECT iso_fit, CAST(min(b) AS BIGINT) AS bin_lo,
                  CAST(max(b) AS BIGINT) AS bin_hi,
                  CAST(sum(n_pos) AS BIGINT) AS n_pos,
                  CAST(sum(n) - sum(n_pos) AS BIGINT) AS n_neg
           FROM pb GROUP BY iso_fit),
         m2 AS (
           SELECT *, CAST(sum(n_pos) OVER () AS BIGINT) AS p,
                  CAST(sum(n_neg) OVER () AS BIGINT) AS q
           FROM merged),
         w AS (
           SELECT bin_lo, bin_hi, n_pos, n_neg,
                  CASE WHEN n_pos > 0 AND n_neg > 0 THEN
                    CAST(CAST(n_pos AS HUGEINT) * q * 1000000000
                         // (CAST(n_neg AS HUGEINT) * p) AS BIGINT)
                  END AS odds_q9
           FROM m2)
         SELECT bin_lo, bin_hi, n_pos, n_neg, odds_q9,
                TRUE AS woe_ok, TRUE AS iv_ok,
                COALESCE(odds_q9 >= lag(odds_q9) OVER (ORDER BY bin_lo),
                  TRUE) AS woe_monotone
         FROM w""",
    "q318_qini_uplift" ->
      """WITH users AS (
           SELECT user_id,
                  max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS resp,
                  CAST(user_id % 2 AS INT) AS d,
                  CAST(user_id % 5 AS BIGINT) AS seg,
                  CAST((user_id // 2) % 2 AS INT) AS half
           FROM events GROUP BY user_id),
         sc AS (
           SELECT seg,
                  CAST(sum(CASE WHEN d = 1 THEN resp ELSE 0 END) AS BIGINT)
                    AS rt,
                  CAST(sum(CASE WHEN d = 1 THEN 1 ELSE 0 END) AS BIGINT)
                    AS nt,
                  CAST(sum(CASE WHEN d = 0 THEN resp ELSE 0 END) AS BIGINT)
                    AS rc,
                  CAST(sum(CASE WHEN d = 0 THEN 1 ELSE 0 END) AS BIGINT)
                    AS nc
           FROM users WHERE half = 0 GROUP BY seg),
         score AS (
           SELECT seg,
                  CAST((CAST(rt AS HUGEINT) * nc - CAST(rc AS HUGEINT) * nt)
                    * 1000000 // (CAST(nt AS HUGEINT) * nc) AS BIGINT)
                    AS score
           FROM sc WHERE nt > 0 AND nc > 0),
         ev AS (
           SELECT u.user_id, u.resp, u.d, s.score
           FROM users u JOIN score s ON u.seg = s.seg WHERE u.half = 1),
         rk AS (
           SELECT *,
                  row_number() OVER (ORDER BY score DESC, user_id ASC)
                    AS rn,
                  count(*) OVER () AS n
           FROM ev),
         dec AS (
           SELECT CAST((rn - 1) * 10 // n AS BIGINT) AS decile,
                  CAST(sum(d) AS BIGINT) AS n_treat,
                  CAST(sum(1 - d) AS BIGINT) AS n_ctrl,
                  CAST(sum(d * resp) AS BIGINT) AS resp_treat,
                  CAST(sum((1 - d) * resp) AS BIGINT) AS resp_ctrl
           FROM rk GROUP BY 1),
         cum AS (
           SELECT *,
                  CAST(sum(n_treat) OVER w AS BIGINT) AS cnt,
                  CAST(sum(n_ctrl) OVER w AS BIGINT) AS cnc,
                  CAST(sum(resp_treat) OVER w AS BIGINT) AS crt,
                  CAST(sum(resp_ctrl) OVER w AS BIGINT) AS crc
           FROM dec
           WINDOW w AS (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW))
         SELECT decile, n_treat, n_ctrl, resp_treat, resp_ctrl,
                CASE WHEN cnt > 0 AND cnc > 0 THEN
                  CAST((CAST(crt AS HUGEINT) * cnc -
                        CAST(crc AS HUGEINT) * cnt) * 1000000 //
                       (CAST(cnt AS HUGEINT) * cnc) AS BIGINT) END
                  AS cum_uplift_ppm
         FROM cum""",
    "q315_conformal_intervals" ->
      """WITH ev AS (
           SELECT event_type, user_id % 4 AS split,
                  CAST(floor(value * 1000000) AS BIGINT) AS y
           FROM events WHERE value IS NOT NULL),
         m AS (
           SELECT event_type,
                  CAST(sum(CAST(y AS HUGEINT)) // count(*) AS BIGINT)
                    AS pred
           FROM ev WHERE split <= 1 GROUP BY 1),
         sc AS (
           SELECT split, abs(y - pred) AS r
           FROM ev JOIN m USING (event_type) WHERE split >= 2),
         dom AS (
           SELECT r, CAST(count(*) AS BIGINT) AS cnt
           FROM sc WHERE split = 2 GROUP BY 1),
         rk AS (
           SELECT r,
                  sum(cnt) OVER (ORDER BY r ROWS BETWEEN UNBOUNDED
                    PRECEDING AND CURRENT ROW) AS cum,
                  sum(cnt) OVER () AS nc
           FROM dom),
         q AS (
           SELECT CAST(max(nc) AS BIGINT) AS n_calib,
                  CAST(max(((nc + 1) * 900000 + 999999) // 1000000)
                    AS BIGINT) AS k_rank,
                  CAST(min(CASE WHEN cum >=
                      ((nc + 1) * 900000 + 999999) // 1000000
                    THEN r END) AS BIGINT) AS q_hat_u
           FROM rk)
         SELECT q.n_calib, CAST(count(*) AS BIGINT) AS n_test, q.k_rank,
                q.q_hat_u,
                CAST(CAST(sum(CASE WHEN sc.r <= COALESCE(q.q_hat_u,
                       9223372036854775807) THEN 1 ELSE 0 END) AS HUGEINT)
                     * 1000000 // count(*) AS BIGINT) AS coverage_ppm
         FROM sc, q WHERE sc.split = 3
         GROUP BY q.n_calib, q.k_rank, q.q_hat_u""",
    "q316_target_encode_oof" ->
      """WITH ev AS (
           SELECT event_type, user_id % 3 AS fold,
                  CAST(floor(value * 1000000) AS BIGINT) AS y
           FROM events WHERE value IS NOT NULL),
         cells AS (
           SELECT event_type, fold, CAST(count(*) AS BIGINT) AS n_in_fold,
                  CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS s
           FROM ev GROUP BY 1, 2),
         m AS (
           SELECT *,
                  CAST(sum(s) OVER (PARTITION BY event_type) AS HUGEINT)
                    AS st,
                  CAST(sum(n_in_fold) OVER (PARTITION BY event_type)
                    AS BIGINT) AS nt,
                  CAST(sum(s) OVER () AS HUGEINT) AS sg,
                  CAST(sum(n_in_fold) OVER () AS BIGINT) AS ng
           FROM cells)
         SELECT event_type, fold, n_in_fold,
                CAST(CASE WHEN nt > n_in_fold
                       THEN (st - s) // (nt - n_in_fold)
                     WHEN ng > n_in_fold
                       THEN (sg - s) // (ng - n_in_fold)
                     ELSE 0 END AS BIGINT) AS enc_u
         FROM m""",
    "q317_dml_ate" ->
      """WITH ev AS (
           SELECT CAST(hour(ts) // 6 AS BIGINT) AS seg,
                  CAST(user_id % 2 AS BIGINT) AS d,
                  CAST((user_id // 2) % 2 AS BIGINT) AS fold,
                  CAST(floor(value * 1000000) AS BIGINT) AS y
           FROM events WHERE value IS NOT NULL),
         base AS (SELECT seg, fold, d * 1000000 AS d_ppm, y FROM ev),
         ycells AS (
           SELECT seg, fold, CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS s
           FROM base GROUP BY 1, 2),
         ym AS (
           SELECT seg, fold,
                  CAST(CASE WHEN CAST(sum(n) OVER (PARTITION BY seg)
                         AS BIGINT) > n
                       THEN (CAST(sum(s) OVER (PARTITION BY seg)
                              AS HUGEINT) - s) //
                            (CAST(sum(n) OVER (PARTITION BY seg)
                              AS BIGINT) - n)
                       WHEN CAST(sum(n) OVER () AS BIGINT) > n
                       THEN (CAST(sum(s) OVER () AS HUGEINT) - s) //
                            (CAST(sum(n) OVER () AS BIGINT) - n)
                       ELSE 0 END AS BIGINT) AS my
           FROM ycells),
         dcells AS (
           SELECT seg, fold, CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(CAST(d_ppm AS HUGEINT)) AS HUGEINT) AS s
           FROM base GROUP BY 1, 2),
         dm AS (
           SELECT seg, fold,
                  CAST(CASE WHEN CAST(sum(n) OVER (PARTITION BY seg)
                         AS BIGINT) > n
                       THEN (CAST(sum(s) OVER (PARTITION BY seg)
                              AS HUGEINT) - s) //
                            (CAST(sum(n) OVER (PARTITION BY seg)
                              AS BIGINT) - n)
                       WHEN CAST(sum(n) OVER () AS BIGINT) > n
                       THEN (CAST(sum(s) OVER () AS HUGEINT) - s) //
                            (CAST(sum(n) OVER () AS BIGINT) - n)
                       ELSE 0 END AS BIGINT) AS md
           FROM dcells),
         resid AS (
           SELECT b.y - ym.my AS yt, b.d_ppm - dm.md AS dt
           FROM base b
           JOIN ym ON b.seg = ym.seg AND b.fold = ym.fold
           JOIN dm ON b.seg = dm.seg AND b.fold = dm.fold),
         agg AS (
           SELECT CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(CAST(yt AS HUGEINT) * dt) AS HUGEINT) AS num,
                  CAST(sum(CAST(dt AS HUGEINT) * dt) AS HUGEINT) AS den
           FROM resid)
         SELECT n,
                CASE WHEN den > 0
                  THEN CAST((num * 1000000) // den AS BIGINT) END
                  AS theta_u
         FROM agg""",
    "q311_woe_iv" ->
      """WITH ev AS (
           SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
                  CAST(least(floor(value / 50), 9) AS BIGINT) AS vb
           FROM events WHERE value IS NOT NULL),
         b AS (
           SELECT vb AS bucket, CAST(sum(y) AS BIGINT) AS n_pos,
                  CAST(sum(1 - y) AS BIGINT) AS n_neg
           FROM ev GROUP BY 1),
         m AS (
           SELECT *, CAST(sum(n_pos) OVER () AS BIGINT) AS p,
                  CAST(sum(n_neg) OVER () AS BIGINT) AS q
           FROM b)
         SELECT bucket, n_pos, n_neg,
                CASE WHEN n_pos > 0 AND n_neg > 0 THEN
                  CAST(CAST(n_pos AS HUGEINT) * q * 1000000000
                       // (CAST(n_neg AS HUGEINT) * p) AS BIGINT)
                END AS odds_q9,
                TRUE AS woe_ok, TRUE AS iv_ok
         FROM m""",
    "q309_pca_project" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_vectors,
                CAST(64 AS BIGINT) AS d, CAST(4 AS BIGINT) AS k,
                TRUE AS orthonormal_ok, TRUE AS eigs_sorted_ok,
                CAST(0 AS BIGINT) AS var_match_violations,
                TRUE AS recon_identity_ok
         FROM embeddings""",
    "q297_gini_gain" ->
      """WITH ev AS (
           SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
                  CAST(hour(ts) // 6 AS BIGINT) AS f_hour4,
                  CAST((CAST(ts AS DATE) - DATE '1970-01-01') % 7 AS BIGINT)
                    AS f_dow,
                  CAST(user_id % 5 AS BIGINT) AS f_cohort,
                  CAST(least(floor(value / 50), 9) AS BIGINT) AS f_vbucket
           FROM events WHERE value IS NOT NULL),
         stacked AS (
           SELECT 'f_hour4' AS feature, f_hour4 AS fv, y FROM ev
           UNION ALL SELECT 'f_dow', f_dow, y FROM ev
           UNION ALL SELECT 'f_cohort', f_cohort, y FROM ev
           UNION ALL SELECT 'f_vbucket', f_vbucket, y FROM ev),
         cells AS (
           SELECT feature, fv, CAST(count(*) AS BIGINT) AS n_f,
                  CAST(sum(y) AS BIGINT) AS n_f1
           FROM stacked GROUP BY 1, 2),
         terms AS (
           SELECT feature, fv, n_f,
                  CAST(CAST(n_f1 AS HUGEINT) * n_f1 +
                       CAST(n_f - n_f1 AS HUGEINT) * (n_f - n_f1)
                       AS DOUBLE) / CAST(n_f AS DOUBLE) AS term
           FROM cells),
         cum AS (
           SELECT feature, n_f, term,
                  sum(term) OVER (PARTITION BY feature ORDER BY fv
                    ROWS UNBOUNDED PRECEDING) AS c
           FROM terms),
         pf AS (
           SELECT feature, CAST(sum(n_f) AS BIGINT) AS n,
                  CAST(count(*) AS BIGINT) AS n_values,
                  max(c) AS t
           FROM cum GROUP BY feature),
         par AS (
           SELECT 1.0 - CAST(CAST(p AS HUGEINT) * p +
                    CAST(n - p AS HUGEINT) * (n - p) AS DOUBLE) /
                  CAST(CAST(n AS HUGEINT) * n AS DOUBLE) AS parent_impurity
           FROM (SELECT CAST(count(*) AS BIGINT) AS n,
                        CAST(sum(y) AS BIGINT) AS p FROM ev))
         SELECT pf.feature, pf.n, pf.n_values, par.parent_impurity,
                1.0 - pf.t / CAST(pf.n AS DOUBLE) AS child_impurity,
                par.parent_impurity -
                  (1.0 - pf.t / CAST(pf.n AS DOUBLE)) AS gini_gain
         FROM pf, par""",
    "q264_cluster_eval" ->
      """WITH l AS (
           SELECT p_partkey AS id, p_brand,
                  min(p_partkey) OVER (PARTITION BY p_name) AS cluster_id
           FROM part),
         cells AS (
           SELECT cluster_id, p_brand, CAST(count(*) AS BIGINT) AS n_cg
           FROM l GROUP BY 1, 2),
         t AS (
           SELECT CAST(sum(CAST(n_cg AS HUGEINT) * (n_cg - 1)) // 2
                       AS HUGEINT) AS tp,
                  CAST(sum(n_cg) AS BIGINT) AS n,
                  CAST(count(DISTINCT cluster_id) AS BIGINT)
                    AS n_pred_clusters,
                  CAST(count(DISTINCT p_brand) AS BIGINT) AS n_gold_classes
           FROM cells),
         p AS (
           SELECT CAST(sum(CAST(n_c AS HUGEINT) * (n_c - 1)) // 2
                       AS HUGEINT) AS pred_pairs
           FROM (SELECT CAST(sum(n_cg) AS BIGINT) AS n_c
                 FROM cells GROUP BY cluster_id)),
         g AS (
           SELECT CAST(sum(CAST(n_g AS HUGEINT) * (n_g - 1)) // 2
                       AS HUGEINT) AS gold_pairs
           FROM (SELECT CAST(sum(n_cg) AS BIGINT) AS n_g
                 FROM cells GROUP BY p_brand)),
         m AS (
           SELECT t.*, p.pred_pairs, g.gold_pairs,
                  CAST(CAST(t.n AS HUGEINT) * (t.n - 1) // 2 AS HUGEINT)
                    AS n2
           FROM t, p, g)
         SELECT n, n_pred_clusters, n_gold_classes,
                CAST(tp AS BIGINT) AS tp_pairs,
                CAST(pred_pairs AS BIGINT) AS pred_pairs,
                CAST(gold_pairs AS BIGINT) AS gold_pairs,
                CAST(CASE WHEN pred_pairs > 0
                     THEN tp * 1000000 // pred_pairs ELSE 0 END AS BIGINT)
                  AS precision_ppm,
                CAST(CASE WHEN gold_pairs > 0
                     THEN tp * 1000000 // gold_pairs ELSE 0 END AS BIGINT)
                  AS recall_ppm,
                CAST(CASE WHEN pred_pairs + gold_pairs > 0
                     THEN tp * 2000000 // (pred_pairs + gold_pairs)
                     ELSE 0 END AS BIGINT) AS f1_ppm,
                (CAST(n2 AS DOUBLE) * CAST(tp AS DOUBLE) -
                 CAST(pred_pairs AS DOUBLE) * CAST(gold_pairs AS DOUBLE)) /
                (CAST(n2 AS DOUBLE) *
                   CAST(pred_pairs + gold_pairs AS DOUBLE) / 2.0 -
                 CAST(pred_pairs AS DOUBLE) * CAST(gold_pairs AS DOUBLE))
                  AS ari
         FROM m""",
    "q254_training_downsample" ->
      """SELECT CAST(10 AS BIGINT) AS n_entities_kept,
                CAST(0 AS BIGINT) AS unexpected_entities,
                CAST(0 AS BIGINT) AS missing_names_of_kept_entities""",
    "q210_coverage_split" ->
      """WITH d AS (
           SELECT doc_id, lang, source,
                  md5('cov|' || CAST(doc_id AS VARCHAR)) AS h
           FROM documents),
         m AS (
           SELECT *, row_number() OVER (PARTITION BY lang, source
                  ORDER BY h, doc_id) = 1 AS is_cell_guarantee
           FROM d),
         c AS (
           SELECT CAST(sum(CASE WHEN is_cell_guarantee THEN 1 ELSE 0 END)
                       AS BIGINT) AS n
           FROM m),
         f AS (
           SELECT doc_id FROM (
             SELECT doc_id, row_number() OVER (ORDER BY h, doc_id) AS grn
             FROM m WHERE NOT is_cell_guarantee) sub
           CROSS JOIN c WHERE grn <= greatest(100 - c.n, 0))
         SELECT m.doc_id, m.lang, m.source, m.is_cell_guarantee,
                (m.is_cell_guarantee OR f.doc_id IS NOT NULL) AS in_eval
         FROM m LEFT JOIN f USING (doc_id)""",
    "q244_ab_bootstrap_ci" ->
      """WITH ev AS (
           SELECT event_id,
                  CAST(floor(value * 1000000) AS BIGINT) AS value_u,
                  CAST(concat('0x', substr(md5(concat('arm|',
                       CAST(user_id AS VARCHAR))), 1, 12)) AS UBIGINT) % 2
                    AS arm
           FROM events WHERE value IS NOT NULL),
         reps AS (
           SELECT arm, t.r, value_u,
                  CAST(concat('0x', substr(md5(concat(
                       CAST(event_id AS VARCHAR), '|', CAST(t.r AS VARCHAR))),
                       1, 12)) AS UBIGINT) % 10000 AS m
           FROM ev, range(32) t(r)),
         wts AS (
           SELECT arm, r, value_u,
                  CASE WHEN m < 3679 THEN 0 WHEN m < 7358 THEN 1
                       WHEN m < 9197 THEN 2 ELSE 3 END AS w
           FROM reps),
         means AS (
           SELECT arm, r,
                  CAST(CAST(sum(w * value_u) AS HUGEINT) //
                       nullif(sum(w), 0) AS BIGINT) AS mean_r_u
           FROM wts GROUP BY 1, 2),
         bands AS (
           SELECT arm, CAST(min(mean_r_u) AS BIGINT) AS lo_u,
                  CAST(max(mean_r_u) AS BIGINT) AS hi_u
           FROM means GROUP BY 1)
         SELECT a0.lo_u AS lo0, a0.hi_u AS hi0,
                a1.lo_u AS lo1, a1.hi_u AS hi1,
                (a0.lo_u <= a1.hi_u AND a1.lo_u <= a0.hi_u) AS ci_overlap
         FROM (SELECT * FROM bands WHERE arm = 0) a0
         CROSS JOIN (SELECT * FROM bands WHERE arm = 1) a1""",
    "q198_ab_srm_gate" ->
      """WITH ev AS (
           SELECT user_id,
                  CAST(floor(value * 1000000) AS BIGINT) AS value_u,
                  CAST(concat('0x', substr(md5(concat('arm|',
                       CAST(user_id AS VARCHAR))), 1, 12)) AS UBIGINT) % 2
                    AS arm
           FROM events WHERE value IS NOT NULL),
         u AS (
           SELECT CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
                    AS n_arm0,
                  CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
                    AS n_arm1
           FROM (SELECT DISTINCT user_id, arm FROM ev)),
         m AS (
           SELECT CAST(CAST(sum(CASE WHEN arm = 0 THEN value_u ELSE 0 END)
                       AS HUGEINT) //
                       nullif(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END), 0)
                       AS BIGINT) AS mean0_u,
                  CAST(CAST(sum(CASE WHEN arm = 1 THEN value_u ELSE 0 END)
                       AS HUGEINT) //
                       nullif(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END), 0)
                       AS BIGINT) AS mean1_u
           FROM ev)
         SELECT CAST(n_arm0 + n_arm1 AS BIGINT) AS n_users, n_arm0, n_arm1,
                (n_arm0 - n_arm1) * (n_arm0 - n_arm1) <= 16 * (n_arm0 + n_arm1)
                  AS srm_ok,
                mean0_u, mean1_u,
                CAST(mean1_u - mean0_u AS BIGINT) AS diff_u
         FROM u CROSS JOIN m""",
    "q179_annotator_kappa" ->
      """WITH d AS (
           SELECT lang, n_chars >= 300 AS ra,
                  len(string_split(trim(text), ' ')) >= 40 AS rb
           FROM documents WHERE text IS NOT NULL),
         g AS (
           SELECT lang, CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(CASE WHEN ra THEN 1 ELSE 0 END) AS BIGINT) AS a_yes,
                  CAST(sum(CASE WHEN rb THEN 1 ELSE 0 END) AS BIGINT) AS b_yes,
                  CAST(sum(CASE WHEN ra = rb THEN 1 ELSE 0 END) AS BIGINT)
                    AS n_agree
           FROM d GROUP BY lang),
         p AS (
           SELECT *,
                  CAST((CAST(n_agree AS HUGEINT) * 1000000) // n AS BIGINT)
                    AS po_ppm,
                  CAST(((CAST(a_yes AS HUGEINT) * b_yes +
                         CAST(n - a_yes AS HUGEINT) * (n - b_yes)) * 1000000)
                       // (CAST(n AS HUGEINT) * n) AS BIGINT) AS pe_ppm
           FROM g)
         SELECT lang, n, a_yes, b_yes, n_agree, po_ppm, pe_ppm,
                CASE WHEN pe_ppm = 1000000 THEN NULL
                     ELSE (CASE WHEN po_ppm >= pe_ppm THEN 1 ELSE -1 END) *
                          CAST((abs(CAST(po_ppm AS HUGEINT) - pe_ppm) * 1000000)
                               // (1000000 - pe_ppm) AS BIGINT)
                END AS kappa_x1e6
         FROM p""",
    "q339_fleiss_kappa" ->
      """WITH ann AS (
           SELECT doc_id,
                  least((n_chars + 37 * r.j) // 150, 3) AS category
           FROM documents, (SELECT unnest([0, 1, 2]) AS j) r),
         cells AS (
           SELECT doc_id, category, CAST(count(*) AS BIGINT) AS nic
           FROM ann GROUP BY 1, 2),
         per_item AS (
           SELECT doc_id, sum(CAST(nic AS HUGEINT) * (nic - 1)) AS ai,
                  CAST(sum(nic) AS BIGINT) AS ni
           FROM cells GROUP BY doc_id),
         cat AS (
           SELECT CAST(count(*) AS BIGINT) AS n_categories,
                  sum(CAST(tc AS HUGEINT) * tc) AS big_c
           FROM (SELECT category, CAST(sum(nic) AS BIGINT) AS tc
                 FROM cells GROUP BY 1)),
         it AS (
           SELECT CAST(count(*) AS BIGINT) AS n_items,
                  CAST(max(ni) AS BIGINT) AS n_raters,
                  sum(ai) AS big_a
           FROM per_item),
         j AS (
           SELECT *,
                  CAST(n_items AS HUGEINT) * n_raters * (n_raters - 1) AS b,
                  CAST(n_items AS HUGEINT) * n_raters * n_items * n_raters
                    AS d
           FROM it, cat)
         SELECT n_items, n_raters, n_categories,
                CAST(big_a * 1000000 // b AS BIGINT) AS po_ppm,
                CAST(big_c * 1000000 // d AS BIGINT) AS pe_ppm,
                CASE WHEN d = big_c THEN NULL ELSE
                  (CASE WHEN big_a * d >= big_c * b THEN 1 ELSE -1 END) *
                  CAST(abs(big_a * d - big_c * b) * 1000000
                       // (b * (d - big_c)) AS BIGINT)
                END AS kappa_x1e6
         FROM j""",
    "q345_krippendorff_alpha" ->
      """WITH ann AS (
           SELECT doc_id,
                  least((n_chars + 37 * r.j) // 150, 3) AS cat
           FROM documents, (SELECT unnest([0, 1, 2]) AS j) r
           WHERE (doc_id + r.j) % 4 <> 0),
         cells AS (
           SELECT doc_id, cat, CAST(count(*) AS BIGINT) AS nic
           FROM ann GROUP BY 1, 2),
         item AS (
           SELECT doc_id, CAST(sum(nic) AS BIGINT) AS ni,
                  sum(CAST(nic AS HUGEINT) * nic) AS s2
           FROM cells GROUP BY 1),
         keep AS (SELECT * FROM item WHERE ni >= 2),
         pi AS (
           SELECT doc_id, ni,
                  CAST((CAST(ni AS HUGEINT) * ni - s2) * 1000000000
                       // (ni - 1) AS BIGINT) AS do_q9
           FROM keep),
         it AS (
           SELECT CAST(count(*) AS BIGINT) AS n_items_kept,
                  CAST(sum(ni) AS BIGINT) AS n_ratings,
                  CAST(sum(do_q9) AS BIGINT) AS do_sum_q9
           FROM pi),
         ct AS (
           SELECT cat, CAST(sum(nic) AS BIGINT) AS tc
           FROM cells JOIN keep USING (doc_id) GROUP BY 1),
         cc AS (SELECT CAST(count(*) AS BIGINT) AS n_categories FROM ct),
         de AS (SELECT CAST(sum(CAST(tc AS HUGEINT) * (n_ratings - tc))
                       AS BIGINT) AS de_pairs
                FROM ct, it)
         SELECT n_items_kept, n_ratings, n_categories, do_sum_q9, de_pairs,
                CASE WHEN de_pairs <= 0 THEN NULL ELSE
                  (CASE WHEN CAST(de_pairs AS HUGEINT) * 1000000000 >=
                        CAST(n_ratings - 1 AS HUGEINT) * do_sum_q9
                   THEN 1 ELSE -1 END) *
                  CAST(abs(CAST(de_pairs AS HUGEINT) * 1000000000 -
                       CAST(n_ratings - 1 AS HUGEINT) * do_sum_q9) * 1000000
                       // (CAST(de_pairs AS HUGEINT) * 1000000000)
                       AS BIGINT)
                END AS alpha_x1e6
         FROM it, cc, de""",
    "q346_weighted_kappa" ->
      """WITH d AS (
           SELECT least(n_chars // 150, 3) AS i,
                  least(len(string_split(trim(text), ' ')) // 25, 3) AS j
           FROM documents),
         cells AS (
           SELECT i, j, CAST(count(*) AS BIGINT) AS o FROM d GROUP BY 1, 2),
         obs AS (
           SELECT CAST(sum(o) AS BIGINT) AS n_pairs,
                  CAST(count(DISTINCT i) AS BIGINT) AS k_a,
                  CAST(count(DISTINCT j) AS BIGINT) AS k_b,
                  CAST(sum(abs(i - j) * CAST(o AS HUGEINT)) AS BIGINT)
                    AS w_obs
           FROM cells),
         ri AS (SELECT i, CAST(sum(o) AS BIGINT) AS r FROM cells GROUP BY 1),
         cj AS (SELECT j, CAST(sum(o) AS BIGINT) AS c FROM cells GROUP BY 1),
         ex AS (SELECT CAST(sum(abs(i - j) * CAST(r AS HUGEINT) * c)
                       AS BIGINT) AS w_exp
                FROM ri, cj)
         SELECT n_pairs, k_a, k_b, w_obs, w_exp,
                CASE WHEN w_exp <= 0 THEN NULL ELSE
                  (CASE WHEN CAST(w_exp AS HUGEINT) >=
                        CAST(n_pairs AS HUGEINT) * w_obs THEN 1 ELSE -1 END)
                  * CAST(abs(CAST(w_exp AS HUGEINT) -
                         CAST(n_pairs AS HUGEINT) * w_obs) * 1000000
                         // w_exp AS BIGINT)
                END AS kappa_w_x1e6
         FROM obs, ex""",
    "q47_threshold_curves" ->
      """WITH grid AS (SELECT i / 20.0 AS threshold FROM generate_series(0, 20) t(i)),
         pts AS (SELECT (1.0 - l_discount) AS s, (l_returnflag = 'R') AS y FROM lineitem),
         counts AS (
           SELECT threshold,
             CAST(sum(CASE WHEN s >= threshold AND y THEN 1 ELSE 0 END) AS BIGINT) AS tp,
             CAST(sum(CASE WHEN s >= threshold AND NOT y THEN 1 ELSE 0 END) AS BIGINT) AS fp,
             CAST(sum(CASE WHEN s < threshold AND NOT y THEN 1 ELSE 0 END) AS BIGINT) AS tn,
             CAST(sum(CASE WHEN s < threshold AND y THEN 1 ELSE 0 END) AS BIGINT) AS fn
           FROM pts CROSS JOIN grid GROUP BY threshold)
         SELECT threshold, tp, fp, tn, fn,
           CAST(tp AS DOUBLE) / CAST(greatest(tp + fp, 1) AS DOUBLE) AS precision,
           CAST(tp AS DOUBLE) / CAST(greatest(tp + fn, 1) AS DOUBLE) AS recall,
           CAST(tn AS DOUBLE) / CAST(greatest(tn + fp, 1) AS DOUBLE) AS tnr,
           CAST(tp AS DOUBLE) / CAST(greatest(tp + fp + tn + fn, 1) AS DOUBLE) AS fullrecall,
           CAST(tp + fp AS DOUBLE) / CAST(greatest(tp + fp + tn + fn, 1) AS DOUBLE) AS predicted_matches_rate
         FROM counts""",
    "q48_negative_rerank" ->
      """WITH labeled AS (
           SELECT o_custkey AS uid, o_orderkey AS gt_uid,
                  (o_orderstatus = 'F') AS correct,
                  (o_custkey % 2 = 0) AS positive_set,
                  CAST(row_number() OVER (PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rank_0
           FROM orders),
         negatives AS (
           SELECT uid, gt_uid, correct, positive_set,
                  CAST(row_number() OVER (PARTITION BY uid ORDER BY rank_0) AS INT) AS rank_0
           FROM labeled WHERE NOT positive_set AND NOT correct),
         positives AS (
           SELECT uid, gt_uid, correct, positive_set, rank_0 FROM labeled WHERE positive_set)
         SELECT uid, gt_uid, correct, positive_set, rank_0 FROM positives
         UNION ALL
         SELECT uid, gt_uid, correct, positive_set, rank_0 FROM negatives""",
    "q49_grouped_split_sizes" ->
      """SELECT CAST(count(*) AS BIGINT) AS total_rows,
                CAST(0 AS BIGINT) AS overlapping_groups
         FROM orders""",
    "q151_kfold" ->
      """SELECT CAST(CAST(concat('0x', substr(md5('kf|' ||
                  CAST(o_custkey AS VARCHAR)), 1, 12)) AS UBIGINT) % 5 AS INT)
                AS fold,
              CAST(count(*) AS BIGINT) AS n_rows,
              CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_groups
         FROM orders GROUP BY 1""",
    "q122_grouped_split3" ->
      """SELECT CAST(count(*) AS BIGINT) AS total_rows,
                CAST(count(DISTINCT o_custkey) AS BIGINT) AS total_groups,
                CAST(0 AS BIGINT) AS overlapping_groups
         FROM orders""",
    "q50_stratified_split" ->
      """SELECT CAST(count(*) AS BIGINT) AS total_rows,
                CAST(0 AS BIGINT) AS overlapping_groups,
                CAST(0 AS BIGINT) AS stratum_violations
         FROM orders""",
    "q101_supervised_invariants" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_test_names,
                true AS auc_ge_095,
                true AS best_match_acc_ge_090,
                true AS scores_in_unit_interval,
                true AS one_best_per_name
         FROM part WHERE p_partkey <= 150 AND p_partkey % 2 = 1""",
    "q157_cv_supervised" ->
      """SELECT CAST(CAST(concat('0x', substr(md5('cv|' ||
                  CAST(p_partkey AS VARCHAR)), 1, 12)) AS UBIGINT) % 3 AS INT)
                AS fold,
              CAST(count(*) AS BIGINT) AS n_test_names,
              true AS auc_ge_095,
              true AS best_match_acc_ge_090
         FROM part WHERE p_partkey <= 150 GROUP BY 1""",
    "q54_training_pairs" ->
      """WITH nm AS (SELECT p_partkey AS uid, p_brand AS entity_id
                     FROM part WHERE p_partkey < 300)
         SELECT CAST((SELECT count(*) FROM nm) AS BIGINT) AS n_names,
                CAST((SELECT floor(0.5 * count(DISTINCT entity_id)) FROM nm) AS BIGINT)
                  AS n_pos_entities,
                CAST(0 AS BIGINT) AS neg_correct_violations,
                CAST(0 AS BIGINT) AS over_window_violations,
                CAST(0 AS BIGINT) AS no_candidate_violations,
                CAST(0 AS BIGINT) AS all_null_rank_violations""")
}
