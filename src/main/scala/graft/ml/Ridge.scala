package graft.ml

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Exact ridge regression from integer moment partials — the SUPERVISED
  * member of the mergeable-store family (the missing companion to the
  * unigram-LM / Gopher / KN-perplexity quality gates): a replayable
  * linear quality scorer whose fit is EXACT integer arithmetic end to
  * end, so fit-from-store ≡ fit-from-scan bit-for-bit (the
  * [[graft.ann.GramStore]] q325 contract at the supervised tier) and a
  * DuckDB oracle replays the recovered weights to the last digit.
  *
  * The normal equation `(X'X + λI) w = X'y` is linear in the data, so
  * its moments — the d(d+1)/2 Gram cells, the d moment products X'y and
  * the count — are integer sums over the corpus: ONE hash aggregation to
  * a single driver row (map-side partial, no shuffle wider than the
  * global agg), appendable per ingest batch and mergeable by pure
  * addition. The d×d solve happens on the driver (d is small — feature
  * engineering keeps it so; the corpus never moves) by CRAMER'S RULE
  * with fraction-free Bareiss determinants over BigInt: `w_i` is the
  * exact rational `det(A_i)/det(A)`, reported quantized at 10⁻⁶ by
  * division TRUNCATED TOWARD ZERO — the semantics BigInt `/` and DuckDB
  * HUGEINT `//` share, so the quantized weights are engine-exact, not
  * approximately close. λ > 0 makes A positive definite, hence
  * det(A) > 0 — checked loudly, never assumed.
  *
  * Scoring is map-only: `pred_q6 = Σ w_q6[i]·x_i` over the QUANTIZED
  * weights (quantize once, then integer arithmetic — the CUPED q368
  * discipline), DECIMAL-guarded against silent overflow. At 100 TB the
  * whole lifecycle is one scan to fit (or zero, from the store) and
  * scan-speed application.
  *
  * Features must be integral columns (counts, lengths, hashed-bucket
  * sums — the q188 family); the intercept is just a `lit(1L)` feature.
  */
object Ridge {

  /** Exact fit artifact. `gram` is the upper triangle of X'X (no λ),
    * `b` = X'y, both exact; `wQ6` the truncated ×10⁶ weights. */
  final case class Model(d: Int, n: Long, lambda: Long,
                         gram: Map[(Int, Int), BigInt], b: Array[BigInt],
                         detA: BigInt, detAi: Array[BigInt],
                         wQ6: Array[Long]) {
    /** Exact moment lookup (upper triangle, symmetric access). */
    def m(i: Int, j: Int): BigInt =
      if (i <= j) gram((i, j)) else gram((j, i))
  }

  /** One-pass exact integer moments: (upper-triangle X'X, X'y, n).
    * Everything sums in DECIMAL(38,0); a NULL sum (decimal overflow in
    * non-ANSI mode) fails loudly rather than fitting on garbage. */
  def moments(df: DataFrame, features: Seq[Column],
              y: Column): (Map[(Int, Int), BigInt], Array[BigInt], Long) = {
    val d = features.length
    require(d >= 1, "need at least one feature column")
    val fd = features.map(_.cast("decimal(38,0)"))
    val yd = y.cast("decimal(38,0)")
    val cells = for { i <- 0 until d; j <- i until d }
      yield sum(fd(i) * fd(j)).as(s"m_${i}_$j")
    val bs = (0 until d).map(i => sum(fd(i) * yd).as(s"b_$i"))
    val aggs = cells ++ bs :+ count(lit(1)).as("n")
    val row: Row = df.agg(aggs.head, aggs.tail: _*).head()
    def big(name: String): BigInt = {
      val v = row.getAs[java.math.BigDecimal](name)
      require(v != null,
        s"moment $name overflowed DECIMAL(38,0) or aggregated NULL — " +
          "cap or rescale the feature columns")
      BigInt(v.toBigInteger)
    }
    val gram = (for { i <- 0 until d; j <- i until d }
      yield (i, j) -> big(s"m_${i}_$j")).toMap
    val bArr = (0 until d).map(i => big(s"b_$i")).toArray
    (gram, bArr, row.getAs[Long]("n"))
  }

  /** Fraction-free Bareiss determinant — exact over BigInt, O(d³). */
  private[ml] def bareissDet(m0: Array[Array[BigInt]]): BigInt = {
    val n = m0.length
    if (n == 0) return BigInt(1)
    val a = m0.map(_.clone())
    var prev = BigInt(1)
    var sign = 1
    var k = 0
    while (k < n - 1) {
      if (a(k)(k) == 0) {
        val p = (k + 1 until n).find(a(_)(k) != 0).getOrElse(return BigInt(0))
        val t = a(k); a(k) = a(p); a(p) = t; sign = -sign
      }
      var i = k + 1
      while (i < n) {
        var j = k + 1
        while (j < n) {
          a(i)(j) = (a(i)(j) * a(k)(k) - a(i)(k) * a(k)(j)) / prev
          j += 1
        }
        i += 1
      }
      prev = a(k)(k)
      k += 1
    }
    a(n - 1)(n - 1) * sign
  }

  /** Solve from exact moments — the shared tail of fit and refit. */
  def fitFromMoments(gram: Map[(Int, Int), BigInt], b: Array[BigInt],
                     n: Long, lambda: Long): Model = {
    require(lambda > 0, s"ridge needs lambda > 0, got $lambda (lambda=0 " +
      "loses the positive-definiteness that makes the solve total)")
    val d = b.length
    def mm(i: Int, j: Int): BigInt =
      if (i <= j) gram((i, j)) else gram((j, i))
    val A = Array.tabulate(d, d)((i, j) =>
      mm(i, j) + (if (i == j) BigInt(lambda) else BigInt(0)))
    val detA = bareissDet(A)
    require(detA > 0,
      s"det(X'X + ${lambda}I) = $detA must be positive — moment partials " +
        "are inconsistent (merged stores from different feature sets?)")
    val detAi = Array.tabulate(d) { i =>
      val Ai = Array.tabulate(d, d)((r, c) => if (c == i) b(r) else A(r)(c))
      bareissDet(Ai)
    }
    // ×10⁶ quantization, TRUNCATED toward zero: BigInt `/` and DuckDB
    // HUGEINT `//` agree on this (floor would differ on negatives)
    val wQ6 = detAi.map { di =>
      val q = (di * BigInt(1000000)) / detA
      require(q.isValidLong, s"weight $q overflows BIGINT at q6 — rescale")
      q.toLong
    }
    Model(d, n, lambda, gram, b, detA, detAi, wQ6)
  }

  /** One-scan exact fit. */
  def fit(df: DataFrame, features: Seq[Column], y: Column,
          lambda: Long): Model = {
    val (gram, b, n) = moments(df, features, y)
    fitFromMoments(gram, b, n, lambda)
  }

  /** Map-only scoring with the quantized weights: `pred_q6 =
    * Σ wQ6(i)·x_i` — integer, engine-replayable, overflow-guarded. */
  def scoreCol(features: Seq[Column], model: Model): Column = {
    require(features.length == model.d,
      s"model has d=${model.d} features, got ${features.length}")
    val acc = features.zip(model.wQ6)
      .map { case (f, w) => f.cast("decimal(38,0)") * lit(w).cast("decimal(38,0)") }
      .reduce(_ + _)
    when(abs(acc) > lit(Long.MaxValue).cast("decimal(38,0)"),
      raise_error(concat(lit("ridge pred_q6 overflows BIGINT: "), acc)))
      .otherwise(acc.cast("long"))
  }
}

/** Moment partials persisted per ingest batch — the [[graft.ann.GramStore]]
  * layout at the supervised tier: rows `(i, j, v)` are the upper-triangle
  * X'X cells, `j = −1` rows the X'y products, the `(−1,−1)` row the count,
  * partitioned by `batch` and merged by pure integer SUM at refit time. A
  * refit never rescans the corpus; identical moments ⇒ a model
  * bit-identical to [[Ridge.fit]] on the full data.
  */
object RidgeStore {

  /** Append one batch's partials — one pass over the DELTA only. The
    * single aggregated row is driver-sized (d²+d+1 cells) by
    * construction. NULL-y rows are excluded up front so every moment —
    * including the count — sees the same population. */
  def appendBatch(df: DataFrame, features: Seq[Column], y: Column,
                  batchId: Long, path: String,
                  overwrite: Boolean = false): Unit = {
    val spark = df.sparkSession
    val (gram, b, n) = Ridge.moments(df.filter(y.isNotNull), features, y)
    val cells =
      gram.toSeq.map { case ((i, j), v) => (i, j, v.toString) } ++
        b.zipWithIndex.map { case (v, i) => (i, -1, v.toString) } :+
        ((-1, -1, n.toString))
    import spark.implicits._
    cells.toDF("i", "j", "vs")
      .select(col("i"), col("j"),
        col("vs").cast("decimal(38,0)").as("v"),
        lit(batchId).as("batch"))
      .coalesce(1)
      .write.partitionBy("batch")
      .mode(if (overwrite) "overwrite" else "append").parquet(path)
  }

  /** Merge the stored partials (integer SUM) and solve — no corpus
    * rescan. */
  def fit(spark: SparkSession, path: String, lambda: Long): Ridge.Model = {
    val rows = spark.read.parquet(path)
      .groupBy("i", "j")
      .agg(sum(col("v")).as("v"))
      .collect()
    def cell(r: Row): BigInt = {
      val v = r.getAs[java.math.BigDecimal]("v")
      require(v != null, s"merged moment (${r.getInt(0)},${r.getInt(1)}) " +
        "overflowed DECIMAL(38,0)")
      BigInt(v.toBigInteger)
    }
    val gram = rows.filter(r => r.getInt(1) >= 0)
      .map(r => ((r.getInt(0), r.getInt(1)), cell(r))).toMap
    val b = rows.filter(r => r.getInt(1) == -1 && r.getInt(0) >= 0)
      .sortBy(_.getInt(0)).map(cell)
    val n = rows.find(r => r.getInt(0) == -1 && r.getInt(1) == -1)
      .map(r => cell(r).toLong)
      .getOrElse(throw new IllegalStateException(s"no count row in $path"))
    Ridge.fitFromMoments(gram, b, n, lambda)
  }
}
