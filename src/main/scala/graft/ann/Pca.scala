package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Principal component analysis over an embedding column, Spark-shaped:
  *
  *  - **fit** is one distributed pass — [[Gram.gramUpper]]'s exact-integer
  *    d×d second moment (single d²-partial shuffle) plus a d-sized
  *    component-sum aggregate — followed by a driver-side Jacobi
  *    eigendecomposition of the d×d covariance (d² doubles: microseconds,
  *    and the ONLY driver-side math — never row data);
  *  - **project** is map-only: the d×k loading matrix broadcasts as a
  *    literal and each row's k scores are codegen'd higher-order-function
  *    dot products (`transform`/`aggregate`) — no UDF, no shuffle.
  *
  * Determinism: moments are exact integers (components floored to 1e-6
  * units, the Gram contract), the covariance build and Jacobi sweeps run in
  * a fixed order on the driver, eigenpairs sort by (eigenvalue desc, index)
  * and each component's sign is fixed by its largest-|loading| coordinate —
  * the same corpus yields the same model bit-for-bit on every run.
  */
object Pca {

  /** Fitted model. `meanU` and `components` are in the floored 1e-6 integer
    * unit space; `eigenvalues` are covariance eigenvalues in those units².
    */
  final case class Model(d: Int, k: Int, n: Long, meanU: Array[Double],
                         components: Array[Array[Double]],
                         eigenvalues: Array[Double], trace: Double) {
    /** max |WᵀW − I| — orthonormality defect of the loading matrix. */
    def orthonormalDefect: Double = {
      var worst = 0.0
      var a = 0
      while (a < k) {
        var b = 0
        while (b < k) {
          var s = 0.0
          var i = 0
          while (i < d) { s += components(a)(i) * components(b)(i); i += 1 }
          val want = if (a == b) 1.0 else 0.0
          val defect = math.abs(s - want)
          if (defect > worst) worst = defect
          b += 1
        }
        a += 1
      }
      worst
    }
  }

  /** Fit a k-component PCA on `vecCol` (array<float>). */
  def fit(df: DataFrame, vecCol: String, k: Int): Model = {
    val gram = Gram.gramUpper(df, vecCol)
      .collect().map(r => ((r.getInt(0), r.getInt(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    require(gram.nonEmpty, "PCA fit on empty input")
    val n = gram((0, 0))._1
    // exact per-component sums in the same floored 1e-6 units
    val sums = df.select(posexplode(col(vecCol)).as(Seq("i", "x")))
      .groupBy("i")
      .agg(sum(expr("CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)"))
        .cast("decimal(38,0)").cast("double").as("s"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    fitFromMoments(gram.map { case (ij, (_, g)) => ij -> g }, sums, n, k)
  }

  /** Fit from exact second/first moments — the entry point when the
    * moments come MERGED FROM A STORE ([[GramStore]]) instead of a scan:
    * identical moments ⇒ bit-identical model, whichever path built them.
    */
  def fitFromMoments(gram: Map[(Int, Int), Long], sums: Map[Int, Double],
                     n: Long, k: Int): Model = {
    require(gram.nonEmpty, "PCA fit on empty moments")
    val d = gram.keys.map(_._2).max + 1
    require(k >= 1 && k <= d, s"k=$k out of range for d=$d")
    // covariance C_ij = (n·G_ij − S_i·S_j) / n² — exact integers until the
    // one double division, built in fixed (i, j) order
    val c = Array.ofDim[Double](d, d)
    val nD = n.toDouble
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val g = gram((i, j)).toDouble
        val v = (nD * g - sums(i) * sums(j)) / (nD * nD)
        c(i)(j) = v; c(j)(i) = v
        j += 1
      }
      i += 1
    }
    val trace = (0 until d).map(i => c(i)(i)).sum
    val (eigVals, eigVecs) = jacobi(c)
    // top-k by (eigenvalue desc, original index asc); sign fixed by the
    // largest-|loading| coordinate (first such index on exact ties)
    val order = (0 until d).sortBy(j => (-eigVals(j), j)).take(k)
    val comps = order.map { j =>
      val v = Array.tabulate(d)(i => eigVecs(i)(j))
      val pivot = v.indices.maxBy(i => (math.abs(v(i)), -i))
      if (v(pivot) < 0) v.map(x => -x) else v
    }.toArray
    Model(d, k, n, Array.tabulate(d)(i => sums(i) / nD), comps,
      order.map(eigVals).toArray, trace)
  }

  /** Append `outCol` = array<double> of the k component scores. Map-only:
    * the loadings ride along as literals into codegen'd HOF dot products.
    */
  def project(df: DataFrame, vecCol: String, model: Model,
              outCol: String): DataFrame = {
    val centered = transform(col(vecCol),
      (x, i) => floor(x.cast("double") * lit(1e6)) -
        element_at(typedLit(model.meanU.toSeq), (i + 1).cast("int")))
    def score(w: Array[Double]): Column =
      aggregate(
        zip_with(centered, typedLit(w.toSeq), (a, b) => a * b),
        lit(0.0), (acc, x) => acc + x)
    df.withColumn(outCol, array(model.components.map(score).toIndexedSeq: _*))
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix (fixed sweep
    * order, deterministic): returns (eigenvalues, eigenvector columns).
    */
  def jacobi(a0: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    val eps = 1e-14
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < 100 && off > eps) {
      off = 0.0
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > eps * 1e-3) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            // smaller-angle root of t² + 2θt − 1 = 0
            val t =
              if (theta >= 0) 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              else -1.0 / (-theta + math.sqrt(theta * theta + 1.0))
            val cos = 1.0 / math.sqrt(t * t + 1.0)
            val sin = t * cos
            var i = 0
            while (i < d) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = cos * aip - sin * aiq
              a(i)(q) = sin * aip + cos * aiq
              i += 1
            }
            i = 0
            while (i < d) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = cos * api - sin * aqi
              a(q)(i) = sin * api + cos * aqi
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = cos * vip - sin * viq
              v(i)(q) = sin * vip + cos * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      var x = 0
      while (x < d - 1) {
        var y = x + 1
        while (y < d) { off = math.max(off, math.abs(a(x)(y))); y += 1 }
        x += 1
      }
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }
}
