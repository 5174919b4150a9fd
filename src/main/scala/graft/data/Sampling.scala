package graft.data

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling for training-data pipelines.
  *
  * A 100 TB pipeline cannot use `df.sample()`: its output depends on
  * partition layout and the sampler's per-partition RNG stream, so the
  * kept set changes whenever the file split plan changes, and two runs
  * (or a retried task) disagree. Content-hash Bernoulli sampling fixes
  * that: a row is kept iff a cryptographic hash of (salt, key) falls
  * under the rate threshold — a pure per-row predicate, so it is
  * map-only, pushes through column pruning, survives retries, and any
  * engine (here: DuckDB replaying the same md5 in the oracle) agrees
  * row-for-row. Varying the salt draws an independent sample.
  */
object Sampling {

  /** 4-hex-digit threshold: rows with md5 prefix strictly below it are kept,
    * so the effective rate is floor(rate * 65536) / 65536 — exact, engine-
    * independent, and monotone in `rate` (raising the rate only ADDS rows,
    * which makes downstream caches/reruns incremental).
    */
  def thresholdHex(rate: Double): String = {
    require(rate >= 0 && rate <= 1, s"rate must be in [0,1], got $rate")
    f"${math.floor(rate * 65536).toLong.min(65536)}%05x".takeRight(5) match {
      case s if s.length == 5 && s.head == '0' => s.tail // 0xxxx -> xxxx
      case s => s // '10000' (rate = 1.0) compares above every 4-digit prefix
    }
  }

  /** The keep predicate: md5 of salt + key, first 4 hex chars, string-compared
    * against the rate threshold. Lowercase hex both here and in DuckDB.
    */
  def keepExpr(key: Column, rate: Double, salt: String): Column =
    substring(md5(concat(lit(salt), key.cast("string")).cast("binary")), 1, 4) <
      lit(thresholdHex(rate))

  /** Deterministic Bernoulli sample of `df` at `rate` keyed on `keyCol`. */
  def hashSample(df: DataFrame, keyCol: String, rate: Double,
                 salt: String = "graft"): DataFrame =
    df.filter(keepExpr(col(keyCol), rate, salt))
}
