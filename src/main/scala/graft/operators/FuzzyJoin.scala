package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Edit-distance similarity SELF-join at scale — the fuzzy-matching join a
  * record-linkage or dedup pipeline runs when "same string up to k typos"
  * is the match rule, without materializing the n² pair space.
  *
  * Candidate generation is PREFIX FILTERING over positional-free q-grams
  * (Chaudhuri et al., "A Primitive Operator for Similarity Joins", ICDE
  * 2006; Xiao et al. ppjoin): two strings within edit distance k share at
  * least |G| − (maxlen − q + 1 − k·q) + 1 common grams by the q-gram count
  * bound, so under ANY fixed global gram order each string only needs to
  * expose its first k·q + 1 rarest grams — a constant-size prefix — and
  * every true pair is guaranteed to collide on at least one prefix gram.
  * We order grams by (global document frequency asc, gram) so the prefix
  * grams are the RAREST, keeping the candidate join small; correctness
  * never depends on that choice, only the candidate count does — and the
  * brute-force oracle re-checks completeness row for row.
  *
  * Plan: one gram explode + df agg (vocabulary-sized), per-string rarest-
  * prefix selection via a (id)-partitioned window over ≤ len grams, an
  * equi-join on prefix gram, distinct pairs, then the exact `levenshtein`
  * verify on the candidates only. Nothing n²; the verify cost is the
  * candidate count, which the rare-gram prefix keeps near the true-pair
  * count.
  *
  * Length floor: the count bound is VACUOUS for strings of length
  * < q·(maxDist+1) — such a pair can sit within maxDist while sharing zero
  * q-grams (e.g. "ab" vs "cd" at k = 2), so prefix filtering would silently
  * miss it. The operator enforces the floor with an in-plan raise rather
  * than dropping pairs; callers matching very short strings route them
  * through a direct small-side pass.
  */
object FuzzyJoin {

  /** All unordered pairs (id_a < id_b) with levenshtein(s_a, s_b) ≤
    * maxDist. Output: (id_a, id_b, dist).
    */
  def editDistanceSelfJoin(df: DataFrame, idCol: String, strCol: String,
                           maxDist: Int, q: Int = 2): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    require(q >= 1, s"q must be >= 1, got $q")
    val minLen = q * (maxDist + 1)
    val base = df.select(col(idCol).cast("long").as("__id"),
      when(length(col(strCol)) < minLen,
        raise_error(concat(lit(s"FuzzyJoin: string shorter than q*(k+1)=" +
          s"$minLen breaks the q-gram count bound: "), col(strCol))))
        .otherwise(col(strCol)).as("__s"))
    val grams = base
      .withColumn("__len", length(col("__s")))
      .withColumn("gram", explode(expr(
        s"transform(sequence(1, greatest(__len - $q + 1, 0)), " +
          s"i -> substring(__s, i, $q))")))
      .select(col("__id"), col("gram"))
    val dfreq = grams.groupBy("gram")
      .agg(count(lit(1)).cast("long").as("__df"))
    // rarest-first global order; ties broken by gram text so the order is
    // total and both join sides agree on every prefix
    val prefLen = maxDist * q + 1
    val w = Window.partitionBy("__id").orderBy(col("__df"), col("gram"))
    val prefix = grams.join(dfreq, "gram")
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= prefLen)
      .select(col("__id"), col("gram"))
    val cands = prefix.toDF("id_a", "gram")
      .join(prefix.toDF("id_b", "gram"), "gram")
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    // thresholded levenshtein: Spark's banded O(k·n) kernel returns -1
    // past the threshold instead of paying the full O(n·m) DP per
    // candidate — the verify step is the per-candidate cost at scale
    cands
      .join(base.toDF("id_a", "__sa"), "id_a")
      .join(base.toDF("id_b", "__sb"), "id_b")
      .withColumn("dist",
        levenshtein(col("__sa"), col("__sb"), maxDist))
      .filter(col("dist") >= 0)
      .select(col("id_a"), col("id_b"), col("dist").cast("int").as("dist"))
  }
}
