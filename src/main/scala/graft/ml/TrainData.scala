package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Cols

/** Training-pair preparation: labeling, grouped split, negative-sample
  * re-ranking, synthetic noise.
  *
  * Distributed re-expression of the reference's driver-side pandas utilities
  * (/root/reference/emm/data/prepare_name_pairs.py:85-163,
  * negative_data_creation.py:28-253, base_supervised_model.py:201-266,
  * noiser.py:27-168).
  */
object TrainData {

  /** Label candidate pairs: correct = entity_id == gt_entity_id
    * (prepare_name_pairs.py:96); no_candidate marks null-match rows.
    */
  def label(pairs: DataFrame): DataFrame =
    pairs
      .withColumn("no_candidate", col(Cols.GtUid).isNull)
      // coalesce: a null entity on either side must label FALSE (pandas NaN
      // equality semantics), never a null that filters would silently drop
      .withColumn("correct",
        col(Cols.GtUid).isNotNull &&
          coalesce(col(Cols.EntityId) === col(Cols.gt(Cols.EntityId)), lit(false)))

  /** Deterministic grouped split: every row of a group lands on the same
    * side; assignment by group hash. Seeded and reproducible — no RNG state,
    * so it's identical on any cluster layout.
    */
  def groupedSplit(df: DataFrame, groupCol: String, testFraction: Double = 0.25,
                   seed: Int = 42): (DataFrame, DataFrame) = {
    val bucket = pmod(xxhash64(col(groupCol), lit(seed)), lit(1000L))
    val isTest = bucket < (testFraction * 1000).toLong
    (df.filter(!isTest), df.filter(isTest))
  }

  /** Deterministic THREE-WAY grouped split (train/validation/test) — the
    * standard ML protocol the two-way [[groupedSplit]] composes into: the
    * same seeded 1000-bucket hash of the group key carves [0, val), [val,
    * val+test) and the remainder, so every group lands WHOLLY in exactly
    * one part, the parts are disjoint by construction, and — because the
    * bucket is a pure function of (group, seed) — the TEST set is
    * IDENTICAL to a two-way [[groupedSplit]] at the same fractions/seed
    * offsets, and growing valFraction never moves a group between val and
    * test (stable protocol under re-tuning).
    */
  def groupedSplit3(df: DataFrame, groupCol: String,
                    valFraction: Double = 0.15, testFraction: Double = 0.15,
                    seed: Int = 42): (DataFrame, DataFrame, DataFrame) = {
    require(valFraction >= 0 && testFraction >= 0 &&
      valFraction + testFraction < 1,
      s"need valFraction + testFraction < 1, got $valFraction + $testFraction")
    val bucket = pmod(xxhash64(col(groupCol), lit(seed)), lit(1000L))
    val vCut = (valFraction * 1000).toLong
    val tCut = vCut + (testFraction * 1000).toLong
    (df.filter(bucket >= tCut),
     df.filter(bucket < vCut),
     df.filter(bucket >= vCut && bucket < tCut))
  }

  /** Deterministic grouped K-FOLD assignment (cross-validation protocol):
    * `fold` is a pure function of the group key — the first 48 md5 bits of
    * (salt | key) mod k — so every row of a group lands in the same fold,
    * folds are disjoint and exhaustive BY CONSTRUCTION (no set subtraction,
    * no second pass), the assignment is layout/retry-stable, and — unlike
    * the xxhash64 splits above — any engine can replay the exact fold of
    * every row (DuckDB oracle included: same md5, same mod). Map-only: a
    * withColumn, no shuffle; iterating CV folds is k pushed-down filters
    * over one cached frame, never k scans of a shuffled copy.
    */
  def kFold(df: DataFrame, groupCol: String, k: Int,
            salt: String = "kf"): DataFrame = {
    require(k >= 2, s"k-fold needs k >= 2, got $k")
    df.withColumn("fold",
      pmod(conv(substring(md5(concat(lit(salt + "|"),
          col(groupCol).cast("string")).cast("binary")), 1, 12), 16, 10)
        .cast("long"), lit(k.toLong)).cast("int"))
  }

  /** Deterministic STRATIFIED grouped split, replacing the reference's
    * StratifiedGroupKFold (base_supervised_model.py:201-266, stratified on
    * correct + no_candidate + positive_set): groups keep all their rows on
    * one side, and within each stratum the test fraction is met exactly (not
    * just in expectation — plain hashing skews label ratios on small
    * training sets).
    *
    * Mechanics: each group gets a stratum label (the lexicographic min of its
    * rows' concatenated strata values — deterministic even for mixed groups,
    * where the reference's y is also ambiguous), groups are ordered inside
    * each stratum by seeded hash, and the first `testFraction` quantile goes
    * to test. The quantile runs on the GROUPS table (one row per group), so
    * the per-stratum window sorts |groups|, not |rows|; the row-level side is
    * one hash join against that table.
    */
  def stratifiedGroupedSplit(df: DataFrame, groupCol: String,
                             strataCols: Seq[String],
                             testFraction: Double = 0.25,
                             seed: Int = 42): (DataFrame, DataFrame) = {
    require(strataCols.nonEmpty, "strataCols must be non-empty")
    val strata = concat_ws("|", strataCols.map(c => col(c).cast("string")): _*)
    val groupStrata = df.groupBy(groupCol).agg(min(strata).as("__stratum"))
    val w = Window.partitionBy("__stratum")
      .orderBy(xxhash64(col(groupCol), lit(seed)), col(groupCol))
    val full = Window.partitionBy("__stratum")
    // exactly floor(fraction * |stratum groups|) test groups per stratum
    val assigned = groupStrata
      .withColumn("__is_test",
        row_number().over(w) <= floor(lit(testFraction) * count(lit(1)).over(full)))
      .select(col(groupCol), col("__is_test"))
    val joined = df.join(assigned, Seq(groupCol))
    (joined.filter(!col("__is_test")).drop("__is_test"),
     joined.filter(col("__is_test")).drop("__is_test"))
  }

  /** Split positive/negative name sets by entity id (negative_data_creation
    * semantics): entities hashed into halves; the negative half has its
    * correct pairs removed and candidates re-ranked so the classifier sees
    * realistic negatives.
    *
    * Re-rank (negative_data_creation.py:172-253): per uid and indexer,
    * surviving cossim candidates are re-numbered by their original rank;
    * SNI ranks are shifted toward 0 (all window offsets move one step in);
    * candidates whose new rank exceeds the original window are dropped —
    * all expressed with window functions, no driver hop.
    *
    * `maxRanks` (rank col -> the fitted, UN-widened window) enables the full
    * training-flow narrowing of create_positive_negative_samples
    * (negative_data_creation.py:226-253): candidates beyond the cap get that
    * indexer's rank NULLED rather than the row dropped, POSITIVE rows are
    * capped too (widened +1 candidates removed on both sides), and a matched
    * row survives only while at least one rank column is non-null — the
    * merge_indexers union semantics. In this mode the SNI shift is the
    * reference's CONDITIONAL one (negative_data_creation.py:110-145): no
    * shift when the removed correct pair was an exact match (rank 0), was
    * absent, or left surviving candidates at its own rank; otherwise ranks
    * beyond it move one step toward zero. (Our SNI ranks are unsigned
    * |offset|, so the reference's per-sign shift collapses to one side, and
    * multiple correct ranks resolve by max where the reference's dict build
    * keeps the last.) Empty map = the plain re-rank above.
    */
  def negativeRerank(labeled: DataFrame, cosRankCols: Seq[String],
                     sniRankCols: Seq[String] = Nil,
                     sniWindows: Map[String, Int] = Map.empty,
                     positiveSetCol: String = "positive_set",
                     maxRanks: Map[String, Int] = Map.empty): DataFrame = {
    val byUid = Window.partitionBy(Cols.Uid)
    // the SNI conditional shift needs the removed correct pair's rank, so it
    // is computed on the negative HALF before correct rows are dropped
    val negHalf = labeled.filter(!col(positiveSetCol))
    val withPc =
      if (maxRanks.isEmpty) negHalf
      else sniRankCols.foldLeft(negHalf) { (df, rc) =>
        df.withColumn(s"__pc_$rc",
          max(when(col("correct"), col(rc))).over(byUid))
      }
    val negatives = withPc.filter(!col("correct"))
    val positives = labeled.filter(col(positiveSetCol))

    def capped(c: Column, rc: String): Column = maxRanks.get(rc) match {
      case Some(mx) => when(c > mx, lit(null)).otherwise(c)
      case None     => c
    }
    // cossim: re-number surviving candidate ranks per uid, preserving order
    val reRanked = cosRankCols.foldLeft(negatives) { (df, rc) =>
      val w = Window.partitionBy(Cols.Uid).orderBy(col(rc).asc_nulls_last)
      df.withColumn(rc,
        capped(when(col(rc).isNotNull, row_number().over(w)).otherwise(col(rc)), rc))
    }
    // SNI: legacy form shifts every rank one step toward zero and drops
    // beyond-window rows; maxRanks form applies the reference's conditional
    // shift then nulls ranks beyond the fitted window
    val shifted = sniRankCols.foldLeft(reRanked) { (df, rc) =>
      val w = sniWindows.getOrElse(rc, 3)
      if (maxRanks.isEmpty) {
        val sh = when(col(rc).isNotNull, greatest(col(rc) - 1, lit(0))).otherwise(col(rc))
        df.withColumn(rc, sh).filter(col(rc).isNull || col(rc) <= w)
      } else {
        val pc = col(s"__pc_$rc")
        val survivorAtPc = max(when(col(rc) === pc, lit(1))).over(byUid)
        val doShift = pc.isNotNull && pc =!= 0 && survivorAtPc.isNull
        val sh = when(doShift && col(rc) > pc, col(rc) - 1).otherwise(col(rc))
        df.withColumn(rc, capped(sh, rc)).drop(s"__pc_$rc")
      }
    }
    // positive side: remove the widened window's extra candidates as well
    val posCapped = maxRanks.foldLeft(positives) { case (df, (rc, _)) =>
      if (df.columns.contains(rc)) df.withColumn(rc, capped(col(rc), rc)) else df
    }
    val merged = posCapped.unionByName(shifted)
    if (maxRanks.isEmpty) merged
    else {
      // merge_indexers: a matched pair survives only if some indexer kept it
      val rankCols = (cosRankCols ++ sniRankCols).distinct.filter(merged.columns.contains)
      val anyKept = rankCols.map(col(_).isNotNull).reduceOption(_ || _).getOrElse(lit(true))
      if (merged.columns.contains(Cols.GtUid))
        merged.filter(col(Cols.GtUid).isNull || anyKept)
      else merged.filter(anyKept)
    }
  }

  /** Seeded name noiser for synthetic fixtures (noiser.py:27-168): eight
    * deterministic perturbations selected by a seeded RNG per row.
    */
  def noise(name: String, seed: Long): String = {
    if (name == null || name.isEmpty) return name
    val rng   = new java.util.Random(seed ^ name.hashCode.toLong)
    val words = name.split(" ").toBuffer
    rng.nextInt(8) match {
      case 0 if words.length >= 2 => // swap two words
        val i = rng.nextInt(words.length - 1)
        val t = words(i); words(i) = words(i + 1); words(i + 1) = t
        words.mkString(" ")
      case 1 if words.length >= 2 => // merge two words
        val i = rng.nextInt(words.length - 1)
        (words.take(i) :+ (words(i) + words(i + 1))).concat(words.drop(i + 2)).mkString(" ")
      case 2 if words.length >= 2 => // drop a word
        val i = rng.nextInt(words.length)
        words.patch(i, Nil, 1).mkString(" ")
      case 3 => // abbreviate first word
        (words.head.take(1) +: words.tail).mkString(" ")
      case 4 => // insert a char
        val i = rng.nextInt(name.length)
        name.substring(0, i) + ('a' + rng.nextInt(26)).toChar + name.substring(i)
      case 5 if name.length > 3 => // cut the tail
        name.substring(0, name.length - 1 - rng.nextInt(2))
      case 6 if words.exists(_.length > 3) => // split a word
        val i = words.indexWhere(_.length > 3)
        val w = words(i); val cut = 1 + rng.nextInt(w.length - 2)
        words.patch(i, Seq(w.take(cut), w.drop(cut)), 1).mkString(" ")
      case _ => // change a char
        val i = rng.nextInt(name.length)
        name.substring(0, i) + ('a' + rng.nextInt(26)).toChar + name.substring(i + 1)
    }
  }
}
