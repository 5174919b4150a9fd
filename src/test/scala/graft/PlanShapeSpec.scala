package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ReusedExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions._

import graft.ann.Knn
import graft.data.Dedup

/** Plan-shape regression tests: the properties that make the operators scale
  * (shuffle counts, exchange reuse, no window sorts in aggregation paths)
  * asserted on the STATIC physical plan (AQE off for the assertion only —
  * the adaptive plan hides its exchanges until execution, and static
  * planning is also where ReuseExchange is decidable at plan time).
  */
class PlanShapeSpec extends SparkSpec {
  import spark.implicits._

  private def staticPlan(f: => DataFrame): SparkPlan = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try f.queryExecution.executedPlan
    finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }
  private def count(p: SparkPlan)(pf: PartialFunction[SparkPlan, Unit]): Int =
    p.collect { case n if pf.isDefinedAt(n) => 1 }.sum

  private lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy cat"),
    (2L, "completely different content about spark engines")
  ).toDF("doc_id", "text")

  test("jaccard dedup: two shuffles, no window, map side evaluated once") {
    // parquet source: a local Seq would let ConvertToLocalRelation fold the
    // shingle kernel into the scan and hide the Generate under test
    val pdocs = spark.read.parquet(s"$sf/documents.parquet")
    val plan = staticPlan(
      Dedup.ngramJaccardPairs(pdocs, "text", "doc_id", k = 3, threshold = 0.3))
    assert(count(plan) { case _: ShuffleExchangeExec => } == 2,
      s"expected posting + pair-agg shuffles only:\n$plan")
    assert(count(plan) { case _: WindowExec => } == 0)
    // exactly ONE Generate explodes the array<long> shingle set — the single
    // posting-side map pass (the old self-join form had one per join side);
    // the later pair Generates explode array<struct> postings
    import org.apache.spark.sql.execution.GenerateExec
    import org.apache.spark.sql.types.{ArrayType, LongType}
    val shingleExplodes = count(plan) {
      case g: GenerateExec
        if g.generator.children.exists(_.dataType == ArrayType(LongType, false)) => }
    assert(shingleExplodes == 1, s"shingle explode must appear once:\n$plan")
    // and no filter re-evaluates the kernel (explode_outer prevents the
    // inferred size(shingle_hashes(text)) > 0 predicate)
    assert(count(plan) {
      case f: org.apache.spark.sql.execution.FilterExec
        if f.condition.toString.contains("shingle_hashes") => } == 0,
      s"no filter may re-run the shingle kernel:\n$plan")
  }

  test("minhash banding: self-join shares one exchange under static planning") {
    val plan = staticPlan(
      Dedup.minHashLshPairs(docs, "text", "doc_id", k = 3,
        numHashes = 8, rowsPerBand = 2, verify = false))
    assert(count(plan) { case _: ReusedExchangeExec => } >= 1,
      s"band self-join must reuse its exchange with AQE off:\n$plan")
  }

  test("account aggregation: two hash aggs, no window sort") {
    val scored = Seq((1L, 10L, 2.0, 0.9, "n"))
      .toDF("account", "gt_uid", Cols.Freq, Cols.NmScore, Cols.Preprocessed)
    val plan = staticPlan(
      graft.agg.EntityAggregation.aggregate(scored, "max_frequency_nm_score",
        accountCol = "account"))
    assert(count(plan) { case _: WindowExec => } == 0,
      s"argmax must be a max_by aggregation, not a window:\n$plan")
    assert(count(plan) { case _: ShuffleExchangeExec => } == 2)
  }

  test("brute-force knn: map-only (no shuffle), one broadcast-free scan side") {
    val emb = Seq((0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val plan = staticPlan(Knn.bruteForceTopK(emb, emb, k = 1))
    assert(count(plan) { case _: ShuffleExchangeExec => } == 0,
      s"packed-broadcast kernel must not shuffle the query side:\n$plan")
  }

  test("decontamination: eval side broadcast, train side never shuffled pre-join") {
    val plan = staticPlan(
      Dedup.decontaminate(docs, docs.filter(col("doc_id") === 0L),
        "text", "doc_id", k = 3))
    assert(count(plan) { case _: BroadcastExchangeExec => } >= 1,
      s"eval shingles must broadcast:\n$plan")
  }

  test("sessionize: both windows AND the session agg share ONE exchange + sort") {
    // the q84 shape: lag -> flag -> running sum -> per-session agg. Both
    // windows order identically, and partitioning on user_id already
    // clusters (user_id, session_idx), so the whole query pays exactly one
    // shuffle and one sort
    import org.apache.spark.sql.execution.SortExec
    val plan = staticPlan(
      graft.queries.CoreQueries.queries("q84_sessionize")(spark, sf))
    assert(count(plan) { case _: ShuffleExchangeExec => } == 1,
      s"sessionize must shuffle once (windows + agg co-partitioned):\n$plan")
    assert(count(plan) { case _: SortExec => } == 1,
      s"sessionize must sort once (shared window ordering):\n$plan")
  }

  test("as-of join: one shuffle, no join operator, one sort") {
    // union + keyed window, never a range join: cost scales with per-key
    // volume, not pair cardinality
    import org.apache.spark.sql.execution.SortExec
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select(col("event_id"), col("event_type"), col("ts").as("ts_us"),
              col("value"))
    val right = ev.select(col("event_type"), col("ts_us"),
      col("value").as("big_value"))
    val plan = staticPlan(
      graft.operators.AsofJoin.backward(ev, right, Seq("event_type"),
        "ts_us", "ts_us", Seq("big_value")))
    assert(count(plan) { case _: ShuffleExchangeExec => } == 1,
      s"as-of must be one keyed shuffle:\n$plan")
    assert(count(plan) { case _: SortExec => } == 1,
      s"as-of must sort once inside the window:\n$plan")
    assert(count(plan) { case n if n.nodeName.contains("Join") => } == 0,
      s"as-of must not plan any join (range joins explode on hot keys):\n$plan")
  }

  test("rolling window: one exchange, one sort (q84's plan budget)") {
    import org.apache.spark.sql.execution.SortExec
    val plan = staticPlan(
      graft.queries.CoreQueries.queries("q92_rolling_window")(spark, sf))
    assert(count(plan) { case _: ShuffleExchangeExec => } == 1,
      s"rolling RANGE window must shuffle once:\n$plan")
    assert(count(plan) { case _: SortExec => } == 1,
      s"rolling RANGE window must sort once:\n$plan")
  }

  test("rollup report: one Expand + hash aggs, no window, no union") {
    import org.apache.spark.sql.execution.{ExpandExec, UnionExec}
    val plan = staticPlan(
      graft.queries.CoreQueries.queries("q93_rollup_stats")(spark, sf))
    assert(count(plan) { case _: ExpandExec => } == 1,
      s"rollup must be a single Expand pass:\n$plan")
    assert(count(plan) { case _: UnionExec => } == 0,
      s"rollup must not plan an N-pass union:\n$plan")
    assert(count(plan) { case _: WindowExec => } == 0)
    assert(count(plan) { case _: ShuffleExchangeExec => } == 1,
      s"one partial-aggregated shuffle:\n$plan")
  }

  test("scd2 intervals: lag-collapse + lead share ONE exchange and ONE sort") {
    // the q137 shape: filter preserves partitioning AND ordering, so the
    // post-collapse lead window re-plans onto the lag window's exchange+sort
    import org.apache.spark.sql.execution.SortExec
    val plan = staticPlan(
      graft.queries.CoreQueries.queries("q137_scd2_intervals")(spark, sf))
    assert(count(plan) { case _: ShuffleExchangeExec => } == 1,
      s"scd2 must shuffle once:\n$plan")
    assert(count(plan) { case _: SortExec => } == 1,
      s"scd2 must sort once (shared window ordering):\n$plan")
  }

  test("event sequences: rn/cnt windows and the collect agg share one exchange") {
    // the q141 shape: row_number cap, per-user count, and the groupBy all
    // cluster on user_id — one shuffle for the whole query
    val plan = staticPlan(
      graft.queries.CoreQueries.queries("q141_event_sequences")(spark, sf))
    assert(count(plan) { case _: ShuffleExchangeExec => } == 1,
      s"sequence builder must shuffle once:\n$plan")
  }

  test("bucketed tables join with ZERO exchanges") {
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_test_bucketjoin"
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select(col("event_id"), col("user_id"), col("value"))
    val dim = ev.groupBy("user_id")
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("n"))
    graft.sources.Sources.writeBucketedTable(ev, "graft_test_bj_ev",
      "user_id", 4, s"$base/ev")
    graft.sources.Sources.writeBucketedTable(dim, "graft_test_bj_dim",
      "user_id", 4, s"$base/dim")
    // disable broadcast: a BroadcastHashJoin would avoid the shuffle for the
    // wrong reason — the claim under test is the co-located SORT-MERGE join
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = staticPlan(
        spark.table("graft_test_bj_ev")
          .join(spark.table("graft_test_bj_dim"), "user_id"))
      assert(count(plan) {
        case _: org.apache.spark.sql.execution.joins.SortMergeJoinExec => } == 1,
        s"must plan a sort-merge join with broadcast off:\n$plan")
      assert(count(plan) { case _: ShuffleExchangeExec => } == 0,
        s"both sides share the bucket layout — the join must not shuffle:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
  }

  test("percentile band filter: bounds broadcast back, no window over the data") {
    val pdocs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "lang", "n_chars")
    val plan = staticPlan(
      graft.data.Sampling.percentileBandFilter(pdocs, "n_chars", "lang", 0.1, 0.9))
    assert(count(plan) { case _: WindowExec => } == 0,
      s"the cut must not window the data:\n$plan")
    assert(count(plan) { case _: BroadcastExchangeExec => } == 1,
      s"the stratum bounds must broadcast back:\n$plan")
    // the only shuffle is the bounds aggregation's — the filter side is
    // map-only
    assert(count(plan) { case _: ShuffleExchangeExec => } == 1,
      s"only the bounds agg may shuffle:\n$plan")
  }

  test("salted join: no cartesian, hot set frozen (no aggregate in the final plan)") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select("event_id", "user_id", "value")
    val dim = ev.groupBy("user_id")
      .agg(org.apache.spark.sql.functions.count(lit(1)).cast("long")
        .as("user_events")).localCheckpoint()
    val plan = staticPlan(
      graft.operators.SkewJoin.saltedJoin(ev, dim, "user_id",
        nSalts = 4, hotThreshold = 50L))
    import org.apache.spark.sql.execution.joins.CartesianProductExec
    assert(count(plan) { case _: CartesianProductExec => } == 0,
      s"salting must stay an equi-join:\n$plan")
    // the hot-key pre-scan ran ONCE at operator-construction time
    // (localCheckpoint) — the executed join plan re-aggregates nothing
    import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
    assert(count(plan) {
      case _: HashAggregateExec | _: ObjectHashAggregateExec | _: SortAggregateExec => } == 0,
      s"the frozen hot set must not be recomputed per branch:\n$plan")
  }

  test("bm25 indexed probe: postings scan carries term_bucket PartitionFilters") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_test_planshape_bm25"
    val pdocs = spark.read.parquet(s"$sf/documents.parquet")
    graft.search.Bm25.writeIndex(pdocs, path, nBuckets = 16)
    val qs = pdocs.filter(col("doc_id") < 2)
      .select(col("doc_id").as("query_id"),
        substring(col("text"), 1, 20).as("query_text"))
    val plan = staticPlan(graft.search.Bm25.topKIndexed(qs, path, k = 5))
    val postingScans = plan.collect {
      case f: FileSourceScanExec
        if f.relation.location.rootPaths.exists(_.toString.contains("postings")) => f
    }
    assert(postingScans.nonEmpty, s"no postings scan found:\n$plan")
    postingScans.foreach { f =>
      assert(f.partitionFilters.exists(_.references.exists(_.name == "term_bucket")),
        s"postings scan must statically prune term_bucket partitions:\n$f")
    }
  }

  test("bloom semi join: probe filters the fact side BELOW the join's exchange") {
    val fact = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_extendedprice")
    val dim = spark.read.parquet(s"$sf/orders.parquet")
      .filter(col("o_totalprice") > 450000.0)
      .select(col("o_orderkey").as("l_orderkey"))
    // broadcast off: against a broadcastable dim the bloom probe is
    // redundant — the claim under test is the shuffle-volume cut on the
    // shuffled (sort-merge) join every too-big-to-broadcast dim forces
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = staticPlan(graft.operators.BloomJoin.bloomSemiJoin(
        fact, dim, "l_orderkey", expectedItems = 20000L))
      // InferFiltersFromConstraints also copies the probe onto the dim side
      // through the join-key equality — harmless (still map-side); the lock
      // is that every probe runs below the exchanges and one guards the fact
      // scan
      val bloomFilters = plan.collect {
        case f: org.apache.spark.sql.execution.FilterExec
          if f.condition.exists(_.isInstanceOf[graft.operators.BloomMightContain]) => f
      }
      assert(bloomFilters.nonEmpty, s"no bloom probe filter planned:\n$plan")
      bloomFilters.foreach { f =>
        assert(count(f) { case _: ShuffleExchangeExec => } == 0,
          s"the bloom probe must run map-side, below every exchange:\n$plan")
      }
      assert(bloomFilters.exists(_.exists {
          case s: org.apache.spark.sql.execution.FileSourceScanExec =>
            s.relation.location.rootPaths.exists(_.toString.contains("lineitem"))
          case _ => false
        }), s"one probe must guard the fact scan:\n$plan")
      assert(count(plan) {
        case _: org.apache.spark.sql.execution.joins.SortMergeJoinExec => } == 1,
        s"the exact semi join must remain:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
  }

  test("k-core peel round: edges never reshuffle (zero exchanges, two broadcasts)") {
    // the decompose() layout: edges hash-partitioned on s ONCE and frozen —
    // the cache's InMemoryRelation carries the partitioning, so a peel
    // round's two alive-side broadcast joins + degree agg need no
    // ShuffleExchange at all
    val raw = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)).toDF("s", "d")
    val e = raw.unionByName(raw.select(col("d").as("s"), col("s").as("d")))
      .distinct().repartition(col("s")).persist()
    val alive = e.select(col("s").as("node")).distinct().localCheckpoint()
    val plan = staticPlan(
      graft.operators.KCore.peelRound(e, alive, k = 2, broadcastAlive = true))
    assert(count(plan) { case _: ShuffleExchangeExec => } == 0,
      s"a peel round must not reshuffle the frozen edge layout:\n$plan")
    assert(count(plan) { case _: BroadcastExchangeExec => } +
      count(plan) { case _: ReusedExchangeExec => } >= 2,
      s"both alive sides must ship by broadcast:\n$plan")
  }

  test("range-shard assignment is map-only (boundaries are literals, no exchange)") {
    import graft.data.RangeShard
    val df = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_totalprice")
    // boundaries() runs its own agg eagerly; the ASSIGNMENT plan — what runs
    // over the 100 TB scan — must then be a pure projection
    val bounds = RangeShard.boundaries(df, "o_totalprice", 8)
    val plan = staticPlan(RangeShard.assign(df, "o_totalprice", bounds))
    assert(count(plan) { case _: ShuffleExchangeExec => } == 0,
      s"shard assignment must not shuffle:\n$plan")
    assert(count(plan) { case _: BroadcastExchangeExec => } == 0,
      s"literal boundary fold needs no broadcast either:\n$plan")
  }

  test("cms estimate: counters broadcast, one shuffle (the key min-agg)") {
    import graft.data.CmsStore
    val tmp = System.getProperty("java.io.tmpdir")
    val path = s"$tmp/graft_plan_cms"
    graft.operators.FsUtil.deleteRecursively(new java.io.File(path))
    val rows = Seq(("2024-05-01 00:00:00", 1L), ("2024-05-01 01:00:00", 2L))
      .toDF("ts", "k").select(col("ts").cast("timestamp").as("ts"), col("k"))
    CmsStore.appendDaily(rows, "ts", "k", path, overwrite = true)
    val keys = Seq(1L, 2L, 3L).toDF("key")
    val plan = staticPlan(
      CmsStore.estimate(keys, CmsStore.mergedCounters(spark, path)))
    assert(count(plan) { case _: BroadcastExchangeExec => } == 1,
      s"the counter table must ship by broadcast:\n$plan")
    // shuffles: the counter-table merge agg + the final per-key min-agg.
    // the PROBE side (the 100 TB-side scan) must reach the join unshuffled,
    // which the join being a broadcast join already enforces
    assert(count(plan) { case _: ShuffleExchangeExec => } <= 2,
      s"probe path must not add shuffles beyond the two aggs:\n$plan")
  }

  test("gram matrix: one shuffle total (the d2-sized partial merge)") {
    import graft.ann.Gram
    val df = Seq((1L, Seq(1.0f, 2.0f)), (2L, Seq(3.0f, 4.0f)))
      .toDF("vec_id", "embedding")
    val plan = staticPlan(Gram.gramUpper(df, "embedding"))
    assert(count(plan) { case _: ShuffleExchangeExec => } == 1,
      s"only the d²-sized partial merge may shuffle:\n$plan")
    assert(count(plan) { case _: WindowExec => } == 0)
  }

  test("binned KS: one corpus shuffle (the bin agg); window input is bin-sized") {
    import graft.data.RankStats
    val pdocs = spark.read.parquet(s"$sf/events.parquet")
    val plan = staticPlan(RankStats.ksBinned(pdocs, "value",
      col("event_type") === "click", col("event_type") === "error",
      0.0, 25.0, 20))
    // shuffles: the bin hash agg over the corpus, then the ordered pass
    // over <= nBins rows (a single-partition exchange of a kilobyte, plus
    // the statistic's final fold). The point of the binned form is that
    // NOTHING corpus-sized reaches a window: every WindowExec consumes the
    // post-agg bin relation.
    val shuffles = count(plan) { case _: ShuffleExchangeExec => }
    assert(shuffles <= 3, s"bin agg + bin-sized ordered pass only:\n$plan")
    val windows = count(plan) { case _: WindowExec => }
    assert(windows >= 1, s"the cumulative pass is a window:\n$plan")
    // corpus-side work is ONE aggregate pair (partial + final on bin)
    import org.apache.spark.sql.execution.aggregate.HashAggregateExec
    assert(count(plan) { case _: HashAggregateExec => } >= 2, s"$plan")
  }

  test("fuzzy join: no cartesian anywhere; verify runs the BANDED kernel") {
    import org.apache.spark.sql.execution.joins.CartesianProductExec
    val pdocs = spark.read.parquet(s"$sf/part.parquet")
      .select(col("p_partkey").as("id"), col("p_name"))
    val plan = staticPlan(graft.operators.FuzzyJoin
      .editDistanceSelfJoin(pdocs, "id", "p_name", maxDist = 2))
    assert(count(plan) { case _: CartesianProductExec => } == 0,
      s"candidate generation must stay an equi-join on prefix grams:\n$plan")
    // the exact verify must be the thresholded (banded O(k·n)) kernel,
    // not the full-DP levenshtein
    val banded = plan.toString.contains("levenshtein")
    assert(banded, s"verify step missing:\n$plan")
    assert(plan.toString.contains("Some(2)"),
      s"verify must carry the threshold argument:\n$plan")
  }

  test("containment pairs: same two-shuffle kernel as jaccard, no window") {
    val pdocs = spark.read.parquet(s"$sf/documents.parquet")
    val plan = staticPlan(Dedup.ngramContainmentPairs(
      pdocs, "text", "doc_id", k = 3, threshold = 0.5))
    assert(count(plan) { case _: ShuffleExchangeExec => } == 2,
      s"posting + pair-agg shuffles only:\n$plan")
    assert(count(plan) { case _: WindowExec => } == 0)
  }

  test("kendall grid: both prefix windows PARTITIONED (no global window)") {
    // the q248 shape — on the Dx×Dy grid, M partitions by y, G_lt/G_gt by
    // x; a global (unpartitioned) window over the grid would serialize the
    // whole domain through one task at 100 TB
    val joint = Seq((1L, 1L, 2L), (1L, 2L, 1L), (2L, 1L, 1L), (3L, 3L, 4L))
      .toDF("x", "y", "c")
    import org.apache.spark.sql.expressions.Window
    val wM = Window.partitionBy("y").orderBy("x")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wLt = Window.partitionBy("x").orderBy("y")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wGt = Window.partitionBy("x").orderBy("y")
      .rowsBetween(1, Window.unboundedFollowing)
    val xDom = joint.select("x").distinct()
    val yDom = joint.select("y").distinct()
    val plan = staticPlan(xDom.crossJoin(yDom)
      .join(joint, Seq("x", "y"), "left")
      .withColumn("c0", coalesce(col("c"), lit(0L)))
      .withColumn("m", coalesce(sum("c0").over(wM), lit(0L)))
      .withColumn("g_lt", coalesce(sum("m").over(wLt), lit(0L)))
      .withColumn("g_gt", coalesce(sum("m").over(wGt), lit(0L)))
      .filter(col("c0") > 0L)
      .agg(sum(col("c0") * col("g_lt")).as("conc"),
        sum(col("c0") * col("g_gt")).as("disc")))
    val windows = plan.collect { case w: WindowExec => w }
    assert(windows.nonEmpty)
    windows.foreach { w =>
      assert(w.partitionSpec.nonEmpty,
        s"every grid window must be partitioned:\n$plan")
    }
  }

  test("prefix-filtered jaccard: equi-joins only (no cartesian, no nested " +
      "loop), no window") {
    // the q298 kernel — candidates come from the prefix-posting equi-join,
    // verification from two id equi-joins; a nested loop anywhere means the
    // prefix filter degenerated into all-pairs
    val pdocs = spark.read.parquet(s"$sf/documents.parquet")
    val plan = staticPlan(Dedup.ngramJaccardPairsPrefix(
      pdocs, "text", "doc_id", k = 3, threshold = 0.3))
    assert(count(plan) {
      case _: org.apache.spark.sql.execution.joins.CartesianProductExec =>
      case _: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec =>
    } == 0, s"prefix kernel must stay equi-join:\n$plan")
    assert(count(plan) { case _: WindowExec => } == 0)
  }

  test("cms countersFor: ONE scan of the input (explode fan-out, not " +
      "depth passes) and one aggregation shuffle") {
    // appendDaily's union-of-projections shape reads the input `depth`
    // times; the in-flight estimator cannot — the explode keeps it to one
    val pev = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderkey").as("k"))
    val plan = staticPlan(graft.data.CmsStore.countersFor(pev, "k"))
    assert(count(plan) {
      case _: org.apache.spark.sql.execution.FileSourceScanExec =>
    } == 1, s"counters must build from a single scan:\n$plan")
    assert(count(plan) { case _: ShuffleExchangeExec => } == 1,
      s"one hash-agg shuffle only:\n$plan")
  }

  test("fixed-width DSv2 scan: EqualTo lands in PushedFilters, ReadSchema " +
      "pruned to the projection") {
    val dir = java.nio.file.Files.createTempDirectory("graft_t_fwplan_").toFile
    val w = new java.io.PrintWriter(new java.io.File(dir, "part-0.txt"))
    w.println("           1purchase              5000")
    w.close()
    val plan = staticPlan(
      spark.read.format("graft.sources.FixedWidthDataSource")
        .option("widths",
          "user_id:long:12,event_type:string:10,v_micro:long:16")
        .load(dir.getAbsolutePath)
        .filter(col("event_type") === "purchase")
        .select("v_micro"))
    val scans = plan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scans.size == 1, s"one DSv2 scan expected:\n$plan")
    val desc = scans.head.scan.description()
    assert(desc.contains("EqualTo(event_type,purchase)"),
      s"filter must be pushed into the scan: $desc")
    assert(desc.contains("ReadSchema=v_micro"),
      s"projection must prune to the requested slice: $desc")
    graft.operators.FsUtil.deleteRecursively(dir)
  }

  test("crawl-record DSv2 scan: EqualTo(record_type) lands in " +
      "PushedFilters, ReadSchema pruned to a headers-only projection " +
      "(payload never materialized)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_t_crplan_")
    java.nio.file.Files.write(dir.resolve("a.wrec"),
      ("WREC/1.0\r\nRecord-Type: response\r\nTarget-URI: https://t/1\r\n" +
        "Content-Length: 2\r\n\r\nhi\r\n").getBytes("UTF-8"))
    val plan = staticPlan(
      spark.read.format("graft.sources.CrawlRecordDataSource")
        .load(dir.toString)
        .filter(col("record_type") === "response")
        .select("url", "content_length"))
    val scans = plan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scans.size == 1, s"one DSv2 scan expected:\n$plan")
    val desc = scans.head.scan.description()
    assert(desc.contains("EqualTo(record_type,response)"),
      s"filter must be pushed into the scan: $desc")
    assert(desc.contains("ReadSchema=url,content_length"),
      s"projection must prune to the header-only slice: $desc")
    assert(!desc.contains("payload"),
      s"payload must not survive pruning: $desc")
    graft.operators.FsUtil.deleteRecursively(dir.toFile)
  }

  test("link extraction (q472 kernel): extract + resolve + canonicalize " +
      "is a zero-exchange map-only projection — scan-speed at 100 TB") {
    val pages = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"),
        concat(lit("https://e/sub/"), col("doc_id").cast("string"),
          lit(".html")).as("page_url"),
        concat(lit("<a href=\"../x/"), col("doc_id").cast("string"),
          lit("\">l</a>")).as("html"))
    val plan = staticPlan(pages
      .select(col("page_url"),
        explode(graft.functions.Links.hrefs(col("html"))).as("href"))
      .select(graft.functions.Urls.canonicalize(
        graft.functions.Links.resolve(col("page_url"), col("href")))
        .as("outlink"))
      .filter(col("outlink").isNotNull))
    assert(count(plan) { case _: ShuffleExchangeExec => } == 0,
      s"discovery must be map-only:\n$plan")
    assert(count(plan) { case _: WindowExec => } == 0)
  }

  test("robots parse (q474 kernel): every window host-partitioned — " +
      "robots-sized work, nothing global") {
    val robots = Seq(("h1", "User-agent: *\nDisallow: /x\n"))
      .toDF("host", "txt")
    val plan = staticPlan(
      graft.functions.Robots.parseRules(robots, "host", "txt"))
    val windows = plan.collect { case w: WindowExec => w }
    assert(windows.nonEmpty)
    windows.foreach { w =>
      assert(w.partitionSpec.nonEmpty,
        s"robots parse windows must be host-partitioned:\n$plan")
    }
  }

  test("grouped PAV: every window partitioned by the segment (no global " +
      "sort at any stage)") {
    val bins = Seq(("s1", 1L, 10L, 5L), ("s1", 2L, 10L, 2L),
      ("s2", 1L, 4L, 1L)).toDF("seg", "b", "n", "n_pos")
    val plan = staticPlan(
      graft.data.Calibration.pavFitGrouped(bins, Seq("seg")))
    val windows = plan.collect { case w: WindowExec => w }
    assert(windows.nonEmpty)
    windows.foreach { w =>
      assert(w.partitionSpec.nonEmpty,
        s"grouped PAV window must be segment-partitioned:\n$plan")
    }
  }

  test("kaplan-meier: every ordered pass partitioned by cohort (no global " +
      "window over the time domain)") {
    val obs = Seq((0L, 5L, 1), (0L, 6L, 0), (1L, 5L, 1))
      .toDF("cohort", "dur", "ev")
    val plan = staticPlan(
      graft.data.Survival.kaplanMeier(obs, Seq("cohort"), "dur", "ev"))
    val windows = plan.collect { case w: WindowExec => w }
    assert(windows.nonEmpty)
    windows.foreach { w =>
      assert(w.partitionSpec.nonEmpty,
        s"KM window must be cohort-partitioned:\n$plan")
    }
  }

  test("pca project: map-only (zero exchanges — loadings are literals)") {
    val pts = Seq(Array(1.0f, 2.0f), Array(3.0f, 1.0f), Array(2.0f, 2.0f))
      .toDF("vec")
    val m = graft.ann.Pca.fit(pts, "vec", 1)
    val plan = staticPlan(graft.ann.Pca.project(pts, "vec", m, "p"))
    val exchanges = count(plan) { case _: ShuffleExchangeExec => () }
    assert(exchanges === 0, s"project must not shuffle:\n$plan")
  }

  test("survivorship: mode pick is key-partitioned rank, never global") {
    import graft.data.Survivorship._
    val recs = Seq((1L, "a", 1L, 2L, 3L), (1L, "b", 2L, 3L, 4L))
      .toDF("k", "cat", "ts", "id", "v")
    val plan = staticPlan(goldenRecord(recs, Seq("k"),
      Seq(Mode("cat"), Latest("v", Seq("ts", "id")), Max("ts"))))
    val windows = plan.collect { case w: WindowExec => w }
    assert(windows.nonEmpty)
    windows.foreach { w =>
      assert(w.partitionSpec.nonEmpty,
        s"mode window must be entity-partitioned:\n$plan")
    }
  }

  test("grouped chi-square: every margin window partitioned (no global " +
      "window over the cell frame)") {
    val cells = Seq(("w1", "cur", "p", 3L), ("w1", "rest", "p", 5L))
      .toDF("g", "a", "b", "o")
    val plan = staticPlan(graft.data.Contingency
      .chiSquareFromCellsGrouped(cells, Seq("g")))
    val windows = plan.collect { case w: WindowExec => w }
    assert(windows.nonEmpty)
    windows.foreach { w =>
      assert(w.partitionSpec.nonEmpty,
        s"margin windows must partition by the group:\n$plan")
    }
  }

  test("phonetic block (q336): kept-key stop list joins broadcast, no " +
      "cartesian, no window") {
    import org.apache.spark.sql.execution.joins.CartesianProductExec
    val plan = staticPlan(
      graft.queries.MatchQueries.queries("q336_phonetic_block")(spark, sf))
    assert(count(plan) { case _: BroadcastExchangeExec => } >= 1,
      s"kept-key list must broadcast:\n$plan")
    assert(count(plan) { case _: CartesianProductExec => } === 0)
    assert(count(plan) { case _: WindowExec => } === 0)
  }

  test("FastSS edit join (q337): candidate generation is an equi-join on " +
      "the variant key — no cartesian or nested-loop pair space") {
    import org.apache.spark.sql.execution.joins.{
      BroadcastNestedLoopJoinExec, CartesianProductExec}
    val plan = staticPlan(
      graft.queries.MatchQueries.queries("q337_fastss_edit_join")(spark, sf))
    assert(count(plan) { case _: CartesianProductExec => } === 0,
      s"FastSS must never materialize the quadratic pair space:\n$plan")
    assert(count(plan) { case _: BroadcastNestedLoopJoinExec => } === 0,
      s"candidates must come from the variant equi-join:\n$plan")
  }

  test("mutual best (q338): two argmax aggs, zero windows (no per-key " +
      "row_number pass), no cartesian") {
    import org.apache.spark.sql.execution.joins.CartesianProductExec
    val plan = staticPlan(
      graft.queries.MatchQueries.queries("q338_mutual_best")(spark, sf))
    assert(count(plan) { case _: WindowExec => } === 0,
      s"argmax must be min(struct(..)) aggs, not windows:\n$plan")
    assert(count(plan) { case _: CartesianProductExec => } === 0)
  }

  test("epoch mix (q334): map-only — zero exchanges, zero windows; the " +
      "emitted multiset must survive any repartitioning unchanged") {
    val plan = staticPlan(
      graft.queries.CorpusQueries.queries("q334_epoch_mix")(spark, sf))
    assert(count(plan) { case _: ShuffleExchangeExec => } === 0,
      s"epoch mix must not shuffle:\n$plan")
    assert(count(plan) { case _: WindowExec => } === 0)
  }

  test("markov transitions (q333): one user-partitioned window (never " +
      "global), per-prev totals joined broadcast") {
    val plan = staticPlan(
      graft.queries.CoreQueries.queries("q333_markov_transitions")(spark, sf))
    val wins = plan.collect { case w: WindowExec => w }
    assert(wins.length === 1, s"exactly one window pass:\n$plan")
    assert(wins.head.partitionSpec.nonEmpty,
      s"window must partition by user_id:\n$plan")
    assert(count(plan) { case _: BroadcastExchangeExec => } >= 1,
      s"per-prev totals must broadcast:\n$plan")
  }

  test("cohort retention (q332): cohort sizes joined broadcast, no window " +
      "operator anywhere") {
    val plan = staticPlan(
      graft.queries.CoreQueries.queries("q332_cohort_retention")(spark, sf))
    assert(count(plan) { case _: BroadcastExchangeExec => } >= 1,
      s"cohort sizes must broadcast:\n$plan")
    assert(count(plan) { case _: WindowExec => } === 0)
  }

  test("hill tail (q329): top-(k+1) via TakeOrderedAndProject, zero " +
      "window operators (no 1-partition global rank over the vocab)") {
    import org.apache.spark.sql.execution.TakeOrderedAndProjectExec
    val plan = staticPlan(
      graft.queries.CoreQueries.queries("q329_hill_tail")(spark, sf))
    assert(count(plan) { case _: TakeOrderedAndProjectExec => } >= 1,
      s"vocab top-k must plan as TakeOrdered:\n$plan")
    assert(count(plan) { case _: WindowExec => } === 0,
      s"no window operator anywhere in the hill-tail plan:\n$plan")
  }

  test("fleiss kappa (q339): pure agg cascade — zero window operators") {
    val plan = staticPlan(
      graft.queries.MlQueries.queries("q339_fleiss_kappa")(spark, sf))
    assert(count(plan) { case _: WindowExec => } === 0,
      s"fleiss kappa must be aggs only, never a window:\n$plan")
  }

  test("CMH (q340): strata collapse then scalar agg — zero windows, no " +
      "cartesian") {
    import org.apache.spark.sql.execution.joins.CartesianProductExec
    val plan = staticPlan(
      graft.queries.CoreQueries.queries("q340_cmh_stratified")(spark, sf))
    assert(count(plan) { case _: WindowExec => } === 0,
      s"CMH margins come from the stratum agg, never a window:\n$plan")
    assert(count(plan) { case _: CartesianProductExec => } === 0)
  }

  test("cochran q (q343): per-subject collapse + ONE global agg — zero " +
      "windows") {
    val plan = staticPlan(
      graft.queries.CoreQueries.queries("q343_cochran_q")(spark, sf))
    assert(count(plan) { case _: WindowExec => } === 0,
      s"cochran Q is a single-agg statistic:\n$plan")
  }

  test("chao1 coverage (q342): two shrinking hash aggs, zero windows") {
    val plan = staticPlan(
      graft.queries.TextQueries.queries("q342_chao1_coverage")(spark, sf))
    assert(count(plan) { case _: WindowExec => } === 0,
      s"chao1 rides q99's agg-cascade shape, never a window:\n$plan")
  }

  test("source concentration (q341): the Lorenz rank is GlobalRank " +
      "(distributed zipWithIndex) — zero window operators in the plan") {
    val plan = staticPlan(
      graft.queries.CorpusQueries
        .queries("q341_source_concentration")(spark, sf))
    assert(count(plan) { case _: WindowExec => } === 0,
      s"no 1-partition row_number in the concentration plan:\n$plan")
  }

  test("kruskal-wallis (q347): both global windows (rank, total) ride the " +
      "COLLAPSED cell frame (an aggregate below each), never the raw scan") {
    val plan = staticPlan(
      graft.queries.RankQueries.queries("q347_kruskal_wallis")(spark, sf))
    val windows = plan.collect { case w: WindowExec => w }
    assert(windows.size === 2,
      s"rank + total passes over the value domain only:\n$plan")
    import org.apache.spark.sql.execution.aggregate.HashAggregateExec
    assert(windows.forall(
      _.collect { case a: HashAggregateExec => a }.nonEmpty),
      s"every window must consume the (g, v, c) cell aggregate, not raw " +
        s"lineitems:\n$plan")
  }

  test("friedman (q348): rank windows PARTITIONED by block; the only " +
      "global window rides the k-treatment aggregate frame") {
    val plan = staticPlan(graft.queries.RankQueries
      .queries("q348_friedman_kendall_w")(spark, sf))
    val windows = plan.collect { case w: WindowExec => w }
    assert(windows.nonEmpty)
    import org.apache.spark.sql.execution.aggregate.HashAggregateExec
    // the rank/tie/size windows are block-partitioned; the single global
    // window sits ABOVE the k-treatment aggregate (a ≤|treatments| frame —
    // the logRank/ksFromCounts collapsed-frame exception)
    assert(windows.forall(w => w.partitionSpec.nonEmpty ||
      w.collect { case a: HashAggregateExec => a }.nonEmpty),
      s"a block-partitioned design must never serialize raw blocks " +
        s"through one task:\n$plan")
    assert(windows.exists(_.partitionSpec.nonEmpty),
      s"the rank pass must be partitioned by block:\n$plan")
  }

  test("runs test (q350): ONE shuffle total — the groupBy reuses the " +
      "window's user partitioning — and one user-partitioned window") {
    val plan = staticPlan(
      graft.queries.RankQueries.queries("q350_runs_test")(spark, sf))
    assert(count(plan) { case _: ShuffleExchangeExec => } === 1,
      s"lag window and per-user agg share the user_id exchange:\n$plan")
    val windows = plan.collect { case w: WindowExec => w }
    assert(windows.size === 1 && windows.forall(_.partitionSpec.nonEmpty))
  }

  test("acf lag-7 (q352): two shuffles (day-cell agg, series window) — " +
      "the per-series agg reuses the window's partitioning") {
    val plan = staticPlan(
      graft.queries.RankQueries.queries("q352_acf_lag7")(spark, sf))
    assert(count(plan) { case _: ShuffleExchangeExec => } === 2,
      s"cells + series exchange only:\n$plan")
    val windows = plan.collect { case w: WindowExec => w }
    assert(windows.size === 1 && windows.forall(_.partitionSpec.nonEmpty),
      s"the lead() pass is partitioned by series key:\n$plan")
  }

  test("dispersion index (q351): pure agg cascade — zero windows") {
    val plan = staticPlan(graft.queries.RankQueries
      .queries("q351_dispersion_index")(spark, sf))
    assert(count(plan) { case _: WindowExec => } === 0,
      s"dispersion is two hash aggs, never a window:\n$plan")
  }

  test("pettitt (q364): every window pass is partitioned by the series " +
      "key — no 1-partition ordered window anywhere") {
    val plan = staticPlan(
      graft.queries.RankQueries.queries("q364_pettitt")(spark, sf))
    val windows = plan.collect { case w: WindowExec => w }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
      s"collapsed-domain V pass and cumulative U pass both partition " +
        s"by series:\n$plan")
  }

  test("trimmed means (q370) and equidepth fit (q373): all windows " +
      "partitioned by the group key; the fit's boundary emit is ONE " +
      "bounded Generate") {
    val p370 = staticPlan(
      graft.queries.RankQueries.queries("q370_trimmed_means")(spark, sf))
    val w370 = p370.collect { case w: WindowExec => w }
    assert(w370.nonEmpty && w370.forall(_.partitionSpec.nonEmpty),
      s"q370 windows ride the per-type collapsed domain:\n$p370")
    val p373 = staticPlan(
      graft.queries.DataQueries.queries("q373_equidepth_fit")(spark, sf))
    val w373 = p373.collect { case w: WindowExec => w }
    assert(w373.nonEmpty && w373.forall(_.partitionSpec.nonEmpty),
      s"q373 windows ride the per-lang collapsed domain:\n$p373")
    import org.apache.spark.sql.execution.GenerateExec
    assert(count(p373) { case _: GenerateExec => } === 1,
      s"exactly one sequence-explode emits the boundary indices:\n$p373")
  }

  test("ljung-box (q372): every per-lag lead() pass is partitioned by " +
      "series; cuped (q368) is windowless with a broadcast total") {
    val p372 = staticPlan(
      graft.queries.RankQueries.queries("q372_ljung_box")(spark, sf))
    val w372 = p372.collect { case w: WindowExec => w }
    assert(w372.size === 7 && w372.forall(_.partitionSpec.nonEmpty),
      s"seven series-partitioned lead passes, nothing global:\n$p372")
    val p368 = staticPlan(
      graft.queries.MlQueries.queries("q368_cuped")(spark, sf))
    assert(count(p368) { case _: WindowExec => } === 0,
      s"cuped is one unit-grain hash agg + one scalar agg:\n$p368")
  }

  test("smoothed rates (q374): windowless — the global totals come " +
      "back as a broadcast, never a user-grain window") {
    val plan = staticPlan(
      graft.queries.MlQueries.queries("q374_smoothed_rates")(spark, sf))
    assert(count(plan) { case _: WindowExec => } === 0,
      s"no window over the user grain:\n$plan")
    assert(count(plan) { case _: BroadcastExchangeExec => } >= 1,
      s"the one-row totals frame must broadcast:\n$plan")
  }

  test("minHashLedger probe: both ledger scans carry partition filters " +
      "(bands pruned to probed buckets, sigs pruned to candidate id " +
      "buckets) — history is read signature-only and never re-signed") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val base = Seq((1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six seven"))
      .toDF("doc_id", "text")
    val delta = Seq((11L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_r14_planlock"
    graft.operators.FsUtil.deleteRecursively(new java.io.File(path))
    graft.data.Dedup.minHashLedger(base, path, k = 3, numHashes = 32,
      rowsPerBand = 4, threshold = 0.3)
    val plan = staticPlan(graft.data.Dedup.minHashLedgerPairs(delta, path,
      k = 3, numHashes = 32, rowsPerBand = 4, threshold = 0.3))
    def scansOf(tag: String) = plan.collect {
      case f: FileSourceScanExec
        if f.relation.location.rootPaths.exists(_.toString.contains(tag)) => f
    }
    val bandScans = scansOf("/bands")
    val sigScans = scansOf("/sigs")
    assert(bandScans.nonEmpty && bandScans.forall(_.partitionFilters.nonEmpty),
      s"bands scan must prune to the delta's buckets:\n$plan")
    assert(sigScans.nonEmpty && sigScans.forall(_.partitionFilters.nonEmpty),
      s"sigs scan must prune to candidate id buckets:\n$plan")
    // the exact-verify side reads stored signatures, never ledger text
    assert(sigScans.forall(_.schema.fieldNames.forall(_ != "text")),
      s"history text must never be read back:\n$plan")
    graft.operators.FsUtil.deleteRecursively(new java.io.File(path))
  }

  test("passage windows (q390): map-only — zero shuffles, zero windows, " +
      "one Generate") {
    val plan = staticPlan(
      graft.queries.TextQueries.queries("q390_passage_windows")(spark, sf))
    assert(count(plan) { case _: ShuffleExchangeExec => } === 0,
      s"the chunker must stay map-only:\n$plan")
    assert(count(plan) { case _: WindowExec => } === 0)
    import org.apache.spark.sql.execution.GenerateExec
    assert(count(plan) { case _: GenerateExec => } === 1,
      s"exactly one posexplode emits the windows:\n$plan")
  }

  test("substring cut (q380): every window partitioned (pair-offset " +
      "islands, doc-grain merges), no CartesianProduct") {
    import org.apache.spark.sql.execution.joins.CartesianProductExec
    val plan = staticPlan(
      graft.queries.TextQueries.queries("q380_substring_cut")(spark, sf))
    assert(count(plan) { case _: CartesianProductExec => } === 0)
    val ws = plan.collect { case w: WindowExec => w }
    assert(ws.nonEmpty && ws.forall(_.partitionSpec.nonEmpty),
      s"island/merge windows must be partitioned:\n$plan")
  }

  test("dbscan (q395): no CartesianProduct — candidate pairs come from " +
      "the broadcast kernel, the closure from the core subgraph") {
    import org.apache.spark.sql.execution.joins.CartesianProductExec
    val plan = staticPlan(
      graft.queries.DataQueries.queries("q395_dbscan")(spark, sf))
    assert(count(plan) { case _: CartesianProductExec => } === 0,
      s"no all-pairs fallback:\n$plan")
  }

  test("modularity (q394): the canonical edge subtree is SHARED — " +
      "lineitem is scanned exactly twice (the co-purchase join sides) " +
      "and everything else rides ReusedExchange") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val plan = staticPlan(
      graft.queries.RankQueries.queries("q394_modularity")(spark, sf))
    val liScans = plan.collect {
      case f: FileSourceScanExec
        if f.relation.location.rootPaths.exists(_.toString.contains("lineitem")) => f
    }
    assert(liScans.size === 2,
      s"edge canonicalization must not be recomputed per consumer:\n$plan")
    assert(count(plan) { case _: ReusedExchangeExec => } >= 3,
      s"the degree/label/global consumers must reuse exchanges:\n$plan")
  }

  test("rank stability (q377): no CartesianProduct anywhere — the " +
      "inversion count is the q248 dominance cascade, its grid windows " +
      "partitioned; only the two k-frame rank windows are global") {
    import org.apache.spark.sql.execution.joins.CartesianProductExec
    val plan = staticPlan(
      graft.queries.RankQueries.queries("q377_rank_stability")(spark, sf))
    assert(count(plan) { case _: CartesianProductExec => } === 0,
      s"the k^2 pair join must not come back:\n$plan")
    val ws = plan.collect { case w: WindowExec => w }
    val global = ws.filter(_.partitionSpec.isEmpty)
    val partitioned = ws.filter(_.partitionSpec.nonEmpty)
    assert(partitioned.size >= 2,
      s"the m / g_gt cascade must ride rb- and ra-partitioned windows:\n$plan")
    assert(global.size <= 2,
      s"only the loudly-bounded k-source rank windows may be global:\n$plan")
  }

  test("kn doc scoring (q402): windowless — the table and both marginals " +
      "reach the pair stream as broadcasts, never a shuffle join on the " +
      "doc-pair grain") {
    val plan = staticPlan(
      graft.queries.TextQueries.queries("q402_kn_doc_logprob")(spark, sf))
    assert(count(plan) { case _: WindowExec => } === 0,
      s"no window anywhere in fit or score:\n$plan")
    assert(count(plan) { case _: BroadcastExchangeExec => } >= 3,
      s"table + lambda + pcont must broadcast against the pair stream:\n$plan")
  }

  test("beyond-broadcast dbscan (q403): no CartesianProduct — the " +
      "variant's pair list rides the IVF list_id shuffle, the closure " +
      "stays on the core subgraph") {
    import org.apache.spark.sql.execution.joins.CartesianProductExec
    // the q403 correctness entry returns a local verdict row (its counts
    // run in-query), so the lock targets the operator plan itself
    val plan = staticPlan(
      graft.ann.Knn.dbscanCosineClustered(
        spark.read.parquet(s"$sf/embeddings.parquet"), minCosine = 0.35,
        minPts = 3, nLists = 16, seed = 7L, maxIter = 5))
    assert(count(plan) { case _: CartesianProductExec => } === 0,
      s"the IVF-pruned pair source may not plan a cartesian:\n$plan")
  }

  test("kn trigram family (q406/q407): windowless end to end — vocab via " +
      "TakeOrdered, scoring marginals broadcast") {
    import org.apache.spark.sql.execution.TakeOrderedAndProjectExec
    val p406 = staticPlan(
      graft.queries.TextQueries.queries("q406_kn_trigram")(spark, sf))
    assert(count(p406) { case _: WindowExec => } === 0,
      s"no window in the trigram fit:\n$p406")
    assert(count(p406) { case _: TakeOrderedAndProjectExec => } >= 1,
      s"the vocab limit must lower to TakeOrdered:\n$p406")
    val p407 = staticPlan(
      graft.queries.TextQueries.queries("q407_kn_trigram_doc_logprob")(
        spark, sf))
    assert(count(p407) { case _: WindowExec => } === 0,
      s"no window in fit or score:\n$p407")
    assert(count(p407) { case _: BroadcastExchangeExec => } >= 5,
      s"table + four marginals must broadcast against the triple stream:\n$p407")
  }

  test("pq disk probe (q421): codes scan carries list_id PartitionFilters") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_test_planshape_pq"
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    graft.ann.Pq.writeIndex(emb, path, m = 4, subDim = 16, k = 8,
      iters = 1, nLists = 4)
    val plan = staticPlan(graft.ann.Pq.probeIndex(
      emb.filter(col("vec_id") < 5), path, nProbe = 2, k = 5))
    val codeScans = plan.collect {
      case f: FileSourceScanExec
        if f.relation.location.rootPaths.exists(_.toString.contains("codes")) => f
    }
    assert(codeScans.nonEmpty, s"no codes scan found:\n$plan")
    codeScans.foreach { f =>
      assert(f.partitionFilters.exists(_.references.exists(_.name == "list_id")),
        s"codes scan must statically prune list_id partitions:\n$f")
    }
  }

  test("hash walks (q424): window-free — every hop is a min(struct) hash " +
      "agg, never a rank window; no cartesian") {
    import org.apache.spark.sql.execution.joins.CartesianProductExec
    val plan = staticPlan(
      graft.queries.RankQueries.queries("q424_hash_walks")(spark, sf))
    assert(count(plan) { case _: WindowExec => } === 0,
      s"argmin must be an aggregation, not a window:\n$plan")
    assert(count(plan) { case _: CartesianProductExec => } === 0)
  }

  test("retrieval second wave (q426/q427/q428/q429): no sort-merge joins, " +
      "every window query-partitioned") {
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    for (name <- Seq("q426_mmr_rerank", "q427_bm25_rm3",
        "q428_query_likelihood", "q429_rocchio_feedback")) {
      val plan = staticPlan(
        graft.queries.DataQueries.queries(name)(spark, sf))
      assert(count(plan) { case _: SortMergeJoinExec => } === 0,
        s"$name: every join side is bounded — broadcast only:\n$plan")
      assert(count(plan) { case w: WindowExec if w.partitionSpec.isEmpty => }
        === 0, s"$name: no global window:\n$plan")
    }
  }

  test("pq adc search (q413): broadcast-only joins — no sort-merge, no " +
      "cartesian; the top-k window is query-partitioned") {
    import org.apache.spark.sql.execution.joins.{CartesianProductExec, SortMergeJoinExec}
    val plan = staticPlan(
      graft.queries.DataQueries.queries("q413_pq_adc")(spark, sf))
    assert(count(plan) { case _: SortMergeJoinExec => } === 0,
      s"the ADC distance table must broadcast against the code stream:\n$plan")
    assert(count(plan) { case _: CartesianProductExec => } === 0,
      s"no cartesian anywhere in the ADC search:\n$plan")
    assert(count(plan) { case w: WindowExec if w.partitionSpec.isEmpty => } === 0,
      s"top-k must be query-partitioned, never a global window:\n$plan")
  }

  test("tombstoned pq probe (q446): the delete anti-join must NOT break " +
      "static list_id partition pruning") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val path =
      s"${System.getProperty("java.io.tmpdir")}/graft_test_planshape_pqdel"
    graft.operators.FsUtil.deleteRecursively(new java.io.File(path))
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    graft.ann.Pq.writeIndex(emb, path, m = 4, subDim = 16, k = 8,
      iters = 1, nLists = 4)
    graft.ann.Pq.deleteFromIndex(emb.filter(col("vec_id") % 2 === 1), path)
    val plan = staticPlan(graft.ann.Pq.probeIndex(
      emb.filter(col("vec_id") < 5), path, nProbe = 2, k = 5))
    val codeScans = plan.collect {
      case f: FileSourceScanExec
        if f.relation.location.rootPaths
          .exists(_.toString.contains("codes")) => f
    }
    assert(codeScans.nonEmpty, s"no codes scan found:\n$plan")
    codeScans.foreach { f =>
      assert(f.partitionFilters
        .exists(_.references.exists(_.name == "list_id")),
        s"pruning must survive the tombstone anti-join:\n$f")
    }
    assert(count(plan) { case j: BroadcastHashJoinExec
      if j.joinType.toString == "LeftAnti" => } >= 1,
      s"tombstones must apply as a broadcast anti-join:\n$plan")
    graft.operators.FsUtil.deleteRecursively(new java.io.File(path))
  }

  test("winnowing overlap (q437): posting self-join is an equi-join — " +
      "no cartesian, no nested loop, no global window") {
    import org.apache.spark.sql.execution.joins.{
      BroadcastNestedLoopJoinExec, CartesianProductExec}
    val pdocs = spark.read.parquet(s"$sf/documents.parquet")
    val plan = staticPlan(graft.functions.Winnowing.overlapPairs(
      pdocs, "doc_id", "text", k = 3, w = 4, maxDf = 10, minShared = 2))
    assert(count(plan) { case _: CartesianProductExec => } === 0,
      s"no cartesian in the overlap pair space:\n$plan")
    assert(count(plan) { case _: BroadcastNestedLoopJoinExec => } === 0,
      s"no nested-loop join in the overlap pair space:\n$plan")
    assert(count(plan) { case w: WindowExec if w.partitionSpec.isEmpty => }
      === 0, s"no global window:\n$plan")
  }

  test("negative samples (q442 kernel): slot assignment is an equi-join, " +
      "never a range/nested-loop pass; no cartesian") {
    import org.apache.spark.sql.execution.joins.{
      BroadcastNestedLoopJoinExec, CartesianProductExec}
    val edges = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey").as("src"),
        (col("l_partkey") % 50).as("dst"))
      .filter(col("src") =!= col("dst"))
    val pairs = Seq((1L, 2L), (3L, 4L)).toDF("center", "context")
    val plan = staticPlan(graft.operators.Graphs.negativeSamples(
      pairs, edges, "src", "dst", nNeg = 3))
    assert(count(plan) { case _: CartesianProductExec => } === 0,
      s"no cartesian:\n$plan")
    assert(count(plan) { case _: BroadcastNestedLoopJoinExec => } === 0,
      s"slot lookup must be an equi-join:\n$plan")
  }

  test("louvain sweep (q434 kernel): community masses broadcast, argmax " +
      "window node-partitioned, no cartesian") {
    import org.apache.spark.sql.execution.joins.CartesianProductExec
    val e = Seq((1L, 2L, 1L), (2L, 3L, 2L), (3L, 3L, 1L)).toDF("u", "v", "w")
    val str = graft.operators.Louvain.strengths(e)
    val lbls = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("n", "lbl")
    val plan = staticPlan(
      graft.operators.Louvain.sweepW(e, str, 4L, lbls))
    assert(count(plan) { case _: CartesianProductExec => } === 0)
    assert(count(plan) { case w: WindowExec if w.partitionSpec.isEmpty => }
      === 0, s"the move argmax must be node-partitioned:\n$plan")
    assert(count(plan) { case _: BroadcastExchangeExec => } >= 2,
      s"sigma-tot and size relations must ship broadcast:\n$plan")
  }

  test("tombstoned winnowing ledger probe (q453): bucket partition " +
      "pruning must survive the erasure anti-join, and tombstones ship " +
      "as a broadcast left-anti") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val path =
      s"${System.getProperty("java.io.tmpdir")}/graft_test_planshape_wndel"
    graft.operators.FsUtil.deleteRecursively(new java.io.File(path))
    val pdocs = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("text").isNotNull)
    graft.functions.Winnowing.ledger(
      pdocs.filter(col("doc_id") % 3 =!= 0), path)
    graft.functions.Winnowing.ledgerDelete(
      pdocs.filter(col("doc_id") % 5 === 1), path)
    val plan = staticPlan(graft.functions.Winnowing.ledgerPairs(
      pdocs.filter(col("doc_id") % 3 === 0), path))
    val fpScans = plan.collect {
      case f: FileSourceScanExec
        if f.relation.location.rootPaths
          .exists(_.toString.contains("fps")) => f
    }
    assert(fpScans.nonEmpty, s"no fps scan found:\n$plan")
    fpScans.foreach { f =>
      assert(f.partitionFilters
        .exists(_.references.exists(_.name == "bucket")),
        s"bucket pruning must survive the tombstone anti-join:\n$f")
    }
    assert(count(plan) { case j: BroadcastHashJoinExec
      if j.joinType.toString == "LeftAnti" => } >= 1,
      s"tombstones must apply as a broadcast anti-join:\n$plan")
    graft.operators.FsUtil.deleteRecursively(new java.io.File(path))
  }

  test("tombstoned minhash ledger probe (q454): both layout scans keep " +
      "their static bucket pruning under the erasure anti-joins") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val path =
      s"${System.getProperty("java.io.tmpdir")}/graft_test_planshape_mhdel"
    graft.operators.FsUtil.deleteRecursively(new java.io.File(path))
    val pdocs = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("text").isNotNull)
    Dedup.minHashLedger(pdocs, path, k = 5, numHashes = 32,
      rowsPerBand = 4, threshold = 0.5)
    Dedup.minHashLedgerDelete(pdocs.filter(col("doc_id") % 5 === 1), path)
    val plan = staticPlan(Dedup.minHashLedgerPairs(
      pdocs.withColumn("doc_id", col("doc_id") + 1000000L), path,
      k = 5, numHashes = 32, rowsPerBand = 4, threshold = 0.5))
    val scans = plan.collect {
      case f: FileSourceScanExec
        if f.relation.location.rootPaths.exists(p =>
          p.toString.contains("bands") || p.toString.contains("sigs"))
        => f
    }
    assert(scans.size >= 2, s"bands+sigs scans expected:\n$plan")
    scans.foreach { f =>
      assert(f.partitionFilters.exists(_.references.exists(a =>
        a.name == "bucket" || a.name == "sbucket")),
        s"static pruning must survive the tombstone anti-join:\n$f")
    }
    assert(count(plan) { case j: BroadcastHashJoinExec
      if j.joinType.toString == "LeftAnti" => } >= 2,
      s"both layouts must exclude tombstones broadcast-anti:\n$plan")
    graft.operators.FsUtil.deleteRecursively(new java.io.File(path))
  }

  test("html extract (q457 kernel): map-only — zero exchanges, zero " +
      "windows, zero joins from scan to extracted lines") {
    val pdocs = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("text").isNotNull)
      .select(col("doc_id"), concat(lit("<p>"), col("text"), lit("</p>"))
        .as("html"))
    val plan = staticPlan(
      graft.preprocess.HtmlText.extract(pdocs, "html", "doc_id"))
    assert(count(plan) { case _: ShuffleExchangeExec => } === 0,
      s"extraction must be map-only:\n$plan")
    assert(count(plan) { case _: WindowExec => } === 0,
      s"no window in the extraction path:\n$plan")
    assert(count(plan) { case _: BroadcastExchangeExec => } === 0,
      s"no join in the extraction path:\n$plan")
  }

  test("robots gate (q462 kernel): frontier side never shuffled — the " +
      "only exchange is the rules-sized per-host agg, zero windows, " +
      "one broadcast join (r17 judge directive #4)") {
    val frontier = spark.read.parquet(s"$sf/documents.parquet")
      .select(concat(lit("https://example.com/articles/"),
        col("doc_id").cast("string")).as("url"), col("source"))
    val rules = Seq(
      ("example.com", "/articles/1", false),
      ("example.com", "/articles/12", true)).toDF("host", "prefix", "allow")
    val plan = staticPlan(
      graft.functions.Robots.gate(frontier, "url", rules))
    // the one shuffle is the per-host rule-array agg — bounded by the
    // rule set, never the frontier
    assert(count(plan) { case _: ShuffleExchangeExec => } <= 1,
      s"only the rules-sized agg may shuffle:\n$plan")
    assert(count(plan) { case _: WindowExec => } === 0,
      s"no window over the frontier:\n$plan")
    assert(count(plan) { case _: BroadcastExchangeExec => } === 1,
      s"one broadcast of the per-host rules only:\n$plan")
    // and no sort touches frontier-sized data (the rule arrays sort
    // inside the agg, rules-sized)
    import org.apache.spark.sql.execution.SortExec
    assert(count(plan) { case _: SortExec => } === 0,
      s"no frontier-sized sort:\n$plan")
  }

  test("url canonicalize (q459 kernel): map-only projection — zero " +
      "exchanges from scan to canonical form") {
    val pdocs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"),
        concat(lit("HTTP://Example.COM:80/a/"),
          col("doc_id").cast("string"), lit("?utm_x=1&b=2#f")).as("url"))
    val plan = staticPlan(pdocs.select(col("doc_id"),
      graft.functions.Urls.canonicalize(col("url")).as("c")))
    assert(count(plan) { case _: ShuffleExchangeExec => } === 0,
      s"canonicalization must be map-only:\n$plan")
    assert(count(plan) { case _: BroadcastExchangeExec => } === 0,
      s"no join in the canonicalization path:\n$plan")
  }
}
