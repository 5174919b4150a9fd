package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.operators.{Graphs, PageRank, Triangles}

/** Round-18 optimization plan locks: the shapes the optimization round
  * bought, asserted so a later refactor cannot silently re-pay the cost.
  * Operators whose heavy work hides behind internal actions are locked
  * through [[graft.plans.PlanDump]] (`graft.plan.dir` system property) —
  * the same hook that captures the committed plans/r18 evidence.
  */
class Round18OptSpec extends SparkSpec {
  import spark.implicits._

  // `graft.plan.dir` is a JVM-global system property: serialize every
  // test that sets it behind one lock so parallel suites in the same JVM
  // can neither cross-write plan dumps nor clear the property mid-test
  // (r18 advisor note). PlanDump.dumpLock is shared by any suite that
  // flips the property.
  private def withPlanDir[A](f: java.io.File => A): A =
    graft.plans.PlanDump.dumpLock.synchronized {
      val dir = Files.createTempDirectory("graft_plans").toFile
      sys.props("graft.plan.dir") = dir.getAbsolutePath
      try f(dir)
      finally {
        sys.props.remove("graft.plan.dir")
        graft.operators.FsUtil.deleteRecursively(dir)
      }
    }

  private lazy val edges = Seq(
    (1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L), (5L, 3L),
    (1L, 4L), (2L, 5L), (5L, 6L), (6L, 1L)
  ).toDF("src", "dst")

  test("pagerank iterations: hash joins on the node-sized side, no sorts") {
    // fixedPointRanks returns the lazy 5-iteration plan; every iteration
    // join must be a ShuffledHashJoin (build = node-sized ranks/inc) and
    // nothing in the plan may sort — the SMJ form re-sorted the frozen
    // edge relation once per iteration for no semantic gain
    // text match: the AdaptiveSparkPlanExec wrapper hides its inner plan
    // from collect(), so the assertion reads the printed plan instead
    val txt = PageRank.fixedPointRanks(edges, "src", "dst", iterations = 5)
      .queryExecution.executedPlan.toString
    assert(!txt.contains("SortMergeJoin"),
      s"no iteration join may sort-merge:\n$txt")
    assert(!txt.contains("+- Sort "),
      s"no per-iteration sort allowed:\n$txt")
    assert("ShuffledHashJoin".r.findAllIn(txt).length >= 5,
      s"iteration joins must hash-build the node-sized side:\n$txt")
  }

  test("triangle closure: wedges are Bloom-prefiltered before the exchange") {
    withPlanDir { dir =>
      Triangles.count(edges, "src", "dst").collect()
      val txt = Files.readString(
        Paths.get(dir.getAbsolutePath, "triangle_closure.txt"))
      assert(txt.contains("bloom_might_contain"),
        s"closure must carry the map-side Bloom probe:\n$txt")
    }
  }

  test("hash walks: adjacency derived once, hops read the cached relation") {
    withPlanDir { dir =>
      Graphs.hashWalks(edges, "src", "dst",
        Seq(1L, 3L).toDF("p"), "p", len = 3).collect()
      val txt = Files.readString(
        Paths.get(dir.getAbsolutePath, "hashwalks_hop.txt"))
      assert(txt.contains("InMemoryTableScan") ||
          txt.contains("Scan In-memory table"),
        s"hop join must read the cached adjacency, not re-derive it:\n$txt")
    }
  }

  test("ledger vacuum: counts observed on the single rewrite pass") {
    withPlanDir { dir =>
      val path = Files.createTempDirectory("graft_vac").toString
      val docs = Seq((0L, "a b c d e f g h i j"), (1L, "a b c d e f g h i k"),
        (2L, "x y z w v u t s r q")).toDF("doc_id", "text")
      graft.data.Dedup.minHashLedger(docs, path, k = 3)
      graft.data.Dedup.minHashLedgerDelete(Seq(1L).toDF("doc_id"), path)
      val (bb, ba, sb, sa) = graft.data.Dedup.vacuumMinHashLedger(spark, path)
      assert(bb > ba && sb > sa, s"vacuum must shed rows: $bb->$ba $sb->$sa")
      val txt = Files.readString(
        Paths.get(dir.getAbsolutePath, "ledger_vacuum_rewrite_bands.txt"))
      assert(txt.contains("CollectMetrics"),
        "before/after counts must ride the rewrite pass itself " +
          s"(no separate count scans):\n$txt")
      graft.operators.FsUtil.deleteRecursively(new java.io.File(path))
    }
  }
}
