package graft

import org.apache.spark.sql.functions._

import graft.data.{AggStore, SketchStore}

/** Round-9 units: compaction for the two aggregation stores (file-count
  * contract + report/estimate stability across the rewrite).
  */
class Round9Spec extends SparkSpec {
  import spark.implicits._

  test("AggStore.compactStore: one file per day, report bit-identical") {
    val tmp = System.getProperty("java.io.tmpdir")
    val path = s"$tmp/graft_r9_aggstore_compact"
    val rows = (1 to 200).map { i =>
      (s"2024-02-${"%02d".format(i % 5 + 1)} 0${i % 10}:00:00",
        if (i % 3 == 0) "click" else "view", i.toDouble / 7.0)
    }.toDF("ts", "event_type", "value")
      .select(col("ts").cast("timestamp").as("ts"), col("event_type"),
        col("value"))
    // two overlapping writes: every day gets files from both
    AggStore.writeDaily(rows.filter(hour(col("ts")) < 5), "ts", "event_type",
      "value", path)
    AggStore.appendDaily(rows.filter(hour(col("ts")) >= 5), "ts",
      "event_type", "value", path)
    val pre = AggStore.report(spark, path, "event_type",
      from = "2024-02-01", to = "2024-02-06").collect().toSet
    val (before, after) = AggStore.compactStore(spark, path, nDays = 5)
    assert(after == 5, s"expected one file per day, got $after")
    assert(before > after, s"files $before -> $after")
    val post = AggStore.report(spark, path, "event_type",
      from = "2024-02-01", to = "2024-02-06").collect().toSet
    assert(post == pre, "report changed across compaction")
  }

  test("HistStore: append folds, percentile bin is the exact order statistic") {
    import graft.data.HistStore
    val tmp = System.getProperty("java.io.tmpdir")
    val path = s"$tmp/graft_r9_histstore"
    // 100 values 0..99 on one day, split across write + append
    val rows = (0 until 100).map(i => ("2024-03-01 00:00:00", i.toDouble))
      .toDF("ts", "value")
      .select(col("ts").cast("timestamp").as("ts"), col("value"))
    HistStore.writeDaily(rows.filter(col("value") < 40), "ts", "value", path,
      lo = 0.0, width = 10.0, nBins = 10)
    HistStore.appendDaily(rows.filter(col("value") >= 40), "ts", "value", path,
      lo = 0.0, width = 10.0, nBins = 10)
    val rep = HistStore.reportPercentiles(spark, path, "2024-03-01",
        "2024-03-01", pctPpm = Seq(500000, 990000, 1000000), lo = 0.0,
        width = 10.0)
      .collect().map(r => r.getInt(0) -> (r.getInt(1), r.getLong(4), r.getLong(5)))
      .toMap
    // p50: rank ceil(0.5*100)=50 -> value 49 -> bin 4; p99: rank 99 ->
    // value 98 -> bin 9; p100: rank 100 -> bin 9
    assert(rep(500000) == ((4, 50L, 100L)), s"p50 got ${rep(500000)}")
    assert(rep(990000)._1 == 9 && rep(1000000)._1 == 9)
    // out-of-range values clamp into edge bins, totals preserved
    val extreme = Seq(("2024-03-02 00:00:00", -5.0), ("2024-03-02 00:00:00", 1e9))
      .toDF("ts", "value")
      .select(col("ts").cast("timestamp").as("ts"), col("value"))
    HistStore.appendDaily(extreme, "ts", "value", path, 0.0, 10.0, 10)
    val bins = spark.read.parquet(path)
      .filter(col("day") === lit("2024-03-02").cast("date"))
      .collect().map(r => r.getAs[Int]("bin") -> r.getAs[Long]("n")).toMap
    assert(bins == Map(0 -> 1L, 9 -> 1L), s"clamped bins got $bins")
  }

  test("SketchStore.compactStore: one row per day, one file, estimate bit-stable") {
    val tmp = System.getProperty("java.io.tmpdir")
    val path = s"$tmp/graft_r9_sketchstore_compact"
    val rows = (1 to 300).map { i =>
      (s"2024-02-0${i % 4 + 1} 00:00:00", i % 97L)
    }.toDF("ts", "user_id")
      .select(col("ts").cast("timestamp").as("ts"), col("user_id"))
    SketchStore.writeDailySketches(rows.filter(col("user_id") % 2 === 0),
      "ts", "user_id", path, overwrite = true)
    SketchStore.writeDailySketches(rows.filter(col("user_id") % 2 === 1),
      "ts", "user_id", path)
    assert(spark.read.parquet(path).count() == 8, "4 days x 2 appends")
    val pre = SketchStore.mergedEstimate(spark, path)
    val (before, after) = SketchStore.compactStore(spark, path)
    assert(after == 1L && before > after, s"files $before -> $after")
    val compacted = spark.read.parquet(path)
    assert(compacted.count() == 4, "one row per day after compaction")
    assert(compacted.agg(sum("n_rows")).head().getLong(0) == 300L,
      "row counts must fold across the union")
    assert(SketchStore.mergedEstimate(spark, path) == pre,
      "HLL union is associative — the merged estimate must be bit-stable")
  }
}
