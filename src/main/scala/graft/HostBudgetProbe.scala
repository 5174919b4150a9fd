package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Measured probe for the r17 verdict's per-host-budget question: on a
  * deliberately hot-host frontier (ONE host owning 50 % of the rows),
  * does the q463 `row_number` window beat the k-bounded
  * [[graft.operators.TopKAgg]] partial aggregator for a cap of 100?
  *
  * The window shuffles and sorts the hot host's full row set on one
  * task; the aggregator map-side-bounds every (partition, host) to k
  * rows before the exchange but pays the udaf encode/decode boundary
  * per row. The aggregator leg encodes the (prio, url) order as
  * (−prio, xxhash64(url)) — NOT the same tie order, but the identical
  * row volume, group skew and buffer discipline, which is what the cost
  * question is about (the q118 measured-trade caveat applies verbatim).
  *
  * Usage: `runMain graft.HostBudgetProbe [nRows [reps]]`. Results are
  * recorded in PROBES.md; the shipped q463 keeps whichever form
  * measures faster.
  */
object HostBudgetProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 5000000L
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // 50 % of rows on ONE hot host, the rest over 10k cold hosts
    val frontier = spark.range(n).select(
      when(col("id") % 2 === 0, lit("hot.example"))
        .otherwise(concat(lit("h"), (col("id") % 10000).cast("string"),
          lit(".example"))).as("host"),
      concat(lit("https://x/p"), col("id").cast("string")).as("url"),
      (col("id") % 3).cast("int").as("prio"))

    def time(name: String)(body: => Long): Unit = {
      val secs = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val rows = body
        val s = (System.nanoTime() - t0) / 1e9
        println(f"  $name rows=$rows $s%.2f s")
        s
      }.sorted
      println(f"PROBE $name n=$n median=${secs(reps / 2)}%.2f s")
    }

    time("window") {
      val w = Window.partitionBy("host").orderBy(col("prio"), col("url"))
      frontier.withColumn("r", row_number().over(w))
        .filter(col("r") <= 100).count()
    }
    time("topkagg") {
      frontier
        .groupBy("host")
        .agg(graft.operators.TopKAgg.topK(100)(
          -col("prio").cast("double"), xxhash64(col("url"))).as("top"))
        .select(col("host"), explode(col("top")))
        .count()
    }
    spark.stop()
  }
}
