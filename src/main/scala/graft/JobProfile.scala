package graft

import org.apache.spark.sql.SparkSession

/** Dev tool (not on the bench path): run selected queries once and print a
  * per-Spark-job time breakdown — jobId, seconds, #stages, #tasks and the
  * first line of the job's call site — so a driver-job-bound query (the
  * ledger tier's 15–20-jobs-per-query floor, VERDICT r18 §"Scaling")
  * self-explains where its wall time goes before anything is changed.
  *
  * Usage: runMain graft.JobProfile <name-substring>[,<substring>...] [sfDir]
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    java.util.TimeZone.setDefault(java.util.TimeZone.getTimeZone("UTC"))
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    case class Job(id: Int, started: Long, var ended: Long = -1L,
                   var site: String = "", var nStages: Int = 0,
                   var nTasks: Int = 0)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Job]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val j = Job(js.jobId, js.time)
          j.site = Option(js.properties)
            .flatMap(p => Option(p.getProperty("callSite.short")))
            .getOrElse("")
          j.nStages = js.stageInfos.size
          j.nTasks = js.stageInfos.map(_.numTasks).sum
          jobs.put(js.jobId, j)
        }
        override def onJobEnd(
            je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          Option(jobs.get(je.jobId)).foreach(_.ended = je.time)
        }
      })

    // warm-up (JobProfile numbers are read relative to each other; the
    // first query still absorbs some codegen warmup)
    spark.range(1000000).selectExpr("sum(id)").collect()

    val selected = SparkEntry.benchQueries
      .filter { case (n, _) => args(0).split(",").exists(n.contains) }
    selected.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      BroadcastLifecycle.releaseAll()
      jobs.clear()
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      // listener bus is async; give it a beat to drain
      Thread.sleep(500)
      import scala.jdk.CollectionConverters._
      val done = jobs.values.asScala.toSeq.sortBy(_.id)
      val totalJobSec = done.filter(_.ended > 0)
        .map(j => (j.ended - j.started) / 1e3).sum
      println(f"\n===== $name%s wall=$wall%.2fs jobs=${done.size}%d " +
        f"sum_job=$totalJobSec%.2fs gap=${wall - totalJobSec}%.2fs =====")
      done.foreach { j =>
        val sec = if (j.ended > 0) (j.ended - j.started) / 1e3 else -1.0
        println(f"  job ${j.id}%3d ${sec}%7.3fs stages=${j.nStages}%2d " +
          f"tasks=${j.nTasks}%4d  ${j.site}%s")
      }
    }
    spark.stop()
  }
}
