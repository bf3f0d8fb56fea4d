package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev tool: per-JOB wall-clock breakdown of one catalog query.
  *
  * `runMain graft.ProfileJobs q_name [q_name ...]` — runs each query once
  * (build + full-column action) with a listener that prints every Spark
  * job's duration, stage count, task count, and callsite, so the eager
  * materializations inside a query's BUILD phase (localCheckpoints, store
  * verbs, meta round-trips) are attributable one by one. Same env contract
  * as [[Explain]] (SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS).
  */
object ProfileJobs {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String, Int, Int)]
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val name = j.stageInfos.lastOption.map(_.name.takeWhile(_ != '\n'))
          .getOrElse("?")
        val tasks = j.stageInfos.map(_.numTasks).sum
        starts.put(j.jobId, (System.nanoTime(), name, j.stageIds.length, tasks))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val (t0, site, nStages, tasks) =
          starts.getOrDefault(j.jobId, (0L, "?", 0, 0))
        val ms = (System.nanoTime() - t0) / 1e6
        lines.add(
          f"  job ${j.jobId}%3d ${ms}%8.1f ms  stages=$nStages%2d tasks=$tasks%4d  $site")
      }
    })
    // warm the catalog once at the smallest sf (like Bench) so JIT/codegen
    // cost doesn't mask the plan shape
    val warmDir = Seq("/root/testdata/sf0.001", sfDir)
      .find(d => new java.io.File(d).isDirectory).getOrElse(sfDir)
    args.foreach { name =>
      try SparkEntry.queries(name)(spark, warmDir).count()
      catch { case _: Throwable => }
    }
    args.foreach { name =>
      lines.clear()
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      val built = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      df.queryExecution.toRdd.count()
      val ran = (System.nanoTime() - t1) / 1e9
      // drain after the action so the final job's end event has landed
      Thread.sleep(300)
      println(f"[profile] $name build=$built%.3fs run=$ran%.3fs jobs=${lines.size}")
      lines.forEach(l => println(l))
    }
    spark.stop()
  }
}
