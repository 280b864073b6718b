package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd,
  SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev-only: run one SparkEntry query at a given sf dir and print every
  * job and stage the action spawns, with wall-clock and task counts —
  * for attributing an operator's cost to its physical jobs (eager
  * fences, AQE stages, broadcast builds). Usage:
  * `runMain graft.ProbeJobs <query> [sfDir]`. */
object ProbeJobs {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("dd03_minhash_lsh")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobStart = new ConcurrentHashMap[Int, Long]()
    val jobSite = new ConcurrentHashMap[Int, String]()
    @volatile var base = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobStart.put(js.jobId, js.time)
        val props = Option(js.properties)
          .map(p => Seq("spark.job.description", "callSite.short",
              "spark.sql.execution.id")
            .flatMap(k => Option(p.getProperty(k))).mkString(" | "))
          .getOrElse("")
        val stages = js.stageInfos.map(_.name.takeWhile(_ != '\n'))
          .mkString(" ; ")
        jobSite.put(js.jobId, s"$props  //$stages")
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val t0 = jobStart.getOrDefault(je.jobId, je.time)
        println(f"JOB ${je.jobId}%3d  [${(t0 - base) / 1000.0}%6.2f -> " +
          f"${(je.time - base) / 1000.0}%6.2f]  " +
          f"${(je.time - t0) / 1000.0}%6.2f s  " +
          jobSite.getOrDefault(je.jobId, ""))
      }
      override def onStageCompleted(
          sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val s0 = si.submissionTime.getOrElse(base)
        val c0 = si.completionTime.getOrElse(base)
        println(f"  STG ${si.stageId}%3d [${(s0 - base) / 1000.0}%6.2f -> " +
          f"${(c0 - base) / 1000.0}%6.2f] tasks=${si.numTasks}%3d  " +
          si.name.takeWhile(_ != '\n'))
      }
      // per-execution attribution: AQE splinters one SQL execution into
      // many anonymous jobs, so job call sites alone can't say WHICH
      // query a job belongs to — the SQLExecutionStart description can
      override def onOtherEvent(
          event: org.apache.spark.scheduler.SparkListenerEvent): Unit =
        event match {
          case e: org.apache.spark.sql.execution.ui
              .SparkListenerSQLExecutionStart =>
            println(f"EXEC ${e.executionId}%3d  " +
              e.description.linesIterator.nextOption().getOrElse("")
                .take(160))
          case _ => ()
        }
    })
    base = System.currentTimeMillis()
    // warmup at sf0.001 like Bench, so codegen/classloading is excluded
    SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
      .write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    base = System.currentTimeMillis()
    println("=== MEASURED RUN ===")
    val t0 = System.nanoTime()
    SparkEntry.queries(name)(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    println(f"TOTAL ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
