package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-query profiling harness for bench-drift attribution: runs each
  * named query `SPARK_GRAFT_REPEATS` times through the noop sink and
  * prints EVERY sample (not just the median) plus scheduler-level
  * aggregates — jobs launched, stages run, summed task time, shuffle
  * bytes — so a wall-clock regression can be split into "more work
  * scheduled" vs "same work, slower host".
  *
  * Usage: tools/run.sh graft.Profile q1,q2 [sfDir]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val sfDir =
      if (args.length > 1) args(1)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val repeats = sys.env.getOrElse("SPARK_GRAFT_REPEATS", "6").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var taskTimeMs = 0L
    @volatile var shuffleReadB = 0L
    @volatile var shuffleWriteB = 0L
    val stageDetail = sys.env.get("SPARK_GRAFT_STAGE_DETAIL").contains("1")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1
        tasks += s.stageInfo.numTasks
        taskTimeMs += s.stageInfo.taskMetrics.executorRunTime
        shuffleReadB += s.stageInfo.taskMetrics.shuffleReadMetrics.totalBytesRead
        shuffleWriteB += s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
        if (stageDetail) {
          val m = s.stageInfo.taskMetrics
          println(f"""  {"stage":${s.stageInfo.stageId},"tasks":${s.stageInfo.numTasks},"run_ms":${m.executorRunTime},"cpu_ms":${m.executorCpuTime / 1000000},"gc_ms":${m.jvmGCTime},"deser_ms":${m.executorDeserializeTime},"name":"${s.stageInfo.name.takeWhile(_ != '\n')}"}""")
        }
      }
    })

    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to repeats).foreach { i =>
        val pinnedBefore = spark.sparkContext.getPersistentRDDs.keySet
        jobs = 0; stages = 0; tasks = 0; taskTimeMs = 0L
        shuffleReadB = 0L; shuffleWriteB = 0L
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        // listener events are async (the bus drain API is private);
        // a settle pause outside the timed window is accurate enough
        // for attribution
        Thread.sleep(400)
        println(f"""{"query":"$name","run":$i,"wall_sec":$wall%.3f,"jobs":$jobs,"stages":$stages,"tasks":$tasks,"task_time_ms":$taskTimeMs,"shuffle_read_b":$shuffleReadB,"shuffle_write_b":$shuffleWriteB}""")
        spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
          if (!pinnedBefore.contains(id)) rdd.unpersist(blocking = false)
        }
      }
    }
    spark.stop()
  }
}
