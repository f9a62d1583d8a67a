package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Round-16 measurement tooling (guide §1): per-query breakdown of where
  * wall time goes — DataFrame construction (driver-side work in the query
  * builder: collects, checkpoints fired during construction), noop-write
  * execution, and the Spark job/stage count + per-stage task time during
  * the write. Helps distinguish "planning/driver-bound" from
  * "shuffle/compute-bound" at the tiny bench SFs.
  *
  * Usage: runMain graft.tools.QueryProbe q32,q167 [reps]
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val only = args.headOption.getOrElse("").split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val reps = if (args.length > 1) args(1).toInt else 2
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.SparkTuning.tuned(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup like Bench: touch tables + hot codegen paths
    graft.sources.Tables.names.filterNot(_ == "events").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count() catch { case _: Throwable => () }
    }
    try graft.sources.Tables.events(spark, sfDir).count() catch { case _: Throwable => () }

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var taskTimeMs = 0L
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onJobEnd(j: SparkListenerJobEnd): Unit = ()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1
        val rt = s.stageInfo.taskMetrics.executorRunTime
        taskTimeMs += rt
        if (rt > sys.env.getOrElse("PROBE_STAGES_MIN", "100").toLong &&
            sys.env.contains("PROBE_STAGES"))
          println(f"  [stage] ${s.stageInfo.stageId}%4d tasks=${s.stageInfo.numTasks}%3d " +
            f"run=${rt / 1000.0}%.2f ${s.stageInfo.name.take(90)}")
      }
    }
    spark.sparkContext.addSparkListener(listener)

    val names = graft.SparkEntry.queries.toSeq.sortBy(_._1).map(_._1)
      .filter(n => only.isEmpty || only.exists(n.startsWith))
    (1 to reps).foreach { rep =>
      names.foreach { name =>
        val fn = graft.SparkEntry.queries(name)
        jobs = 0; stages = 0; taskTimeMs = 0
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        val cJobs = jobs
        df.write.format("noop").mode("overwrite").save()
        if (sys.env.contains("PROBE_FINAL_PLAN"))
          println(df.queryExecution.executedPlan.toString.take(4000))
        // listener-bus drain (round-16 ADVICE): poll until the async
        // counters stop moving — two identical readings 60 ms apart,
        // 2 s cap — instead of one fixed sleep, under which a loaded
        // bus bled stage completions into the next query's counters
        locally {
          def snap() = (jobs, stages, taskTimeMs)
          var prev = snap()
          var stable = false
          val deadline = System.nanoTime() + 2000000000L
          while (!stable && System.nanoTime() < deadline) {
            Thread.sleep(60)
            val cur = snap()
            stable = cur == prev
            prev = cur
          }
        }
        val t2 = System.nanoTime()
        println(f"[probe] $name rep$rep construct=${(t1 - t0) / 1e9}%.3f " +
          f"(jobs=$cJobs) exec=${(t2 - t1) / 1e9}%.3f total_jobs=$jobs " +
          f"stages=$stages task_time=${taskTimeMs / 1000.0}%.2f")
        graft.Checkpoints.sweepExceptRetained(spark.sparkContext)
        spark.catalog.clearCache()
        System.gc()
      }
      graft.text.Dedup.evictMemos(spark)
      graft.vector.Similarity.evictMemos(spark)
      graft.text.TextIndex.evictMemos(spark)
      graft.text.DocStore.evictMemos(spark)
      graft.vector.CellIndex.evictMemos(spark)
      graft.Checkpoints.evictSessionMemos(spark)
      graft.Checkpoints.sweepExceptRetained(spark.sparkContext)
    }
    spark.stop()
  }
}
