package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-17 measurement tool for the hot-bucket salted fallback (guide
  * §2.5; the r16 verdict's skew task): builds a SYNTHETIC band table with
  * one hot (band_id, band_val) bucket of `n` members beside a spread of
  * cold buckets, then times the candidate-pair build twice — the plain
  * within-bucket self-join (one join key = C(n,2) comparisons in ONE
  * task, the straggler no shard count can split) and
  * [[graft.text.ClusterIndex.bandCandidatePairs]]'s triangle-decomposed
  * form — reporting wall seconds and the MAX single-task time of the
  * build (the straggler bound the decomposition exists to cut). Also
  * asserts the two pair COUNTS agree (the set equality is spec'd;
  * counting here keeps the timed action identical for both arms).
  *
  * Usage: runMain graft.tools.SaltBench [hotN=8000] [budget=4000000]
  */
object SaltBench {
  def main(args: Array[String]): Unit = {
    val hotN = args.headOption.map(_.toInt).getOrElse(8000)
    val budget = if (args.length > 1) args(1).toLong
      else graft.text.ClusterIndex.PerTaskPairBudget
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.SparkTuning.tuned(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // model the AT-SCALE planner regime: a rehearsal-sized band table
      // fits the broadcast threshold, and a broadcast self-join streams
      // the hot bucket's pairs across scan partitions (no straggler to
      // demonstrate). The regime the salted fallback exists for is the
      // 1000×/100 TB one where the band table CANNOT broadcast and the
      // sort-merge join enumerates a hot key's C(n,2) in one task.
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    @volatile var maxTaskMs = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          maxTaskMs = math.max(maxTaskMs, t.taskMetrics.executorRunTime)
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val rt = s.stageInfo.taskMetrics.executorRunTime
        if (rt > 500 && sys.env.contains("SALT_STAGES"))
          println(f"  [stage] ${s.stageInfo.stageId}%4d tasks=${s.stageInfo.numTasks}%3d " +
            f"run=${rt / 1000.0}%.2f ${s.stageInfo.name.take(80)}")
      }
    })

    // one hot bucket of hotN members + 2000 cold buckets of 8 — the
    // measured advisor regime's shape (rep_max_bucket >> median)
    val hot = spark.range(0L, hotN.toLong).select(col("id").as("doc_id"),
      lit(0).as("band_id"), lit("hotval").as("band_val"))
    val cold = spark.range(0L, 16000L).select(
      (col("id") + 1000000L).as("doc_id"), lit(1).as("band_id"),
      concat(lit("c"), (col("id") % 2000).cast("string")).as("band_val"))
    val bands = hot.unionByName(cold).localCheckpoint()

    def timed(tag: String)(pairs: org.apache.spark.sql.DataFrame): Long = {
      maxTaskMs = 0L
      val t0 = System.nanoTime()
      val n = pairs.count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // listener drain
      println(f"[salt] $tag pairs=$n wall=$wall%.2f s max_task=${maxTaskMs / 1000.0}%.2f s")
      n
    }

    val plain = bands.as("x").join(bands.as("y"),
        col("x.band_id") === col("y.band_id") &&
        col("x.band_val") === col("y.band_val") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    val salted = graft.text.ClusterIndex.bandCandidatePairs(bands, budget)
    // alternate the arms twice so JIT warmup cannot masquerade as a win
    val counts = Seq(
      timed("plain  1")(plain), timed("salted 1")(salted),
      timed("plain  2")(plain), timed("salted 2")(salted))
    require(counts.distinct.size == 1,
      s"pair counts diverged between the arms: $counts")
    spark.stop()
  }
}
