package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-16 measurement tooling: dump `.explain("formatted")` for declared
  * queries to files, so plan claims in OPTIMIZATION_r16.md are checkable
  * without running Spark (`plans/r16/<query>_<tag>.txt`).
  *
  * Usage: runMain graft.tools.ExplainDump <outDir> <tag> [q74,q31,...]
  * (prefix match like the bench's BENCH_ONLY; no list = full inventory).
  * Data dir comes from SPARK_GRAFT_SF_DIR like every other main here.
  *
  * NOTE: explain() plans the query but does not execute it; memo-built
  * inputs (session-memoized artifact frames) are built on demand during
  * planning only where the builder runs driver-side. Queries whose plan
  * depends on a built artifact will show the artifact SCAN, which is
  * exactly the serving-path plan we want pinned.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    // outDir is REQUIRED (round-16 ADVICE): a round-specific default made
    // a future round silently overwrite the previous round's committed
    // plan evidence
    val outDir = args.headOption.getOrElse(
      throw new IllegalArgumentException(
        "usage: ExplainDump <outDir> [tag] [q74,q31,...] — outDir is " +
          "required so one round cannot overwrite another's plan dumps"))
    val tag = if (args.length > 1) args(1) else "before"
    val only = if (args.length > 2)
      Some(args(2).split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    else None
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
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val names = graft.SparkEntry.queries.toSeq.sortBy(_._1).map(_._1)
      .filter(n => only.forall(_.exists(n.startsWith)))
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      try {
        val df = fn(spark, sfDir)
        // same accessor spark-shell's explain uses; returns the string
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$outDir/${name}_$tag.txt"),
          plan.getBytes("UTF-8"))
        println(s"[explain] $name ok")
      } catch { case e: Throwable =>
        // class + top frames, not just the message (round-16 ADVICE):
        // an analysis error's cause was invisible with message-only print
        System.err.println(s"[explain] $name FAILED: ${e.getClass.getName}: " +
          s"${e.getMessage}\n  " +
          e.getStackTrace.take(6).mkString("\n  "))
      }
    }
    spark.stop()
  }
}
