package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Cluster-index base/fold meter for the SHARDED build (round 13 — the
  * round-12 verdict's task #2: the one-shot base build's pair join + CC
  * spilled past free disk at the 1000× tier, so "the base build is a
  * provisioned one-time job" was an argument, not a measurement). Times,
  * cold, in order:
  *
  *  1. `cluster_base_sharded_s` — [[graft.text.ClusterIndex.writeSharded]]
  *     over the corpus (peak intermediate mass = one bucket-group's join
  *     spill, instead of the whole corpus's at once);
  *  2. `cluster_fold_s` — one [[graft.text.ClusterIndex.append]] of an
  *     sf0.1-sized batch (the maintenance unit — should stay flat in
  *     corpus size);
  *  3. `serve_s` — the q160 serving read (labels join over the corpus
  *     spine), the consumer the maintained artifact exists for.
  *
  * Usage: ClusterBench <corpusDir> <batchSrcDir> <workDir>
  * [shards=16|routed] — `routed` (round 16, the r15 verdict's task #3
  * done-condition) lets [[graft.text.ClusterIndex.writeRouted]] pick
  * the arm and count from the pair-mass advisor, and the JSON carries
  * the decision beside the build time so the routed build can be
  * compared against the hand-chosen one on the same fixture.
  * (workDir must be fresh; one JSON line on stdout). */
object ClusterBench {
  def main(args: Array[String]): Unit = {
    if (args.length < 3) {
      System.err.println(
        "usage: ClusterBench <corpusDir> <batchSrcDir> <workDir> [shards|routed]")
      sys.exit(2)
    }
    val (corpus, batchSrc, work) = (args(0), args(1), args(2))
    val routed = args.lift(3).contains("routed")
    val shards = args.lift(3).filterNot(_ == "routed")
      .map(_.toInt).getOrElse(16)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = graft.SparkTuning.tuned(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // the GramLedgerBench timing rule: capture elapsed immediately after
    // the body; sweep/GC hygiene runs OUTSIDE the measured window
    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime()
      body
      val elapsed = (System.nanoTime() - t0) / 1e9
      graft.Checkpoints.sweepExceptRetained(spark.sparkContext)
      spark.catalog.clearCache()
      System.gc()
      elapsed
    }
    def step(name: String, s: Double): Double = {
      System.err.println(f"[clusterbench] $name = $s%.3f s"); s
    }
    // batch ids offset past every corpus id (the append contract)
    val maxId = spark.read.parquet(s"$corpus/documents.parquet")
      .agg(coalesce(max(col("doc_id")).cast("long"), lit(0L)))
      .head().getLong(0)
    var off = 10000000L
    while (off <= maxId) off *= 10
    val batchDir = s"$work/batch"
    spark.read.parquet(s"$batchSrc/documents.parquet")
      .withColumn("doc_id", col("doc_id") + lit(off))
      .write.mode("overwrite").parquet(s"$batchDir/documents.parquet")
    val nBatch = spark.read.parquet(s"$batchDir/documents.parquet").count()
    val nCorpus = spark.read.parquet(s"$corpus/documents.parquet").count()
    val idx = s"$work/cluster"
    var route = ""
    var routedShards = shards
    val baseS = step("cluster_base_sharded_s", timed {
      if (routed) {
        val r = graft.text.ClusterIndex.writeRouted(spark, corpus, idx)
        route = r.advisorRow; routedShards = r.shards
      } else
        graft.text.ClusterIndex.writeSharded(spark, corpus, idx, shards = shards)
    })
    graft.text.Dedup.evictMemos(spark)
    graft.Checkpoints.evictSessionMemos(spark)
    val foldS = step("cluster_fold_s", timed {
      graft.text.ClusterIndex.append(spark, batchDir, idx, Some("fold_1"))
    })
    val serveS = step("serve_s", timed {
      graft.text.ClusterIndex.nearDupClustersServed(spark, corpus, idx)
        .write.format("noop").mode("overwrite").save()
    })
    println(f"""{"metric":"cluster_bench","dir":"$corpus","n_corpus":$nCorpus,"n_batch":$nBatch,"shards":$routedShards,"routed":${routed},"route":"$route","cluster_base_sharded_s":$baseS%.3f,"cluster_fold_s":$foldS%.3f,"serve_s":$serveS%.3f}""")
    spark.stop()
  }
}
