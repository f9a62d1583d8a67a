package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Fold-cost meter for the round-12 maintained artifacts — the number the
  * q154 in-query cell cannot show: with the gram ledger AT REST, what does
  * one maintenance fold cost, and what does the batch rewrite served from
  * it cost? Times, cold, in order:
  *
  *  1. `gram_ledger_base_s` — [[graft.text.Dedup.writeGramLedger]] over
  *     the corpus (the ONE-TIME corpus gram pass; the price q141 pays
  *     per run and the ledger pays once);
  *  2. `gram_fold_s` — [[graft.text.Dedup.appendGramLedger]] of a
  *     batch (sf0.1's documents, ids offset past the corpus — the
  *     maintenance unit; cost should track BATCH gram mass, flat in
  *     corpus size);
  *  3. `batch_rewrite_s` — [[graft.text.Dedup.rewriteBatchAgainstLedger]]
  *     of that batch (one pruned ledger scan + batch-bounded shuffles);
  *  4. `cluster_base_s` / `cluster_fold_s` — the same pair for the
  *     [[graft.text.ClusterIndex]] (contracted-CC fold).
  *
  * Usage: GramLedgerBench <corpusDir> <batchSrcDir> <workDir>
  * (workDir must be fresh; one JSON line on stdout). */
object GramLedgerBench {
  def main(args: Array[String]): Unit = {
    if (args.length < 3) {
      System.err.println("usage: GramLedgerBench <corpusDir> <batchSrcDir> <workDir>")
      sys.exit(2)
    }
    val (corpus, batchSrc, work) = (args(0), args(1), args(2))
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
    // t1 captures IMMEDIATELY after the body: the sweep/clearCache/GC are
    // inter-step hygiene (the Bench between-pass convention), not part of
    // the measured operation — timing them inside distorted the small
    // per-fold cells most (round-12 ADVICE)
    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime()
      body
      val elapsed = (System.nanoTime() - t0) / 1e9
      graft.Checkpoints.sweepExceptRetained(spark.sparkContext)
      spark.catalog.clearCache()
      System.gc()
      elapsed
    }
    // batch ids offset past every corpus id (the append contract); the
    // batch is the maintenance unit: sf0.1-sized regardless of corpus tier
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

    // per-step prints so a crashed later stage (disk-bound spills at the
    // biggest tiers) doesn't lose the completed timings; the 4th arg
    // "skipCluster" bounds the run to the gram-ledger arm
    def step(name: String, s: Double): Double = {
      System.err.println(f"[foldbench] $name = $s%.3f s"); s
    }
    val skipCluster = args.length > 3 && args(3) == "skipCluster"
    val ledger = s"$work/gramledger"
    val baseS = step("gram_ledger_base_s",
      timed { graft.text.Dedup.writeGramLedger(spark, corpus, ledger) })
    val foldS = step("gram_fold_s", timed {
      graft.text.Dedup.appendGramLedger(spark, batchDir, ledger, "fold_1"); ()
    })
    val rewriteS = step("batch_rewrite_s", timed {
      graft.text.Dedup.rewriteBatchAgainstLedger(spark, batchDir, ledger)
        .write.format("noop").mode("overwrite").save()
    })
    val (cBaseS, cFoldS) =
      if (skipCluster) (-1.0, -1.0)
      else {
        val clusterIdx = s"$work/cluster"
        val b = step("cluster_base_s",
          timed { graft.text.ClusterIndex.write(spark, corpus, clusterIdx) })
        graft.text.Dedup.evictMemos(spark) // the base build memoizes pairs
        graft.Checkpoints.evictSessionMemos(spark)
        val f = step("cluster_fold_s", timed {
          graft.text.ClusterIndex.append(spark, batchDir, clusterIdx,
            Some("fold_1"))
        })
        (b, f)
      }
    println(f"""{"metric":"fold_bench","dir":"$corpus","n_corpus":$nCorpus,"n_batch":$nBatch,"gram_ledger_base_s":$baseS%.3f,"gram_fold_s":$foldS%.3f,"batch_rewrite_s":$rewriteS%.3f,"cluster_base_s":$cBaseS%.3f,"cluster_fold_s":$cFoldS%.3f}""")
    spark.stop()
  }
}
