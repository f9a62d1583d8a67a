package graft.tools

import org.apache.spark.sql.SparkSession

/** SCALING.md meter for the partition-by-cell vector index: times the
  * one-off index build, then indexed vs ad-hoc ANN and semantic-cluster
  * queries on the same dir (`runMain graft.tools.CellIndexBench <sfDir>
  * <indexPath> [k]`). Same session shape as ScaleBench. */
object CellIndexBench {
  def main(args: Array[String]): Unit = {
    val dir = args(0); val idx = args(1)
    val k = args.lift(2).map(_.toInt).getOrElse(16)
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
    import graft.vector.{CellIndex, Similarity}
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f
      graft.Checkpoints.sweepExceptRetained(spark.sparkContext)
      spark.catalog.clearCache(); System.gc()
      (System.nanoTime() - t0) / 1e9
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    spark.read.parquet(s"$dir/embeddings.parquet").count() // footer warmup
    val probe = Similarity.probeVector(spark, dir)
    // a 10%-slice ingest batch (offset ids, reversed vectors — disjoint,
    // deterministic) for the incremental-maintenance metrics: append cost
    // should track BATCH mass where rebuild tracks corpus mass
    val batchDir = idx + "_batch"
    spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(org.apache.spark.sql.functions.col("vec_id") % 10 === 0)
      .select(
        (org.apache.spark.sql.functions.col("vec_id") + 900000000L).as("vec_id"),
        org.apache.spark.sql.functions.reverse(
          org.apache.spark.sql.functions.col("embedding")).as("embedding"),
        org.apache.spark.sql.functions.col("label"))
      .write.mode("overwrite").parquet(s"$batchDir/embeddings.parquet")
    spark.read.parquet(s"$dir/documents.parquet")
      .filter(org.apache.spark.sql.functions.col("doc_id") % 10 === 0)
      .withColumn("doc_id",
        org.apache.spark.sql.functions.col("doc_id") + 900000000L)
      .write.mode("overwrite").parquet(s"$batchDir/documents.parquet")
    // one untimed warmup round (JIT/codegen), then THREE measured rounds
    // with full memo eviction between them — the round-8 cold
    // median-of-3 protocol, aligned with Bench/ScaleBench so SCALING.md
    // rows reproduce under the driver's own numbers. Index paths are
    // per-round: an append publishes a version that would otherwise
    // shadow the next round's rebuilt base.
    // SPARK_GRAFT_SKIP_ADHOC=1 drops the ad-hoc comparison arms and the
    // (corpus-mass) cluster rows — the setting for the ≥100× tiers, where
    // the question is whether INDEXED serving stays flat, not the ad-hoc
    // multiple (already established at 10×)
    val skipAdhoc = sys.env.get("SPARK_GRAFT_SKIP_ADHOC").contains("1")
    val rounds = (0 to 3).map { round =>
      val rIdx = s"${idx}_r$round"
      val textIdx = s"${idx}_text_r$round"
      val phraseIdx = s"${idx}_phrase_r$round"
      // NOTE: evaluated AFTER `base` below — a Seq of time(...) pairs runs
      // its bodies at construction, and clusters_indexed reads the
      // per-round index that base's index_build row creates (an eager
      // `val adhoc` before `base` crashed every default-mode run)
      def adhoc() = if (skipAdhoc) Seq.empty else Seq(
        "ann_adhoc" -> time(noop(Similarity.annIvf(spark, dir))),
        "clusters_indexed" -> time(noop(CellIndex.semanticClustersIndexed(spark, rIdx))),
        "clusters_adhoc" -> time(noop(Similarity.semanticClusters(spark, dir))),
        "rrf_adhoc" -> time(noop(Similarity.rrfFusion(spark, dir))),
        "hybrid_adhoc" -> time(noop(Similarity.hybridSearch(spark, dir))),
        "mmr_adhoc" -> time(noop(Similarity.mmrSelect(spark, dir))),
        "bm25_adhoc" -> time(noop(graft.text.TextOps.bm25(spark, dir))))
      val base = (Seq(
        "index_build" -> time(CellIndex.write(spark, dir, rIdx, k = k)),
        "ann_indexed" -> time(noop(CellIndex.annIvfIndexed(spark, rIdx, probe))),
        "rrf_indexed" -> time(noop(CellIndex.rrfFusionIndexed(spark, dir, rIdx, probe))),
        "hybrid_indexed" -> time(noop(CellIndex.hybridSearchIndexed(spark, dir, rIdx, probe))),
        "mmr_indexed" -> time(noop(CellIndex.mmrSelectIndexed(spark, rIdx, probe))),
        "text_index_build" -> time(graft.text.TextIndex.write(spark, dir, textIdx)),
        "bm25_indexed" -> time(noop(graft.text.TextIndex.bm25Indexed(spark, textIdx))),
        "bm25_indexed_unpruned" -> time(noop(graft.text.TextIndex.bm25Indexed(
          spark, textIdx, prune = false))),
        "rrf_fully_indexed" -> time(noop(CellIndex.rrfFusionIndexed(
          spark, dir, rIdx, probe, textIndexPath = Some(textIdx)))),
        "phrase_index_build" -> time(graft.text.TextIndex.writePhraseIndex(
          spark, dir, phraseIdx)),
        "phrase_search" -> time(noop(graft.text.TextIndex.phraseSearch(
          spark, phraseIdx, graft.text.TextIndex.topPhrase(spark, phraseIdx))))
      )).toMap
      // appends run LAST: they publish v1, which would otherwise shadow
      // the base version under the comparison rows above
      val r = base ++ adhoc().toMap ++ Map(
        "vec_append" -> time(CellIndex.append(spark, batchDir, rIdx)),
        "text_append" -> time(graft.text.TextIndex.append(spark, batchDir, textIdx)))
      graft.text.Dedup.evictMemos(spark)
      graft.vector.Similarity.evictMemos(spark)
      graft.text.TextIndex.evictMemos(spark)
      graft.Checkpoints.evictSessionMemos(spark)
      graft.Checkpoints.sweepExceptRetained(spark.sparkContext)
      System.gc()
      r
    }.drop(1)
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    val out = rounds.head.keys.toSeq.sorted
      .map(n => n -> med(rounds.map(_(n))))
    val qs = out
      .map { case (n, s) => "\"" + n + f"""":$s%.3f""" }.mkString("{", ",", "}")
    println(s"""{"metric":"cellindex","queries":$qs,"dir":"$dir","k":$k,"protocol":"cold-median-of-3"}""")
    spark.stop()
  }
}
