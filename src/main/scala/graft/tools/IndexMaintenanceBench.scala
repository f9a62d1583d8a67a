package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** SCALING.md meter for the STEADY-STATE streaming index maintenance path
  * (round 9): drives N consecutive micro-batches through
  * [[graft.app.IndexMaintenanceJob.applyBatch]] — the exact per-batch seam
  * the streaming sink runs — against both at-rest indexes, reporting
  * per-fold seconds and after-fold storage (bytes + committed version
  * count per index). The claims under test: per-batch cost stays flat as
  * folds accumulate (append tracks batch + vocabulary mass, not corpus
  * mass; the carried-forward file copy is byte-for-byte and would be a
  * server-side copy on an object store), and storage stays bounded at the
  * retention floor (vacuum runs inside every fold).
  *
  * Batches are deterministic disjoint 5% slices of the source corpus with
  * offset ids (the CellIndexBench convention). Batch 0 doubles as the JIT
  * warmup and is reported but flagged.
  *
  * Round 13 adds the COMPACTION CADENCE arm: an optional 5th arg
  * `compactAt=<n>` threads the threshold into every fold, and the JSON
  * reports per-fold LIVE CHAIN WIDTHS (posting/position data files,
  * store/ledger/cluster live delta dirs) — the claim under test: with a
  * cadence the widths stay bounded over N folds while per-fold cost stays
  * flat (compaction cost amortizes inside the folds that trigger it);
  * without one they grow linearly with fold count. A per-fold SERVE probe
  * (a fixed 64-id store page fetch + the pinned hottest-pair phrase
  * search — the two reader classes whose list/union width the chains
  * govern) is timed beside each fold, so the row shows READ cost staying
  * flat under the cadence where the uncompacted chain's read degrades.
  *
  * Usage: IndexMaintenanceBench <sfDir> <workDir> [nBatches=5] [k=16] [compactAt=N] */
object IndexMaintenanceBench {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: IndexMaintenanceBench <sfDir> <workDir> [nBatches] [k] [compactAt=N]")
      sys.exit(2)
    }
    val dir = args(0); val work = args(1)
    val nBatches = args.lift(2).map(_.toInt).getOrElse(5)
    val k = args.lift(3).map(_.toInt).getOrElse(16)
    val compactAt = args.lift(4)
      .map(a => a.stripPrefix("compactAt=").toInt)
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
    val vecIdx = s"$work/vec"; val textIdx = s"$work/text"
    val phraseIdx = s"$work/phrase"; val store = s"$work/store"
    val ledger = s"$work/gramledger"; val clusterIdx = s"$work/cluster"
    // base-build routing mirrors production (round 15 — the 1000× tier):
    // past 1M docs the one-shot store/cluster builds are the measured
    // disk-death arms (r13's cluster base spill; the r15 advisor priced
    // the raw banded join at 260M+ comparisons on 5M docs), so big
    // corpora take the SHARDED builders, spec'd ≡ their one-shot forms
    val bigBase = spark.read.parquet(s"$dir/documents.parquet")
      .count() > 1000000L
    graft.vector.CellIndex.write(spark, dir, vecIdx, k = k)
    graft.text.TextIndex.write(spark, dir, textIdx)
    graft.text.TextIndex.writePhraseIndex(spark, dir, phraseIdx)
    if (bigBase) graft.text.DocStore.writeSharded(spark, dir, store)
    else graft.text.DocStore.write(spark, dir, store)
    // round 12: the fifth and sixth maintained artifacts ride the fold
    graft.text.Dedup.writeGramLedger(spark, dir, ledger)
    if (bigBase) graft.text.ClusterIndex.writeSharded(spark, dir, clusterIdx)
    else graft.text.ClusterIndex.write(spark, dir, clusterIdx)
    graft.text.Dedup.evictMemos(spark) // the cluster base memoizes pairs
    graft.Checkpoints.evictSessionMemos(spark)

    def batchDf(i: Int) = {
      val off = 900000000L + i.toLong * 10000000L
      val d = spark.read.parquet(s"$dir/documents.parquet")
        .filter(col("doc_id") % 20 === i)
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
        .filter(col("vec_id") % 20 === i)
      d.join(e, col("doc_id") === col("vec_id"))
        .select((col("doc_id") + off).as("doc_id"), col("text"), col("lang"),
          col("source"), col("n_chars"), col("embedding"), col("label"))
    }

    val conf = spark.sparkContext.hadoopConfiguration
    def usage(p: String): (Long, Int) = {
      val path = new org.apache.hadoop.fs.Path(p)
      val fs = path.getFileSystem(conf)
      val bytes = fs.getContentSummary(path).getLength
      val versions = fs.listStatus(path).count { s =>
        val n = s.getPath.getName
        n.startsWith("vectors") || n == "postings" || n == "positions" ||
          n.startsWith("v")
      }
      (bytes, versions)
    }

    // the serve probe's inputs, pinned ONCE before any fold (ids from the
    // base corpus — replica 0 keeps original ids at every fixture SF; the
    // hottest pair from the base vocabulary — fold appends only raise df)
    val pageIds = (0L until 64L).toSeq
    val (pt1, pt2) = graft.text.TextIndex.deriveProximityTerms(spark, phraseIdx)

    final case class Fold(secs: Double, serveSecs: Double,
      vb: Long, vv: Int, tb: Long, tv: Int,
      pb: Long, pv: Int, sb: Long, gb: Long, cb: Long, cv: Int,
      postFiles: Int, posFiles: Int, storeLive: Int, ledgerLive: Int,
      clusterLive: Int)
    val folds = (0 until nBatches).map { i =>
      val t0 = System.nanoTime()
      graft.app.IndexMaintenanceJob.applyBatch(spark, batchDf(i), i.toLong,
        s"$work/batches", vecIdx, textIdx, retainVersions = 2,
        phraseIdx = Some(phraseIdx), docStore = Some(store),
        gramLedger = Some(ledger), clusterIdx = Some(clusterIdx),
        compactAt = compactAt)
      val secs = (System.nanoTime() - t0) / 1e9
      graft.Checkpoints.sweepExceptRetained(spark.sparkContext)
      spark.catalog.clearCache(); System.gc()
      val s0 = System.nanoTime()
      graft.text.DocStore.fetchPage(spark, store, pageIds)
        .write.format("noop").mode("overwrite").save()
      graft.text.TextIndex.phraseSearch(spark, phraseIdx, Seq(pt1, pt2))
        .write.format("noop").mode("overwrite").save()
      val serveSecs = (System.nanoTime() - s0) / 1e9
      spark.catalog.clearCache()
      val (vb, vv) = usage(vecIdx)
      val (tb, tv) = usage(textIdx)
      val (pb, pv) = usage(phraseIdx)
      def bytesOf(p0: String): Long = {
        val p = new org.apache.hadoop.fs.Path(p0)
        p.getFileSystem(conf).getContentSummary(p).getLength
      }
      val sb = bytesOf(store)
      val gb = bytesOf(ledger)
      val (cb, cv) = usage(clusterIdx)
      val f = Fold(secs, serveSecs, vb, vv, tb, tv, pb, pv, sb, gb, cb, cv,
        graft.text.TextIndex.postingFileCount(spark, textIdx),
        graft.text.TextIndex.positionFileCount(spark, phraseIdx),
        graft.text.DocStore.liveBatchCount(spark, store),
        graft.text.Dedup.gramLedgerLiveBatchCount(spark, ledger),
        graft.text.ClusterIndex.liveBatchCount(spark, clusterIdx))
      // per-fold line EMITTED IMMEDIATELY (round 16): two 1000× runs in
      // a row lost their whole table to a late crash (a tmp sweep in
      // r15, an OOM in a fold-10 compaction in r16) because the only
      // print was the final summary — the rows that DID complete are
      // the measurement, so they leave the process as they happen
      println(f"""{"metric":"idxmaint_fold","i":$i,"fold_s":${f.secs}%.3f,"serve_s":${f.serveSecs}%.3f,"post_files":${f.postFiles},"pos_files":${f.posFiles},"store_live":${f.storeLive},"ledger_live":${f.ledgerLive},"cluster_live":${f.clusterLive},"store_bytes":${f.sb},"ledger_bytes":${f.gb},"cluster_bytes":${f.cb}}""")
      Console.flush()
      f
    }
    def arr[T](f: Fold => T): String = folds.map(f).mkString("[", ",", "]")
    println(s"""{"metric":"idxmaint","batches":$nBatches,"dir":"$dir","k":$k,""" +
      s""""compact_at":${compactAt.map(_.toString).getOrElse("null")},""" +
      s""""fold_secs":${folds.map(f => f"${f.secs}%.3f").mkString("[", ",", "]")},""" +
      s""""serve_secs":${folds.map(f => f"${f.serveSecs}%.3f").mkString("[", ",", "]")},""" +
      s""""vec_bytes":${arr(_.vb)},"vec_versions":${arr(_.vv)},""" +
      s""""text_bytes":${arr(_.tb)},"text_versions":${arr(_.tv)},""" +
      s""""phrase_bytes":${arr(_.pb)},"phrase_versions":${arr(_.pv)},""" +
      s""""store_bytes":${arr(_.sb)},"ledger_bytes":${arr(_.gb)},""" +
      s""""cluster_bytes":${arr(_.cb)},"cluster_versions":${arr(_.cv)},""" +
      s""""posting_files":${arr(_.postFiles)},"position_files":${arr(_.posFiles)},""" +
      s""""store_live":${arr(_.storeLive)},"ledger_live":${arr(_.ledgerLive)},""" +
      s""""cluster_live":${arr(_.clusterLive)},""" +
      s""""note":"fold 0 includes JIT warmup; retention floor 2 versions; all SIX artifacts folded; *_files/*_live are the reader-visible chain widths the compactAt cadence bounds; serve_secs = fixed 64-id store page + pinned hottest-pair phrase search after each fold"}""")
    spark.stop()
  }
}
