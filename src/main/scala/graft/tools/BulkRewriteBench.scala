package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** SCALING.md meter for the BULK (>1M-doc) backfill arm of the gram
  * ledger rewrite — the round-14 2.5M-doc cell re-measured under the
  * round-15 shape (data-FS scratch placement + byte-derived shard
  * count; the r14 verdict's task #1 done-condition). Parity split: the
  * even docs build the at-rest ledger (the accepted corpus), the odd
  * docs are the backfill batch routed through the SHIPPED entry
  * ([[graft.text.Dedup.rewriteBatchAgainstLedger]] — doc count gates the
  * bulk arm, shards derive from ledger bytes, scratch stages beside the
  * ledger). Reports the ledger build, the at-rest gram bytes, the
  * derived shard count, and the timed bulk rewrite.
  *
  * Usage: BulkRewriteBench <corpusDir> <workDir>  (workDir fresh;
  * single pass — the 1000× cell is a solo run by protocol) */
object BulkRewriteBench {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: BulkRewriteBench <corpusDir> <workDir>")
      sys.exit(2)
    }
    val (corpus, work) = (args(0), args(1))
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
    def step(name: String)(body: => Unit): Double = {
      val t0 = System.nanoTime()
      body
      val s = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bulkbench] $name = $s%.3f s")
      graft.Checkpoints.sweepExceptRetained(spark.sparkContext)
      spark.catalog.clearCache()
      System.gc()
      s
    }
    val evens = s"$work/evens"; val odds = s"$work/odds"
    val docs = spark.read.parquet(s"$corpus/documents.parquet")
    docs.filter(col("doc_id") % 2 === 0)
      .write.mode("overwrite").parquet(s"$evens/documents.parquet")
    docs.filter(col("doc_id") % 2 === 1)
      .write.mode("overwrite").parquet(s"$odds/documents.parquet")
    val nBatch = spark.read.parquet(s"$odds/documents.parquet").count()
    val ledger = s"$work/gramledger"
    val buildS = step("ledger_base")(
      graft.text.Dedup.writeGramLedger(spark, evens, ledger))
    val gramsPath = new org.apache.hadoop.fs.Path(s"$ledger/grams")
    val ledgerBytes = gramsPath
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .getContentSummary(gramsPath).getLength
    val shards = graft.text.Dedup.bulkShardsFor(ledgerBytes)
    System.err.println(s"[bulkbench] ledger bytes $ledgerBytes -> $shards shards")
    var rows = -1L
    val rewriteS = step("bulk_rewrite") {
      rows = graft.text.Dedup.rewriteBatchAgainstLedger(spark, odds, ledger)
        .count()
    }
    require(rows == nBatch,
      s"bulk rewrite returned $rows rows for a $nBatch-doc batch")
    println(f"""{"metric":"bulkrewritebench","dir":"$corpus","n_batch":$nBatch,"ledger_base_s":$buildS%.3f,"ledger_bytes":$ledgerBytes,"derived_shards":$shards,"bulk_rewrite_s":$rewriteS%.3f}""")
    spark.stop()
  }
}
