package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures what the RAREST-FIRST phrase-chain ordering (round 11,
  * [[graft.text.TextIndex.phraseSearch]]) buys at scale: an m-way
  * position-chain join's intermediates are bounded by the rarest pair's
  * agreement when the two rarest slots join first, versus the hottest
  * pair's co-occurrence mass under the natural slot order. Two probes,
  * both derived deterministically from the index's own tables:
  *
  *  - HOT: the corpus top trigram ([[graft.text.TextIndex.topPhrase]],
  *    q147's probe) — all slots near-uniformly hot, so ordering is a
  *    no-op; this row guards against a regression from the ordering's
  *    one extra vocabulary lookup.
  *  - MIXED: (hottest, 2nd hottest, rarest) by the udf table's n_occ —
  *    the shape real phrase queries have under Zipfian vocabularies.
  *    Natural order pays hottest⋈2nd-hottest before the rare slot can
  *    prune; rarest-first's opening join is bounded by the rare token's
  *    occurrence list. The probe need not occur as a phrase: a negative
  *    lookup is the ordering's best case AND a common production shape
  *    (exact-phrase miss), and both orders return the identical (empty
  *    or not) answer — join order cannot change an inner equi-join's
  *    result, which the assert cross-checks per pass.
  *
  * Natural order is reconstructed inline here (the shipped code no
  * longer has it) — same pruned scans, same re-key, no sort.
  *
  * Usage: PhraseBench <sfDir> <idxPath>  (builds the index if absent;
  * SPARK_GRAFT_PASSES overrides the cold median-of-3) */
object PhraseBench {

  private def chain(spark: SparkSession, root: String, buckets: Int,
      phrase: Seq[String]): DataFrame = {
    val posts = spark.read.parquet(s"$root/positions")
    phrase.zipWithIndex.map { case (t, j) =>
      posts
        .filter(col("ub") === pmod(hash(lit(t)), lit(buckets)))
        .filter(col("tok") === t)
        .select(col("doc_id"), (col("i").cast("long") - lit(j)).as("p"))
    }.reduce((a, b) => a.join(b, Seq("doc_id", "p")))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_occ"), min(col("p")).as("first_pos"))
      .orderBy("doc_id")
  }

  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: PhraseBench <sfDir> <idxPath>")
      sys.exit(2)
    }
    val (dir, idx) = (args(0), args(1))
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "3").toInt
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
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(idx, "stats")))
      graft.text.TextIndex.writePhraseIndex(spark, dir, idx)
    val root = graft.text.TextIndex.phraseCurrentRoot(spark, idx)
    val buckets = spark.read.parquet(s"$root/stats")
      .select(col("buckets")).collect().head.getLong(0).toInt
    // deterministic probes off the index's own vocabulary-sized tables
    val hot = graft.text.TextIndex.topPhrase(spark, idx)
    val udf = spark.read.parquet(s"$root/udf")
    val byOcc = udf.orderBy(desc("n_occ"), col("tok"))
      .select("tok").limit(2).collect().map(_.getString(0))
    val rarest = udf.orderBy(asc("n_occ"), col("tok"))
      .select("tok").limit(1).collect().head.getString(0)
    val mixed = Seq(byOcc(0), byOcc(1), rarest)
    def cold(): Unit = {
      spark.catalog.clearCache()
      graft.Checkpoints.sweepExceptRetained(spark.sparkContext)
      System.gc()
    }
    def time(body: => Long): (Double, Long) = {
      cold()
      val t0 = System.nanoTime()
      val n = body
      ((System.nanoTime() - t0) / 1e9, n)
    }
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    if (sys.env.contains("PB_EXPLAIN")) {
      System.err.println("=== mixed NATURAL ===")
      System.err.println(chain(spark, root, buckets, mixed)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      System.err.println("=== mixed RAREST-FIRST ===")
      System.err.println(graft.text.TextIndex.phraseSearch(spark, idx, mixed)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    }
    val cases = Seq("hot" -> hot, "mixed" -> mixed)
    val out = cases.flatMap { case (label, probe) =>
      val runs = (1 to passes).map { _ =>
        val (tN, nN) = time(chain(spark, root, buckets, probe).count())
        val (tR, nR) = time(
          graft.text.TextIndex.phraseSearch(spark, idx, probe).count())
        assert(nN == nR,
          s"order changed the answer for $probe: natural=$nN rarest=$nR")
        (tN, tR, nR)
      }
      Seq(
        s""""${label}_natural":${f"${med(runs.map(_._1))}%.3f"}""",
        s""""${label}_rarest_first":${f"${med(runs.map(_._2))}%.3f"}""",
        s""""${label}_docs":${runs.head._3}""")
    }
    println(s"""{"metric":"phrasebench","probe_hot":"${hot.mkString(" ")}","probe_mixed":"${mixed.mkString(" ")}",${out.mkString(",")},"dir":"$dir","protocol":"cold-median-of-$passes"}""")
    spark.stop()
  }
}
