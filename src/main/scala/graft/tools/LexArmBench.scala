package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** SCALING.md meter for the heavy-tail LEXICAL ARM's floor (round 16 —
  * the r15 verdict's task #5): q138's fused cost at zipf 1000× is
  * carried by the posting-pruned BM25 arm (5.75 of 6.61 s), so before
  * reaching for the next lever the arm's cost must be ATTRIBUTED —
  * which fraction is the vocabulary-sized derivation (df-table
  * TakeOrdered), which is the probe terms' posting-list scan, and what
  * a LAYOUT change alone could buy.
  *
  * Arms, cold median-of-N on one prebuilt index per fixture:
  *  - `derive_sec`  — stats read + the top-nq df-table derivation (the
  *    per-query driver actions; vocabulary mass);
  *  - `scan_sec`    — the probe terms' pruned posting rows, scanned to
  *    a noop sink (the IO floor of any reader over this layout);
  *  - `full_sec`    — the shipped `bm25Indexed` (scan + score + rank);
  *  - `impact_sec`  — the SAME query against an IMPACT-ORDERED copy of
  *    the postings (rows sorted (tok, tf desc) within buckets — the
  *    Anh–Moffat layout): Spark's scan has no early-termination
  *    consumer, so this measures what layout alone buys TODAY (expected
  *    ≈ full_sec; a genuine impact reader also needs persisted impact
  *    scores, which go stale under append — df and avgdl drift — so it
  *    would break the append≡rebuild contract this engine keeps).
  * Answers are asserted byte-identical across layouts per pass.
  *
  * `runMain graft.tools.LexArmBench <fixtureDir> <workDir> [nq]` —
  * index persists under workDir and is reused; emits one JSON line. */
object LexArmBench {
  def main(args: Array[String]): Unit = {
    val dir = args(0); val work = args(1)
    val nq = args.lift(2).map(_.toInt).getOrElse(5)
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
    import graft.text.TextIndex

    val idx = s"$work/idx"
    val impactIdx = s"$work/idx_impact"
    val fs = new org.apache.hadoop.fs.Path(work)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def exists(p: String) = fs.exists(new org.apache.hadoop.fs.Path(p))
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f
      (System.nanoTime() - t0) / 1e9
    }
    var buildSec = 0.0
    if (!exists(s"$idx/stats/_SUCCESS"))
      buildSec = time { TextIndex.write(spark, dir, idx) }
    // impact-ordered COPY: same rows, same buckets, (tok, tf desc,
    // doc_id) order within partitions; dfreq/stats identical
    if (!exists(s"$impactIdx/stats/_SUCCESS")) {
      spark.read.parquet(s"$idx/postings")
        .repartition(col("tb"))
        .sortWithinPartitions(col("tok"), desc("tf"), col("doc_id"))
        .write.mode("overwrite").partitionBy("tb")
        .parquet(s"$impactIdx/postings")
      spark.read.parquet(s"$idx/dfreq")
        .repartition(col("tb"))
        .write.mode("overwrite").partitionBy("tb")
        .parquet(s"$impactIdx/dfreq")
      spark.read.parquet(s"$idx/stats").coalesce(1)
        .write.mode("overwrite").parquet(s"$impactIdx/stats")
    }
    val root = TextIndex.currentRoot(spark, idx)
    val (nd, nt) = TextIndex.readStatsAt(spark, root)
    val qts = TextIndex.deriveQueryTerms(spark, idx, nq)
    val dfSum = qts.map(_._2).sum
    val vocab = spark.read.parquet(s"$root/dfreq").count()
    val probeRows = spark.read.parquet(s"$root/postings")
      .filter(col("tb").isin(qts.map(_._3).distinct: _*))
      .filter(col("tok").isin(qts.map(_._1): _*)).count()
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def cold(): Unit = {
      TextIndex.evictMemos(spark)
      graft.Checkpoints.evictSessionMemos(spark)
      graft.Checkpoints.sweepExceptRetained(spark.sparkContext)
      spark.catalog.clearCache(); System.gc()
    }
    // answers byte-identical across layouts (scan order is layout, not
    // semantics — the compactVersion argument)
    val a = TextIndex.bm25Indexed(spark, idx, nq = nq).collect()
      .map(_.toSeq).toSeq
    val b = TextIndex.bm25Indexed(spark, impactIdx, nq = nq).collect()
      .map(_.toSeq).toSeq
    require(a == b, "impact-ordered layout changed the bm25 answer")
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    val derive = (1 to passes).map { _ => cold(); time {
      val r = TextIndex.currentRoot(spark, idx)
      val (d, t) = TextIndex.readStatsAt(spark, r)
      require(d > 0 && t > 0)
      require(TextIndex.deriveQueryTerms(spark, idx, nq).size == nq)
    } }
    val scan = (1 to passes).map { _ => cold(); time {
      noop(spark.read.parquet(s"$root/postings")
        .filter(col("tb").isin(qts.map(_._3).distinct: _*))
        .filter(col("tok").isin(qts.map(_._1): _*)))
    } }
    val full = (1 to passes).map { _ => cold(); time {
      noop(TextIndex.bm25Indexed(spark, idx, nq = nq))
    } }
    val impact = (1 to passes).map { _ => cold(); time {
      noop(TextIndex.bm25Indexed(spark, impactIdx, nq = nq))
    } }
    println(
      f"""{"metric":"lex_arm_floor","fixture":"$dir","n_docs":$nd,"vocab_terms":$vocab,"probe_df_sum":$dfSum,"probe_posting_rows":$probeRows,"derive_sec":${med(derive)}%.3f,"scan_sec":${med(scan)}%.3f,"full_sec":${med(full)}%.3f,"impact_layout_sec":${med(impact)}%.3f,"index_build_sec":$buildSec%.3f,"identical_across_layouts":true,"terms":${qts.map(q => "\"" + q._1 + "\":" + q._2).mkString("{", ",", "}")}}""")
    spark.stop()
  }
}
