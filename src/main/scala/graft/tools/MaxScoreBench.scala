package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** SCALING.md meter for the MaxScore cost gate (round 10 — the round-9
  * verdict's "gated optimization never fires at rehearsal scale"): builds
  * a corpus SHAPED like the queries the gate exists for — four rare
  * informative terms (df ≈ 200) beside one stopword-class hot term
  * (df ≈ 45% of docs) — at a document count where the query terms'
  * absolute posting mass crosses the 5M gate, then times
  * `bm25Indexed(prune = true)` against `prune = false` on the SAME index
  * and asserts the answers are byte-identical (the gate picks between two
  * identical-answer plans; exactness is never at stake).
  *
  * Why this shape: with rare essential lists the candidate set stays
  * under the literal-IN pushdown limit, so the hot term's multi-million-
  * row list is FILTERED AT THE SCAN to candidate docs instead of being
  * scored and ranked wholesale — the classic MaxScore win. (With
  * balanced mid-size lists the candidate set overflows into the
  * semi-join branch and the probe only breaks even — which is exactly
  * why the gate also requires df skew.)
  *
  * `runMain graft.tools.MaxScoreBench <workDir> [nDocs]` — fixture and
  * index persist under workDir and are reused across runs; pass a fresh
  * dir to rebuild. Emits one JSON line. */
object MaxScoreBench {
  def main(args: Array[String]): Unit = {
    val work = args(0)
    val nDocs = args.lift(1).map(_.toLong).getOrElse(12000000L)
    // probe width (round 14): on a heavy-tailed (Zipf) vocabulary the
    // derived top-nq terms span df ranks whose ratio grows with nq, so a
    // WIDER probe develops the natural skew the gate requires — the
    // regime knob for measuring the prune on the zipf fixtures
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

    val docsDir = s"$work/docs"
    val idx = s"$work/idx"
    val fs = new org.apache.hadoop.fs.Path(work)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def exists(p: String) =
      fs.exists(new org.apache.hadoop.fs.Path(p))

    if (!exists(s"$docsDir/documents.parquet/_SUCCESS")) {
      // rare terms: one doc in 60k each (~200 at 12M). hot term: 45% of
      // docs (non-ubiquitous — stays a QUERY term, unlike the f* fillers
      // at 75% df that the derivation's ubiquity rule drops). Zipf in
      // miniature, sized so sum(df of the 5 query terms) > the 5M gate.
      val rareMod = math.max(nDocs / 200L, 1L)
      spark.range(nDocs).select(
          col("id").as("doc_id"),
          concat_ws(" ",
            when(col("id") % 100 < 45, lit("alpha")),
            when(col("id") % rareMod === 0, lit("beta")),
            when(col("id") % rareMod === 1, lit("gamma")),
            when(col("id") % rareMod === 2, lit("delta")),
            when(col("id") % rareMod === 3, lit("epsi")),
            concat(lit("f"), pmod(col("id"), lit(4))),
            concat(lit("f"), pmod(col("id") + 1, lit(4))),
            concat(lit("f"), pmod(col("id") + 2, lit(4)))).as("text"),
          lit("en").as("lang"), lit("gen").as("source"))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .write.mode("overwrite").parquet(s"$docsDir/documents.parquet")
    }
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f
      graft.Checkpoints.sweepExceptRetained(spark.sparkContext)
      spark.catalog.clearCache(); System.gc()
      (System.nanoTime() - t0) / 1e9
    }
    var buildSec = 0.0
    if (!exists(s"$idx/stats/_SUCCESS"))
      buildSec = time { TextIndex.write(spark, docsDir, idx) }

    // the SHIPPED decision, not a reproduction (round 14 — the
    // reproduced arithmetic drifted from the decision the moment the
    // candidate-mass guard landed): empty non-essential set = plain plan
    val qts = TextIndex.deriveQueryTerms(spark, idx, nq)
    val dfSum = qts.map(_._2).sum
    val root = TextIndex.currentRoot(spark, idx)
    val (nd, nt) = TextIndex.readStatsAt(spark, root)
    val gateFired = TextIndex.nonEssentialTerms(spark, root, nd, nt,
      TextIndex.deriveQueryTermsAt(spark, root, nd, nq), 20).nonEmpty
    def run(prune: Boolean) =
      TextIndex.bm25Indexed(spark, idx, nq = nq, prune = prune)
    // answers must be byte-identical under both gate outcomes
    val a = run(prune = true).collect().map(_.toSeq).toSeq
    val b = run(prune = false).collect().map(_.toSeq).toSeq
    require(a == b, s"gated answer diverged from unpruned:\n$a\nvs\n$b")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    // FULL memo eviction before every timed pass (round-10 review
    // finding): the equality check above built the essential-list session
    // memo, and sweepExceptRetained deliberately spares memo blocks — an
    // uneVicted gated pass would ride a warm memo while the unpruned
    // passes re-scan, overstating the win. Each timed pass pays the same
    // cold build-then-ride shape the Bench protocol enforces.
    def cold(): Unit = {
      graft.text.TextIndex.evictMemos(spark)
      graft.Checkpoints.evictSessionMemos(spark)
      graft.Checkpoints.sweepExceptRetained(spark.sparkContext)
      spark.catalog.clearCache(); System.gc()
    }
    val gated = (1 to passes).map { _ => cold(); time(noop(run(prune = true))) }
    val unpruned = (1 to passes).map { _ => cold(); time(noop(run(prune = false))) }
    println(
      f"""{"metric":"maxscore_rehearsal","n_docs":$nDocs,"query_df_sum":$dfSum,"gate_fired":$gateFired,"gated_sec":${med(gated)}%.3f,"unpruned_sec":${med(unpruned)}%.3f,"index_build_sec":$buildSec%.3f,"identical":true,"terms":${qts.map(q => "\"" + q._1 + "\":" + q._2).mkString("{", ",", "}")}}""")
    spark.stop()
  }
}
