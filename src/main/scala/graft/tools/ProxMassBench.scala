package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the round-15 PROBE-WIDE position-mass gate
  * ([[graft.text.TextIndex.proximitySearchGated]]'s `maxPosShare`) in the
  * regime it exists for: a WIDE m-term probe whose terms each pass the
  * per-term df-share gate but whose SUMMED position mass is corpus-scale.
  * The probe is derived from the index's own vocabulary table — the m
  * largest-n_occ terms whose df share is under the per-term gate AND
  * whose df exceeds the literal-pushdown bound (so the semi-join regime,
  * the one the new gate prices, is actually taken). Three timings per
  * pass, cold:
  *
  *  - `refused_s` — the shipped gate decision (default maxPosShare):
  *    expected to REFUSE at vocabulary-lookup cost;
  *  - `paid_s` — the same probe deliberately accepted
  *    (maxPosShare = 1.0): what the gate saves;
  *  - `ungated_s` — [[graft.text.TextIndex.proximitySearchAll]], the
  *    oracle path the refusal routes users toward.
  *
  * The paid and ungated answers are asserted equal per pass (the gate
  * picks between identical-answer plans; acceptance is the only thing a
  * threshold changes).
  *
  * Usage: ProxMassBench <sfDir> <idxPath> [m=16] [slop=3]
  *    or: ProxMassBench synth <workDir> [nDocs=2000000] [m=24]
  * (builds the phrase index if absent; SPARK_GRAFT_PASSES overrides the
  * cold median-of-3)
  *
  * The `synth` form generates the regime the scaled text fixtures cannot
  * express (measured on tmp/zipf10: every df-acceptable term there is a
  * tail salt, and ALL of them together carry <1% of corpus positions —
  * P(doc contains rank r) collapses the df gate far up the tail, so no
  * accepted probe is position-heavy): m MID-DF, POSITION-HEAVY terms —
  * each `b_i` in 1/m of the docs (df share ~4% at m=24, comfortably
  * accepted per-term) with 32 occurrences per containing doc (the
  * boilerplate/code-token shape), over a ubiquitous filler vocabulary
  * the derivations exclude. The m-probe's summed position mass is ~44%
  * of the corpus — each term fine, the probe corpus-scale, exactly the
  * inequality half the round-15 gate adds. 1 in 10⁴ docs carries all m
  * terms consecutively, so the answer is small-but-nonempty under
  * slop = m (span m−1 qualifies) and the equality assertion bites. */
object ProxMassBench {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: ProxMassBench <sfDir> <idxPath> [m] [slop]" +
        "\n   or: ProxMassBench synth <workDir> [nDocs] [m]")
      sys.exit(2)
    }
    val synth = args(0) == "synth"
    val (dir, idx) =
      if (synth) (s"${args(1)}/docs", s"${args(1)}/idx")
      else (args(0), args(1))
    val nDocsSynth = args.lift(2).map(_.toLong)
      .getOrElse(2000000L) // only read in synth mode
    val m = if (synth) args.lift(3).map(_.toInt).getOrElse(24)
      else args.lift(2).map(_.toInt).getOrElse(16)
    val slop = if (synth) m // span m−1 over the consecutive window
      else args.lift(3).map(_.toInt).getOrElse(3)
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
    if (synth &&
        !fs.exists(new org.apache.hadoop.fs.Path(
          s"$dir/documents.parquet/_SUCCESS"))) {
      val fill = (0 until 40).map(j => s"f$j").mkString(" ")
      val window = (0 until m).map(i => s"b$i").mkString(" ")
      spark.range(nDocsSynth).select(
          col("id").as("doc_id"),
          concat_ws(" ",
            lit(fill),
            expr(s"array_join(transform(sequence(1, 32), " +
              s"x -> concat('b', id % $m)), ' ')"),
            when(col("id") % 10000 === 0, lit(window))).as("text"))
        .withColumn("lang", lit("en")).withColumn("source", lit("s"))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .repartition(32)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      System.err.println(s"[proxmass] synth fixture: $nDocsSynth docs, " +
        s"$m mid-df heavy terms")
    }
    if (!fs.exists(new org.apache.hadoop.fs.Path(idx, "stats")))
      graft.text.TextIndex.writePhraseIndex(spark, dir, idx)
    val root = graft.text.TextIndex.phraseCurrentRoot(spark, idx)
    val nDocs = spark.read.parquet(s"$root/stats")
      .select(col("n_docs")).collect().head.getLong(0)
    // the worst probe the OLD (per-term-only) gate accepts: every term
    // individually under the df-share gate, collectively heavy, and all
    // past the pushdown bound so the semi-join regime binds
    val maxDfShare = 0.05
    val pushdown = 1024L
    val udf = spark.read.parquet(s"$root/udf")
      .filter(col("df") > pushdown &&
        col("df") <= lit(maxDfShare * nDocs))
      .orderBy(desc("n_occ"), col("tok"))
      .select(col("tok"), col("df"), col("n_occ")).limit(m).collect()
    require(udf.length == m,
      s"fixture has only ${udf.length} mid-df terms past the pushdown " +
        s"bound (need $m) — probe a bigger tier or lower m")
    // hottest anchor LAST (the proximity anchor convention); rarest-df
    // terms first so the derivation is deterministic
    val probe = udf.sortBy(r => (r.getLong(2), r.getString(0)))
      .map(_.getString(0)).toSeq
    val probePos = udf.map(_.getLong(2)).sum
    val totalPos = spark.read.parquet(s"$root/udf")
      .agg(coalesce(sum(col("n_occ")), lit(0L))).collect().head.getLong(0)
    System.err.println(f"[proxmass] m=$m probe position share " +
      f"${probePos.toDouble / totalPos}%.3f (df shares all <= $maxDfShare)")
    require(probePos.toDouble / math.max(1L, totalPos) > 0.25,
      f"derived probe carries only ${probePos.toDouble / totalPos}%.3f " +
        "of corpus positions — under the default maxPosShare the gate " +
        "would rightly accept; raise m to build a genuinely heavy probe")
    def cold(): Unit = {
      spark.catalog.clearCache()
      graft.Checkpoints.sweepExceptRetained(spark.sparkContext)
      System.gc()
    }
    def time[T](body: => T): (Double, T) = {
      cold()
      val t0 = System.nanoTime()
      val r = body
      ((System.nanoTime() - t0) / 1e9, r)
    }
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    val runs = (1 to passes).map { _ =>
      val (tRef, refused) = time {
        try {
          graft.text.TextIndex.proximitySearchGated(spark, idx, probe, slop)
            .count(); false
        } catch { case e: IllegalArgumentException =>
          require(e.getMessage.contains("summed position mass"),
            s"expected the mass gate, got: $e")
          true
        }
      }
      val (tPaid, nPaid) = time {
        graft.text.TextIndex.proximitySearchGated(spark, idx, probe, slop,
          maxPosShare = 1.0).count()
      }
      val (tUn, nUn) = time {
        graft.text.TextIndex.proximitySearchAll(spark, idx, probe, slop)
          .count()
      }
      assert(nPaid == nUn,
        s"acceptance changed the answer: paid=$nPaid ungated=$nUn")
      (tRef, refused, tPaid, tUn, nUn)
    }
    require(runs.forall(_._2),
      "the shipped gate ACCEPTED the wide probe — the mass share " +
        "derivation above guarantees it exceeds the default bound; " +
        "investigate before trusting the refused_s column")
    println(f"""{"metric":"proxmassbench","m":$m,"slop":$slop,"probe_pos_share":${probePos.toDouble / math.max(1L, totalPos)}%.4f,"refused_s":${med(runs.map(_._1))}%.3f,"paid_s":${med(runs.map(_._3))}%.3f,"ungated_s":${med(runs.map(_._4))}%.3f,"n_docs_hit":${runs.head._5},"dir":"$dir","protocol":"cold-median-of-$passes"}""")
    spark.stop()
  }
}
