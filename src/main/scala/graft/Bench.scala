package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs the full query inventory on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  *
  * Each query is forced through full materialization with a noop sink
  * (counts would let Catalyst prune the projections we want measured).
  *
  * Since round 7 the suite runs THREE full passes and reports the
  * per-query MEDIAN (plus min/max spread): this box's measured ±14%
  * same-binary jitter (BENCH_NOTES.md) made single-run per-query deltas
  * unjudgeable two rounds in a row. Within a pass, suite order and the
  * session-memo lifecycle are exactly the round-6 protocol (memo builders
  * pay the build, consumers ride it); BETWEEN passes every memo is
  * evicted (cache maps + retained blocks), so each pass replays the same
  * cold-build-then-ride shape rather than riding the previous pass's
  * state. Passes 2–3 run on a warmer JIT than a single-pass round-6 run —
  * medians land slightly below r6 numbers for that reason alone; the
  * per-pass totals are recorded in the JSON so the protocol shift stays
  * visible.
  */
object Bench {
  private val Passes = 3

  /** FIXED CPU-BOUND CALIBRATION PROBE (round 12 — the round-11 verdict's
    * bench-defensibility task): a constant synthetic aggregate over
    * generated-in-memory data — zero IO, zero shuffle beyond the 1-row
    * final, deterministic work (48M xxhash64 rows across 32 partitions) —
    * timed before pass 1 and after every pass. Its wall time moves ONLY
    * with box load, so round-over-round drift in the suite total can be
    * attributed in-band: the JSON carries the raw total (the driver
    * contract, unchanged), the probe samples, and a LOAD-NORMALIZED total
    * (raw × ref/median-probe). The normalization is diagnostic — exponent
    * tiers in SCALING.md remain the primary scale signal (BENCH_NOTES.md
    * documents both). */
  private def calibrationProbe(spark: SparkSession): Double = {
    import org.apache.spark.sql.functions._
    val t0 = System.nanoTime()
    // pmod bounds the addends: a raw sum of full-range hashes overflows
    // Long under ANSI mode (the hash per row stays the work). ~1.3 s
    // quiet — long enough that scheduler jitter averages out to a few
    // percent, short enough (4 samples ≈ 5 s) to be negligible against
    // the suite
    spark.range(0L, 1536L * 1000 * 1000, 1L, 32)
      .agg(sum(pmod(xxhash64(col("id")), lit(1000000L)))).collect()
    (System.nanoTime() - t0) / 1e9
  }

  /** The probe's wall time on THIS box measured quiet (12 samples over
    * three runs on an idle-as-available box, 2026-08-15: 0.86–1.02 s,
    * median 0.94 — BENCH_NOTES.md records the measurement): the
    * reference the load factor is computed against. A different box
    * needs re-baselining, which is the point — the probe makes the box
    * visible instead of assumed. SPARK_GRAFT_CAL_REF overrides the
    * compiled-in value for foreign boxes, and the JSON carries
    * `calibration_ref_source` so a normalized_total computed against the
    * wrong box's reference is visibly unreliable instead of silently
    * wrong (round-12 ADVICE). */
  private val DefaultCalibrationRefS = 0.94
  private val (calibrationRefS, calibrationRefSource) =
    sys.env.get("SPARK_GRAFT_CAL_REF") match {
      // VALIDATED, not bare toDouble (round-13 review finding): a typo'd
      // value would otherwise kill the whole bench in a static
      // initializer (opaque ExceptionInInitializerError), and a zero or
      // negative one would silently yield load_factor <= 0 while the JSON
      // still claimed the env as authoritative — fall back LOUDLY in the
      // source tag instead.
      case Some(v) => v.toDoubleOption.filter(_ > 0.0) match {
        case Some(d) => (d, "env:SPARK_GRAFT_CAL_REF")
        case None =>
          // SANITIZED before it rides the hand-built JSON line (round-14
          // ADVICE finding): a raw env value carrying '"', '\' or a
          // control char would make the driver artifact line unparseable —
          // the exact parsed:null failure class the compact summary line
          // exists to prevent. Dropping the offending chars is enough:
          // this string is diagnostic, not data.
          val safe = v.filter(c => c >= ' ' && c != '"' && c != '\\').take(64)
          (DefaultCalibrationRefS,
            s"compiled-in (IGNORED invalid SPARK_GRAFT_CAL_REF='$safe')")
      }
      case None => (DefaultCalibrationRefS, "compiled-in (re-baseline on a different box)")
    }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkTuning.tuned(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: touch every table once (parquet footer/codegen/JIT paths) so
    // the first timed query doesn't absorb one-time session costs
    graft.sources.Tables.names.filterNot(_ == "events").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count() catch { case _: Throwable => () }
    }
    try graft.sources.Tables.events(spark, sfDir).count() catch { case _: Throwable => () }
    // exercise the hot codegen paths once (json/regex/hash/string/window JIT).
    // 400k rows, not 10k: C2 promotion of the UTF8String/Jackson/regex paths
    // needs ~10^5 invocations — at 10k the one-time compile cost floated onto
    // whichever early timed query first hit those paths (measured: a 3–6 s
    // blob landing on q15 or q19 at random between otherwise-identical runs)
    try {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      spark.range(400000)
        .withColumn("s", md5(col("id").cast("string")))
        .withColumn("j", get_json_object(concat(lit("{\"k\":"), col("id"), lit("}")), "$.k"))
        .withColumn("r", regexp_extract_all(col("s"), lit("[a-f]+"), lit(0)))
        .withColumn("u", upper(substring(concat(col("s"), lit("#"), col("s")), 1, 8)))
        .withColumn("lk", col("s").like("%ab%"))
        .withColumn("sp", split(col("s"), "a"))
        .withColumn("w", row_number().over(Window.partitionBy(col("id") % 7).orderBy("id")))
        .write.format("noop").mode("overwrite").save()
    } catch { case _: Throwable => () }
    // SPARK_GRAFT_BENCH_ONLY=q74,q31 narrows the suite for local iteration
    // (prefix match); unset = the full inventory, what the driver runs
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    val names = SparkEntry.queries.toSeq.sortBy(_._1).map(_._1)
      .filter(n => only.forall(_.exists(n.startsWith)))
    val calibrations = scala.collection.mutable.ArrayBuffer.empty[Double]
    // warm the probe's own codegen path once, then take the pre-suite
    // sample (outside every timed region, like the sweeps)
    calibrationProbe(spark)
    calibrations += calibrationProbe(spark)
    val passes: Seq[Map[String, (Double, Boolean)]] = (1 to Passes).map { _ =>
      val pass = names.map { name =>
        val fn = SparkEntry.queries(name)
        // guide §1.5: label every query's jobs so a UI/event-log read of a
        // bench run attributes stages without cross-referencing timestamps
        spark.sparkContext.setJobDescription(s"bench: $name")
        val t0 = System.nanoTime()
        val failed =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); false }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}"); true
          }
        spark.sparkContext.setJobDescription(null)
        val elapsed = (System.nanoTime() - t0) / 1e9
        // session hygiene: queries that localCheckpoint pin RDD blocks for the
        // life of the session; across ~60 queries that accumulates into
        // storage-memory pressure + GC thrash that taxes every LATER query
        // (measured round 2: q48 1.3s isolated vs 11.2s late in the run).
        // Release everything between queries so each timing is the query's own.
        // blocking: the sweep runs OUTSIDE the timed region, so waiting here
        // costs no query time — async eviction could overlap the next query's
        // timing and re-introduce the cross-query pollution this prevents.
        // Memo-retained blocks (ccLabels label table, see Checkpoints.retain)
        // survive the sweep: their lineage is truncated, so releasing them
        // would fail every later cache hit instead of recomputing it.
        Checkpoints.sweepExceptRetained(spark.sparkContext)
        spark.catalog.clearCache()
        // pay accumulated GC debt here, outside any timed region — otherwise a
        // major collection strikes inside whichever query tips the heap over
        // (measured as a 3–9 s blob landing on a random early query)
        System.gc()
        (name, (elapsed, failed))
      }.toMap
      // between passes: full memo eviction (cache maps + retained blocks),
      // so the next pass pays the same cold memo builds this one did
      graft.text.Dedup.evictMemos(spark)
      graft.vector.Similarity.evictMemos(spark)
      graft.text.TextIndex.evictMemos(spark)
      graft.text.DocStore.evictMemos(spark)
      graft.vector.CellIndex.evictMemos(spark)
      Checkpoints.evictSessionMemos(spark)
      Checkpoints.sweepExceptRetained(spark.sparkContext)
      System.gc()
      // post-pass load sample (outside every timed region)
      calibrations += calibrationProbe(spark)
      pass
    }
    def med3(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    val results = names.map { name =>
      val samples = passes.map(_(name)._1)
      val failed = passes.exists(_(name)._2)
      (name, med3(samples), samples.min, samples.max, failed)
    }
    val qs = results.map { case (k, m, _, _, _) => "\"" + k + f"""":$m%.3f""" }
      .mkString("{", ",", "}")
    val spread = results
      .map { case (k, _, lo, hi, _) =>
        "\"" + k + f"""":{"min":$lo%.3f,"max":$hi%.3f}""" }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, _, _, true) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val passTotals = passes.map(p => f"${p.values.map(_._1).sum}%.3f").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    // audit split (round 9): the known-linear auditor forms are reported
    // as their own subtotal so the serving-path suite number reflects
    // what production would run; `value` stays the FULL total — the
    // driver contract is unchanged
    val auditTotal = results.filter(r => SparkEntry.auditQueries(r._1)).map(_._2).sum
    val servingTotal = total - auditTotal
    // load normalization (round 12): raw totals stay the driver contract;
    // the normalized twin divides out measured box load so round-over-round
    // comparison is defensible against a busy box (BENCH_NOTES.md)
    val calMed = calibrations.sorted.apply(calibrations.size / 2)
    val loadFactor = calMed / calibrationRefS
    val normTotal = if (loadFactor > 0) total / loadFactor else total
    val calStr = calibrations.map(c => f"$c%.3f").mkString("[", ",", "]")
    val line =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir","protocol":"median-of-$Passes","pass_totals":$passTotals,"serving_total":$servingTotal%.3f,"audit_total":$auditTotal%.3f,"audit_queries":${SparkEntry.auditQueries.toSeq.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")},"calibration_s":$calStr,"calibration_ref_s":$calibrationRefS%.3f,"calibration_ref_source":"$calibrationRefSource","load_factor":$loadFactor%.3f,"normalized_total":$normTotal%.3f,"spread":$spread}"""
    // the full line first, then a COMPACT summary line LAST (round-10; the
    // round-9 driver artifact recorded parsed:null): the per-query map has
    // outgrown tail-window scrapers — a consumer keeping only the last few
    // KB of output would see the full line's END but never its start. The
    // compact line carries the driver-contract scalars and fits any
    // reasonable tail; the full per-query data is in the sidecar file.
    val compact =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","sf":"$sfDir","protocol":"median-of-$Passes","serving_total":$servingTotal%.3f,"audit_total":$auditTotal%.3f,"load_factor":$loadFactor%.3f,"normalized_total":$normTotal%.3f,"n_queries":${results.size},"errors":$errs,"full":"see SPARK_GRAFT_BENCH_OUT sidecar"}"""
    // round 17 (the r16 verdict's task #2 — driver-visible per-query
    // data): the full line's `queries` map outgrows a ~2000-char tail
    // window (PERF_r16 recorded n_common 0), and 168 full query names
    // alone exceed that window at ANY value precision, so the in-band
    // recovery line is POSITIONAL: every query's median in integer
    // CENTISECONDS, ordered by lexicographic query name — the same order
    // the full line's `queries` map and SparkEntry.queries enumerate, so
    // a consumer zips names to values without ambiguity. All 168 rows fit
    // in ~700 chars and survive the tail beside the compact summary.
    // Additions only: the full and compact lines are unchanged.
    val pqCs = results.map { case (_, m, _, _, _) => Math.round(m * 100).toString }
      .mkString("[", ",", "]")
    val pqLine =
      s"""{"metric":"per_query_cs","unit":"centisec","order":"lexicographic_query_names","n":${results.size},"v":$pqCs}"""
    println(line)
    println(pqLine)
    println(compact)
    // belt-and-braces delivery: build.sbt's `outputStrategy := StdoutOutput`
    // keeps the stdout lines unprefixed under `sbt runMain`, but a consumer
    // invoking us differently (logger config, fork wrapper) may still wrap
    // stdout — so both lines also go to stderr and the full one to a file.
    // A scraper should take the LAST parseable line of whichever stream it
    // reads (merged streams see the lines twice by design).
    System.err.println(line)
    System.err.println(pqLine)
    System.err.println(compact)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (line + "\n").getBytes("UTF-8"))
    catch { case e: Throwable => System.err.println(s"[bench] write $outPath: $e") }
    spark.stop()
  }
}
