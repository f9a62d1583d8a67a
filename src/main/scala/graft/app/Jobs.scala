package graft.app

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.analytics.Enrich
import graft.ingest.Validation
import graft.model.Schemas
import graft.quality.{Expectations, Gate, SuiteCompiler}
import graft.streaming.Streaming

/** Application wiring (SURVEY §7.1 `app/`): the two executable jobs the
  * reference's docker topology declares but never implements —
  * the Spark streaming job (`spark/streaming/stream_processor.py`, 0 bytes)
  * and the hourly batch + quality-gated load
  * (`expectations.py:187-194`).
  */
object Jobs {

  def session(appName: String, master: String = "local[*]"): SparkSession = {
    val s = SparkSession.builder()
      .master(master)
      .appName(appName)
      .withExtensions(new graft.functions.GraftExtensions) // graft_dot in SQL

      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      // RocksDB-backed state: session/dedup/CDC state stays off-heap and
      // spillable at the 100 TB north star (SURVEY 7.4.6)
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

/** Streaming ingestion: JSONL drop-dir (Kafka stand-in — swap the source
  * format for `kafka` + `subscribe` in production) → validate → bronze
  * (gzip JSON, y/m/d/h partitions) + quarantine, with a 30 s trigger
  * mirroring the reference's flush interval (lake_writer.py:111).
  *
  * Usage: IngestJob <inDir> <bronzeDir> <quarantineDir> <checkpointDir>
  */
object IngestJob {

  /** The job's full pipeline from a drop-dir to (bronze, quarantine)
    * queries — the testable seam (the end-to-end spec calls this with temp
    * dirs and real files; main adds only session + lifecycle). A short
    * `trigger` keeps the spec fast; production keeps the 30 s default. */
  def wire(spark: org.apache.spark.sql.SparkSession, inDir: String,
      bronzeDir: String, quarantineDir: String, checkpointDir: String,
      trigger: String = "30 seconds"):
      (org.apache.spark.sql.streaming.StreamingQuery,
       org.apache.spark.sql.streaming.StreamingQuery) = {
    val raw = spark.readStream
      .format("text")
      // S4 count cap, precisely: bounds how many files a micro-batch ADMITS
      // (excess defers to the next batch) — the latency bound is the 30 s
      // trigger; Spark has no count-triggered early flush, so this is a
      // batch-SIZE guarantee, not lake_writer.py:111's flush-at-100. Here
      // on the file-replay source a size cap is the right default: replay
      // of a deep backlog proceeds in bounded bites instead of one giant
      // first batch. (Kafka analogue: maxOffsetsPerTrigger, opt-in.)
      .option("maxFilesPerTrigger", 100)
      .load(inDir)
      .select(col("value").cast("binary").as("value"))

    val (valid, dead) = Streaming.splitParsed(raw, "ecommerce.user_clicks").get

    // in-stream counters (T6+): per-batch rows + event-time span ride the
    // bronze plan; the ERROR tally (the reference's consumer error counter)
    // rides the quarantine plan — valid rows are post-split, so counting
    // nulls there would be a permanently-green metric while quarantine
    // silently fills
    val bronze = Streaming.bronzeSink(Streaming.withIngestMetrics(valid),
      bronzeDir, s"$checkpointDir/bronze",
      trigger = Trigger.ProcessingTime(trigger))
    val quarantine = dead
      .observe("graft_quarantine", count(lit(1)).as("n_rows"))
      .writeStream
      .format("json")
      .option("path", quarantineDir)
      .option("checkpointLocation", s"$checkpointDir/quarantine")
      .trigger(Trigger.ProcessingTime(trigger))
      .start()
    (bronze, quarantine)
  }

  def main(args: Array[String]): Unit = {
    if (args.length < 4) {
      System.err.println("usage: IngestJob <inDir> <bronzeDir> <quarantineDir> <checkpointDir>")
      sys.exit(2)
    }
    val Array(inDir, bronzeDir, quarantineDir, checkpointDir) = args.take(4)
    val spark = Jobs.session("graft-ingest")

    // T6 observability: lifecycle + progress of both sinks to the job log
    spark.streams.addListener(new Streaming.GraftQueryListener())

    val (bronze, quarantine) =
      wire(spark, inDir, bronzeDir, quarantineDir, checkpointDir)

    // T6 graceful shutdown: SIGTERM drains in-flight batches, then stops —
    // the reference's final-flush/close path (event_consumer.py:216-220).
    // Registered with the Hadoop shutdown manager ABOVE Spark's own hook
    // priority (Spark's hooks run inside one Hadoop hook at priority 30):
    // a plain JVM hook would race SparkContext.stop() and kill the queries
    // mid-drain. The explicit 150 s hook timeout matters as much as the
    // priority: Hadoop's default per-hook budget is 10 s, which would cancel
    // the drain (gracefulStop can legitimately take up to drain+stop budget
    // per query) and hand control to Spark's lower-priority hook mid-batch —
    // the exact race the priority ordering exists to prevent.
    org.apache.hadoop.util.ShutdownHookManager.get().addShutdownHook(
      new Runnable {
        override def run(): Unit = {
          Streaming.gracefulStop(bronze)
          Streaming.gracefulStop(quarantine)
        }
      }, 60, 150, java.util.concurrent.TimeUnit.SECONDS)

    // surface the FIRST failure of either sink: blocking on one query would
    // let the other die silently (listener logs aside)
    spark.streams.awaitAnyTermination()
  }
}

/** Streaming session/alert processor — the declared-but-empty
  * `spark/streaming/stream_processor.py` slot (0 bytes), implemented on the
  * modern state API: clicks → timer-based `transformWithState` session
  * tracker → date-partitioned session gold + sliding-window burst alerts;
  * inventory CDC → TWS latest-state upsert → state changelog + reorder
  * alerts (J7). RocksDB state store via [[Jobs.session]] — the TWS
  * operators REQUIRE it, which is why these pipelines live here and not in
  * IngestJob.
  *
  * Usage: StreamProcessorJob <clicksInDir> <cdcInDir> <outRoot> <checkpointRoot>
  * (file-replay drop-dirs as the Kafka stand-in, same contract as
  * IngestJob; dead-letter routing is IngestJob's concern — this job reads
  * the same raw feed and drops unparseable rows).
  *
  * Every pipeline is built by a `wire*` seam taking the parsed stream, so
  * the end-to-end spec drives the job's OWN plumbing through MemoryStream.
  */
object StreamProcessorJob {
  import org.apache.spark.sql.Dataset
  import org.apache.spark.sql.streaming.StreamingQuery

  /** Clicks (session_id, timestamp) → TWS session summaries → append-mode
    * parquet gold partitioned by session-start date (S6's layout for the
    * session table). */
  def wireSessions(clicks: DataFrame, outDir: String, checkpoint: String,
      gapMs: Long = 600000L, lateness: String = "10 minutes"): StreamingQuery = {
    val spark = clicks.sparkSession
    import spark.implicits._
    val sess = clicks
      .select(col("session_id").cast("string").as("session_id"),
        col("timestamp").cast("timestamp").as("ts"))
      .withWatermark("ts", lateness)
      .as[Streaming.SessionEvent]
    Streaming.sessionTrackerTws(sess, gapMs)
      .withColumn("date", to_date(timestamp_millis(col("start_ms"))))
      .writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpoint)
      .partitionBy("date")
      .outputMode("append")
      .start()
  }

  /** Clicks → sliding-window burst alerts (the live bot signal, q92's
    * streaming twin) → append-mode parquet. */
  def wireBurstAlerts(clicks: DataFrame, outDir: String,
      checkpoint: String): StreamingQuery =
    Streaming.burstAlerts(clicks)
      .writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .start()

  /** Parsed CDC envelopes → typed [[Streaming.CdcInput]] → TWS latest-state
    * upsert. Update-mode states flow through foreachBatch (columnar sinks
    * have no native update): each micro-batch appends its state deltas to
    * the changelog and its below-reorder-level rows to the alerts dir. */
  /** Parsed CDC envelope → typed [[Streaming.CdcInput]] (shared by the
    * changelog and lakehouse-table pipelines). */
  def typedCdc(cdc: DataFrame): Dataset[Streaming.CdcInput] = {
    val spark = cdc.sparkSession
    import spark.implicits._
    cdc.select(
        coalesce(col("after.product_id"), col("before.product_id")).as("product_id"),
        col("operation"), col("lsn"),
        col("after.stock_quantity").as("stock_quantity"),
        col("after.reorder_level").as("reorder_level"))
      .as[Streaming.CdcInput]
  }

  def wireInventory(cdc: DataFrame, changelogDir: String, alertsDir: String,
      tableRoot: String, checkpoint: String): StreamingQuery = {
    Streaming.cdcUpsertTws(typedCdc(cdc))
      .writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Streaming.CdcState], batchId: Long) =>
        val b = batch.persist()
        b.write.mode("append").parquet(changelogDir)
        Streaming.reorderAlerts(b).write.mode("append").parquet(alertsDir)
        // the versioned MERGE table rides the SAME stateful pipeline —
        // one CDC read, one TWS state store, three sinks (running it as
        // its own query would double the source consumption and RocksDB
        // state for identical deltas)
        Streaming.mergeSnapshot(b.toDF(), tableRoot, batchId)
        b.unpersist()
        ()
      }
      .start()
  }

  /** CDC → TWS latest-state → [[Streaming.lakehouseMergeSink]]: the
    * table-only wiring (same mergeEvolved operator q111/q113 verify;
    * read back via [[Streaming.readMergedTable]], optionally as-of a
    * batch id). Production `main` does NOT run this alongside
    * [[wireInventory]] — that would consume the CDC source and hold the
    * TWS state twice for identical deltas; the combined pipeline's
    * foreachBatch writes the table instead. This seam exists for
    * deployments that want ONLY the table, and for the focused
    * MERGE-lifecycle spec. */
  def wireInventoryTable(cdc: DataFrame, tableRoot: String,
      checkpoint: String): StreamingQuery =
    Streaming.lakehouseMergeSink(
      Streaming.cdcUpsertTws(typedCdc(cdc)), tableRoot, checkpoint)

  def main(args: Array[String]): Unit = {
    if (args.length < 4) {
      System.err.println(
        "usage: StreamProcessorJob <clicksInDir> <cdcInDir> <outRoot> <checkpointRoot>")
      sys.exit(2)
    }
    val Array(clicksIn, cdcIn, outRoot, ckRoot) = args.take(4)
    val spark = Jobs.session("graft-stream-processor")
    spark.streams.addListener(new Streaming.GraftQueryListener())
    def raw(dir: String): DataFrame = spark.readStream.format("text")
      .option("maxFilesPerTrigger", 100).load(dir)
      .select(col("value").cast("binary").as("value"))
    val (clicks, _) =
      Streaming.splitParsed(raw(clicksIn), "ecommerce.user_clicks").get
    val (cdcRows, _) =
      Streaming.splitParsed(raw(cdcIn), "ecommerce.inventory_cdc").get
    val queries = Seq(
      wireSessions(clicks, s"$outRoot/sessions", s"$ckRoot/sessions"),
      wireBurstAlerts(clicks, s"$outRoot/burst_alerts", s"$ckRoot/burst_alerts"),
      wireInventory(cdcRows, s"$outRoot/inventory_changelog",
        s"$outRoot/reorder_alerts", s"$outRoot/inventory_table",
        s"$ckRoot/inventory"))
    // same drain-then-stop shutdown contract as IngestJob (priority above
    // Spark's own hook, budget sized for the per-query drain)
    org.apache.hadoop.util.ShutdownHookManager.get().addShutdownHook(
      new Runnable {
        override def run(): Unit = queries.foreach(q => Streaming.gracefulStop(q))
      }, 60, 150, java.util.concurrent.TimeUnit.SECONDS)
    spark.streams.awaitAnyTermination()
  }
}

/** Hourly batch: bronze clicks → quality gate (≥0.95, expectations.py:437)
  * → silver (validated+deduplicated parquet) + gold (aggregations
  * partitioned by date, lake_writer.py:18-21) + ProcessedEvent output.
  * Aborts the load when the gate fails, exactly like the reference's
  * Redshift path (expectations.py:456-464).
  *
  * Usage: BatchJob <bronzeJsonDir> <silverDir> <goldDir> <processedDir>
  *                 [warehouseTarget]
  * `warehouseTarget` may be a `jdbc:` URL (the reference's Redshift shape)
  * or a path (parquet stand-in); either way the load runs behind its own
  * gate via Warehouse.gatedLoad.
  *
  * Cadence: this main is ONE hourly unit of work — idempotent (gated
  * overwrite per partition) and safe to re-run. The reference schedules the
  * equivalent stage hourly from Airflow (expectations.py:187-194); here the
  * scheduler is deliberately the caller's concern (cron / Airflow
  * `SparkSubmitOperator` / any orchestrator invoking `BatchJob.main` each
  * hour). Nothing inside the job assumes a cadence beyond reading whatever
  * bronze partitions have arrived since the last processed watermark.
  */
object BatchJob {
  def main(args: Array[String]): Unit = {
    if (args.length < 4) {
      System.err.println(
        "usage: BatchJob <bronzeJsonDir> <silverDir> <goldDir> <processedDir> [warehouseTarget]")
      sys.exit(2)
    }
    val Array(bronzeDir, silverDir, goldDir, processedDir) = args.take(4)
    val warehouseTarget = args.lift(4)
    val spark = Jobs.session("graft-batch")

    val clicks = spark.read.schema(Schemas.userClickSchema).json(bronzeDir)

    // gate BEFORE load (A9): one aggregate pass over the batch
    val nowS = java.time.Instant.now().getEpochSecond
    val gate = Gate.check(SuiteCompiler.run(clicks, Expectations.clickSuite(nowS)))
    if (!gate.passed) {
      System.err.println(
        f"[batch] quality gate FAILED (score=${gate.score}%.4f, " +
          s"failing=${gate.failing.mkString(",")}) — aborting load")
      spark.stop(); sys.exit(1)
    }

    // silver: validated + deduplicated columnar (lake_writer.py:13-16)
    val annotated = Validation.annotate(
      clicks, Validation.clickViolations(current_timestamp()), Validation.ClickK)
    val (valid, _) = Validation.split(annotated,
      Seq("missing_required", "bad_click_type", "bad_device_type"))
    valid.dropDuplicates("event_id")
      .write.mode("overwrite").parquet(silverDir)

    // gold: date-partitioned aggregations (lake_writer.py:18-21)
    val gold = valid
      .groupBy(date_format(col("timestamp"), "yyyy-MM-dd").as("date"),
        col("click_type"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"))
    gold.write.mode("overwrite").partitionBy("date").parquet(goldDir)

    // ProcessedEvent output stream shape (events.py:230-253)
    Enrich.processedEvents(clicks, current_timestamp())
      .write.mode("overwrite").parquet(processedDir)

    // warehouse: the Redshift load the reference's gate guards
    // (expectations.py:18-26,456-464), behind its own suite on the gold agg
    warehouseTarget.foreach { target =>
      import graft.quality.Warehouse
      val writer: Warehouse.Writer =
        if (target.startsWith("jdbc:")) Warehouse.jdbcWriter(target, "gold_daily")
        else df => df.write.mode("overwrite").parquet(target)
      val goldSuite = Expectations.Suite("gold_daily", Seq(
        Expectations.NotNull("date"), Expectations.NotNull("click_type"),
        Expectations.Between("n_events", 1, 1e12)))
      // judge/load the rows as PERSISTED to the lake — re-deriving `gold`
      // here would recompute the whole bronze scan + aggregation and could
      // diverge from what the gold write landed
      val report = Warehouse.gatedLoad(spark.read.parquet(goldDir), goldSuite, writer)
      if (!report.loaded) {
        System.err.println(
          f"[batch] warehouse gate FAILED (score=${report.gate.score}%.4f, " +
            s"failing=${report.gate.failing.mkString(",")}) — load aborted")
        spark.stop(); sys.exit(1)
      }
      println(f"[batch] warehouse loaded ${report.rows} rows " +
        f"(score=${report.gate.score}%.4f)")
    }

    println(f"[batch] gate passed (score=${gate.score}%.4f); wrote silver/gold/processed")
    spark.stop()
  }
}

/** Deployable LLM-data CURATION run — documents in, curated corpus out.
  * The q93 manifest is the DECISION record; this job executes it: the kept
  * documents land as a split-partitioned parquet corpus (the layout a
  * training loader reads), the manifest lands beside it as the audit
  * trail, and a per-reason summary makes the run's yield inspectable.
  * Downstream joins read the manifest AS PERSISTED (the BatchJob
  * warehouse rule): re-deriving it for the corpus join could diverge from
  * the audit trail a later purge request replays against. */
object CurationJob {
  final case class Report(total: Long, kept: Long, byReason: Map[String, Long])

  def run(spark: SparkSession, dir: String, outDir: String): Report = {
    graft.text.Curation.curationManifest(spark, dir)
      .write.mode("overwrite").parquet(s"$outDir/manifest")
    val manifest = spark.read.parquet(s"$outDir/manifest")
    graft.sources.Tables.documents(spark, dir)
      .join(manifest.filter(col("in_corpus") === 1)
        .select(col("doc_id"), col("split")), "doc_id")
      .write.mode("overwrite").partitionBy("split")
      .parquet(s"$outDir/corpus")
    val byReason = manifest.groupBy("reason")
      .agg(count(lit(1)).as("n")) // ≤5 reason rows: a bounded collect
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val report = Report(byReason.values.sum, byReason.getOrElse("kept", 0L), byReason)
    // self-describing audit rows (reason, n_docs) — totals are derivable,
    // no consumer-side string parsing
    spark.createDataFrame(report.byReason.toSeq.sorted)
      .toDF("reason", "n_docs")
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/report")
    report
  }

  /** BATCH-FOLD mode (round 12 — the round-11 verdict's task #5): fold
    * one batch into the at-rest screening artifacts (cluster index,
    * benchmark gram set — each behind its own committed-tag
    * short-circuit), then emit the batch's manifest rows from them —
    * ≡ the full [[run]] manifest over the union corpus RESTRICTED to
    * the batch (spec'd end-to-end; as-of caveat documented on
    * [[graft.text.Curation.curationManifestBatch]]). Per-batch cost:
    * the two artifact folds (batch-edge / batch-gram mass) + doc-local
    * screens — the corpus is never re-resolved. The manifest lands
    * under `outDir/manifest_batches/<tag>` so successive folds
    * accumulate beside the full run's `manifest`. */
  def runBatch(spark: SparkSession, batchDir: String, outDir: String,
      clusterIdx: String, benchGrams: String, tag: String,
      fence: () => Unit = graft.IndexVersions.NoFence): Report = {
    if (!graft.text.ClusterIndex.appliedTags(spark, clusterIdx).contains(tag))
      graft.text.ClusterIndex.append(spark, batchDir, clusterIdx, Some(tag),
        fence)
    graft.text.Curation.appendBenchGrams(spark, batchDir, benchGrams, tag,
      fence)
    // the per-batch manifest rides the SAME tag-committed staging+rename
    // protocol as the artifact folds above (round-12 ADVICE: a plain
    // overwrite could leave a partial manifest dir on crash, and a
    // concurrent reader could observe it mid-overwrite); a committed tag
    // short-circuits — the manifest is deterministic in (batch, artifacts),
    // so the existing dir IS this batch's manifest
    locally {
      import org.apache.hadoop.fs.Path
      val mRoot = new Path(outDir, "manifest_batches")
      val fs = mRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
      graft.IndexVersions.appendTaggedBatch(fs, mRoot, tag, "_SUCCESS",
        fence) { staging =>
        graft.text.Curation
          .curationManifestBatch(spark, batchDir, clusterIdx, benchGrams)
          .write.mode("overwrite").parquet(staging.toString)
      }
    }
    val manifest = spark.read.parquet(s"$outDir/manifest_batches/$tag")
    val byReason = manifest.groupBy("reason")
      .agg(count(lit(1)).as("n")) // ≤5 reason rows: a bounded collect
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    Report(byReason.values.sum, byReason.getOrElse("kept", 0L), byReason)
  }

  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: CurationJob <sfDir> <outDir>")
      sys.exit(2)
    }
    val spark = Jobs.session("graft-curation")
    val r = run(spark, args(0), args(1))
    println(s"[curation] kept ${r.kept}/${r.total} docs; reasons: " +
      r.byReason.toSeq.sorted.map { case (k, v) => s"$k=$v" }.mkString(", "))
    spark.stop()
  }
}

/** Target-domain SELECTION as a deployable job — the DSIR pair (q127
  * weights → q128 Gumbel-top-k resample) plus the q129 span screen,
  * composed the way a targeted-pretraining run consumes them: select k
  * docs that look like the target domain, refuse the ones whose
  * benchmark overlap exceeds the span budget (selection must never
  * launder contamination in), and write the selected corpus with its
  * per-doc provenance (importance, score, flagged span fraction) so the
  * training run can re-weigh or audit later.
  *
  * Usage: SelectionJob <sfDir> <outDir> [k=100] [maxFlaggedRatio=0.2]
  * Outputs: `<out>/selection` (per-doc provenance for the k candidates,
  * admitted flag), `<out>/corpus` (admitted docs, full text).
  */
object SelectionJob {
  final case class Report(candidates: Long, admitted: Long, refused: Long)

  def run(spark: SparkSession, dir: String, outDir: String,
      k: Int = 100, maxFlaggedRatio: Double = 0.2): Report = {
    import graft.text.{Curation, TextOps}
    val picked = TextOps.importanceResample(spark, dir, k)
    // spans cover only non-benchmark docs; benchmark docs themselves are
    // never candidates for a TRAINING corpus — refuse them outright
    val spans = Curation.contaminationSpans(spark, dir)
      .select(col("doc_id"), col("n_flagged"), col("flagged_ratio"))
    val selection = picked
      .join(spans, Seq("doc_id"), "left")
      // the shared Curation.isBenchmark DEFINITION, not an inference from
      // span-join nullness (a null flagged_ratio must never silently
      // reclassify a doc); flagged_ratio coalesces to 0 so a doc the span
      // screen has no row for is admitted-and-counted, never null-dropped
      .withColumn("is_benchmark", Curation.isBenchmark(col("doc_id")))
      .withColumn("admitted",
        (!col("is_benchmark") &&
          coalesce(col("flagged_ratio"), lit(0.0)) <= maxFlaggedRatio)
          .cast("long"))
      .select("doc_id", "importance", "score", "n_flagged", "flagged_ratio",
        "is_benchmark", "admitted")
    selection.write.mode("overwrite").parquet(s"$outDir/selection")
    val sel = spark.read.parquet(s"$outDir/selection")
    graft.sources.Tables.documents(spark, dir)
      .join(sel.filter(col("admitted") === 1).select("doc_id"), "doc_id")
      .write.mode("overwrite").parquet(s"$outDir/corpus")
    // derive ALL counts from the persisted selection (the CurationJob
    // rule): a corpus smaller than k must not invent phantom refusals
    val candidates = sel.count()
    val admitted = sel.filter(col("admitted") === 1).count()
    Report(candidates, admitted, candidates - admitted)
  }

  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println(
        "usage: SelectionJob <sfDir> <outDir> [k] [maxFlaggedRatio]")
      sys.exit(2)
    }
    val spark = Jobs.session("graft-selection")
    val r = run(spark, args(0), args(1),
      args.lift(2).map(_.toInt).getOrElse(100),
      args.lift(3).map(_.toDouble).getOrElse(0.2))
    println(s"[selection] admitted ${r.admitted}/${r.candidates} " +
      s"(refused ${r.refused} on contamination/benchmark)")
    spark.stop()
  }
}

/** RIGHT-TO-BE-FORGOTTEN PURGE as a deployable job (round 16 — the
  * execution step q116 only audited): commit one governance request's
  * doc-id set as a tag-committed tombstone delta to EVERY named
  * maintained artifact, INDEXES FIRST, STORE LAST (the
  * [[graft.text.Tombstones]] ordering contract — a serving page must
  * never rank a doc the store already refuses). Idempotent per
  * (artifact, tag): an at-least-once re-run short-circuits. From the
  * commit on the docs are unfetchable/unrankable; each artifact's next
  * compaction bakes the rows out physically and its vacuum retires the
  * delta. The report derives from the COMMITTED tombstone state, not
  * in-memory intent (the CurationJob rule).
  *
  * Usage: PurgeJob <tag> <idsCsv> <artifactRoot> [artifactRoot...]
  * (list index roots before the doc store). */
object PurgeJob {
  final case class Report(tag: String, nIds: Int,
    committed: Map[String, Boolean])

  /** `gramLedgers` pairs each gram-ledger root with the corpus dir its
    * purged docs' text is still fetchable from (the ledger's correction
    * needs the purged FOOTPRINT — [[graft.text.Dedup.purgeGramLedger]]);
    * ledgers commit with the indexes, BEFORE the store roots. */
  def run(spark: SparkSession, tag: String, ids: Seq[Long],
      artifactRoots: Seq[String],
      gramLedgers: Seq[(String, String)] = Seq.empty): Report = {
    import graft.text.{Dedup, Tombstones}
    val ledgerCommitted = gramLedgers.map { case (root, corpus) =>
      root -> Dedup.purgeGramLedger(spark, root, ids, tag, corpus)
    }.toMap
    val committed = artifactRoots.map { root =>
      root -> Tombstones.purge(spark, root, ids, tag)
    }.toMap
    // verify from the COMMITTED state: every artifact must now carry
    // the tag (freshly or from a previous run — both are success)
    val missing = (artifactRoots ++ gramLedgers.map(_._1)).filterNot(r =>
      Tombstones.committedTags(spark, r).contains(tag))
    require(missing.isEmpty,
      s"purge tag $tag failed to commit on: $missing")
    Report(tag, ids.length, ledgerCommitted ++ committed)
  }

  def main(args: Array[String]): Unit = {
    if (args.length < 3) {
      System.err.println(
        "usage: PurgeJob <tag> <idsCsv> <artifactRoot> [artifactRoot...]")
      sys.exit(2)
    }
    val spark = Jobs.session("graft-purge")
    val ids = args(1).split(",").map(_.trim.toLong).toSeq
    val r = run(spark, args(0), ids, args.drop(2).toSeq)
    println(s"[purge] tag=${r.tag} ids=${r.nIds} " +
      r.committed.toSeq.sorted.map { case (root, fresh) =>
        s"$root=${if (fresh) "committed" else "already-applied"}"
      }.mkString(", "))
    spark.stop()
  }
}

/** Vector-index lifecycle as a deployable main (round 7): the OFFLINE half
  * builds the partition-by-cell index (trained cells + PQ codes +
  * persisted codebooks — `CellIndex.write`); the ONLINE half answers a
  * probe two ways side by side — cell-pruned exact ANN
  * (`annIvfIndexed`) and IVF-PQ ADC+rerank (`ivfPqSearch`) — persisting
  * both result sets as the serving artifacts. The job report derives
  * every count from what was PERSISTED (the CurationJob/SelectionJob
  * rule: the audit trail is the artifact, not in-memory state).
  *
  * Usage: VectorIndexJob <sfDir> <indexPath> <outDir> [k=16] [nprobe=2]
  */
object VectorIndexJob {
  final case class Report(nVectors: Long, nCells: Long,
    annRows: Long, pqRows: Long)

  def run(spark: SparkSession, dir: String, indexPath: String,
      outDir: String, k: Int = 16, nprobe: Int = 2): Report = {
    import graft.vector.{CellIndex, Similarity}
    CellIndex.write(spark, dir, indexPath, k = k)
    val probe = Similarity.probeVector(spark, dir)
    require(probe.nonEmpty, s"no probe vector (vec_id=0) under $dir")
    CellIndex.annIvfIndexed(spark, indexPath, probe, nprobe = nprobe)
      .write.mode("overwrite").parquet(s"$outDir/ann")
    CellIndex.ivfPqSearch(spark, indexPath, probe, nprobe = nprobe)
      .write.mode("overwrite").parquet(s"$outDir/ivfpq")
    val vecs = spark.read.parquet(
      graft.vector.CellIndex.currentVectorsPath(spark, indexPath))
    Report(vecs.count(), vecs.select("cell").distinct().count(),
      spark.read.parquet(s"$outDir/ann").count(),
      spark.read.parquet(s"$outDir/ivfpq").count())
  }

  def main(args: Array[String]): Unit = {
    if (args.length < 3) {
      System.err.println(
        "usage: VectorIndexJob <sfDir> <indexPath> <outDir> [k] [nprobe]")
      sys.exit(2)
    }
    val spark = Jobs.session("graft-vector-index")
    val r = run(spark, args(0), args(1), args(2),
      args.lift(3).map(_.toInt).getOrElse(16),
      args.lift(4).map(_.toInt).getOrElse(2))
    println(s"[vectorindex] ${r.nVectors} vectors in ${r.nCells} cells; " +
      s"ann=${r.annRows} rows, ivfpq=${r.pqRows} rows")
    spark.stop()
  }
}

/** Streaming INDEX MAINTENANCE — the freshness half of the index story
  * (round 8: [[graft.vector.CellIndex.append]] and
  * [[graft.text.TextIndex.append]] as a deployable): a stream of newly
  * ingested documents WITH their embeddings folds into BOTH at-rest
  * indexes per micro-batch, so retrieval (q136's BM25, the cell-pruned
  * ANN, fully-indexed RRF) always serves the current corpus without ever
  * re-tokenizing or re-assigning old mass.
  *
  * Exactly-once on at-least-once foreachBatch: each batch lands under
  * `workDir/batch_<id>` (overwrite — replays rewrite byte-identical
  * parquet), then appends into each index with `tag = batchId`; both
  * appends publish the tag ATOMICALLY with the version rename
  * (`applied_tags` rides the version dir and carries the union forward),
  * so a replayed batch short-circuits on [[graft.vector.CellIndex.appliedTags]]
  * / [[graft.text.TextIndex.appliedTags]] instead of double-appending —
  * the lakehouse merge sink's committed-retry rule, per index.
  *
  * SINGLE LIVE WRITER per index: the publish protocol makes a concurrent
  * publisher's lost race safe (isolated staging, guarded rename, loud
  * failure — TextIndexAppendSpec drives the two-writer interleaving) but
  * deliberately does not arbitrate ownership; a second live maintenance
  * stream on the same index would fail one stream per batch. Deploy at
  * most one of this job per (vecIdx, textIdx) pair — the failure mode is
  * a retry signal for at-least-once delivery, not a coordination
  * mechanism. */
object IndexMaintenanceJob {

  /** One ingested doc + its embedding (the multimodal-ingest envelope:
    * text and vector arrive together; vec_id = doc_id). */
  final case class IndexedDoc(doc_id: Long, text: String, lang: String,
    source: String, n_chars: Long, embedding: Seq[Float], label: Int)

  /** One batch fold, the testable seam: write the batch's two tables
    * under `workDir/batch_<id>`, append each index that has not already
    * folded this tag, then vacuum old versions down to `retainVersions`.
    * The retention FLOOR of two is load-bearing, not caution — the merge
    * sink's rule: foreachBatch is at-least-once, so the newest version may
    * have committed while the checkpoint entry did not; a replay of that
    * batch must still find its tag, and dropping below two retained
    * versions in the crash window could vacuum the only committed set a
    * racing reader just resolved. Returns (vector appended?, text
    * appended?).
    *
    * WRITER LEASE (round 10): before folding anything, the job must hold
    * the lease at the VECTOR index root (one lease governs the whole
    * artifact set — the three indexes fold as a unit). A second live job
    * on the same indexes PARKS — returns (false, false) without erroring
    * — instead of failing one doomed publish per batch forever (the
    * pre-lease failure mode); once the holder's heartbeat goes stale
    * past `leaseTtlMs` the lease steals and the survivor takes over.
    * The guarded-rename publish stays the correctness backstop
    * ([[graft.IndexVersions.acquireLease]]'s contract). NOTE parking is
    * MISCONFIGURATION CONTAINMENT, not failover: the parked stream's
    * checkpoint advances past batches it never folded, so a parked
    * second stream is a hot spare for the lease, not for the data —
    * on takeover it will NOT refold batches it parked through. Deliberate
    * high availability goes through [[standbySink]] (shared-checkpoint
    * takeover: the standby runs NO query while parked, so no checkpoint
    * advances unfolded — round-11, closes the round-10 verdict's top
    * finding). */
  def applyBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
      workDir: String, vecIdx: String, textIdx: String,
      retainVersions: Int = 3,
      phraseIdx: Option[String] = None,
      owner: String = DefaultOwner,
      leaseTtlMs: Long = DefaultLeaseTtlMs,
      retrainAtImbalance: Option[Double] = None,
      docStore: Option[String] = None,
      gramLedger: Option[String] = None,
      clusterIdx: Option[String] = None,
      compactAt: Option[Int] = None): (Boolean, Boolean) = {
    import org.apache.spark.sql.functions._
    if (batch.isEmpty) return (false, false)
    val leaseRoot = new org.apache.hadoop.fs.Path(vecIdx)
    val fs = leaseRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val epoch = graft.IndexVersions.acquireLeaseEpoch(fs, leaseRoot, owner,
      leaseTtlMs).getOrElse {
      // parked: another live writer holds the lease. LOUD in the logs —
      // a parked stream's checkpoint still advances, so an operator must
      // be able to see the misconfiguration (round-10 review finding);
      // the return value alone is indistinguishable from an empty batch.
      System.err.println(s"[idxmaint] owner=$owner PARKED batch=$batchId " +
        s"on $vecIdx — lease held by a live writer; this stream folds " +
        "nothing while parked")
      return (false, false)
    }
    // FENCING TOKEN (round 11): every publish and vacuum this fold issues
    // re-validates that THIS acquisition is still the lease's current one
    // immediately before mutating. A primary paused stop-the-world past
    // the TTL and stolen from resumes into loud fence failures instead of
    // racing the new holder's folds (checkFence's contract); the guarded
    // rename stays the backstop inside the check-to-rename window.
    val fence: () => Unit =
      () => graft.IndexVersions.checkFence(fs, leaseRoot, owner, epoch)
    // the fold (and any advisor-triggered retrain inside it) can run
    // longer than the TTL — heartbeat in the background for its whole
    // duration, else a standby steals from a LIVE primary and starts a
    // second query on the shared checkpoint (round-11 review finding)
    graft.IndexVersions.withHeartbeat(fs, leaseRoot, owner, leaseTtlMs, epoch) {
    val tag = s"batch_$batchId"
    val dir = s"$workDir/$tag"
    // fence the batch-table overwrite too: a paused-past-TTL writer that
    // resumes here would otherwise overwrite the dir the new holder's
    // same-batch fold is mid-read on (content is deterministic-identical,
    // but a mid-overwrite reader can hit missing part files — a loud
    // restart, not corruption; the fence shrinks that to the ms window)
    fence()
    batch.select(col("doc_id"), col("text"), col("lang"), col("source"),
        col("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    batch.select(col("doc_id").as("vec_id"), col("embedding"), col("label"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    // FORWARD INDEX FIRST (round 11 — the 4th artifact): the doc store
    // folds BEFORE any inverted artifact publishes, so every id a
    // committed index version serves is already fetchable (the
    // [[graft.text.DocStore]] append contract); its committed-tag dir
    // short-circuits replays, and add-only needs no vacuum
    docStore.foreach { ds =>
      fence() // cheap pre-check before the staging write; the append's
              // publish re-validates the fence at the rename itself
      graft.text.DocStore.append(spark, dir, ds, tag, fence)
      // COMPACTION CADENCE (round 13 — the sketch tables' maxFiles model
      // applied to the tag-committed artifacts): once the live delta-dir
      // count passes the threshold, fold the chain down under this same
      // lease/fence and vacuum superseded generations (keepLast=2 — the
      // version-retention floor's argument: an in-flight reader may have
      // resolved the previous generation)
      compactAt.filter(_ < graft.text.DocStore.liveBatchCount(spark, ds))
        .foreach { _ =>
          fence()
          graft.text.DocStore.compact(spark, ds, fence)
          graft.text.DocStore.vacuumGenerations(spark, ds, keepLast = 2)
        }
    }
    val keep = math.max(retainVersions, 2)
    val vecDo = !graft.vector.CellIndex.appliedTags(spark, vecIdx).contains(tag)
    if (vecDo) {
      graft.vector.CellIndex.append(spark, dir, vecIdx, Some(tag), fence)
      fence() // vacuum deletes committed versions — never from a demoted fold
      graft.vector.CellIndex.vacuumVersions(spark, vecIdx, keepLast = keep)
      // ADVISOR-DRIVEN RETRAIN (round 10 — the flag→remedy loop closed
      // inside the fold): after a fresh fold, if the hottest cell carries
      // more than `retrainAtImbalance`× its uniform share, cut over to a
      // retrained codebook before the next batch. Geometry parameters
      // infer from the index itself; the ledger copies verbatim, so the
      // cutover is invisible to pairing and to the exactly-once guard
      // (a replayed batch short-circuits on its tag and never re-checks).
      // Cost: one partition-column count per fold for the check; the
      // retrain itself only when flagged — priced in SCALING.md.
      retrainAtImbalance.foreach { thr =>
        val hottest = graft.vector.CellIndex.cellBalanceReport(spark, vecIdx)
          .agg(org.apache.spark.sql.functions.max("imbalance"))
          .head().getDouble(0)
        if (hottest > thr) {
          graft.vector.CellIndex.retrain(spark, vecIdx, fence = fence)
          fence()
          graft.vector.CellIndex.vacuumVersions(spark, vecIdx, keepLast = keep)
        }
      }
    }
    val txtDo = !graft.text.TextIndex.appliedTags(spark, textIdx).contains(tag)
    if (txtDo) {
      graft.text.TextIndex.append(spark, dir, textIdx, tag = Some(tag),
        fence = fence)
      fence()
      graft.text.TextIndex.vacuumVersions(spark, textIdx, keepLast = keep)
      // cadence: each append carries the old posting files forward AND
      // adds the batch's file-set, so bucket file counts grow per fold —
      // past the threshold, publish a compacted version (same rows, one
      // file-set per bucket, ledger verbatim) under this lease
      compactAt
        .filter(_ < graft.text.TextIndex.postingFileCount(spark, textIdx))
        .foreach { _ =>
          graft.text.TextIndex.compactVersion(spark, textIdx, fence)
          fence()
          graft.text.TextIndex.vacuumVersions(spark, textIdx, keepLast = keep)
        }
    }
    // optional third artifact: the positional phrase index folds under the
    // same tag ledger + retention rules (round 9b)
    phraseIdx.foreach { pi =>
      if (!graft.text.TextIndex.phraseAppliedTags(spark, pi).contains(tag)) {
        graft.text.TextIndex.appendPhraseIndex(spark, dir, pi, Some(tag), fence)
        fence()
        graft.text.TextIndex.vacuumPhraseVersions(spark, pi, keepLast = keep)
        compactAt
          .filter(_ < graft.text.TextIndex.positionFileCount(spark, pi))
          .foreach { _ =>
            graft.text.TextIndex.compactPhraseVersion(spark, pi, fence)
            fence()
            graft.text.TextIndex.vacuumPhraseVersions(spark, pi,
              keepLast = keep)
          }
      }
    }
    // optional FIFTH artifact (round 12): the gram ledger folds its
    // batch-mass delta behind its own committed-tag short-circuit (the
    // add-only DocStore model — no version chain, so no vacuum); the
    // incremental span rewrite (q159) then serves from it at batch cost
    gramLedger.foreach { gl =>
      fence() // cheap pre-check; the append's publish re-validates
      graft.text.Dedup.appendGramLedger(spark, dir, gl, tag, fence)
      compactAt
        .filter(_ < graft.text.Dedup.gramLedgerLiveBatchCount(spark, gl))
        .foreach { _ =>
          fence()
          graft.text.Dedup.compactGramLedgerInChain(spark, gl, fence)
          graft.text.Dedup.vacuumGramLedgerGenerations(spark, gl,
            keepLast = 2)
        }
    }
    // optional SIXTH artifact (round 12): the near-dup cluster index
    // folds under the versioned tag-ledger + retention rules (the
    // TextIndex protocol) — contracted-graph CC per batch, so the q49
    // family serves from maintained labels instead of re-resolving
    clusterIdx.foreach { ci =>
      if (!graft.text.ClusterIndex.appliedTags(spark, ci).contains(tag)) {
        graft.text.ClusterIndex.append(spark, dir, ci, Some(tag), fence)
        fence()
        graft.text.ClusterIndex.vacuumVersions(spark, ci, keepLast = keep)
        // cadence on the sigs/bands delta-layer count (the probe side of
        // every fold unions these)
        compactAt
          .filter(_ < graft.text.ClusterIndex.liveBatchCount(spark, ci))
          .foreach { _ =>
            graft.text.ClusterIndex.compact(spark, ci, fence)
            fence()
            graft.text.ClusterIndex.vacuumGenerations(spark, ci,
              keepLast = 2)
          }
      }
    }
    (vecDo, txtDo)
    } // withHeartbeat
  }

  /** Writer identity for DIRECT applyBatch callers (one logical writer per
    * process — tests, replay drivers). [[sink]] does NOT use this: its
    * default owner adds a per-stream nonce, because two sinks in one JVM
    * over the same index are exactly the dual-writer misconfiguration the
    * lease exists to catch — a shared pid-only identity would make each
    * stream's acquire look like the other's renewal and the lease would be
    * silently inert (round-10 review finding). Lease TTL = several trigger
    * intervals, so a healthy writer never expires between heartbeats while
    * a dead one is stolen from promptly. (Definitions live with the lease
    * protocol in [[graft.IndexVersions]] — round-11 review.) */
  val DefaultOwner: String = graft.IndexVersions.DefaultOwner
  val DefaultLeaseTtlMs: Long = graft.IndexVersions.DefaultLeaseTtlMs

  /** A fresh per-stream writer identity (evaluated once per [[sink]] call,
    * shared by every batch of that stream). NOT checkpoint-derived: the
    * standby shares the primary's checkpoint by design, and a checkpoint
    * identity would let it impersonate the primary's renewals. */
  def streamOwner(): String = graft.IndexVersions.streamOwner()

  /** Block until this owner holds the writer lease at the vector-index
    * root, polling every `pollMs` (renewals return immediately; a held
    * lease is awaited until its holder's heartbeat goes stale past
    * `leaseTtlMs` and the acquire steals it). Throws after `maxWaitMs`
    * so a misconfigured standby fails loudly instead of spinning
    * forever. The coordination half of [[standbySink]]. */
  def awaitLease(spark: SparkSession, vecIdx: String, owner: String,
      leaseTtlMs: Long = DefaultLeaseTtlMs, pollMs: Long = 1000L,
      maxWaitMs: Long = 24L * 3600 * 1000): Unit = {
    val root = new org.apache.hadoop.fs.Path(vecIdx)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val start = System.currentTimeMillis()
    while (!graft.IndexVersions.acquireLease(fs, root, owner, leaseTtlMs)) {
      if (System.currentTimeMillis() - start >= maxWaitMs)
        throw new IllegalStateException(
          s"standby $owner waited ${maxWaitMs}ms for the writer lease on " +
            s"$vecIdx without acquiring it — is the TTL ($leaseTtlMs ms) " +
            "longer than the intended failover window?")
      Thread.sleep(pollMs)
    }
  }

  /** SHARED-CHECKPOINT STANDBY FAILOVER (round 11 — the real
    * high-availability mechanism; closes the round-10 verdict's top
    * finding). A standby deployed this way runs NO streaming query while
    * the primary is alive: it polls the writer lease ([[awaitLease]])
    * and only when it acquires — the primary released it on clean
    * shutdown, or its heartbeat went stale past the TTL (crash) — starts
    * the maintenance sink ON THE PRIMARY'S CHECKPOINT.
    *
    * Why this shape and not a parked-but-running second stream: Spark
    * commits a foreachBatch micro-batch's offsets whenever the batch
    * function returns, so a RUNNING parked stream advances its own
    * checkpoint past batches it never folded — a takeover from that
    * checkpoint silently loses every batch parked through (the round-10
    * documented hole). A standby that holds NO query holds NO checkpoint
    * cursor; on takeover it resumes from the primary's last COMMITTED
    * offset, which is by definition ≤ the last folded batch. The
    * at-least-once crash window (primary folded batch N, died before
    * committing N) replays batch N with the SAME batch id — shared
    * checkpoint means shared batch-id sequence — and the applied-tags
    * ledger short-circuits it exactly as it does for the primary's own
    * restart. Net: zero lost batches, zero double folds, for any crash
    * point.
    *
    * Deployment contract: `checkpoint` (and the source definition behind
    * `docs`) MUST be the same as the primary's — this is what "standby"
    * means here; a standby with its own checkpoint is a second primary.
    * The source must be replayable from committed offsets (Kafka, files
    * — anything Structured Streaming can recover), which is the same
    * requirement the primary's own crash-restart already imposes.
    * Failover time is bounded by `leaseTtlMs` + one poll interval;
    * during that window batches queue unprocessed at the source — they
    * are delayed, never lost.
    *
    * The primary heartbeats CONTINUOUSLY while folding
    * ([[graft.IndexVersions.withHeartbeat]] — a fold or retrain longer
    * than the TTL must not read as death), so a steal means the
    * primary's JVM is gone or paused stop-the-world past the TTL. The
    * pause case is the residual window every lease protocol carries:
    * if a paused primary later resumes mid-batch, its next publish
    * loses LOUDLY to the guarded rename (artifact correctness holds);
    * size the TTL above worst-case GC pauses, not above fold
    * durations. */
  def standbySink(docs: org.apache.spark.sql.Dataset[IndexedDoc],
      workDir: String, vecIdx: String, textIdx: String, checkpoint: String,
      retainVersions: Int = 3,
      phraseIdx: Option[String] = None,
      owner: String = null,
      leaseTtlMs: Long = DefaultLeaseTtlMs,
      pollMs: Long = 1000L,
      maxWaitMs: Long = 24L * 3600 * 1000,
      retrainAtImbalance: Option[Double] = None,
      docStore: Option[String] = None,
      gramLedger: Option[String] = None,
      clusterIdx: Option[String] = None,
      compactAt: Option[Int] = None): org.apache.spark.sql.streaming.StreamingQuery = {
    val ownerId = Option(owner).getOrElse(streamOwner())
    awaitLease(docs.sparkSession, vecIdx, ownerId, leaseTtlMs, pollMs, maxWaitMs)
    sink(docs, workDir, vecIdx, textIdx, checkpoint, retainVersions,
      phraseIdx, ownerId, leaseTtlMs, retrainAtImbalance, docStore, gramLedger,
      clusterIdx, compactAt)
  }

  /** The wire: stream of [[IndexedDoc]] → per-batch index folds. */
  def sink(docs: org.apache.spark.sql.Dataset[IndexedDoc], workDir: String,
      vecIdx: String, textIdx: String, checkpoint: String,
      retainVersions: Int = 3,
      phraseIdx: Option[String] = None,
      owner: String = null, // default: a fresh per-stream identity
      leaseTtlMs: Long = DefaultLeaseTtlMs,
      retrainAtImbalance: Option[Double] = None,
      docStore: Option[String] = None,
      gramLedger: Option[String] = None,
      clusterIdx: Option[String] = None,
      compactAt: Option[Int] = None): org.apache.spark.sql.streaming.StreamingQuery = {
    // per-STREAM owner, fixed once here and shared by every batch: a
    // pid-only default would let two sinks in one JVM renew each other's
    // lease and never park (round-10 review finding)
    val ownerId = Option(owner).getOrElse(streamOwner())
    val q = docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[IndexedDoc], id: Long) =>
        applyBatch(b.sparkSession, b.toDF(), id, workDir, vecIdx, textIdx,
          retainVersions, phraseIdx, ownerId, leaseTtlMs, retrainAtImbalance,
          docStore, gramLedger, clusterIdx, compactAt); ()
      }
      .start()
    // release the lease on IN-JVM termination (clean stop OR in-stream
    // failure): the writer is provably gone, so a standby — or this
    // stream's own redeploy, which mints a fresh owner — takes over at
    // its next poll instead of waiting out the TTL (round-11 review
    // finding: restart self-contention). A true JVM death runs no
    // listener and keeps the designed TTL failover window.
    val spark = docs.sparkSession
    val queryId = q.id
    val leaseRoot = new org.apache.hadoop.fs.Path(vecIdx)
    val fs = leaseRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    spark.streams.addListener(
      new org.apache.spark.sql.streaming.StreamingQueryListener {
        override def onQueryStarted(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
        override def onQueryProgress(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = ()
        override def onQueryTerminated(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit =
          if (e.id == queryId) {
            try graft.IndexVersions.releaseLease(fs, leaseRoot, ownerId)
            catch { case _: Throwable => () } // lease expiry is the fallback
            finally spark.streams.removeListener(this)
          }
      })
    q
  }
}

/** Streaming maintenance for the AT-REST REACH SKETCH TABLE
  * ([[graft.analytics.Relational.writeReachSketches]]'s layout fed live):
  * each micro-batch of events folds to its (event_type, day)-grain HLL
  * sketch rows and APPENDS them to the parquet table;
  * [[graft.analytics.Relational.reachFromSketches]] then serves every
  * rollup without ever scanning events.
  *
  * EXACTLY-ONCE BY ALGEBRA, not by ledger: foreachBatch is
  * at-least-once, so a crash can append one batch's sketch rows twice —
  * but Spark batches are deterministic under replay and HLL union is
  * IDEMPOTENT (merging a register set with itself is a no-op), so
  * duplicate rows change NOTHING the table serves. The index
  * maintenance path needs its applied-tags ledger because file appends
  * to posting/vector sets are NOT idempotent; sketch tables get the
  * guarantee free — the deepest practical argument for sketch-shaped
  * streaming state, and it is spec'd (replayed batch leaves every reach
  * estimate bit-identical).
  *
  * Round 10 extends the same argument twice: the job optionally folds
  * THETA COHORT rows beside the HLL reach rows (theta union is idempotent
  * exactly as HLL union is — q150/q151's overlap/retention tables stay
  * fresh under live ingest), and each table COMPACTS in place once its
  * file count passes a bound ([[compact]] — correct at every intermediate
  * state by union idempotence, so unbounded stream age no longer degrades
  * read cost).
  *
  * HIGH AVAILABILITY — BY ALGEBRA, NOT PROTOCOL (round 12, the explicit
  * statement the round-11 verdict asked for): these tables need NO
  * standby machinery because a SECOND LIVE WRITER is safe outright.
  * Every row any writer appends is a union of register sets the events
  * stream determines, and HLL/theta union is idempotent and
  * commutative — two writers folding overlapping batches (even under
  * SEPARATE checkpoints, even replaying each other's data) only append
  * rows that vanish into the semilattice at read time; no estimate a
  * reader serves can change. Deploy redundancy by simply running two
  * sinks; the only lease in this job guards COMPACTION (a physical
  * rewrite — the one non-idempotent act here), and a lost compaction
  * lease degrades to deferred compaction, never to a wrong answer.
  * Contrast [[FreqMaintenanceJob]]: CMS merge is ADDITIVE, so the same
  * dual-writer deployment would DOUBLE estimates — that job gets the
  * shared-checkpoint standby protocol instead. */
object ReachMaintenanceJob {

  /** File-count threshold above which [[applyBatch]] compacts a sketch
    * table in place (round-10; the round-9 advice finding): per-batch
    * appends grow file count and duplicate grain rows without bound over
    * a stream's lifetime — estimates stay correct by union idempotence,
    * but read cost degrades with stream age. */
  val DefaultMaxFiles = 64

  /** Writer identity for compaction's lease (round 11): APPENDS are safe
    * under any number of writers — duplicate sketch rows vanish into the
    * union semilattice — but a concurrent COMPACT could retire another
    * compact's input files and clobber the `_superseded` sidecar (real
    * data loss, the one non-idempotent step in this job). So compaction,
    * and only compaction, is lease-guarded: a writer that cannot acquire
    * the table's lease SKIPS compacting (loudly) and keeps appending —
    * correctness never depends on the lease, only the file-count bound
    * does, and the lease holder's next batch compacts for everyone.
    * DIRECT [[applyBatch]] callers default to the per-process identity —
    * one logical writer per process, the documented contract; concurrent
    * direct callers in one JVM must pass distinct owners.
    * (Identity definitions live in [[graft.IndexVersions]].) */
  val DefaultOwner: String = graft.IndexVersions.DefaultOwner
  val DefaultLeaseTtlMs: Long = graft.IndexVersions.DefaultLeaseTtlMs

  /** Compact `tablePath` iff this owner holds (or can take) the table's
    * writer lease, HEARTBEATING for the compact's whole duration (a
    * 100 TB-scale compact can outlive the TTL — the applyBatch fold
    * lesson); otherwise skip loudly — see [[DefaultOwner]].
    *
    * RESIDUAL WINDOW, stated honestly: the lease is heartbeat-mtime
    * coordination, not CAS — two writers racing the SAME expired lease
    * within one read-write window can both believe they won, and unlike
    * the index publish path there is no guarded-rename backstop behind
    * compaction. The EPOCH FENCE (round 11) narrows what a lost race can
    * do: [[compact]] re-validates this acquisition immediately before
    * each of its two mutation phases (the expired-file sweep and the
    * post-aggregate retirement), so a writer fenced mid-compact throws
    * before retiring anything — the both-believe-they-won window shrinks
    * from the whole compact to the millisecond check-to-delete gaps.
    * Deployments that cannot tolerate even that run compaction in one
    * dedicated job (appends need no lease at all). `graceMs > 0`
    * additionally means a lost race strands duplicate files rather than
    * deleting files a concurrent plan still reads. */
  private def compactIfLeased(spark: SparkSession, tablePath: String,
      grain: Seq[String],
      unionAgg: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
      graceMs: Long, owner: String, leaseTtlMs: Long): Unit = {
    val root = new org.apache.hadoop.fs.Path(tablePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.IndexVersions.acquireLeaseEpoch(fs, root, owner, leaseTtlMs) match {
      case Some(epoch) =>
        graft.IndexVersions.withHeartbeat(fs, root, owner, leaseTtlMs, epoch) {
          compact(spark, tablePath, grain, unionAgg, graceMs,
            () => graft.IndexVersions.checkFence(fs, root, owner, epoch))
        }
      case None =>
        skipLoudly(tablePath, owner)
    }
  }

  private def skipLoudly(tablePath: String, owner: String): Unit =
    System.err.println(s"[reachmaint] owner=$owner SKIPPED compaction of " +
      s"$tablePath — lease held by a live writer; appends remain correct " +
      "by idempotence, the holder's next batch compacts")

  /** Sidecar naming part files whose content a compacted row already
    * carries, with the epoch-ms each was superseded at (line format
    * `<ms>\t<name>`). Underscore-prefixed — invisible to parquet scans. */
  val SupersededFile = "_superseded"

  private def readSuperseded(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): Seq[(Long, String)] = {
    val p = new org.apache.hadoop.fs.Path(root, SupersededFile)
    if (!fs.exists(p)) Nil
    else {
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .filter(_.contains('\t')).map { l =>
          val i = l.indexOf('\t'); (l.substring(0, i).toLong, l.substring(i + 1))
        }.toSeq
      finally in.close()
    }
  }

  private def writeSuperseded(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path, entries: Seq[(Long, String)]): Unit = {
    val p = new org.apache.hadoop.fs.Path(root, SupersededFile)
    if (entries.isEmpty) { if (fs.exists(p)) fs.delete(p, false); () }
    else {
      val out = fs.create(p, true)
      try out.write(entries.map { case (t, n) => s"$t\t$n" }
        .mkString("\n").getBytes("UTF-8"))
      finally out.close()
    }
  }

  /** Part files currently carrying LIVE (non-superseded) content — the
    * count that triggers compaction. Superseded files awaiting their
    * grace-period deletion are excluded, else every batch inside the
    * grace window would re-run a full-table compact against a count that
    * cannot drop (round-10 ADVICE finding). */
  private def liveParts(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.FileStatus] = {
    if (!fs.exists(root)) return Nil
    val superseded = readSuperseded(fs, root).map(_._2).toSet
    fs.listStatus(root).toSeq.filter { s =>
      s.getPath.getName.startsWith("part-") && !superseded(s.getPath.getName)
    }
  }

  /** Compact a sketch table to one row per grain IN PLACE, correct at
    * every intermediate state BY THE SAME ALGEBRA that makes appends
    * exactly-once: (1) list the current live part files; (2) APPEND one
    * coalesced file of rows re-aggregated by `grain` with the union agg —
    * the table now holds duplicates, which union idempotence renders
    * invisible to every reader that LISTS FROM NOW ON; (3) retire the
    * listed old files. (Parquet writes surface only completed files — the
    * task-temp + rename commit — so step 2 is never partially visible.)
    *
    * RETIREMENT IS GRACE-DEFERRED, NOT IMMEDIATE (round-10 ADVICE
    * finding): Spark resolves a table's file listing at PLANNING time and
    * reads lazily, so deleting old files right after the compacted append
    * would make a reader that planned before step 2 fail with
    * FileNotFoundException (or, under
    * `spark.sql.files.ignoreMissingFiles`, silently drop sketch mass —
    * wrong estimates). Instead, superseded files are recorded in the
    * [[SupersededFile]] sidecar and deleted only once `graceMs` has
    * elapsed since they were superseded (each later compact call sweeps
    * expired entries first; a stream that stops triggering compaction
    * leaves at most one grace-window's worth of duplicate files behind —
    * harmless to correctness, reclaimed on the next compact). Set
    * `graceMs` above the longest reader
    * duration — the same read-duration contract as
    * [[graft.IndexVersions.vacuum]] — and a reader at ANY point sees a
    * file set whose per-grain union equals the full table's, estimates
    * identical throughout. `graceMs = 0` (the default, used by specs
    * under the harshest schedule) deletes immediately and restores the
    * reader caveat. Superseded-but-undeleted files hold only duplicate
    * mass — every retirement's content rides the compacted file appended
    * in the same call (a later compact may itself supersede an earlier
    * compact's output; the invariant holds transitively) — so they are
    * excluded from later compact inputs and file-count triggers.
    *
    * Caller must be the table's single COMPACTOR: a concurrent APPEND
    * between steps 1 and 3 is safe (its files are not in the retirement
    * list — and duplicate appends are idempotent anyway), but a
    * concurrent COMPACT could retire the other's input files. The job's
    * entry points enforce this with the writer lease
    * ([[compactIfLeased]], round 11) — call [[compact]] directly only
    * when you already are the single writer.
    * Bounds the table at (grain cardinality) rows; the compacted write is
    * coalesced to ONE file (grain cardinality is small by design), so the
    * live file count drops below any `maxFiles >= 2` threshold regardless
    * of `spark.sql.shuffle.partitions` — an uncoalesced write could
    * produce more files than the trigger threshold and re-run a
    * full-table compact every batch without ever shrinking (round-10
    * ADVICE finding). */
  def compact(spark: SparkSession, tablePath: String, grain: Seq[String],
      unionAgg: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
      graceMs: Long = 0L,
      fence: () => Unit = graft.IndexVersions.NoFence): Unit = {
    import org.apache.hadoop.fs.Path
    import org.apache.spark.sql.functions.col
    val root = new Path(tablePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val now = System.currentTimeMillis()
    // fence before the FIRST mutation (the expired-file sweep) and again
    // after the long re-aggregate, before retirement — a compactor whose
    // lease acquisition was superseded mid-compact must not delete or
    // re-record anything another compactor now owns
    fence()
    // sweep superseded entries past their grace
    val (expired, pending) = readSuperseded(fs, root).partition {
      case (t, _) => now - t >= graceMs
    }
    expired.foreach { case (_, n) =>
      val p = new Path(root, n); if (fs.exists(p)) fs.delete(p, false)
    }
    val old = fs.listStatus(root).toSeq.filter { s =>
      s.getPath.getName.startsWith("part-") &&
        !pending.exists(_._2 == s.getPath.getName)
    }
    if (old.size < 2) { writeSuperseded(fs, root, pending); return }
    // read exactly the listed live files: rows appended between list and
    // read (none under single-writer, but cheap to be precise) and
    // pending-grace duplicates stay untouched
    spark.read.parquet(old.map(_.getPath.toString): _*)
      .groupBy(grain.map(col): _*)
      .agg(unionAgg(col("sk")).as("sk"))
      .coalesce(1)
      .write.mode("append").parquet(tablePath)
    fence() // the aggregate can outlive a steal; retirement must not
    if (graceMs <= 0L) {
      old.foreach(f => fs.delete(f.getPath, false))
      writeSuperseded(fs, root, pending)
    } else {
      // stamp supersession AFTER the compacted append lands, not with the
      // entry-time `now`: the old files only become duplicate-redundant
      // once the compacted file exists, and a long re-aggregate would
      // otherwise eat into the reader grace window — a reader that
      // planned during the aggregate could see its files swept a full
      // aggregate-duration early (round-11 review finding)
      val supersededAt = System.currentTimeMillis()
      writeSuperseded(fs, root,
        pending ++ old.map(f => (supersededAt, f.getPath.getName)))
    }
  }

  /** One batch fold, the testable seam: day-grain HLL reach rows appended
    * to `tablePath`, and — when `cohortTablePath` is given — the theta
    * cohort rows ([[graft.analytics.Relational.writeCohortSketches]]'s
    * layout: family type/period, day grain) appended beside them, so the
    * overlap/retention reports stay serveable from parquet under live
    * ingest with the SAME exactly-once-by-idempotence guarantee (theta
    * union is idempotent exactly as HLL union is). After each append the
    * table compacts once its file count passes `maxFiles`, bounding rows
    * at grain cardinality and read cost at one bounded file set
    * regardless of stream age. (Empty batches append nothing — a zero-row
    * parquet append would still write a file per partition.) */
  def applyBatch(spark: SparkSession, batch: DataFrame, tablePath: String,
      cohortTablePath: Option[String] = None,
      maxFiles: Int = DefaultMaxFiles,
      compactGraceMs: Long = 0L,
      owner: String = DefaultOwner,
      leaseTtlMs: Long = DefaultLeaseTtlMs): Unit = {
    import org.apache.spark.sql.functions._
    import graft.functions.ThetaExpressions
    if (batch.isEmpty) return
    def fileCount(p: String): Int = {
      val root = new org.apache.hadoop.fs.Path(p)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      liveParts(fs, root).size
    }
    batch
      .groupBy(col("event_type"), to_date(col("ts")).cast("string").as("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .write.mode("append").parquet(tablePath)
    if (fileCount(tablePath) > maxFiles)
      compactIfLeased(spark, tablePath, Seq("event_type", "day"),
        hll_union_agg, compactGraceMs, owner, leaseTtlMs)
    cohortTablePath.foreach { ct =>
      ThetaExpressions.register(spark)
      val tAgg = ThetaExpressions.theta_sketch_agg _
      val byType = batch
        .groupBy(col("event_type").as("cohort"),
          to_date(col("ts")).cast("string").as("day"))
        .agg(tAgg(col("user_id")).as("sk"))
        .select(lit("type").as("family"), col("cohort"), col("day"), col("sk"))
      val byPeriod = batch
        .withColumn("cohort",
          when(col("event_id") % 2 === 0, "base").otherwise("cur"))
        .groupBy(col("cohort"), to_date(col("ts")).cast("string").as("day"))
        .agg(tAgg(col("user_id")).as("sk"))
        .select(lit("period").as("family"), col("cohort"), col("day"), col("sk"))
      byType.unionByName(byPeriod).write.mode("append").parquet(ct)
      if (fileCount(ct) > maxFiles)
        compactIfLeased(spark, ct, Seq("family", "cohort", "day"),
          ThetaExpressions.theta_union_agg, compactGraceMs, owner, leaseTtlMs)
    }
  }

  /** The LIVE-FEED wire for the windowed distinct-reach operator
    * (round 11 — closes the loop the round-10 verdict named: the
    * streaming operator [[graft.streaming.Streaming.distinctReach]] was
    * spec'd standalone while [[applyBatch]] built its own per-batch
    * sketches): persist the operator's HOURLY windowed sketch rows
    * `(window_start, window_end, event_type, sk)` to a parquet table,
    * append-per-micro-batch, and serve day-grain reach by re-merging
    * hour → day ([[graft.analytics.Relational.rollupHourlyReach]]).
    *
    * The stream runs in UPDATE mode, so each batch emits the CUMULATIVE
    * sketch for every window the batch touched — the table accumulates
    * successive versions of a window's sketch. That is correct by the
    * same algebra as [[applyBatch]]'s idempotence, plus monotonicity: an
    * earlier version's register set is a SUBSET of a later one's (HLL
    * insert only grows registers), so unioning every appended version
    * equals the latest version exactly — duplicates from at-least-once
    * replay AND stale partials from update-mode emission both vanish
    * into the semilattice. No watermark-expiry coordination, no ledger.
    * [[compact]] bounds the table at window-grain cardinality under the
    * same grace contract. */
  def hourlySink(reach: DataFrame, tablePath: String, checkpoint: String,
      maxFiles: Int = DefaultMaxFiles,
      compactGraceMs: Long = 0L,
      owner: String = null,
      leaseTtlMs: Long = DefaultLeaseTtlMs): org.apache.spark.sql.streaming.StreamingQuery = {
    // checkpoint-derived STABLE identity: Spark forbids two concurrent
    // queries on one checkpoint, so this is unique per live sink and a
    // RESTART renews its own lease instead of self-contending with its
    // dead incarnation for a TTL (round-11 review finding; there is no
    // standby model over sketch tables, so stability is safe here)
    val ownerId = Option(owner).getOrElse(
      graft.IndexVersions.checkpointOwner(checkpoint))
    reach.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, _: Long) =>
        import org.apache.spark.sql.functions.{col, hll_union_agg}
        if (!b.isEmpty) {
          val spark = b.sparkSession
          b.select(col("window_start"), col("window_end"),
              col("event_type"), col("sk"))
            .write.mode("append").parquet(tablePath)
          val root = new org.apache.hadoop.fs.Path(tablePath)
          val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
          if (liveParts(fs, root).size > maxFiles)
            compactIfLeased(spark, tablePath,
              Seq("window_start", "window_end", "event_type"),
              hll_union_agg, compactGraceMs, ownerId, leaseTtlMs)
        }
        ()
      }
      .start()
  }

  /** The wire: event stream → per-batch sketch-table appends (HLL reach
    * always; theta cohorts when a second table path is given). */
  def sink(events: DataFrame, tablePath: String, checkpoint: String,
      cohortTablePath: Option[String] = None,
      maxFiles: Int = DefaultMaxFiles,
      compactGraceMs: Long = 0L,
      owner: String = null,
      leaseTtlMs: Long = DefaultLeaseTtlMs): org.apache.spark.sql.streaming.StreamingQuery = {
    // checkpoint-derived stable identity — see [[hourlySink]]
    val ownerId = Option(owner).getOrElse(
      graft.IndexVersions.checkpointOwner(checkpoint))
    events.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, _: Long) =>
        applyBatch(b.sparkSession, b, tablePath, cohortTablePath, maxFiles,
          compactGraceMs, ownerId, leaseTtlMs); ()
      }
      .start()
  }
}

/** Streaming maintenance for the AT-REST DAY-GRAIN FREQUENCY (Count-Min)
  * TABLE — q158's layout fed live, and the HA counterpart the round-11
  * verdict asked for. [[ReachMaintenanceJob]]'s tables get exactly-once
  * AND dual-writer safety FREE from union idempotence (see its HA
  * scaladoc); CMS merge is ADDITIVE — a doubled row doubles every
  * estimate it touches — so here BOTH guarantees come from protocol:
  *
  *  - EXACTLY-ONCE BY LEDGER: each batch folds through
  *    [[graft.analytics.Relational.appendFreqSketches]]'s tag-committed
  *    batch dirs; an at-least-once replay short-circuits on its
  *    committed tag (spec'd, including the restart-window replay).
  *  - HA BY SHARED-CHECKPOINT STANDBY: the ledger keys on the BATCH-ID
  *    sequence, which is a property of the CHECKPOINT — two writers on
  *    separate checkpoints would fold overlapping data under different
  *    tags, and the ledger could not see the overlap. The standby model
  *    is therefore [[IndexMaintenanceJob.standbySink]]'s verbatim: the
  *    standby runs NO query while the primary's lease is live (so no
  *    checkpoint advances past unfolded batches), and on takeover
  *    resumes THE PRIMARY'S checkpoint — the shared batch-id sequence
  *    makes any crash-window replay land on its committed tag.
  *    Dual-writer contention INSIDE one batch id (the paused-past-TTL
  *    zombie) is safe at the publish: same tag, deterministic-identical
  *    content, and the fenced guarded rename keeps exactly one copy. */
object FreqMaintenanceJob {

  /** One batch fold, the testable seam: write the batch's events under
    * `workDir/batch_<id>`, fold them into the CMS table under that tag.
    * Returns whether this call committed the fold (false = parked,
    * empty, or already folded). The lease lives at the TABLE root
    * (underscore file — invisible to parquet listings); a second live
    * stream parks loudly instead of racing one doomed publish per
    * batch. */
  def applyBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
      workDir: String, tablePath: String,
      owner: String = graft.IndexVersions.DefaultOwner,
      leaseTtlMs: Long = graft.IndexVersions.DefaultLeaseTtlMs,
      compactAt: Option[Int] = None): Boolean = {
    if (batch.isEmpty) return false
    val root = new org.apache.hadoop.fs.Path(tablePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val epoch = graft.IndexVersions.acquireLeaseEpoch(fs, root, owner,
      leaseTtlMs).getOrElse {
      System.err.println(s"[freqmaint] owner=$owner PARKED batch=$batchId " +
        s"on $tablePath — lease held by a live writer; this stream folds " +
        "nothing while parked (parking is misconfiguration containment; " +
        "failover goes through standbySink)")
      return false
    }
    val fence: () => Unit =
      () => graft.IndexVersions.checkFence(fs, root, owner, epoch)
    graft.IndexVersions.withHeartbeat(fs, root, owner, leaseTtlMs, epoch) {
      val tag = s"batch_$batchId"
      // replay short-circuit BEFORE the batch-dir write (the fold itself
      // re-checks inside the shared protocol; this spares the write)
      val committed =
        if (graft.analytics.Relational.freqAppliedTags(spark, tablePath)
            .contains(tag)) false
        else {
          val dir = s"$workDir/$tag"
          fence() // the batch-dir overwrite is a mutation too
          batch.write.mode("overwrite").parquet(s"$dir/events.parquet")
          graft.analytics.Relational.appendFreqSketches(spark, dir, tablePath,
            tag, fence)
        }
      // COMPACTION CADENCE (round 13 — the reach tables' maxFiles model on
      // the tag-committed layout): past the live-delta threshold, fold the
      // chain to day-grain rows under this same lease/fence and vacuum
      // superseded generations
      compactAt
        .filter(_ < graft.analytics.Relational
          .freqLiveBatchCount(spark, tablePath))
        .foreach { _ =>
          fence()
          graft.analytics.Relational.compactFreqSketches(spark, tablePath,
            fence)
          graft.analytics.Relational.vacuumFreqGenerations(spark, tablePath,
            keepLast = 2)
        }
      committed
    }
  }

  /** The wire: event stream → tag-committed CMS folds. The default owner
    * is a fresh per-stream nonce (NOT checkpoint-derived — the standby
    * shares the primary's checkpoint by design, and a checkpoint
    * identity would let it impersonate the primary's renewals: the
    * [[IndexMaintenanceJob.sink]] rule). */
  def sink(events: DataFrame, workDir: String, tablePath: String,
      checkpoint: String, owner: String = null,
      leaseTtlMs: Long = graft.IndexVersions.DefaultLeaseTtlMs): org.apache.spark.sql.streaming.StreamingQuery = {
    val ownerId = Option(owner).getOrElse(graft.IndexVersions.streamOwner())
    val q = events.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, id: Long) =>
        applyBatch(b.sparkSession, b, id, workDir, tablePath, ownerId,
          leaseTtlMs); ()
      }
      .start()
    // release the lease on IN-JVM termination (the IndexMaintenanceJob
    // listener verbatim): a clean stop hands over at the standby's next
    // poll instead of waiting out the TTL; JVM death keeps the TTL window
    val spark = events.sparkSession
    val queryId = q.id
    val root = new org.apache.hadoop.fs.Path(tablePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    spark.streams.addListener(
      new org.apache.spark.sql.streaming.StreamingQueryListener {
        override def onQueryStarted(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
        override def onQueryProgress(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = ()
        override def onQueryTerminated(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit =
          if (e.id == queryId) {
            try graft.IndexVersions.releaseLease(fs, root, ownerId)
            catch { case _: Throwable => () } // lease expiry is the fallback
            finally spark.streams.removeListener(this)
          }
      })
    q
  }

  /** Shared-checkpoint standby for the CMS table —
    * [[IndexMaintenanceJob.standbySink]]'s contract verbatim:
    * `checkpoint` (and the source behind `events`) MUST be the
    * primary's; the standby runs no query until the primary's lease
    * releases (clean stop) or goes stale past the TTL (crash), then
    * resumes from the last COMMITTED offset with the same batch-id
    * sequence, so the applied-tags ledger absorbs the crash-window
    * replay. Failover ≤ TTL + one poll; queued batches are delayed,
    * never lost, never doubled (kill-primary spec'd). */
  def standbySink(events: DataFrame, workDir: String, tablePath: String,
      checkpoint: String, owner: String = null,
      leaseTtlMs: Long = graft.IndexVersions.DefaultLeaseTtlMs,
      pollMs: Long = 1000L,
      maxWaitMs: Long = 24L * 3600 * 1000): org.apache.spark.sql.streaming.StreamingQuery = {
    val ownerId = Option(owner).getOrElse(graft.IndexVersions.streamOwner())
    IndexMaintenanceJob.awaitLease(events.sparkSession, tablePath, ownerId,
      leaseTtlMs, pollMs, maxWaitMs)
    sink(events, workDir, tablePath, checkpoint, ownerId, leaseTtlMs)
  }
}
