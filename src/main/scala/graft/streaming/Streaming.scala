package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType
import graft.model.Schemas

/** Structured-Streaming rewrite of the reference's consumer→validate→bronze
  * path (`/root/reference/kafka/consumer/event_consumer.py` +
  * `data/lake_writer.py`) — SURVEY S1–S6, T1–T9.
  *
  * Delivery semantics: the reference claims at-least-once but can drop up
  * to one buffer on sink failure (lake_writer.py:185-191 clears the buffer
  * in `finally`; SURVEY §3.2). We implement the claim, not the bug:
  * checkpointed micro-batches + idempotent file sinks give effective
  * exactly-once (T1; checkpoint bucket `spark-checkpoints`,
  * docker-compose.yml:190).
  *
  * Scale notes: every transform below is keyed (session_id / event_id /
  * product_id) so state is partitionable across 1000 executors; state
  * stores should be RocksDB-backed at the 100 TB north star
  * (`spark.sql.streaming.stateStore.providerClass`, SURVEY §7.4.6).
  */
object Streaming {

  // ---- S1: Kafka-shaped source parsing -------------------------------------

  /** Kafka source builder — the production S1 wiring
    * (event_consumer.py:125-147's subscribe + poll loop as one declaration).
    * Requires the `spark-sql-kafka-0-10` connector on the classpath (not
    * shipped in this environment, so this path is exercised through
    * [[parseTopic]]/[[splitParsed]] over Kafka-shaped frames instead).
    * `startingOffsets=earliest` mirrors `auto.offset.reset=earliest`
    * (event_consumer.py:136); offset commits are subsumed by checkpointing
    * (T1/T4). */
  def kafkaSource(spark: SparkSession, brokers: String, topic: String,
      maxEvents: Option[Long] = None): DataFrame =
    spark.readStream
      .format("kafka")
      .options(kafkaSourceOptions(brokers, topic, maxEvents = maxEvents))
      .load()

  /** The S1 source option surface as a pure, spec-testable map (the
    * consumer config of event_consumer.py:125-147 — no broker needed to
    * assert the wiring): `subscribe`, `startingOffsets=earliest`
    * (auto.offset.reset), fail-fast on data loss (the reference treats a
    * lost offset as a hard error), and optionally `maxOffsetsPerTrigger` —
    * the S4 COUNT cap, stated precisely: it bounds how many offsets a
    * micro-batch ADMITS (memory/backpressure; the excess defers to the next
    * batch) — it does NOT close a batch early the way lake_writer.py:111's
    * flush-at-100 does. The reference's 100-OR-30 s duality therefore maps
    * as: trigger interval = the latency bound (exact), admission cap = the
    * batch-SIZE bound (a different guarantee — Spark has no count-triggered
    * early flush). The cap defaults OFF: a standing cap of 100 under a 30 s
    * trigger would bound throughput to ~3 events/s and grow the backlog
    * without bound at any real rate. Opt in per deployment, sized to
    * rate × interval. */
  def kafkaSourceOptions(brokers: String, topic: String,
      startingOffsets: String = "earliest",
      failOnDataLoss: Boolean = true,
      maxEvents: Option[Long] = None): Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> brokers,
      "subscribe" -> topic,
      "startingOffsets" -> startingOffsets,
      "failOnDataLoss" -> failOnDataLoss.toString) ++
      maxEvents.map(n => "maxOffsetsPerTrigger" -> n.toString)

  /** The S2 sink option surface (event_producer.py:264-275): target topic +
    * the exactly-once checkpoint. Spec-testable without a broker, same
    * rationale as [[kafkaSourceOptions]]. */
  def kafkaSinkOptions(brokers: String, topic: String,
      checkpoint: String): Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> brokers,
      "topic" -> topic,
      "checkpointLocation" -> checkpoint)

  /** Parse a Kafka-shaped stream (key/value binary columns) for `topic`
    * using the fixed TOPIC_SCHEMA_MAP binding (events.py:260-265).
    * Malformed JSON yields a null struct — the P1 permissive-validation
    * path (event_consumer.py:87-92). Unknown topic ⇒ None, mirroring the
    * consumer's drop (event_consumer.py:82-85). */
  def parseTopic(raw: DataFrame, topic: String): Option[DataFrame] =
    Schemas.topicSchemaMap.get(topic).map { schema =>
      raw.select(from_json(col("value").cast("string"), schema).as("parsed"))
    }

  /** S10/T7 — dead-letter split: invalid rows are quarantined (with the raw
    * payload for replay), valid rows are unwrapped. The reference logs and
    * skips, committing the offset anyway (event_consumer.py:187-191);
    * checkpointing gives us the same no-reprocess guarantee. */
  def splitParsed(raw: DataFrame, topic: String): Option[(DataFrame, DataFrame)] =
    Schemas.topicSchemaMap.get(topic).map { schema =>
      val parsed = raw.select(col("value").cast("string").as("raw"),
        from_json(col("value").cast("string"), schema).as("parsed"))
      // from_json returns a non-null struct of all-null fields for
      // schema-mismatched JSON; require the envelope's event_id too.
      val ok = parsed.filter(col("parsed").isNotNull && col("parsed.event_id").isNotNull)
        .select("parsed.*")
      val dead = parsed.filter(col("parsed").isNull || col("parsed.event_id").isNull)
        .select(col("raw"), current_timestamp().as("quarantined_at"))
      (ok, dead)
    }

  /** O3 — all-topics merge (event_consumer.py:265-273 consumes the three
    * topic streams through one handler): schema-tolerant union of per-topic
    * frames. */
  def unionTopics(dfs: Seq[DataFrame]): DataFrame =
    dfs.reduce(_.unionByName(_, allowMissingColumns = true))

  /** F10 — envelope defaults (BaseEvent, events.py:79-81): fill missing
    * `event_id` with a generated UUID and missing `timestamp` with
    * processing time, exactly the Pydantic default-factory behavior. */
  def withEnvelopeDefaults(df: DataFrame): DataFrame =
    df.withColumn("event_id", coalesce(col("event_id"), expr("uuid()")))
      .withColumn("timestamp", coalesce(col("timestamp"), current_timestamp()))

  // ---- S1/S2: source abstraction + Kafka sink builder ----------------------

  /** Stream-source seam: production binds [[KafkaEventSource]]; tests bind
    * [[FrameSource]] over a MemoryStream-backed frame carrying the same
    * Kafka wire contract (binary key/value) — so every spec exercises the
    * exact code path the connector feeds. */
  trait EventSource { def load(spark: SparkSession): DataFrame }

  /** The production S1 binding (requires spark-sql-kafka-0-10 on the
    * classpath). */
  case class KafkaEventSource(brokers: String, topic: String) extends EventSource {
    def load(spark: SparkSession): DataFrame = kafkaSource(spark, brokers, topic)
  }

  /** Test/replay binding: any (key, value)-shaped frame, streaming or not. */
  case class FrameSource(df: DataFrame) extends EventSource {
    def load(spark: SparkSession): DataFrame = df
  }

  /** Source → validated per-topic stream through the SAME parse/dead-letter
    * path regardless of binding ([[splitParsed]]); unknown topic ⇒ None. */
  def topicStream(spark: SparkSession, source: EventSource,
      topic: String): Option[(DataFrame, DataFrame)] =
    splitParsed(source.load(spark), topic)

  /** Project rows to the Kafka sink contract: key = session_id (the
    * reference's partition key for per-session ordering,
    * event_producer.py:254-258,294), value = JSON of all columns. */
  def toKafkaShape(df: DataFrame): DataFrame =
    df.select(col("session_id").cast("string").as("key"),
      to_json(struct(df.columns.map(col): _*)).as("value"))

  /** S2 — Kafka sink builder (event_producer.py:264-275's send wrapped as
    * one declaration): [[toKafkaShape]] rows to `topic`, checkpointed.
    * Keying by session_id preserves the reference's per-session ordering
    * guarantee — all of a session's events land in one Kafka partition.
    * Requires the spark-sql-kafka-0-10 connector at runtime; the projection
    * it writes is spec-tested connector-free via [[toKafkaShape]]. */
  def kafkaSink(df: DataFrame, brokers: String, topic: String,
      checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("30 seconds")): StreamingQuery =
    toKafkaShape(df).writeStream
      .format("kafka")
      .options(kafkaSinkOptions(brokers, topic, checkpoint))
      .trigger(trigger)
      .start()

  // ---- S3/S4: bronze sink --------------------------------------------------

  /** Add the Hive partition columns year/month/day/hour from the event
    * timestamp (lake_writer.py:118-141's key pattern
    * `{folder}/year=YYYY/month=MM/day=DD/hour=HH/...`). */
  def withHivePartitions(df: DataFrame, tsCol: String = "timestamp"): DataFrame =
    df.withColumn("year", year(col(tsCol)))
      .withColumn("month", month(col(tsCol)))
      .withColumn("day", dayofmonth(col(tsCol)))
      .withColumn("hour", hour(col(tsCol)))

  /** Bronze sink: gzip JSON lines, Hive-partitioned, 30 s micro-batches.
    * vs the reference's flush-at-100-events-OR-30 s (lake_writer.py:111):
    * the trigger reproduces the 30 s latency half exactly; the 100-count
    * half has no Spark analogue as a latency trigger — what exists is the
    * source ADMISSION cap (`maxOffsetsPerTrigger` in [[kafkaSourceOptions]],
    * `maxFilesPerTrigger` on the file binding — spec-asserted on a real
    * bounded stream), which bounds batch size and defers the excess. An
    * accepted, documented semantic delta (SURVEY S4). */
  def bronzeSink(df: DataFrame, path: String, checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("30 seconds")): StreamingQuery =
    withHivePartitions(df).writeStream
      .format("json")
      .option("compression", "gzip")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .partitionBy("year", "month", "day", "hour")
      .trigger(trigger)
      .start()

  /** Silver sink prep (S5, lake_writer.py:13-16): validated + deduplicated
    * Parquet. Dedup justification: "Duplicate event_ids = producer retry
    * bug" (expectations.py:239). Streaming uses watermark-bounded state so
    * the dedup map can't grow unboundedly at scale. */
  def silverDedup(df: DataFrame, tsCol: String = "timestamp",
      watermark: String = "1 hour"): DataFrame =
    df.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Streaming NEAR-dup dedup (U6 in-stream): drop documents whose full
    * 8-hash MinHash signature was already seen inside the watermark —
    * catches re-sent/near-identical token streams (docs whose trigram sets
    * agree on all 8 minhash minima) that event_id dedup misses. Only
    * possible because [[graft.functions.MinHashHex]] computes the
    * signature as a pure per-row map (the exploded+aggregate formulation
    * can't run inside a streaming dedup); state is keyed by signature and
    * watermark-bounded, same scale contract as [[silverDedup]]. Docs under
    * 3 tokens carry no signature and dedup on a per-row unique key instead
    * (never dropped) — ONE branch, so the source is scanned and hashed
    * once per micro-batch (a filter+union formulation would plan the
    * source subtree twice). Tokenization is [[TextOps.tokens]], the same
    * tokenizer the batch signatures use. */
  def nearDupDedup(df: DataFrame, textCol: String = "text",
      tsCol: String = "timestamp", watermark: String = "1 hour"): DataFrame = {
    graft.functions.TextExpressions.register(df.sparkSession)
    import graft.functions.TextExpressions.minhash_hex
    df.withColumn("_sig",
        coalesce(
          nullif(concat_ws("|",
            minhash_hex(graft.text.TextOps.tokens(col(textCol)))), lit("")),
          concat(lit("uniq:"), expr("uuid()"))))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("_sig")
      .drop("_sig")
  }

  // ---- T5/W1: sessionization -----------------------------------------------

  /** Streaming session windows with the reference's 10-minute inactivity gap
    * (event_producer.py:90-95): one row per (session_id, window) with event
    * count and span. Watermark bounds state eviction (T2). */
  def sessionWindows(df: DataFrame, tsCol: String = "timestamp",
      gap: String = "10 minutes", watermark: String = "30 minutes"): DataFrame =
    df.withWatermark(tsCol, watermark)
      .groupBy(col("session_id"), session_window(col(tsCol), gap))
      .agg(count(lit(1)).as("event_count"),
        min(tsCol).as("session_start"), max(tsCol).as("session_end"))
      .select(col("session_id"), col("session_window.start").as("window_start"),
        col("event_count"), col("session_start"), col("session_end"))

  /** Shared watermarked sliding-window count skeleton for [[windowedCounts]]
    * and [[burstAlerts]] — one copy of the watermark/window/projection
    * handling, parameterized on the grouping key. */
  private def slidingCounts(df: DataFrame, tsCol: String, keyCol: String,
      width: String, slide: String, watermark: String): DataFrame =
    df.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), width, slide), col(keyCol))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col(keyCol), col("n_events"))

  /** T9 — tumbling / sliding event-time windows (the declared hourly batch
    * cadence, expectations.py:187-194, and the dashboard's sliding view):
    * counts + value totals per (window, event_type). Pass slide == width
    * for tumbling. Watermark bounds state (T2). */
  def windowedCounts(df: DataFrame, tsCol: String = "timestamp",
      width: String = "1 hour", slide: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    slidingCounts(df, tsCol, "event_type", width, slide, watermark)

  /** Streaming counterpart of `Enrich.burstDetect` (q92): per-user event
    * counts over short sliding windows; any (user, window) reaching
    * `threshold` events emits a burst alert — the live bot/scraper signal,
    * where the batch form is the forensic one. Watermark bounds state to
    * (active users × open windows) counters; the filter runs AFTER the
    * windowed aggregate, so alerts are final per closed window (append
    * mode), never partial counts. */
  def burstAlerts(df: DataFrame, tsCol: String = "timestamp",
      width: String = "30 seconds", slide: String = "10 seconds",
      watermark: String = "2 minutes", threshold: Long = 4): DataFrame =
    slidingCounts(df, tsCol, "user_id", width, slide, watermark)
      .filter(col("n_events") >= threshold)

  /** Streaming DISTINCT-USER REACH per window via HLL sketches (the live
    * twin of q142): `count(DISTINCT ...)` is unsupported in streaming
    * aggregations for a reason — exact distinct state grows with KEY
    * CARDINALITY, unbounded on a 100 TB stream. The HLL partial is a
    * fixed-size register set per (window, group) regardless of how many
    * users pass, merges associatively across micro-batches by
    * construction, and the watermark expires whole windows — state is
    * O(open windows × groups × sketch bytes), corpus-independent. Emits
    * both the rounded estimate and the sketch itself, so a downstream
    * consumer can KEEP MERGING (daily → weekly reach) without ever seeing
    * raw user ids — the q142 at-rest rollup fed by a live pipeline. */
  def distinctReach(df: DataFrame, tsCol: String = "timestamp",
      keyCol: String = "user_id", groupCol: String = "event_type",
      width: String = "1 hour", watermark: String = "2 hours"): DataFrame =
    df.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), width), col(groupCol))
      .agg(hll_sketch_agg(col(keyCol)).as("sk"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col(groupCol),
        hll_sketch_estimate(col("sk")).as("reach_est"), col("sk"))

  // ---- J5/T5: CDC latest-state upsert --------------------------------------

  /** Current inventory row state, reconstructed per product key. */
  case class CdcInput(product_id: String, operation: String, lsn: String,
    stock_quantity: Option[Int], reorder_level: Option[Int])
  case class CdcState(product_id: String, lsn: String, deleted: Boolean,
    stock_quantity: Int, reorder_level: Int)

  /** Numeric value of a Postgres text LSN ("hi/lo" in hex, unpadded —
    * events.py:213 / FIXTURES.md B.3): (hi << 32) | lo. String comparison
    * would mis-order unpadded LSNs of different lengths ("0/F00000" vs
    * "0/1100000"). */
  def lsnValue(lsn: String): Long = lsn.split('/') match {
    case Array(hi, lo) => (java.lang.Long.parseLong(hi, 16) << 32) |
      java.lang.Long.parseLong(lo, 16)
    case _ => java.lang.Long.parseLong(lsn, 16)
  }

  /** The one CDC fold both state APIs share (single-sourced so the
    * flatMapGroupsWithState and transformWithState forms can never drift):
    * LSN-ordered apply with monotonicity (events at or before the applied
    * lsn are ignored), INSERT/UPDATE take `after`, DELETE tombstones. */
  private[streaming] def applyCdcBatch(key: String, init: Option[CdcState],
      rows: Iterator[CdcInput]): Option[CdcState] =
    rows.toSeq.sortBy(e => lsnValue(e.lsn)).foldLeft(init) { (cur, ev) =>
      if (cur.exists(c => lsnValue(c.lsn) >= lsnValue(ev.lsn))) cur
      else ev.operation match {
        case "DELETE" => Some(CdcState(key, ev.lsn, deleted = true, 0, 0))
        case _ => Some(CdcState(key, ev.lsn, deleted = false,
          ev.stock_quantity.getOrElse(0), ev.reorder_level.getOrElse(0)))
      }
    }

  /** flatMapGroupsWithState upsert keyed by product_id, ordered by `lsn`
    * (the reference's Postgres WAL ordering, events.py:213): INSERT/UPDATE
    * apply `after`, DELETE tombstones. Emits the post-batch state per key
    * (OutputMode.Update). */
  def cdcUpsert(ds: Dataset[CdcInput]): Dataset[CdcState] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.product_id)
      .flatMapGroupsWithState[CdcState, CdcState](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[CdcInput], state: GroupState[CdcState]) =>
          val next = applyCdcBatch(key, state.getOption, rows)
          next.foreach(state.update)
          next.iterator
      }
  }

  /** [[cdcUpsert]] on Spark 4's `transformWithState` — the arbitrary-state
    * API superseding flatMapGroupsWithState (named typed state handles,
    * timers, per-state TTL, RocksDB-native layout). Same [[applyCdcBatch]]
    * fold, same outputs; a differential spec runs both APIs over the same
    * input and asserts identical results. Requires the RocksDB state store
    * provider (a TWS constraint — already the configured 100 TB state path
    * in app/Jobs.scala). */
  class CdcTwsProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[String, CdcInput, CdcState] {
    import org.apache.spark.sql.streaming.{TimeMode, TimerValues, TTLConfig, ValueState}
    @transient private var state: ValueState[CdcState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[CdcState]("cdc",
        org.apache.spark.sql.Encoders.product[CdcState], TTLConfig.NONE)
    override def handleInputRows(key: String, rows: Iterator[CdcInput],
        timerValues: TimerValues): Iterator[CdcState] = {
      val init = if (state.exists()) Some(state.get()) else None
      val next = applyCdcBatch(key, init, rows)
      next.foreach(state.update)
      next.iterator
    }
  }

  def cdcUpsertTws(ds: Dataset[CdcInput]): Dataset[CdcState] = {
    import ds.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    ds.groupByKey(_.product_id)
      .transformWithState(new CdcTwsProcessor(), TimeMode.None(), OutputMode.Update())
  }

  case class SessionEvent(session_id: String, ts: java.sql.Timestamp)
  case class SessionSummary(session_id: String, n_events: Long,
      start_ms: Long, end_ms: Long)
  private[streaming] case class SessionAgg(n: Long, start: Long, end: Long)

  /** W1/T9 on the modern state API: TIMER-BASED session tracking — the
    * capability `transformWithState` adds over flatMapGroupsWithState
    * (which can only time out between batches) and over `session_window`
    * (which fixes the output to window aggregates). Each event extends the
    * session and MOVES the key's single event-time timer to last-event +
    * gap; when the watermark passes the deadline, `handleExpiredTimer`
    * emits the closed session and clears state — the reference's
    * SessionTracker expiry rule (strictly > gap, event_producer.py:92-93)
    * with state that a watermark provably bounds. */
  class SessionTwsProcessor(gapMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        String, SessionEvent, SessionSummary] {
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, TimeMode, TimerValues, TTLConfig, ValueState}
    @transient private var state: ValueState[SessionAgg] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[SessionAgg]("sess",
        org.apache.spark.sql.Encoders.product[SessionAgg], TTLConfig.NONE)
    override def handleInputRows(key: String, rows: Iterator[SessionEvent],
        timerValues: TimerValues): Iterator[SessionSummary] = {
      // the gap rule applies WITHIN a batch too: a backfilled day of one
      // key's events must come out as its real sessions, not one merged
      // blob. The restored open segment is NOT an anchor the batch folds
      // onto — a nonzero watermark delay admits late events EARLIER than
      // the open segment's start, and folding those forward would merge two
      // real sessions into one with a wrong start. Instead the open segment
      // enters the sorted timeline as one more segment and gap-splitting
      // runs positionally over all of them: segments (restored + each event
      // as a singleton) sorted by start, adjacent ones merged when
      // separated by ≤ gap (strictly > gap splits — the reference's expiry
      // rule, same as q09). Every closed internal segment is emitted now;
      // only the trailing one stays open.
      val segs = scala.collection.mutable.ArrayBuffer.empty[SessionAgg]
      if (state.exists()) segs += state.get()
      rows.foreach(r => segs += SessionAgg(1L, r.ts.getTime, r.ts.getTime))
      var open: SessionAgg = null
      val closed = scala.collection.mutable.ListBuffer.empty[SessionAgg]
      segs.sortInPlaceBy(s => (s.start, s.end))
      segs.foreach { s =>
        if (open == null) open = s
        else if (s.start - open.end > gapMs) { closed += open; open = s }
        else open = SessionAgg(open.n + s.n,
          math.min(open.start, s.start), math.max(open.end, s.end))
      }
      // exactly one live timer per key: slide it to the open segment's gap
      // deadline. open is null only on an empty batch for a stateless key —
      // the runtime contract says that doesn't happen, but a timer
      // registration off a null segment must not be the failure mode if it
      // ever does
      if (open != null) {
        getHandle.listTimers().foreach(t => getHandle.deleteTimer(t.asInstanceOf[Long]))
        getHandle.registerTimer(open.end + gapMs)
        state.update(open)
      }
      closed.iterator.map(s => SessionSummary(key, s.n, s.start, s.end))
    }
    override def handleExpiredTimer(key: String, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[SessionSummary] = {
      val out = if (state.exists()) {
        val s = state.get()
        state.clear()
        Iterator.single(SessionSummary(key, s.n, s.start, s.end))
      } else Iterator.empty
      out
    }
  }

  /** [[SessionTwsProcessor]] over a watermarked event stream (the input
    * MUST carry a watermark on `ts` — EventTime timers fire on watermark
    * advance). Strict-gap default matches q09/sessionWindows (600 s). */
  def sessionTrackerTws(ds: Dataset[SessionEvent],
      gapMs: Long = 600000L): Dataset[SessionSummary] = {
    import ds.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    ds.groupByKey(_.session_id)
      .transformWithState(new SessionTwsProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** J7 — reorder alert: stock below reorder level ("Alert when stock drops
    * below this", events.py:196). */
  def reorderAlerts(state: Dataset[CdcState]): Dataset[CdcState] =
    state.filter(s => !s.deleted && s.stock_quantity < s.reorder_level)

  // ---- A9/T-series: streaming quality-gated load ---------------------------

  /** The reference's quality-gated load (quality_gate, expectations.py:
    * 437-464) as a STREAMING sink: each micro-batch runs its expectation
    * suite in one aggregate pass; passing batches land under the gold path,
    * failing batches are quarantined whole (the abort-load branch,
    * expectations.py:456-461).
    *
    * Delivery: foreachBatch is at-least-once, so each batch OVERWRITES its
    * own `_batch_id=<id>` partition directory — a crash-and-retry rewrites
    * the same directory instead of appending duplicates (effective
    * exactly-once; readers of goldPath see `_batch_id` as a partition
    * column). The batch is persisted so the gate judges exactly the rows
    * that get written (and the source isn't recomputed per action). */
  def gatedGoldSink(df: DataFrame, suite: graft.quality.Expectations.Suite,
      goldPath: String, rejectPath: String, checkpoint: String,
      minScore: Double = graft.quality.Gate.DefaultMinScore,
      trigger: Trigger = Trigger.ProcessingTime("30 seconds")): StreamingQuery =
    df.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.persist()
        try {
          if (!batch.isEmpty) {
            val result = graft.quality.SuiteCompiler.run(batch, suite)
            val gate = graft.quality.Gate.check(result, minScore)
            val target = if (gate.passed) goldPath else rejectPath
            batch.withColumn("_gate_score", lit(gate.score))
              .write.mode("overwrite").parquet(s"$target/_batch_id=$batchId")
          }
        } finally batch.unpersist()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()

  // ---- T1+lakehouse: streaming MERGE INTO a versioned parquet table --------

  /** Streaming MERGE INTO a versioned parquet lakehouse table: each
    * micro-batch of latest-state CDC deltas ([[cdcUpsertTws]] output)
    * merges into the current snapshot via the SAME
    * [[graft.sources.Catalog.mergeEvolved]] operator q111/q113 verify —
    * matched upserts update, unmatched insert, deletes drop the key —
    * writing `snapshot_<batchId>` under `tableRoot`. Readers resolve the
    * table as the highest-numbered snapshot (merge-on-read's
    * copy-on-write cousin; the snapshot chain doubles as q112-style time
    * travel until vacuumed — q125's audit shape).
    *
    * Exactly-once without a transaction log: the base for batch N is the
    * highest snapshot with id < N — never "the latest" — so a retry of
    * batch N after a crash re-reads the SAME base (N's own half-written
    * output is ineligible by construction). A retry of a COMMITTED
    * snapshot short-circuits (the rewrite would be byte-identical by
    * construction); a retry of an uncommitted one replaces the staging
    * output and publishes atomically. Combined with the checkpoint's
    * batch tracking, duplicate delivery collapses to a no-op (the
    * foreachBatch fault-injection spec's argument, applied to MERGE). */
  def lakehouseMergeSink(state: Dataset[CdcState], tableRoot: String,
      checkpoint: String): StreamingQuery =
    state.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[CdcState], batchId: Long) =>
        mergeSnapshot(batch.toDF(), tableRoot, batchId)
      }
      .start()

  /** One batch of [[lakehouseMergeSink]], factored out as the testable
    * seam (the wire-seam convention): deterministic in (prior snapshots
    * below `batchId`, batch content), so at-least-once delivery yields
    * exactly-once table state.
    *
    * COW at PARTITION granularity (round 7 — the round-6 verdict's table
    * -granularity caveat): snapshots are hash-bucketed on product_id
    * (`bucket=k` dirs, Spark's murmur3 `hash` — stable across JVMs and
    * partitionings), the merge join reads ONLY buckets the batch touches
    * (partition-pruned base scan), and untouched bucket directories are
    * carried forward as raw byte copies — no decode, no shuffle, no
    * rewrite. A batch touching k of `nBuckets` buckets pays merge IO for
    * k/nBuckets of the table; at object-store scale the carry-forward is
    * a server-side copy. Commit protocol: everything (merged buckets +
    * carried copies + the `_SUCCESS` marker Spark wrote) assembles in a
    * dot-prefixed staging dir — invisible to [[committedSnapshots]] —
    * then ONE directory rename publishes the snapshot, so readers never
    * observe a bucket-incomplete table (rename is atomic on HDFS/local;
    * on S3 it is the usual copy-manifest caveat). A retry of an
    * already-committed snapshot short-circuits: the rewrite would be
    * byte-identical by construction, and skipping it closes the race
    * where overwrite's delete-then-rewrite yanks files from under a
    * reader that just resolved the snapshot. */
  def mergeSnapshot(batch: DataFrame, tableRoot: String, batchId: Long,
      nBuckets: Int = 16): Unit = {
    import org.apache.hadoop.fs.{FileUtil, Path}
    val spark = batch.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(tableRoot)
    val fs = root.getFileSystem(conf)
    val target = new Path(root, s"snapshot_$batchId")
    if (fs.exists(new Path(target, "_SUCCESS"))) return
    val bucketOf = pmod(hash(col("product_id")), lit(nBuckets))
    // TWS emits ONE latest state per key per batch, so the change set is
    // already key-unique — mergeEvolved's full-outer join needs no
    // pre-dedup; `deleted` maps onto its op column contract
    val changes = batch.select(
      col("product_id"), col("lsn"),
      col("stock_quantity"), col("reorder_level"),
      when(col("deleted"), "delete").otherwise("upsert").as("op"))
    // buckets this batch touches: bounded by nBuckets (a driver-side
    // decision list, never data mass)
    val touched = changes.select(bucketOf.as("bucket")).distinct()
      .collect().map(_.getInt(0)).toSet
    val base = committedSnapshots(spark, tableRoot)
      .filter(_ < batchId)
      .sorted.lastOption.map(v => s"$tableRoot/snapshot_$v")
    val merged = base match {
      case Some(dir) =>
        // partition-pruned: only touched bucket dirs are scanned
        val baseTouched = spark.read.parquet(dir)
          .filter(col("bucket").isin(touched.toSeq: _*))
          .drop("bucket")
        graft.sources.Catalog.mergeEvolved(
            baseTouched, changes,
            keyCol = "product_id", opCol = "op")
          .drop("action")
      case None =>
        changes.filter(col("op") =!= "delete").drop("op")
    }
    val staging = new Path(root, s".staging_snapshot_$batchId")
    merged.withColumn("bucket", bucketOf)
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(staging.toString)
    // carry untouched bucket dirs forward byte-for-byte
    base.foreach { dir =>
      fs.listStatus(new Path(dir)).toSeq
        .filter(_.getPath.getName.startsWith("bucket="))
        .filterNot(s => touched.contains(
          s.getPath.getName.stripPrefix("bucket=").toInt))
        .foreach { s =>
          FileUtil.copy(fs, s.getPath, fs,
            new Path(staging, s.getPath.getName), false, conf)
        }
    }
    // an empty partitioned write can leave no marker — the rename below
    // must still publish a committed snapshot
    val marker = new Path(staging, "_SUCCESS")
    if (!fs.exists(marker)) fs.create(marker).close()
    // publish: one atomic rename; a crashed earlier attempt's partial
    // target (no _SUCCESS, see the short-circuit above) is replaced
    if (fs.exists(target)) fs.delete(target, true)
    fs.rename(staging, target)
  }

  /** Snapshot ids under `tableRoot` whose write COMMITTED (`_SUCCESS`
    * present — Spark's committer drops it last, so a crash mid-write
    * leaves a dir without it). Both the merge base and the read path
    * resolve only committed snapshots: a half-written `snapshot_N` from
    * a crashed batch is invisible until its retry overwrites it. */
  private def committedSnapshots(spark: SparkSession,
      tableRoot: String): Seq[Long] = {
    import org.apache.hadoop.fs.Path
    val root = new Path(tableRoot)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("snapshot_"))
      // strict digit check: a stray non-numeric dir (snapshot_tmp, an
      // editor artifact) must be invisible, not a NumberFormatException
      // that breaks every read/merge/vacuum of the table
      .filter(n => { val s = n.stripPrefix("snapshot_"); s.nonEmpty && s.forall(_.isDigit) })
      .filter(n => fs.exists(new Path(root, s"$n/_SUCCESS")))
      .map(_.stripPrefix("snapshot_").toLong)
  }

  /** The read side of [[lakehouseMergeSink]]'s versioning: the table IS
    * its highest-numbered committed snapshot (or an earlier `asOf`
    * batch id — the time-travel read the retained chain supports). */
  def readMergedTable(spark: SparkSession, tableRoot: String,
      asOf: Long = Long.MaxValue): DataFrame = {
    val versions = committedSnapshots(spark, tableRoot).filter(_ <= asOf)
    require(versions.nonEmpty, s"no snapshot at or before $asOf under $tableRoot")
    val df = spark.read.parquet(s"$tableRoot/snapshot_${versions.max}")
    // the bucket partition column is physical layout, not table schema
    if (df.columns.contains("bucket")) df.drop("bucket") else df
  }

  /** VACUUM for the snapshot chain — the action whose planning view is
    * q125's audit: drop committed snapshots beyond the newest `keepLast`
    * (time-travel depth traded for storage), FLOORED AT TWO retained.
    * The floor is load-bearing, not caution: foreachBatch is
    * at-least-once, so the newest snapshot N may have committed while
    * its checkpoint entry did not — the stream will then REPLAY batch N,
    * and the replay's base is the newest snapshot BELOW N. Deleting
    * that base in the crash window would make the retry resolve an
    * empty base and silently truncate the table to one batch's deltas.
    * An uncommitted (crashed-write) dir is likewise left alone — it is
    * a pending retry's overwrite target, not garbage. Returns the
    * deleted batch ids; each is a whole-object delete, the COW
    * reclamation q125 prices.
    *
    * Concurrency caveat: a time-travel read that resolved a snapshot id
    * races a concurrent vacuum of that id (this API pins nothing);
    * readers of vacuumed history must tolerate a missing-file failure
    * and re-resolve. The LIVE table is never affected — the newest two
    * committed snapshots are untouchable. */
  def vacuumSnapshots(spark: SparkSession, tableRoot: String,
      keepLast: Int = 2): Seq[Long] = {
    import org.apache.hadoop.fs.Path
    val root = new Path(tableRoot)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val doomed = committedSnapshots(spark, tableRoot)
      .sorted.dropRight(math.max(keepLast, 2))
    doomed.foreach { v =>
      fs.delete(new Path(root, s"snapshot_$v"), true)
    }
    doomed
  }

  // ---- A12: streaming event-mix counters -----------------------------------

  /** Running counts per event type (producer stats every 50 events,
    * event_producer.py:357-364) — update-mode streaming aggregate. */
  def eventMix(df: DataFrame): DataFrame =
    df.groupBy("event_type").count()

  // ---- T6+: in-stream observability metrics --------------------------------

  /** In-stream metrics via `Dataset.observe` — the reference's driver-side
    * consumer counters (event_consumer.py:196-204: processed/error tallies
    * logged every N events) computed INSIDE the stream instead: per
    * micro-batch row count, null-id count, and the event-time span, riding
    * the existing plan as accumulator-backed aggregates with ZERO extra
    * passes or shuffles. Surfaces in every QueryProgress under `name` (and
    * through [[GraftQueryListener]]), which is what a lake operator
    * actually graphs at 100 TB/day — no second job re-counting the stream.
    *
    * Placement matters: attach the null-id tally to a frame where nulls can
    * still occur. On a post-validation stream it is a tautological zero —
    * there, pair this with a count-only `observe` on the dead-letter side
    * (as IngestJob does) so the error tally measures what was rejected. */
  def withIngestMetrics(df: DataFrame, name: String = "graft_ingest",
      idCol: String = "event_id", tsCol: String = "timestamp"): DataFrame =
    df.observe(name,
      count(lit(1)).as("n_rows"),
      sum(when(col(idCol).isNull, 1L).otherwise(0L)).as("n_null_id"),
      min(col(tsCol)).as("min_ts"),
      max(col(tsCol)).as("max_ts"))

  // ---- T-series: stream-stream interval join -------------------------------

  /** Stream-stream INTERVAL JOIN — purchase attribution: each purchase
    * pairs with same-user clicks at most `window` BEFORE it (the funnel
    * J2/q47 computed batch-side, expressed on live streams). Both sides are
    * watermarked and the join condition bounds event time in BOTH
    * directions, which is what lets Spark expire join state: a click older
    * than watermark + window can never match again and is dropped, so
    * state stays proportional to the window, not the stream — the
    * requirement for running this against the 100 TB/day clickstream.
    * Inner join, so matches emit immediately (no watermark wait). */
  /** The watermark prep + interval condition both attribution joins
    * share — one copy, so a window/watermark fix can't diverge the
    * twins (the applyCdcBatch seam rule). */
  private def attributionJoined(clicks: DataFrame, purchases: DataFrame,
      window: String, watermark: String, joinType: String): DataFrame = {
    val c = clicks
      .select(col("user_id").as("c_user"), col("click_id"), col("click_ts"))
      .withWatermark("click_ts", watermark)
    val p = purchases
      .select(col("user_id").as("p_user"), col("purchase_id"), col("purchase_ts"))
      .withWatermark("purchase_ts", watermark)
    // left side = purchases so the leftOuter variant emits UNMATCHED
    // purchases; the inner variant is side-symmetric
    p.join(c,
      col("c_user") === col("p_user") &&
      col("purchase_ts") >= col("click_ts") &&
      col("purchase_ts") <= col("click_ts") + expr(s"INTERVAL $window"),
      joinType)
  }

  def attributionJoin(clicks: DataFrame, purchases: DataFrame,
      window: String = "30 minutes", watermark: String = "1 hour"): DataFrame =
    attributionJoined(clicks, purchases, window, watermark, "inner")
      .select(col("c_user").as("user_id"), col("click_id"), col("purchase_id"),
        col("click_ts"), col("purchase_ts"))

  /** Left-outer twin of [[attributionJoin]], purchases-side: UNATTRIBUTED
    * purchases (organic conversions — the rows the inner join can never
    * surface) emit with null click columns once the watermark proves no
    * qualifying click can still arrive. Spark holds the outer row in
    * state until then, so emission is late by design — the price of a
    * correct null, not a bug. Same two-sided event-time bound, so state
    * on both sides still expires with the watermark; the global
    * watermark is the MIN across input streams, so a quiet clicks
    * stream delays outer emission (the operational reason attribution
    * pipelines keep heartbeats on both topics). */
  def attributionJoinOuter(clicks: DataFrame, purchases: DataFrame,
      window: String = "30 minutes", watermark: String = "1 hour"): DataFrame =
    attributionJoined(clicks, purchases, window, watermark, "leftOuter")
      .select(col("p_user").as("user_id"), col("purchase_id"), col("click_id"),
        col("purchase_ts"), col("click_ts"))

  // ---- T6: observability + graceful shutdown -------------------------------

  /** T6 — operational observability: start/progress/termination events from
    * every streaming query on the session, forwarded to `log` and kept in a
    * BOUNDED ring of the most recent `keep` events (a long-lived listener
    * must not grow driver memory; the reference's consumer stats +
    * close-path logging, event_consumer.py:196-204,216-220 /
    * lake_writer.py:221-226). Attach with
    * `spark.streams.addListener(listener)`. */
  final class GraftQueryListener(log: String => Unit = s => Console.err.println(s),
      keep: Int = 1000)
      extends org.apache.spark.sql.streaming.StreamingQueryListener {
    import org.apache.spark.sql.streaming.StreamingQueryListener._
    private val recorded = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    private def record(s: String): Unit = {
      recorded.add(s)
      while (recorded.size > keep) recorded.poll()
      log(s)
    }
    def events: Seq[String] = {
      val it = recorded.iterator()
      val b = Seq.newBuilder[String]
      while (it.hasNext) b += it.next()
      b.result()
    }
    override def onQueryStarted(e: QueryStartedEvent): Unit =
      record(s"started ${e.id} name=${e.name}")
    override def onQueryProgress(e: QueryProgressEvent): Unit =
      record(s"progress ${e.progress.id} batch=${e.progress.batchId} " +
        s"rows=${e.progress.numInputRows}")
    override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
      record(s"terminated ${e.id} exception=${e.exception.getOrElse("none")}")
  }

  /** T6 — graceful shutdown: drain what the source has already made
    * available (the reference's final buffer flush before close,
    * event_consumer.py:216-220), then stop and wait for termination. The
    * drain is BOUNDED by `drainTimeoutMs`: `processAllAvailable` can block
    * forever against a source that keeps producing, so it runs on a
    * daemon thread and we give up draining (not stopping) when the budget
    * is spent — the checkpoint makes the undrained remainder safe to
    * replay (T1); this just makes the common case CLEAN. Returns true if
    * the query terminated within `timeoutMs` of the stop call. */
  def gracefulStop(q: StreamingQuery, timeoutMs: Long = 30000L,
      drainTimeoutMs: Long = 30000L): Boolean = {
    val drain = new Thread(() =>
      try q.processAllAvailable() catch { case _: Throwable => () })
    drain.setDaemon(true)
    drain.start()
    drain.join(drainTimeoutMs)
    q.stop()
    q.awaitTermination(timeoutMs)
  }
}
