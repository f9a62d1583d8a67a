package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ingest.Validation
import graft.sources.Tables

/** The declared Spark-enrichment surface (`ProcessedEvent`,
  * events.py:230-253): `is_bot`, `user_segment`, `geo_region` plus the
  * gold-layer business aggregations (lake_writer.py:18-21).
  *
  * The reference leaves these unimplemented ("ML model prediction",
  * events.py:243); we provide deterministic rule-based stand-ins with the
  * documented output vocabulary ("high_value" / "at_risk", events.py:244) so
  * oracle tests stay stable while a real model can slot into the same
  * column contract.
  */
object Enrich {

  /** Per-user enrichment: event volume + value → segment and bot flag.
    * One groupBy(user_id) — a single keyed shuffle; at 100 TB this is the
    * canonical pre-aggregated user-stats build (U3: segment rules need no
    * UDF, just when/otherwise over aggregates). */
  def userSegments(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_events"),
        // exact cents math — order-independent across engines (SURVEY §7.4.1)
        (sum(round(col("value") * 100, 0).cast("long")) / 100.0).as("total_value"),
        countDistinct(col("event_type")).as("n_types"))
      .withColumn("is_bot", (col("n_events") > 200).cast("long")) // rate heuristic (U1)
      .withColumn("user_segment",
        when(col("total_value") > 10000, "high_value")
          .when(col("n_events") < 20, "at_risk")
          .otherwise("regular"))
      .select("user_id", "n_events", "total_value", "n_types", "is_bot", "user_segment")
      .orderBy("user_id")

  /** Gold-layer daily rollup (A10/S6): aggregations partitioned by
    * date + category — here date × event_type over the event stream. The
    * date string doubles as the partition key a gold sink writes
    * `partitionBy("date")`. */
  def goldDaily(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(
        date_format(col("ts"), "yyyy-MM-dd").as("event_date"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        (sum(round(col("value") * 100, 0).cast("long")) / 100.0).as("total_value"))
      .withColumn("avg_value", col("total_value") / col("n_events"))
      .orderBy("event_date", "event_type")

  /** U2 — country_code → region lookup. The producer's 6-country domain
    * (event_producer.py:104: US/IN/GB/DE/CA/AU) as a deterministic
    * when-chain — a 6-entry dimension needs no UDF and no join; at a larger
    * domain this becomes `events.join(broadcast(geoDim), "country_code")`
    * (J1 shape). */
  def geoRegion(countryCode: Column): Column = {
    val regions = Seq(
      "US" -> "NA", "CA" -> "NA",
      "GB" -> "EU", "DE" -> "EU",
      "IN" -> "APAC", "AU" -> "APAC")
    regions.foldRight(lit("OTHER")) { case ((cc, region), els) =>
      when(countryCode === cc, region).otherwise(els)
    }
  }

  /** The full ProcessedEvent builder (events.py:230-253): validated click
    * events → enrichment columns + quality flags, in the declared output
    * shape.
    *
    * `is_bot` is the documented "ML model prediction" slot (events.py:243)
    * implemented as a deterministic click-rate rule (session > 30 events or
    * > 1 event/sec sustained); `user_segment` (events.py:244) derives from
    * per-user activity; `raw_payload` (events.py:246) carries the original
    * click context as a string map.
    *
    * Plan shape: one groupBy(session_id) + one groupBy(user_id) aggregate,
    * each joined back — two keyed shuffles total, both partitionable at
    * 100 TB (session/user keys are the Kafka partition keys already,
    * event_producer.py:294). */
  def processedEvents(clicks: DataFrame, now: Column): DataFrame = {
    val annotated = Validation.annotate(
      clicks, Validation.clickViolations(now), Validation.ClickK)

    val sessionStats = annotated.groupBy("session_id").agg(
      count(lit(1)).as("s_events"),
      (unix_micros(max(col("timestamp"))) - unix_micros(min(col("timestamp"))))
        .as("s_span_us"))
      .withColumn("s_rate",
        when(col("s_span_us") > 0, col("s_events") * lit(1000000.0) / col("s_span_us"))
          .otherwise(lit(0.0)))

    val userStats = annotated.filter(col("user_id").isNotNull)
      .groupBy("user_id").agg(count(lit(1)).as("u_events"))

    annotated
      .join(sessionStats, Seq("session_id"), "left")
      .join(userStats, Seq("user_id"), "left")
      .select(
        col("event_id"), col("event_type"), col("timestamp"),
        col("user_id"), col("session_id"),
        now.as("processing_timestamp"),
        (col("s_events") > 30 || col("s_rate") > 1.0).as("is_bot"),
        when(col("user_id").isNull, "anonymous")
          .when(col("u_events") >= 20, "high_value")
          .when(col("u_events") < 3, "at_risk")
          .otherwise("regular").as("user_segment"),
        geoRegion(col("country_code")).as("geo_region"),
        map(
          lit("click_type"), col("click_type"),
          lit("page_url"), col("page_url"),
          lit("device_type"), col("device_type")).as("raw_payload"),
        col("has_missing_fields"),
        col("quality_score"))
  }

  /** Streaming ProcessedEvent builder: per-row enrichment + a STREAM-STATIC
    * join against a precomputed user-stats snapshot (the production
    * pattern — stats rebuilt by the nightly batch, streamed clicks joined
    * live; no streaming aggregation state needed, so the plan stays
    * append-mode). No broadcast hint: the user dimension is unbounded at
    * scale — size-based planning broadcasts a small snapshot and falls
    * back to a shuffled stream-static join when it outgrows the limit. */
  def processedEventsStreaming(clickStream: DataFrame,
      userStats: DataFrame): DataFrame = {
    val annotated = Validation.annotate(
      clickStream, Validation.clickViolations(current_timestamp()), Validation.ClickK)
    annotated
      .join(userStats, Seq("user_id"), "left")
      .select(
        col("event_id"), col("event_type"), col("timestamp"),
        col("user_id"), col("session_id"),
        current_timestamp().as("processing_timestamp"),
        coalesce(col("is_bot_hint"), lit(false)).as("is_bot"),
        coalesce(col("segment_hint"),
          when(col("user_id").isNull, "anonymous").otherwise("regular"))
          .as("user_segment"),
        geoRegion(col("country_code")).as("geo_region"),
        map(
          lit("click_type"), col("click_type"),
          lit("page_url"), col("page_url"),
          lit("device_type"), col("device_type")).as("raw_payload"),
        col("has_missing_fields"),
        col("quality_score"))
  }

  /** Q92 — BURST detection by inter-event arrival gaps: the behavioral
    * bot/scraper signal the rule-based `is_bot` hint can't see — per user,
    * the gap distribution (min / exact interpolated median) and a
    * sub-second-gap count whose threshold (≥ 3) raises the burst flag.
    * Gaps are exact micros LONGs (integer subtraction of the normalized
    * event clock — engine-identical); the median is the q45-proved
    * percentile == quantile_cont parity. Plan shape: one user-keyed window
    * for the lag + one user-keyed aggregate — a single shuffle on
    * user_id, partitions bounded by per-user event counts. Reference:
    * events.py:243's "ML model prediction" placeholder, replaced by a
    * deterministic behavioral rule. */
  def burstDetect(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Portable.pround
    val byUser = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"))
      .withColumn("gap", col("ts_us") - lag("ts_us", 1).over(byUser))
      .filter(col("gap").isNotNull)
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_gaps"),
        min("gap").as("min_gap_us"),
        pround(expr("percentile(gap, 0.5)"), 4).as("median_gap_us"),
        sum(when(col("gap") < 1000000L, lit(1L)).otherwise(lit(0L)))
          .as("n_sub_second"))
      .withColumn("burst_flag", (col("n_sub_second") >= 3).cast("long"))
      .orderBy("user_id")
  }
}
