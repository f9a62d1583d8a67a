package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
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
}
