package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Native event simulator (SURVEY §3.1): the Spark rewrite of the
  * reference's producer loop (`event_producer.py:319-371`) on the `rate`
  * source — the F13 "weighted random + rate control" surface without a
  * Kafka broker.
  *
  * Mix mirrors the roll thresholds (70% clicks / 20% orders / 10% CDC,
  * event_producer.py:322,333-355) deterministically via value % 10, and the
  * ~20-session pool (event_producer.py:92-98) via value % 20 — so tests can
  * assert exact proportions instead of sampling noise.
  */
object LoadGen {

  /** Deterministic event shaping over a (timestamp, value) frame — the rate
    * source's schema. Pure so batch tests can drive it directly. */
  def shape(rate: DataFrame): DataFrame =
    rate
      .withColumn("event_type",
        when(col("value") % 10 < 7, "user_click")        // 70%
          .when(col("value") % 10 < 9, "order")           // 20%
          .otherwise("inventory_cdc"))                    // 10%
      .withColumn("session_id", concat(lit("s"), col("value") % 20))
      .withColumn("user_id",
        when(col("value") % 10 < 3, lit(null).cast("string")) // ~30% anonymous
          .otherwise(concat(lit("u"), col("value") % 50)))
      .withColumn("event_id", concat(lit("e"), col("value")))
      .select(col("event_id"), col("event_type"), col("timestamp"),
        col("session_id"), col("user_id"))

  /** Streaming generator at `eventsPerSecond` (EVENTS_PER_SECOND default 5,
    * event_producer.py:55 — trivially exceeded; the honest target is the
    * docstring's "thousands/second", events.py:98). */
  def stream(spark: SparkSession, eventsPerSecond: Int = 1000): DataFrame =
    shape(spark.readStream.format("rate")
      .option("rowsPerSecond", eventsPerSecond).load())
}
