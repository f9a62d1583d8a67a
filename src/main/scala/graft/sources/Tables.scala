package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Batch source layer over the driver's parquet test tables (TESTDATA.md).
  *
  * Mirrors the reference's fixed, nominal schema system
  * (`/root/reference/data/schemas/events.py:260-265` binds topics to schemas;
  * unknown shapes are dropped at the boundary): every loader returns a
  * DataFrame whose schema is pinned by the parquet footer, and `events`
  * normalizes its timestamp to Spark's micro-precision `TimestampType`
  * regardless of the on-disk physical type.
  *
  * Scale note: these are plain `spark.read.parquet` scans, so Catalyst
  * predicate pushdown / column pruning apply to every downstream query; at
  * 100 TB the same loaders work unchanged over a partitioned lake directory
  * because the path is caller-supplied.
  */
object Tables {

  /** All driver test tables (single source of truth for warmups/registration). */
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  private def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(path(dir, name))

  def region(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = read(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame =
    normalizeTs(read(spark, dir, "orders"), "o_orderdate")
  def lineitem(spark: SparkSession, dir: String): DataFrame =
    normalizeTs(read(spark, dir, "lineitem"), "l_shipdate")
  def documents(spark: SparkSession, dir: String): DataFrame  = read(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "embeddings")

  /** `events.parquet` has shipped `ts` under two physical types across
    * driver data generations: parquet TIMESTAMP(NANOS), which Spark only
    * reads with `spark.sql.legacy.parquet.nanosAsLong=true` (as a raw
    * nanosecond LongType), and plain TIMESTAMP(MICROS) with
    * isAdjustedToUTC=false, which reads as TIMESTAMP_NTZ. Normalize both to
    * micro-precision `TimestampType`: nanos truncate to micros (the same
    * truncation DuckDB applies) and NTZ casts wall-clock-preserving under
    * the session's pinned UTC zone — so `unix_micros(ts)` yields identical
    * values either way and oracle comparisons agree.
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    normalizeTs(read(spark, dir, "events"), "ts")

  /** Normalize a timestamp column to micro-precision `TimestampType`
    * regardless of on-disk physical type (applies to `lineitem.l_shipdate`
    * and `orders.o_orderdate` too — the same driver regeneration that moved
    * `events.ts` to NTZ micros moved them as well). Nanos-as-long uses
    * integer `div` (double division loses micros past 2^53); NTZ casts
    * wall-clock-preserving under the session's pinned UTC zone.
    */
  private def normalizeTs(raw: DataFrame, colName: String): DataFrame =
    raw.schema(colName).dataType match {
      case LongType =>
        raw.withColumn(colName, timestamp_micros(expr(s"$colName div 1000")))
      case TimestampNTZType =>
        // the NTZ→TimestampType cast is wall-clock-preserving ONLY under a
        // UTC session zone; every builder in this library pins it, but a
        // caller-built session without the pin would silently shift every
        // normalized timestamp — fail loudly instead (ADVICE r7). The check
        // resolves the zone's RULES rather than matching id strings, so
        // every UTC-equivalent spelling (GMT, Etc/Universal, +00:00, …)
        // passes and only a genuinely shifting zone fails (ADVICE r8).
        val tz = raw.sparkSession.sessionState.conf.sessionLocalTimeZone
        val utcEquivalent = scala.util.Try(
          java.time.ZoneId.of(tz, java.time.ZoneId.SHORT_IDS).normalized() ==
            java.time.ZoneOffset.UTC).getOrElse(false)
        require(utcEquivalent,
          s"Tables.normalizeTs: session time zone must resolve to UTC to " +
            s"cast NTZ timestamps wall-clock-preserving, got '$tz' — set " +
            "spark.sql.session.timeZone=UTC in the session builder")
        raw.withColumn(colName, col(colName).cast(TimestampType))
      case _ => raw
    }

  /** Register all tables as temp views for `spark.sql` entry points
    * (through the normalizing loaders, so views see the same pinned
    * timestamp types as the DataFrame API). */
  def registerAll(spark: SparkSession, dir: String): Unit = {
    names.filterNot(n => n == "events" || n == "orders" || n == "lineitem")
      .foreach { n => read(spark, dir, n).createOrReplaceTempView(n) }
    orders(spark, dir).createOrReplaceTempView("orders")
    lineitem(spark, dir).createOrReplaceTempView("lineitem")
    events(spark, dir).createOrReplaceTempView("events")
  }
}
