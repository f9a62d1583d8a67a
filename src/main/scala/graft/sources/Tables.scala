package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

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
  def orders(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame  = read(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "embeddings")

  /** `events.parquet` stores `ts` as parquet TIMESTAMP(NANOS), which Spark
    * only reads with `spark.sql.legacy.parquet.nanosAsLong=true` (as a raw
    * nanosecond LongType). Normalize to TimestampType by truncating to
    * microseconds — the same truncation DuckDB applies, so oracle
    * comparisons agree.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = read(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        // integer division — double division here loses micros (ns values
        // exceed double's 2^53 integer range after /1000 rounding)
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw
    }
  }

  /** Register all tables as temp views for `spark.sql` entry points. */
  def registerAll(spark: SparkSession, dir: String): Unit = {
    names.filterNot(_ == "events").foreach { n =>
      read(spark, dir, n).createOrReplaceTempView(n)
    }
    events(spark, dir).createOrReplaceTempView("events")
  }
}
