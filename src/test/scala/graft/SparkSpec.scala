package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession fixture for all specs. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session
  val sf0001 = "/root/testdata/sf0.001"
  val sf001  = "/root/testdata/sf0.01"

  /** Shared events.parquet fixture writer — the one copy of the events
    * schema test tables are built from.
    * Rows: (event_id, ts, user_id, event_type, value, props). */
  def eventsDir(rows: Seq[(Long, java.sql.Timestamp, Long, String, Double, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("events").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      // 3 task attempts: local-mode default (maxFailures=1) turns any
      // injected task failure into a job failure, which makes the retry
      // semantics the CC convergence accumulator relies on untestable
      // (ConnectedComponentsSpec's flaky-once test). Retries only engage
      // when a task actually fails, so other specs are unaffected.
      .master("local[4, 3]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
