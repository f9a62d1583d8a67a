package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType
import graft.sources.Tables

/** The batch source layer's timestamp-normalization contract. */
class TablesSpec extends SparkSpec {

  test("normalizeTs fails loudly on a shifting session zone, accepts every UTC-equivalent spelling") {
    // force the TIMESTAMP_NTZ branch regardless of the fixture generation's
    // on-disk physical type: normalize under UTC, then re-write as NTZ
    val dir = java.nio.file.Files.createTempDirectory("ntz_events").toString
    Tables.events(spark, sf0001)
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val orig = spark.conf.get("spark.sql.session.timeZone")
    try {
      // a genuinely shifting zone must be an ERROR, not a silent shift —
      // the NTZ→TimestampType cast re-interprets wall clock under the
      // session zone, the wrong-answer-not-error failure a 100 TB
      // deployment cannot debug
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val e = intercept[IllegalArgumentException] { Tables.events(spark, dir).schema }
      assert(e.getMessage.contains("UTC"))
      // every zone whose RULES resolve to UTC passes — the guard compares
      // resolved rules, not id strings (round-8 review finding: a string
      // allowlist hard-failed GMT/Etc/Universal/+00:00 sessions whose
      // casts were in fact wall-clock-preserving)
      Seq("UTC", "Etc/UTC", "GMT", "Etc/Universal", "+00:00", "Z").foreach { z =>
        spark.conf.set("spark.sql.session.timeZone", z)
        val df = Tables.events(spark, dir)
        assert(df.schema("ts").dataType == TimestampType, s"zone $z")
        assert(df.limit(1).count() >= 0) // the cast actually executes
      }
    } finally spark.conf.set("spark.sql.session.timeZone", orig)
  }
}
