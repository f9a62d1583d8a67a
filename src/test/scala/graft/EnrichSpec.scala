package graft

import org.apache.spark.sql.functions._
import graft.analytics.Enrich
import graft.model.Schemas

/** U1–U3: the ProcessedEvent builder (events.py:230-253). */
class EnrichSpec extends SparkSpec {
  import spark.implicits._

  private def click(id: String, session: String, user: String, country: String,
      ts: String): String =
    s"""{"event_id":"$id","event_type":"user_click","timestamp":"$ts",
       |"session_id":"$session",${if (user == null) "\"user_id\":null," else s"\"user_id\":\"$user\","}
       |"click_type":"page_view","page_url":"https://x.com/p","device_type":"mobile",
       |"country_code":"$country"}""".stripMargin.replaceAll("\n", "")

  test("processedEvents produces the declared output shape with enrichment") {
    val rows =
      // bot session: 40 events in 20 seconds
      (1 to 40).map(i => click(s"b$i", "bot-s", "bot-u", "US",
        f"2024-01-15T10:00:${i % 60}%02d")) ++
      // regular user, distinct sessions
      (1 to 5).map(i => click(s"r$i", s"reg-s$i", "reg-u", "DE",
        f"2024-01-15T1$i%d:00:00")) ++
      // anonymous single event
      Seq(click("a1", "anon-s", null, "XX", "2024-01-15T12:00:00"))
    val df = rows.toSeq.toDF("value")
      .select(from_json($"value", Schemas.userClickSchema).as("p")).select("p.*")
    val out = Enrich.processedEvents(df, to_timestamp(lit("2024-01-15T13:00:00")))

    assert(out.columns.toSeq == Seq("event_id", "event_type", "timestamp", "user_id",
      "session_id", "processing_timestamp", "is_bot", "user_segment", "geo_region",
      "raw_payload", "has_missing_fields", "quality_score"))

    val byId = out.collect().map(r => r.getString(0) -> r).toMap
    assert(byId("b1").getAs[Boolean]("is_bot"))          // 40 events, >1/s
    assert(!byId("r1").getAs[Boolean]("is_bot"))
    assert(byId("b1").getAs[String]("user_segment") == "high_value") // 40 events
    assert(byId("r1").getAs[String]("user_segment") == "regular")    // 5 events
    assert(byId("a1").getAs[String]("user_segment") == "anonymous")
    assert(byId("b1").getAs[String]("geo_region") == "NA")
    assert(byId("r1").getAs[String]("geo_region") == "EU")
    assert(byId("a1").getAs[String]("geo_region") == "OTHER")
    assert(byId("r1").getAs[Map[String, String]]("raw_payload")("click_type") == "page_view")
    assert(byId("r1").getAs[Double]("quality_score") == 1.0)
  }

  test("geoRegion maps the producer's 6-country domain — event_producer.py:104") {
    val df = Seq("US", "IN", "GB", "DE", "CA", "AU", "JP").toDF("cc")
      .select($"cc", Enrich.geoRegion($"cc").as("r"))
    val m = df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m == Map("US" -> "NA", "CA" -> "NA", "GB" -> "EU", "DE" -> "EU",
      "IN" -> "APAC", "AU" -> "APAC", "JP" -> "OTHER"))
  }

  test("streaming enrichment joins live clicks to a static user-stats snapshot") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc = spark.sqlContext
    val stats = Seq(("bot-u", true, "high_value"), ("reg-u", false, "regular"))
      .toDF("user_id", "is_bot_hint", "segment_hint")
    val in = MemoryStream[String]
    val clicks = in.toDF()
      .select(from_json($"value", Schemas.userClickSchema).as("p")).select("p.*")
    val out = Enrich.processedEventsStreaming(clicks, stats)
    val q = out.writeStream.format("memory").queryName("enrich_out")
      .outputMode("append").start()
    in.addData(
      click("e1", "s1", "bot-u", "US", "2024-01-15T10:00:00"),
      click("e2", "s2", "reg-u", "DE", "2024-01-15T10:00:01"),
      click("e3", "s3", null, "XX", "2024-01-15T10:00:02"))
    q.processAllAvailable()
    q.stop()
    val byId = spark.table("enrich_out").collect().map(r => r.getString(0) -> r).toMap
    assert(byId("e1").getAs[Boolean]("is_bot"))
    assert(byId("e1").getAs[String]("user_segment") == "high_value")
    assert(byId("e2").getAs[String]("user_segment") == "regular")
    assert(byId("e3").getAs[String]("user_segment") == "anonymous")
    assert(byId("e3").getAs[String]("geo_region") == "OTHER")
  }

  test("burst detect: sub-second gap runs raise the flag, paced users don't") {
    def ts(ms: Long) = new java.sql.Timestamp(1700000000000L + ms)
    val rows =
      (1 to 4).map(i => (i.toLong, ts(i * 500L), 1L, "click", 1.0, "{}")) ++
        (1 to 4).map(i => (10L + i, ts(i * 10000L), 2L, "click", 1.0, "{}"))
    val dir = eventsDir(rows)
    val r = graft.analytics.Enrich.burstDetect(spark, dir).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getDouble(3),
        x.getLong(4), x.getLong(5)))).toMap
    assert(r(1L) == ((3L, 500000L, 500000.0, 3L, 1L)), s"burst user: ${r(1L)}")
    assert(r(2L) == ((3L, 10000000L, 10000000.0, 0L, 0L)), s"paced user: ${r(2L)}")
  }

  test("event pivot: wide per-user counts fill absent types with 0") {
    def ts(s: Long) = new java.sql.Timestamp(1700000000000L + s * 1000)
    val dir = eventsDir(Seq(
      (1L, ts(1), 1L, "click", 1.0, "{}"),
      (2L, ts(2), 1L, "click", 1.0, "{}"),
      (3L, ts(3), 1L, "view", 1.0, "{}"),
      (4L, ts(4), 2L, "purchase", 1.0, "{}")))
    val r = graft.analytics.Relational.eventPivot(spark, dir).collect()
      .map(x => x.getLong(0) -> x.toSeq.drop(1)).toMap
    // columns: n_click, n_error, n_purchase, n_signup, n_view, n_total
    assert(r(1L) == Seq(2L, 0L, 0L, 0L, 1L, 3L), s"user 1: ${r(1L)}")
    assert(r(2L) == Seq(0L, 0L, 1L, 0L, 0L, 1L), s"user 2: ${r(2L)}")
    // melt inverts the reshape: 5 tidy rows per user, values preserved
    val m = graft.analytics.Relational.eventMelt(spark, dir).collect()
      .map(x => (x.getLong(0), x.getString(1)) -> x.getLong(2)).toMap
    assert(m.size == 10)
    assert(m((1L, "n_click")) == 2L && m((1L, "n_view")) == 1L)
    assert(m((2L, "n_purchase")) == 1L && m((2L, "n_click")) == 0L)
  }
}
