package graft

import org.apache.spark.sql.functions._
import graft.ingest.Validation
import graft.model.Schemas
import graft.streaming.Streaming

/** P1–P12 validation over the FIXTURES.md §B event shapes. */
class ValidationSpec extends SparkSpec {
  import spark.implicits._

  private val validClick =
    """{"event_id":"c0ffee00-0000-4000-8000-000000000001","event_type":"user_click",
      |"timestamp":"2024-01-15T14:05:23.000000","session_id":"s1","user_id":"u1",
      |"click_type":"product_view","page_url":"https://shop.example.com/products/P001",
      |"device_type":"mobile","browser":"Chrome","country_code":"US"}"""
      .stripMargin.replaceAll("\n", "")

  private def clickDf(jsons: String*) =
    jsons.toSeq.toDF("value")
      .select(from_json($"value", Schemas.userClickSchema).as("p")).select("p.*")

  test("valid click has zero violations, score 1.0") {
    val now = to_timestamp(lit("2024-01-15T15:00:00"))
    val df = Validation.annotate(clickDf(validClick), Validation.clickViolations(now), Validation.ClickK)
    val row = df.select("violation_count", "quality_score", "has_missing_fields").head()
    assert(row.getInt(0) == 0)
    assert(row.getDouble(1) == 1.0)
    assert(!row.getBoolean(2))
  }

  test("each invalid click variant is flagged with k=0.2 score decrement") {
    val now = to_timestamp(lit("2024-01-15T15:00:00"))
    val badUrl = validClick.replace("https://shop.example.com/products/P001", "notaurl")
    val badType = validClick.replace("product_view", "nonsense_click")
    val staleTs = validClick.replace("2024-01-15T14:05:23.000000", "2024-01-10T00:00:00.000000")
    val df = Validation.annotate(clickDf(badUrl, badType, staleTs),
      Validation.clickViolations(now), Validation.ClickK)
    val scores = df.select("violation_count", "quality_score").collect()
    assert(scores.forall(r => r.getInt(0) == 1 && math.abs(r.getDouble(1) - 0.8) < 1e-9))
  }

  test("anonymous user (null user_id) is legal — events.py:83") {
    val anon = validClick.replace("\"user_id\":\"u1\",", "\"user_id\":null,")
    val now = to_timestamp(lit("2024-01-15T15:00:00"))
    val df = Validation.annotate(clickDf(anon), Validation.clickViolations(now), Validation.ClickK)
    assert(df.select("violation_count").head().getInt(0) == 0)
  }

  test("order total invariant: ±0.50 quality tolerance — expectations.py:129") {
    val mk = (total: Double) =>
      s"""{"event_id":"e1","event_type":"order","timestamp":"2024-01-15T14:23:01",
         |"session_id":"s1","user_id":"u1","order_id":"ORD-1","order_status":"confirmed",
         |"items":[{"product_id":"P001","product_name":"X","category":"C","quantity":2,
         |"unit_price":79.99,"discount_pct":10.0}],"total_amount":$total,"currency":"USD"}"""
        .stripMargin.replaceAll("\n", "")
    // true total = 2*79.99*0.9 = 143.982
    val df = Seq(mk(143.98), mk(145.0)).toDF("value")
      .select(from_json($"value", Schemas.orderSchema).as("p")).select("p.*")
    val ann = Validation.annotate(df, Validation.orderViolations, Validation.OrderK)
    val flags = ann.orderBy("total_amount").select("v_total_mismatch").collect().map(_.getInt(0))
    assert(flags.toSeq == Seq(0, 1))
  }

  test("CDC op-shape: INSERT requires after, DELETE requires before — events.py:215-222") {
    val mk = (op: String, before: String, after: String) =>
      s"""{"event_id":"e1","event_type":"inventory_cdc","timestamp":"2024-01-15T14:30:00",
         |"session_id":"s1","user_id":null,"operation":"$op","table_name":"inventory",
         |"before":$before,"after":$after,"lsn":"0/1"}"""
        .stripMargin.replaceAll("\n", "")
    val state = """{"product_id":"P3","stock_quantity":5,"reorder_level":10}"""
    val df = Seq(
      mk("INSERT", "null", state),  // ok
      mk("INSERT", "null", "null"), // violation
      mk("DELETE", state, "null"),  // ok
      mk("DELETE", "null", "null")  // violation
    ).toDF("value").select(from_json($"value", Schemas.inventoryCdcSchema).as("p")).select("p.*")
    val ann = Validation.annotate(df, Validation.cdcViolations, Validation.CdcK)
    assert(ann.agg(sum("v_insert_no_after"), sum("v_delete_no_before")).head().toSeq == Seq(1, 1))
  }

  test("dead-letter split quarantines malformed JSON, keeps valid rows") {
    val raw = Seq(validClick, "{not valid json", """{"foo": 1}""")
      .toDF("value").select($"value".cast("binary").as("value"))
    val (ok, dead) = Streaming.splitParsed(raw, "ecommerce.user_clicks").get
    assert(ok.count() == 1)
    assert(dead.count() == 2)
    assert(Streaming.splitParsed(raw, "unknown.topic").isEmpty) // consumer drop path
  }
}
