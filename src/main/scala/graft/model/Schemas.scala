package graft.model

import java.sql.Timestamp
import org.apache.spark.sql.types._

/** The event data model — Scala mirror of the reference's Pydantic schemas
  * (`/root/reference/data/schemas/events.py`). Schemas are fixed and nominal
  * (events.py:29-67 enums as controlled vocabularies) and enforced at the
  * ingestion boundary; production paths never infer schemas.
  */
object Schemas {

  // ---- controlled vocabularies (events.py:32-67) ---------------------------

  /** ClickEventType — events.py:32-39 (7 values). */
  val ClickEventTypes: Seq[String] = Seq(
    "page_view", "product_view", "add_to_cart", "remove_from_cart",
    "search", "filter_apply", "wishlist_add")

  /** OrderStatus — events.py:42-48 (6 values). */
  val OrderStatuses: Seq[String] = Seq(
    "created", "confirmed", "paid", "shipped", "delivered", "cancelled")

  /** CDCOperation — events.py:51-61. */
  val CdcOperations: Seq[String] = Seq("INSERT", "UPDATE", "DELETE")

  /** DeviceType — events.py:64-67. */
  val DeviceTypes: Seq[String] = Seq("mobile", "desktop", "tablet")

  // ---- case classes (typed Dataset surface) --------------------------------

  /** BaseEvent envelope — events.py:74-87. `user_id=None` = anonymous
    * (events.py:83). */
  case class UserClickEvent(
    event_id: String, event_type: String, timestamp: Timestamp,
    session_id: String, user_id: Option[String],
    click_type: String, page_url: String,
    referrer_url: Option[String], product_id: Option[String],
    category: Option[String], search_query: Option[String],
    device_type: String, browser: Option[String],
    country_code: Option[String], ip_address: Option[String],
    utm_source: Option[String], utm_medium: Option[String],
    utm_campaign: Option[String])

  /** OrderItem with the canonical derived column
    * `line_total = quantity*unit_price*(1-discount_pct/100)`
    * (events.py:133-144). */
  case class OrderItem(
    product_id: String, product_name: String, category: String,
    quantity: Int, unit_price: Double, discount_pct: Double) {
    def lineTotal: Double = quantity * unit_price * (1 - discount_pct / 100)
  }

  /** OrderEvent — events.py:147-177; total/items invariant ±0.01
    * (events.py:167-177). */
  case class OrderEvent(
    event_id: String, event_type: String, timestamp: Timestamp,
    session_id: String, user_id: Option[String],
    order_id: String, order_status: String, items: Seq[OrderItem],
    total_amount: Double, currency: String,
    shipping_country: Option[String], shipping_city: Option[String],
    payment_method: Option[String])

  /** Inventory row state — events.py:190-198. */
  case class InventoryState(
    product_id: String, product_name: Option[String], sku: Option[String],
    stock_quantity: Int, reorder_level: Int, warehouse_id: Option[String],
    last_updated: Option[Timestamp])

  /** Debezium-style CDC envelope — events.py:201-222; INSERT ⇒ after,
    * DELETE ⇒ before (events.py:215-222); `lsn` orders state (events.py:213). */
  case class InventoryCDCEvent(
    event_id: String, event_type: String, timestamp: Timestamp,
    session_id: String, user_id: Option[String],
    operation: String, table_name: String,
    before: Option[InventoryState], after: Option[InventoryState],
    lsn: String)

  /** ProcessedEvent — the declared Spark enrichment output
    * (events.py:230-253). */
  case class ProcessedEvent(
    event_id: String, event_type: String, timestamp: Timestamp,
    user_id: Option[String], session_id: String,
    processing_timestamp: Timestamp,
    is_bot: Boolean, user_segment: String, geo_region: String,
    raw_payload: Map[String, String],
    has_missing_fields: Boolean, quality_score: Double)

  // ---- explicit StructTypes (untyped DataFrame / from_json surface) --------

  private def s(n: String, nullable: Boolean = true) = StructField(n, StringType, nullable)
  private def ts(n: String, nullable: Boolean = true) = StructField(n, TimestampType, nullable)

  private val envelope = Seq(
    s("event_id", nullable = false), s("event_type", nullable = false),
    ts("timestamp", nullable = false), s("session_id", nullable = false),
    s("user_id"))

  val userClickSchema: StructType = StructType(envelope ++ Seq(
    s("click_type", nullable = false), s("page_url", nullable = false),
    s("referrer_url"), s("product_id"), s("category"), s("search_query"),
    s("device_type", nullable = false), s("browser"), s("country_code"),
    s("ip_address"), s("utm_source"), s("utm_medium"), s("utm_campaign")))

  val orderItemSchema: StructType = StructType(Seq(
    s("product_id", nullable = false), s("product_name", nullable = false),
    s("category", nullable = false),
    StructField("quantity", IntegerType, nullable = false),
    StructField("unit_price", DoubleType, nullable = false),
    StructField("discount_pct", DoubleType, nullable = false)))

  val orderSchema: StructType = StructType(envelope ++ Seq(
    s("order_id", nullable = false), s("order_status", nullable = false),
    StructField("items", ArrayType(orderItemSchema), nullable = false),
    StructField("total_amount", DoubleType, nullable = false),
    s("currency"), s("shipping_country"), s("shipping_city"),
    s("payment_method")))

  val inventoryStateSchema: StructType = StructType(Seq(
    s("product_id", nullable = false), s("product_name"), s("sku"),
    StructField("stock_quantity", IntegerType, nullable = false),
    StructField("reorder_level", IntegerType, nullable = false),
    s("warehouse_id"), ts("last_updated")))

  val inventoryCdcSchema: StructType = StructType(envelope ++ Seq(
    s("operation", nullable = false), s("table_name"),
    StructField("before", inventoryStateSchema),
    StructField("after", inventoryStateSchema),
    s("lsn", nullable = false)))

  val processedSchema: StructType = StructType(Seq(
    s("event_id", nullable = false), s("event_type", nullable = false),
    ts("timestamp", nullable = false), s("user_id"),
    s("session_id", nullable = false), ts("processing_timestamp", nullable = false),
    StructField("is_bot", BooleanType, nullable = false),
    s("user_segment"), s("geo_region"),
    StructField("raw_payload", MapType(StringType, StringType)),
    StructField("has_missing_fields", BooleanType, nullable = false),
    StructField("quality_score", DoubleType, nullable = false)))

  /** Topic → schema binding (TOPIC_SCHEMA_MAP, events.py:260-265); unknown
    * topics have no schema and are dropped at the boundary
    * (event_consumer.py:82-85). */
  val topicSchemaMap: Map[String, StructType] = Map(
    "ecommerce.user_clicks"      -> userClickSchema,
    "ecommerce.orders"           -> orderSchema,
    "ecommerce.inventory_cdc"    -> inventoryCdcSchema,
    "ecommerce.processed_events" -> processedSchema)
}
