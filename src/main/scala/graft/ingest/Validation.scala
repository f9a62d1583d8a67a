package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.model.Schemas

/** Per-event validation and quality checks (SURVEY P1–P12), compiled to
  * boolean Columns — the Spark rewrite of the reference's row-at-a-time
  * checkers (`/root/reference/data/quality/expectations.py:39-171`).
  *
  * Each check is a named violation column; `violationCount` sums them and
  * `qualityScore` applies the reference's formula
  * `score = max(0, 1 - k·violations)` (expectations.py:94,134,159).
  * All checks are codegen-friendly expressions — a 100 TB validation pass is
  * a single map-side scan, no shuffle, no UDFs.
  */
object Validation {

  /** Violation weight per event family (expectations.py:94,134,159). */
  val ClickK  = 0.2
  val OrderK  = 0.25
  val CdcK    = 0.3

  /** Order-total reconciliation tolerances: schema boundary ±0.01
    * (events.py:173), quality layer ±0.50 (expectations.py:129). */
  val SchemaTolerance  = 0.01
  val QualityTolerance = 0.50

  /** Staleness/future thresholds (expectations.py:85-89). */
  val StaleHours  = 24
  val FutureHours = 1

  // ---- generic predicates --------------------------------------------------

  /** P9 — required-field null checks (expectations.py:57-60,100-103). */
  def missingRequired(fields: Seq[String]): Column =
    fields.map(f => col(f).isNull.cast("int")).reduce(_ + _) > 0

  /** P2 — non-blank page_url (events.py:121-125). */
  def blankUrl(c: Column): Column = c.isNull || length(trim(c)) === 0

  /** P6 — URL prefix check (expectations.py:75-77). */
  def badUrlPrefix(c: Column): Column =
    !(c.startsWith("http://") || c.startsWith("https://"))

  /** P5 — enum-domain predicate (expectations.py:63-72,140-142,311-319). */
  def outOfDomain(c: Column, domain: Seq[String]): Column = !c.isin(domain: _*)

  /** P7 — timestamp staleness/future flags relative to a reference instant
    * (expectations.py:80-91): age > 24 h ⇒ stale, < −1 h ⇒ future.
    * Flag, not drop (T2). */
  def stale(tsCol: Column, now: Column): Column =
    tsCol < now - expr(s"INTERVAL $StaleHours HOURS")
  def future(tsCol: Column, now: Column): Column =
    tsCol > now + expr(s"INTERVAL $FutureHours HOURS")

  // ---- per-family violation sets -------------------------------------------

  /** Click-event violations (expectations.py:52-95). */
  def clickViolations(now: Column): Seq[(String, Column)] = Seq(
    "missing_required" -> missingRequired(Seq("event_id", "session_id", "click_type", "page_url")),
    "blank_url"        -> blankUrl(col("page_url")),
    "bad_url_prefix"   -> (!col("page_url").isNull && badUrlPrefix(col("page_url"))),
    "bad_click_type"   -> outOfDomain(col("click_type"), Schemas.ClickEventTypes),
    "bad_device_type"  -> outOfDomain(col("device_type"), Schemas.DeviceTypes),
    "stale_ts"         -> stale(col("timestamp"), now),
    "future_ts"        -> future(col("timestamp"), now))

  /** P4 — order-total reconciliation via a higher-order fold over items
    * (events.py:167-177 / expectations.py:123-132): no explode, no shuffle. */
  def itemsTotal: Column =
    aggregate(col("items"), lit(0.0), (acc, i) =>
      acc + i.getField("quantity") * i.getField("unit_price") *
        (lit(1.0) - i.getField("discount_pct") / 100))

  /** Order-event violations (expectations.py:97-134). */
  def orderViolations: Seq[(String, Column)] = Seq(
    "missing_required" -> missingRequired(Seq("event_id", "order_id", "order_status", "total_amount")),
    "bad_status"       -> outOfDomain(col("order_status"), Schemas.OrderStatuses),
    "negative_total"   -> (col("total_amount") < 0),
    "suspicious_total" -> (col("total_amount") > 100000),
    "empty_items"      -> (col("items").isNull || size(col("items")) === 0),
    "bad_item"         -> (size(filter(col("items"), i =>
                              i.getField("quantity") <= 0 || i.getField("unit_price") <= 0.0 ||
                              i.getField("discount_pct") < 0 || i.getField("discount_pct") > 100)) > 0),
    "total_mismatch"   -> (abs(col("total_amount") - itemsTotal) > QualityTolerance))

  /** CDC-event violations (expectations.py:136-159; op-shape
    * events.py:215-222). */
  def cdcViolations: Seq[(String, Column)] = Seq(
    "missing_required" -> missingRequired(Seq("event_id", "operation", "lsn")),
    "bad_operation"    -> outOfDomain(col("operation"), Schemas.CdcOperations),
    "insert_no_after"  -> (col("operation") === "INSERT" && col("after").isNull),
    "delete_no_before" -> (col("operation") === "DELETE" && col("before").isNull),
    "negative_stock"   -> (coalesce(col("after.stock_quantity"), lit(0)) < 0))

  // ---- scoring + split -----------------------------------------------------

  def violationCount(vs: Seq[(String, Column)]): Column =
    vs.map { case (_, c) => coalesce(c.cast("int"), lit(0)) }.reduce(_ + _)

  /** P10 — `score = max(0, 1 − k·violations)` (expectations.py:94). */
  def qualityScore(violations: Column, k: Double): Column =
    greatest(lit(0.0), lit(1.0) - lit(k) * violations)

  /** Annotate a DataFrame with per-check flags, violation count, quality
    * score, and `has_missing_fields` (ProcessedEvent quality flags,
    * events.py:249-250). */
  def annotate(df: DataFrame, vs: Seq[(String, Column)], k: Double): DataFrame = {
    val flagged = vs.foldLeft(df) { case (d, (name, c)) =>
      d.withColumn(s"v_$name", coalesce(c.cast("int"), lit(0)))
    }
    val vcount = vs.map { case (n, _) => col(s"v_$n") }.reduce(_ + _)
    flagged
      .withColumn("violation_count", vcount)
      .withColumn("quality_score", qualityScore(col("violation_count"), k))
      .withColumn("has_missing_fields", col("v_missing_required") === 1)
  }

  /** P1/S10 — valid / dead-letter split. The reference drops invalid rows
    * with a log line (event_consumer.py:87-92,187-191, dead-letter TODO at
    * :75); we route them to a quarantine DataFrame instead. Rows with any
    * hard violation (missing required / domain / shape) quarantine; soft
    * flags (stale, future) only lower the score (flag-not-drop, T2). */
  def split(annotated: DataFrame, hard: Seq[String]): (DataFrame, DataFrame) = {
    val isDead = hard.map(n => col(s"v_$n") === 1).reduce(_ || _)
    (annotated.filter(!isDead), annotated.filter(isDead))
  }
}
