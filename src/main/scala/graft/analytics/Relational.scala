package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.Portable.pround
import graft.sources.Tables

/** The relational query contract (SURVEY.md §2.9, Q1–Q20 + Q24).
  *
  * Every query is a declarative DataFrame plan — Catalyst handles predicate
  * pushdown, column pruning, partial aggregation and join strategy; we only
  * add explicit `broadcast()` hints for dimension tables that stay small at
  * any scale (region/nation: fixed cardinality 5/25, cf. reference's 8-row
  * product catalog `event_producer.py:63-72`).
  *
  * Determinism rules (for the DuckDB-oracle hash compare, SURVEY §5.2 and
  * §7.4.1): explicit ORDER BY ending in a unique key; integers cast to
  * BIGINT on both sides; no raw timestamp output columns (epoch
  * micros/millis or formatted strings instead); and — the money rule —
  * SUMs of doubles go through exact fixed-point: every money column in the
  * test data is 2-decimal (discount/tax too), so `ROUND(x·10^s) :: BIGINT`
  * is exact, the integer SUM is order-independent, and one final division
  * yields bit-identical doubles in any engine regardless of aggregation
  * order. Per-row arithmetic needs no such care (same input double → same
  * output double everywhere).
  */
object Relational {

  /** Revenue expression — the reference's canonical derived column shape
    * (`line_total = qty*price*(1-disc)`, events.py:142-144) transplanted to
    * lineitem. */
  private def revenue: Column = col("l_extendedprice") * (lit(1.0) - col("l_discount"))

  /** Exact fixed-point: x·10^scale rounded to an integral long. Safe while
    * |x|·10^scale < 2^53 — money values here are ≤1e8·1e6 = 1e14. */
  private def fixed(c: Column, scale: Int): Column =
    round(c * math.pow(10, scale), 0).cast("long")

  /** Q1 — scan, pushed filter, projection. The shipdate predicate and the
    * 3-column projection both reach the parquet scan (PushedFilters +
    * ReadSchema), so at 100 TB only the matching row groups are read. */
  def q01(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
              col("l_shipdate") <  lit("1998-01-01").cast("timestamp"))
      .select(
        col("l_orderkey"),
        col("l_linenumber").cast("long").as("l_linenumber"),
        pround(revenue, 2).as("revenue"))
      .orderBy("l_orderkey", "l_linenumber")

  /** Q2 — TPC-H-Q1-style pricing summary: single hash aggregate with
    * map-side partial aggregation; 6 grouped rows, no skew at any scale. */
  def q02(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum("l_quantity").as("sum_qty"), // integral-valued doubles: exact
        (sum(fixed(col("l_extendedprice"), 2)) / 100.0).as("sum_base_price"),
        (sum(fixed(revenue, 4)) / 10000.0).as("sum_disc_price"),
        (sum(fixed(revenue * (lit(1.0) + col("l_tax")), 6)) / 1000000.0).as("sum_charge"),
        avg("l_quantity").as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Q3 — multi-way equi join: customer ⋈ orders ⋈ lineitem ⋈ nation.
    * The fact-side joins (orders⋈lineitem, ⋈customer) shuffle on their keys;
    * nation is a fixed-25-row dimension → broadcast, so the final join adds
    * no exchange. */
  def q03(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    val l = Tables.lineitem(spark, dir)
    val n = Tables.nation(spark, dir)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy("n_name")
      .agg((sum(fixed(revenue, 4)) / 10000.0).as("revenue"))
      .orderBy(desc("revenue"), col("n_name"))
  }

  /** Q3 rewritten through [[ScaleJoins.saltedJoin]] — the skew-safe form for
    * a corpus where a handful of customers own most orders (the real-world
    * shape TPC-H's uniform keys don't have). Facts (lineitem⋈orders) carry a
    * random salt and the customer×nation dimension is replicated across the
    * salt range, so the customer join shuffles on (c_custkey, _salt): one hot
    * customer spreads over `saltFactor` reducers instead of pinning one.
    * Result is row-identical to [[q03]] (same oracle) — only the shuffle key
    * changes. AQE's skew split handles moderate skew without this; salting is
    * the deliberate version for pathological keys known in advance. */
  def q03SkewSafe(spark: SparkSession, dir: String, saltFactor: Int = 8): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    val l = Tables.lineitem(spark, dir)
    val n = Tables.nation(spark, dir)
    val facts = l.join(o, l("l_orderkey") === o("o_orderkey"))
      .select(col("o_custkey").as("c_custkey"),
        col("l_extendedprice"), col("l_discount"))
    val dim = c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .select(col("c_custkey"), col("n_name"))
    ScaleJoins.saltedJoin(facts, dim, "c_custkey", saltFactor)
      .groupBy("n_name")
      .agg((sum(fixed(revenue, 4)) / 10000.0).as("revenue"))
      .orderBy(desc("revenue"), col("n_name"))
  }

  /** Q4 — broadcast-only join chain: supplier ⋈ nation ⋈ region. Both
    * dimensions are broadcast; the plan has zero shuffles before the final
    * 5-row aggregate. */
  def q04(spark: SparkSession, dir: String): DataFrame = {
    val s = Tables.supplier(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    s.join(broadcast(n), s("s_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy("r_name")
      .agg(count(lit(1)).as("n_suppliers"))
      .orderBy("r_name")
  }

  /** Q5 — LEFT SEMI (EXISTS): customers with at least one order (J3 — the
    * "identified user with non-empty cart" selection,
    * event_producer.py:168-171). */
  def q05(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir).select(col("o_custkey"))
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** Q6 — LEFT ANTI (NOT EXISTS): customers with zero orders (J4, the
    * funnel-drop complement). */
  def q06(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir).select(col("o_custkey"))
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** Q7 — per-group top-k via row_number. One shuffle on o_custkey;
    * Spark's WindowGroupLimit pushes the rank filter below the sort so only
    * k rows per key survive. */
  def q07(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(desc("o_totalprice"), col("o_orderkey"))
    Tables.orders(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("rn").cast("long").as("rn"),
        col("o_orderkey"), col("o_totalprice"))
      .orderBy("o_custkey", "rn")
  }

  /** Q8 — lag/lead sequence analytics over the event stream, partitioned by
    * user (per-session ordering is the reference's only order guarantee,
    * event_producer.py:254-258). Timestamps surface as epoch micros. */
  def q08(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("ts_us", unix_micros(col("ts")))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .withColumn("prev_us", lag(col("ts_us"), 1).over(w))
      .select(
        col("user_id"), col("event_id"), col("event_type"), col("ts_us"),
        col("prev_type"),
        ((col("ts_us") - col("prev_us")) / 1000000.0).as("secs_since_prev"))
      .orderBy("user_id", "ts_us", "event_id")
  }

  /** Q9 — batch sessionization (gaps-and-islands): strict > 10 min gap opens
    * a new session (reference expiry is strictly > 600 s,
    * event_producer.py:92-93 — minus its timedelta.seconds day-wrap bug,
    * SURVEY §7.4.3). Both window passes share one (user_id) shuffle. */
  def q09(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("ts_us", unix_micros(col("ts")))
      .withColumn("prev_us", lag(col("ts_us"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_us").isNull || col("ts_us") - col("prev_us") > 600000000L, 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_seq")
      .agg(
        count(lit(1)).as("event_count"),
        ((max("ts_us") - min("ts_us")) / 1000000.0).as("span_secs"))
      .orderBy("user_id", "session_seq")
  }

  /** Q10 — distinct aggregation: exact COUNT(DISTINCT) per group (expands to
    * a two-phase aggregate; at 100 TB switch dashboard callers to
    * approx_count_distinct — SURVEY A6). */
  def q10(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        (countDistinct(col("user_id")) * lit(1.0) / count(lit(1))).as("user_ratio"))
      .orderBy("event_type")

  /** Q11 — ROLLUP(p_brand, p_type) over part ⋈ lineitem with explicit
    * GROUPING() keys for stable ordering (A10 gold rollups). */
  def q11(spark: SparkSession, dir: String): DataFrame = {
    // SQL form: grouping() resolution over a join + rollup trips the
    // DataFrame analyzer's ambiguous-self-join check; the SQL path resolves
    // cleanly and plans identically (Expand + hash aggregate).
    // scoped view names: never clobber a caller's `part`/`lineitem` views
    Tables.part(spark, dir).createOrReplaceTempView("graft_q11_part")
    Tables.lineitem(spark, dir).createOrReplaceTempView("graft_q11_lineitem")
    spark.sql(
      """SELECT CAST(GROUPING(p_brand) AS BIGINT) AS g_brand,
        |       CAST(GROUPING(p_type) AS BIGINT) AS g_type, p_brand, p_type,
        |       CAST(SUM(CAST(ROUND(l_extendedprice*100, 0) AS BIGINT)) AS BIGINT) / CAST(100 AS DOUBLE) AS revenue
        |FROM graft_q11_lineitem JOIN graft_q11_part ON l_partkey = p_partkey
        |GROUP BY ROLLUP(p_brand, p_type)
        |ORDER BY g_brand, g_type, p_brand, p_type""".stripMargin)
  }

  /** Q110 — explicit GROUPING SETS (the general form q11's rollup and
    * q12's cube are shorthands for): per-lang totals, per-source totals,
    * and the grand total in ONE aggregate pass — Spark plans one Expand +
    * hash aggregate, not three scans with a union. GROUPING() flags lead
    * the sort (the q11 convention) separating the sets; within a set the
    * grouped column itself could still carry data-NULLs, where Spark sorts
    * NULLS FIRST and DuckDB NULLS LAST — the oracle pins NULLS FIRST
    * explicitly so the orders agree for any data. */
  def q110(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupingSets(Seq(Seq(col("lang")), Seq(col("source")), Seq()),
        col("lang"), col("source"))
      .agg(
        grouping(col("lang")).cast("long").as("g_lang"),
        grouping(col("source")).cast("long").as("g_source"),
        count(lit(1)).as("n_docs"),
        sum("n_chars").as("total_chars"))
      .select(col("g_lang"), col("g_source"), col("lang"), col("source"),
        col("n_docs"), col("total_chars"))
      .orderBy("g_lang", "g_source", "lang", "source")

  /** Q12 — CUBE(l_returnflag, l_linestatus). */
  def q12(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .cube("l_returnflag", "l_linestatus")
      .agg(
        grouping(col("l_returnflag")).cast("long").as("g_flag"),
        grouping(col("l_linestatus")).cast("long").as("g_status"),
        count(lit(1)).as("n_rows"))
      .select(col("g_flag"), col("g_status"), col("l_returnflag"), col("l_linestatus"), col("n_rows"))
      .orderBy("g_flag", "g_status", "l_returnflag", "l_linestatus")

  /** Q13 — set ops (O4 audience algebra): (custkeys with an 'F' order)
    * ∩ (positive balance) ∖ (BUILDING segment). */
  def q13(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    val withF = o.filter(col("o_orderstatus") === "F")
      .select(col("o_custkey").as("custkey")).distinct()
    val posBal = c.filter(col("c_acctbal") > 0)
      .select(col("c_custkey").as("custkey")).distinct()
    val building = c.filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("custkey")).distinct()
    withF.intersect(posBal).except(building).orderBy("custkey")
  }

  /** Q14 — global top-k: Spark plans orderBy+limit as TakeOrderedAndProject
    * (per-partition top-k, merge on driver — no full sort at scale). */
  def q14(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_totalprice").as("price"))
      .orderBy(desc("price"), col("o_orderkey"))
      .limit(10)

  /** Q15 — string functions (F1–F4). */
  def q15(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .filter(col("p_name").like("%red%"))
      .select(
        col("p_partkey"),
        upper(substring(col("p_name"), 1, 8)).as("name8"),
        concat(col("p_brand"), lit("#"), col("p_type")).as("brand_type"))
      .orderBy("p_partkey")

  /** Q16 — date functions (F5–F7): orders per (year, month). */
  def q16(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(
        year(col("o_orderdate")).cast("long").as("o_year"),
        month(col("o_orderdate")).cast("long").as("o_month"))
      .agg(
        count(lit(1)).as("n_orders"),
        (sum(fixed(col("o_totalprice"), 2)) / 100.0).as("total_revenue"))
      .orderBy("o_year", "o_month")

  /** Q17 — latest-per-key (J5/W2): latest event per user by (ts, event_id)
    * desc — the same dedup-by-key shape as lsn-ordered CDC state
    * reconstruction (events.py:213). */
  def q17(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(desc("ts"), desc("event_id"))
    Tables.events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("user_id", "event_id", "event_type")
      .orderBy("user_id")
  }

  /** Q18 — the quality expectation suite as ONE relational aggregate pass
    * (vs the reference interpreter's full-scan-per-expectation,
    * expectations.py:344-400). Domain set fixed from FIXTURES.md. */
  def q18(spark: SparkSession, dir: String): DataFrame = {
    val domain = Seq("click", "error", "purchase", "signup", "view")
    Tables.events(spark, dir)
      .withColumn("ts_s", expr("unix_micros(ts) div 1000000"))
      .agg(
        count(lit(1)).as("total_rows"),
        count(when(col("user_id").isNull, 1)).as("null_user_id"),
        (countDistinct(col("event_id")) === count(lit(1))).cast("long").as("event_id_unique"),
        count(when(!col("event_type").isin(domain: _*), 1)).as("domain_violations"),
        count(when(col("value") < 0 || col("value") > 1000, 1)).as("value_range_violations"),
        min("ts_s").as("min_ts_s"),
        max("ts_s").as("max_ts_s"))
  }

  /** Q19 — JSON extraction (F9): the reference's raw_payload access
    * (events.py:246) as get_json_object over props. */
  def q19(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(sum("k").as("sum_k"), count(when(col("k").isNull, 1)).as("null_k"))
      .orderBy("event_type")

  /** Q20 — bounded range join (J6 as-of shape): lineitems shipped within 30
    * days of their order date. The equi component (orderkey) keys the
    * shuffle; the range condition is a join residual, so the plan stays a
    * plain sort-merge join — no quadratic blowup at scale (SURVEY §7.4.5). */
  def q20(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val l = Tables.lineitem(spark, dir)
    o.join(l,
        o("o_orderkey") === l("l_orderkey") &&
        l("l_shipdate") >= o("o_orderdate") &&
        l("l_shipdate") < o("o_orderdate") + expr("INTERVAL 30 DAYS"),
        "left")
      .groupBy(o("o_orderkey"))
      .agg(count(l("l_orderkey")).as("n_shipped_30d"))
      .orderBy("o_orderkey")
  }

  /** Q24 — array / higher-order functions (F11) + the order-total invariant
    * (P4, events.py:167-177): per order, fold the line array with
    * `aggregate` in exact integer cents, plus an `array_max` of the
    * per-line totals. The fold and max are order-independent over integer
    * cents, so collect_list's nondeterministic ordering needs no sort. */
  def q24(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), fixed(revenue, 2).as("rev_cents"))
      .groupBy("l_orderkey")
      .agg(collect_list(col("rev_cents")).as("lines"))
      .select(
        col("l_orderkey"),
        size(col("lines")).cast("long").as("n_lines"),
        // integer cents: the fold is order-independent, so collect_list's
        // nondeterministic ordering cannot change the result
        aggregate(col("lines"), lit(0L), (acc, x) => acc + x).as("total_cents"),
        array_max(col("lines")).as("max_line_cents"))
      .withColumn("order_total", col("total_cents") / 100.0)
      .orderBy("l_orderkey")

  /** Q38 — AS-OF join (J6, the CDC "state at order time" shape,
    * events.py:198+81): for each purchase event, the user's most recent
    * click at-or-before it. Formulated as a tagged union + one running-max
    * window — a single keyed shuffle, no range-join explosion, the scalable
    * as-of pattern (DuckDB's native ASOF JOIN is the oracle). The (ts,
    * event_id) pair is packed into a zero-padded sortable string so "latest"
    * is total-ordered identically in both engines. */
  def q38(spark: SparkSession, dir: String): DataFrame = {
    val packed = concat(lpad(col("ts_us").cast("string"), 16, "0"), lit(":"),
      lpad(col("event_id").cast("string"), 10, "0"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_us"), col("is_p"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .filter(col("event_type").isin("purchase", "click"))
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"),
        when(col("event_type") === "purchase", 1).otherwise(0).as("is_p"))
      .withColumn("click_key", when(col("event_type") === "click", packed))
      .withColumn("last_click", max(col("click_key")).over(w))
      .filter(col("is_p") === 1)
      .select(
        col("event_id"), col("user_id"), col("ts_us"),
        substring(col("last_click"), 18, 10).cast("long").as("last_click_event_id"),
        ((col("ts_us") - substring(col("last_click"), 1, 16).cast("long")) / 1000000.0)
          .as("gap_secs"))
      .orderBy("user_id", "ts_us", "event_id")
  }

  /** Q39 — frame-spec running totals (W5, the cart-accumulation shape,
    * event_producer.py:135-136): cumulative spend per user over event time.
    * The cumsum runs in exact integer cents (order-fixed by the window
    * sort), so it is engine-deterministic without rounding. */
  def q39(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      .withColumn("running_value", sum(col("cents")).over(w) / 100.0)
      .select("user_id", "event_id", "ts_us", "running_value")
      .orderBy("user_id", "ts_us", "event_id")
  }

  /** Q40 — tumbling 1-hour windows (T9, the hourly batch cadence,
    * expectations.py:187-194 / lake_writer.py:123): events per (hour,
    * type) with exact cents totals. In streaming form this is
    * `window($"ts", "1 hour")`; the batch formulation groups on the
    * truncated hour so the DuckDB oracle can mirror it. */
  def q40(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:00:00").as("hour_start"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        (sum(round(col("value") * 100, 0).cast("long")) / 100.0).as("total_value"))
      .orderBy("hour_start", "event_type")

  /** Q47 — funnel transition analysis (W4, the producer's core
    * browse→cart→checkout invariant, event_producer.py:76-77,134-136):
    * per user, adjacent event-type transitions counted via lag, plus the
    * click→purchase conversion count. One (user_id) shuffle. */
  def q47(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("ts_us", unix_micros(col("ts")))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type"))
      .agg(count(lit(1)).as("n_transitions"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy("prev_type", "event_type")
  }

  /** Q48 — approximate distinct counts (A6's scale path): HyperLogLog++
    * per event type at 2% relative error. The 100 TB dashboard variant of
    * q10 — constant memory per group instead of an exact distinct
    * expansion. Round 5: the output now carries exact counts + in-plan
    * tolerance flags so the DuckDB oracle hash-checks the sketch AUDIT
    * (previously rows-only — the one non-green correctness row). */
  def q48(spark: SparkSession, dir: String): DataFrame = {
    // HLL sketch values are engine-specific, so the approx counts
    // themselves can't be oracle-hashed; what CAN be is the tolerance
    // AUDIT: |approx − exact| ≤ 5% · exact, compared in exact integer
    // arithmetic (20·|Δ| ≤ exact ⇔ |Δ|/exact ≤ 0.05 — no doubles, no
    // rounding hazard; measured max HLL deviation 2.53% at sf0.1 with
    // rsd=0.02). The oracle asserts the flags are 1, so a sketch drifting
    // past tolerance FAILS the row. The exact distincts exist only to
    // ground the audit — and come from two map-side-combined
    // distinct-then-count aggregates rather than one agg mixing two
    // COUNT(DISTINCT) columns: the mixed form plans an Expand (3× the
    // scan mass through the HLL partials) and measured 2.3× slower.
    val ev = Tables.events(spark, dir)
    val base = ev.groupBy("event_type").agg(
      count(lit(1)).as("n_events"),
      approx_count_distinct(col("user_id"), 0.02).as("approx_users"),
      approx_count_distinct(col("event_id"), 0.02).as("approx_events"))
    val eu = ev.select("event_type", "user_id").distinct()
      .groupBy("event_type").agg(count(lit(1)).as("exact_users"))
    val ee = ev.select("event_type", "event_id").distinct()
      .groupBy("event_type").agg(count(lit(1)).as("exact_events"))
    base.join(eu, Seq("event_type")).join(ee, Seq("event_type"))
      .select(col("event_type"),
        col("n_events").cast("long").as("n_events"),
        col("exact_users").cast("long").as("exact_users"),
        (abs(col("approx_users") - col("exact_users")) * lit(20L) <=
          col("exact_users")).cast("long").as("users_within_tol"),
        col("exact_events").cast("long").as("exact_events"),
        (abs(col("approx_events") - col("exact_events")) * lit(20L) <=
          col("exact_events")).cast("long").as("events_within_tol"))
      .orderBy("event_type")
  }

  /** The event-type vocabulary the producer emits (event_producer.py's
    * weighted event mix) — the explicit pivot column list (an implicit
    * pivot would scan the data twice to discover values). */
  val EventTypes: Seq[String] = Seq("click", "error", "purchase", "signup", "view")

  /** Q95 — PIVOT / wide reshape: per-user event-type count matrix (the
    * user-activity feature table a segmentation model consumes). The pivot
    * value list is explicit — Spark's implicit pivot runs an extra
    * distinct scan to discover values, the classic 2-pass trap — so the
    * plan is ONE user-keyed aggregate with 5 conditional counts.
    * Absent combinations fill 0 (dense features). */
  def eventPivot(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("user_id")
      .pivot("event_type", EventTypes)
      .agg(count(lit(1)))
      .na.fill(0L, EventTypes)
      .select(col("user_id") +:
        EventTypes.map(t => col(t).as(s"n_$t")) :+
        EventTypes.map(t => col(t)).reduce(_ + _).as("n_total"): _*)
      .orderBy("user_id")

  /** Q97 — UNPIVOT / melt (the inverse of [[eventPivot]]): the wide
    * feature matrix back to tidy (user, metric, n) triples — the reshape a
    * metrics store or long-format plotting layer ingests. Spark's native
    * `unpivot` is a zero-shuffle row expansion; the only exchange is
    * inherited from the pivot aggregate itself. */
  def eventMelt(spark: SparkSession, dir: String): DataFrame =
    eventPivot(spark, dir)
      .drop("n_total")
      .unpivot(Array(col("user_id")),
        EventTypes.map(t => col(s"n_$t")).toArray, "metric", "n")
      .orderBy("user_id", "metric")

  /** Q102 — SCD2 / temporal effective-dated ranges (gaps-and-islands): each
    * user's event stream collapses to contiguous runs of the same
    * event_type as (valid_from_us, valid_to_us] rows, the
    * slowly-changing-dimension type-2 shape a warehouse keeps for
    * point-in-time joins (the batch dual of the streaming CDC upsert, J5).
    * The open current run has valid_to_us NULL. All three window passes
    * share ONE user_id shuffle partitioning; run lengths bound every
    * per-key computation, so skew follows user activity, not corpus size. */
  def q102(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    val runs = Tables.events(spark, dir)
      .withColumn("ts_us", unix_micros(col("ts")))
      .withColumn("changed",
        (lag(col("event_type"), 1).over(byUser).isNull ||
          lag(col("event_type"), 1).over(byUser) =!= col("event_type")).cast("long"))
      .withColumn("run_id",
        sum(col("changed")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "run_id")
      .agg(first(col("event_type")).as("event_type"),
        min("ts_us").as("valid_from_us"),
        count(lit(1)).as("n_events"))
    // lead orders by run_id, not valid_from_us: run_id is unique per user
    // and time-ordered by construction, so tied run-start timestamps (two
    // runs opening in the same microsecond) can't make the successor
    // ambiguous between engines
    val byRun = Window.partitionBy("user_id").orderBy("run_id")
    runs
      .withColumn("valid_to_us", lead(col("valid_from_us"), 1).over(byRun))
      .select("user_id", "run_id", "event_type", "valid_from_us",
        "valid_to_us", "n_events")
      .orderBy("user_id", "run_id")
  }

  /** Q103 — behavioral sequence mining: the event-type TRANSITION MATRIX
    * (first-order Markov counts) across all user streams — n(prev → curr),
    * distinct users making the transition, and the row-normalized
    * probability in exact rational form (share numerator/denominator stay
    * longs; the double is derived last, q63's exactness discipline). One
    * user-keyed window shuffle + one (prev, curr)-keyed aggregate over at
    * most |event_types|² = 25 groups. */
  def q103(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    val pairs = Tables.events(spark, dir)
      .withColumn("ts_us", unix_micros(col("ts")))
      .withColumn("prev_type", lag(col("event_type"), 1).over(byUser))
      .filter(col("prev_type").isNotNull)
    val counts = pairs.groupBy("prev_type", "event_type")
      .agg(count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users"))
    val byPrev = Window.partitionBy("prev_type")
    counts
      .withColumn("prev_total", sum(col("n")).over(byPrev))
      .withColumn("p", col("n").cast("double") / col("prev_total").cast("double"))
      .select("prev_type", "event_type", "n", "n_users", "prev_total", "p")
      .orderBy("prev_type", "event_type")
  }

  /** Q104 — heavy-hitter audit via COUNT-MIN SKETCH, completing the sketch
    * suite (q48 HLL distinct, q98 bloom membership, q99 percentile): the
    * 100 TB hot-key detector that finds skewed keys in one pass with
    * constant memory, feeding the q60 salting decision. Build side is
    * Spark's own `count_min_sketch` aggregate (seeded → deterministic);
    * probe side is the codegen'd [[graft.functions.CmsEstimate]] since
    * Spark gives SQL no way to query the sketch. The sketch collect is
    * bounded (depth×width ≈ 100 KB, a codebook-class driver collect). The
    * oracle asserts CMS's two guarantees on the exact top-k rows: never
    * underestimates (deterministic), and overestimates ≤ 1% of total mass
    * (10× the sketch's ε=0.001 — Markov headroom ~e⁻ᵈᵉᵖᵗʰ per key, and
    * the fixed seed makes the estimate reproducible besides). */
  def q104(spark: SparkSession, dir: String, k: Int = 20): DataFrame = {
    graft.functions.SketchExpressions.register(spark)
    val ev = Tables.events(spark, dir)
    val sketchBytes = ev
      .agg(expr("count_min_sketch(user_id, 0.001d, 0.99d, 42)"))
      .head.getAs[Array[Byte]](0)
    val counts = ev.groupBy("user_id").agg(count(lit(1)).as("n"))
    // total mass = plain event count: a metadata-cheap scan, instead of
    // re-executing the per-user aggregate a second time for its sum
    val total = ev.count()
    // probe BEFORE the top-k, not after: the codegen'd estimate is a
    // map-only projection over the count aggregate (no shuffle), and the
    // sort+limit then fuses into TakeOrderedAndProject — a limit placed
    // between sort and projection instead floats up and leaves a full
    // range-partitioned global sort of every distinct key underneath
    // (caught by the round-6 plan pin)
    counts
      .withColumn("est",
        graft.functions.SketchExpressions.cms_estimate(lit(sketchBytes), col("user_id")))
      .select(col("user_id"), col("n"),
        (col("est") >= col("n")).cast("long").as("cms_ge_exact"),
        ((col("est") - col("n")).cast("double") <=
          lit(total.toDouble * 0.01)).cast("long").as("cms_within_tol"))
      .orderBy(col("n").desc, col("user_id"))
      .limit(k)
  }

  /** AT-REST DAY-GRAIN FREQUENCY SKETCH TABLE — q104's count-min sketch
    * persisted at the (day) grain (the [[writeReachSketches]] layout
    * applied to the frequency question): one events pass, one CMS + the
    * day's event count per row, so "how hot is key X" and the heavy-
    * hitter audit serve from grain-bounded rows without re-scanning
    * events.
    *
    * MAINTENANCE CAVEAT, and the reason this table is NOT folded by
    * [[graft.app.ReachMaintenanceJob]]: CMS merge is ADDITIVE (count
    * arrays sum), not idempotent — a replayed batch row would double
    * every estimate it contains, so the sketch-tables-get-exactly-once-
    * free-by-idempotence argument (HLL/theta) does NOT apply here. The
    * live path is [[appendFreqSketches]] — tag-committed batch folds
    * (the applied-tags discipline, one dir-exists check per batch) whose
    * replay short-circuit restores exactly-once BY LEDGER instead; the
    * batch form here rebuilds deterministically (grain-keyed overwrite),
    * which is the convention the oracle row exercises. */
  def writeFreqSketches(spark: SparkSession, dir: String, path: String): Unit =
    Tables.events(spark, dir)
      .groupBy(to_date(col("ts")).cast("string").as("day"))
      .agg(expr("count_min_sketch(user_id, 0.001d, 0.99d, 42)").as("sk"),
        count(lit(1)).as("n_events"))
      .write.mode("overwrite").parquet(path)

  /** TAG-COMMITTED LIVE FOLD for the frequency table — the applied-tags
    * discipline the ADDITIVE sketch needs (see [[writeFreqSketches]]'s
    * caveat: CMS merge sums, so idempotence cannot absorb an
    * at-least-once replay the way it does for HLL/theta). Each batch's
    * day-grain CMS rows land under `_batches/<tag>/` — underscore-
    * prefixed, so Spark's file listing of the BASE table never sees them
    * — via the staging + fenced guarded-rename publish ([[graft.text.DocStore.append]]'s
    * protocol verbatim); a committed tag short-circuits, so a replayed
    * batch adds NOTHING and the union of base + committed batch rows
    * equals the one-pass global sketch over everything ingested (CMS
    * linearity; spec'd). */
  def appendFreqSketches(spark: SparkSession, batchDir: String,
      tablePath: String, tag: String,
      fence: () => Unit = graft.IndexVersions.NoFence): Boolean = {
    import org.apache.hadoop.fs.Path
    withFreqGen(spark, tablePath) { gen =>
      val batchesRoot = new Path(gen, "_batches")
      val fs = batchesRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
      // a tag folded BEFORE the last compaction short-circuits on the
      // generation's carried-tag ledger (its counts live in the merged
      // base; CMS is additive — a re-fold would double them silently)
      if (graft.IndexVersions.carriedTags(fs, new Path(gen)).contains(tag))
        false
      else
        // the full short-circuit/sweep/staging/fenced-publish protocol is
        // the SHARED [[graft.IndexVersions.appendTaggedBatch]] (round-11
        // ADVICE: this method and DocStore.append had it
        // verbatim-duplicated)
        graft.IndexVersions.appendTaggedBatch(fs, batchesRoot, tag,
          "_SUCCESS", fence) { staging =>
          Tables.events(spark, batchDir)
            .groupBy(to_date(col("ts")).cast("string").as("day"))
            .agg(expr("count_min_sketch(user_id, 0.001d, 0.99d, 42)").as("sk"),
              count(lit(1)).as("n_events"))
            .write.mode("overwrite").parquet(staging.toString)
        }
    }
  }

  /** The freq table's resolve-once combinator: every multi-step read and
    * fold runs inside ONE [[graft.IndexVersions.withGeneration]] block —
    * the newest committed GENERATION ([[compactFreqSketches]];
    * `tablePath` itself until the first compaction) is resolved exactly
    * once and every path the body touches derives from it, so a
    * concurrent compaction cannot make a reader mix generations (the
    * round-13 TOCTOU class, made structural in round 14). */
  private def withFreqGen[T](spark: SparkSession, tablePath: String)(
      body: String => T): T = {
    import org.apache.hadoop.fs.Path
    val root = new Path(tablePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.IndexVersions.withGeneration(fs, root, "_SUCCESS")(
      gen => body(gen.toString))
  }

  /** Every applied batch tag: live delta dirs plus the tags the current
    * generation's ledger file carries from before the last compaction
    * (both must keep short-circuiting replays). */
  def freqAppliedTags(spark: SparkSession, tablePath: String): Set[String] =
    withFreqGen(spark, tablePath)(gen => freqAppliedTagsAt(spark, gen))

  /** [[freqAppliedTags]] against an ALREADY-RESOLVED generation — every
    * multi-step read resolves the generation ONCE and threads it through
    * (round-13 review finding: helpers that each re-resolved let a
    * concurrent compaction flip the generation mid-read, so a reader
    * merged the old base with the new generation's — empty — live set
    * and silently undercounted, breaking CMS's est ≥ exact guarantee). */
  private def freqAppliedTagsAt(spark: SparkSession, gen: String): Set[String] = {
    import org.apache.hadoop.fs.Path
    val genPath = new Path(gen)
    val fs = genPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    freqLiveTagsAt(spark, gen) ++
      graft.IndexVersions.carriedTags(fs, genPath)
  }

  /** Tags with LIVE delta dirs in the GIVEN generation — the layers a
    * reader unions beside the base, and the compaction-cadence metric.
    * Takes the resolved generation root, never re-resolves. */
  private def freqLiveTagsAt(spark: SparkSession, gen: String): Set[String] = {
    import org.apache.hadoop.fs.Path
    val root = new Path(gen, "_batches")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.IndexVersions.committedBatchTags(fs, root, "_SUCCESS")
  }

  /** Live (uncompacted) delta-dir count — the cadence probe
    * [[graft.app.FreqMaintenanceJob]] triggers [[compactFreqSketches]]
    * on. */
  def freqLiveBatchCount(spark: SparkSession, tablePath: String): Int =
    withFreqGen(spark, tablePath)(gen => freqLiveTagsAt(spark, gen).size)

  /** The full sketch row set of the current generation: base + every
    * LIVE committed batch fold (carried tags' counts are already merged
    * into the base; grain rows needn't be unique — the reader's merge
    * sums them, which is the point of a linear sketch). Batch reads carry
    * the base's EXPLICIT schema (an empty delta has no files to infer
    * from). */
  private def freqRows(spark: SparkSession, tablePath: String): DataFrame =
    withFreqGen(spark, tablePath)(gen => freqRowsAt(spark, gen))

  private def freqRowsAt(spark: SparkSession, gen: String): DataFrame = {
    val base = spark.read.parquet(gen)
    val cols = base.schema.fieldNames.map(col).toSeq
    freqLiveTagsAt(spark, gen).toSeq.sorted
      .map(t => spark.read.schema(base.schema).parquet(s"$gen/_batches/$t")
        .select(cols: _*))
      .foldLeft(base.select(cols: _*))(_ unionByName _)
  }

  /** DELTA-CHAIN COMPACTION for the frequency table (round 13 — the
    * [[graft.text.DocStore.compact]] shape on the flat sketch layout):
    * merge the current generation's rows back to ONE CMS row per day —
    * CMS linearity makes the per-day merge bit-for-bit the one-pass
    * per-day sketch, so every served estimate is identical across
    * compaction (spec'd) — republished as the next generation with every
    * applied tag carried forward in the generation's ledger file (the
    * exactly-once ledger; CMS is ADDITIVE, so a forgotten tag's replay
    * would silently double its counts — the precise failure the tag
    * discipline exists for). The merge is the same GRAIN-BOUNDED driver
    * fold [[heavyHittersServed]] already runs per query (days × ~100 KB
    * sketches); compaction runs it once and the at-rest table returns to
    * day-grain. Lease-holder operation, like every compactor here. */
  def compactFreqSketches(spark: SparkSession, tablePath: String,
      fence: () => Unit = graft.IndexVersions.NoFence): String = {
    import org.apache.hadoop.fs.Path
    import org.apache.spark.util.sketch.CountMinSketch
    import spark.implicits._
    val root = new Path(tablePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // ONE generation resolution for the whole compaction: tags and rows
    // must read the SAME generation (the withFreqGen rule)
    withFreqGen(spark, tablePath) { compactGen =>
      val tags = freqAppliedTagsAt(spark, compactGen)
      val rows = freqRowsAt(spark, compactGen)
        .select(col("day"), col("sk"), col("n_events")).collect()
      require(rows.nonEmpty, s"frequency sketch table at $tablePath is empty")
      val merged = rows.groupBy(_.getString(0)).toSeq.sortBy(_._1).map {
        case (day, rs) =>
          val sk = rs.map(r => CountMinSketch.readFrom(r.getAs[Array[Byte]](1)))
            .reduce((a, b) => a.mergeInPlace(b))
          val bos = new java.io.ByteArrayOutputStream()
          sk.writeTo(bos)
          (day, bos.toByteArray, rs.map(_.getAs[Long](2)).sum)
      }
      graft.IndexVersions.publishGeneration(fs, root, "_SUCCESS",
        fence) { staging =>
        merged.toDF("day", "sk", "n_events")
          .coalesce(1) // day-grain rows — a bounded table, not data mass
          .write.mode("overwrite").parquet(staging.toString)
        graft.IndexVersions.carryTagsForward(fs, staging, tags)
      }.toString
    }
  }

  /** Drop compacted freq-table generations beyond the newest `keepLast`
    * (generation 0 — the root's own layout — reclaims its DATA dirs
    * once superseded past the floor + grace; the root dir itself is the
    * path and stays). */
  def vacuumFreqGenerations(spark: SparkSession, tablePath: String,
      keepLast: Int = 2, graceMs: Long = 0L): Seq[String] = {
    import org.apache.hadoop.fs.Path
    val root = new Path(tablePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.IndexVersions.vacuumGenerations(fs, root, "_SUCCESS",
      keepLast, graceMs)
  }

  /** Q158 — q104's heavy-hitter report with the ESTIMATE ARM SERVED from
    * the at-rest CMS table ([[writeFreqSketches]]): CMS is LINEAR — a
    * merge of per-day sketches (same ε/confidence/seed → same geometry
    * and hash family) sums their count arrays, which is bit-for-bit the
    * one-pass global sketch — so the served estimates equal q104's
    * exactly and the row shares q104's oracle verbatim. The table merge
    * is a GRAIN-BOUNDED driver fold (days × ~100 KB — the q104 sketch
    * collect's own class); the events scan in this query is the EXACT
    * audit arm only (the q149 convention: the oracle checks the audit;
    * production serves the sketch arm alone). */
  def heavyHittersServed(spark: SparkSession, dir: String,
      tablePath: String, k: Int = 20): DataFrame = {
    graft.functions.SketchExpressions.register(spark)
    import org.apache.spark.util.sketch.CountMinSketch
    val rows = freqRows(spark, tablePath)
      .select(col("sk"), col("n_events")).collect()
    require(rows.nonEmpty, s"frequency sketch table at $tablePath is empty")
    val merged = rows.map(r => CountMinSketch.readFrom(r.getAs[Array[Byte]](0)))
      .reduce((a, b) => a.mergeInPlace(b))
    val total = rows.map(_.getAs[Long](1)).sum
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      merged.writeTo(bos); bos.toByteArray
    }
    val counts = Tables.events(spark, dir)
      .groupBy("user_id").agg(count(lit(1)).as("n"))
    counts
      .withColumn("est",
        graft.functions.SketchExpressions.cms_estimate(lit(bytes), col("user_id")))
      .select(col("user_id"), col("n"),
        (col("est") >= col("n")).cast("long").as("cms_ge_exact"),
        ((col("est") - col("n")).cast("double") <=
          lit(total.toDouble * 0.01)).cast("long").as("cms_within_tol"))
      .orderBy(col("n").desc, col("user_id"))
      .limit(k)
  }

  /** Estimate-only serving (the production path the q158 audit row
    * certifies): frequency estimates for a bounded probe key set, read
    * ENTIRELY from the at-rest table — events are never scanned
    * (plan-pinned: the output is a local projection over the probe
    * frame). */
  def freqEstimatesFromSketches(spark: SparkSession, tablePath: String,
      keys: Seq[Long]): DataFrame = {
    graft.functions.SketchExpressions.register(spark)
    import spark.implicits._
    require(keys.nonEmpty && keys.length <= 1024,
      s"probe key set must be a bounded page (got ${keys.length})")
    import org.apache.spark.util.sketch.CountMinSketch
    val rows = freqRows(spark, tablePath).select(col("sk")).collect()
    require(rows.nonEmpty, s"frequency sketch table at $tablePath is empty")
    val merged = rows.map(r => CountMinSketch.readFrom(r.getAs[Array[Byte]](0)))
      .reduce((a, b) => a.mergeInPlace(b))
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      merged.writeTo(bos); bos.toByteArray
    }
    keys.toDF("user_id")
      .withColumn("est",
        graft.functions.SketchExpressions.cms_estimate(lit(bytes), col("user_id")))
      .orderBy("user_id")
  }

  /** Q142 — MERGEABLE DISTINCT-USER REACH via DataSketches HLL
    * (`hll_sketch_agg`/`hll_union_agg`, Spark's Apache DataSketches
    * integration): the 100 TB way to answer "how many distinct users"
    * at every rollup grain WITHOUT shuffling raw keys per grain. One
    * events pass builds a (event_type, day)-grain SKETCH TABLE — the
    * at-rest unit, a few KB per cell — and every coarser answer
    * (per-type reach, total reach) is a UNION-MERGE over that table's
    * sketches, never a re-scan: HLL union is commutative/associative, so
    * the merge is partition-order-independent and the estimate is
    * deterministic for a fixed corpus. The exact `count_distinct` arm is
    * the AUDIT (the q104/q67 convention — measure the sketch against
    * truth in-query); at production scale only the sketch arm runs.
    * `est_ok` = estimate within 5% of exact — at default lgConfigK=12 the
    * sketch is exact through ~thousands of distincts (sparse mode) and
    * ~1.6% RSE beyond, so the bound holds deterministically at every
    * fixture SF. */
  def hllReach(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val daySk = ev
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .localCheckpoint() // the sketch table: two rollups merge from it
    def okArm(sk: Column, exact: Column): Column =
      (abs(hll_sketch_estimate(sk) - exact) <= exact * lit(0.05)).cast("long")
    val perType = ev.groupBy("event_type")
      .agg(countDistinct("user_id").as("users_exact"))
      .join(daySk.groupBy("event_type").agg(hll_union_agg(col("sk")).as("sk")),
        Seq("event_type"))
      .select(col("event_type"), col("users_exact"),
        okArm(col("sk"), col("users_exact")).as("est_ok"))
    val total = ev.agg(countDistinct("user_id").as("users_exact"))
      .crossJoin(daySk.agg(hll_union_agg(col("sk")).as("sk"))) // 1-row × 1-row
      .select(lit("_all").as("event_type"), col("users_exact"),
        okArm(col("sk"), col("users_exact")).as("est_ok"))
    perType.unionByName(total).orderBy("event_type")
  }

  /** The AT-REST form of q142's sketch table: persist the (event_type,
    * day)-grain HLL sketches as a parquet table (binary sketch column —
    * a few KB per cell at any corpus size), so later rollups merge from
    * THIS table instead of re-scanning events. This is the claim q142's
    * scaladoc makes, shipped: at 100 TB each ingest period appends its
    * day's sketch rows once, and every reach question afterwards is a
    * union-merge over cell-count rows. */
  def writeReachSketches(spark: SparkSession, dir: String, path: String): Unit =
    Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .withColumn("day", col("day").cast("string")) // portable partition key
      .write.mode("overwrite").parquet(path)

  /** HOUR → DAY re-merge of the live-feed hourly sketch table
    * ([[graft.app.ReachMaintenanceJob.hourlySink]]'s layout: cumulative
    * `(window_start, window_end, event_type, sk)` versions appended per
    * micro-batch) into [[writeReachSketches]]'s day-grain layout, so the
    * same [[reachFromSketches]] rollup serves either feed. Correct by
    * the semilattice twice over: unioning a window's successive
    * cumulative versions yields its latest version (monotone register
    * sets), and unioning hour partials into a day equals the direct
    * day aggregate bit for bit. Never touches events. */
  def rollupHourlyReach(spark: SparkSession, hourlyPath: String,
      dayPath: String): Unit =
    spark.read.parquet(hourlyPath)
      .groupBy(col("event_type"),
        to_date(col("window_start")).cast("string").as("day"))
      .agg(hll_union_agg(col("sk")).as("sk"))
      .write.mode("overwrite").parquet(dayPath)

  /** Reach rollups served from a persisted sketch table ([[writeReachSketches]]):
    * per-type and total distinct-user estimates without touching events.
    * Spec-pinned equal to the direct q142 sketch arm — the parquet
    * round-trip of the binary sketch column preserves merge semantics. */
  def reachFromSketches(spark: SparkSession, path: String): DataFrame = {
    val sk = spark.read.parquet(path)
    sk.groupBy("event_type")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("reach_est"))
      .unionByName(sk.agg(hll_sketch_estimate(hll_union_agg(col("sk")))
        .as("reach_est"))
        .select(lit("_all").as("event_type"), col("reach_est")))
      .orderBy("event_type")
  }

  /** Q149 — q142's reach report with the SKETCH ARM SERVED from the
    * at-rest table ([[writeReachSketches]]), the q136→q138 promotion
    * pattern applied to sketches: the estimate side reads ONLY the
    * persisted (event_type, day)-grain sketch rows (plan-pinned — no
    * events scan feeds it), and because HLL register-merge is a
    * semilattice the union over day partials is BIT-IDENTICAL to q142's
    * direct aggregate, so the row shares q142's oracle verbatim. The
    * exact arm stays in-plan as the AUDIT (it is what the oracle checks;
    * at 100 TB only the sketch arm runs — the claim the PlanSpec pin on
    * [[reachFromSketches]] enforces). */
  def hllReachServed(spark: SparkSession, dir: String,
      sketchPath: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val est = reachFromSketches(spark, sketchPath) // (event_type, reach_est)
    val perType = ev.groupBy("event_type")
      .agg(countDistinct("user_id").as("users_exact"))
    val total = ev.agg(countDistinct("user_id").as("users_exact"))
      .select(lit("_all").as("event_type"), col("users_exact"))
    perType.unionByName(total)
      .join(est, Seq("event_type"))
      .select(col("event_type"), col("users_exact"),
        (abs(col("reach_est") - col("users_exact")) <=
          col("users_exact") * lit(0.05)).cast("long").as("est_ok"))
      .orderBy("event_type")
  }

  /** The AT-REST THETA COHORT TABLE — the symmetry q142's HLL table
    * established, finished for the theta family (round 10; the round-9
    * verdict's "theta sketches have no at-rest table" finding): persist
    * day-grain theta sketches for both cohort families the overlap and
    * retention reports consume — `family='type'` rows keyed by
    * event_type (q144's pairwise-overlap cohorts) and `family='period'`
    * rows keyed by the base/cur snapshot split (q146's retention
    * cohorts, the q64/q76 even/odd event_id convention). Each row is
    * k-bounded compact bytes; every report afterwards is
    * [[graft.functions.ThetaUnionAgg]] merge-on-read plus pairwise set
    * algebra — at 100 TB each ingest period appends its day's rows once
    * ([[graft.app.ReachMaintenanceJob]] streams them) and no overlap or
    * retention question ever re-scans events. Day-grain union is
    * BIT-IDENTICAL to a direct aggregate (min-k retention is a
    * semilattice), so table-served estimates equal q144/q146's. */
  def writeCohortSketches(spark: SparkSession, dir: String, path: String): Unit = {
    import graft.functions.ThetaExpressions
    import graft.functions.ThetaExpressions.{theta_sketch_agg => tAgg}
    ThetaExpressions.register(spark)
    val ev = Tables.events(spark, dir)
    val byType = ev
      .groupBy(col("event_type").as("cohort"),
        to_date(col("ts")).cast("string").as("day"))
      .agg(tAgg(col("user_id")).as("sk"))
      .select(lit("type").as("family"), col("cohort"), col("day"), col("sk"))
    val byPeriod = ev
      .withColumn("cohort",
        when(col("event_id") % 2 === 0, "base").otherwise("cur"))
      .groupBy(col("cohort"), to_date(col("ts")).cast("string").as("day"))
      .agg(tAgg(col("user_id")).as("sk"))
      .select(lit("period").as("family"), col("cohort"), col("day"), col("sk"))
    byType.unionByName(byPeriod).write.mode("overwrite").parquet(path)
  }

  /** One cohort family's union-merged sketches from the at-rest table:
    * (cohort, sk) rows, one per cohort — the merge-on-read step every
    * table-served theta report starts from. Reads ONLY the sketch table. */
  private def cohortSketches(spark: SparkSession, path: String,
      family: String): DataFrame = {
    import graft.functions.ThetaExpressions
    ThetaExpressions.register(spark)
    spark.read.parquet(path)
      .filter(col("family") === family)
      .groupBy("cohort")
      .agg(ThetaExpressions.theta_union_agg(col("sk")).as("sk"))
  }

  /** Pairwise audience overlap served from the at-rest cohort table
    * ([[writeCohortSketches]]): per-type sketches merge-on-read, then
    * |types|² intersection estimates — never an events scan (plan-pinned).
    * Output (type_a, type_b, est). */
  def overlapFromSketches(spark: SparkSession, path: String): DataFrame = {
    import graft.functions.ThetaExpressions
    val sk = cohortSketches(spark, path, "type")
    sk.as("a").join(sk.as("b"), col("a.cohort") < col("b.cohort"))
      .select(col("a.cohort").as("type_a"), col("b.cohort").as("type_b"),
        ThetaExpressions.theta_intersect_estimate(col("a.sk"), col("b.sk"))
          .as("est"))
      .orderBy("type_a", "type_b")
  }

  /** Retention/churn/acquisition served from the at-rest cohort table:
    * the base/cur period sketches merge-on-read, then the three set-algebra
    * estimates — never an events scan (plan-pinned). One row
    * (retained_est, churned_est, new_est). */
  def retentionFromSketches(spark: SparkSession, path: String): DataFrame = {
    import graft.functions.ThetaExpressions
    val p = cohortSketches(spark, path, "period")
    val a = p.filter(col("cohort") === "base").select(col("sk").as("sk_a"))
    val b = p.filter(col("cohort") === "cur").select(col("sk").as("sk_b"))
    a.crossJoin(b) // two 1-row frames
      .select(
        ThetaExpressions.theta_intersect_estimate(col("sk_a"), col("sk_b"))
          .as("retained_est"),
        ThetaExpressions.theta_anotb_estimate(col("sk_a"), col("sk_b"))
          .as("churned_est"),
        ThetaExpressions.theta_anotb_estimate(col("sk_b"), col("sk_a"))
          .as("new_est"))
  }

  /** Q150 — q144's overlap report with the theta arm SERVED from the
    * at-rest cohort table: estimates come from [[overlapFromSketches]]
    * (no events scan on that side — plan-pinned), the exact arm stays as
    * the in-plan audit the shared q144 oracle checks. Day-grain union
    * being a semilattice, the served estimates equal q144's direct ones,
    * so the 5%·min+1 audit bound transfers verbatim. */
  def thetaOverlapServed(spark: SparkSession, dir: String,
      sketchPath: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val users = ev.groupBy("event_type")
      .agg(countDistinct("user_id").as("users"))
    val pairs = overlapFromSketches(spark, sketchPath)
      .join(users.select(col("event_type").as("type_a"),
        col("users").as("users_a")), Seq("type_a"))
      .join(users.select(col("event_type").as("type_b"),
        col("users").as("users_b")), Seq("type_b"))
    val ut = ev.select("user_id", "event_type").distinct()
    val exact = ut.as("x").join(ut.as("y"),
        col("x.user_id") === col("y.user_id") &&
          col("x.event_type") < col("y.event_type"))
      .groupBy(col("x.event_type").as("type_a"), col("y.event_type").as("type_b"))
      .agg(count(lit(1)).as("overlap_exact"))
    pairs.join(exact, Seq("type_a", "type_b"), "left")
      .select(col("type_a"), col("type_b"), col("users_a"), col("users_b"),
        coalesce(col("overlap_exact"), lit(0L)).as("overlap_exact"),
        (abs(col("est") - coalesce(col("overlap_exact"), lit(0L))) <=
          least(col("users_a"), col("users_b")) * lit(0.05) + lit(1.0))
          .cast("long").as("est_ok"))
      .orderBy("type_a", "type_b")
  }

  /** Q151 — q146's retention report with all three estimates SERVED from
    * the at-rest cohort table ([[retentionFromSketches]] — no events scan
    * on the sketch side, plan-pinned); exact cohort arithmetic stays as
    * the audit the shared q146 oracle checks. */
  def thetaRetentionServed(spark: SparkSession, dir: String,
      sketchPath: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val base = ev.filter(col("event_id") % 2 === 0)
    val cur = ev.filter(col("event_id") % 2 =!= 0)
    val nA = base.agg(countDistinct("user_id").as("users_base"))
    val nB = cur.agg(countDistinct("user_id").as("users_cur"))
    val retained = base.select("user_id").distinct()
      .join(cur.select("user_id").distinct(), Seq("user_id"))
      .agg(count(lit(1)).as("retained_exact"))
    def ok(est: Column, exact: Column, scaleCol: Column): Column =
      (abs(est - exact) <= scaleCol * lit(0.05) + lit(1.0)).cast("long")
    nA.crossJoin(nB).crossJoin(retained)
      .crossJoin(retentionFromSketches(spark, sketchPath)) // four 1-row frames
      .select(col("users_base"), col("users_cur"), col("retained_exact"),
        (col("users_base") - col("retained_exact")).as("churned_exact"),
        (col("users_cur") - col("retained_exact")).as("new_exact"),
        ok(col("retained_est"), col("retained_exact"),
          least(col("users_base"), col("users_cur"))).as("retained_ok"),
        ok(col("churned_est"), col("users_base") - col("retained_exact"),
          col("users_base")).as("churned_ok"),
        ok(col("new_est"), col("users_cur") - col("retained_exact"),
          col("users_cur")).as("new_ok"))
  }

  /** Q144 — AUDIENCE OVERLAP via theta-sketch INTERSECTION
    * ([[graft.functions.ThetaSketchAgg]]): for every event-type pair, how
    * many distinct users did BOTH — the set-algebra question q142's HLL
    * family cannot answer (HLL unions only; theta sketches intersect).
    * One events pass builds a per-type sketch row (the native
    * `TypedImperativeAggregate` — live union object in the hash-agg
    * buffer, compact bytes on the wire), then every pairwise estimate is
    * driver-free set algebra over the tiny sketch table. The exact arm —
    * a distinct (user, type) self-join — is the AUDIT (q104/q142
    * convention); at 100 TB only the sketch arm runs, and its cost is
    * |types|² intersections of k-bounded sketches, not a re-scan.
    * Estimates are exact below the sketch's k=4096 retained entries and
    * the bound `|est − exact| ≤ 5%·min(|A|,|B|) + 1` holds
    * deterministically at every fixture SF (min-k retention is
    * partition-order-independent). */
  def thetaOverlap(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.ThetaExpressions
    ThetaExpressions.register(spark)
    val ev = Tables.events(spark, dir)
    val sk = ev.groupBy("event_type").agg(
      ThetaExpressions.theta_sketch_agg(col("user_id")).as("sk"),
      countDistinct("user_id").as("users"))
    // |types|² pair frame over the types-sized sketch table (broadcast NL
    // on an inequality — bounded by type cardinality, never event mass)
    val pairs = sk.as("a").join(sk.as("b"),
        col("a.event_type") < col("b.event_type"))
      .select(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"),
        col("a.users").as("users_a"), col("b.users").as("users_b"),
        ThetaExpressions.theta_intersect_estimate(col("a.sk"), col("b.sk"))
          .as("est"))
    val ut = ev.select("user_id", "event_type").distinct()
    val exact = ut.as("x").join(ut.as("y"),
        col("x.user_id") === col("y.user_id") &&
          col("x.event_type") < col("y.event_type"))
      .groupBy(col("x.event_type").as("type_a"), col("y.event_type").as("type_b"))
      .agg(count(lit(1)).as("overlap_exact"))
    pairs.join(exact, Seq("type_a", "type_b"), "left")
      .select(col("type_a"), col("type_b"), col("users_a"), col("users_b"),
        coalesce(col("overlap_exact"), lit(0L)).as("overlap_exact"),
        (abs(col("est") - coalesce(col("overlap_exact"), lit(0L))) <=
          least(col("users_a"), col("users_b")) * lit(0.05) + lit(1.0))
          .cast("long").as("est_ok"))
      .orderBy("type_a", "type_b")
  }

  /** Q146 — RETENTION / CHURN / ACQUISITION via the full theta set
    * algebra (q144's intersection plus [[graft.functions.ThetaAnotBEstimate]]
    * — A\B is the third operation the family needs and HLL also cannot
    * do): base-vs-current user cohorts (even/odd event_id — the q64/q76
    * snapshot-split convention), retained = |A∩B|, churned = |A\B|,
    * new = |B\A|, each estimated from two per-cohort sketches and audited
    * in-plan against exact distinct-join arithmetic. At 100 TB the two
    * cohort sketches come from each period's ingest (or the q142 sketch
    * table) and the whole retention report is driver-free set algebra
    * over k-bounded bytes — no raw-key shuffle touches the question. */
  def thetaRetention(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.ThetaExpressions
    import graft.functions.ThetaExpressions.{theta_sketch_agg => tAgg}
    ThetaExpressions.register(spark)
    val ev = Tables.events(spark, dir)
    val base = ev.filter(col("event_id") % 2 === 0)
    val cur = ev.filter(col("event_id") % 2 =!= 0)
    val skA = base.agg(tAgg(col("user_id")).as("sk_a"),
      countDistinct("user_id").as("users_base"))
    val skB = cur.agg(tAgg(col("user_id")).as("sk_b"),
      countDistinct("user_id").as("users_cur"))
    val retained = base.select("user_id").distinct()
      .join(cur.select("user_id").distinct(), Seq("user_id"))
      .agg(count(lit(1)).as("retained_exact"))
    def ok(est: Column, exact: Column, scaleCol: Column): Column =
      (abs(est - exact) <= scaleCol * lit(0.05) + lit(1.0)).cast("long")
    skA.crossJoin(skB).crossJoin(retained) // three 1-row frames
      .select(col("users_base"), col("users_cur"), col("retained_exact"),
        (col("users_base") - col("retained_exact")).as("churned_exact"),
        (col("users_cur") - col("retained_exact")).as("new_exact"),
        ok(ThetaExpressions.theta_intersect_estimate(col("sk_a"), col("sk_b")),
          col("retained_exact"),
          least(col("users_base"), col("users_cur"))).as("retained_ok"),
        ok(ThetaExpressions.theta_anotb_estimate(col("sk_a"), col("sk_b")),
          col("users_base") - col("retained_exact"), col("users_base"))
          .as("churned_ok"),
        ok(ThetaExpressions.theta_anotb_estimate(col("sk_b"), col("sk_a")),
          col("users_cur") - col("retained_exact"), col("users_cur"))
          .as("new_ok"))
  }

  /** Q123 — JOIN-SKEW ADVISOR: the key histogram a planner (or an
    * engineer staring at one straggler task) consults before shuffling
    * 100 TB on a join key. Per key: exact count, share of total rows in
    * integer ppm, and the recommended salt factor — the number of
    * partition-sized chunks this one key fills,
    * `ceil(cnt / ceil(total/parts))`-style as `(cnt·parts + total - 1)
    * div total` in exact integer arithmetic — i.e. how many salt
    * buckets the q60 salted-join pattern should spread it over. A key
    * is `hot` when its salt factor exceeds 1 (it alone overflows an
    * average partition).
    *
    * Scale shape: one map-side-combined count by key, a 2-column scalar
    * aggregate broadcast back (the q115 bounds idiom), then
    * TakeOrderedAndProject for the top-k — the advisor output is
    * dashboard-sized no matter the corpus. This is the MEASUREMENT half
    * of the skew story whose MITIGATION half is q60's salted join. */
  def q123(spark: SparkSession, dir: String,
      parts: Int = 32, k: Int = 15): DataFrame = {
    val keyCounts = Tables.events(spark, dir)
      .groupBy("user_id").agg(count(lit(1)).as("cnt"))
    val tot = keyCounts.agg(sum("cnt").as("total"))
    keyCounts.crossJoin(broadcast(tot))
      .select(
        col("user_id"), col("cnt"),
        expr("cnt * 1000000 div total").as("share_ppm"),
        expr(s"(cnt * $parts + total - 1) div total").as("salt"))
      .withColumn("hot", (col("salt") > 1).cast("long"))
      .orderBy(col("cnt").desc, col("user_id"))
      .limit(k)
  }

  /** Q124 — INCREMENTAL AGGREGATE MAINTENANCE: merge a stored gold
    * table's PARTIAL aggregates with a freshly-computed delta batch
    * instead of rescanning history — the pattern that turns a daily
    * 100 TB gold rebuild into a delta-sized merge. Each side carries
    * the mergeable partial state (count, sum, min, max — all
    * associative+commutative, summed/min'd/max'd across sides); the
    * non-mergeable avg is DERIVED from merged partials at the end,
    * never averaged across sides (the avg-of-avgs trap). Money sums run
    * in exact integer cents ([[fixed]]) so the merge is bit-identical
    * to the oracle's full recompute — which is precisely the claim this
    * query verifies: merge(partial(base), partial(delta)) ≡
    * aggregate(base ∪ delta). The base/delta split (`event_id % 10 <
    * 8`) stands in for "yesterday's stored gold" vs "today's arrivals";
    * at 100 TB the base side is a READ of the stored partial table
    * (delta-sized work total), not the scan performed here. */
  def q124(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), col("event_id"),
        fixed(col("value"), 2).as("cents"))
    def partial(df: DataFrame): DataFrame =
      df.groupBy("event_type").agg(
        count(lit(1)).as("pc"),
        sum("cents").as("ps"),
        min("cents").as("pmin"),
        max("cents").as("pmax"))
    val base  = partial(ev.filter(col("event_id") % 10 < 8))
    val delta = partial(ev.filter(col("event_id") % 10 >= 8))
    base.unionByName(delta)
      .groupBy("event_type")
      .agg(
        sum("pc").as("n_events"),
        sum("ps").as("sum_cents"),
        min("pmin").as("min_cents"),
        max("pmax").as("max_cents"))
      .withColumn("avg_value", col("sum_cents") / col("n_events") / 100.0)
      .orderBy("event_type")
  }
}
