package graft

import graft.quality.{Expectations, Gate, SuiteCompiler, Warehouse}
import Expectations._

/** A1–A9: suite compiler + gate (expectations.py:331-464). */
class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    ("e1", "s1", "page_view", "mobile", 10.0),
    ("e2", "s1", "product_view", "desktop", 20.0),
    ("e3", "s2", "add_to_cart", "tablet", 60000.0), // out of [0.01, 50000]
    ("e3", "s3", "bogus_type", "fridge", 5.0)       // dup id + domain violations
  ).toDF("event_id", "session_id", "click_type", "device_type", "total_amount")

  test("each expectation type computes the right observed value in one pass") {
    val suite = Suite("t", Seq(
      NotNull("event_id"), Unique("event_id"),
      InSet("click_type", graft.model.Schemas.ClickEventTypes),
      InSet("device_type", graft.model.Schemas.DeviceTypes),
      Between("total_amount", 0.01, 50000),
      RowCountBetween(1, 100),
      UniqueProportionBetween("session_id", 0.5, 1.0)))
    val r = SuiteCompiler.run(df, suite)
    val byName = r.results.map(x => x.name -> x).toMap
    assert(byName("not_null(event_id)").passed)
    assert(!byName("unique(event_id)").passed && byName("unique(event_id)").observed == 1.0)
    assert(!byName("in_set(click_type)").passed && byName("in_set(click_type)").observed == 1.0)
    assert(!byName("in_set(device_type)").passed)
    assert(!byName("between(total_amount)").passed)
    assert(byName("row_count_between").passed && byName("row_count_between").observed == 4.0)
    assert(byName("unique_proportion(session_id)").passed &&
      byName("unique_proportion(session_id)").observed == 0.75)
    // score = passed/total (expectations.py:402)
    assert(math.abs(r.score - 3.0 / 7) < 1e-9)
  }

  test("gate: ≥0.95 passes, below aborts — expectations.py:437-464") {
    val good = SuiteResult("s", Seq.fill(20)(ExpectationResult("x", passed = true, 0)))
    val oneBad = SuiteResult("s",
      ExpectationResult("bad", passed = false, 1) +:
        Seq.fill(19)(ExpectationResult("x", passed = true, 0)))
    assert(Gate.check(good).passed)
    val g = Gate.check(oneBad)
    assert(g.passed) // 19/20 = 0.95 — boundary is inclusive (score >= 0.95)
    assert(g.failing == Seq("bad"))
    assert(!Gate.check(SuiteResult("s", Seq(
      ExpectationResult("bad", passed = false, 1),
      ExpectationResult("ok", passed = true, 0))), 0.95).passed)
  }

  test("warehouse load: failing gate aborts before the writer; passing gate commits") {
    var written: Option[Long] = None
    val writer: Warehouse.Writer = d => written = Some(d.count())
    val suite = Suite("wh", Seq(
      NotNull("event_id"),
      InSet("click_type", graft.model.Schemas.ClickEventTypes)))
    val good = Seq(("e1", "page_view"), ("e2", "search")).toDF("event_id", "click_type")
    val ok = Warehouse.gatedLoad(good, suite, writer)
    assert(ok.loaded && ok.rows == 2 && written.contains(2L))
    written = None
    val bad = Seq(("e1", "bogus"), (null: String, "worse")).toDF("event_id", "click_type")
    val rejected = Warehouse.gatedLoad(bad, suite, writer)
    assert(!rejected.loaded && rejected.rows == 0)
    assert(written.isEmpty, "writer must never run on a failing gate")
    assert(rejected.gate.failing.toSet ==
      Set("not_null(event_id)", "in_set(click_type)"))
  }

  test("predefined click suite evaluates on real events-shaped data") {
    val now = java.time.Instant.parse("2024-01-15T15:00:00Z").getEpochSecond
    val clicks = (1 to 200).map(i =>
      (s"e$i", s"s${i % 50}", "page_view", "mobile",
        java.sql.Timestamp.from(java.time.Instant.parse("2024-01-15T14:30:00Z"))))
      .toDF("event_id", "session_id", "click_type", "device_type", "timestamp")
    val r = SuiteCompiler.run(clicks, Expectations.clickSuite(now))
    assert(r.score == 1.0, r.results.filterNot(_.passed).map(_.name))
  }
}
