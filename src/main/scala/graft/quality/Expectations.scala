package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The data-quality expectation DSL — Scala ADT mirroring the reference's
  * Great-Expectations-style suite dicts
  * (`/root/reference/data/quality/expectations.py:218-329`), with a compiler
  * to a SINGLE aggregate pass.
  *
  * The reference interprets each expectation with its own full scan of a
  * Python list (expectations.py:344-400) and silently skips the two types
  * its interpreter doesn't know (:390-392). Here every expectation type —
  * including those two (unique-proportion, column-max freshness) — compiles
  * to aggregate Columns evaluated in ONE `df.agg(...)`: at 100 TB that is
  * one scan with partial aggregation instead of N scans.
  */
object Expectations {

  sealed trait Expectation { def column: String; def name: String }

  /** expect_column_values_to_not_be_null (expectations.py:358-361). */
  case class NotNull(column: String) extends Expectation {
    val name = s"not_null($column)"
  }
  /** expect_column_values_to_be_unique (expectations.py:363-366). */
  case class Unique(column: String) extends Expectation {
    val name = s"unique($column)"
  }
  /** expect_column_values_to_be_in_set (expectations.py:368-373). */
  case class InSet(column: String, values: Seq[String]) extends Expectation {
    val name = s"in_set($column)"
  }
  /** expect_column_values_to_be_between (expectations.py:375-382),
    * null-tolerant. */
  case class Between(column: String, min: Double, max: Double) extends Expectation {
    val name = s"between($column)"
  }
  /** expect_table_row_count_to_be_between (expectations.py:384-388). */
  case class RowCountBetween(min: Long, max: Long) extends Expectation {
    val column = "*"; val name = "row_count_between"
  }
  /** expect_column_proportion_of_unique_values_to_be_between — declared at
    * expectations.py:261-269, skipped by the reference interpreter. */
  case class UniqueProportionBetween(column: String, min: Double, max: Double) extends Expectation {
    val name = s"unique_proportion($column)"
  }
  /** expect_column_max_to_be_between (freshness) — declared at
    * expectations.py:277-285, skipped by the reference interpreter. Bounds
    * are epoch seconds (computed from NOW() by the caller, keeping the
    * compiled plan deterministic). */
  case class MaxBetween(column: String, minEpochS: Long, maxEpochS: Long) extends Expectation {
    val name = s"max_between($column)"
  }

  case class Suite(name: String, expectations: Seq[Expectation])

  /** Per-expectation result — same shape as the reference's result dict
    * (expectations.py:404-412). */
  case class ExpectationResult(name: String, passed: Boolean, observed: Double)

  case class SuiteResult(suite: String, results: Seq[ExpectationResult]) {
    /** quality_score = passed/total (expectations.py:402). */
    def score: Double =
      if (results.isEmpty) 1.0 else results.count(_.passed).toDouble / results.size
  }

  // ---- predefined suites (mirroring the reference's builders) --------------

  import graft.model.Schemas

  /** build_click_event_expectation_suite (expectations.py:218-287). */
  def clickSuite(nowEpochS: Long): Suite = Suite("click_events", Seq(
    NotNull("event_id"), NotNull("session_id"), NotNull("click_type"),
    Unique("event_id"),
    InSet("click_type", Schemas.ClickEventTypes),
    InSet("device_type", Schemas.DeviceTypes),
    UniqueProportionBetween("session_id", 0.01, 1.0),
    RowCountBetween(100, 10000000),
    MaxBetween("timestamp", nowEpochS - 2 * 3600, Long.MaxValue)))

  /** build_order_event_expectation_suite (expectations.py:289-329). */
  def orderSuite: Suite = Suite("order_events", Seq(
    NotNull("order_id"), Unique("order_id"),
    Between("total_amount", 0.01, 50000),
    InSet("order_status", Schemas.OrderStatuses),
    Between("item_count", 1, 100)))
}

/** Compiles a Suite to one aggregate pass and evaluates it. */
object SuiteCompiler {
  import Expectations._

  /** The aggregate Column for one expectation: returns the OBSERVED value
    * (violation count, distinct gap, row count…), judged on the driver. */
  private def observed(e: Expectation): Column = e match {
    case NotNull(c)        => count(when(col(c).isNull, 1)).cast("double")
    case Unique(c)         => (count(col(c)) - countDistinct(col(c))).cast("double")
    case InSet(c, vs)      => count(when(!col(c).isin(vs: _*), 1)).cast("double")
    case Between(c, lo, hi) => count(when(col(c) < lo || col(c) > hi, 1)).cast("double")
    case RowCountBetween(_, _) => count(lit(1)).cast("double")
    case UniqueProportionBetween(c, _, _) =>
      (countDistinct(col(c)) * lit(1.0) / count(col(c))).cast("double")
    case MaxBetween(c, _, _) => max(unix_timestamp(col(c))).cast("double")
  }

  private def judge(e: Expectation, obs: Double): Boolean = e match {
    case NotNull(_) | Unique(_) | InSet(_, _) | Between(_, _, _) => obs == 0.0
    case RowCountBetween(lo, hi)            => obs >= lo && obs <= hi
    case UniqueProportionBetween(_, lo, hi) => obs >= lo && obs <= hi
    case MaxBetween(_, lo, hi)              => obs >= lo && obs <= hi
  }

  /** Run the whole suite in ONE df.agg(...) (vs the reference's scan per
    * expectation, expectations.py:344-400). An empty suite short-circuits —
    * no point paying a full count(*) scan for a row count nobody reads. */
  def run(df: DataFrame, suite: Suite): SuiteResult =
    if (suite.expectations.isEmpty) SuiteResult(suite.name, Seq.empty)
    else runWithCount(df, suite)._1

  /** [[run]] plus the row count, still ONE aggregate pass — consumers that
    * need both (the warehouse load report) must not pay a second scan or
    * risk judging and counting different row sets. */
  def runWithCount(df: DataFrame, suite: Suite): (SuiteResult, Long) = {
    val aggs = suite.expectations.zipWithIndex.map { case (e, i) =>
      observed(e).as(s"e_$i")
    } :+ count(lit(1)).as("n_rows")
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val results = suite.expectations.zipWithIndex.map { case (e, i) =>
      val obs = if (row.isNullAt(i)) 0.0 else row.getDouble(i)
      ExpectationResult(e.name, judge(e, obs), obs)
    }
    (SuiteResult(suite.name, results), row.getLong(suite.expectations.size))
  }
}

/** The load gate: proceed iff suite score ≥ threshold
  * (quality_gate, expectations.py:437-464; default 0.95 at :437, check at
  * :456-461). */
object Gate {
  import Expectations._

  val DefaultMinScore = 0.95

  case class GateResult(passed: Boolean, score: Double, failing: Seq[String])

  def check(result: SuiteResult, minScore: Double = DefaultMinScore): GateResult =
    GateResult(result.score >= minScore, result.score,
      result.results.filterNot(_.passed).map(_.name))
}
