package graft.quality

import org.apache.spark.sql.DataFrame

/** The warehouse load stage the reference's quality gate exists to guard
  * (`/root/reference/data/quality/expectations.py:18-26` names the Redshift
  * load; the gate branch is :456-464): run the expectation suite in one
  * aggregate pass, load iff the score clears the gate, abort otherwise.
  *
  * The writer is injectable: production binds [[jdbcWriter]]
  * (`df.write.jdbc`, partitioned parallel load), tests and connector-less
  * environments bind a capturing writer — the gate logic is identical and
  * spec-tested either way. The frame is persisted across gate + load so the
  * loaded rows are EXACTLY the judged rows (no recompute between the suite
  * aggregate and the write — the reference's buffer-clear race,
  * lake_writer.py:185-191, is the bug class this avoids).
  */
object Warehouse {

  type Writer = DataFrame => Unit

  /** Production writer: parallel JDBC append — each partition opens its own
    * connection, so load parallelism = partition count (size partitions to
    * the warehouse's ingest concurrency before calling). */
  def jdbcWriter(url: String, table: String,
      properties: java.util.Properties = new java.util.Properties()): Writer =
    df => df.write.mode("append").jdbc(url, table, properties)

  /** What happened to one gated load: whether the writer ran, the gate's
    * verdict, and the row count actually loaded (0 on abort). */
  case class LoadReport(loaded: Boolean, gate: Gate.GateResult, rows: Long)

  /** Gate → load. Suite AND row count are evaluated in the SAME single
    * aggregate pass ([[SuiteCompiler.runWithCount]]) — no separate count
    * job, and the reported rows are the judged rows even if a cached
    * partition is evicted afterwards; a failing gate aborts before the
    * writer is ever invoked (expectations.py:456-461's abort branch).
    * Callers feeding non-deterministic columns (uuid()/current_timestamp
    * defaults) should checkpoint upstream so the written rows can't be
    * recomputed differently from the judged ones. */
  def gatedLoad(df: DataFrame, suite: Expectations.Suite, writer: Writer,
      minScore: Double = Gate.DefaultMinScore): LoadReport = {
    df.persist()
    try {
      val (result, rows) = SuiteCompiler.runWithCount(df, suite)
      val gate = Gate.check(result, minScore)
      if (gate.passed) {
        writer(df)
        LoadReport(loaded = true, gate, rows)
      } else LoadReport(loaded = false, gate, 0L)
    } finally df.unpersist()
  }
}
