package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.analytics.Relational
import graft.app.FreqMaintenanceJob

/** Round-12 HA contract for the CMS frequency table: unlike the HLL/theta
  * tables (dual-writer safe by union idempotence — documented on
  * ReachMaintenanceJob), CMS merge is ADDITIVE, so exactly-once comes from
  * the tag ledger and failover from the shared-checkpoint standby. The
  * kill-primary scenario must lose zero batches and double zero batches,
  * and the takeover table must serve estimates BIT-IDENTICAL to a one-pass
  * rebuild over everything ingested (CMS linearity). */
class FreqMaintenanceSpec extends SparkSpec {

  private def ts(ms: Long) = new java.sql.Timestamp(ms)

  private def mkBatch(userBase: Long, n: Int): Seq[(Long, java.sql.Timestamp, Long, String, Double, String)] =
    (0 until n).map { i =>
      (userBase + i, ts(1700000000000L + i * 1000L), userBase + (i % 7),
        "click", 1.0, "{}")
    }

  test("CMS standby failover: shared-checkpoint takeover loses and doubles zero batches") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val work = java.nio.file.Files.createTempDirectory("freqfail").toString
    val table = s"$work/freq"
    // base table from a small fixture (the at-rest premise)
    val baseDir = eventsDir(mkBatch(1L, 30))
    Relational.writeFreqSketches(spark, baseDir, table)
    val in = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double, String)]
    def stream = in.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val ckpt = s"$work/ckpt" // SHARED — this is what "standby" means
    val ttl = 2500L
    val fs = new org.apache.hadoop.fs.Path(table)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val root = new org.apache.hadoop.fs.Path(table)
    val primary = FreqMaintenanceJob.sink(stream, s"$work/batches", table,
      ckpt, owner = "primary", leaseTtlMs = ttl)
    var hbTime = 0L
    try {
      in.addData(mkBatch(1000L, 20): _*)
      primary.processAllAvailable()
      in.addData(mkBatch(2000L, 15): _*)
      primary.processAllAvailable()
      // refresh the heartbeat the way a live trigger would, then assert a
      // live primary's lease is not stealable
      assert(IndexVersions.acquireLease(fs, root, "primary", ttl))
      hbTime = System.currentTimeMillis()
      assert(!IndexVersions.acquireLease(fs, root, "standby", ttl),
        "a live primary's lease must not be stealable")
    } finally primary.stop()
    // in-JVM termination releases the lease via the sink's listener
    val leasePath = new org.apache.hadoop.fs.Path(table, IndexVersions.LeaseFile)
    val deadline = System.currentTimeMillis() + 10000
    while (fs.exists(leasePath) && System.currentTimeMillis() < deadline)
      Thread.sleep(100)
    assert(!fs.exists(leasePath),
      "in-JVM termination must release the lease (clean-stop fast failover)")
    // HARD crash (no listener): re-plant the dead primary's lease — the
    // standby must wait out the TTL for this takeover
    assert(IndexVersions.acquireLease(fs, root, "primary", ttl))
    hbTime = System.currentTimeMillis()
    in.addData(mkBatch(3000L, 10): _*) // delayed, never lost
    val standby = FreqMaintenanceJob.standbySink(stream, s"$work/batches",
      table, ckpt, owner = "standby", leaseTtlMs = ttl, pollMs = 200L,
      maxWaitMs = 60000L)
    val waited = System.currentTimeMillis() - hbTime
    assert(waited >= ttl - 1000L,
      s"standby must wait out the crashed primary's TTL, heartbeat age ${waited}ms")
    try standby.processAllAvailable() finally standby.stop()
    // ZERO LOST, ZERO DOUBLE: exactly the three ingested batch tags
    assert(Relational.freqAppliedTags(spark, table) ==
      Set("batch_0", "batch_1", "batch_2"),
      s"takeover lost or double-folded: ${Relational.freqAppliedTags(spark, table)}")
    // ...and the served estimates are BIT-IDENTICAL to a one-pass rebuild
    // over everything ingested (CMS linearity — the additive hazard makes
    // this the assertion that catches any double fold)
    val unionDir = eventsDir(mkBatch(1L, 30) ++ mkBatch(1000L, 20) ++
      mkBatch(2000L, 15) ++ mkBatch(3000L, 10))
    val rebuilt = s"$work/freq_rb"
    Relational.writeFreqSketches(spark, unionDir, rebuilt)
    val probe = Seq(1L, 3L, 1000L, 1003L, 2005L, 3001L, 999999L)
    def estOf(p: String) = Relational.freqEstimatesFromSketches(spark, p, probe)
      .collect().map(_.toSeq).toSeq
    assert(estOf(table) == estOf(rebuilt),
      "failover-maintained CMS table drifted from the one-pass rebuild")
    // REPLAY of an already-folded batch parks on the ledger (the additive
    // hazard, closed): estimates unchanged
    val replay = spark.read.parquet(s"$work/batches/batch_1/events.parquet")
      .localCheckpoint()
    assert(!FreqMaintenanceJob.applyBatch(spark, replay, 1L,
      s"$work/batches", table, owner = "standby2", leaseTtlMs = ttl))
    assert(estOf(table) == estOf(rebuilt),
      "a replayed fold must not double any estimate")
  }
}
