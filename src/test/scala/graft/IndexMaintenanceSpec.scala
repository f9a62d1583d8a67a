package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.app.IndexMaintenanceJob
import graft.app.IndexMaintenanceJob.IndexedDoc
import graft.text.TextIndex
import graft.vector.{CellIndex, Similarity}

/** The streaming freshness wire over both append protocols: micro-batches
  * of new docs+embeddings fold into the at-rest indexes exactly once, and
  * the served answers equal a from-scratch rebuild over everything seen. */
class IndexMaintenanceSpec extends SparkSpec {

  private def mkBatch(offset: Long, n: Int): Seq[IndexedDoc] =
    spark.read.parquet(s"$sf0001/documents.parquet")
      .join(spark.read.parquet(s"$sf0001/embeddings.parquet"),
        col("doc_id") === col("vec_id"))
      .orderBy("doc_id").limit(n).collect().map { r =>
        IndexedDoc(r.getAs[Long]("doc_id") + offset,
          r.getAs[String]("text"), r.getAs[String]("lang"),
          r.getAs[String]("source"), r.getAs[Long]("n_chars"),
          r.getAs[Seq[Float]]("embedding").reverse.toList, r.getAs[Int]("label"))
      }.toSeq

  test("streaming maintenance folds batches exactly once into both indexes") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val work = java.nio.file.Files.createTempDirectory("idxmaint").toString
    val vecIdx = s"$work/vec"
    val textIdx = s"$work/text"
    val phraseIdx = s"$work/phrase"
    val store = s"$work/store"
    val ledger = s"$work/gramledger"
    val clusterIdx = s"$work/cluster"
    CellIndex.write(spark, sf0001, vecIdx, k = 4, iters = 3)
    TextIndex.write(spark, sf0001, textIdx)
    TextIndex.writePhraseIndex(spark, sf0001, phraseIdx)
    graft.text.DocStore.write(spark, sf0001, store)
    graft.text.Dedup.writeGramLedger(spark, sf0001, ledger)
    graft.text.ClusterIndex.write(spark, sf0001, clusterIdx)
    val in = MemoryStream[IndexedDoc]
    // retainVersions = 2: after the second batch the base version must be
    // vacuumed (bounded storage) while the tag ledger carries forward
    val q = IndexMaintenanceJob.sink(in.toDS(), s"$work/batches",
      vecIdx, textIdx, s"$work/ckpt", retainVersions = 2,
      phraseIdx = Some(phraseIdx), docStore = Some(store),
      gramLedger = Some(ledger), clusterIdx = Some(clusterIdx))
    try {
      in.addData(mkBatch(100000L, 40): _*)
      q.processAllAvailable()
      in.addData(mkBatch(200000L, 25): _*)
      q.processAllAvailable()
    } finally q.stop()
    // both indexes carry both batch tags and advanced two versions
    assert(CellIndex.appliedTags(spark, vecIdx) == Set("batch_0", "batch_1"))
    assert(TextIndex.appliedTags(spark, textIdx) == Set("batch_0", "batch_1"))
    assert(TextIndex.phraseAppliedTags(spark, phraseIdx) == Set("batch_0", "batch_1"))
    assert(CellIndex.currentVectorsPath(spark, vecIdx).endsWith("vectors_v2"))
    assert(TextIndex.currentRoot(spark, textIdx).endsWith("v2"))
    assert(TextIndex.phraseCurrentRoot(spark, phraseIdx).endsWith("v2"))
    // streaming retention: the base version set was vacuumed, v1+v2 remain
    val vfs = new org.apache.hadoop.fs.Path(vecIdx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!vfs.exists(new org.apache.hadoop.fs.Path(vecIdx, "vectors")),
      "retention must vacuum the base vector set after two appends")
    assert(!vfs.exists(new org.apache.hadoop.fs.Path(textIdx, "stats")),
      "retention must vacuum the base text-index triple after two appends")
    // the indexed corpus is base + both batches, rows intact
    val vecs = spark.read.parquet(CellIndex.currentVectorsPath(spark, vecIdx))
    assert(vecs.count() == 500 + 40 + 25)
    // served BM25 equals a from-scratch rebuild over everything ingested
    val unionDir = java.nio.file.Files.createTempDirectory("idxmaint_u").toString
    val b0 = spark.read.parquet(s"$work/batches/batch_0/documents.parquet")
    val b1 = spark.read.parquet(s"$work/batches/batch_1/documents.parquet")
    spark.read.parquet(s"$sf0001/documents.parquet")
      .unionByName(b0).unionByName(b1)
      .write.mode("overwrite").parquet(s"$unionDir/documents.parquet")
    val rebuilt = java.nio.file.Files.createTempDirectory("idxmaint_rb").toString
    TextIndex.write(spark, unionDir, rebuilt)
    assert(TextIndex.bm25Indexed(spark, textIdx).collect().map(_.toSeq).toSeq ==
      TextIndex.bm25Indexed(spark, rebuilt).collect().map(_.toSeq).toSeq,
      "streaming-maintained text index drifted from a full rebuild")
    // the phrase artifact rode the same stream: maintained search equals a
    // rebuild over everything ingested
    val phraseRb = java.nio.file.Files.createTempDirectory("idxmaint_prb").toString
    TextIndex.writePhraseIndex(spark, unionDir, phraseRb)
    val probePhrase = TextIndex.topPhrase(spark, phraseRb)
    assert(TextIndex.topPhrase(spark, phraseIdx) == probePhrase)
    assert(TextIndex.phraseSearch(spark, phraseIdx, probePhrase)
      .collect().map(_.toSeq).toSeq ==
      TextIndex.phraseSearch(spark, phraseRb, probePhrase)
        .collect().map(_.toSeq).toSeq,
      "streaming-maintained phrase index drifted from a full rebuild")
    // the 4th artifact — the doc store — rode the same stream: both batch
    // tags committed, a fetch spanning base + both batches equals a store
    // rebuilt over everything ingested, and the q156 serving page on the
    // maintained (phrase, store) pair equals the rebuilt pair's
    assert(graft.text.DocStore.appliedTags(spark, store) ==
      Set("batch_0", "batch_1"))
    val storeRb = java.nio.file.Files.createTempDirectory("idxmaint_srb").toString
    graft.text.DocStore.write(spark, unionDir, storeRb)
    val span = Seq(1L, 100007L, 200003L)
    def pageOf(p: String) = graft.text.DocStore.fetchPage(spark, p, span)
      .select("doc_id", "text", "lang", "source", "n_chars")
      .collect().map(_.toSeq).toSet
    assert(pageOf(store) == pageOf(storeRb) && pageOf(store).size == 3,
      "streaming-maintained doc store drifted from a full rebuild")
    assert(graft.text.DocStore.snippetSearch(spark, phraseIdx, store)
      .collect().map(_.toSeq).toSeq ==
      graft.text.DocStore.snippetSearch(spark, phraseRb, storeRb)
        .collect().map(_.toSeq).toSeq,
      "maintained serving page drifted from the rebuilt pair's")
    // the 5th artifact — the gram ledger — rode the same stream: both
    // batch tags committed, and the merged ledger equals one rebuilt
    // over everything ingested (the semigroup append ≡ rebuild argument,
    // here driven END-TO-END through the streaming wire)
    assert(graft.text.Dedup.gramLedgerAppliedTags(spark, ledger) ==
      Set("batch_0", "batch_1"))
    val ledgerRb = java.nio.file.Files.createTempDirectory("idxmaint_glrb").toString
    graft.text.Dedup.writeGramLedger(spark, unionDir, ledgerRb)
    def ledgerRows(p: String) = graft.text.Dedup.readGramLedger(spark, p)
      .collect().map(_.toSeq).toSet
    assert(ledgerRows(ledger) == ledgerRows(ledgerRb),
      "streaming-maintained gram ledger drifted from a full rebuild")
    // the 6th artifact — the cluster index — rode the same stream:
    // maintained labels equal the full q49 recompute over the union
    assert(graft.text.ClusterIndex.appliedTags(spark, clusterIdx) ==
      Set("batch_0", "batch_1"))
    assert(graft.text.ClusterIndex
        .nearDupClustersServed(spark, unionDir, clusterIdx)
        .collect().map(_.toSeq).toSeq ==
      graft.text.Dedup.nearDupClusters(spark, unionDir)
        .collect().map(_.toSeq).toSeq,
      "streaming-maintained cluster labels drifted from the full recompute")
    // REPLAY (at-least-once delivery): re-applying an already-folded batch
    // must short-circuit on the tag — no new version, no duplicate rows
    val replay = spark.read.parquet(s"$work/batches/batch_1/documents.parquet")
      .join(spark.read.parquet(s"$work/batches/batch_1/embeddings.parquet"),
        col("doc_id") === col("vec_id"))
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        col("n_chars"), col("embedding"), col("label"))
      // materialized: applyBatch overwrites the very files this plan reads
      .localCheckpoint()
    val (vecDid, txtDid) = IndexMaintenanceJob.applyBatch(
      spark, replay, 1L, s"$work/batches", vecIdx, textIdx,
      docStore = Some(store), gramLedger = Some(ledger),
      clusterIdx = Some(clusterIdx))
    assert(!vecDid && !txtDid, "replayed batch must not re-append")
    assert(ledgerRows(ledger) == ledgerRows(ledgerRb),
      "a replayed fold must not double the gram ledger's counts")
    assert(graft.text.ClusterIndex.currentRoot(spark, clusterIdx)
      .endsWith("v2"), "a replayed fold must not advance the cluster index")
    assert(CellIndex.currentVectorsPath(spark, vecIdx).endsWith("vectors_v2"))
    assert(spark.read.parquet(CellIndex.currentVectorsPath(spark, vecIdx))
      .count() == 565)
    // the store replay short-circuited on its committed tag dir too
    assert(graft.text.DocStore.fetchPage(spark, store, Seq(200003L))
      .count() == 1L, "doc store replay must not duplicate rows")
  }

  test("standby failover: shared-checkpoint takeover after a primary crash loses zero batches") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val work = java.nio.file.Files.createTempDirectory("idxfail").toString
    val vecIdx = s"$work/vec"
    val textIdx = s"$work/text"
    val ledger = s"$work/gramledger"
    val clusterIdx = s"$work/cluster"
    CellIndex.write(spark, sf0001, vecIdx, k = 4, iters = 1)
    TextIndex.write(spark, sf0001, textIdx)
    // the round-12 artifacts ride the same failover: the gram ledger's
    // additive counts and the cluster labels must come through a crash +
    // takeover neither lost nor doubled
    graft.text.Dedup.writeGramLedger(spark, sf0001, ledger)
    graft.text.ClusterIndex.write(spark, sf0001, clusterIdx)
    val in = MemoryStream[IndexedDoc]
    val ckpt = s"$work/ckpt" // SHARED — this is what "standby" means
    val ttl = 2500L
    val primary = IndexMaintenanceJob.sink(in.toDS(), s"$work/batches",
      vecIdx, textIdx, ckpt, retainVersions = 2, owner = "primary",
      leaseTtlMs = ttl, gramLedger = Some(ledger),
      clusterIdx = Some(clusterIdx))
    val fs = new org.apache.hadoop.fs.Path(vecIdx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    var hbTime = 0L // when the crashed primary's heartbeat was last written
    try {
      in.addData(mkBatch(100000L, 20): _*)
      primary.processAllAvailable()
      in.addData(mkBatch(200000L, 15): _*)
      primary.processAllAvailable()
      // a healthy primary heartbeats every trigger; the folds above took
      // longer than this test's (deliberately short) TTL, so refresh the
      // heartbeat the way a live trigger would before asserting
      assert(IndexVersions.acquireLease(fs,
        new org.apache.hadoop.fs.Path(vecIdx), "primary", ttl))
      hbTime = System.currentTimeMillis()
      // while the primary is ALIVE (fresh heartbeat), a standby cannot
      // steal — it would park/poll, running no query, advancing nothing
      assert(!IndexVersions.acquireLease(fs,
        new org.apache.hadoop.fs.Path(vecIdx), "standby", ttl),
        "a live primary's lease must not be stealable")
    } finally primary.stop()
    // IN-JVM termination releases the lease via the sink's listener
    // (round 11): a clean redeploy or in-stream failure hands over at
    // the next poll instead of waiting out the TTL. Listener fires
    // asynchronously — poll briefly.
    val leasePath = new org.apache.hadoop.fs.Path(vecIdx, IndexVersions.LeaseFile)
    val deadline = System.currentTimeMillis() + 10000
    while (fs.exists(leasePath) && System.currentTimeMillis() < deadline)
      Thread.sleep(100)
    assert(!fs.exists(leasePath),
      "in-JVM termination must release the lease (clean-stop fast failover)")
    // now simulate the HARD crash (JVM death runs no listener): re-plant
    // the dead primary's lease with a fresh heartbeat — the standby must
    // wait out the TTL for THIS takeover
    assert(IndexVersions.acquireLease(fs,
      new org.apache.hadoop.fs.Path(vecIdx), "primary", ttl))
    hbTime = System.currentTimeMillis()
    // data keeps arriving while nobody folds — delayed, never lost
    in.addData(mkBatch(300000L, 10): _*)
    // the standby blocks in awaitLease until the heartbeat goes stale
    // past the TTL, then starts the sink ON THE PRIMARY'S CHECKPOINT —
    // resuming from the last committed offset with the same batch-id
    // sequence, so the tag ledger dedups any crash-window replay
    val standby = IndexMaintenanceJob.standbySink(in.toDS(), s"$work/batches",
      vecIdx, textIdx, ckpt, retainVersions = 2, owner = "standby",
      leaseTtlMs = ttl, pollMs = 200L, maxWaitMs = 60000L,
      gramLedger = Some(ledger), clusterIdx = Some(clusterIdx))
    // measured from the HEARTBEAT, not the standby's start (stop() and
    // batch-building time are not the standby's to spend): the steal can
    // only have happened once the heartbeat aged past the TTL — 1 s
    // slack for filesystem mtime granularity
    val waited = System.currentTimeMillis() - hbTime
    assert(waited >= ttl - 1000L,
      s"standby must wait out the crashed primary's TTL, heartbeat age ${waited}ms")
    try standby.processAllAvailable() finally standby.stop()
    // ZERO LOST, ZERO DOUBLE: exactly the three ingested batch tags
    assert(CellIndex.appliedTags(spark, vecIdx) ==
      Set("batch_0", "batch_1", "batch_2"),
      s"takeover lost or double-folded: ${CellIndex.appliedTags(spark, vecIdx)}")
    assert(TextIndex.appliedTags(spark, textIdx) ==
      Set("batch_0", "batch_1", "batch_2"))
    assert(spark.read.parquet(CellIndex.currentVectorsPath(spark, vecIdx))
      .count() == 500 + 20 + 15 + 10)
    // maintained text index ≡ from-scratch rebuild over EVERYTHING ingested
    val unionDir = java.nio.file.Files.createTempDirectory("idxfail_u").toString
    Seq("batch_0", "batch_1", "batch_2")
      .map(b => spark.read.parquet(s"$work/batches/$b/documents.parquet"))
      .foldLeft(spark.read.parquet(s"$sf0001/documents.parquet"))(_ unionByName _)
      .write.mode("overwrite").parquet(s"$unionDir/documents.parquet")
    val rebuilt = java.nio.file.Files.createTempDirectory("idxfail_rb").toString
    TextIndex.write(spark, unionDir, rebuilt)
    assert(TextIndex.bm25Indexed(spark, textIdx).collect().map(_.toSeq).toSeq ==
      TextIndex.bm25Indexed(spark, rebuilt).collect().map(_.toSeq).toSeq,
      "failover-maintained index drifted from a full rebuild")
    // the round-12 artifacts came through the crash + takeover too:
    // ledger ≡ union-corpus rebuild (additive counts — a double fold in
    // the crash window would be silent anywhere else), cluster labels ≡
    // the full recompute over everything ingested
    assert(graft.text.Dedup.gramLedgerAppliedTags(spark, ledger) ==
      Set("batch_0", "batch_1", "batch_2"))
    val ledgerRb = java.nio.file.Files.createTempDirectory("idxfail_glrb").toString
    graft.text.Dedup.writeGramLedger(spark, unionDir, ledgerRb)
    def glRows(p: String) = graft.text.Dedup.readGramLedger(spark, p)
      .collect().map(_.toSeq).toSet
    assert(glRows(ledger) == glRows(ledgerRb),
      "failover-maintained gram ledger drifted from a full rebuild")
    assert(graft.text.ClusterIndex.appliedTags(spark, clusterIdx) ==
      Set("batch_0", "batch_1", "batch_2"))
    assert(graft.text.ClusterIndex
        .nearDupClustersServed(spark, unionDir, clusterIdx)
        .collect().map(_.toSeq).toSeq ==
      graft.text.Dedup.nearDupClusters(spark, unionDir)
        .collect().map(_.toSeq).toSeq,
      "failover-maintained cluster labels drifted from the full recompute")
  }

  private def writeBatchDir(offset: Long, n: Int): String = {
    val dir = java.nio.file.Files.createTempDirectory("idxpair_b").toString
    spark.read.parquet(s"$sf0001/documents.parquet").orderBy("doc_id").limit(n)
      .withColumn("doc_id", col("doc_id") + offset)
      .write.parquet(s"$dir/documents.parquet")
    spark.read.parquet(s"$sf0001/embeddings.parquet").orderBy("vec_id").limit(n)
      .withColumn("vec_id", col("vec_id") + offset)
      .write.parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("consistent pair resolution declines versions the other index hasn't folded") {
    val work = java.nio.file.Files.createTempDirectory("idxpair").toString
    val vecIdx = s"$work/vec"
    val textIdx = s"$work/text"
    CellIndex.write(spark, sf0001, vecIdx, k = 4, iters = 1)
    TextIndex.write(spark, sf0001, textIdx)
    // fresh bases: empty ledgers on both sides pair with each other
    val (v0, t0) = IndexPair.consistentRoots(spark, vecIdx, textIdx)
    assert(v0.endsWith("vectors") && t0 == textIdx)
    // batch b1 folded into BOTH → the pair advances to (v1, v1)
    val b1 = writeBatchDir(100000L, 20)
    CellIndex.append(spark, b1, vecIdx, Some("b1"))
    TextIndex.append(spark, b1, textIdx, Some("b1"))
    val (v1, t1) = IndexPair.consistentRoots(spark, vecIdx, textIdx)
    assert(v1.endsWith("vectors_v1") && t1.endsWith("v1"))
    // batch b2 folded into TEXT ONLY (the crash-between-folds window):
    // independent "current" resolution would serve text v2 against vector
    // v1 — the consistent pair must stay at (v1, v1)
    val b2 = writeBatchDir(200000L, 15)
    TextIndex.append(spark, b2, textIdx, Some("b2"))
    assert(TextIndex.currentRoot(spark, textIdx).endsWith("v2"))
    val (v2, t2) = IndexPair.consistentRoots(spark, vecIdx, textIdx)
    assert(v2.endsWith("vectors_v1") && t2.endsWith("v1"),
      s"pair must hold the last synchronized state, got ($v2, $t2)")
    // the consistent hybrid serves from that pair: the lexical arm must
    // NOT see b2's docs (text v2 would), both arms ride the v1 corpus
    val probe = Similarity.probeVector(spark, sf0001)
    val viaPair = CellIndex.rrfFusionIndexed(spark, sf0001, vecIdx, probe,
      nprobe = 4, textIndexPath = Some(textIdx), consistent = true)
      .collect().map(_.toSeq).toSeq
    assert(viaPair.nonEmpty &&
      viaPair.forall(r => r(1).asInstanceOf[Long] < 200000L),
      s"consistent fusion ranked docs from the unsynchronized batch: $viaPair")
    // vector catches up → the pair advances to (v2, v2) and consistent
    // resolution equals plain newest-current resolution verbatim
    CellIndex.append(spark, b2, vecIdx, Some("b2"))
    val (v3, t3) = IndexPair.consistentRoots(spark, vecIdx, textIdx)
    assert(v3.endsWith("vectors_v2") && t3.endsWith("v2"))
    val after = CellIndex.rrfFusionIndexed(spark, sf0001, vecIdx, probe,
      nprobe = 4, textIndexPath = Some(textIdx), consistent = true)
      .collect().map(_.toSeq).toSeq
    val plain = CellIndex.rrfFusionIndexed(spark, sf0001, vecIdx, probe,
      nprobe = 4, textIndexPath = Some(textIdx))
      .collect().map(_.toSeq).toSeq
    assert(after == plain)
  }

  test("writer lease: a second job parks instead of failing every batch, steals after expiry") {
    import spark.implicits._
    import org.apache.hadoop.fs.Path
    val work = java.nio.file.Files.createTempDirectory("idxlease").toString
    val vecIdx = s"$work/vec"
    val textIdx = s"$work/text"
    CellIndex.write(spark, sf0001, vecIdx, k = 4, iters = 1)
    TextIndex.write(spark, sf0001, textIdx)
    val b0 = mkBatch(100000L, 15).toDF()
    val b1 = mkBatch(200000L, 10).toDF()
    // writer A folds its batch and now holds the lease
    assert(IndexMaintenanceJob.applyBatch(spark, b0, 0L, s"$work/a",
      vecIdx, textIdx, owner = "A") == ((true, true)))
    assert(CellIndex.currentVectorsPath(spark, vecIdx).endsWith("vectors_v1"))
    // a SECOND live job on the same indexes: pre-lease this failed one
    // publish per batch forever; now it PARKS — no exception, no fold
    assert(IndexMaintenanceJob.applyBatch(spark, b1, 1L, s"$work/b",
      vecIdx, textIdx, owner = "B") == ((false, false)),
      "second live writer must park, not fold")
    assert(CellIndex.currentVectorsPath(spark, vecIdx).endsWith("vectors_v1"),
      "parked batch must not advance the index")
    // A keeps renewing: its own acquire always succeeds
    val fs = new Path(vecIdx).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(IndexVersions.acquireLease(fs, new Path(vecIdx), "A",
      IndexMaintenanceJob.DefaultLeaseTtlMs))
    // A dies (heartbeat goes stale past the TTL) → B steals and takes over
    val stale = System.currentTimeMillis() -
      IndexMaintenanceJob.DefaultLeaseTtlMs - 60000L
    fs.setTimes(new Path(vecIdx, IndexVersions.LeaseFile), stale, -1)
    assert(IndexMaintenanceJob.applyBatch(spark, b1, 1L, s"$work/b",
      vecIdx, textIdx, owner = "B") == ((true, true)),
      "expired lease must be stealable")
    assert(CellIndex.currentVectorsPath(spark, vecIdx).endsWith("vectors_v2"))
    // …and the old holder is now the one that parks
    assert(!IndexVersions.acquireLease(fs, new Path(vecIdx), "A",
      IndexMaintenanceJob.DefaultLeaseTtlMs))
  }

  test("untagged appends advance the ledger — pairing never mixes corpus states") {
    val work = java.nio.file.Files.createTempDirectory("idxpair_untag").toString
    val vecIdx = s"$work/vec"
    val textIdx = s"$work/text"
    CellIndex.write(spark, sf0001, vecIdx, k = 4, iters = 1)
    TextIndex.write(spark, sf0001, textIdx)
    // an UNTAGGED batch folded into TEXT ONLY: both ledgers' tag SETS are
    // still empty, so pre-round-10 resolution would pair vector base with
    // text v1 — two different corpus states (the round-9 advice finding).
    // The untagged-append counter must hold the pair at (base, base).
    val b = writeBatchDir(100000L, 10)
    TextIndex.append(spark, b, textIdx) // tag = None
    assert(TextIndex.currentRoot(spark, textIdx).endsWith("v1"))
    val (v0, t0) = IndexPair.consistentRoots(spark, vecIdx, textIdx)
    assert(v0.endsWith("vectors") && t0 == textIdx,
      s"pair advanced across an untagged batch: ($v0, $t0)")
    // the same untagged batch folded into the vector side: counters agree
    // again (1 == 1) and the pair advances
    CellIndex.append(spark, b, vecIdx) // tag = None
    val (v1, t1) = IndexPair.consistentRoots(spark, vecIdx, textIdx)
    assert(v1.endsWith("vectors_v1") && t1.endsWith("v1"))
  }

  test("untagged poison with add-only artifacts fires the loud channel; versioned-only stays quiet") {
    // round 16 — the r15 ADVICE (high): with add-only artifacts in the
    // composite, admissibility requires untagged == 0, and the counter
    // only grows — so ONE untagged append pins resolution at the last
    // all-tagged state FOREVER while the base version keeps the loud
    // no-tuple refusal from ever firing. The resolver must (a) still
    // serve the provably-consistent pinned state (refusing would turn
    // bounded staleness into an outage), and (b) say so on the loud
    // channel, naming the poisoned artifact. Versioned-only composites
    // pair fine across untagged appends (counter equality) and must NOT
    // warn.
    import graft.IndexVersions.Ledger
    val chain = Seq(
      (0L, "base", Ledger(Set.empty[String], 0L)),
      (1L, "v1", Ledger(Set("t1"), 0L)),
      (2L, "v2", Ledger(Set("t1"), 1L)), // the poisoning untagged fold
      (3L, "v3", Ledger(Set("t1", "t2"), 1L)))
    val captured = scala.collection.mutable.ArrayBuffer.empty[String]
    val saved = IndexPair.onPoisonedResolution
    try {
      IndexPair.onPoisonedResolution = captured += _
      val (roots, ledger) = IndexPair.consistentRootsAll(
        Seq(chain), Seq(("store", Set("t1", "t2"))), "(poison spec)")
      assert(roots == Seq("v1") && ledger == Ledger(Set("t1"), 0L),
        s"must pin the last all-tagged state: $roots / $ledger")
      assert(captured.exists(m => m.contains("PERMANENTLY PINNED") &&
        m.contains("v3") && m.contains("store")),
        s"the loud channel must name the poisoned artifact: $captured")
      // versioned-only: untagged counters synchronize; no warning
      captured.clear()
      val (r2, _) = IndexPair.consistentRootsAll(
        Seq(chain, chain), Seq.empty, "(pair spec)")
      assert(r2 == Seq("v3", "v3"),
        "versioned pairs advance across untagged appends (counter equality)")
      assert(captured.isEmpty,
        s"versioned-only resolution must not warn: $captured")
      // a lineage that NEVER had an all-tagged committed state: the loud
      // refusal carries the untagged hint
      captured.clear()
      val poisonedOnly = Seq((1L, "v1", Ledger(Set.empty[String], 1L)))
      val e = intercept[IllegalStateException] {
        IndexPair.consistentRootsAll(
          Seq(poisonedOnly), Seq(("store", Set.empty[String])), "(all-poison)")
      }
      assert(e.getMessage.contains("Untagged appends are present"),
        s"the refusal must point at the untagged cause: ${e.getMessage}")
    } finally IndexPair.onPoisonedResolution = saved
  }

  test("reserved '#' tags are rejected before any append work; stream owners are distinct") {
    val work = java.nio.file.Files.createTempDirectory("idxtag").toString
    val vecIdx = s"$work/vec"
    CellIndex.write(spark, sf0001, vecIdx, k = 4, iters = 1)
    // '#' opens ledger metadata lines — an accepted '#' tag would be
    // silently dropped on read and break the exactly-once guard for
    // exactly that batch; validation fires before staging assembles
    val e = intercept[IllegalArgumentException] {
      CellIndex.append(spark, writeBatchDir(400000L, 5), vecIdx, Some("#bad"))
    }
    assert(e.getMessage.contains("reserved"))
    assert(CellIndex.currentVectorsPath(spark, vecIdx).endsWith("vectors"),
      "rejected tag must not publish a version")
    // per-stream owner identities never collide within one process (two
    // sinks in one JVM are the dual-writer case the lease must catch)
    assert(graft.app.IndexMaintenanceJob.streamOwner() !=
      graft.app.IndexMaintenanceJob.streamOwner())
  }

  test("blank and newline tags are rejected — each would corrupt the ledger bijection") {
    // Some("") writes a ledger byte-identical to its predecessor's (empty
    // lines are filtered on read; the untagged counter is NOT bumped
    // because the Option is non-empty) — reopening the IndexPair pairing
    // ambiguity the counter closed (round-10 ADVICE finding)
    val blank = intercept[IllegalArgumentException] {
      IndexVersions.requireValidTag(Some(""))
    }
    assert(blank.getMessage.contains("blank"))
    // a newline splits one tag into two ledger lines on read — the
    // replayed batch's tag then never matches and replays double-fold
    val nl = intercept[IllegalArgumentException] {
      IndexVersions.requireValidTag(Some("b1\nb2"))
    }
    assert(nl.getMessage.contains("newline"))
    intercept[IllegalArgumentException] {
      IndexVersions.requireValidTag(Some("b1\r"))
    }
    // the Ledger.append backstop enforces the same shapes
    intercept[IllegalArgumentException] {
      IndexVersions.Ledger.empty.append(Some(""))
    }
    // valid tags and None still pass
    IndexVersions.requireValidTag(Some("batch-41"))
    IndexVersions.requireValidTag(None)
    assert(IndexVersions.Ledger.empty.append(None).untagged == 1L)
  }

  test("lease heartbeat keeps a slow fold's lease fresh — no steal from a live primary") {
    import org.apache.hadoop.fs.Path
    val work = java.nio.file.Files.createTempDirectory("lease_hb").toString
    val root = new Path(work)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ttl = 800L
    val epoch = IndexVersions.acquireLeaseEpoch(fs, root, "primary", ttl)
    assert(epoch.nonEmpty)
    // a "fold" 2.5× the TTL: without the background heartbeat the
    // initial write would be long stale and the standby would steal
    // from a LIVE primary (round-11 review finding)
    val held = IndexVersions.withHeartbeat(fs, root, "primary", ttl, epoch.get) {
      Thread.sleep((ttl * 2.5).toLong)
      !IndexVersions.acquireLease(fs, root, "standby", ttl)
    }
    assert(held, "standby stole the lease from a live, heartbeating primary")
    // heartbeating stopped with the body — expiry then works normally
    Thread.sleep(ttl + 600L)
    assert(IndexVersions.acquireLease(fs, root, "standby", ttl),
      "a dead primary's lease must still expire once heartbeats stop")
  }

  test("fencing epochs: acquires bump, heartbeats don't, stale tokens fail the fence") {
    import org.apache.hadoop.fs.Path
    val work = java.nio.file.Files.createTempDirectory("lease_fence").toString
    val root = new Path(work)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ttl = 400L
    // every acquire mints a NEW token — including the same owner's next
    // batch (each fold fences against its own acquisition)
    val e1 = IndexVersions.acquireLeaseEpoch(fs, root, "A", ttl).get
    IndexVersions.checkFence(fs, root, "A", e1) // current: passes
    val e2 = IndexVersions.acquireLeaseEpoch(fs, root, "A", ttl).get
    assert(e2 == e1 + 1, "a re-acquire must bump the epoch")
    intercept[IllegalStateException] {
      IndexVersions.checkFence(fs, root, "A", e1) // superseded by A itself
    }
    // heartbeats renew WITHOUT bumping: the current token stays valid —
    // and metadata-only: the file's BYTES are exactly what the acquire
    // wrote (a content-rewriting heartbeat could land stale bytes over a
    // thief's lease and roll the epoch back — round-11 review finding)
    val leasePath = new Path(root, IndexVersions.LeaseFile)
    def leaseBytes(): String = {
      val in = fs.open(leasePath)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    }
    val bytesAfterAcquire = leaseBytes()
    val mtimeBefore = fs.getFileStatus(leasePath).getModificationTime
    Thread.sleep(30L)
    assert(IndexVersions.heartbeat(fs, root, "A", e2))
    assert(leaseBytes() == bytesAfterAcquire,
      "a heartbeat must never rewrite the lease's content")
    assert(fs.getFileStatus(leasePath).getModificationTime > mtimeBefore,
      "a heartbeat must refresh the lease's mtime")
    IndexVersions.checkFence(fs, root, "A", e2)
    assert(!IndexVersions.heartbeat(fs, root, "A", e1),
      "a superseded acquisition must not be renewable")
    assert(leaseBytes() == bytesAfterAcquire,
      "a failed heartbeat must leave the lease untouched")
    // a standby cannot steal while A heartbeats; after TTL silence it
    // can — and A's token is then fenced while its heartbeat goes dead
    assert(IndexVersions.acquireLeaseEpoch(fs, root, "B", ttl).isEmpty)
    Thread.sleep(ttl + 200L)
    val eb = IndexVersions.acquireLeaseEpoch(fs, root, "B", ttl).get
    assert(eb == e2 + 1, "a steal continues the epoch sequence")
    intercept[IllegalStateException] {
      IndexVersions.checkFence(fs, root, "A", e2)
    }
    assert(!IndexVersions.heartbeat(fs, root, "A", e2),
      "a stolen-from writer's heartbeat must not overwrite the thief's lease")
    IndexVersions.checkFence(fs, root, "B", eb)
  }

  test("a fenced publish fails loudly and leaves no staging debris — the paused-past-TTL primary") {
    import org.apache.hadoop.fs.Path
    val work = java.nio.file.Files.createTempDirectory("fence_pub").toString
    val textIdx = s"$work/text"
    TextIndex.write(spark, sf0001, textIdx)
    val root = new Path(textIdx)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ttl = 300L
    // primary A acquires, then pauses "stop-the-world" past the TTL
    // (simulated by simply not heartbeating); standby B steals
    val ea = IndexVersions.acquireLeaseEpoch(fs, root, "A", ttl).get
    val fenceA = () => IndexVersions.checkFence(fs, root, "A", ea)
    Thread.sleep(ttl + 200L)
    val eb = IndexVersions.acquireLeaseEpoch(fs, root, "B", ttl).get
    val fenceB = () => IndexVersions.checkFence(fs, root, "B", eb)
    // A resumes mid-batch: its append assembles, then the publish FENCES
    // before the rename — no version commits, and A's staging dir is
    // dropped rather than left for the TTL sweep
    val before = TextIndex.versionsWithTags(spark, textIdx).map(_._1)
    val e = intercept[IllegalStateException] {
      TextIndex.append(spark, writeBatchDir(500000L, 4), textIdx,
        Some("a_batch"), fenceA)
    }
    assert(e.getMessage.contains("fenced"), e.getMessage)
    assert(TextIndex.versionsWithTags(spark, textIdx).map(_._1) == before,
      "a fenced publish must not commit a version")
    assert(!fs.listStatus(root).exists(_.getPath.getName.startsWith(".staging_")),
      "a fenced publish must drop its staging dir")
    assert(!TextIndex.appliedTags(spark, textIdx).contains("a_batch"),
      "the fenced batch's tag must not enter the ledger")
    // B (the rightful holder) folds the same logical batch fine
    TextIndex.append(spark, writeBatchDir(500000L, 4), textIdx,
      Some("a_batch"), fenceB)
    assert(TextIndex.appliedTags(spark, textIdx).contains("a_batch"))
  }

  test("appendPhraseIndex refuses a pre-round-11 layout still carrying bigrams/") {
    import org.apache.hadoop.fs.Path
    val work = java.nio.file.Files.createTempDirectory("legacy_phrase").toString
    val idx = s"$work/phrase"
    TextIndex.writePhraseIndex(spark, sf0001, idx)
    val fs = new Path(idx).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate a round-10 index: the retired artifact sits beside the rest
    fs.mkdirs(new Path(idx, "bigrams"))
    val e = intercept[IllegalArgumentException] {
      TextIndex.appendPhraseIndex(spark, writeBatchDir(100000L, 5), idx, Some("b1"))
    }
    assert(e.getMessage.contains("rebuild"),
      s"append on the legacy layout must fail loudly, got: ${e.getMessage}")
    // nothing published, the base still serves
    assert(TextIndex.phraseCurrentRoot(spark, idx) == idx)
  }

  test("vacuum re-lists committed versions before the stranded sweep — a build committing mid-vacuum survives") {
    import org.apache.hadoop.fs.Path
    val work = java.nio.file.Files.createTempDirectory("idx_relist").toString
    val root = new Path(work)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a version-2 data dir, aged past the staging TTL (a slow assembly)
    fs.mkdirs(new Path(root, "v2"))
    val old = System.currentTimeMillis() - IndexVersions.StagingTtlMs - 60000L
    fs.setTimes(new Path(root, "v2"), old, -1)
    val owner: String => Option[Long] = {
      case n if n.startsWith("v") && n.stripPrefix("v").forall(_.isDigit) &&
        n.length > 1 => Some(n.stripPrefix("v").toLong)
      case _ => None
    }
    // entry snapshot says v2 is NOT committed (taken before the slow
    // build's publish), but the re-list — the state at sweep time — says
    // it IS: the dir must survive (round-10 ADVICE TOCTOU finding)
    val kept = IndexVersions.vacuum(fs, root, versions = Seq.empty,
      versionDirs = v => Seq(s"v$v"), keepLast = 1, graceMs = 0L,
      dirOwner = owner, relist = () => Seq(2L))
    assert(fs.exists(new Path(root, "v2")),
      s"relist must protect a version committed mid-vacuum, removed=$kept")
    // with the stale snapshot confirmed by the re-list, the strand goes
    val swept = IndexVersions.vacuum(fs, root, versions = Seq.empty,
      versionDirs = v => Seq(s"v$v"), keepLast = 1, graceMs = 0L,
      dirOwner = owner, relist = () => Seq.empty)
    assert(!fs.exists(new Path(root, "v2")),
      s"a strand absent from the re-list must still be swept, removed=$swept")
  }

  test("vacuum reclaims marker-less strands from a crashed mid-vacuum pass") {
    import org.apache.hadoop.fs.Path
    val work = java.nio.file.Files.createTempDirectory("idx_strand").toString
    val textIdx = s"$work/text"
    TextIndex.write(spark, sf0001, textIdx)
    TextIndex.append(spark, writeBatchDir(100000L, 10), textIdx, Some("b1"))
    val fs = new Path(textIdx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate a vacuum that crashed after deleting the base's commit
    // marker (stats is deleted first by design): postings/dfreq survive
    // with no marker and no committed version claiming them
    fs.delete(new Path(textIdx, "stats"), true)
    assert(fs.exists(new Path(textIdx, "postings")))
    // a FRESH strand is protected by the TTL (it could be an in-progress
    // base build, which writes data dirs before its marker)
    TextIndex.vacuumVersions(spark, textIdx, keepLast = 1)
    assert(fs.exists(new Path(textIdx, "postings")),
      "TTL must protect young marker-less dirs")
    // age it past the staging TTL → the next vacuum reclaims it
    val old = System.currentTimeMillis() - IndexVersions.StagingTtlMs - 60000L
    fs.setTimes(new Path(textIdx, "postings"), old, -1)
    fs.setTimes(new Path(textIdx, "dfreq"), old, -1)
    val removed = TextIndex.vacuumVersions(spark, textIdx, keepLast = 1)
    assert(!fs.exists(new Path(textIdx, "postings")) &&
      !fs.exists(new Path(textIdx, "dfreq")),
      s"stranded base dirs must be swept once old, removed=$removed")
    // the committed v1 is untouched and still serves
    assert(TextIndex.currentRoot(spark, textIdx).endsWith("v1"))
    assert(TextIndex.bm25Indexed(spark, textIdx).count() > 0)
  }

  test("text+phrase pair resolution declines versions the other artifact hasn't folded") {
    import graft.text.TextIndex
    val work = java.nio.file.Files.createTempDirectory("txtpair").toString
    val textIdx = s"$work/text"
    val phraseIdx = s"$work/phrase"
    TextIndex.write(spark, sf0001, textIdx)
    TextIndex.writePhraseIndex(spark, sf0001, phraseIdx)
    // fresh bases pair (empty ledgers)
    val (t0, p0) = IndexPair.consistentTextRoots(spark, textIdx, phraseIdx)
    assert(t0 == textIdx && p0 == phraseIdx)
    // b1 folded into BOTH → (v1, v1)
    val b1 = writeBatchDir(100000L, 15)
    TextIndex.append(spark, b1, textIdx, Some("b1"))
    TextIndex.appendPhraseIndex(spark, b1, phraseIdx, Some("b1"))
    val (t1, p1) = IndexPair.consistentTextRoots(spark, textIdx, phraseIdx)
    assert(t1.endsWith("v1") && p1.endsWith("v1"))
    // b2 folded into TEXT ONLY (the crash-between-folds window): the
    // consistent pair must hold at (v1, v1) — q152's fusion would
    // otherwise score BM25 over a corpus the proximity arm can't see
    TextIndex.append(spark, writeBatchDir(200000L, 10), textIdx, Some("b2"))
    val (t2, p2) = IndexPair.consistentTextRoots(spark, textIdx, phraseIdx)
    assert(t2.endsWith("v1") && p2.endsWith("v1"),
      s"pair must hold the last synchronized state, got ($t2, $p2)")
    // the consistent fusion runs against that pair (and returns rows)
    assert(TextIndex.proximityRankedSearch(spark, textIdx, phraseIdx,
      consistent = true).count() > 0)
  }

  test("consistent pair resolution fails loudly on unrelated ledgers") {
    val work = java.nio.file.Files.createTempDirectory("idxpair_bad").toString
    val vecIdx = s"$work/vec"
    val textIdx = s"$work/text"
    CellIndex.write(spark, sf0001, vecIdx, k = 4, iters = 1)
    TextIndex.write(spark, sf0001, textIdx)
    // two maintenance lineages that never shared a batch stream: disjoint
    // tags, and the empty-ledger bases vacuumed away
    CellIndex.append(spark, writeBatchDir(100000L, 10), vecIdx, Some("vec_only"))
    TextIndex.append(spark, writeBatchDir(300000L, 10), textIdx, Some("text_only"))
    CellIndex.vacuumVersions(spark, vecIdx, keepLast = 1)
    TextIndex.vacuumVersions(spark, textIdx, keepLast = 1)
    val e = intercept[IllegalStateException] {
      IndexPair.consistentRoots(spark, vecIdx, textIdx)
    }
    // the error names both ledgers — serving a mixed corpus silently is
    // the one outcome the resolver exists to prevent
    assert(e.getMessage.contains("vec_only") && e.getMessage.contains("text_only"))
  }
}
