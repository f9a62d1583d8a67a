package graft

import org.apache.spark.sql.functions._
import graft.text.{ClusterIndex, Dedup, DocStore, TextIndex}
import graft.analytics.Relational

/** Round-13 contract for DELTA-CHAIN COMPACTION across every maintained
  * artifact (the round-12 verdict's top task): after N tag-committed folds,
  * compaction must (1) serve byte-identical answers, (2) carry the applied
  * tags forward so at-least-once replays still short-circuit — additive
  * artifacts would silently double a forgotten tag's batch — and
  * (3) accept NEW folds afterwards. The gram ledger's original fresh-path
  * compaction spec lives in GramLedgerSpec; this file covers the
  * generation-publish form and the four artifacts that had no compaction:
  * DocStore batches, the freq table's batch dirs, ClusterIndex sigs/bands
  * layers, and the text/phrase posting file-sets inside versions. */
class CompactionSpec extends SparkSpec {

  /** A synthetic doc batch whose ids sit past the fixture corpus. */
  private def docsDirFrom(offset: Long): String = {
    val dir = java.nio.file.Files.createTempDirectory("cmp_batch").toString
    spark.read.parquet(s"$sf0001/documents.parquet")
      .withColumn("doc_id", col("doc_id") + lit(offset))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** Row → comparable Seq (binary columns get VALUE equality — a raw
    * Array compares by reference and would fail identical bytes). */
  private def cmp(r: org.apache.spark.sql.Row): Seq[Any] =
    r.toSeq.map {
      case a: Array[Byte] => a.toSeq
      case x => x
    }

  test("doc store: compaction preserves fetches, tags, replay short-circuit; new folds land") {
    val store = tmp("cmp_store")
    DocStore.write(spark, sf0001, store)
    val b1 = docsDirFrom(500000L)
    val b2 = docsDirFrom(600000L)
    assert(DocStore.append(spark, b1, store, "b1"))
    assert(DocStore.append(spark, b2, store, "b2"))
    val ids = Seq(1L, 42L, 500001L, 600042L)
    val want = DocStore.fetchPage(spark, store, ids)
      .orderBy("doc_id").collect().map(cmp).toSeq
    assert(DocStore.liveBatchCount(spark, store) == 2)
    val gen = DocStore.compact(spark, store)
    assert(gen.contains("_g1"), s"expected a _g1 generation, got $gen")
    // THE READ-COST INVARIANT: the layer width a fetch unions resets to
    // base-only — carried tags ride the ledger FILE, not per-tag dirs
    assert(DocStore.liveBatchCount(spark, store) == 0,
      "compaction must fold every live delta into the base")
    // (1) served fetches identical — one row per id, same bytes
    val got = DocStore.fetchPage(spark, store, ids)
      .orderBy("doc_id").collect().map(cmp).toSeq
    assert(got == want, "fetchPage drifted across compaction")
    // (2) tags carried: replays short-circuit, nothing doubles
    assert(DocStore.appliedTags(spark, store) == Set("b1", "b2"))
    assert(!DocStore.append(spark, b1, store, "b1"),
      "a compacted store must still short-circuit replayed tags")
    assert(DocStore.fetchPage(spark, store, ids).count() == ids.length,
      "a replayed fold duplicated rows after compaction")
    // (3) new folds land in the new generation and serve
    val b3 = docsDirFrom(700000L)
    assert(DocStore.append(spark, b3, store, "b3"))
    assert(DocStore.fetchPage(spark, store, Seq(700001L)).count() == 1L)
    // a SECOND compaction folds the post-compaction batch too (chains)
    DocStore.compact(spark, store)
    assert(DocStore.appliedTags(spark, store) == Set("b1", "b2", "b3"))
    assert(DocStore.fetchPage(spark, store, ids :+ 700001L).count() ==
      ids.length + 1L)
    // generation vacuum drops _g1 (keepLast=1, no grace), keeps _g2
    val removed = DocStore.vacuumGenerations(spark, store, keepLast = 1)
    assert(removed.exists(_.contains("_g1")), s"expected _g1 vacuumed: $removed")
    assert(DocStore.fetchPage(spark, store, ids :+ 700001L).count() ==
      ids.length + 1L, "vacuuming an old generation broke the current one")
  }

  test("generation vacuum reclaims generation 0's data once superseded past the floor") {
    // round-13 review finding: gen 0 (the root's own layout) was never
    // deleted, so the first compaction permanently ~doubled at-rest
    // bytes — the full pre-compaction corpus held as dead weight. The
    // sweep must (a) NOT fire while gen 0 is within the retention floor,
    // (b) reclaim every root child except generation dirs once it is
    // past the floor, and (c) leave the current generation serving.
    val store = tmp("cmp_gen0")
    DocStore.write(spark, sf0001, store)
    assert(DocStore.append(spark, docsDirFrom(500000L), store, "b1"))
    val ids = Seq(1L, 42L, 500001L)
    val want = DocStore.fetchPage(spark, store, ids)
      .orderBy("doc_id").collect().map(cmp).toSeq
    DocStore.compact(spark, store) // _g1
    // (a) gens {0, 1}, keepLast=2: gen 0 is within the floor — retained
    assert(!DocStore.vacuumGenerations(spark, store, keepLast = 2)
      .exists(_.endsWith("rows")), "gen 0 swept while within the floor")
    val rowsDir = new java.io.File(store, "rows")
    assert(rowsDir.exists, "gen 0 data must survive within the floor")
    DocStore.compact(spark, store) // _g2 → gens {0, 1, 2}
    // (b) now past the floor: gen 0's data dirs (rows, batches, stats)
    // AND _g1 go; _g2 stays and serves
    val removed = DocStore.vacuumGenerations(spark, store, keepLast = 1)
    assert(removed.exists(_.endsWith("rows")),
      s"expected gen 0's rows reclaimed: $removed")
    assert(removed.exists(_.contains("_g1")), s"expected _g1 vacuumed: $removed")
    assert(!rowsDir.exists, "gen 0 rows dir must be gone")
    assert(!new java.io.File(store, "batches").exists)
    // (c) the survivor serves the identical page; replay still
    // short-circuits off the survivor's carried-tag ledger
    assert(DocStore.fetchPage(spark, store, ids)
      .orderBy("doc_id").collect().map(cmp).toSeq == want,
      "reclaiming gen 0 changed served bytes")
    assert(DocStore.appliedTags(spark, store) == Set("b1"))
    assert(!DocStore.append(spark, docsDirFrom(500000L), store, "b1"),
      "replay short-circuit lost with gen 0's ledger")
  }

  test("generation vacuum leaves the writer lease untouched (gen-0 sweep is data-only)") {
    // round-14 ADVICE finding: the gen-0 sweep deleted every root child
    // not matching _g*/.staging_*, which included _writer_lease — the
    // fold jobs vacuum under their own root-level lease, so at the
    // second compaction the active writer deleted its own live lease:
    // the epoch counter reset to 1 (re-validating that writer's stale
    // fencing tokens) and a parked standby's next poll acquired over the
    // live primary — two live writers on one artifact.
    val store = tmp("cmp_lease")
    DocStore.write(spark, sf0001, store)
    val root = new org.apache.hadoop.fs.Path(store)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val epoch = graft.IndexVersions.acquireLeaseEpoch(fs, root, "primary",
      ttlMs = 600000L).get
    assert(DocStore.append(spark, docsDirFrom(500000L), store, "b1"))
    DocStore.compact(spark, store) // _g1
    DocStore.compact(spark, store) // _g2 → gen 0 past the keepLast=1 floor
    val removed = DocStore.vacuumGenerations(spark, store, keepLast = 1)
    assert(removed.exists(_.endsWith("rows")),
      s"the gen-0 sweep should have fired: $removed")
    assert(fs.exists(new org.apache.hadoop.fs.Path(root,
      graft.IndexVersions.LeaseFile)),
      "the gen-0 sweep deleted the writer lease")
    // this acquisition is still current (epoch NOT reset) ...
    graft.IndexVersions.checkFence(fs, root, "primary", epoch)
    // ... and a standby stays parked instead of acquiring over the primary
    assert(graft.IndexVersions.acquireLeaseEpoch(fs, root, "standby",
      ttlMs = 600000L).isEmpty,
      "a standby acquired over a live primary after the gen-0 sweep")
  }

  test("cluster index: compact refuses a crashed fold's committed-but-unfolded delta; replay heals") {
    // round-14 ADVICE finding: append commits the sigs/bands delta BEFORE
    // publishing the labels version; compact used to union ALL committed
    // delta tags into the carried ledger, so a fold crashed in that
    // window would be permanently marked applied while its docs never
    // received labels.
    val idx = tmp("cmp_crash")
    ClusterIndex.write(spark, sf0001, idx)
    val b = docsDirFrom(300000L)
    // crash exactly in the window: the delta's publish is this fence's
    // first call, the labels publish its second
    var calls = 0
    val crashAtLabels: () => Unit = () => {
      calls += 1
      if (calls >= 2)
        throw new IllegalStateException("simulated crash before labels publish")
    }
    intercept[IllegalStateException] {
      ClusterIndex.append(spark, b, idx, Some("crashed_fold"), crashAtLabels)
    }
    // the window's shape: delta committed, tag absent from the version ledger
    assert(ClusterIndex.liveBatchCount(spark, idx) == 1)
    assert(!ClusterIndex.appliedTags(spark, idx).contains("crashed_fold"))
    val e = intercept[IllegalArgumentException] {
      ClusterIndex.compact(spark, idx)
    }
    assert(e.getMessage.contains("crashed_fold"),
      s"the refusal must name the unfolded tag: ${e.getMessage}")
    // replay heals: the delta short-circuits, the labels publish, and the
    // compacted index serves the union-corpus resolution
    ClusterIndex.append(spark, b, idx, Some("crashed_fold"))
    assert(ClusterIndex.appliedTags(spark, idx) == Set("crashed_fold"))
    ClusterIndex.compact(spark, idx)
    val unionDir = tmp("cmp_crun")
    spark.read.parquet(s"$sf0001/documents.parquet")
      .unionByName(spark.read.parquet(s"$b/documents.parquet"))
      .write.mode("overwrite").parquet(s"$unionDir/documents.parquet")
    assert(ClusterIndex.nearDupClustersServed(spark, unionDir, idx)
      .collect().map(cmp).toSeq ==
      Dedup.nearDupClusters(spark, unionDir).collect().map(cmp).toSeq,
      "the healed, compacted index drifted from the full recompute")
    // an untagged fold's nonce never enters the ledger by design (the
    // untagged counter does) — it must NOT trip the guard
    ClusterIndex.append(spark, docsDirFrom(400000L), idx, None)
    ClusterIndex.compact(spark, idx)
  }

  test("doc store: sharded base build ≡ the one-shot build for every fetch") {
    val one = tmp("cmp_dsone")
    val sharded = tmp("cmp_dssh")
    DocStore.write(spark, sf0001, one)
    DocStore.writeSharded(spark, sf0001, sharded, shards = 3)
    val ids = Seq(1L, 7L, 42L, 123L, 499L)
    def page(p: String) = DocStore.fetchPage(spark, p, ids)
      .orderBy("doc_id").collect().map(cmp).toSeq
    assert(page(sharded) == page(one),
      "sharded store build drifted from the one-shot layout")
    // appends land identically on a sharded base
    val b = docsDirFrom(500000L)
    assert(DocStore.append(spark, b, sharded, "b1"))
    assert(DocStore.fetchPage(spark, sharded, Seq(500001L)).count() == 1L)
  }

  test("freq table: compaction preserves estimates, tags, replay short-circuit; new folds land") {
    // three disjoint event fixtures (distinct event_id/user ranges)
    def evDir(off: Long): String = {
      val dir = java.nio.file.Files.createTempDirectory("cmp_ev").toString
      spark.read.parquet(s"$sf0001/events.parquet")
        .withColumn("event_id", col("event_id") + lit(off))
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      dir
    }
    val tbl = tmp("cmp_freq")
    Relational.writeFreqSketches(spark, sf0001, tbl)
    val b1 = evDir(1000000L)
    assert(Relational.appendFreqSketches(spark, b1, tbl, "f1"))
    val keys = Seq(1L, 2L, 3L, 5L, 8L)
    val want = Relational.freqEstimatesFromSketches(spark, tbl, keys)
      .collect().map(cmp).toSeq
    assert(Relational.freqLiveBatchCount(spark, tbl) == 1)
    val gen = Relational.compactFreqSketches(spark, tbl)
    assert(gen.contains("_g1"))
    assert(Relational.freqLiveBatchCount(spark, tbl) == 0,
      "compaction must fold every live delta into the base")
    // (1) CMS linearity: the per-day driver merge is bit-for-bit the
    // one-pass sketch, so every estimate is identical
    assert(Relational.freqEstimatesFromSketches(spark, tbl, keys)
      .collect().map(cmp).toSeq == want,
      "freq estimates drifted across compaction")
    // (2) replay short-circuits — CMS is ADDITIVE, a double would be silent
    assert(Relational.freqAppliedTags(spark, tbl) == Set("f1"))
    assert(!Relational.appendFreqSketches(spark, b1, tbl, "f1"),
      "a compacted freq table must still short-circuit replayed tags")
    assert(Relational.freqEstimatesFromSketches(spark, tbl, keys)
      .collect().map(cmp).toSeq == want,
      "a replayed fold changed estimates after compaction")
    // (3) a new fold lands and is counted (estimates only grow)
    val b2 = evDir(2000000L)
    assert(Relational.appendFreqSketches(spark, b2, tbl, "f2"))
    assert(Relational.freqAppliedTags(spark, tbl) == Set("f1", "f2"))
  }

  test("cluster index: compaction preserves labels, tags, ledger; post-compaction folds stay exact") {
    // evens = base, odds = first fold (the fixture convention)
    def parityDir(parity: Int): String = {
      val dir = java.nio.file.Files.createTempDirectory(s"cmp_cp$parity").toString
      spark.read.parquet(s"$sf0001/documents.parquet")
        .filter(col("doc_id") % 2 === parity)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      dir
    }
    val idx = tmp("cmp_cidx")
    ClusterIndex.write(spark, parityDir(0), idx)
    ClusterIndex.append(spark, parityDir(1), idx, Some("fold_odd"))
    val want = ClusterIndex.nearDupClustersServed(spark, sf0001, idx)
      .collect().map(cmp).toSeq
    val gen = ClusterIndex.compact(spark, idx)
    assert(gen.contains("_g1"))
    // (1) served resolution identical from the compacted generation
    assert(ClusterIndex.nearDupClustersServed(spark, sf0001, idx)
      .collect().map(cmp).toSeq == want,
      "cluster resolution drifted across compaction")
    // (2) both tag ledgers carried: the version ledger (pairing/appliedTags)
    // and the _batches replay dirs
    assert(ClusterIndex.appliedTags(spark, idx) == Set("fold_odd"))
    // a replayed fold whose tag was compaction-carried must be a NO-OP:
    // its delta dir no longer exists to short-circuit on, and
    // re-committing would write a duplicate sigs/bands delta the next
    // compaction bakes into the base permanently (round-14 review finding)
    ClusterIndex.append(spark, parityDir(1), idx, Some("fold_odd"))
    assert(ClusterIndex.liveBatchCount(spark, idx) == 0,
      "a compaction-carried tag's replay re-committed its delta")
    assert(ClusterIndex.nearDupClustersServed(spark, sf0001, idx)
      .collect().map(cmp).toSeq == want,
      "a compaction-carried tag's replay changed the served resolution")
    // (3) a post-compaction fold equals the full recompute over the union
    // corpus (the append ≡ rebuild bar, THROUGH a compacted generation):
    // fold a fresh batch and compare against ccLabels-style resolution
    val b2 = docsDirFrom(300000L)
    ClusterIndex.append(spark, b2, idx, Some("fold_b2"))
    val unionDir = tmp("cmp_cun")
    spark.read.parquet(s"$sf0001/documents.parquet")
      .unionByName(spark.read.parquet(s"${b2}/documents.parquet"))
      .write.mode("overwrite").parquet(s"$unionDir/documents.parquet")
    val served = ClusterIndex.nearDupClustersServed(spark, unionDir, idx)
      .collect().map(cmp).toSeq
    val rebuilt = tmp("cmp_crb")
    ClusterIndex.write(spark, unionDir, rebuilt)
    val full = ClusterIndex.nearDupClustersServed(spark, unionDir, rebuilt)
      .collect().map(cmp).toSeq
    assert(served == full,
      "a fold after compaction drifted from the union-corpus rebuild")
  }

  test("gram ledger: in-chain compaction = the fresh-path form, published as a generation") {
    def parityDir(parity: Int): String = {
      val dir = java.nio.file.Files.createTempDirectory(s"cmp_gp$parity").toString
      spark.read.parquet(s"$sf0001/documents.parquet")
        .filter(col("doc_id") % 2 === parity)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      dir
    }
    val odds = parityDir(1)
    val ledger = tmp("cmp_gl")
    Dedup.writeGramLedger(spark, parityDir(0), ledger, n = 5)
    assert(Dedup.appendGramLedger(spark, odds, ledger, "fold_odd"))
    val wantRows = Dedup.readGramLedger(spark, ledger)
      .collect().map(cmp).toSet
    val wantRewrite = Dedup.rewriteBatchAgainstLedger(spark, odds, ledger)
      .collect().map(cmp).toSeq
    assert(Dedup.gramLedgerLiveBatchCount(spark, ledger) == 1)
    val gen = Dedup.compactGramLedgerInChain(spark, ledger)
    assert(gen.contains("_g1"))
    assert(Dedup.gramLedgerLiveBatchCount(spark, ledger) == 0,
      "compaction must fold every live delta into the base")
    assert(Dedup.readGramLedger(spark, ledger)
      .collect().map(cmp).toSet == wantRows,
      "in-chain compaction changed the merged ledger")
    assert(Dedup.rewriteBatchAgainstLedger(spark, odds, ledger)
      .collect().map(cmp).toSeq == wantRewrite,
      "the served rewrite drifted across in-chain compaction")
    assert(Dedup.gramLedgerAppliedTags(spark, ledger) == Set("fold_odd"))
    assert(!Dedup.appendGramLedger(spark, odds, ledger, "fold_odd"),
      "a compacted ledger must still short-circuit replayed tags")
    // a NEW fold lands in the generation and merges exactly
    val more = docsDirFrom(400000L)
    assert(Dedup.appendGramLedger(spark, more, ledger, "fold_more"))
    assert(Dedup.gramLedgerAppliedTags(spark, ledger) ==
      Set("fold_odd", "fold_more"))
  }

  test("text index: compactVersion collapses file sets, serves identically, ledger verbatim") {
    def parityDir(parity: Int): String = {
      val dir = java.nio.file.Files.createTempDirectory(s"cmp_tp$parity").toString
      spark.read.parquet(s"$sf0001/documents.parquet")
        .filter(col("doc_id") % 2 === parity)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      dir
    }
    val idx = tmp("cmp_tidx")
    TextIndex.write(spark, parityDir(0), idx)
    TextIndex.append(spark, parityDir(1), idx, Some("fold_odd"))
    val before = TextIndex.postingFileCount(spark, idx)
    val want = TextIndex.bm25Indexed(spark, idx).collect().map(cmp).toSeq
    val tagsBefore = TextIndex.appliedTags(spark, idx)
    TextIndex.compactVersion(spark, idx)
    val after = TextIndex.postingFileCount(spark, idx)
    assert(after < before,
      s"compaction must shrink the posting file count (was $before, now $after)")
    assert(TextIndex.bm25Indexed(spark, idx).collect().map(cmp).toSeq == want,
      "bm25 serving drifted across posting compaction")
    assert(TextIndex.appliedTags(spark, idx) == tagsBefore,
      "the applied-batch ledger must carry verbatim (the retrain rule)")
    // appends keep working on the compacted version
    val b2 = docsDirFrom(200000L)
    TextIndex.append(spark, b2, idx, Some("fold_b2"))
    assert(TextIndex.appliedTags(spark, idx) == tagsBefore + "fold_b2")
  }

  test("maintenance cadence: compactAt keeps every artifact's chain bounded under the streaming wire, answers exact") {
    import spark.implicits._
    import graft.app.IndexMaintenanceJob
    import graft.app.IndexMaintenanceJob.IndexedDoc
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc = spark.sqlContext
    def mkBatch(offset: Long, n: Int): Seq[IndexedDoc] =
      spark.read.parquet(s"$sf0001/documents.parquet")
        .join(spark.read.parquet(s"$sf0001/embeddings.parquet"),
          col("doc_id") === col("vec_id"))
        .orderBy("doc_id").limit(n).collect().map { r =>
          IndexedDoc(r.getAs[Long]("doc_id") + offset,
            r.getAs[String]("text"), r.getAs[String]("lang"),
            r.getAs[String]("source"), r.getAs[Long]("n_chars"),
            r.getAs[Seq[Float]]("embedding").reverse.toList,
            r.getAs[Int]("label"))
        }.toSeq
    val work = tmp("cmp_cad")
    val vecIdx = s"$work/vec"
    val textIdx = s"$work/text"
    val phraseIdx = s"$work/phrase"
    val store = s"$work/store"
    val ledger = s"$work/gramledger"
    val clusterIdx = s"$work/cluster"
    graft.vector.CellIndex.write(spark, sf0001, vecIdx, k = 4, iters = 1)
    TextIndex.write(spark, sf0001, textIdx)
    TextIndex.writePhraseIndex(spark, sf0001, phraseIdx)
    DocStore.write(spark, sf0001, store)
    Dedup.writeGramLedger(spark, sf0001, ledger)
    ClusterIndex.write(spark, sf0001, clusterIdx)
    val in = MemoryStream[IndexedDoc]
    val q = IndexMaintenanceJob.sink(in.toDS(), s"$work/batches",
      vecIdx, textIdx, s"$work/ckpt", retainVersions = 2,
      phraseIdx = Some(phraseIdx), docStore = Some(store),
      gramLedger = Some(ledger), clusterIdx = Some(clusterIdx),
      compactAt = Some(1))
    try {
      in.addData(mkBatch(100000L, 20): _*)
      q.processAllAvailable()
      in.addData(mkBatch(200000L, 15): _*)
      q.processAllAvailable()
      in.addData(mkBatch(300000L, 10): _*)
      q.processAllAvailable()
    } finally q.stop()
    // every fold landed exactly once, through compactions
    val allTags = Set("batch_0", "batch_1", "batch_2")
    assert(DocStore.appliedTags(spark, store) == allTags)
    assert(Dedup.gramLedgerAppliedTags(spark, ledger) == allTags)
    assert(ClusterIndex.appliedTags(spark, clusterIdx) == allTags)
    assert(TextIndex.appliedTags(spark, textIdx) == allTags)
    assert(TextIndex.phraseAppliedTags(spark, phraseIdx) == allTags)
    // BOUNDED CHAINS: the cadence threshold (1) caps every live delta
    // chain — stream age no longer reaches the readers
    assert(DocStore.liveBatchCount(spark, store) <= 1)
    assert(Dedup.gramLedgerLiveBatchCount(spark, ledger) <= 1)
    assert(ClusterIndex.liveBatchCount(spark, clusterIdx) <= 1)
    // answers equal a from-scratch rebuild over everything ingested
    val unionDir = tmp("cmp_cadu")
    Seq("batch_0", "batch_1", "batch_2")
      .map(t => spark.read.parquet(s"$work/batches/$t/documents.parquet"))
      .foldLeft(spark.read.parquet(s"$sf0001/documents.parquet"))(
        _ unionByName _)
      .write.mode("overwrite").parquet(s"$unionDir/documents.parquet")
    val textRb = tmp("cmp_cadtr")
    TextIndex.write(spark, unionDir, textRb)
    assert(TextIndex.bm25Indexed(spark, textIdx)
      .collect().map(cmp).toSeq ==
      TextIndex.bm25Indexed(spark, textRb).collect().map(cmp).toSeq,
      "compaction-cadenced text index drifted from a full rebuild")
    val ledgerRb = tmp("cmp_cadlr")
    Dedup.writeGramLedger(spark, unionDir, ledgerRb)
    assert(Dedup.readGramLedger(spark, ledger).collect().map(cmp).toSet ==
      Dedup.readGramLedger(spark, ledgerRb).collect().map(cmp).toSet,
      "compaction-cadenced gram ledger drifted from a full rebuild")
    assert(ClusterIndex.nearDupClustersServed(spark, unionDir, clusterIdx)
      .collect().map(cmp).toSeq ==
      Dedup.nearDupClusters(spark, unionDir).collect().map(cmp).toSeq,
      "compaction-cadenced cluster labels drifted from the full recompute")
    assert(DocStore.fetchPage(spark, store,
      Seq(1L, 100001L, 200003L, 300005L)).count() == 4L,
      "compaction-cadenced store lost a fold's rows")
  }

  test("freq maintenance cadence: compactAt bounds the CMS chain, estimates exact") {
    import graft.app.FreqMaintenanceJob
    val work = tmp("cmp_fcad")
    val tbl = s"$work/freq"
    Relational.writeFreqSketches(spark, sf0001, tbl)
    def batchOf(off: Long) = spark.read.parquet(s"$sf0001/events.parquet")
      .withColumn("event_id", col("event_id") + lit(off))
      .localCheckpoint() // applyBatch writes the dir this plan would read
    assert(FreqMaintenanceJob.applyBatch(spark, batchOf(1000000L), 0L,
      s"$work/b", tbl, compactAt = Some(1)))
    assert(FreqMaintenanceJob.applyBatch(spark, batchOf(2000000L), 1L,
      s"$work/b", tbl, compactAt = Some(1)))
    assert(FreqMaintenanceJob.applyBatch(spark, batchOf(3000000L), 2L,
      s"$work/b", tbl, compactAt = Some(1)))
    assert(Relational.freqAppliedTags(spark, tbl) ==
      Set("batch_0", "batch_1", "batch_2"))
    assert(Relational.freqLiveBatchCount(spark, tbl) <= 1,
      "cadence must keep the live CMS delta chain bounded")
    // a replayed batch still short-circuits through the compactions
    assert(!FreqMaintenanceJob.applyBatch(spark, batchOf(1000000L), 0L,
      s"$work/b", tbl, compactAt = Some(1)))
    // estimates ≥ exact (CMS one-sidedness survives the merge chain):
    // every batch re-folded the same fixture users 3 more times, so each
    // user's estimate must be ≥ 4× its single-fixture count
    val singles = spark.read.parquet(s"$sf0001/events.parquet")
      .groupBy("user_id").agg(count(lit(1)).as("n"))
      .orderBy("user_id").limit(8).collect()
    val est = Relational.freqEstimatesFromSketches(spark, tbl,
      singles.map(_.getLong(0)).toSeq).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    singles.foreach { r =>
      assert(est(r.getLong(0)) >= 4L * r.getLong(1),
        s"user ${r.getLong(0)}: estimate ${est(r.getLong(0))} lost folds " +
          s"(needs ≥ ${4L * r.getLong(1)})")
    }
  }

  test("phrase index: compactPhraseVersion serves identical phrase search, ledger verbatim") {
    def parityDir(parity: Int): String = {
      val dir = java.nio.file.Files.createTempDirectory(s"cmp_pp$parity").toString
      spark.read.parquet(s"$sf0001/documents.parquet")
        .filter(col("doc_id") % 2 === parity)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      dir
    }
    val idx = tmp("cmp_pidx")
    TextIndex.writePhraseIndex(spark, parityDir(0), idx)
    TextIndex.appendPhraseIndex(spark, parityDir(1), idx, Some("fold_odd"))
    val before = TextIndex.positionFileCount(spark, idx)
    val phrase = TextIndex.topPhrase(spark, idx)
    val want = TextIndex.phraseSearch(spark, idx, phrase)
      .collect().map(cmp).toSeq
    val tagsBefore = TextIndex.phraseAppliedTags(spark, idx)
    TextIndex.compactPhraseVersion(spark, idx)
    val after = TextIndex.positionFileCount(spark, idx)
    assert(after < before,
      s"compaction must shrink the position file count (was $before, now $after)")
    assert(TextIndex.topPhrase(spark, idx) == phrase,
      "the probe phrase drifted across compaction")
    assert(TextIndex.phraseSearch(spark, idx, phrase)
      .collect().map(cmp).toSeq == want,
      "phrase search drifted across position compaction")
    assert(TextIndex.phraseAppliedTags(spark, idx) == tagsBefore)
  }
}
