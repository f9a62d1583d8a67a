package graft

import org.apache.spark.sql.functions._
import graft.text.{DocStore, Dedup, TextIndex, Tombstones}
import graft.text.Curation
import graft.vector.{CellIndex, Similarity}

/** Round-16 contract for the PURGE EXECUTION step (the r15 verdict's
  * task #2 — q116 audited right-to-be-forgotten deletions; nothing
  * executed them): a tombstone commit makes a doc unfetchable and
  * unrankable from EVERY serving path immediately; the next compaction
  * bakes the rows out physically and corrects the derived statistics so
  * post-bake answers equal a rebuild from the surviving corpus exactly;
  * tombstone deltas retire once no committed version predates their
  * bake; and the q116 audit's counts reconcile against an executed
  * purge. */
class PurgeSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def cmp(r: org.apache.spark.sql.Row): Seq[Any] =
    r.toSeq.map { case a: Array[Byte] => a.toSeq; case x => x }

  /** A corpus dir holding sf0001's documents MINUS the given ids — the
    * rebuild-on-survivors fixture. */
  private def survivorsDir(purged: Seq[Long]): String = {
    val dir = tmp("purge_surv")
    spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(!col("doc_id").isin(purged: _*))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("a tombstone commit makes the doc unfetchable/unrankable on every serving path") {
    val store = tmp("purge_store")
    val textIdx = tmp("purge_text")
    val phraseIdx = tmp("purge_phrase")
    DocStore.write(spark, sf0001, store)
    TextIndex.write(spark, sf0001, textIdx)
    TextIndex.writePhraseIndex(spark, sf0001, phraseIdx)
    // the purge target: the pre-purge BM25 rank-1 doc plus the snippet
    // page's top doc — docs PROVEN to serve before the purge. The
    // pre-purge window is topN + max victims wide so the survivor
    // comparison below always has 20 reference rows even when both
    // victims sit inside it.
    val preBm = TextIndex.bm25Indexed(spark, textIdx, topN = 22).collect()
    val preSnip = DocStore.snippetSearch(spark, phraseIdx, store).collect()
    val victims = Seq(preBm.head.getLong(1), preSnip.head.getLong(1)).distinct
    // INDEXES FIRST, STORE LAST (the purgeAll ordering contract)
    Tombstones.purgeAll(spark, Seq(textIdx, phraseIdx, store), victims,
      "gdpr_001")
    // unfetchable: the page fetch returns nothing for a purged id
    assert(DocStore.fetchPage(spark, store, victims).count() == 0L,
      "purged docs must be unfetchable from the store")
    // survivors still fetch
    val survivor = preBm.map(_.getLong(1)).find(!victims.contains(_)).get
    assert(DocStore.fetchPage(spark, store, Seq(survivor)).count() == 1L)
    // unrankable: bm25 (the filter lands BEFORE the rank tail — no
    // stolen slot, so the page is still full) …
    val postBm = TextIndex.bm25Indexed(spark, textIdx, topN = 20).collect()
    assert(!postBm.exists(r => victims.contains(r.getLong(1))),
      "purged docs must be unrankable from bm25Indexed")
    assert(postBm.length == 20, "a purged doc must not steal a rank slot")
    // … and pre-bake scores are UNCHANGED for survivors (stale-df
    // semantics): post-purge page = pre-purge page minus victims
    val wantBm = preBm.filter(r => !victims.contains(r.getLong(1)))
      .take(20).map(r => (r.getLong(1), r.getDouble(3))).toSeq
    assert(postBm.map(r => (r.getLong(1), r.getDouble(3))).toSeq == wantBm,
      "pre-bake survivor ranking must equal the pre-purge ranking minus victims")
    // boolean retrieval
    val (must, not) = TextIndex.deriveBoolTerms(spark, textIdx)
    assert(!TextIndex.boolSearch(spark, textIdx, must, not).collect()
      .exists(r => victims.contains(r.getLong(0))),
      "purged docs must be unrankable from boolSearch")
    // phrase + proximity
    val phrase = TextIndex.topPhrase(spark, phraseIdx)
    assert(!TextIndex.phraseSearch(spark, phraseIdx, phrase).collect()
      .exists(r => victims.contains(r.getLong(0))))
    val (ta, tb) = TextIndex.deriveProximityTerms(spark, phraseIdx)
    assert(!TextIndex.proximitySearch(spark, phraseIdx, ta, tb).collect()
      .exists(r => victims.contains(r.getLong(0))))
    // the serving pages: candidates AND content exclude the victims, and
    // the coverage guard does NOT fire (both artifacts share the set)
    val postSnip = DocStore.snippetSearch(spark, phraseIdx, store).collect()
    assert(!postSnip.exists(r => victims.contains(r.getLong(1))),
      "purged docs must be gone from the snippet page")
    assert(!DocStore.mediaSearch(spark, phraseIdx, store).collect()
      .exists(r => victims.contains(r.getLong(1))))
    // replay: the same purge tag short-circuits; a second tag unions
    assert(!Tombstones.purge(spark, store, victims, "gdpr_001"))
    assert(Tombstones.purge(spark, store, Seq(survivor), "gdpr_002"))
    assert(DocStore.fetchPage(spark, store, Seq(survivor)).count() == 0L,
      "a second tombstone tag must union into the filter")
  }

  test("dense arm: a purged doc drops from ANN/hybrid serving (filter; removal rides retrain/rebuild)") {
    val idx = tmp("purge_cell")
    CellIndex.write(spark, sf0001, idx, k = 4, iters = 1)
    val probe = Similarity.probeVector(spark, sf0001)
    val pre = CellIndex.annIvfIndexed(spark, idx, probe, k = 10, nprobe = 4)
      .collect()
    val victim = pre.head.getLong(1)
    Tombstones.purge(spark, idx, Seq(victim), "gdpr_001")
    val post = CellIndex.annIvfIndexed(spark, idx, probe, k = 10, nprobe = 4)
      .collect()
    assert(!post.exists(_.getLong(1) == victim),
      "purged vec must be unrankable from the dense arm")
    assert(post.length == 10, "a purged vec must not steal a rank slot")
    // survivors keep their relative order (cosines are doc-local): the
    // first 9 of the post page are the pre page minus the victim; the
    // 10th is the refill from outside the pre page
    assert(post.map(_.getLong(1)).take(9).toSeq ==
      pre.filter(_.getLong(1) != victim).map(_.getLong(1)).toSeq,
      "survivor order must be unchanged by a dense-arm purge")
    assert(!CellIndex.ivfPqSearch(spark, idx, probe, k = 10, nprobe = 4)
      .collect().exists(_.getLong(0) == victim))
  }

  test("bake at compaction ≡ rebuild on survivors; tombstones retire with pre-bake versions") {
    // purge set: the q116 rule (doc_id % 17 == 0) executed for real
    val victims = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(col("doc_id") % 17 === 0)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(victims.nonEmpty, "fixture must contain purgeable ids")
    val surv = survivorsDir(victims)
    // ---- posting index ----
    val textIdx = tmp("bake_text")
    val rebuilt = tmp("bake_text_rb")
    TextIndex.write(spark, sf0001, textIdx)
    TextIndex.write(spark, surv, rebuilt)
    Tombstones.purge(spark, textIdx, victims, "gdpr_001")
    val v1 = TextIndex.compactVersion(spark, textIdx)
    // physical: no purged row survives in the baked version's postings
    assert(spark.read.parquet(s"$v1/postings")
      .filter(col("doc_id").isin(victims: _*)).count() == 0L,
      "the bake must drop purged rows physically")
    // served answers == rebuild-on-survivors EXACTLY (scores included —
    // df, n_docs, n_toks all corrected by the purged footprint)
    def page(idx: String) = TextIndex.bm25Indexed(spark, idx, topN = 20)
      .collect().map(cmp).toSeq
    assert(page(textIdx) == page(rebuilt),
      "post-bake bm25 must equal a rebuild from the surviving corpus")
    val (must, not) = TextIndex.deriveBoolTerms(spark, rebuilt)
    def boolPage(idx: String) = TextIndex.boolSearch(spark, idx, must, not)
      .collect().map(cmp).toSeq
    assert(boolPage(textIdx) == boolPage(rebuilt),
      "post-bake boolSearch must equal the rebuild")
    // append ≡ rebuild STILL HOLDS for survivors after the bake
    val batch = tmp("bake_batch")
    spark.read.parquet(s"$sf0001/documents.parquet")
      .withColumn("doc_id", col("doc_id") + 800000L)
      .write.mode("overwrite").parquet(s"$batch/documents.parquet")
    TextIndex.append(spark, batch, textIdx, Some("b1"))
    TextIndex.append(spark, batch, rebuilt, Some("b1"))
    assert(page(textIdx) == page(rebuilt),
      "a post-bake fold drifted from the rebuilt index's fold")
    // tombstones retire once no committed version predates the bake
    assert(Tombstones.committedTags(spark, textIdx) == Set("gdpr_001"))
    val removed = TextIndex.vacuumVersions(spark, textIdx, keepLast = 1)
    assert(removed.exists(_.contains(Tombstones.Dir)),
      s"the baked tombstone delta must vacuum with the old versions: $removed")
    assert(Tombstones.committedTags(spark, textIdx).isEmpty)
    assert(page(textIdx) == page(rebuilt),
      "serving must stay correct after the tombstones retire")
    // ---- positional index ----
    val phraseIdx = tmp("bake_phrase")
    val phraseRb = tmp("bake_phrase_rb")
    TextIndex.writePhraseIndex(spark, sf0001, phraseIdx)
    TextIndex.writePhraseIndex(spark, surv, phraseRb)
    Tombstones.purge(spark, phraseIdx, victims, "gdpr_001")
    val pv1 = TextIndex.compactPhraseVersion(spark, phraseIdx)
    assert(spark.read.parquet(s"$pv1/positions")
      .filter(col("doc_id").isin(victims: _*)).count() == 0L)
    // the trigram and udf tables corrected by subtraction: the probe
    // derivations and the searches equal the rebuild's verbatim
    assert(TextIndex.topPhrase(spark, phraseIdx) ==
      TextIndex.topPhrase(spark, phraseRb),
      "post-bake trigram stats must equal the rebuild's")
    val phrase = TextIndex.topPhrase(spark, phraseRb)
    def phrasePage(idx: String) = TextIndex.phraseSearch(spark, idx, phrase)
      .collect().map(cmp).toSeq
    assert(phrasePage(phraseIdx) == phrasePage(phraseRb))
    assert(TextIndex.deriveProximityTermsN(spark, phraseIdx, 2) ==
      TextIndex.deriveProximityTermsN(spark, phraseRb, 2),
      "post-bake udf stats must equal the rebuild's")
    val ts2 = TextIndex.deriveProximityTermsN(spark, phraseRb, 2)
    def proxPage(idx: String) = TextIndex.proximitySearchAll(spark, idx, ts2)
      .collect().map(cmp).toSeq
    assert(proxPage(phraseIdx) == proxPage(phraseRb))
    // ---- doc store ----
    val store = tmp("bake_store")
    DocStore.write(spark, sf0001, store)
    Tombstones.purge(spark, store, victims, "gdpr_001")
    val gen = DocStore.compact(spark, store)
    assert(spark.read.parquet(s"$gen/rows")
      .filter(col("doc_id").isin(victims: _*)).count() == 0L,
      "the store bake must drop purged rows physically")
    val sweep = DocStore.vacuumGenerations(spark, store, keepLast = 1)
    assert(sweep.exists(_.contains(Tombstones.Dir)),
      s"the store's baked tombstones must retire at vacuum: $sweep")
    assert(DocStore.fetchPage(spark, store, victims).count() == 0L,
      "purged docs must stay gone after the tombstones retire")
  }

  test("q116's audit numbers reconcile against an executed purge") {
    val audit = Curation.purgeAudit(spark, sf0001, modulus = 17)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    val (nRows, nPurged) = audit("documents")
    val victims = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(col("doc_id") % 17 === 0)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(victims.length.toLong == nPurged,
      "the executed purge set must be the set the audit counted")
    val store = tmp("audit_store")
    DocStore.write(spark, sf0001, store)
    Tombstones.purge(spark, store, victims, "gdpr_audit")
    val gen = DocStore.compact(spark, store)
    val after = spark.read.parquet(s"$gen/rows").count()
    assert(after == nRows - nPurged,
      s"executed purge removed ${nRows - after} store rows; " +
        s"the audit predicted $nPurged of $nRows")
  }

  // --- round-16 second cut: the two artifacts the r15 verdict noted had
  // no tombstone path — cluster labels and the gram ledger ---

  private def docsDir(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = tmp("purge_docs")
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("cluster index: serve re-roots purged reps; bake re-resolves affected clusters ≡ rebuild") {
    import graft.text.ClusterIndex
    // the ClusterIndexSpec bridge fixture: {1,2} and {3,4} are two base
    // clusters; 5's text covers both, so its fold merges them to label 1
    val aText = "date elder banana fig jasmine grape honey apple cherry iris"
    val cText = "quince sage olive thyme kite lemon mango rose peach nectar"
    val base = docsDir(Seq(1L -> aText, 2L -> aText, 3L -> cText, 4L -> cText))
    val bridge = docsDir(Seq(5L -> (aText + " " + cText)))
    val idx = tmp("purge_cluster")
    ClusterIndex.write(spark, base, idx)
    ClusterIndex.append(spark, bridge, idx, Some("bridge"))
    def served: Map[Long, Long] = ClusterIndex.labels(spark, idx)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(served == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
    // (i) purge the MIN-LABEL doc: its row drops at once and the rep
    // RE-ROOTS to the minimum surviving member — q61's keep flag must
    // not strand a cluster whose canonical doc was purged
    Tombstones.purge(spark, idx, Seq(1L), "gdpr_a")
    assert(served == Map(2L -> 2L, 3L -> 2L, 4L -> 2L, 5L -> 2L),
      "a purged rep must re-root to the min surviving member at serve")
    val union = docsDir(Seq(2L -> aText, 3L -> cText, 4L -> cText,
      5L -> (aText + " " + cText)))
    val keeps = ClusterIndex.nearDupClustersServed(spark, union, idx)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(keeps == Map(2L -> 1L, 3L -> 0L, 4L -> 0L, 5L -> 0L),
      s"exactly the new rep keeps post-purge, got $keeps")
    // (ii) purge the BRIDGE too: pre-bake the merged membership persists
    // (the documented Lucene-style transition — topology corrects at
    // bake); the bake's affected-cluster re-CC then SPLITS it
    Tombstones.purge(spark, idx, Seq(5L), "gdpr_b")
    assert(served == Map(2L -> 2L, 3L -> 2L, 4L -> 2L),
      "pre-bake: membership filters, merged topology persists")
    ClusterIndex.compact(spark, idx)
    assert(served == Map(3L -> 3L, 4L -> 3L),
      "the bake must split the bridge-merged cluster and drop the " +
        "now-singleton survivor (the clustered-subgraph contract)")
    // …which is exactly the rebuild from the surviving corpus
    val survCorpus = docsDir(Seq(2L -> aText, 3L -> cText, 4L -> cText))
    val rebuilt = tmp("purge_cluster_rb")
    ClusterIndex.write(spark, survCorpus, rebuilt)
    assert(ClusterIndex.nearDupClustersServed(spark, survCorpus, idx)
      .collect().map(cmp).toSeq ==
      ClusterIndex.nearDupClustersServed(spark, survCorpus, rebuilt)
        .collect().map(cmp).toSeq,
      "post-bake labels must equal a rebuild from the surviving corpus")
    // physical: no purged doc in the baked generation's fact layers
    val gen = graft.IndexVersions.committedGenerations(
      new org.apache.hadoop.fs.Path(idx).getFileSystem(
        spark.sparkContext.hadoopConfiguration),
      new org.apache.hadoop.fs.Path(idx), "stats/_SUCCESS").max
    Seq("sigs", "bands").foreach { t =>
      assert(spark.read.parquet(s"$idx/_g$gen/$t")
        .filter(col("doc_id").isin(1L, 5L)).count() == 0L,
        s"the bake must drop purged rows from $t physically")
    }
    // append ≡ rebuild still holds for survivors after the bake
    val batch = docsDir(Seq(900000001L -> cText))
    ClusterIndex.append(spark, batch, idx, Some("post_bake"))
    ClusterIndex.append(spark, batch, rebuilt, Some("post_bake"))
    assert(served == Map(3L -> 3L, 4L -> 3L, 900000001L -> 3L))
    assert(ClusterIndex.labels(spark, rebuilt)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap == served)
    // tombstones retire once no committed generation predates the bake
    val sweep = ClusterIndex.vacuumGenerations(spark, idx, keepLast = 1)
    assert(sweep.exists(_.contains(Tombstones.Dir)),
      s"baked cluster tombstones must retire at generation vacuum: $sweep")
    assert(Tombstones.committedTags(spark, idx).isEmpty)
  }

  test("gram ledger: purge subtracts the footprint; bake ≡ physical; corrections apply exactly once") {
    val victims = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(col("doc_id") % 17 === 0)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    val surv = survivorsDir(victims)
    val ledger = tmp("purge_ledger")
    val rebuilt = tmp("purge_ledger_rb")
    Dedup.writeGramLedger(spark, sf0001, ledger)
    Dedup.writeGramLedger(spark, surv, rebuilt)
    // the ledger purge needs the purged docs' TEXT (the footprint) —
    // fetchable because the cascade purges ledgers before the store
    Dedup.purgeGramLedger(spark, ledger, victims, "gdpr_001", sf0001)
    val victimSet = victims.toSet
    def ledgerMap(path: String): Map[String, (Long, Int, Long)] =
      Dedup.readGramLedger(spark, path).collect().map { r =>
        val f = r.getStruct(1)
        r.getString(0) -> ((f.getLong(0), f.getInt(1), r.getLong(2)))
      }.toMap
    def assertAdjustedEqualsRebuild(): Unit = {
      val adj = ledgerMap(ledger)
      val want = ledgerMap(rebuilt)
      assert(adj.keySet == want.keySet,
        "adjusted gram set must equal the rebuild's (purged-only grams " +
          "drop — their content no longer exists anywhere)")
      want.foreach { case (g, (wd, wi, wn)) =>
        val (ad, ai, an) = adj(g)
        assert(an == wn, s"n_occ for '$g': adjusted $an vs rebuilt $wn")
        if ((ad, ai) != ((wd, wi)))
          // divergence is allowed ONLY as the documented sentinel for a
          // purged canonical first — and then the rebuilt first is a
          // surviving occurrence the ledger could not know
          assert(ad == -1L && ai == -1 && !victimSet.contains(wd),
            s"first for '$g': adjusted ($ad,$ai) vs rebuilt ($wd,$wi)")
      }
      assert(!adj.values.exists { case (d, _, _) => victimSet.contains(d) },
        "no purged doc id may stay readable in any first")
    }
    assertAdjustedEqualsRebuild()
    // the serving path agrees: a new batch rewrites IDENTICALLY against
    // the purged ledger and the rebuilt one (canonicality decisions are
    // what the ledger exists for)
    val batch = tmp("purge_ledger_batch")
    spark.read.parquet(s"$sf0001/documents.parquet")
      .withColumn("doc_id", col("doc_id") + 900000000L)
      .write.mode("overwrite").parquet(s"$batch/documents.parquet")
    def rewrite(path: String) =
      Dedup.rewriteBatchAgainstLedger(spark, batch, path)
        .orderBy("doc_id").collect().map(cmp).toSeq
    assert(rewrite(ledger) == rewrite(rebuilt),
      "post-purge rewrites must equal rewrites against the rebuild")
    // bake: the in-chain compaction writes the adjusted table physically
    val gen = Dedup.compactGramLedgerInChain(spark, ledger)
    assert(spark.read.parquet(s"$gen/grams")
      .filter(col("first.doc_id").isin(victims: _*)).count() == 0L,
      "the bake must leave no purged doc reference in the files")
    // exactly-once: the baked generation must NOT re-apply the (still
    // committed, pre-vacuum) delta's subtraction
    assert(Tombstones.committedTags(spark, ledger) == Set("gdpr_001"))
    assertAdjustedEqualsRebuild()
    // fold after the bake: append ≡ rebuild still holds for survivors
    Dedup.appendGramLedger(spark, batch, ledger, "b1")
    Dedup.appendGramLedger(spark, batch, rebuilt, "b1")
    assertAdjustedEqualsRebuild()
    // tombstones retire once no committed generation predates the bake
    val sweep = Dedup.vacuumGramLedgerGenerations(spark, ledger,
      keepLast = 1)
    assert(sweep.exists(_.contains(Tombstones.Dir)),
      s"the baked ledger tombstones must retire at vacuum: $sweep")
    assert(Tombstones.committedTags(spark, ledger).isEmpty)
    assertAdjustedEqualsRebuild()
  }

  test("purge protocol: tag rules, mass bound, and only baked deltas retire") {
    val store = tmp("purge_proto")
    DocStore.write(spark, sf0001, store)
    // dir-unsafe tags refuse before any work (the appendTaggedBatch rules)
    intercept[IllegalArgumentException] {
      Tombstones.purge(spark, store, Seq(1L), ".sneaky")
    }
    // the mass bound refuses a corpus-scale "purge" loudly BEFORE any
    // write (a deletion of that mass is a rebuild, not a tombstone set) —
    // a Range carries its length without materializing 10M ids
    val tooMany = intercept[IllegalArgumentException] {
      Tombstones.purge(spark, store,
        0L to Tombstones.MaxTombstoneIds, "corpus_scale")
    }
    assert(tooMany.getMessage.contains("rebuild"),
      s"the mass refusal must say what to do instead: ${tooMany.getMessage}")
    // SNAPSHOT DISCIPLINE: a delta committed AFTER a compaction's entry
    // snapshot is NOT marked baked by it — only pre-snapshot deltas
    // retire at vacuum; the late one keeps filtering until ITS bake
    Tombstones.purge(spark, store, Seq(1L), "gdpr_a")
    DocStore.compact(spark, store) // bakes gdpr_a
    Tombstones.purge(spark, store, Seq(2L), "gdpr_b") // post-bake commit
    DocStore.vacuumGenerations(spark, store, keepLast = 1)
    assert(Tombstones.committedTags(spark, store) == Set("gdpr_b"),
      "only the baked delta may retire; the late one must keep filtering")
    assert(DocStore.fetchPage(spark, store, Seq(1L, 2L)).count() == 0L,
      "both purged docs must stay unfetchable (one baked, one filtered)")
    // the late delta bakes at the NEXT compaction and then retires
    DocStore.compact(spark, store)
    DocStore.vacuumGenerations(spark, store, keepLast = 1)
    assert(Tombstones.committedTags(spark, store).isEmpty)
    assert(DocStore.fetchPage(spark, store, Seq(1L, 2L)).count() == 0L)
  }
}
