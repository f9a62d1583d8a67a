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
