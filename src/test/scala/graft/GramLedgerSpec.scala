package graft

import org.apache.spark.sql.functions._
import graft.text.{Dedup, TextOps}

/** Round-12 contract for the AT-REST GRAM LEDGER (the artifact behind the
  * incremental span rewrite — q154's design claim, persisted): the folded
  * ledger must equal the union-corpus rebuild row-for-row, the maintained
  * rewrite must equal the full q141 rewrite restricted to batch docs
  * byte-for-byte, replays must add nothing, and the rewrite must not care
  * whether its own batch's delta is already committed. */
class GramLedgerSpec extends SparkSpec {

  private val N = 5

  /** Even/odd doc_id split of the sf0.001 corpus — the q154/q64 snapshot
    * convention (evens = the accepted corpus, odds = today's batch). */
  private def parityDir(parity: Int): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"gl_p$parity").toString
    spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(col("doc_id") % 2 === parity)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  /** The union-corpus ledger built directly (the rebuild arm) — mirrors
    * [[Dedup.writeGramLedger]]'s gram pass over the FULL fixture. */
  private def rebuiltLedgerRows(): Set[(String, Long, Int, Long)] = {
    graft.functions.TextExpressions.register(spark)
    val posGrams = graft.sources.Tables.documents(spark, sf0001)
      .select(col("doc_id"), posexplode(
        graft.functions.TextExpressions.word_ngrams(
          TextOps.tokens(col("text")), N, distinct = false)))
      .toDF("doc_id", "i", "gram")
    Dedup.gramLedgerOf(posGrams)
      .select(col("gram"), col("first.doc_id"), col("first.i"), col("n_occ"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getLong(3)))
      .toSet
  }

  private def ledgerRows(path: String): Set[(String, Long, Int, Long)] =
    Dedup.readGramLedger(spark, path)
      .select(col("gram"), col("first.doc_id"), col("first.i"), col("n_occ"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getLong(3)))
      .toSet

  test("gram ledger: append ≡ union-corpus rebuild row-for-row; replay adds nothing") {
    val evens = parityDir(0)
    val odds = parityDir(1)
    val ledger = java.nio.file.Files.createTempDirectory("gl_led").toString
    Dedup.writeGramLedger(spark, evens, ledger, n = N)
    assert(Dedup.appendGramLedger(spark, odds, ledger, "fold_odd"),
      "first fold of an unseen tag must commit")
    val folded = ledgerRows(ledger)
    assert(folded == rebuiltLedgerRows(),
      "folded ledger drifted from the union-corpus rebuild")
    // replay: the committed tag short-circuits — n_occ is ADDITIVE, so a
    // doubled delta would overstate every count the replay touches
    assert(!Dedup.appendGramLedger(spark, odds, ledger, "fold_odd"),
      "a committed tag must short-circuit")
    assert(Dedup.gramLedgerAppliedTags(spark, ledger) == Set("fold_odd"))
    assert(ledgerRows(ledger) == folded,
      "a replayed fold changed the ledger")
  }

  test("q159: maintained rewrite ≡ full q141 restricted to batch docs, fold-order independent") {
    val evens = parityDir(0)
    val odds = parityDir(1)
    // the full q141 rewrite over the union corpus, restricted to the batch
    // (odd) docs — the exactness bar, and exactly what q159's oracle is
    val want = Dedup.spanRewrite(spark, sf0001, n = N)
      .filter(col("doc_id") % 2 === 1)
      .collect().map(_.toSeq).toSeq
    // ledger WITHOUT the batch folded (rewrite-then-fold order)
    val before = java.nio.file.Files.createTempDirectory("gl_b").toString
    Dedup.writeGramLedger(spark, evens, before, n = N)
    val gotBefore = Dedup.rewriteBatchAgainstLedger(spark, odds, before)
      .collect().map(_.toSeq).toSeq
    assert(gotBefore == want,
      "rewrite against the unfolded ledger drifted from full q141 on batch docs")
    // ledger WITH the batch folded (fold-then-rewrite order): the batch's
    // grams appear on both sides of the merge — min(first) idempotence
    // makes the canonical flags (all the rewrite reads) identical
    assert(Dedup.appendGramLedger(spark, odds, before, "fold_odd"))
    val gotAfter = Dedup.rewriteBatchAgainstLedger(spark, odds, before)
      .collect().map(_.toSeq).toSeq
    assert(gotAfter == want,
      "rewrite against the folded ledger drifted — fold order leaked into the answer")
    // ...and the in-query form (q154) agrees with both, tying the
    // artifact path to the existing oracle family
    val inQuery = Dedup.incrementalSpanRewrite(spark, sf0001, n = N)
      .collect().map(_.toSeq).toSeq
    assert(inQuery == want, "q154's in-query form drifted from q141-restricted")
  }

  test("bulk sharded rewrite ≡ the one-shot micro rewrite for any shard count") {
    // round-14: a batch past the micro-batch bound routes to the
    // bucket-group-sharded pass ([[Dedup.rewriteBulkAgainstLedger]]) —
    // the per-gram canonicality merge partitions exactly by the ledger's
    // gram bucket, so answers must equal the one-shot path row-for-row
    // whatever the shard grouping (the semigroup argument).
    val evens = parityDir(0)
    val odds = parityDir(1)
    val ledger = java.nio.file.Files.createTempDirectory("gl_bulk").toString
    Dedup.writeGramLedger(spark, evens, ledger, n = N)
    val want = Dedup.rewriteBatchAgainstLedger(spark, odds, ledger)
      .collect().map(_.toSeq).toSeq
    for (shards <- Seq(1, 3)) {
      val got = Dedup.rewriteBulkAgainstLedger(spark, odds, ledger, shards)
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
      assert(got == want,
        s"bulk rewrite at shards=$shards drifted from the one-shot path")
    }
    // fold-order independence holds for the bulk path too
    assert(Dedup.appendGramLedger(spark, odds, ledger, "fold_odd"))
    assert(Dedup.rewriteBulkAgainstLedger(spark, odds, ledger, 3)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq == want,
      "bulk rewrite against the folded ledger drifted")
  }

  test("bulk rewrite: explicit scratch on a different filesystem root; default scratch beside the ledger, cleaned up") {
    // round 15 — the r14 verdict's task #1: staging under java.io.tmpdir
    // resolved against fs.defaultFS breaks exactly the >1M-doc arm on
    // clusters whose defaultFS is file:/// while data lives on an object
    // store. The contract now: scratch defaults to a .bulk_scratch_*
    // sibling under the LEDGER ROOT (same FS as the data by
    // construction), and an explicit scratchPath — the non-default-FS
    // seam; a second local dir suffices to exercise the threading — must
    // be honored and swept.
    import org.apache.hadoop.fs.Path
    val evens = parityDir(0)
    val odds = parityDir(1)
    val ledger = java.nio.file.Files.createTempDirectory("gl_scr_l").toString
    Dedup.writeGramLedger(spark, evens, ledger, n = N)
    val want = Dedup.rewriteBatchAgainstLedger(spark, odds, ledger)
      .collect().map(_.toSeq).toSeq
    val fs = new Path(ledger)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // explicit scratch dir, elsewhere: used (observed via the shard
    // fragments the pass writes there) and removed on completion
    val scr = java.nio.file.Files.createTempDirectory("gl_scr_x").toString
    val scratch = s"$scr/frag_staging"
    val got = Dedup.rewriteBulkAgainstLedger(spark, odds, ledger,
        shards = 2, scratchPath = Some(scratch))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(got == want, "bulk rewrite under an explicit scratch drifted")
    assert(!fs.exists(new Path(scratch)),
      "explicit scratch dir must be deleted after the rewrite")
    // default scratch: lands beside the ledger (never under
    // java.io.tmpdir) and is deleted after; a crashed predecessor's
    // stale nonce dir is swept by the next bulk rewrite
    val stale = new Path(ledger, ".bulk_scratch_deadbeef")
    fs.mkdirs(stale)
    fs.setTimes(stale, System.currentTimeMillis() - 7L * 3600 * 1000, -1)
    val got2 = Dedup.rewriteBulkAgainstLedger(spark, odds, ledger,
        shards = 2)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(got2 == want)
    val leftovers = fs.listStatus(new Path(ledger)).toSeq
      .map(_.getPath.getName).filter(_.startsWith(".bulk_scratch_"))
    assert(leftovers.isEmpty,
      s"default scratch (and stale crashed scratch) must be swept: $leftovers")
  }

  test("bulk scratch sweep: liveness marker protects a live concurrent rewrite") {
    // round 16 — the r15 ADVICE (medium) + verdict task #6: the sweep
    // keyed on dir mtime alone would delete a LIVE rewrite's fragment
    // staging once it ran past the TTL (and object-store dir mtimes can
    // read stale immediately). The contract now: a dir with a FRESH
    // _RUNNING marker survives any concurrent sweep regardless of the
    // dir's own age (the marker rewrites once per shard); a dir whose
    // marker went stale — the heartbeat stopped — is crashed and sweeps;
    // a marker-less dir falls back to the dir-mtime rule (the pre-marker
    // crash window is one file create).
    import org.apache.hadoop.fs.Path
    val evens = parityDir(0)
    val odds = parityDir(1)
    val ledger = java.nio.file.Files.createTempDirectory("gl_live_l").toString
    Dedup.writeGramLedger(spark, evens, ledger, n = N)
    val fs = new Path(ledger)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val old = System.currentTimeMillis() - 7L * 3600 * 1000
    // the LONG-RUNNING rewrite: dir older than the TTL (it started 7h
    // ago), fragments staged, but its heartbeat marker is FRESH — the
    // per-shard rewrite just touched it
    val live = new Path(ledger, ".bulk_scratch_live0001")
    fs.mkdirs(new Path(live, "occ_0"))
    Dedup.touchBulkScratchMarker(fs, live)
    fs.setTimes(live, old, -1)
    // the CRASHED rewrite: marker present but stale — the heartbeat
    // stopped 7h ago
    val dead = new Path(ledger, ".bulk_scratch_dead0001")
    fs.mkdirs(new Path(dead, "occ_0"))
    Dedup.touchBulkScratchMarker(fs, dead)
    fs.setTimes(new Path(dead, Dedup.BulkScratchRunningMarker), old, -1)
    fs.setTimes(dead, old, -1)
    // the PRE-MARKER crash: no marker at all, dir past the TTL
    val bare = new Path(ledger, ".bulk_scratch_bare0001")
    fs.mkdirs(bare)
    fs.setTimes(bare, old, -1)
    // a FRESH marker-less dir (a concurrent rewrite between mkdir and
    // its first marker write): inside the TTL, must survive
    val young = new Path(ledger, ".bulk_scratch_young001")
    fs.mkdirs(young)
    // direct sweep first: exactly the two crashed dirs go
    val swept = Dedup.sweepStaleBulkScratch(fs, new Path(ledger))
      .map(p => new Path(p).getName).sorted
    assert(swept == Seq(".bulk_scratch_bare0001", ".bulk_scratch_dead0001"),
      s"sweep must take exactly the stale-marker and pre-marker dirs: $swept")
    assert(fs.exists(new Path(live, "occ_0")),
      "a live rewrite's staged fragments must survive the sweep")
    assert(fs.exists(young), "a fresh marker-less dir must survive")
    // end-to-end: a SECOND bulk rewrite (whose entry sweep is the race's
    // deleting side) runs to completion beside the live attempt, and the
    // live attempt's fragments still stand afterwards — the two-rewrite
    // race of the r15 verdict's task #6
    Dedup.touchBulkScratchMarker(fs, live)
    fs.setTimes(live, old, -1)
    val got = Dedup.rewriteBulkAgainstLedger(spark, odds, ledger, shards = 2)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val want = Dedup.rewriteBatchAgainstLedger(spark, odds, ledger)
      .collect().map(_.toSeq).toSeq
    assert(got == want, "bulk rewrite beside a live sibling drifted")
    assert(fs.exists(new Path(live, "occ_0")) &&
      fs.exists(new Path(live, Dedup.BulkScratchRunningMarker)),
      "the concurrent rewrite's sweep must not touch a live attempt's " +
        "scratch (fresh _RUNNING marker, old dir mtime)")
  }

  test("bulk shard derivation: tracks ledger bytes between floor 2 and cap 64") {
    // the r14 verdict's task #1 second half: shards were a hardcoded 8 —
    // now ledgerBytes/256MB, clamped. The validated round-14 operating
    // point (~2 GB ledger → 8 shards) must reproduce.
    assert(Dedup.bulkShardsFor(0L) == 2, "floor")
    assert(Dedup.bulkShardsFor(1L) == 2, "floor rounds up past 1")
    assert(Dedup.bulkShardsFor(Dedup.BulkShardTargetBytes * 8) == 8,
      "the round-14 operating point")
    assert(Dedup.bulkShardsFor(Dedup.BulkShardTargetBytes * 8 - 1) == 8,
      "partial shards round UP (footprint bound, never exceeded)")
    assert(Dedup.bulkShardsFor(Long.MaxValue / 2) == 64, "cap")
  }

  test("bloom rider: sized from the measured batch-gram count — long docs keep pruning") {
    // round 15 — the r14 verdict's task #6: sizing from nDocs*512
    // undersized the filter for corpora whose docs run longer than ~512
    // grams (perf-only FPP rise). Now one count() sizes it exactly. The
    // fixture: few docs, each FAR past 512 grams, so the old heuristic
    // would undersize by ~4x; the rewrite must still take the rider
    // (seam-forced size gate) and stay exact.
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def longText(salt: Int): String =
      (0 until 2200).map(i => s"w${rnd.nextInt(5000)}_$salt$i").mkString(" ")
    val corpus = docsLike("gl_long_c",
      (1L to 6L).map(i => (i, longText(i.toInt))))
    val batch = docsLike("gl_long_b",
      (101L to 104L).map(i => (i, longText(i.toInt))))
    val ledger = java.nio.file.Files.createTempDirectory("gl_long_l").toString
    Dedup.writeGramLedger(spark, corpus, ledger, n = N)
    val want = Dedup.rewriteBatchAgainstLedger(spark, batch, ledger)
      .collect().map(_.toSeq).toSeq
    val got = Dedup.rewriteBatchAgainstLedger(spark, batch, ledger,
        bloomMinLedgerBytes = 0L) // force the size gate open
      .collect().map(_.toSeq).toSeq
    assert(got == want, "bloom-ridden rewrite drifted on a long-doc batch")
  }

  private def docsLike(prefix: String, rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory(prefix).toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("a zero-gram batch (all-short docs) rewrites as a no-op without tripping the bloom rider") {
    // round-14 review finding: the bloom prefilter passed the batch gram
    // count as the aggregate's estimatedItems, which Spark rejects at
    // zero — yet a batch whose docs all tokenize shorter than n is a
    // legitimate state (the empty-delta convention).
    import spark.implicits._
    val ledger = java.nio.file.Files.createTempDirectory("gl_zero").toString
    Dedup.writeGramLedger(spark, parityDir(0), ledger, n = N)
    val dir = java.nio.file.Files.createTempDirectory("gl_short").toString
    Seq((700001L, "one two"), (700002L, "three"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Dedup.rewriteBatchAgainstLedger(spark, dir, ledger)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((700001L, 2L, 0L), (700002L, 1L, 0L)),
      s"all-short docs must rewrite untouched: ${got.toSeq}")
  }

  test("gram ledger: compaction preserves rows, tags, and the batch rewrite") {
    val evens = parityDir(0)
    val odds = parityDir(1)
    val ledger = java.nio.file.Files.createTempDirectory("gl_pre").toString
    Dedup.writeGramLedger(spark, evens, ledger, n = N)
    assert(Dedup.appendGramLedger(spark, odds, ledger, "fold_odd"))
    val want = ledgerRows(ledger)
    val compacted = java.nio.file.Files.createTempDirectory("gl_cmp").toString
    Dedup.compactGramLedger(spark, ledger, compacted)
    // merged-base reads equal the layered reads row-for-row
    assert(ledgerRows(compacted) == want,
      "compaction changed the merged ledger")
    // the replay ledger carried forward: a replayed fold adds NOTHING
    // (n_occ is additive — forgetting a tag would double it silently)
    assert(Dedup.gramLedgerAppliedTags(spark, compacted) == Set("fold_odd"))
    assert(!Dedup.appendGramLedger(spark, odds, compacted, "fold_odd"),
      "a compacted root must still short-circuit replayed tags")
    assert(ledgerRows(compacted) == want)
    // the served batch rewrite is identical from the compacted root
    assert(Dedup.rewriteBatchAgainstLedger(spark, odds, compacted)
      .collect().map(_.toSeq).toSeq ==
      Dedup.rewriteBatchAgainstLedger(spark, odds, ledger)
        .collect().map(_.toSeq).toSeq,
      "rewrite drifted across compaction")
    // ...and NEW folds keep landing on the compacted root
    val more = java.nio.file.Files.createTempDirectory("gl_more").toString
    spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(col("doc_id") % 2 === 1)
      .withColumn("doc_id", col("doc_id") + 1000000L)
      .write.mode("overwrite").parquet(s"$more/documents.parquet")
    assert(Dedup.appendGramLedger(spark, more, compacted, "fold_more"))
    assert(Dedup.gramLedgerAppliedTags(spark, compacted) ==
      Set("fold_odd", "fold_more"))
  }

  test("gram ledger: layout scalars are enforced — a fold never recomputes them") {
    val evens = parityDir(0)
    val odds = parityDir(1)
    val ledger = java.nio.file.Files.createTempDirectory("gl_n3").toString
    // base built at n=3: the fold must pick 3 up from stats, not default 5
    Dedup.writeGramLedger(spark, evens, ledger, n = 3)
    assert(Dedup.appendGramLedger(spark, odds, ledger, "fold_odd"))
    graft.functions.TextExpressions.register(spark)
    val posGrams = graft.sources.Tables.documents(spark, sf0001)
      .select(col("doc_id"), posexplode(
        graft.functions.TextExpressions.word_ngrams(
          TextOps.tokens(col("text")), 3, distinct = false)))
      .toDF("doc_id", "i", "gram")
    val want = Dedup.gramLedgerOf(posGrams)
      .select(col("gram"), col("first.doc_id"), col("first.i"), col("n_occ"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getLong(3)))
      .toSet
    assert(ledgerRows(ledger) == want,
      "a fold under a non-default gram size mis-merged — stats not honored")
  }
}
