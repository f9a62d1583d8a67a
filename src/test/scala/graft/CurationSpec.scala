package graft

import graft.text.Curation

/** Corpus-curation north-star operators (contamination screen, repetition
  * quality, chunking/packing, domain mix, PII redaction). */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private def docsDir(rows: Seq[(Long, String, String, String, Long)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("cur").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("contamination: candidate sharing the benchmark's grams is flagged") {
    val dir = docsDir(Seq(
      (0L, "alpha beta gamma delta epsilon", "en", "s", 30L), // benchmark (id%20==0)
      (1L, "alpha beta gamma delta epsilon", "en", "s", 30L), // fully contaminated
      (2L, "one two three four five six", "en", "s", 27L)))   // clean
    val r = Curation.contamination(spark, dir).collect()
      .map(x => x.getLong(0) -> ((x.getDouble(3), x.getLong(4)))).toMap
    assert(r(1L) == ((1.0, 1L)))
    assert(r(2L) == ((0.0, 0L)))
    assert(!r.contains(0L)) // benchmark docs are not judged
  }

  test("curation manifest: every stage's reason surfaces with right precedence") {
    val w = (0 until 40).map(i => f"tok$i%02d")
    val doc0 = w.mkString(" ")                                     // benchmark
    val doc1 = "the " + (100 until 124).map(i => s"ab$i").mkString(" ") // clean keeper
    val doc3 = "the " + (200 until 224).map(i => s"cd$i").mkString(" ") // clone pair 3/4
    // doc5: 15 consecutive benchmark tokens (13 shared 3-grams of its 23
    // → overlap 0.57 ≥ ½) + unique tail; Jaccard vs doc0 only 0.27, so it
    // stays OUT of doc0's near-dup cluster and the screen decides
    val doc5 = (w.slice(2, 17) ++ Seq("the") ++ (300 until 309).map(i => s"ef$i"))
      .mkString(" ")
    val dir = docsDir(Seq(
      (0L, doc0, "en", "s", doc0.length.toLong),
      (1L, doc1, "en", "s", doc1.length.toLong),
      (2L, "tiny text", "en", "s", 9L),
      (3L, doc3, "en", "s", doc3.length.toLong),
      (4L, doc3, "en", "s", doc3.length.toLong),
      (5L, doc5, "en", "s", doc5.length.toLong)))
    val r = Curation.curationManifest(spark, dir).collect()
      .map(x => x.getLong(0) -> ((x.getString(6), x.getLong(7)))).toMap
    assert(r(0L) == (("benchmark", 0L)))
    assert(r(1L) == (("kept", 1L)))
    assert(r(2L) == (("filtered", 0L)))
    assert(r(3L) == (("kept", 1L)))
    assert(r(4L) == (("near_dup", 0L)), s"clone must lose to its rep: ${r(4L)}")
    assert(r(5L) == (("contaminated", 0L)), s"screened doc: ${r(5L)}")
  }

  test("frame dedup: assets sharing an aligned frame are flagged, unique frames aren't") {
    // docs 1/2 share their first 16-char frame; second frames differ
    val dir = docsDir(Seq(
      (1L, "A" * 16 + "x" * 16 + "BBBB", "en", "s", 36L),
      (2L, "A" * 16 + "y" * 16 + "CCCC", "en", "s", 36L),
      (3L, "D" * 36, "en", "s", 36L)))
    val r = graft.multimodal.Multimodal.frameDedup(spark, dir).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getDouble(3)))).toMap
    assert(r(1L) == ((2L, 1L, 0.5)), s"asset 1: ${r(1L)}")
    assert(r(2L) == ((2L, 1L, 0.5)))
    assert(r(3L) == ((2L, 0L, 0.0)), s"unique-content asset: ${r(3L)}")
  }

  test("repetition: dominant and duplicate tokens drive the fractions") {
    val dir = docsDir(Seq((1L, "a a a a b", "en", "s", 9L)))
    val r = Curation.repetition(spark, dir).head()
    assert(r.getLong(1) == 5)               // n_tokens
    assert(r.getDouble(2) == 1.0 - 2.0 / 5) // dup_tok_frac: 2 distinct of 5
    assert(r.getDouble(3) == 4.0 / 5)       // top_tok_frac: "a" ×4
    assert(r.getDouble(4) == 2.0 / 3)       // trigram "a a a" ×2 of 3
  }

  test("chunking: stride windows cover all tokens, lengths clamp at the tail") {
    val text = (1 to 40).map(i => s"t$i").mkString(" ")
    val dir = docsDir(Seq((1L, text, "en", "s", text.length.toLong)))
    val r = Curation.chunk(spark, dir).collect() // width 32, stride 24
    assert(r.length == 2)
    assert(r(0).getLong(2) == 32) // tokens 1-32
    assert(r(1).getLong(2) == 16) // tokens 25-40 (clamped)
    val expected0 = org.apache.commons.codec.digest.DigestUtils.md5Hex(
      (1 to 32).map(i => s"t$i").mkString(" "))
    assert(r(0).getString(3) == expected0)
  }

  test("domain mix: uniform weights invert per-source doc shares") {
    val dir = docsDir(Seq(
      (1L, "x y", "en", "sa", 3L),
      (2L, "x y", "en", "sb", 3L), (3L, "x y", "en", "sb", 3L),
      (4L, "x y", "en", "sb", 3L)))
    val r = Curation.domainMix(spark, dir).collect()
      .map(x => x.getString(0) -> ((x.getDouble(3), x.getDouble(5)))).toMap
    assert(r("sa") == ((0.25, 2.0)))        // 1/4 of docs → weight (1/2)/(1/4)
    assert(r("sb")._1 == 0.75)
    assert(math.abs(r("sb")._2 - 2.0 / 3) < 1e-12)
  }

  test("collocations: an always-adjacent pair outranks independent co-occurrence") {
    // "x y" only ever adjacent; "a"/"b" frequent but independent
    val rows = (1L to 10L).map(i => (i, "a b x y b a", "en", "s", 11L))
    val dir = docsDir(rows)
    val r = Curation.collocations(spark, dir, minCount = 5, k = 10).collect()
    assert(r.nonEmpty)
    val top = r.head
    assert((top.getString(0), top.getString(1)) == (("x", "y")))
    assert(top.getDouble(5) > 0.0) // positive PMI: genuinely associated
  }

  test("doc packing: offsets are the exact contiguous prefix sum across blocks") {
    // 2500 docs span multiple blocks (blockSize 1000) — exercises the
    // two-level distributed cumsum, not just the within-block window
    val rows = (0L until 2500L).map { i =>
      val text = (0 to (i % 7).toInt).map(k => s"w$k").mkString(" ")
      (i, text, "en", "s", text.length.toLong)
    }
    val dir = docsDir(rows)
    val r = graft.text.Curation.docPacking(spark, dir, budget = 64).collect()
    assert(r.length == 2500)
    var expected = 0L
    r.foreach { row =>
      assert(row.getLong(2) == expected, s"doc ${row.getLong(0)}")
      assert(row.getLong(3) == expected / 64 && row.getLong(4) == expected % 64)
      expected += row.getLong(1)
    }
  }

  test("filter funnel: cascade conserves counts and each rule drops its doc") {
    // 20 toks, mean word len 5, has stop, only 2 distinct -> dup_frac drop
    val stop20 = Seq.fill(10)("the windows").mkString(" ")
    val dir = docsDir(Seq(
      (1L, "too short", "en", "s", 9L),                        // fails min_tokens
      (2L, Seq.fill(81)("the").mkString(" "), "en", "s", 4L),  // fails max_tokens
      (3L, Seq.fill(20)("a").mkString(" "), "en", "s", 1L),    // fails word_len (len 1)
      (4L, Seq.fill(10)("data batch").mkString(" "), "en", "s", 4L), // fails stopword
      (5L, stop20, "en", "s", 4L),                             // fails dup_frac (2 distinct / 20)
      (6L, (1 to 18).map(i => s"tok$i").mkString("the a ", " ", ""), "en", "s", 5L))) // passes all
    val rows = Curation.filterFunnel(spark, dir).collect()
    assert(rows.map(_.getString(1)).toSeq ==
      Seq("min_tokens", "max_tokens", "word_len", "stopword", "dup_frac"))
    // conservation: n_in - n_dropped = n_out, chained across the cascade
    rows.foreach(r => assert(r.getLong(2) - r.getLong(3) == r.getLong(4)))
    rows.sliding(2).foreach { w => assert(w(0).getLong(4) == w(1).getLong(2)) }
    assert(rows.map(_.getLong(3)).toSeq == Seq(1L, 1L, 1L, 1L, 1L)) // one drop per rule
    assert(rows.last.getLong(4) == 1L)                               // doc 6 survives
  }

  test("stratified sample: rate-1 sources keep everything; decision is h-exact") {
    // source "big": 8 docs, "small": 2 docs -> uniform target = 5 docs/source,
    // so small's rate = 1.0 (keeps all) and big's rate = 5/8
    val docs = (1L to 8L).map(i => (i, s"alpha beta gamma $i", "en", "big", 20L)) ++
      Seq((9L, "delta epsilon zeta", "en", "small", 18L),
          (10L, "eta theta iota", "en", "small", 14L))
    val dir = docsDir(docs)
    val r = Curation.stratifiedSample(spark, dir).collect()
    val bySource = r.groupBy(_.getString(1))
    assert(bySource("small").forall(x => x.getDouble(3) == 1.0 && x.getLong(4) == 1L))
    // big: keep iff h*2*8 < 10*2^24, re-derived from the emitted h
    bySource("big").foreach { x =>
      val expect = if (x.getLong(2) * 16 < 10L * 16777216L) 1L else 0L
      assert(x.getLong(4) == expect)
    }
    assert(r.map(_.getLong(0)).toSeq == (1L to 10L)) // deterministic order
  }

  test("length buckets: power-of-2 boundaries, full coverage, exact pad waste") {
    def words(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    val dir = docsDir(Seq(
      (1L, words(1), "en", "s", 2L),   // bucket 0 [1,1], pad to 2 -> waste 1
      (2L, words(3), "en", "s", 6L),   // bucket 1 [2,3], pad to 4 -> waste 1
      (3L, words(4), "en", "s", 8L),   // bucket 2 [4,7], pad to 8 -> waste 4
      (4L, words(7), "en", "s", 14L),  // bucket 2, waste 1
      (5L, words(8), "en", "s", 16L))) // bucket 3 [8,15], waste 8
    val r = Curation.lengthBuckets(spark, dir).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(7))))
      .toMap
    assert(r(0L) == ((1L, 1L, 1L, 1L)))
    assert(r(1L) == ((2L, 3L, 1L, 1L)))
    assert(r(2L) == ((4L, 7L, 2L, 5L)))
    assert(r(3L) == ((8L, 15L, 1L, 8L)))
    assert(r.values.map(_._3).sum == 5L) // every doc landed in exactly one bucket
  }

  test("quality calibration: per-source quartiles are ordered, tiers consistent") {
    val r = Curation.qualityCalibration(spark, sf0001).collect()
    assert(r.length == 500) // every doc judged
    // thresholds are constant per source and ordered p25 <= p50 <= p75
    r.groupBy(_.getString(1)).foreach { case (_, rows) =>
      val thr = rows.map(x => (x.getDouble(3), x.getDouble(4), x.getDouble(5))).distinct
      assert(thr.length == 1)
      val (p25, p50, p75) = thr.head
      assert(p25 <= p50 && p50 <= p75)
    }
    // every row's tier matches its score-vs-threshold position
    r.foreach { x =>
      val (s, p25, p50, p75) = (x.getDouble(2), x.getDouble(3), x.getDouble(4), x.getDouble(5))
      val expected =
        if (s >= p75) "top" else if (s >= p50) "high" else if (s >= p25) "mid" else "low"
      assert(x.getString(6) == expected, s"row $x")
    }
    // quartiles actually split: all four tiers occur somewhere in the corpus
    assert(r.map(_.getString(6)).distinct.sorted.toSeq == Seq("high", "low", "mid", "top"))
  }

  test("mix schedule: sqrt-temperature flattens shares, weights renormalize") {
    val a = (1L to 9L).map(i => (i, (1 to 10).map(j => s"w$j").mkString(" "), "en", "big", 20L))
    val b = Seq((100L, (1 to 10).map(j => s"w$j").mkString(" "), "en", "small", 20L))
    val dir = docsDir(a ++ b)
    val r = Curation.mixSchedule(spark, dir).collect()
      .map(x => x.getString(0) -> x).toMap
    val (big, small) = (r("big"), r("small"))
    assert(big.getLong(2) == 90L && small.getLong(2) == 10L)
    // weights renormalize to 1
    assert(math.abs(big.getDouble(4) + small.getDouble(4) - 1.0) < 1e-9)
    // temperature flattening: the dominant source is down-weighted below its
    // raw share, the tail source up-weighted above it
    assert(big.getDouble(4) < big.getDouble(3))
    assert(small.getDouble(4) > small.getDouble(3))
    // token targets preserve the budget (up to per-source floor loss)
    val targetSum = big.getLong(5) + small.getLong(5)
    assert(targetSum <= 100L && targetSum >= 98L)
    // epochs: the up-weighted source repeats, the down-weighted one subsamples
    assert(small.getDouble(6) > 1.0 && big.getDouble(6) < 1.0)
  }

  test("shard assignment: exhaustive, deterministic, balance ratios sum to n_shards") {
    val dir = docsDir((1L to 200L).map(i =>
      (i, "tok tok tok tok tok", "en", "s", 19L)))
    val r = Curation.shardAssign(spark, dir).collect()
    assert(r.map(_.getLong(0)).forall(s => s >= 0 && s < 16))
    assert(r.map(_.getLong(1)).sum == 200L)
    assert(r.map(_.getLong(2)).sum == 1000L)
    assert(math.abs(r.map(_.getDouble(3)).sum - 16.0) < 1e-9)
    assert(math.abs(r.map(_.getDouble(4)).sum - 16.0) < 1e-9)
    // assignment is a pure function of doc_id: rerunning reproduces exactly
    val again = Curation.shardAssign(spark, dir).collect()
    assert(r.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("gram novelty: corpus-unique trigrams score 1, duplicated ones 0") {
    val dir = docsDir(Seq(
      (1L, "alpha beta gamma delta", "en", "s", 22L), // grams shared with doc 2
      (2L, "alpha beta gamma delta", "en", "s", 22L),
      (3L, "one two three four", "en", "s", 18L),     // grams unique to doc 3
      (4L, "hi there", "en", "s", 8L)))               // too short: no grams
    val r = graft.text.Dedup.gramNovelty(spark, dir).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getDouble(3)))).toMap
    assert(r(1L) == ((2L, 0L, 0.0)))
    assert(r(2L) == ((2L, 0L, 0.0)))
    assert(r(3L) == ((2L, 2L, 1.0)))
    assert(r(4L) == ((0L, 0L, 0.0)))
  }

  test("drift report: share deltas and chi-square terms from the even/odd split") {
    val dir = docsDir(Seq(
      (0L, "x", "en", "s", 10L),   // snapshot A, bucket 3 (bin(10) = 4 digits)
      (2L, "x", "en", "s", 10L),   // snapshot A, bucket 3
      (1L, "x", "en", "s", 10L),   // snapshot B, bucket 3
      (3L, "x", "en", "s", 100L))) // snapshot B, bucket 6 (bin(100) = 7 digits)
    val r = Curation.driftReport(spark, dir).collect()
    assert(r.length == 2)
    val b3 = r(0)
    assert(b3.getLong(1) == 3L && b3.getLong(2) == 2L && b3.getLong(3) == 1L)
    assert(b3.getDouble(4) == 1.0 && b3.getDouble(5) == 0.5)
    assert(b3.getDouble(6) == -0.5)
    assert(b3.getDouble(7) == 0.5) // e = 2·2/2 = 2 → (1−2)²/2
    val b6 = r(1)
    assert(b6.getLong(1) == 6L && b6.getLong(2) == 0L && b6.getLong(3) == 1L)
    assert(b6.getDouble(6) == 0.5)
    assert(b6.isNullAt(7)) // no A mass in the cell → chi² undefined, not ∞
  }

  test("chunk dedup: duplicated docs share every chunk; unique docs share none") {
    val text = (1 to 30).map(i => s"t$i").mkString(" ")
    val other = (1 to 30).map(i => s"u$i").mkString(" ")
    val dir = docsDir(Seq(
      (1L, text, "en", "s", text.length.toLong),
      (2L, text, "en", "s", text.length.toLong),
      (3L, other, "en", "s", other.length.toLong)))
    val r = Curation.chunkDedup(spark, dir).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getDouble(3)))).toMap
    assert(r(1L) == r(2L))                 // identical docs chunk identically
    assert(r(1L)._1 == r(1L)._2 && r(1L)._3 == 1.0) // every chunk duplicated
    assert(r(3L)._2 == 0L && r(3L)._3 == 0.0)       // unique doc shares none
    assert(r(3L)._1 >= 1L)
  }

  test("chunk dedup: codegen'd expression is bit-identical to the exploded window reference") {
    // real corpus (sf0.001, 500 docs) — the differential check that licensed
    // deleting the window formulation from the hot path (CC-spec pattern)
    val fast = Curation.chunkDedup(spark, sf0001).collect()
    val ref = Curation.chunkDedupExploded(spark, sf0001).collect()
    assert(fast.length == ref.length && fast.length > 0)
    fast.zip(ref).foreach { case (a, b) => assert(a == b, s"$a != $b") }
    // edge rows the corpus can't produce: empty text (one empty-string
    // token) and multi-space runs (empty tokens inside a chunk)
    val edge = docsDir(Seq(
      (1L, "", "en", "s", 0L),
      (2L, "a  b", "en", "s", 4L),
      (3L, "solo", "en", "s", 4L)))
    val fe = Curation.chunkDedup(spark, edge).collect()
    val re = Curation.chunkDedupExploded(spark, edge).collect()
    assert(fe.toSeq == re.toSeq)
  }

  test("purge audit: cascade counts cover every artifact and match direct recounts") {
    val rows = graft.text.Curation.purgeAudit(spark, sf001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.keySet == Set("chunks", "documents", "frames", "signatures"))
    // direct recount on the source table
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val nDocs = docs.count()
    val nTomb = docs.filter(org.apache.spark.sql.functions.col("doc_id") % 17 === 0).count()
    assert(rows("documents") == ((nDocs, nTomb)))
    assert(rows("signatures") == ((nDocs, nTomb))) // one signature row per doc
    // derived artifacts fan out: more rows than docs, purge share similar
    assert(rows("chunks")._1 > nDocs && rows("frames")._1 > nDocs)
    assert(rows("chunks")._2 > 0 && rows("frames")._2 > 0)
  }

  test("pii redaction: lexicon and pattern hits are masked and counted") {
    val dir = docsDir(Seq(
      (1L, "customer wrote to test@example.com from +1 (555) 123-4567 as user", "en", "s", 60L)))
    val r = Curation.piiRedact(spark, dir).head()
    assert(r.getLong(1) == 1) // email
    assert(r.getLong(2) == 1) // phone
    assert(r.getLong(3) == 2) // customer + user
    val expected = org.apache.commons.codec.digest.DigestUtils.md5Hex(
      "[REDACTED] wrote to [EMAIL] from [PHONE] as [REDACTED]")
    assert(r.getString(4) == expected)
  }

  test("CurationJob end-to-end: corpus layout, manifest audit, and report agree") {
    import org.apache.spark.sql.functions._
    val out = java.nio.file.Files.createTempDirectory("curated").toString
    val report = graft.app.CurationJob.run(spark, sf0001, out)
    val manifest = spark.read.parquet(s"$out/manifest")
    val corpus = spark.read.parquet(s"$out/corpus")
    // every doc decided exactly once; the reasons partition the corpus
    assert(report.total == manifest.count())
    assert(report.total == spark.read.parquet(s"$sf0001/documents.parquet").count())
    assert(report.byReason.values.sum == report.total)
    // the written corpus IS the manifest's keep set, with text intact
    assert(corpus.count() == report.kept)
    assert(report.kept == manifest.filter(col("in_corpus") === 1).count())
    assert(corpus.columns.contains("text") && corpus.columns.contains("split"))
    // split partitioning: on-disk dirs are exactly the splits the
    // manifest assigned to kept docs
    val keptSplits = manifest.filter(col("in_corpus") === 1)
      .select("split").distinct().collect().map(_.getString(0)).toSet
    val dirs = new java.io.File(s"$out/corpus").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("split="))
      .map(_.stripPrefix("split=")).toSet
    assert(dirs == keptSplits)
    // report rows round-trip: reasons partition the total, "kept" = corpus
    val rep = spark.read.parquet(s"$out/report").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rep == report.byReason)
    assert(rep.values.sum == report.total)
    assert(rep.getOrElse("kept", 0L) == report.kept)
  }

  test("q129 span flags are consistent with q50's doc flags and span geometry") {
    val spans = Curation.contaminationSpans(spark, sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val q50 = Curation.contamination(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap // doc_id -> n_shared
    assert(spans.keySet == q50.keySet) // same non-benchmark population
    spans.foreach { case (id, (nTok, nFlagged)) =>
      // a doc has flagged POSITIONS iff q50 counts a shared distinct gram
      assert((nFlagged > 0) == (q50(id) > 0), s"doc $id vs q50")
      // one trigram hit covers exactly 3 positions; overlaps only shrink
      // the union, and coverage never exceeds the doc
      assert(nFlagged == 0 || nFlagged >= 3, s"doc $id: $nFlagged")
      assert(nFlagged <= nTok, s"doc $id: $nFlagged > $nTok")
    }
    // the fixture actually exercises both sides
    assert(spans.values.exists(_._2 > 0) && spans.values.exists(_._2 == 0))
  }

  test("VectorIndexJob: build + serve end-to-end, counts from persisted artifacts") {
    val idx = java.nio.file.Files.createTempDirectory("vijob_idx").toString
    val out = java.nio.file.Files.createTempDirectory("vijob_out").toString
    val r = graft.app.VectorIndexJob.run(spark, sf0001, idx, out, k = 4)
    val nVecs = spark.read.parquet(s"$sf0001/embeddings.parquet").count()
    assert(r.nVectors == nVecs, s"index must carry every vector: $r")
    assert(r.nCells >= 2 && r.nCells <= 4)
    assert(r.annRows == 10 && r.pqRows == 10)
    // both serving artifacts rank ascending-by-rank / ascending-by-d2
    val ann = spark.read.parquet(s"$out/ann").orderBy("rnk").collect()
    assert(ann.map(_.getLong(0)).toSeq == (1L to 10L))
    val pq = spark.read.parquet(s"$out/ivfpq").collect()
    val d2s = pq.map(_.getDouble(2)).sorted.toSeq
    assert(pq.length == 10 && d2s.head >= 0.0)
  }

  test("SelectionJob: DSIR pick minus contamination, with full provenance") {
    val out = java.nio.file.Files.createTempDirectory("seljob").toString
    val r = graft.app.SelectionJob.run(spark, sf0001, out, k = 50)
    assert(r.candidates == 50 && r.admitted + r.refused == 50)
    val sel = spark.read.parquet(s"$out/selection").collect()
    assert(sel.length == 50)
    val admittedIds = sel.filter(_.getAs[Long]("admitted") == 1)
      .map(_.getAs[Long]("doc_id")).toSet
    sel.foreach { row =>
      val id = row.getAs[Long]("doc_id")
      val isBench = id % 20 == 0
      assert(row.getAs[Boolean]("is_benchmark") == isBench, s"doc $id")
      if (row.getAs[Long]("admitted") == 1) {
        assert(!isBench && row.getAs[Double]("flagged_ratio") <= 0.2, s"doc $id")
      } else {
        assert(isBench || row.getAs[Double]("flagged_ratio") > 0.2, s"doc $id")
      }
    }
    // the written corpus is exactly the admitted docs, with text attached
    val corpus = spark.read.parquet(s"$out/corpus")
    assert(corpus.count() == r.admitted)
    assert(corpus.columns.contains("text"))
    assert(corpus.select("doc_id").collect()
      .map(_.getLong(0)).toSet == admittedIds)
    // the job actually filters something on this fixture (benchmark docs
    // land in the pick because the resample is corpus-wide)
    assert(r.admitted > 0)
  }

  test("q143 domain cap: top-cap per source by (quality desc, doc_id), overflow dropped") {
    // longer docs score higher under fix4 (0.25·log10(nt+1) term, no 'a's)
    def doc(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    val dir = docsDir(Seq(
      (1L, doc(4), "en", "big", 10L),
      (2L, doc(64), "en", "big", 10L),   // highest quality in 'big'
      (3L, doc(16), "en", "big", 10L),
      (4L, doc(8), "en", "small", 10L)))
    val r = Curation.domainCap(spark, dir, cap = 2).collect()
    val big = r.filter(_.getString(0) == "big").map(x => (x.getLong(1), x.getLong(2)))
    // kept: doc 2 (rank 1), doc 3 (rank 2); doc 1 over quota
    assert(big.toSeq == Seq((1L, 2L), (2L, 3L)))
    val small = r.filter(_.getString(0) == "small").map(_.getLong(2))
    assert(small.toSeq == Seq(4L) && r.length == 3)
    // quality ties break by doc_id ascending
    val tied = docsDir(Seq(
      (9L, doc(8), "en", "s", 10L), (7L, doc(8), "en", "s", 10L),
      (8L, doc(8), "en", "s", 10L)))
    val t = Curation.domainCap(spark, tied, cap = 2).collect().map(_.getLong(2))
    assert(t.toSeq == Seq(7L, 8L))
  }

  test("q93 batch fold: manifest ≡ the full manifest restricted to batch docs, end-to-end") {
    import org.apache.spark.sql.functions.col
    // evens = the accepted corpus, odds = today's batch (the q154/q64
    // convention — the parity split keeps both benchmark docs (id % 20)
    // and near-dup candidates on both sides)
    def parityDir(p: Int): String = {
      val d = java.nio.file.Files.createTempDirectory(s"cur_p$p").toString
      spark.read.parquet(s"$sf0001/documents.parquet")
        .filter(col("doc_id") % 2 === p)
        .write.mode("overwrite").parquet(s"$d/documents.parquet")
      d
    }
    val evens = parityDir(0)
    val odds = parityDir(1)
    val work = java.nio.file.Files.createTempDirectory("cur_fold").toString
    graft.text.ClusterIndex.write(spark, evens, s"$work/cluster")
    Curation.writeBenchGrams(spark, evens, s"$work/bench")
    val r = graft.app.CurationJob.runBatch(spark, odds, s"$work/out",
      s"$work/cluster", s"$work/bench", tag = "fold_odd")
    val got = spark.read.parquet(s"$work/out/manifest_batches/fold_odd")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    // the bar: the FULL q93 manifest over the union corpus, restricted
    // to the batch docs
    val want = Curation.curationManifest(spark, sf0001)
      .filter(col("doc_id") % 2 === 1)
      .collect().map(_.toSeq).toSeq
    assert(got == want,
      "batch-fold manifest drifted from the full manifest on batch docs")
    assert(r.total == want.length.toLong)
    // replay: both artifact folds short-circuit on the tag; the manifest
    // rewrite is deterministic-identical
    val r2 = graft.app.CurationJob.runBatch(spark, odds, s"$work/out",
      s"$work/cluster", s"$work/bench", tag = "fold_odd")
    assert(r2 == r, "a replayed fold must produce the identical report")
    assert(graft.text.ClusterIndex.appliedTags(spark, s"$work/cluster") ==
      Set("fold_odd"))
    assert(Curation.benchGramAppliedTags(spark, s"$work/bench") ==
      Set("fold_odd"))
  }

  test("q93 composite read: a cluster fold ahead of the bench grams serves the last SYNCHRONIZED state") {
    // round 15 — the r14 verdict's task #2: curationManifestBatch reads
    // TWO separately-published artifacts. A fold of tag b2 that has
    // committed its cluster labels but not yet its bench-gram delta (the
    // crash/mid-publish window) must NOT leak b2's labels into a
    // composite read — the resolver pins the newest cluster version the
    // bench-gram deltas cover, and the bench read pins to that ledger.
    import org.apache.spark.sql.functions.{col, length, lit}
    import spark.implicits._
    import graft.text.ClusterIndex
    def docsDir(rows: Seq[(Long, String)]): String = {
      val dir = java.nio.file.Files.createTempDirectory("cur_sync").toString
      rows.toDF("doc_id", "text")
        .withColumn("lang", lit("en")).withColumn("source", lit("t"))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      dir
    }
    // two base clusters A={1,2} (label 1) and C={3,4} (label 3); batch b1
    // near-dups C (rep 3); batch b2 BRIDGES A and C (the ClusterIndexSpec
    // merge fixture) — after b2's cluster fold, b1's doc relabels 3 → 1,
    // so a mixed-state read is observable in b1's manifest rows
    val aText = "date elder banana fig jasmine grape honey apple cherry iris"
    val cText = "quince sage olive thyme kite lemon mango rose peach nectar"
    // doc 20 is a BENCHMARK doc (id % 20 == 0) so the bench-gram base is
    // non-empty (the empty-partitioned-base state is writeBenchGrams'
    // real-corpus invariant, not this spec's subject)
    val base = docsDir(Seq(1L -> aText, 2L -> aText, 3L -> cText, 4L -> cText,
      20L -> "benchmark holdout words kept apart from every cluster text"))
    val b1 = docsDir(Seq(11L -> cText))
    val b2 = docsDir(Seq(21L -> (aText + " " + cText)))
    val work = java.nio.file.Files.createTempDirectory("cur_syncw").toString
    ClusterIndex.write(spark, base, s"$work/cluster")
    Curation.writeBenchGrams(spark, base, s"$work/bench")
    // b1 folded into BOTH artifacts — the synchronized state
    ClusterIndex.append(spark, b1, s"$work/cluster", Some("b1"))
    assert(Curation.appendBenchGrams(spark, b1, s"$work/bench", "b1"))
    val want = Curation.curationManifestBatch(spark, b1,
      s"$work/cluster", s"$work/bench").collect().map(_.toSeq).toSeq
    assert(want.exists(r => r(0) == 11L && r(1) == 3L),
      s"fixture: b1's doc must cluster with C (rep 3) at the b1 state: $want")
    // b2 folded into the CLUSTER ONLY — the crash window; the CURRENT
    // label table now carries the merge (11 → 1), which is exactly what
    // the composite read must NOT serve
    ClusterIndex.append(spark, b2, s"$work/cluster", Some("b2"))
    val mixed = ClusterIndex.labels(spark, s"$work/cluster")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(mixed(11L) == 1L,
      s"fixture: b2's bridge must merge the clusters in the CURRENT labels: $mixed")
    val got = Curation.curationManifestBatch(spark, b1,
      s"$work/cluster", s"$work/bench").collect().map(_.toSeq).toSeq
    assert(got == want,
      "the composite read leaked the unsynchronized cluster fold — it " +
        "must serve the last state BOTH artifacts cover")
    // completing b2's bench fold advances the synchronized state: the
    // merge now serves
    assert(Curation.appendBenchGrams(spark, b2, s"$work/bench", "b2"))
    val advanced = Curation.curationManifestBatch(spark, b1,
      s"$work/cluster", s"$work/bench").collect().map(_.toSeq).toSeq
    assert(advanced.exists(r => r(0) == 11L && r(1) == 1L),
      s"after both folds commit, the merged labels must serve: $advanced")
  }
}
