package graft

import org.apache.spark.sql.functions._
import graft.text.TextIndex

/** Round-8 incremental-maintenance contract for the posting index. A text
  * index carries no trained state, so the bar is higher than CellIndex's:
  * append-then-read must equal a full rebuild over the union corpus
  * EXACTLY — same postings, same merged df table, same scalars, same
  * served BM25 answer. */
class TextIndexAppendSpec extends SparkSpec {

  /** A derived batch corpus over sf0.001's documents: offset ids, text
    * reused verbatim — every term's df doubles on merge, the hardest path
    * for the keyed df sum (all-new vocabulary would never exercise it). */
  private def docsDirFrom(offset: Long): String = {
    val dir = java.nio.file.Files.createTempDirectory("textidx_batch").toString
    spark.read.parquet(s"$sf0001/documents.parquet")
      .withColumn("doc_id", col("doc_id") + offset)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def unionDir(dirs: Seq[String]): String = {
    val dir = java.nio.file.Files.createTempDirectory("textidx_union").toString
    dirs.map(d => spark.read.parquet(s"$d/documents.parquet"))
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("append equals a full rebuild over the union corpus, exactly") {
    val idx = java.nio.file.Files.createTempDirectory("textidx_app").toString
    TextIndex.write(spark, sf0001, idx)
    val batch = docsDirFrom(500000L)
    TextIndex.append(spark, batch, idx)
    assert(TextIndex.currentRoot(spark, idx).endsWith("v1"))
    val rebuilt = java.nio.file.Files.createTempDirectory("textidx_rb").toString
    TextIndex.write(spark, unionDir(Seq(sf0001, batch)), rebuilt)
    // served answer identical
    val got = TextIndex.bm25Indexed(spark, idx).collect().map(_.toSeq)
    val want = TextIndex.bm25Indexed(spark, rebuilt).collect().map(_.toSeq)
    assert(got.toSeq == want.toSeq, "appended index answer drifted from rebuild")
    // artifact-level equality: postings row set and merged df table
    def postings(p: String) = spark.read
      .parquet(s"${TextIndex.currentRoot(spark, p)}/postings")
      .select("tok", "doc_id", "tf", "dl", "tb")
      .collect().map(_.toSeq).toSet
    assert(postings(idx) == postings(rebuilt), "postings row sets differ")
    def dfreq(p: String) = spark.read
      .parquet(s"${TextIndex.currentRoot(spark, p)}/dfreq")
      .select("tok", "df", "tb").collect().map(_.toSeq).toSet
    assert(dfreq(idx) == dfreq(rebuilt), "merged df table differs from rebuild")
    assert(TextIndex.readStats(spark, idx) == TextIndex.readStats(spark, rebuilt))
    // a crashed attempt (no stats/_SUCCESS) is invisible to readers
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(idx, "v99/postings"))
    assert(TextIndex.currentRoot(spark, idx).endsWith("v1"))
    fs.delete(new org.apache.hadoop.fs.Path(idx, "v99"), true)
    // vacuum to the newest version: the base triple goes, v1 still serves
    val dropped = TextIndex.vacuumVersions(spark, idx, keepLast = 1)
    assert(dropped.size == 3 && !fs.exists(new org.apache.hadoop.fs.Path(idx, "stats")))
    val after = TextIndex.bm25Indexed(spark, idx).collect().map(_.toSeq)
    assert(after.toSeq == got.toSeq, "vacuum changed the served answer")
  }

  test("two writers racing one version: winner commits, loser fails loudly, index stays consistent and appendable") {
    import org.apache.hadoop.fs.{FileUtil, Path}
    val conf = spark.sparkContext.hadoopConfiguration
    val idx = java.nio.file.Files.createTempDirectory("textidx_race").toString
    val fs = new Path(idx).getFileSystem(conf)
    TextIndex.write(spark, sf0001, idx)
    // writer A commits v1
    val bA = docsDirFrom(800000L)
    TextIndex.append(spark, bA, idx)
    // writer B raced A for v1: it resolved the version list BEFORE A's
    // publish and assembled its own isolated staging (per-attempt nonce
    // dirs — the round-8 hardening — mean the assemblies never mix).
    // Reproduce B's assembly deterministically: build the same base in a
    // scratch index, append B's batch there, and lift its v1 payload into
    // a staging dir beside A's committed v1.
    val bB = docsDirFrom(900000L)
    val scratch = java.nio.file.Files.createTempDirectory("textidx_race_b").toString
    TextIndex.write(spark, sf0001, scratch)
    TextIndex.append(spark, bB, scratch)
    val staging = new Path(idx, ".staging_v1_racer")
    assert(FileUtil.copy(fs, new Path(scratch, "v1"), fs, staging, false, conf))
    // B's publish hits a COMMITTED concurrent winner: it must fail loudly
    // and delete B's own staging — never replace A's version, never leave
    // a silent mix
    val e = intercept[IllegalStateException] {
      IndexVersions.publish(fs, staging, new Path(idx, "v1"),
        t => fs.exists(new Path(t, "stats/_SUCCESS")))
    }
    assert(e.getMessage.contains("concurrent"))
    assert(!fs.exists(staging), "loser's staging must not linger")
    // A's version is untouched and still serves exactly base+bA
    assert(TextIndex.currentRoot(spark, idx).endsWith("v1"))
    val rbA = java.nio.file.Files.createTempDirectory("textidx_race_rba").toString
    TextIndex.write(spark, unionDir(Seq(sf0001, bA)), rbA)
    assert(TextIndex.bm25Indexed(spark, idx).collect().map(_.toSeq).toSeq ==
      TextIndex.bm25Indexed(spark, rbA).collect().map(_.toSeq).toSeq,
      "winner's committed version was disturbed by the losing publish")
    // the loser's documented recovery — re-resolve and retry — lands as v2
    // carrying BOTH batches
    TextIndex.append(spark, bB, idx)
    assert(TextIndex.currentRoot(spark, idx).endsWith("v2"))
    val rbAB = java.nio.file.Files.createTempDirectory("textidx_race_rbab").toString
    TextIndex.write(spark, unionDir(Seq(sf0001, bA, bB)), rbAB)
    assert(TextIndex.bm25Indexed(spark, idx).collect().map(_.toSeq).toSeq ==
      TextIndex.bm25Indexed(spark, rbAB).collect().map(_.toSeq).toSeq,
      "retried append after a lost race drifted from the union rebuild")
  }

  test("vacuum: graceMs retains young versions for in-flight readers; stale staging orphans are swept") {
    import org.apache.hadoop.fs.Path
    val idx = java.nio.file.Files.createTempDirectory("textidx_grace").toString
    val fs = new Path(idx).getFileSystem(spark.sparkContext.hadoopConfiguration)
    TextIndex.write(spark, sf0001, idx)
    TextIndex.append(spark, docsDirFrom(600000L), idx)
    TextIndex.append(spark, docsDirFrom(650000L), idx)
    // three committed versions (base, v1, v2); keepLast=1 would drop two —
    // but within the grace window everything is young, so nothing goes
    assert(TextIndex.vacuumVersions(spark, idx, keepLast = 1,
      graceMs = 24L * 3600 * 1000).isEmpty,
      "grace window must retain versions a reader may still be scanning")
    assert(fs.exists(new Path(idx, "stats")) && fs.exists(new Path(idx, "v1")))
    // a crashed attempt's orphan staging dir (per-attempt nonce, never
    // reused) is swept once old enough — age it artificially
    val orphan = new Path(idx, ".staging_v3_deadbeef")
    fs.mkdirs(orphan)
    fs.setTimes(orphan, System.currentTimeMillis() - 2L * 3600 * 1000, -1)
    val dropped = TextIndex.vacuumVersions(spark, idx, keepLast = 1)
    assert(!fs.exists(orphan), "stale staging orphan must be swept")
    assert(dropped.exists(_.contains(".staging_v3_deadbeef")))
    // and with the grace elapsed (graceMs=0 default) old versions drop,
    // newest still serves
    assert(!fs.exists(new Path(idx, "stats")) && !fs.exists(new Path(idx, "v1")))
    assert(TextIndex.currentRoot(spark, idx).endsWith("v2"))
    assert(TextIndex.bm25Indexed(spark, idx).count() > 0)
  }

  test("MaxScore pruning: skewed hot term goes non-essential, answers stay identical, posting mass drops") {
    import spark.implicits._
    // skewed fixture: 'hot' appears once in 40% of 2000 docs (huge posting
    // list, ceiling LOW — max_tf=1); q1..q4 each appear tf=8 in 60 docs of
    // the 0..239 range (selective, ceiling HIGH); 'zz' is ubiquitous (df
    // excluded by the 2·df<N rule); per-doc filler tokens vary dl
    val n = 2000
    val rows = (0L until n).map { i =>
      val parts = Seq("zz") ++
        (if (i % 10 < 4) Seq("hot") else Nil) ++
        (if (i < 240) Seq.fill(8)(s"q${i / 60 + 1}") else Nil) ++
        Seq.fill((i % 5).toInt + 1)(s"f$i")
      val text = parts.mkString(" ")
      (i, text, "en", s"src${i % 10}", text.length.toLong)
    }
    val dir = java.nio.file.Files.createTempDirectory("maxscore_fix").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val idx = java.nio.file.Files.createTempDirectory("maxscore_idx").toString
    TextIndex.write(spark, dir, idx)
    // the split: hot must be the one non-essential term (ceiling ~1.2e6
    // vs a floor ~3.6e6 from the cheapest selective list)
    val root = TextIndex.currentRoot(spark, idx)
    val (nDocs, nToks) = TextIndex.readStats(spark, idx)
    val qts = TextIndex.deriveQueryTermsAt(spark, root, nDocs, 5)
    assert(qts.map(_.tok).toSet == Set("hot", "q1", "q2", "q3", "q4"))
    val split = TextIndex.maxScoreSplitAt(spark, root, nDocs, nToks, qts, 20)
    assert(split.theta6 > 0)
    assert(split.nonEssential == Seq("hot"),
      s"expected hot non-essential, got $split")
    // ceilings really are ceilings: no posting's s6 exceeds its term's ub6
    val all = TextIndex.bm25Indexed(spark, idx, prune = false)
    // pruned ≡ unpruned ≡ ad-hoc — exact top-k under early termination
    // (minProbeMass = 0 forces the probe past the absolute-mass gate: the
    // fixture's whole posting mass is tiny by design)
    val pruned = TextIndex.bm25Indexed(spark, idx, prune = true, minProbeMass = 0L)
    assert(pruned.collect().map(_.toSeq).toSeq == all.collect().map(_.toSeq).toSeq,
      "MaxScore pruning changed the answer")
    assert(all.collect().map(_.toSeq).toSeq ==
      graft.text.TextOps.bm25(spark, dir).collect().map(_.toSeq).toSeq,
      "indexed BM25 drifted from ad-hoc on the fixture")
    // measured posting-mass reduction: full = every query-term posting;
    // pruned = essential lists + hot∩candidates (+ the floor phase's
    // cheapest list). Candidates live in 0..239, so hot's 800-doc list
    // contributes only its 96 candidate rows.
    val fullMass = qts.map(_.df).sum
    val esMass = qts.filter(q => split.essential.contains(q.tok)).map(_.df).sum
    val hotCand = spark.read.parquet(s"$root/postings")
      .filter(col("tok") === "hot" && col("doc_id") < 240).count()
    val floorMass = qts.map(_.df).min
    val prunedMass = esMass + hotCand + floorMass
    assert(prunedMass * 2 < fullMass,
      s"expected >2x posting-mass reduction: pruned=$prunedMass full=$fullMass")
    // the hot list's candidate filter is a literal IN under the pushdown
    // limit — visible in the plan against the postings scan
    val plan = TextIndex.bm25Indexed(spark, idx, prune = true, minProbeMass = 0L)
      .queryExecution
      .explainString(org.apache.spark.sql.execution.SimpleMode)
    // 240 literals: OptimizeIn rewrites to INSET; either spelling proves
    // the candidate predicate sits on the non-essential scan as a literal
    // filter (pushable), not only as a join
    assert(plan.contains("INSET") || plan.contains(" IN ("),
      s"expected a literal candidate doc_id predicate on the non-essential scan:\n$plan")
    // the absolute-mass gate (100× finding): at this fixture's tiny
    // posting mass the DEFAULT call must SKIP the probe — identical
    // answer, no candidate INSET, no floor-phase actions
    val gated = TextIndex.bm25Indexed(spark, idx).queryExecution
      .explainString(org.apache.spark.sql.execution.SimpleMode)
    assert(!gated.contains("INSET"),
      s"default call below minProbeMass must skip the probe:\n$gated")
    assert(TextIndex.bm25Indexed(spark, idx).collect().map(_.toSeq).toSeq ==
      all.collect().map(_.toSeq).toSeq)
  }

  test("append reuses the persisted bucket count, never a caller parameter") {
    // an index written with a NON-default bucket count must keep it across
    // appends — a caller-supplied count differing from the layout's would
    // silently exclude carried-forward postings from pruned scans
    val idx = java.nio.file.Files.createTempDirectory("textidx_b8").toString
    TextIndex.write(spark, sf0001, idx, buckets = 8)
    val batch = docsDirFrom(700000L)
    TextIndex.append(spark, batch, idx)
    val rebuilt = java.nio.file.Files.createTempDirectory("textidx_b8rb").toString
    TextIndex.write(spark, unionDir(Seq(sf0001, batch)), rebuilt, buckets = 8)
    assert(TextIndex.bm25Indexed(spark, idx).collect().map(_.toSeq).toSeq ==
      TextIndex.bm25Indexed(spark, rebuilt).collect().map(_.toSeq).toSeq,
      "8-bucket appended index drifted from an 8-bucket rebuild")
  }

  private def phraseDocsDir(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("phrase").toString
    rows.map { case (id, text) => (id, text, "en", "s", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("phrase search: exact occurrences and positions, overlaps and repeats counted") {
    val dir = phraseDocsDir(Seq(
      (1L, "a b c d a b c"),     // "a b c" at 0 and 4
      (2L, "x a b c y"),         // at 1
      (3L, "a b x b c"),         // all tokens present, chain broken → NO match
      (4L, "c b a"),             // reversed → no match
      (5L, "a a a a")))          // self-overlapping repeats, no "a b c"
    val idx = java.nio.file.Files.createTempDirectory("phrase_idx").toString
    TextIndex.writePhraseIndex(spark, dir, idx)
    val r = TextIndex.phraseSearch(spark, idx, Seq("a", "b", "c")).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(r == Map(1L -> ((2L, 0L)), 2L -> ((1L, 1L))),
      s"got $r")
    // 4-word phrase chains four position slots
    val r4 = TextIndex.phraseSearch(spark, idx, Seq("a", "b", "c", "d")).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(r4 == Map(1L -> ((1L, 0L))))
    // self-overlapping phrase: "a a a" occurs at 0 and 1 in doc 5
    val rr = TextIndex.phraseSearch(spark, idx, Seq("a", "a", "a")).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(rr == Map(5L -> ((2L, 0L))))
    // the persisted top phrase is the corpus's rank-1 trigram
    assert(TextIndex.topPhrase(spark, idx) == Seq("a", "b", "c"))
  }

  test("proximity search: band join enumerates within-slop pairs exactly once") {
    val dir = phraseDocsDir(Seq(
      (1L, "a x x b"),       // dist 3: outside slop 2, inside slop 3
      (2L, "a b"),           // dist 1
      (3L, "b x a"),         // dist 2 — unordered window (b before a)
      (4L, "a x a b a"),     // a@{0,2,4}, b@3 → within slop 2: (2,3),(4,3)
      (5L, "a a a"),         // no b → absent
      (6L, "x x a x b")))    // a@2 (band 0), b@4 (band 1): adjacent-band pair
    val idx = java.nio.file.Files.createTempDirectory("prox_idx").toString
    TextIndex.writePhraseIndex(spark, dir, idx)
    def got(slop: Int) = TextIndex.proximitySearch(spark, idx, "a", "b", slop)
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(got(2) == Map(2L -> ((1L, 1L)), 3L -> ((1L, 2L)),
      4L -> ((2L, 1L)), 6L -> ((1L, 2L))), s"slop 2: ${got(2)}")
    // widening the slop admits doc 1 and doc 4's third pair — each pair
    // still counted exactly once despite the ±1 band fan-out
    assert(got(3) == Map(1L -> ((1L, 3L)), 2L -> ((1L, 1L)), 3L -> ((1L, 2L)),
      4L -> ((3L, 1L)), 6L -> ((1L, 2L))), s"slop 3: ${got(3)}")
  }

  test("m-term proximity: anchor-banded intersection counts window-straddling triples exactly once") {
    // slop 3 → band width 4: docs chosen so qualifying triples sit inside
    // one band, straddle adjacent bands, and repeat within one doc
    val dir = phraseDocsDir(Seq(
      (1L, "a b c"),             // span 2, one band → 1 triple
      (2L, "x x a b c"),         // a@2 b@3 (band 0), c@4 (band 1) → straddle
      (3L, "a b x x c"),         // span 4 > slop: all present, no window
      (4L, "a b c a"),           // a@{0,3}: (0,1,2) span 2 + (3,1,2) span 2
      (5L, "a b"),               // missing c → absent
      (6L, "c x b x a"),         // reversed order, span 4 > 3 → absent
      (7L, "c b x a")))          // unordered window: span 3 → 1 triple
    val idx = java.nio.file.Files.createTempDirectory("prox3_idx").toString
    TextIndex.writePhraseIndex(spark, dir, idx)
    def got(toks: Seq[String], slop: Int) =
      TextIndex.proximitySearchAll(spark, idx, toks, slop)
        .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    val r = got(Seq("a", "b", "c"), 3)
    assert(r == Map(1L -> ((1L, 2L)), 2L -> ((1L, 2L)), 4L -> ((2L, 2L)),
      7L -> ((1L, 3L))), s"slop 3: $r")
    // anchor choice is a perf knob, never a semantics knob
    assert(got(Seq("c", "b", "a"), 3) == r, "answer must be anchor-independent")
    // tightening the slop drops doc 7 (span 3) but keeps the band-straddler
    val r2 = got(Seq("a", "b", "c"), 2)
    assert(r2 == Map(1L -> ((1L, 2L)), 2L -> ((1L, 2L)), 4L -> ((2L, 2L))),
      s"slop 2: $r2")
    // m = 2 delegation: proximitySearch is the two-term instance
    val p = TextIndex.proximitySearch(spark, idx, "a", "b", 3).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(p(4L) == ((2L, 1L)) && p(1L) == ((1L, 1L)), s"pairs: $p")
  }

  test("q161: df-gated proximity — acceptance is the only thing the threshold changes") {
    // a/b are ubiquitous (every doc), z is rare (2 of 10 docs): the
    // essential list exists for any probe containing z
    val dir = phraseDocsDir(
      Seq((1L, "a b z c"), (2L, "z a a b")) ++
        (3L to 10L).map(i => (i, "a b x y")))
    val idx = java.nio.file.Files.createTempDirectory("prox_gate").toString
    TextIndex.writePhraseIndex(spark, dir, idx)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSeq
    val probe = Seq("z", "b", "a") // rarest first, hottest anchor last
    val want = rows(TextIndex.proximitySearchAll(spark, idx, probe, 3))
    assert(want.nonEmpty, "fixture must produce qualifying tuples")
    // gated ≡ ungated for an accepted probe, at ANY accepting threshold —
    // the semi-join drops only tuple-free docs; the threshold never
    // touches content
    for (thr <- Seq(0.2, 0.5, 1.0))
      assert(rows(TextIndex.proximitySearchGated(spark, idx, probe, 3,
        maxDfShare = thr)) == want, s"gated answer drifted at thr=$thr")
    // an all-hot probe has no essential list below the threshold: refuse
    // loudly (corpus-linear position mass must be a deliberate choice)
    val e = intercept[IllegalArgumentException] {
      TextIndex.proximitySearchGated(spark, idx, Seq("a", "b"), 3,
        maxDfShare = 0.5)
    }
    assert(e.getMessage.contains("gated"), s"expected the gate, got: $e")
    // ...and the same probe is exact when deliberately accepted
    assert(rows(TextIndex.proximitySearchGated(spark, idx, Seq("a", "b"), 3,
      maxDfShare = 1.0)) ==
      rows(TextIndex.proximitySearchAll(spark, idx, Seq("a", "b"), 3)))
    // the q161 derivation ties probe and gate to the fixture corpus
    val derived = TextIndex.deriveGatedProximityProbe(spark, idx)
    assert(derived.length == 3 && derived.distinct.length == 3)
    assert(rows(TextIndex.proximitySearchGated(spark, idx, derived, 3,
      maxDfShare = 1.0)) ==
      rows(TextIndex.proximitySearchAll(spark, idx, derived, 3)),
      "derived gated probe drifted from the ungated answer")
    // BOTH essential-list regimes produce the identical answer (round
    // 13): the default pushdownLimit takes the literal-pushdown arm on
    // this fixture (z's df = 2 ≤ 1024); pushdownLimit = 0 forces the
    // distributed semi-join arm — content must not depend on the regime
    // (maxPosShare = 1.0: the spec fixture's probe deliberately carries
    // most of the tiny corpus's position mass)
    assert(rows(TextIndex.proximitySearchGated(spark, idx, probe, 3,
      maxDfShare = 1.0, pushdownLimit = 0L, maxPosShare = 1.0)) == want,
      "the semi-join essential regime drifted from the pushdown regime")
    // PROBE-WIDE MASS GATE (round 15 — the r14 verdict's task #3): in the
    // semi-join regime a probe of individually-acceptable terms must be
    // refused when its SUMMED position mass exceeds the corpus share —
    // each of a,b passes a 1.0 df gate, but together they carry over half
    // the fixture's positions
    val eMass = intercept[IllegalArgumentException] {
      TextIndex.proximitySearchGated(spark, idx, Seq("z", "b", "a"), 3,
        maxDfShare = 1.0, pushdownLimit = 0L, maxPosShare = 0.2)
    }
    assert(eMass.getMessage.contains("summed position mass"),
      s"expected the probe-wide mass gate, got: $eMass")
    // ...the gate never fires in the PUSHDOWN regime (scan mass is
    // row-group-pruned to the rarest term's ids whatever the width)...
    assert(rows(TextIndex.proximitySearchGated(spark, idx, probe, 3,
      maxDfShare = 1.0, maxPosShare = 0.01)) == want,
      "the mass gate must not touch the pushdown regime")
    // ...and acceptance is, as ever, the only thing it changes
    assert(rows(TextIndex.proximitySearchGated(spark, idx, probe, 3,
      maxDfShare = 1.0, pushdownLimit = 0L, maxPosShare = 0.9)) == want,
      "an accepted probe's answer must not depend on maxPosShare")
  }

  test("phrase-index append equals a union-corpus rebuild exactly; vacuum bounds versions") {
    val idx = java.nio.file.Files.createTempDirectory("phrase_app").toString
    TextIndex.writePhraseIndex(spark, sf0001, idx)
    val batch = docsDirFrom(700000L) // text reused verbatim: every trigram count doubles
    TextIndex.appendPhraseIndex(spark, batch, idx, Some("pb1"))
    assert(TextIndex.phraseCurrentRoot(spark, idx).endsWith("v1"))
    val rebuilt = java.nio.file.Files.createTempDirectory("phrase_rb").toString
    TextIndex.writePhraseIndex(spark, unionDir(Seq(sf0001, batch)), rebuilt)
    val phrase = TextIndex.topPhrase(spark, rebuilt)
    assert(TextIndex.topPhrase(spark, idx) == phrase,
      "merged trigram table must rank the same top phrase")
    assert(TextIndex.phraseSearch(spark, idx, phrase).collect().map(_.toSeq).toSeq ==
      TextIndex.phraseSearch(spark, rebuilt, phrase).collect().map(_.toSeq).toSeq,
      "appended phrase index drifted from a union rebuild")
    // merged trigram table equals the rebuild's row-for-row
    val mergedTri = spark.read.parquet(
        s"${TextIndex.phraseCurrentRoot(spark, idx)}/phrases")
      .select("gram", "n").collect().map(_.toSeq).toSet
    val rebuiltTri = spark.read.parquet(s"$rebuilt/phrases")
      .select("gram", "n").collect().map(_.toSeq).toSet
    assert(mergedTri == rebuiltTri)
    // the round-10 positional artifacts ride the same protocol: merged
    // unigram-df derivation and banded proximity answers equal the
    // rebuild's exactly
    val (ta, tb) = TextIndex.deriveProximityTerms(spark, rebuilt)
    assert(TextIndex.deriveProximityTerms(spark, idx) == ((ta, tb)),
      "merged udf table must derive the same probe pair")
    assert(TextIndex.proximitySearch(spark, idx, ta, tb).collect()
      .map(_.toSeq).toSeq ==
      TextIndex.proximitySearch(spark, rebuilt, ta, tb).collect()
        .map(_.toSeq).toSeq,
      "appended positional index drifted from a union rebuild")
    // second append then vacuum: base evicted, newest two versions remain,
    // the served answer still resolves
    TextIndex.appendPhraseIndex(spark, docsDirFrom(800000L), idx, Some("pb2"))
    val removed = TextIndex.vacuumPhraseVersions(spark, idx, keepLast = 2)
    assert(removed.exists(_.endsWith("positions")) &&
      removed.exists(_.endsWith("phrases")),
      s"base artifact set should be vacuumed, removed: $removed")
    assert(TextIndex.phraseCurrentRoot(spark, idx).endsWith("v2"))
    assert(TextIndex.phraseSearch(spark, idx, phrase).collect().nonEmpty)
  }
}
