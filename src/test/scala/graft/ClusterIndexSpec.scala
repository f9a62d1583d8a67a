package graft

import org.apache.spark.sql.functions._
import graft.text.{ClusterIndex, Dedup}

/** Round-12 contract for the AT-REST CLUSTER INDEX (incremental near-dup
  * cluster maintenance — the last dedup-family member without an
  * incremental form): a fold must equal the full q49 recompute over the
  * union corpus EXACTLY (contracted-graph CC — band matching is
  * pairwise-static, so no old↔old edge can appear later and each old
  * label is its cluster's min doc_id), including the case where one
  * batch doc transitively MERGES two old clusters. */
class ClusterIndexSpec extends SparkSpec {

  private def parityDir(parity: Int): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"ci_p$parity").toString
    spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(col("doc_id") % 2 === parity)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def docsDir(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ci_docs").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q160: append ≡ full q49 recompute over the union corpus") {
    val evens = parityDir(0)
    val odds = parityDir(1)
    val idx = java.nio.file.Files.createTempDirectory("ci_idx").toString
    ClusterIndex.write(spark, evens, idx)
    ClusterIndex.append(spark, odds, idx, Some("fold_odd"))
    assert(ClusterIndex.appliedTags(spark, idx) == Set("fold_odd"))
    val served = ClusterIndex.nearDupClustersServed(spark, sf0001, idx)
      .collect().map(_.toSeq).toSeq
    val want = Dedup.nearDupClusters(spark, sf0001)
      .collect().map(_.toSeq).toSeq
    assert(served == want,
      "maintained cluster labels drifted from the full q49 recompute")
  }

  test("a batch doc that bridges two old clusters merges them — members of both relabel") {
    // A/B and C/D are two base clusters with no cross candidacy; E's text
    // is A's ++ C's, so E's shingle set covers both — its minhashes split
    // between the two sides (est(E,A) = est(E,C) = 0.5 on this fixture,
    // probed against the md5 rule) and E band-matches BOTH clusters
    val aText = "date elder banana fig jasmine grape honey apple cherry iris"
    val cText = "quince sage olive thyme kite lemon mango rose peach nectar"
    val base = docsDir(Seq(1L -> aText, 2L -> aText, 3L -> cText, 4L -> cText))
    val batch = docsDir(Seq(5L -> (aText + " " + cText)))
    val idx = java.nio.file.Files.createTempDirectory("ci_merge").toString
    ClusterIndex.write(spark, base, idx)
    val before = ClusterIndex.labels(spark, idx)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(before == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L),
      s"base fixture must resolve two distinct clusters, got $before")
    ClusterIndex.append(spark, batch, idx, Some("bridge"))
    val after = ClusterIndex.labels(spark, idx)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L),
      s"the bridge must merge both clusters to min-label 1, got $after")
    // ...and the merged state equals the full recompute over the union
    val union = java.nio.file.Files.createTempDirectory("ci_u").toString
    spark.read.parquet(s"$base/documents.parquet")
      .unionByName(spark.read.parquet(s"$batch/documents.parquet"))
      .write.mode("overwrite").parquet(s"$union/documents.parquet")
    val served = ClusterIndex.nearDupClustersServed(spark, union, idx)
      .collect().map(_.toSeq).toSeq
    val want = Dedup.nearDupClusters(spark, union)
      .collect().map(_.toSeq).toSeq
    assert(served == want, "merged labels drifted from the full recompute")
  }

  test("version vacuum never un-commits a compacted generation — folds after a compaction survive") {
    // round 16 — the 1000× fold bench's data-loss find: the base's
    // stats/_SUCCESS at a compacted generation's root is ALSO the
    // generation's commit marker, and the old vacuum rule (dirsOf(0) =
    // stats+labels, copied from TextIndex's generation-less chain)
    // deleted it two folds after every compaction: resolution regressed
    // to the stale pre-compaction root, the cadence re-compacted it,
    // and every fold since the compaction was silently destroyed. This
    // drives the exact sequence: fold, compact, then keep folding with
    // the maintenance job's per-fold vacuum cadence.
    def pair(words: String) = Seq.tabulate(2)(k => words -> k)
    def batch(i: Int, words: String): String =
      docsDir(pair(words).zipWithIndex.map { case ((w, _), k) =>
        (i * 10L + k) -> w })
    val vocab = Seq(
      "ant bee cat dog elk fox gnu hen ibis jay",
      "kite lark mole newt owl pig quail rat seal toad",
      "urial vole wren yak zebu asp boar crane dove eel",
      "finch goat heron iguana joey koala llama mink nene otter",
      "puma quokka raven shrew tapir urchin vervet walrus xerus yapok")
    val idx = java.nio.file.Files.createTempDirectory("ci_genvac").toString
    ClusterIndex.write(spark, batch(0, vocab(0)), idx)
    def foldAndVacuum(i: Int): Unit = {
      ClusterIndex.append(spark, batch(i, vocab(i)), idx, Some(s"f$i"))
      ClusterIndex.vacuumVersions(spark, idx, keepLast = 2)
    }
    foldAndVacuum(1)
    ClusterIndex.compact(spark, idx)
    // the old rule un-committed the generation on the SECOND post-
    // compaction fold's vacuum; run three to cross the boundary twice
    foldAndVacuum(2); foldAndVacuum(3); foldAndVacuum(4)
    assert(ClusterIndex.appliedTags(spark, idx) ==
      Set("f1", "f2", "f3", "f4"),
      "every post-compaction fold must stay applied")
    // served labels equal the full recompute over the union corpus —
    // five clusters, one per vocabulary
    val union = docsDir((0 to 4).flatMap(i =>
      pair(vocab(i)).zipWithIndex.map { case ((w, _), k) =>
        (i * 10L + k) -> w }))
    val served = ClusterIndex.nearDupClustersServed(spark, union, idx)
      .collect().map(_.toSeq).toSeq
    val want = Dedup.nearDupClusters(spark, union)
      .collect().map(_.toSeq).toSeq
    assert(served == want,
      "labels after fold→compact→fold→vacuum must equal the recompute")
  }

  test("threshold and buckets are artifact semantics — folds read them from stats") {
    // base built at minJaccard 0.9: A and a HALF-overlapping batch doc
    // must NOT merge even though they band-match (est 0.5 < 0.9) — a fold
    // that recomputed the threshold from a default would merge them
    val aText = "date elder banana fig jasmine grape honey apple cherry iris"
    val cText = "quince sage olive thyme kite lemon mango rose peach nectar"
    val base = docsDir(Seq(1L -> aText, 2L -> aText, 3L -> cText, 4L -> cText))
    val batch = docsDir(Seq(5L -> (aText + " " + cText)))
    val idx = java.nio.file.Files.createTempDirectory("ci_thr").toString
    ClusterIndex.write(spark, base, idx, minJaccard = 0.9)
    ClusterIndex.append(spark, batch, idx, Some("bridge"))
    val after = ClusterIndex.labels(spark, idx)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L),
      s"a 0.5-est bridge must not merge clusters under a 0.9 threshold, got $after")
  }

  test("sharded base build ≡ the one-shot build: identical labels, identical folds after") {
    // the disk-bounded form (round 13): per-band-bucket edge extraction +
    // CC over the union edge set must reproduce write()'s labels
    // byte-for-byte (the decomposition is exact — band_val determines the
    // bucket, so no cross-shard candidate exists)
    val idxOne = java.nio.file.Files.createTempDirectory("ci_one").toString
    val idxShard = java.nio.file.Files.createTempDirectory("ci_shard").toString
    ClusterIndex.write(spark, sf0001, idxOne)
    ClusterIndex.writeSharded(spark, sf0001, idxShard, shards = 3)
    def labelMap(p: String) = ClusterIndex.labels(spark, p)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labelMap(idxShard) == labelMap(idxOne),
      "sharded base labels drifted from the one-shot build")
    // the scratch edge dir is cleaned up
    val fs = new org.apache.hadoop.fs.Path(idxShard)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(idxShard, ".edges_build")),
      "the sharded build must remove its scratch edges")
    // a fold lands on the sharded base exactly as on the one-shot base
    val batch = docsDir(Seq(900001L ->
      "date elder banana fig jasmine grape honey apple cherry iris"))
    ClusterIndex.append(spark, batch, idxOne, Some("b0"))
    ClusterIndex.append(spark, batch, idxShard, Some("b0"))
    assert(labelMap(idxShard) == labelMap(idxOne),
      "a fold on the sharded base drifted from the one-shot base's")
  }

  test("exact-dup pre-pass: a duplicate-heavy corpus builds the same labels as the one-shot") {
    // round-14: writeSharded collapses exact-signature classes to their
    // min-id representative before banding (within-group band collisions
    // are quadratic in group size — the measured ×11.7 last decade of
    // the 1000× base) and reattaches members by class after labeling.
    // Construct a corpus with explicit duplicate groups: 3 exact copies
    // of every 10th doc, plus an exact-dup PAIR whose text is unique in
    // the corpus (its class must form its own cluster under the rep —
    // the unclustered-rep arm of the reattach).
    val dir = java.nio.file.Files.createTempDirectory("ci_dup").toString
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val dups = docs.filter(col("doc_id") % 10 === 0)
    import spark.implicits._
    val loner = Seq(
      (800001L, "zq xv wq pk jm nr tb vc dx ez fy gu hw ij kl"),
      (800002L, "zq xv wq pk jm nr tb vc dx ez fy gu hw ij kl"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    docs
      .unionByName(dups.withColumn("doc_id", col("doc_id") + 600000L))
      .unionByName(dups.withColumn("doc_id", col("doc_id") + 700000L))
      .unionByName(loner.select(docs.columns.map(col).toSeq: _*))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val idxOne = java.nio.file.Files.createTempDirectory("ci_dup1").toString
    val idxShard = java.nio.file.Files.createTempDirectory("ci_dups").toString
    ClusterIndex.write(spark, dir, idxOne)
    ClusterIndex.writeSharded(spark, dir, idxShard, shards = 3)
    def labelMap(p: String) = ClusterIndex.labels(spark, p)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val one = labelMap(idxOne)
    assert(labelMap(idxShard) == one,
      "pre-pass labels drifted from the one-shot build on a duplicate-heavy corpus")
    // the unique exact-dup pair clustered under its min id
    assert(one.get(800001L).contains(800001L) &&
      one.get(800002L).contains(800001L),
      s"the exact-dup pair must form its own cluster: $one")
    // the scratch class/rep-band dirs are cleaned up
    val fs = new org.apache.hadoop.fs.Path(idxShard)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    for (d <- Seq(".classes_build", ".rep_bands_build", ".edges_build"))
      assert(!fs.exists(new org.apache.hadoop.fs.Path(idxShard, d)),
        s"the sharded build must remove its scratch $d")
    // folds land identically on both bases
    val batch = docsDir(Seq(900001L ->
      "date elder banana fig jasmine grape honey apple cherry iris"))
    ClusterIndex.append(spark, batch, idxOne, Some("b0"))
    ClusterIndex.append(spark, batch, idxShard, Some("b0"))
    assert(labelMap(idxShard) == labelMap(idxOne),
      "a fold on the pre-pass base drifted from the one-shot base's")
  }

  test("hot-bucket salted fallback: pair set ≡ the plain self-join, per-cell work bounded") {
    import spark.implicits._
    // synthetic band table: one HOT bucket (200 members — C(n,2) = 19900
    // pairs on ONE join key, the shape no shard count can split), two
    // cold buckets, one singleton
    val rows =
      (1L to 200L).map(d => (d, 0, "hotval")) ++
      (301L to 320L).map(d => (d, 1, "coldA")) ++
      (401L to 405L).map(d => (d, 0, "coldB")) ++
      Seq((500L, 2, "single"))
    val bands = rows.toDF("doc_id", "band_id", "band_val")
    val budget = 500L // forces the hot bucket onto the salted path
    val got = ClusterIndex.bandCandidatePairs(bands, budget)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val plain = bands.as("x").join(bands.as("y"),
        col("x.band_id") === col("y.band_id") &&
        col("x.band_val") === col("y.band_val") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id"), col("y.doc_id"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == plain, "salted candidate set diverged from the self-join")
    // the bound the decomposition exists for: with chunkRows = ⌊√(2·500)⌋
    // = 31 and k = ⌈200/31⌉ = 7, no (band, cell) join key may carry more
    // than ~chunkRows rows per side — per-key work ≤ ~2×budget instead of
    // 19900 comparisons on one key
    val chunkRows = math.floor(math.sqrt(2.0 * budget)).toLong
    val k = math.ceil(200.0 / chunkRows).toInt
    val perChunk = bands.filter(col("band_val") === "hotval")
      .groupBy(pmod(xxhash64(col("doc_id")), lit(k))).count()
      .collect().map(_.getLong(1))
    assert(perChunk.max <= 2 * chunkRows,
      s"a chunk holds ${perChunk.max} rows — the hash spread failed")
  }

  test("salted fallback leaves the sharded build's labels byte-identical under a forced tiny budget") {
    val idxDefault = java.nio.file.Files.createTempDirectory("ci_salt_d").toString
    val idxSalted = java.nio.file.Files.createTempDirectory("ci_salt_s").toString
    ClusterIndex.writeSharded(spark, sf0001, idxDefault, shards = 2)
    // budget 1: EVERY bucket with ≥2 members takes the salted path
    ClusterIndex.writeSharded(spark, sf0001, idxSalted, shards = 2,
      perTaskPairBudget = 1L)
    val a = spark.read.parquet(s"$idxDefault/labels")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = spark.read.parquet(s"$idxSalted/labels")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b, "salted build's labels diverged from the plain build's")
    assert(a.nonEmpty)
  }

  test("routed base build: the pure rule one-shots, shards with a derived count, refuses unsplittable shapes") {
    // round 16 — the r15 verdict's task #3: the pair-mass advisor now
    // ROUTES the build instead of only pricing it (the
    // retrainAtImbalance precedent). The pure rule first:
    import ClusterIndex.routeFor
    assert(routeFor(1000L, 1000L, 10L, 32000000L, 32000000L, 64) ==
      ("one_shot", 1), "affordable raw mass one-shots")
    // raw past the bound, collapsed mass derives the count (floor 2)
    assert(routeFor(418000000L, 1000L, 10L, 32000000L, 32000000L, 64) ==
      ("sharded", 2), "dup-heavy shape: tiny collapsed mass shards at the floor")
    assert(routeFor(260000000L, 260000000L, 3783L, 32000000L, 32000000L, 64) ==
      ("sharded", 9), "the measured 1000x cell derives ceil(260M/32M) = 9")
    // one collision bucket's own C(n,2) past the per-shard target: no
    // shard count splits a single band_val's bucket — refuse
    assert(routeFor(100L, 100L, 10000L, 1L, 1000L, 64) == ("refuse", 0),
      "an unsplittable bucket must refuse (C(10k,2) >> target)")
    // total collapsed mass past cap x target: refuse at the cap
    assert(routeFor(100L, 1000000L, 2L, 1L, 1000L, 64) == ("refuse", 0),
      "mass past cap x target must refuse")
    intercept[IllegalArgumentException] {
      routeFor(1L, 1L, 1L, 0L, 0L, 64) // degenerate thresholds rejected
    }
    // end-to-end on the spec corpus: default thresholds one-shot (the
    // fixture's mass is tiny) and the routed labels ARE write()'s
    val idxA = java.nio.file.Files.createTempDirectory("ci_rt_a").toString
    val idxB = java.nio.file.Files.createTempDirectory("ci_rt_b").toString
    val r1 = ClusterIndex.writeRouted(spark, sf0001, idxA)
    assert(r1.route == "one_shot" && r1.rawPairs > 0L,
      s"spec corpus must route one-shot: ${r1.advisorRow}")
    ClusterIndex.write(spark, sf0001, idxB)
    def labelMap(p: String) = ClusterIndex.labels(spark, p)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labelMap(idxA) == labelMap(idxB),
      "routed one-shot labels drifted from write()'s")
    // forced past the one-shot bound (threshold seam): routes SHARDED
    // with the derived count and still reproduces the same labels
    val idxC = java.nio.file.Files.createTempDirectory("ci_rt_c").toString
    val r2 = ClusterIndex.writeRouted(spark, sf0001, idxC,
      oneShotMaxPairs = 0L)
    assert(r2.route == "sharded" && r2.shards >= 2,
      s"forced-sharded routing: ${r2.advisorRow}")
    assert(labelMap(idxC) == labelMap(idxB),
      "routed sharded labels drifted from write()'s")
    // a super-critical shape refuses LOUDLY with the advisor row in the
    // message, and builds nothing
    val idxD = java.nio.file.Files.createTempDirectory("ci_rt_d").toString
    val e = intercept[IllegalStateException] {
      ClusterIndex.writeRouted(spark, sf0001, idxD,
        oneShotMaxPairs = 0L, perShardTargetPairs = 1L, maxShards = 2)
    }
    assert(e.getMessage.contains("raw_pairs=") &&
      e.getMessage.contains("route=refuse"),
      s"the refusal must carry the advisor row: ${e.getMessage}")
    val fs = new org.apache.hadoop.fs.Path(idxD)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$idxD/labels")),
      "a refused build must not leave a label table")
  }

  test("version retention: vacuum keeps the newest folds, the ledger carries tags forward") {
    val evens = parityDir(0)
    val odds = parityDir(1)
    val idx = java.nio.file.Files.createTempDirectory("ci_vac").toString
    ClusterIndex.write(spark, evens, idx)
    ClusterIndex.append(spark, odds, idx, Some("b0"))
    val more = docsDir(Seq(900001L ->
      "date elder banana fig jasmine grape honey apple cherry iris"))
    ClusterIndex.append(spark, more, idx, Some("b1"))
    assert(ClusterIndex.appliedTags(spark, idx) == Set("b0", "b1"))
    assert(ClusterIndex.currentRoot(spark, idx).endsWith("v2"))
    ClusterIndex.vacuumVersions(spark, idx, keepLast = 1)
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // the BASE (version 0) never vacuums here (round 16 — its
    // stats/_SUCCESS doubles as the generation commit marker at a
    // compacted root; deleting it un-committed the generation and
    // destroyed post-compaction folds at the 1000× tier): base dirs
    // belong to the GENERATION lifecycle and reclaim at
    // vacuumGenerations once superseded
    assert(fs.exists(new org.apache.hadoop.fs.Path(idx, "stats")),
      "the base version must persist through the version vacuum")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(idx, "v1")),
      "vacuum must drop intermediate label versions beyond keepLast")
    assert(ClusterIndex.currentRoot(spark, idx).endsWith("v2"),
      "the newest version must survive vacuum")
    assert(ClusterIndex.appliedTags(spark, idx) == Set("b0", "b1"),
      "the applied-tags ledger must carry forward through vacuum")
    // base sigs/bands are permanent DATA LAYERS of the add-only chain,
    // not version-0 artifacts — vacuuming labels v0 must not touch them
    // (a later fold still probes the corpus-0 slice through them)
    for (art <- Seq("sigs", "bands"))
      assert(fs.exists(new org.apache.hadoop.fs.Path(idx, art)),
        s"vacuum must never reclaim the base $art layer")
    // ...and folding still works against the layered chain post-vacuum
    val more2 = docsDir(Seq(900002L ->
      "quince sage olive thyme kite lemon mango rose peach nectar"))
    ClusterIndex.append(spark, more2, idx, Some("b2"))
    assert(ClusterIndex.appliedTags(spark, idx) == Set("b0", "b1", "b2"))
  }

  test("q167 pair-mass advisor: exact combinatorics; at-rest form agrees; bounds the measured pair table") {
    // round 15 — the r14 verdict's task #8: the advisor prices the
    // banded self-join from one aggregate. Exactness on a constructed
    // corpus: k identical docs put all k in every band bucket, so each
    // of the 4 bands predicts exactly C(k,2) comparisons from a
    // max_bucket of k.
    val k = 5
    val text = "date elder banana fig jasmine grape honey apple cherry iris"
    val dup = docsDir((1L to k.toLong).map(_ -> text))
    val advDup = Dedup.pairMassAdvisor(spark, dup).collect()
    assert(advDup.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L, 3L))
    advDup.foreach { r =>
      assert(r.getLong(1) == 1L && r.getLong(2) == k.toLong &&
        r.getLong(3) == (k * (k - 1) / 2).toLong && r.getLong(4) == k.toLong,
        s"identical-doc fixture must predict C($k,2) per band: $r")
    }
    // real fixture: the prediction is an upper bound on the DISTINCT
    // measured pair table (per-band duplicates only shrink under distinct)
    val adv = Dedup.pairMassAdvisor(spark, sf0001).collect()
    val predicted = adv.map(_.getLong(3)).sum
    val measured = Dedup.minhashPairsUnsorted(spark, sf0001).count()
    assert(measured <= predicted && predicted > 0L,
      s"predicted comparison mass $predicted must bound measured distinct pairs $measured")
    // the at-rest form over an index's persisted bands (base + delta)
    // equals the corpus form over the union corpus — same aggregate,
    // same rows
    val evens = parityDir(0)
    val odds = parityDir(1)
    val idx = java.nio.file.Files.createTempDirectory("ci_adv").toString
    ClusterIndex.write(spark, evens, idx)
    ClusterIndex.append(spark, odds, idx, Some("b0"))
    val atRest = ClusterIndex.pairMassAdvisor(spark, idx)
      .collect().map(_.toSeq).toSeq
    val direct = Dedup.pairMassAdvisor(spark, sf0001)
      .collect().map(_.toSeq).toSeq
    assert(atRest == direct,
      "at-rest advisor drifted from the corpus form on the union corpus")
  }
}
