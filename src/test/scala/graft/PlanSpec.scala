package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SimpleMode
import graft.analytics.Relational

/** Plan-quality regression guards (SURVEY §4.2): the physical plans the
  * engine relies on at scale must stay the plans Catalyst actually picks.
  * These assert on explain output so a refactor that silently loses a
  * pushdown, a broadcast, or a top-k pushdown fails the build.
  */
class PlanSpec extends SparkSpec {

  private def explain(df: DataFrame): String =
    df.queryExecution.explainString(SimpleMode)

  test("q01: shipdate predicate reaches the parquet scan; columns pruned") {
    val s = explain(Relational.q01(spark, sf0001))
    assert(s.contains("PushedFilters: [IsNotNull(l_shipdate), GreaterThanOrEqual(l_shipdate"))
    // 5 of 11 lineitem columns read
    assert(s.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int," +
      "l_extendedprice:double,l_discount:double,l_shipdate"))
  }

  test("q02: aggregation is partial before the exchange (map-side combine)") {
    val s = explain(Relational.q02(spark, sf0001))
    assert(s.contains("partial_sum"))
    assert(s.contains("partial_count"))
  }

  test("q03: nation dimension joins via broadcast, no extra shuffle") {
    val s = explain(Relational.q03(spark, sf0001))
    assert(s.contains("BroadcastHashJoin"))
    assert(s.contains("nation.parquet"))
  }

  test("q07: rank filter is pushed below the shuffle (WindowGroupLimit)") {
    val s = explain(Relational.q07(spark, sf0001))
    assert(s.contains("WindowGroupLimit"))
    assert(s.contains("Partial"))
  }

  test("q143: per-domain cap pushes rank filter below the shuffle (WindowGroupLimit)") {
    val s = explain(graft.text.Curation.domainCap(spark, sf0001))
    assert(s.contains("WindowGroupLimit"))
    assert(s.contains("Partial"), "map-side partial top-cap must run before the exchange")
  }

  test("q144: theta sketch agg runs as ObjectHashAggregate (live-object buffers), no cartesian") {
    val s = explain(Relational.thetaOverlap(spark, sf0001))
    // TypedImperativeAggregate must plan into the object-hash path — the
    // sort-based fallback serializes the union per row
    assert(s.contains("ObjectHashAggregate"))
    assert(!s.contains("CartesianProduct"))
  }

  test("q148: proximity search prunes both position lists to their buckets, no corpus scan") {
    import graft.text.TextIndex
    val pi = java.nio.file.Files.createTempDirectory("proxidx").toString
    TextIndex.writePhraseIndex(spark, sf0001, pi)
    val (ta, tb) = TextIndex.deriveProximityTerms(spark, pi)
    val plan = explain(TextIndex.proximitySearch(spark, pi, ta, tb))
    assert(plan.contains("PartitionFilters:") && plan.contains("ub"),
      s"expected unigram-bucket partition pruning:\n$plan")
    assert(plan.contains("EqualTo(tok") || plan.contains("In(tok"),
      s"expected the term predicate pushed to the scan:\n$plan")
    assert(!plan.contains("documents.parquet"),
      s"proximity search must not touch the corpus at query time:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"pair match must stay a banded equi-join:\n$plan")
  }

  test("q153: m-term proximity prunes every position list to its bucket, no corpus scan") {
    import graft.text.TextIndex
    val pi = java.nio.file.Files.createTempDirectory("prox3idx").toString
    TextIndex.writePhraseIndex(spark, sf0001, pi)
    val ts = TextIndex.deriveProximityTermsN(spark, pi, 3)
    val plan = explain(TextIndex.proximitySearchAll(spark, pi, ts.reverse))
    assert(plan.contains("PartitionFilters:") && plan.contains("ub"),
      s"expected unigram-bucket partition pruning:\n$plan")
    assert(plan.contains("EqualTo(tok") || plan.contains("In(tok"),
      s"expected the term predicates pushed to the scan:\n$plan")
    assert(!plan.contains("documents.parquet"),
      s"m-term proximity must not touch the corpus at query time:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"the m-way intersection must stay a banded equi-join:\n$plan")
  }

  test("q161: the gated essential list pushes doc_id literals into every hot position scan") {
    import graft.text.TextIndex
    val pi = java.nio.file.Files.createTempDirectory("proxgate_plan").toString
    TextIndex.writePhraseIndex(spark, sf0001, pi)
    val probe = TextIndex.deriveGatedProximityProbe(spark, pi)
    // the fixture's rarest df is within the pushdown bound, so the gated
    // plan must show the collected essential ids as an In(doc_id, …)
    // PUSHED FILTER on the position scans — (tok, doc_id)-sorted row
    // groups then prune, making hot-list SCAN mass track the rarest
    // term's absolute df (the round-13 regime; the semi-join arm only
    // bounded the shuffle)
    val plan = explain(TextIndex.proximitySearchGated(spark, pi, probe, 3,
      maxDfShare = 1.0))
    assert(plan.contains("In(doc_id"),
      s"expected the essential doc ids pushed into the position scans:\n$plan")
    assert(plan.contains("PartitionFilters:") && plan.contains("ub"),
      s"expected unigram-bucket partition pruning:\n$plan")
    assert(!plan.contains("documents.parquet"),
      s"gated proximity must not touch the corpus at query time:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("q155: boolean retrieval prunes posting scans, intersects in one map-side-combined aggregation, no corpus scan") {
    import graft.text.TextIndex
    val ti = java.nio.file.Files.createTempDirectory("bool_plan").toString
    TextIndex.write(spark, sf0001, ti)
    val (must, not) = TextIndex.deriveBoolTerms(spark, ti)
    val plan = explain(TextIndex.boolSearch(spark, ti, must, not))
    assert(plan.contains("PartitionFilters:") && plan.contains("tb"),
      s"expected term-bucket partition pruning:\n$plan")
    assert(plan.contains("In(tok") || plan.contains("EqualTo(tok"),
      s"expected the term predicates pushed to the scan:\n$plan")
    assert(plan.contains("partial_count"),
      s"the intersection must combine map-side before its one shuffle:\n$plan")
    assert(!plan.contains("documents.parquet"),
      s"boolean retrieval must not touch the corpus at query time:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("q156: the fetch phase prunes the doc store to the page's buckets with the id list pushed") {
    import graft.text.DocStore
    val store = java.nio.file.Files.createTempDirectory("snip_plan_st").toString
    DocStore.write(spark, sf0001, store)
    // the candidate phase is index-resident (q147's pin); this pin is the
    // page's CONTENT fetch — at 100 TB "returning the page never re-scans
    // the corpus" is this partition-pruned point lookup. snippetSearch
    // collects the fetch (≤ topK rows, the single-scan guard), so the pin
    // targets fetchPage — the plan that actually touches the store.
    val plan = explain(DocStore.fetchPage(spark, store, Seq(1L, 7L, 123L)))
    assert(plan.contains("PartitionFilters:") && plan.contains("db"),
      s"expected id-bucket partition pruning on the store scan:\n$plan")
    assert(plan.contains("In(doc_id"),
      s"expected the page's id list pushed to the store scan:\n$plan")
    assert(!plan.contains("documents.parquet"),
      s"the point fetch must never scan the corpus table:\n$plan")
    assert(!plan.contains("CartesianProduct"))
    // projection pushdown: a snippet fetch needs (doc_id, text) — the
    // store scan must NOT read lang/source/n_chars for it (at 100 TB the
    // text column dominates, but unread columns still cost IO + decode)
    val pruned = explain(DocStore.fetchPage(spark, store, Seq(1L, 7L))
      .select("doc_id", "text"))
    assert(pruned.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      s"expected the store scan pruned to the projected columns:\n$pruned")
    // ...and BOTH directions with the round-12 payload column: a
    // text-only fetch must not read a payload byte (the exact ReadSchema
    // above already excludes it — make the claim explicit), and a media
    // fetch must not decode text (at 100 TB the payload column dominates
    // the store; reading it on text pages would undo the forward index's
    // point)
    assert(!pruned.contains("payload"),
      s"a text-only fetch must not read the payload column:\n$pruned")
    val prunedMedia = explain(DocStore.fetchPage(spark, store, Seq(1L, 7L))
      .select("doc_id", "payload"))
    assert(prunedMedia.contains(
      "ReadSchema: struct<doc_id:bigint,payload:binary>"),
      s"expected the media fetch pruned to (doc_id, payload):\n$prunedMedia")
    assert(!prunedMedia.contains("text:string"),
      s"a media fetch must not read the text column:\n$prunedMedia")
  }

  test("q159/q160: maintained-artifact serving plans — ledger broadcast-pruned, labels never re-resolved") {
    import org.apache.spark.sql.functions.col
    import graft.text.{ClusterIndex, Dedup}
    val work = java.nio.file.Files.createTempDirectory("plan_maint").toString
    def parityDir(p: Int): String = {
      val d = java.nio.file.Files.createTempDirectory(s"plan_p$p").toString
      spark.read.parquet(s"$sf0001/documents.parquet")
        .filter(col("doc_id") % 2 === p)
        .write.mode("overwrite").parquet(s"$d/documents.parquet")
      d
    }
    val evens = parityDir(0)
    val odds = parityDir(1)
    Dedup.writeGramLedger(spark, evens, s"$work/ledger")
    // q159: the at-rest ledger side must be pruned by a BROADCAST
    // semi-join on the batch's gram set — a shuffled ledger would be the
    // corpus-mass exchange the artifact exists to remove
    val rw = explain(Dedup.rewriteBatchAgainstLedger(spark, odds,
      s"$work/ledger"))
    assert(rw.contains("BroadcastHashJoin") && rw.contains("LeftSemi"),
      s"expected a broadcast semi-join pruning the ledger scan:\n$rw")
    assert(rw.contains("gramledger") || rw.contains("ledger"),
      s"expected the at-rest ledger in the plan:\n$rw")
    assert(!rw.contains("CartesianProduct"))
    // round 14: for a page-sized batch against a LARGE at-rest ledger a
    // bloom built from the batch gram set rides the scan's filter AHEAD
    // of the broadcast probe (the size gate is dropped through its
    // parameter — a spec-sized ledger legitimately skips the rider)
    val rwBloom = explain(Dedup.rewriteBatchAgainstLedger(spark, odds,
      s"$work/ledger", bloomMinLedgerBytes = 0L))
    assert(rwBloom.contains("might_contain"),
      s"expected the batch-gram bloom riding the ledger scan:\n$rwBloom")
    assert(!rw.contains("might_contain"),
      s"the rider must skip a spec-sized ledger (size gate):\n$rw")
    // q160: serving reads the LABEL TABLE — no signature recompute, no
    // banded self-join, no CC loop in the served plan
    ClusterIndex.write(spark, evens, s"$work/cluster")
    ClusterIndex.append(spark, odds, s"$work/cluster", Some("b0"))
    val served = explain(
      ClusterIndex.nearDupClustersServed(spark, sf0001, s"$work/cluster"))
    assert(served.contains("labels"),
      s"expected the maintained label table in the plan:\n$served")
    assert(!served.contains("minhash") && !served.contains("band_val"),
      s"serving must not re-resolve signatures/bands:\n$served")
    assert(!served.contains("CartesianProduct"))
  }

  test("q152: proximity-boosted retrieval rides both text artifacts, no corpus scan") {
    import graft.text.TextIndex
    val ti = java.nio.file.Files.createTempDirectory("pr_text").toString
    val pi = java.nio.file.Files.createTempDirectory("pr_phrase").toString
    TextIndex.write(spark, sf0001, ti)
    TextIndex.writePhraseIndex(spark, sf0001, pi)
    val plan = explain(TextIndex.proximityRankedSearch(spark, ti, pi))
    assert(plan.contains("PartitionFilters:") && plan.contains("tb") &&
      plan.contains("ub"),
      s"both arms must prune to their buckets:\n$plan")
    assert(!plan.contains("documents.parquet"),
      s"fusion must not tokenize the corpus at query time:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"fusion must stay a keyed join:\n$plan")
  }

  test("q149–q151 estimate arms serve from the at-rest sketch tables, no events scan") {
    val reachTbl = java.nio.file.Files.createTempDirectory("plan_reach").toString
    val cohortTbl = java.nio.file.Files.createTempDirectory("plan_cohort").toString
    Relational.writeReachSketches(spark, sf0001, reachTbl)
    Relational.writeCohortSketches(spark, sf0001, cohortTbl)
    // the serving functions the q149–q151 estimate arms ride: every scan
    // in their plans must be the sketch table — at 100 TB "rollups never
    // re-scan events" is this pin, not a scaladoc claim
    for ((name, df) <- Seq(
        "reach" -> Relational.reachFromSketches(spark, reachTbl),
        "overlap" -> Relational.overlapFromSketches(spark, cohortTbl),
        "retention" -> Relational.retentionFromSketches(spark, cohortTbl))) {
      val plan = explain(df)
      assert(!plan.contains("events.parquet"),
        s"$name serving must read only the sketch table:\n$plan")
      assert(plan.contains("ObjectHashAggregate") || name == "reach",
        s"$name union-merge must run as object-hash aggregation:\n$plan")
    }
  }

  test("q147: phrase search prunes every position list to its bucket, no corpus scan") {
    import graft.text.TextIndex
    val pi = java.nio.file.Files.createTempDirectory("phraseidx").toString
    TextIndex.writePhraseIndex(spark, sf0001, pi)
    val plan = explain(TextIndex.phraseSearch(spark, pi,
      TextIndex.topPhrase(spark, pi)))
    assert(plan.contains("PartitionFilters:") && plan.contains("ub"),
      s"expected token-bucket partition pruning:\n$plan")
    assert(plan.contains("EqualTo(tok") || plan.contains("In(tok"),
      s"expected the token predicate pushed to the scan:\n$plan")
    assert(!plan.contains("documents.parquet"),
      s"phrase search must not touch the corpus at query time:\n$plan")
    assert(!plan.contains("bigrams"),
      s"round-11 unified layout: no bigram artifact in the plan:\n$plan")
  }

  test("phrase search with an out-of-vocabulary token answers empty without scanning a position list") {
    import graft.text.TextIndex
    val pi = java.nio.file.Files.createTempDirectory("phraseidx_oov").toString
    TextIndex.writePhraseIndex(spark, sf0001, pi)
    val probe = TextIndex.topPhrase(spark, pi)
      .updated(1, "zz_never_a_token")
    val res = TextIndex.phraseSearch(spark, pi, probe)
    assert(res.isEmpty, "an OOV token makes the phrase impossible")
    assert(res.columns.toSeq == Seq("doc_id", "n_occ", "first_pos"))
    val plan = explain(res)
    assert(!plan.contains("positions"),
      s"the OOV pre-flight must short-circuit before any position-list scan:\n$plan")
  }

  test("q14: global top-k plans as TakeOrderedAndProject, not a full sort") {
    val s = explain(Relational.q14(spark, sf0001))
    assert(s.contains("TakeOrderedAndProject"))
  }

  test("q20: range join keeps its equi component (sort-merge/hash, not NL)") {
    val s = explain(Relational.q20(spark, sf0001))
    assert(s.contains("o_orderkey") && !s.contains("CartesianProduct"))
    assert(!s.contains("BroadcastNestedLoopJoin") ||
      // at tiny SF a broadcast NL can win; the equi key must still exist
      s.contains("l_orderkey"))
  }

  test("q23: dot product uses the codegen'd graft_dot expression") {
    val s = explain(graft.vector.Similarity.cosineTopK(spark, sf0001))
    assert(s.contains("graft_dot"))
    assert(!s.contains("aggregate(zip_with"))
  }

  test("graft_dot builder enforces arity; expression type-checks inputs") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import graft.functions.{DotProduct, GraftExtensions, VectorExpressions}
    // shared builder used by both registration paths (registry + extensions)
    val lit = Literal.create(Array(1.0, 2.0))
    assert(VectorExpressions.builder(Seq(lit, lit)).isInstanceOf[DotProduct])
    intercept[IllegalArgumentException] { VectorExpressions.builder(Seq(lit)) }
    intercept[IllegalArgumentException] { VectorExpressions.builder(Seq(lit, lit, lit)) }
    // wrong input types fail analysis cleanly, not at runtime
    assert(!DotProduct(Literal("a"), Literal("b")).checkInputDataTypes().isSuccess)
    assert(DotProduct(lit, lit).checkInputDataTypes().isSuccess)
    // extension wiring accepts injection without error
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
    // and the SQL path (registered on the shared session by Similarity) works
    graft.functions.VectorExpressions.register(spark)
    assert(spark.sql("SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .head().getDouble(0) == 11.0)
  }

  test("no query plans a partitionless WindowExec (single-partition sort of the corpus)") {
    import org.apache.spark.sql.execution.window.WindowExec
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val bad = fn(spark, sf0001).queryExecution.sparkPlan.collect {
        case w: WindowExec if w.partitionSpec.isEmpty => w
      }
      if (bad.nonEmpty) Some(name) else None
    }
    assert(offenders.isEmpty, s"partitionless windows in: ${offenders.mkString(", ")}")
  }

  test("similarity top-k plans as TakeOrderedAndProject, not a global sort") {
    import graft.vector.Similarity
    val s = explain(Similarity.cosineTopK(spark, sf0001))
    assert(s.contains("TakeOrderedAndProject"))
  }

  test("q34 near-dup candidates come from a keyed join, not a cross join") {
    import graft.vector.Similarity
    // the banded shape lives in the memo BUILDER (consumer plans read the
    // session-memoized scored-pair table)
    val b = explain(Similarity.computeScoredBandedPairs(spark, sf0001))
    assert(!b.contains("CartesianProduct") && !b.contains("BroadcastNestedLoopJoin"),
      "blocked near-dup must join on (band_id, band_val), never cross-join")
    assert(b.contains("band_val"))
    // and the consumer itself stays cross-join-free with a fused top-k
    val s = explain(Similarity.nearDupPairs(spark, sf0001))
    assert(!s.contains("CartesianProduct"))
    assert(s.contains("TakeOrderedAndProject"))
  }

  test("minhash signatures are a pure map: no shuffle before the presentation sort") {
    import graft.text.Dedup
    val plan = explain(Dedup.minhashSignatures(spark, sf0001))
    // exactly ONE exchange — the rangepartitioning for orderBy(doc_id);
    // signatures themselves come straight off the scan (MinHashHex)
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 exchange (sort), got $exchanges:\n$plan")
  }

  test("q55 prefiltered jaccard verifies candidates through keyed joins only") {
    import graft.text.Dedup
    val s = explain(Dedup.jaccardPrefiltered(spark, sf0001))
    assert(!s.contains("CartesianProduct") && !s.contains("BroadcastNestedLoopJoin"))
  }

  test("map-only curation/multimodal queries shuffle only for their presentation sort") {
    // chunking, frame sampling, quantization, pii redaction: all generate/map
    // over the scan — exactly ONE exchange (the orderBy range partitioning)
    val mapOnly = Seq("q52_chunking", "q56_frame_sample", "q57_embed_quantize",
      "q54_pii_redact")
    mapOnly.foreach { q =>
      val plan = explain(SparkEntry.queries(q)(spark, sf0001))
      val exchanges = "Exchange".r.findAllIn(plan).length
      assert(exchanges == 1, s"$q: expected 1 exchange (sort), got $exchanges")
    }
  }

  test("round-3 curation operators keep their scale shapes") {
    import graft.text.{Curation, Dedup}
    // q62: one corpus pass, no join anywhere — the funnel is a single
    // aggregate plus a 1-row explode
    val funnel = explain(Curation.filterFunnel(spark, sf0001))
    assert(!funnel.contains("Join"), s"funnel must not join:\n$funnel")
    // q63: the corpus side never shuffles for its join — the per-source
    // rate table must come in as a broadcast
    val sample = explain(Curation.stratifiedSample(spark, sf0001))
    assert(sample.contains("BroadcastHashJoin"))
    assert(!sample.contains("SortMergeJoin") && !sample.contains("ShuffledHashJoin"),
      s"rate table must broadcast, not shuffle the corpus:\n$sample")
    // q64: dedup work is keyed by the sketch — and never a cross join
    val inc = explain(Dedup.incrementalDedup(spark, sf0001))
    assert(inc.contains("hashpartitioning(sketch"), s"expected sketch-keyed shuffle:\n$inc")
    assert(!inc.contains("CartesianProduct") && !inc.contains("BroadcastNestedLoopJoin"))
    // q65: map + partial-aggregated groupBy + presentation sort — exactly
    // two exchanges (agg hashpartitioning, orderBy rangepartitioning)
    val buckets = explain(Curation.lengthBuckets(spark, sf0001))
    val exchanges = "Exchange".r.findAllIn(buckets).length
    assert(exchanges == 2, s"q65: expected 2 exchanges, got $exchanges:\n$buckets")
    assert(buckets.contains("partial_"), "q65 aggregate must map-side combine")
  }

  test("round-4 operators keep their scale shapes") {
    import graft.text.{Curation, Dedup}
    import graft.vector.Similarity
    // q68: the corpus side meets the tiny per-source threshold table via
    // broadcast — the corpus never shuffles for the calibration join
    val cal = explain(Curation.qualityCalibration(spark, sf0001))
    assert(cal.contains("BroadcastHashJoin"), s"thresholds must broadcast:\n$cal")
    assert(!cal.contains("SortMergeJoin") && !cal.contains("ShuffledHashJoin"),
      s"calibration join must not shuffle the corpus:\n$cal")
    // q69: every shuffle keyed (gram agg), no cross join anywhere
    val nov = explain(Dedup.gramNovelty(spark, sf0001))
    assert(nov.contains("hashpartitioning(gram"), s"expected gram-keyed work:\n$nov")
    assert(!nov.contains("CartesianProduct") && !nov.contains("BroadcastNestedLoopJoin"))
    // q72: per-vector top-k pushed down as WindowGroupLimit (only k rows
    // per src cross the final shuffle). The banded candidate join itself
    // sits behind the score-once checkpoint, so it no longer shows in this
    // explain — its keyed shape is guarded by the q34 test above.
    val knn = explain(Similarity.knnGraph(spark, sf0001))
    assert(knn.contains("WindowGroupLimit"), s"rank filter must push down:\n$knn")
    assert(!knn.contains("CartesianProduct"))
  }

  test("cell index: annIvfIndexed is a partition-pruned per-cell scan") {
    import graft.vector.{CellIndex, Similarity}
    val idx = java.nio.file.Files.createTempDirectory("cellidx").toString
    CellIndex.write(spark, sf0001, idx, k = 4, iters = 3)
    val probe = Similarity.probeVector(spark, sf0001)
    val df = CellIndex.annIvfIndexed(spark, idx, probe)
    val s = explain(df)
    // the scan prunes to the probed cell directories — per-query IO is
    // cell-sized, not corpus-sized
    assert(s.contains("PartitionFilters:") && s.contains("cell"),
      s"expected cell partition pruning:\n$s")
    assert(s.contains("TakeOrderedAndProject"), s"top-k must not rank the corpus:\n$s")
    // the only exchange is the k-row rank stage after TakeOrdered — no
    // shuffle ever carries corpus mass
    assert(graft.analytics.ScaleJoins.exchangeCount(df) <= 1,
      s"indexed ANN must not shuffle the corpus:\n$s")
    // same codebook parameters → exactly the ad-hoc annIvf answer
    val adhoc = Similarity.annIvf(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    val indexed = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(indexed.toSeq == adhoc.toSeq, "indexed ANN drifted from ad-hoc annIvf")
    // sharded clusters: contract shape + representative invariants hold
    val cl = CellIndex.semanticClustersIndexed(spark, idx).collect()
    assert(cl.nonEmpty)
    assert(cl.forall(r => r.getLong(2) >= 1L))
    val reps = cl.filter(r => r.getLong(3) == 1L).map(_.getLong(0)).toSet
    assert(cl.forall(r => reps.contains(r.getLong(1))), "every cluster_rep must be a kept row")
  }

  test("cell index: retrieval rides the index — indexed RRF and hybrid match ad-hoc") {
    import graft.vector.{CellIndex, Similarity}
    val idx = java.nio.file.Files.createTempDirectory("cellidx_ret").toString
    val cells = 4
    CellIndex.write(spark, sf0001, idx, k = cells, iters = 3)
    val probe = Similarity.probeVector(spark, sf0001)
    // full probe (nprobe = cell count) ⇒ the dense arm sees every vector,
    // so the fused output must equal the ad-hoc q134 verbatim
    val fusedIdx = CellIndex.rrfFusionIndexed(spark, sf0001, idx, probe,
        nprobe = cells).collect().map(_.toSeq)
    val fusedAdhoc = graft.vector.Similarity.rrfFusion(spark, sf0001)
      .collect().map(_.toSeq)
    assert(fusedIdx.toSeq == fusedAdhoc.toSeq,
      "indexed RRF fusion drifted from the ad-hoc arm at full probe")
    // same for filter-then-ANN hybrid retrieval
    val hybIdx = CellIndex.hybridSearchIndexed(spark, sf0001, idx, probe,
        nprobe = cells).collect().map(_.toSeq)
    val hybAdhoc = Similarity.hybridSearch(spark, sf0001)
      .collect().map(_.toSeq)
    assert(hybIdx.toSeq == hybAdhoc.toSeq,
      "indexed hybrid search drifted from the ad-hoc arm at full probe")
    // pruned serving: the dense arm's scan must carry cell PartitionFilters
    // (cell-sized IO), and the fusion must still end in TakeOrdered stages
    val prunedPlan = explain(CellIndex.hybridSearchIndexed(
      spark, sf0001, idx, probe, nprobe = 2))
    assert(prunedPlan.contains("PartitionFilters:") && prunedPlan.contains("cell"),
      s"expected cell partition pruning in indexed hybrid:\n$prunedPlan")
    assert(prunedPlan.contains("TakeOrderedAndProject"),
      s"top-k must not rank the corpus:\n$prunedPlan")
  }

  test("text index: bm25 serves from bucket-pruned postings, identical to ad-hoc") {
    import graft.text.{TextIndex, TextOps}
    import graft.vector.{CellIndex, Similarity}
    val ti = java.nio.file.Files.createTempDirectory("textidx").toString
    TextIndex.write(spark, sf0001, ti)
    // the indexed answer is the ad-hoc q132 answer VERBATIM (shared Okapi
    // expression + shared integer-s6 rank tail, persisted exact longs)
    val got = TextIndex.bm25Indexed(spark, ti).collect().map(_.toSeq)
    val want = TextOps.bm25(spark, sf0001).collect().map(_.toSeq)
    assert(got.toSeq == want.toSeq, "indexed BM25 drifted from ad-hoc q132")
    // serving plan: postings scan pruned to the query terms' hash buckets
    // (PartitionFilters on tb), no documents scan, integer-keyed TakeOrdered
    val plan = explain(TextIndex.bm25Indexed(spark, ti))
    assert(plan.contains("PartitionFilters:") && plan.contains("tb"),
      s"expected term-bucket partition pruning:\n$plan")
    // the term predicate must reach the parquet scan (row-group pruning
    // inside each bucket via the sorted layout), not just the join — a
    // single-term query folds In() to EqualTo, both are the pushed form
    assert(plan.contains("In(tok") || plan.contains("EqualTo(tok"),
      s"expected the query terms pushed to the postings scan:\n$plan")
    assert(!plan.contains("documents.parquet"),
      s"indexed BM25 must not touch the corpus at query time:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-N must not rank all scored docs:\n$plan")
    // fully-indexed RRF (dense arm from the cell index + lexical arm from
    // the posting index) still equals the ad-hoc q134 at full probe
    val cells = 4
    val vi = java.nio.file.Files.createTempDirectory("cellidx_ti").toString
    CellIndex.write(spark, sf0001, vi, k = cells, iters = 3)
    val probe = Similarity.probeVector(spark, sf0001)
    val fused = CellIndex.rrfFusionIndexed(spark, sf0001, vi, probe,
        nprobe = cells, textIndexPath = Some(ti)).collect().map(_.toSeq)
    val adhoc = Similarity.rrfFusion(spark, sf0001).collect().map(_.toSeq)
    assert(fused.toSeq == adhoc.toSeq,
      "fully-indexed RRF drifted from the ad-hoc arm at full probe")
  }

  test("cell index: mmrSelectIndexed equals ad-hoc q73 at full probe; pruned pool is cell-sized") {
    import graft.vector.{CellIndex, Similarity}
    val idx = java.nio.file.Files.createTempDirectory("cellidx_mmr").toString
    val cells = 4
    CellIndex.write(spark, sf0001, idx, k = cells, iters = 3)
    val probe = Similarity.probeVector(spark, sf0001)
    // full probe ⇒ the candidate pool sees every vector, so the shared
    // greedy (one definition) must select verbatim q73
    val got = CellIndex.mmrSelectIndexed(spark, idx, probe, nprobe = cells)
      .collect().map(_.toSeq)
    val want = Similarity.mmrSelect(spark, sf0001).collect().map(_.toSeq)
    assert(got.toSeq == want.toSeq,
      "indexed MMR selection drifted from the ad-hoc q73 at full probe")
    // pruned serving: pool generation scans only the probed cell dirs and
    // never the raw embeddings table (the greedy collects the pool, so the
    // plan to pin is the pool's, not the 5-row local result's)
    val plan = explain(CellIndex.mmrPoolIndexed(spark, idx, probe,
      poolSize = 20, nprobe = 2))
    assert(plan.contains("PartitionFilters:") && plan.contains("cell"),
      s"expected cell partition pruning in indexed MMR pool:\n$plan")
    assert(!plan.contains("embeddings.parquet"),
      s"indexed MMR pool must ride the index, not the raw embeddings:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"pool top-k must not rank the scanned cells through a full sort:\n$plan")
  }

  test("q138/q139 oracle rows serve from the at-rest indexes (partition filters pinned)") {
    // the CONTRACT entries, not the library functions: the rows the driver
    // hash-checks must themselves ride the cell + posting layouts — both
    // arms' scans carry PartitionFilters (cell=/tb= dirs), and no plan
    // re-tokenizes or re-normalizes the corpus at query time
    val rrf = explain(SparkEntry.queries("q138_rrf_indexed")(spark, sf0001))
    assert(rrf.contains("PartitionFilters:") && rrf.contains("cell"),
      s"q138 dense arm must scan cell partitions of the index:\n$rrf")
    assert(rrf.contains("tb"),
      s"q138 lexical arm must scan term-bucket partitions of the index:\n$rrf")
    assert(!rrf.contains("documents.parquet"),
      s"q138 must not touch the document corpus at query time:\n$rrf")
    val hyb = explain(SparkEntry.queries("q139_hybrid_indexed")(spark, sf0001))
    assert(hyb.contains("PartitionFilters:") && hyb.contains("cell"),
      s"q139 must scan cell partitions of the index:\n$hyb")
    assert(!hyb.contains("embeddings.parquet"),
      s"q139's vector side must ride the index, not the raw embeddings:\n$hyb")
  }

  test("NB quality classifier keeps the token-keyed no-fan shape") {
    import graft.text.TextOps
    val plan = explain(TextOps.nbQualityScore(spark, sf0001))
    // scoring is a tok-keyed join + doc-keyed reduce; scalars broadcast —
    // never a cross join of corpus-mass sides, and the class-count
    // aggregate must map-side combine (vocab-sized reduce state)
    assert(!plan.contains("CartesianProduct"),
      s"NB scoring must not cross-join corpus mass:\n$plan")
    assert(plan.contains("hashpartitioning(tok") || plan.contains("hashpartitioning(doc_id"),
      s"expected keyed aggregation work:\n$plan")
    assert(plan.contains("partial_"), s"class counts must map-side combine:\n$plan")
  }

  test("round-4b operators keep their scale shapes") {
    import graft.text.{Curation, Dedup, TextOps}
    import graft.vector.Similarity
    // q74: rare-gram blocking and verification are keyed equi-joins — no
    // cross join anywhere. Since round 7 the blocking + sketch-prefilter
    // stages run behind eager checkpoints (they EXECUTE inside
    // containment() and are truncated out of the final explain), so the
    // final plan shows only the survivor-sized verify: a (doc_id, gram)
    // equi-join into a pair-keyed aggregate.
    val cont = explain(Dedup.containment(spark, sf0001))
    assert(!cont.contains("CartesianProduct") && !cont.contains("BroadcastNestedLoopJoin"),
      s"containment must stay blocked on rare grams:\n$cont")
    assert(cont.contains("hashpartitioning(doc_a"), s"expected pair-keyed verify agg:\n$cont")
    // q75: one map pass + a k-row aggregate; the totals side comes in as a
    // 1-row broadcast, never a shuffled join of the corpus
    val bal = explain(Similarity.clusterBalance(spark, sf0001))
    assert(!bal.contains("SortMergeJoin") && !bal.contains("ShuffledHashJoin"),
      s"cluster balance must not shuffle a join side:\n$bal")
    // q76: both snapshot counts come from ONE conditional aggregate — the
    // plan has no join of two grouped corpus passes (broadcast totals only)
    val drift = explain(Curation.driftReport(spark, sf0001))
    assert(!drift.contains("SortMergeJoin") && !drift.contains("ShuffledHashJoin"),
      s"drift cells/totals must not shuffle-join:\n$drift")
    assert(drift.contains("partial_sum"), "drift counts must map-side combine")
    // q77 (round-5 shape): chunk hashes come out of the codegen'd
    // expression with zero shuffle — NO window, NO token-level exchange;
    // the only exchanges are the chunk-hash df aggregate + per-doc rollup
    val chunk = explain(Curation.chunkDedup(spark, sf0001))
    assert(!chunk.contains("CartesianProduct"))
    assert(!chunk.contains("Window"),
      s"chunk hashes must be computed in-expression, not via a window:\n$chunk")
    assert(chunk.contains("graft_cdc_chunks"), s"expected the codegen'd chunker:\n$chunk")
    assert(chunk.contains("hashpartitioning(chunk_hash") &&
      chunk.contains("hashpartitioning(doc_id"),
      s"remaining exchanges must be chunk_hash + doc_id keyed:\n$chunk")
    // q78: two map-side-combined keyed aggregates, no join at all
    val ent = explain(TextOps.tokenEntropy(spark, sf0001))
    assert(!ent.contains("Join"), s"entropy must not join:\n$ent")
    assert(ent.contains("partial_"), "entropy aggregates must map-side combine")
    // q80: pairs from the banded equi-join; split attachment is id-keyed.
    // The banded shape is pinned on the memo BUILDER (consumer plans show
    // the session-memoized pair table, not the join that built it).
    val pairsPlan = explain(Dedup.computeMinhashPairs(spark, sf0001))
    assert(pairsPlan.contains("band_val") || pairsPlan.contains("pos"),
      s"expected the banded candidate join:\n$pairsPlan")
    assert(!pairsPlan.contains("CartesianProduct"),
      s"candidate pairs must come from the banded equi-join:\n$pairsPlan")
    val leak = explain(Dedup.splitLeakage(spark, sf0001))
    assert(!leak.contains("CartesianProduct"),
      s"leakage audit must stay banded + id-keyed:\n$leak")
    // q81: corpus-frequency join keyed by token, no cross join of doc sides
    val lm = explain(TextOps.unigramLogprob(spark, sf0001))
    assert(lm.contains("hashpartitioning(tok"), s"expected token-keyed work:\n$lm")
    assert(!lm.contains("CartesianProduct"))
  }

  test("round-4c operators keep their scale shapes") {
    import graft.text.TextOps
    import graft.vector.Similarity
    // q82: two keyed aggregates, zero joins — centroid state is labels×dims
    val cd = explain(Similarity.centroidDrift(spark, sf0001))
    assert(!cd.contains("Join"), s"centroid drift must not join:\n$cd")
    assert(cd.contains("partial_sum"), "centroid sums must map-side combine")
    // q84: the K-row vocab reaches the corpus via broadcast — the (doc,tok)
    // counts never shuffle for the membership join
    val oov = explain(TextOps.oovRate(spark, sf0001))
    assert(oov.contains("BroadcastHashJoin"), s"vocab must broadcast:\n$oov")
    assert(!oov.contains("SortMergeJoin") && !oov.contains("ShuffledHashJoin"),
      s"oov membership join must not shuffle the corpus:\n$oov")
    // q85: one map-side-combined aggregate keyed by dimension, no join
    val ds = explain(Similarity.dimStats(spark, sf0001))
    assert(!ds.contains("Join"), s"dim stats must not join:\n$ds")
    assert(ds.contains("partial_sum") && ds.contains("partial_min"),
      "dim moments/extremes must map-side combine")
    // q88: both the per-source table and the 1-row totals reach the corpus
    // via broadcast — the resample decision is a pure map over the scan
    val mix = explain(graft.text.Curation.mixResample(spark, sf0001))
    assert(!mix.contains("SortMergeJoin") && !mix.contains("ShuffledHashJoin"),
      s"mix resample must not shuffle a join side:\n$mix")
    assert(mix.contains("BroadcastHashJoin"), s"per-source stats must broadcast:\n$mix")
    // q90: the packed stats row broadcasts; the z-transform is a map —
    // the corpus is never shuffled (only scanned twice: moments + codes)
    val wh = explain(Similarity.whiten(spark, sf0001))
    assert(!wh.contains("SortMergeJoin") && !wh.contains("ShuffledHashJoin"),
      s"whitening stats must broadcast:\n$wh")
    // q91: the per-lang percentile fence table broadcasts over the corpus map
    val lt = explain(graft.text.Curation.lengthTrim(spark, sf0001))
    assert(lt.contains("BroadcastHashJoin") && !lt.contains("SortMergeJoin"),
      s"percentile fences must broadcast:\n$lt")
    // q92: one user-keyed shuffle (window + aggregate), no join at all
    val bd = explain(graft.analytics.Enrich.burstDetect(spark, sf0001))
    assert(!bd.contains("Join"), s"burst detect must not join:\n$bd")
    assert(bd.contains("hashpartitioning(user_id"), s"expected user-keyed work:\n$bd")
    // q94: langId is a pure map; the audit is one (source, lang) aggregate
    val lc = explain(graft.text.TextOps.langConsistency(spark, sf0001))
    assert(!lc.contains("CartesianProduct"))
    assert(lc.contains("hashpartitioning(source"), s"expected source-keyed reduce:\n$lc")
    // q93: the manifest composes by keyed joins only — never a cross join
    val mf = explain(graft.text.Curation.curationManifest(spark, sf0001))
    assert(!mf.contains("CartesianProduct") && !mf.contains("BroadcastNestedLoopJoin"),
      s"manifest joins must stay keyed:\n$mf")
  }

  test("round-5 operators keep their scale shapes") {
    // q99: ONE lang-keyed aggregate carrying both exact and sketch
    // percentiles, no join anywhere
    val qa = explain(graft.text.TextOps.quantileAudit(spark, sf0001))
    assert(!qa.contains("Join"), s"quantile audit must not join:\n$qa")
    assert(qa.contains("hashpartitioning(lang"), s"expected lang-keyed agg:\n$qa")
    // q100: the only window is batch-keyed (bounded partitions by
    // construction) — exchanges are exactly window-hash + presentation sort
    val es = explain(graft.text.Curation.epochShuffle(spark, sf0001))
    assert("Exchange".r.findAllIn(es).length == 2,
      s"epoch shuffle must be map + one keyed window + sort:\n$es")
    assert(es.contains("hashpartitioning(batch"), s"window must key on batch:\n$es")
    // q101: unionByName concatenates partitions — the single exchange is
    // the presentation sort
    val sm = explain(graft.sources.Catalog.snapshotMerge(spark, sf0001))
    assert("Exchange".r.findAllIn(sm).length == 1,
      s"schema-evolution union must not shuffle:\n$sm")
    assert(sm.contains("Union"), s"expected a Union node:\n$sm")
    // q102: both window passes and the run aggregate ride ONE user_id
    // partitioning (hashpartitioning(user_id) satisfies the coarser
    // (user_id, run_id) clustering) — exchanges = user hash + sort
    val sc = explain(Relational.q102(spark, sf0001))
    assert("Exchange".r.findAllIn(sc).length == 2,
      s"SCD2 must reuse one user_id partitioning across its windows:\n$sc")
    assert(sc.contains("hashpartitioning(user_id"), s"expected user-keyed runs:\n$sc")
    // q103: keyed windows/aggregates only; transition matrix is ≤ |types|²
    // rows before its normalizing window
    val bg = explain(Relational.q103(spark, sf0001))
    assert(!bg.contains("CartesianProduct") && !bg.contains("BroadcastNestedLoopJoin"),
      s"bigram counts must stay keyed:\n$bg")
    assert(bg.contains("hashpartitioning(user_id"), s"expected user-keyed lag:\n$bg")
    // q106: corpus work is the source-keyed token aggregate (map-side
    // combined); the apportionment window ranks source-count rows inside
    // the coalesce(1) + spark_partition_id pattern, never the corpus
    val tb = explain(graft.text.Curation.tokenBudget(spark, sf0001))
    assert(tb.contains("partial_sum"), s"token mass must map-side combine:\n$tb")
    assert(tb.contains("SPARK_PARTITION_ID"), s"rank must ride the q59 pattern:\n$tb")
    assert(tb.contains("Coalesce 1") || tb.contains("coalesce"),
      s"apportionment operates on the dashboard-sized aggregate:\n$tb")
    // q107: ONE lang-keyed aggregate, no join
    val fr = explain(graft.text.TextOps.fertility(spark, sf0001))
    assert(!fr.contains("Join"), s"fertility must not join:\n$fr")
    assert(fr.contains("hashpartitioning(lang"), s"expected lang-keyed agg:\n$fr")
    // the gram substrate feeding q31/q50/q51/q55/q69/q74/q80/q93: grams are
    // built and per-doc-deduped INSIDE the token array — a pure map over
    // the scan, ZERO exchanges (the windowed form shuffled the tokenized
    // corpus twice)
    Seq(true, false).foreach { d =>
      val eg = explain(graft.text.Dedup.explodedGrams(spark, sf0001, distinctPerDoc = d))
      assert(!eg.contains("Exchange"),
        s"explodedGrams(distinct=$d) must be a zero-shuffle map:\n$eg")
    }
  }

  test("round-6 operators keep their scale shapes") {
    // q98: the bloom probe filters the FACT SCAN before any exchange — in
    // the printed tree, the lineitem scan follows the probe filter with no
    // Exchange between them (probe above a shuffle would mean the sketch
    // saved nothing)
    // (bloom_contains builds Spark's BloomFilterMightContain, which prints
    // as `might_contain`; the giant sketch literal makes full-plan dumps
    // unreadable, so failure messages print a literal-stripped plan)
    val bj = explain(graft.analytics.ScaleJoins.bloomPrefilterJoin(spark, sf0001))
      .replaceAll("0x[0-9A-Fa-f]{32,}", "0x<sketch>")
    assert(bj.contains("might_contain"), s"expected bloom probe:\n$bj")
    val lines = bj.linesIterator.toVector
    val scanIdx = lines.indexWhere(_.contains("lineitem.parquet"))
    assert(scanIdx > 0, s"expected a lineitem scan:\n$bj")
    val above = lines.take(scanIdx).reverse
    val probeUp = above.indexWhere(_.contains("might_contain"))
    val exUp = above.indexWhere(_.contains("Exchange"))
    assert(probeUp >= 0 && (exUp < 0 || probeUp < exUp),
      s"bloom probe must sit directly over the scan, not above a shuffle:\n$bj")
    // q104: the CMS estimate is a PROJECTION over the top-k rows (the
    // sketch rides the references array), never a second corpus aggregate —
    // one count-agg exchange, top-k via TakeOrderedAndProject
    val hhDf = Relational.q104(spark, sf0001)
    val hh = explain(hhDf).replaceAll("0x[0-9A-Fa-f]{32,}", "0x<sketch>")
    // the probe expression is asserted structurally — the sketch literal
    // inflates the plan string past Spark's print budget, which elides the
    // projection's expression text
    assert(hhDf.queryExecution.optimizedPlan.exists(
        _.expressions.exists(_.exists(_.isInstanceOf[graft.functions.CmsEstimate]))),
      s"expected in-plan CMS probe:\n$hh")
    assert(hh.contains("TakeOrderedAndProject"), s"top-k must not global-sort:\n$hh")
    assert("Exchange".r.findAllIn(hh).length == 1,
      s"CMS audit must add no exchange beyond the count agg:\n$hh")
    // q110: GROUPING SETS is ONE Expand + one aggregate pass, not three
    // scans with a union
    val gs = explain(Relational.q110(spark, sf0001))
    assert("Expand".r.findAllIn(gs).length == 1,
      s"grouping sets must plan a single Expand:\n$gs")
    assert(!gs.contains("Union"), s"grouping sets must not union scans:\n$gs")
    // q111/q112/q113: each lakehouse merge/diff is ONE full-outer
    // sort-merge join — two key exchanges + the presentation sort, nothing
    // else (full outer cannot broadcast; a second join would double-shuffle
    // the snapshot)
    Seq(
      "q111" -> graft.sources.Catalog.mergeUpsert(spark, sf0001),
      "q112" -> graft.sources.Catalog.snapshotDiff(spark, sf0001),
      "q113" -> graft.sources.Catalog.mergeUpsertEvolved(spark, sf0001)
    ).foreach { case (name, df) =>
      val m = explain(df)
      assert(m.contains("FullOuter"), s"$name must full-outer join:\n$m")
      assert("SortMergeJoin".r.findAllIn(m).length == 1,
        s"$name must resolve in ONE merge join:\n$m")
      assert("Exchange".r.findAllIn(m).length == 3,
        s"$name must shuffle exactly (left key, right key, final sort):\n$m")
    }
    // q114: the manifest is ONE file-keyed aggregate — no join, map-side
    // combined, exchanges = file_id hash + presentation sort
    val sk = explain(graft.sources.Catalog.skippingStats(spark, sf0001))
    assert(!sk.contains("Join"), s"skipping manifest must not join:\n$sk")
    assert(sk.contains("partial_"), s"manifest agg must map-side combine:\n$sk")
    assert("Exchange".r.findAllIn(sk).length == 2,
      s"manifest = one keyed agg + presentation sort:\n$sk")
    // q115: bounds come in as a 1-row broadcast (scalar idiom); the
    // interleave is a pure map — no shuffled join, and the only real
    // exchanges are the bounds aggregate's single-partition gather + the
    // ordering that IS the layout
    val zo = explain(graft.sources.Catalog.zorderLayout(spark, sf0001))
    assert(!zo.contains("SortMergeJoin") && !zo.contains("ShuffledHashJoin"),
      s"z-order must not shuffle a join side:\n$zo")
    assert(zo.contains("BroadcastNestedLoopJoin") || zo.contains("BroadcastExchange"),
      s"bounds must broadcast:\n$zo")
    // q116: four map-side-combined aggregate legs under one union — no
    // join anywhere (each audit leg is a count over its artifact)
    val pa = explain(graft.text.Curation.purgeAudit(spark, sf0001))
    assert(!pa.contains("Join"), s"purge audit must not join:\n$pa")
    assert(pa.contains("Union"), s"expected the four-leg union:\n$pa")
    assert(pa.contains("partial_"), s"audit counts must map-side combine:\n$pa")
  }

  test("round-6b operators keep their scale shapes") {
    // q117: the pair explode runs over the DISTINCT-WORD aggregate, never
    // the corpus — exactly two keyed aggregates (word count, pair sum),
    // both map-side combined, and the top-20 is TakeOrderedAndProject,
    // not a global sort
    val bp = explain(graft.text.TextOps.bpePairs(spark, sf0001))
    assert("Exchange hashpartitioning".r.findAllIn(bp).length == 2,
      s"bpe pairs = word agg + pair agg, nothing more:\n$bp")
    assert(bp.contains("partial_"), s"bpe aggs must map-side combine:\n$bp")
    assert(bp.contains("TakeOrderedAndProject"),
      s"top-20 must not global-sort:\n$bp")
    // q118: the edge side is the session-memoized pair table — the
    // consumer plan scans the checkpointed RDD and never rebuilds
    // signatures (no minhash expression in-plan)
    val so = explain(graft.text.Dedup.sourceOverlap(spark, sf0001))
    assert(so.contains("ExistingRDD") || so.contains("Scan ExistingRDD"),
      s"source overlap must ride the memoized pair table:\n$so")
    assert(!so.toLowerCase.contains("minhash"),
      s"source overlap must not rebuild signatures:\n$so")
    assert(!so.contains("CartesianProduct"), s"no cartesian:\n$so")
    // q119: centroid sums and the grand total enter as 1-row broadcasts
    // (scalar idiom); the distance pass is a pure map — no shuffled join
    val eo = explain(graft.vector.Similarity.embedOutliers(spark, sf0001))
    assert(!eo.contains("SortMergeJoin") && !eo.contains("ShuffledHashJoin"),
      s"outlier pass must not shuffle a join side:\n$eo")
    assert(eo.contains("BroadcastNestedLoopJoin") || eo.contains("BroadcastExchange"),
      s"moments must broadcast:\n$eo")
    assert(!eo.contains("CartesianProduct"), s"no cartesian:\n$eo")
    // q120: no join — rk/cum/tot all ride the ONE lang exchange (the
    // whole-partition total must not re-aggregate); exchanges = vocab agg
    // + lang window + presentation sort
    val vc = explain(graft.text.TextOps.vocabCoverage(spark, sf0001))
    assert(!vc.contains("Join"), s"coverage must not join a totals side:\n$vc")
    assert("Exchange".r.findAllIn(vc).length <= 3,
      s"coverage = vocab agg + lang window + sort:\n$vc")
    // q121: the cluster base is the memoized CC label table (no minhash
    // rebuild), and both aggregates are keyed
    val cp = explain(graft.text.Dedup.clusterPurity(spark, sf0001))
    assert(cp.contains("ExistingRDD"),
      s"purity must ride the memoized labels:\n$cp")
    assert(!cp.toLowerCase.contains("minhash"),
      s"purity must not rebuild signatures:\n$cp")
    assert(!cp.contains("CartesianProduct"), s"no cartesian:\n$cp")
  }

  test("round-6c operators keep their scale shapes") {
    // q122: a metadata-only plan — the window runs over the file manifest
    // partitioned by the table partition key (lang), never a global sort
    // of files; exchanges = file agg + lang window + bin agg + sort
    val cpn = explain(graft.sources.Catalog.compactionPlan(spark, sf0001))
    assert(!cpn.contains("Join"), s"compaction plan must not join:\n$cpn")
    assert(cpn.contains("hashpartitioning(lang"),
      s"bin window must key on the lake partition:\n$cpn")
    assert("Exchange".r.findAllIn(cpn).length <= 4,
      s"plan = file agg + lang window + bin agg + sort:\n$cpn")
    // q123: count-by-key map-side combines, the scalar total enters as a
    // 1-row broadcast, and the top-15 is TakeOrderedAndProject
    val sa = explain(graft.analytics.Relational.q123(spark, sf0001))
    assert(sa.contains("partial_count"),
      s"key histogram must map-side combine:\n$sa")
    assert(sa.contains("BroadcastNestedLoopJoin") || sa.contains("BroadcastExchange"),
      s"total must broadcast, not shuffle:\n$sa")
    assert(sa.contains("TakeOrderedAndProject"),
      s"top-15 must not global-sort every key:\n$sa")
    assert(!sa.contains("CartesianProduct"), s"no cartesian:\n$sa")
    // q124: the merge is union + re-aggregate — NO join anywhere, and the
    // partial sides map-side combine before their one exchange each
    val ia = explain(graft.analytics.Relational.q124(spark, sf0001))
    assert(!ia.contains("Join"), s"partial-agg merge must not join:\n$ia")
    assert(ia.contains("Union"), s"merge = union of partial sides:\n$ia")
    assert(ia.contains("partial_"), s"partials must map-side combine:\n$ia")
    // q125: one keyed aggregate pass over the corpus, no join — the audit
    // is manifest-sized by construction
    val va = explain(graft.sources.Catalog.vacuumAudit(spark, sf0001))
    assert(!va.contains("Join"), s"vacuum audit must not join:\n$va")
    assert("Exchange".r.findAllIn(va).length <= 2,
      s"audit = one keyed agg + presentation sort:\n$va")
    // q127: the target LM rides a PUSHED source predicate (small pruned
    // slice, not a full-corpus carry), scalars broadcast, no cartesian
    val iw = explain(graft.text.TextOps.importanceWeights(spark, sf0001))
    assert(iw.contains("EqualTo(source,src0)"),
      s"target filter must reach the scan:\n$iw")
    assert(iw.contains("BroadcastNestedLoopJoin") || iw.contains("BroadcastExchange"),
      s"LM totals must broadcast:\n$iw")
    assert(!iw.contains("CartesianProduct"), s"no cartesian:\n$iw")
    // q128: the resample adds only a map (noise) + TakeOrderedAndProject
    // on top of the q127 plan — no new shuffle for the sampling step
    val ir = explain(graft.text.TextOps.importanceResample(spark, sf0001))
    assert(ir.contains("TakeOrderedAndProject"),
      s"top-k sample must not global-sort:\n$ir")
    assert(!ir.contains("CartesianProduct"), s"no cartesian:\n$ir")
    // q129: the hit join is gram-keyed, never a cartesian; the covered-
    // position explode rides the hit rows (bounded by 3x hits)
    val cs = explain(graft.text.Curation.contaminationSpans(spark, sf0001))
    assert(!cs.contains("CartesianProduct"), s"no cartesian:\n$cs")
    assert(cs.contains("Generate"), s"positional explode expected:\n$cs")
    // q126: merge-on-read replay — union concatenates the delta scans
    // (no join), then exactly ONE doc_id-keyed window picks winners
    val lr = explain(graft.sources.Catalog.logReplay(spark, sf0001))
    assert(!lr.contains("Join"), s"log replay must not join versions:\n$lr")
    assert(lr.contains("Union"), s"delta scans concatenate:\n$lr")
    assert(lr.contains("hashpartitioning(doc_id"),
      s"winner window must key on doc_id:\n$lr")
    assert("Exchange".r.findAllIn(lr).length <= 2,
      s"replay = one keyed window + presentation sort:\n$lr")
  }

  test("bronze hive layout prunes partitions at the scan — S3/100TB read path") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("prune").toString
    val df = Seq(
      ("e1", java.sql.Timestamp.valueOf("2024-03-05 07:30:00")),
      ("e2", java.sql.Timestamp.valueOf("2024-03-05 08:30:00")),
      ("e3", java.sql.Timestamp.valueOf("2024-04-06 07:30:00"))).toDF("event_id", "timestamp")
    graft.streaming.Streaming.withHivePartitions(df)
      .write.mode("overwrite").partitionBy("year", "month", "day", "hour").parquet(dir)
    val pruned = spark.read.parquet(dir).filter($"month" === 3 && $"day" === 5)
    val plan = pruned.queryExecution.explainString(SimpleMode)
    assert(plan.contains("PartitionFilters: [") && plan.contains("month"))
    assert(pruned.count() == 2)
    // the pruned scan reads only the matching partition directories
    val filesRead = pruned.select(input_file_name()).distinct().count()
    assert(filesRead == 2)
  }
}
