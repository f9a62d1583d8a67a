package graft

import org.apache.spark.sql.DataFrame
import graft.text.Dedup

/** Convergence-bound + correctness specs for the pointer-doubling connected
  * components behind q49 (`Dedup.connectedComponents`). The oracle corpus
  * only has shallow clusters, so these plant the shapes that break naive
  * min-propagation: a long chain (worst case — plain propagation needs
  * diameter rounds; doubling must finish in O(log diameter)) and a wide
  * star (fan-out), plus a checkpoint-hygiene check (each round must release
  * the previous round's blocks).
  */
class ConnectedComponentsSpec extends SparkSpec {

  private def edgesDf(pairs: Seq[(Long, Long)]): DataFrame = {
    import spark.implicits._
    pairs.toDF("doc_a", "doc_b")
  }

  private def labelMap(labels: DataFrame): Map[Long, Long] =
    labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("empty edge set: returns an empty label table, no NPE") {
    // sum("changed") over zero rows is NULL — the convergence read must
    // coalesce, not getLong a null (regression guard: the count()-based
    // check this replaced exited cleanly on empty input)
    val (labels, rounds) = Dedup.connectedComponents(edgesDf(Seq.empty))
    assert(labels.count() == 0)
    assert(rounds == 1)
  }

  test("50-node chain: correct component in O(log n) rounds, not O(n)") {
    val chain = (1L until 50L).map(i => (i, i + 1))
    val (labels, rounds) = Dedup.connectedComponents(edgesDf(chain))
    val m = labelMap(labels)
    assert(m.size == 50)
    assert(m.values.forall(_ == 1L), "every chain node must resolve to the min id")
    // plain min-propagation needs ~49 rounds here; pointer doubling reaches
    // distance 2^(r-1) by round r, so 50 nodes need ~7 + 1 confirming round
    assert(rounds <= 10, s"expected O(log n) rounds for the chain, got $rounds")
    assert(rounds < 25, s"round count $rounds is linear — doubling is not engaged")
  }

  test("1000-node star: converges in a constant number of rounds") {
    val star = (2L to 1000L).map(k => (1L, k))
    val (labels, rounds) = Dedup.connectedComponents(edgesDf(star))
    val m = labelMap(labels)
    assert(m.size == 1000)
    assert(m.values.forall(_ == 1L))
    assert(rounds <= 3, s"star should converge immediately, got $rounds rounds")
  }

  test("convergence under task retries: flaky-once edges give the same " +
      "labels and the same round count (the accumulator-fold premise)") {
    // Round 16 folded the convergence count into the checkpoint-
    // materialization job as a LongAccumulator; the retry argument lived
    // only in a comment (r16 verdict residual #5). This drives the loop
    // with an input whose every (stage, partition) FIRST attempt fails —
    // so every round's job, the nonzero ones AND the final converged
    // one, executes through retried tasks — and asserts the end-to-end
    // contract: identical labels, identical round count.
    import spark.implicits._
    val chain = (1L until 30L).map(i => (i, i + 1)) // several nonzero rounds
    val (cleanLabels, cleanRounds) = Dedup.connectedComponents(edgesDf(chain))
    val flaky = edgesDf(chain).as[(Long, Long)]
      .mapPartitions { it =>
        val tc = org.apache.spark.TaskContext.get()
        if (tc != null && tc.attemptNumber() == 0)
          throw new RuntimeException("flaky-once: injected first-attempt failure")
        it
      }
      .toDF("doc_a", "doc_b")
    val (flakyLabels, flakyRounds) = Dedup.connectedComponents(flaky)
    assert(labelMap(flakyLabels) == labelMap(cleanLabels))
    assert(flakyRounds == cleanRounds,
      s"retries changed the round count: $flakyRounds vs $cleanRounds")
  }

  test("a failed task attempt's accumulator updates are discarded — the " +
      "platform semantics the CC fold's exact-termination comment relies on") {
    // the loop's map adds to the accumulator as rows stream through and
    // the task can fail AFTER adding; Spark only folds accumulator
    // updates from SUCCESSFUL task attempts into the driver value
    // (countFailedValues=false for user accumulators), so a retried
    // round counts each surviving row exactly once
    val sc = spark.sparkContext
    val acc = sc.longAccumulator("retry_probe")
    sc.parallelize(1 to 100, 4).map { i =>
      acc.add(1L) // add FIRST, then maybe fail — the hazard order
      val tc = org.apache.spark.TaskContext.get()
      if (tc.attemptNumber() == 0 && i % 25 == 0)
        throw new RuntimeException("flaky-once after accumulating")
      i
    }.count()
    assert(acc.value == 100L,
      s"failed-attempt accumulator updates must be discarded, got ${acc.value}")
  }

  test("mixed components resolve to per-component min labels") {
    // triangle {2,4,6}, chain {10,11,12,13}, pair {20,21}; ids deliberately
    // not contiguous so label==min is a real check, not an artifact
    val edges = Seq((4L, 6L), (2L, 4L), (2L, 6L),
      (11L, 10L), (12L, 11L), (13L, 12L),
      (21L, 20L))
    val (labels, _) = Dedup.connectedComponents(edgesDf(edges))
    val m = labelMap(labels)
    assert(m == Map(2L -> 2L, 4L -> 2L, 6L -> 2L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("large-star/small-star: chain and star converge to min labels in log rounds") {
    val chain = (1L until 50L).map(i => (i, i + 1))
    val (cl, crounds) = Dedup.connectedComponentsLSS(edgesDf(chain))
    val cm = labelMap(cl)
    assert(cm.size == 50 && cm.values.forall(_ == 1L))
    assert(crounds < 25, s"LSS chain rounds $crounds not logarithmic")
    val star = (2L to 1000L).map(k => (1L, k))
    val (sl, srounds) = Dedup.connectedComponentsLSS(edgesDf(star))
    val sm = labelMap(sl)
    assert(sm.size == 1000 && sm.values.forall(_ == 1L))
    assert(srounds <= 3, s"LSS star rounds $srounds")
    // empty graph: same contract as pointer doubling
    val (el, erounds) = Dedup.connectedComponentsLSS(edgesDf(Seq.empty))
    assert(el.count() == 0 && erounds == 1)
  }

  test("large-star/small-star and pointer doubling agree on a random graph") {
    val rnd = new scala.util.Random(13)
    // 120 nodes, 150 random edges: several nontrivial components + singletons
    val edges = Seq.fill(150)((rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      .filter { case (a, b) => a != b }
    val (pd, _) = Dedup.connectedComponents(edgesDf(edges))
    val (lss, _) = Dedup.connectedComponentsLSS(edgesDf(edges))
    assert(labelMap(pd) == labelMap(lss))
  }

  test("per-round checkpoints are released: no block pile-up across rounds") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val chain = (1L until 40L).map(i => (i, i + 1))
    val (labels, rounds) = Dedup.connectedComponents(edgesDf(chain))
    labels.count() // consume
    val added = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(rounds > 3, "precondition: the loop must have run several rounds")
    // only the FINAL round's checkpoint may remain pinned — earlier rounds
    // must have been unpersisted as the loop advanced
    assert(added.size <= 2,
      s"persistent RDDs grew by ${added.size} across $rounds rounds — " +
        "round checkpoints are leaking")
    // release only the blocks THIS test pinned: the session is shared with
    // other suites, whose cached state a blanket sweep could clobber
    graft.Checkpoints.release(spark.sparkContext, added.toSet)
  }

  test("freshCheckpoint re-roots plan statistics: loop-carried size estimates stay bounded") {
    // the round-13 1000x failure mode: localCheckpoint PRESERVES the
    // origin plan's estimated sizeInBytes in the LogicalRDD it plants, so
    // a loop that joins its previous checkpoint with itself squares the
    // estimate per round — BigInteger bit-length doubles per iteration
    // and the driver stalls in stats math by round ~8. freshCheckpoint
    // must break the compounding: its result's estimate is a constant
    // default, independent of the origin plan's product.
    import spark.implicits._
    val base = (1L to 64L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    var joined = base
    // five self-joins: a plain-checkpoint chain would carry size^(2^5)
    for (_ <- 1 to 5) {
      val j = joined.as("l").join(joined.as("r"),
          $"l.doc_b" === $"r.doc_a")
        .select($"l.doc_a", $"r.doc_b")
      val plain = j.localCheckpoint()
      val fresh = graft.Checkpoints.freshCheckpoint(j)
      val plainStats = plain.queryExecution.optimizedPlan.stats.sizeInBytes
      val freshStats = fresh.queryExecution.optimizedPlan.stats.sizeInBytes
      // the plain checkpoint inherits the join-product estimate; the fresh
      // one must NOT compound past a constant bound (defaultSizeInBytes)
      assert(freshStats.bitLength <= 128,
        s"freshCheckpoint carried a compounding estimate: $freshStats")
      assert(plainStats >= freshStats.min(plainStats),
        "sanity: both stats readable")
      // rows are identical either way — the re-root changes planning
      // inputs only, never data
      assert(plain.collect().map(_.toSeq).sortBy(_.toString).toSeq ==
        fresh.collect().map(_.toSeq).sortBy(_.toString).toSeq)
      joined = fresh
    }
    // and the loop's carried frame stayed cheap to ESTIMATE end to end
    assert(joined.queryExecution.optimizedPlan.stats.sizeInBytes.bitLength <= 128)
  }

  test("session memos survive the harness sweep and keep serving correct results") {
    // the round-6 mechanism end-to-end: a memoized resolution's retained
    // blocks must outlive Bench's inter-query sweep (their lineage is
    // truncated — a swept memo would FAIL, not recompute), and the memo
    // hit must return the same rows as the first computation
    val sc = spark.sparkContext
    val first = Dedup.nearDupClusters(spark, sf001).collect()
    // the harness hygiene pass between queries
    graft.Checkpoints.sweepExceptRetained(sc)
    spark.catalog.clearCache()
    // memo hit AFTER the sweep: same labels, no recompute failure
    val second = Dedup.nearDupClusters(spark, sf001).collect()
    assert(first.map(_.toSeq).toSeq == second.map(_.toSeq).toSeq)
    // a consumer of the same underlying pair memo agrees on the clusters
    val canon = Dedup.canonicalDocs(spark, sf001)
      .select("doc_id", "cluster_rep").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    first.foreach { r =>
      assert(canon(r.getLong(0)) == r.getLong(1),
        s"q61 disagrees with q49 on doc ${r.getLong(0)}")
    }
    // explicit release must NOT free retained blocks either
    val retained = graft.Checkpoints.retainedIds(sc)
    graft.Checkpoints.release(sc, retained)
    assert(retained.subsetOf(sc.getPersistentRDDs.keySet),
      "release() must skip memo-retained ids")
  }
}
