package graft

import org.apache.spark.SparkContext
import org.apache.spark.sql.SparkSession

/** Release discipline for `localCheckpoint` blocks (the library-wide form of
  * the per-round swap `Dedup.connectedComponents` runs internally): a
  * checkpointed frame's blocks are pinned in the block manager for the life
  * of the session unless explicitly unpersisted, so every operator that
  * checkpoints an INTERMEDIATE (one whose data the returned plan no longer
  * reads) must release it before returning. Long-lived library sessions
  * otherwise accumulate pinned storage query over query — the round-2 bench
  * measured that pressure at 5× on late-running queries.
  *
  * Only blocks no longer referenced may be released: `localCheckpoint`
  * truncates lineage, so a released block cannot be recomputed and a plan
  * that still reads it will fail. The usage pattern is therefore
  * snapshot-before / release-after-the-last-consumer-materializes:
  *
  * {{{
  * val before = sc.getPersistentRDDs.keySet
  * val edges = build(...).localCheckpoint()   // pins intermediate blocks
  * val (labels, _) = connectedComponents(edges) // labels materialized eagerly
  * Checkpoints.release(sc, sc.getPersistentRDDs.keySet -- before -- keepIds)
  * }}}
  */
object Checkpoints {

  /** Unpersist the given pinned RDD ids (ids already gone are a no-op).
    * Non-blocking: callers release mid-operator, where waiting for eviction
    * would serialize against the next stage; the bench harness does its own
    * blocking sweep between queries. Memo-retained ids are always excluded:
    * an operator that builds a memo under another operator's
    * snapshot-before/release-after window (e.g. the pairs memo first
    * populated inside the CC resolution) must not see its irreplaceable
    * blocks freed by the outer window's cleanup. */
  def release(sc: SparkContext, ids: Set[Int]): Unit = {
    val keep = retainedIds(sc)
    val live = sc.getPersistentRDDs
    (ids -- keep).foreach(id => live.get(id).foreach(_.unpersist(blocking = false)))
  }

  /** Ids pinned now that were not pinned in `before` — the operator's own
    * checkpoints when `before` was snapshotted at entry. */
  def pinnedSince(sc: SparkContext, before: scala.collection.Set[Int]): Set[Int] =
    (sc.getPersistentRDDs.keySet -- before).toSet

  /** Blocks that session-scoped memos (e.g. `Dedup.ccLabels`) keep pinned for
    * the life of the session ON PURPOSE: a memoized frame's localCheckpoint
    * has truncated lineage, so releasing its blocks would make every later
    * cache hit fail, not recompute. Harness sweeps ([[sweepExceptRetained]])
    * must skip these ids. Keyed weakly by context so a stopped session's
    * entries are collectable. Retained state is bounded by construction:
    * memos register only final, heavily-reduced tables (a CC label table, a
    * k×dim codebook), never corpus-sized intermediates. */
  private val retainedByCtx =
    new java.util.WeakHashMap[SparkContext, scala.collection.mutable.Set[Int]]()

  /** Register memo-owned block ids as off-limits to harness sweeps. */
  def retain(sc: SparkContext, ids: Set[Int]): Unit = retainedByCtx.synchronized {
    val set = retainedByCtx.computeIfAbsent(sc,
      _ => scala.collection.mutable.Set.empty[Int])
    set ++= ids
  }

  /** Per-SESSION ledger of memo-retained ids, so one session's memos can be
    * evicted ([[evictSessionMemos]]) without freeing blocks another session
    * of the same context still serves cache hits from. Build sites that
    * populate a session-keyed memo register through [[retainFor]] (which
    * also feeds the context-wide sweep exclusion); context-only [[retain]]
    * remains for state with no owning session. */
  private val retainedBySession =
    new java.util.WeakHashMap[SparkSession, scala.collection.mutable.Set[Int]]()

  /** [[retain]] + record the ids against the owning session for later
    * [[evictSessionMemos]]. */
  def retainFor(spark: SparkSession, ids: Set[Int]): Unit = {
    retain(spark.sparkContext, ids)
    retainedBySession.synchronized {
      val set = retainedBySession.computeIfAbsent(spark,
        _ => scala.collection.mutable.Set.empty[Int])
      set ++= ids
    }
  }

  /** Drop ids from the retained registry and blocking-unpersist their
    * blocks — the memo-EVICTION half [[retain]] lacked: without it a memo
    * rebuilt for many dirs in one session pins blocks monotonically and a
    * caller can never intentionally free a retained block. Blocking, so a
    * harness that evicts between measured regions never overlaps eviction
    * IO with the next timing. */
  def unretain(sc: SparkContext, ids: Set[Int]): Unit = {
    retainedByCtx.synchronized {
      Option(retainedByCtx.get(sc)).foreach(_ --= ids)
    }
    val live = sc.getPersistentRDDs
    ids.foreach(id => live.get(id).foreach(_.unpersist(blocking = true)))
  }

  /** Evict every block the session's memo builds retained (the block half
    * of a full memo eviction; the cache-map half lives with each cache
    * owner — `Dedup.evictMemos` / `Similarity.evictMemos` call this). */
  def evictSessionMemos(spark: SparkSession): Unit = {
    val ids = retainedBySession.synchronized {
      Option(retainedBySession.remove(spark)).map(_.toSet).getOrElse(Set.empty[Int])
    }
    if (ids.nonEmpty) unretain(spark.sparkContext, ids)
  }

  /** Ids currently registered as memo-owned for this context. */
  def retainedIds(sc: SparkContext): Set[Int] = retainedByCtx.synchronized {
    Option(retainedByCtx.get(sc)).map(_.toSet).getOrElse(Set.empty)
  }

  /** `localCheckpoint` for ITERATED-JOIN loops — re-roots the plan in a
    * fresh `LogicalRDD` with DEFAULT size estimates before checkpointing.
    *
    * Why: `Dataset.localCheckpoint` carries the ORIGIN plan's estimated
    * statistics into the checkpoint node (so one-shot checkpoints keep
    * planning as if uncut — normally what you want). But in a loop whose
    * body JOINS the previous round's checkpoint with itself (both CC
    * forms), Catalyst's size-only estimator MULTIPLIES child sizes, so the
    * carried estimate SQUARES every round: the BigInteger bit-length
    * doubles per iteration, and by round ~8 the driver spends minutes per
    * round in `SizeInBytesOnlyStatsPlanVisitor` Karatsuba/Toom-Cook
    * multiplications with every executor idle (observed on the 1000×
    * cluster-index base build: CC rounds grew 24 s → 33 → 61 → 141 → 380
    * → stuck, one core busy in `BigInteger.multiply`). The row-level
    * round-trip re-roots the frame so each round's estimation starts from
    * a CONSTANT default, not last round's product. Broadcast planning is
    * unaffected where it matters: AQE re-plans joins from ACTUAL shuffle
    * sizes at runtime, not these estimates.
    *
    * Cost, priced honestly: (1) one extra InternalRow⇄Row conversion
    * pass at checkpoint materialization (the conversion happens once;
    * downstream consumers read the checkpointed blocks directly), and
    * (2) the re-rooted `LogicalRDD` reports Unknown output partitioning,
    * so a next round that could have reused the checkpoint's hash
    * partitioning re-shuffles instead. Both are per-round constants; the
    * compounding estimate was super-exponential — the 1000× cluster base
    * that never finished under `localCheckpoint` completes in ~12 min
    * under this (SCALING round 13). Use for loop-carried frames only —
    * one-shot checkpoints should keep `localCheckpoint`'s stats and
    * partitioning. */
  def freshCheckpoint(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    df.sparkSession.createDataFrame(df.rdd, df.schema).localCheckpoint()

  /** The inter-query hygiene sweep (Bench's form): blocking-unpersist every
    * pinned RDD EXCEPT memo-retained ones — their blocks are irreplaceable
    * (truncated lineage) and deliberately session-lived. */
  def sweepExceptRetained(sc: SparkContext): Unit = {
    val keep = retainedIds(sc)
    sc.getPersistentRDDs.foreach { case (id, rdd) =>
      if (!keep.contains(id)) rdd.unpersist(blocking = true)
    }
  }
}
