package graft

import org.apache.spark.SparkContext

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

  /** Ids currently registered as memo-owned for this context. */
  def retainedIds(sc: SparkContext): Set[Int] = retainedByCtx.synchronized {
    Option(retainedByCtx.get(sc)).map(_.toSet).getOrElse(Set.empty)
  }

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
