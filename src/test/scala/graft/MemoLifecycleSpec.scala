package graft

/** The round-8 memo-lifetime contract (ADVICE r6 #1, finished): a session
  * that is dropped must have its memo entries collected by GC alone — no
  * explicit evictMemos — because [[SessionMemos]] stores session-free
  * carriers (schema + RDD[Row]), so the cached value can no longer
  * resurrect its weak key the way a cached DataFrame did. */
class MemoLifecycleSpec extends SparkSpec {

  test("a dropped session's memo entries are GC-collectable without evictMemos") {
    import org.apache.spark.sql.functions._
    // Pre-warm the AQE/broadcast daemon pools on the SHARED session: pool
    // threads inherit the active session at creation
    // (InheritableThreadLocal), so threads spawned during the child
    // session's queries would pin it as their baseline until the cached
    // pool's 60 s idle expiry. Warming on the long-lived session makes the
    // common case immediate; the generous deadline below covers any thread
    // the child's queries still spawn (measured: collection completes at
    // ~61 s in the worst case — the pool keepAlive, not our cache).
    val warm = spark.read.parquet(s"$sf0001/documents.parquet")
    warm.groupBy("lang").count()
      .join(broadcast(warm.limit(5)), Seq("lang")).count()
    // an isolated child session (shared context, own state) — the
    // multi-session-driver shape the old cache leaked under
    var s2 = spark.newSession()
    val before = SessionMemos.liveSessionCount
    // populate both owners' memos through the public query paths
    assert(graft.text.Dedup.minhashPairsUnsorted(s2, sf0001).count() >= 0)
    assert(graft.vector.Similarity.nearDupPairs(s2, sf0001).count() > 0)
    assert(SessionMemos.liveSessionCount == before + 1,
      "expected the child session to hold memo entries")
    // second read rides the memo: the carrier map must not grow
    assert(graft.text.Dedup.minhashPairsUnsorted(s2, sf0001).count() >= 0)
    assert(SessionMemos.liveSessionCount == before + 1)
    // drop every strong reference a test can control, then ask GC; the
    // weak key must clear WITHOUT any evictMemos call. Active-session
    // thread-locals are the one external strong ref actions may have set.
    s2 = null
    org.apache.spark.sql.SparkSession.clearActiveSession()
    val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
    var cleared = false
    while (!cleared && System.nanoTime() < deadline) {
      System.gc()
      Thread.sleep(250)
      cleared = SessionMemos.liveSessionCount == before
    }
    assert(cleared,
      "dropped session's memo entries were not collected: a cached value " +
        "still strongly references the session")
  }

  test("explicit eviction stays name-scoped per owner") {
    val s2 = spark.newSession()
    try {
      assert(graft.text.Dedup.minhashPairsUnsorted(s2, sf0001).count() >= 0)
      assert(graft.vector.Similarity.nearDupPairs(s2, sf0001).count() > 0)
      // evicting one owner's names must not drop the other's entries
      graft.text.Dedup.evictMemos(s2)
      assert(SessionMemos.liveSessionCount >= 1)
      // the vector memo still rides: rebuilding must be a cache hit (the
      // session still counts as live in the registry)
      assert(graft.vector.Similarity.nearDupPairs(s2, sf0001).count() > 0)
      graft.vector.Similarity.evictMemos(s2)
      Checkpoints.evictSessionMemos(s2)
    } finally {
      org.apache.spark.sql.SparkSession.clearActiveSession()
    }
  }
}
